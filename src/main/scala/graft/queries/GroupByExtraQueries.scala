package graft.queries

import org.apache.spark.sql.functions._
import graft.api.{Frame, SortKey}
import QueryKit._

/**
 * §2.5 remainder: groupby nlargest / unique / ngroup / get_group /
 * cumprod / per-group ffill (reference: base query_compiler.py:4492,
 * 4542, 4468, 4300, 4002, 4228).
 */
object GroupByExtraQueries {

  val all: Seq[Q] = Seq(

    // groupby_nlargest: top-2 orders per priority by totalprice
    // (rank-filter per group — one shuffle, no global sort).
    Q("q110_groupby_topn",
      (s, dir) => f(s, dir, "orders")
        .groupby("o_orderpriority")
        .nlargestPerGroup(2, "o_totalprice", Seq(SortKey.asc("o_orderkey")))
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .sortValues(Seq(SortKey.asc("o_orderpriority"), SortKey.asc("o_orderkey"))).df,
      Some("""
        SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
          SELECT o_orderpriority, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) WHERE rn <= 2
        ORDER BY o_orderpriority, o_orderkey""")),

    // groupby_unique (sorted collect_set) + groupby_ngroup (group ids in
    // sorted key order via the distinct-key broadcast trick) +
    // groupby_get_group (key filter).
    Q("q111_groupby_unique_ngroup",
      (s, dir) => {
        val fr = f(s, dir, "orders")
        val uniq = fr.groupby("o_orderpriority")
          .uniquePerGroup("o_orderstatus", "statuses")
        val withId = fr.groupby("o_orderpriority").ngroup("gid")
          .select("o_orderpriority", "gid")
          .df.distinct()
        Frame(uniq.df.join(withId, "o_orderpriority"))
          .sortValues(Seq(SortKey.asc("o_orderpriority"))).df
      },
      Some("""
        SELECT u.o_orderpriority, u.statuses, g.gid FROM (
          SELECT o_orderpriority,
                 list_sort(list_distinct(list(o_orderstatus))) AS statuses
          FROM orders GROUP BY o_orderpriority) u
        JOIN (
          SELECT o_orderpriority,
                 CAST(row_number() OVER (ORDER BY o_orderpriority) - 1 AS INT) AS gid
          FROM (SELECT DISTINCT o_orderpriority FROM orders)) g
        USING (o_orderpriority)
        ORDER BY o_orderpriority""")),

    // groupby_cumprod (exact integer factors ∈ {1,2} — the running
    // product stays ≪ 2^53 even for customers with ~100 orders, so both
    // engines' arithmetic is exact) plus per-group ffill of an
    // induced-null column, ordered by the unique (orderdate, orderkey).
    Q("q112_groupby_cumprod_ffill",
      (s, dir) => {
        val ord = Seq(SortKey.asc("o_orderdate"), SortKey.asc("o_orderkey"))
        val base = f(s, dir, "orders")
          .withColumn("factor", lit(1L) + pmod(col("o_orderkey"), lit(2)).cast("long"))
          .withColumn("price_or_null",
            when(col("o_totalprice") >= 100000, col("o_totalprice")))
        base.groupby("o_custkey")
          .cumprodLong("factor", "cumprod_f", ord)
          .groupby("o_custkey")
          .ffillPerGroup("price_or_null", "price_ffill", ord)
          .select("o_orderkey", "cumprod_f", "price_ffill")
          .sortValues(Seq(SortKey.asc("o_orderkey"))).df
      },
      Some("""
        SELECT o_orderkey,
               CAST(product(1 + o_orderkey % 2)
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cumprod_f,
               last_value(CASE WHEN o_totalprice >= 100000 THEN o_totalprice END IGNORE NULLS)
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS price_ffill
        FROM orders
        ORDER BY o_orderkey""")))
}

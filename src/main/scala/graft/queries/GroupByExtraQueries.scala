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
        // serialize the set column so the oracle harness (pandas
        // sort_values over all columns) can hash/sort the result
        val uniq = fr.groupby("o_orderpriority")
          .uniquePerGroup("o_orderstatus", "statuses")
          .withColumn("statuses", array_join(col("statuses"), ","))
        val withId = fr.groupby("o_orderpriority").ngroup("gid")
          .select("o_orderpriority", "gid")
          .df.distinct()
        Frame(uniq.df.join(withId, "o_orderpriority"))
          .sortValues(Seq(SortKey.asc("o_orderpriority"))).df
      },
      Some("""
        SELECT u.o_orderpriority, u.statuses, g.gid FROM (
          SELECT o_orderpriority,
                 array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',')
                   AS statuses
          FROM orders GROUP BY o_orderpriority) u
        JOIN (
          SELECT o_orderpriority,
                 CAST(row_number() OVER (ORDER BY o_orderpriority) - 1 AS BIGINT) AS gid
          FROM (SELECT DISTINCT o_orderpriority FROM orders)) g
        USING (o_orderpriority)
        ORDER BY o_orderpriority""")),

    // groupby.transform: shape-preserving per-group normalization
    // (demean + share-of-group) — unbounded windows over the group keys,
    // one shuffle, no apply-side collect (reference groupby_agg
    // transform mode QC:4236 / base :3779).
    Q("q113_groupby_transform",
      (s, dir) => {
        val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("o_custkey"))
        val n = count(lit(1)).over(wAll)
        val cents = sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")).over(wAll)
        val mean4 = floor((cents * 200 + n) / (n * 2)) / lit(10000.0)
        val myCents = (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        // share at 6 decimals via exact integer half-up division (the
        // p/t quotient can land exactly on a rounding boundary)
        val share6 = floor((myCents * 2000000L + cents) / (cents * 2)) / lit(1000000.0)
        Frame(t(s, dir, "orders").select(
          col("o_orderkey"),
          round(col("o_totalprice") - mean4, 4).as("demeaned"),
          share6.as("share")))
          .sortValues(Seq(SortKey.asc("o_orderkey"))).df
      },
      Some("""
        SELECT o_orderkey,
               round(o_totalprice - floor((200 * sum(c) OVER w + count(*) OVER w)
                     / (2 * count(*) OVER w)) / 10000.0, 4) AS demeaned,
               floor((c * 2000000 + sum(c) OVER w) / (2 * sum(c) OVER w)) / 1000000.0 AS share
        FROM (SELECT o_orderkey, o_custkey, o_totalprice,
                     CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
              FROM orders)
        WINDOW w AS (PARTITION BY o_custkey)
        ORDER BY o_orderkey""")),

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
        ORDER BY o_orderkey""")),

    // sum/mean(min_count=) gating (Stats.withMinCount — null when the
    // group has fewer valid values than min_count; pandas nan-prop rule)
    // + pct_change(periods=2) and a negative periods=-1 (future-row
    // base). The v column is nulled for low-tax rows so min_count
    // actually bites on small orders.
    Q("q188_min_count_pct_periods",
      (s, dir) => {
        // l_linenumber ties within an order in this data — the
        // extendedprice tiebreak makes the lead/lag neighbor unique (and
        // equal-price ties are self-neutralizing for pct_change)
        val ord = Seq(SortKey.asc("l_linenumber"), SortKey.asc("l_extendedprice"))
        val base = f(s, dir, "lineitem")
          .withColumn("v", when(col("l_tax") > 0.03, col("l_quantity")))
        val pct = base.groupby("l_orderkey")
          .pctChange("l_extendedprice", "pct2", ord, periods = 2)
          .groupby("l_orderkey")
          .pctChange("l_extendedprice", "pctm1", ord, periods = -1)
        val agged = pct.groupby("l_orderkey").agg(
          "s3" -> graft.functions.Stats.withMinCount(col("v"), sum(col("v")), 3),
          "m5" -> round(graft.functions.Stats.withMinCount(col("v"), avg(col("v")), 5), 6),
          "mx_pct2" -> round(max(col("pct2")), 8),
          "mn_pctm1" -> round(min(col("pctm1")), 8))
        agged.sortValues(Seq(SortKey.asc("l_orderkey"))).df
      },
      Some("""
        SELECT l_orderkey,
               CASE WHEN count(v) >= 3 THEN sum(v) END AS s3,
               CASE WHEN count(v) >= 5 THEN round(avg(v), 6) END AS m5,
               round(max(pct2), 8) AS mx_pct2,
               round(min(pctm1), 8) AS mn_pctm1
        FROM (
          SELECT l_orderkey,
                 CASE WHEN l_tax > 0.03 THEN l_quantity END AS v,
                 (l_extendedprice - lag(l_extendedprice, 2) OVER w)
                   / lag(l_extendedprice, 2) OVER w AS pct2,
                 (l_extendedprice - lead(l_extendedprice, 1) OVER w)
                   / lead(l_extendedprice, 1) OVER w AS pctm1
          FROM lineitem
          WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice))
        GROUP BY l_orderkey ORDER BY l_orderkey""")),

    // groupby.sample(n=) as deterministic per-group content-hash
    // sampling (GroupBy.sampleN — the balanced-class subsample a corpus
    // pipeline needs: same rows on any engine/partitioning). Exactly
    // min(n, group size) rows per group under the md5 order.
    Q("q198_groupby_sample_n",
      (s, dir) => f(s, dir, "orders")
        .groupby("o_orderpriority")
        .sampleN(3, "o_orderkey", salt = "s198")
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .sortValues(Seq(SortKey.asc("o_orderpriority"), SortKey.asc("o_orderkey"))).df,
      Some("""
        SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
          SELECT o_orderpriority, o_orderkey, o_totalprice,
                 row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY md5('s198' || CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rn
          FROM orders) WHERE rn <= 3
        ORDER BY o_orderpriority, o_orderkey""")),

    // groupby().describe() — the full pandas eight-statistic block per
    // group in ONE aggregate pass (count/mean/std/min/25%/50%/75%/max;
    // exact linear-interpolation quantiles).
    Q("q207_groupby_describe",
      (s, dir) => f(s, dir, "lineitem")
        .groupby("l_returnflag")
        .agg(
          "cnt" -> count(col("l_extendedprice")),
          "mean" -> round(avg(col("l_extendedprice")), 4),
          "std" -> round(stddev_samp(col("l_extendedprice")), 4),
          "min" -> round(min(col("l_extendedprice")), 2),
          "p25" -> round(percentile(col("l_extendedprice"), lit(0.25)), 4),
          "p50" -> round(percentile(col("l_extendedprice"), lit(0.5)), 4),
          "p75" -> round(percentile(col("l_extendedprice"), lit(0.75)), 4),
          "max" -> round(max(col("l_extendedprice")), 2))
        .sortValues(Seq(SortKey.asc("l_returnflag"))).df,
      Some("""
        SELECT l_returnflag,
               count(l_extendedprice) AS cnt,
               round(avg(l_extendedprice), 4) AS mean,
               round(stddev_samp(l_extendedprice), 4) AS std,
               round(min(l_extendedprice), 2) AS min,
               round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
               round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
               round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
               round(max(l_extendedprice), 2) AS max
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")))
}

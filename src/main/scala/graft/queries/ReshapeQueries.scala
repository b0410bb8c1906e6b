package graft.queries

import org.apache.spark.sql.functions._
import graft.api.{Frame, SortKey}
import graft.ops.Reshape
import QueryKit._

/**
 * §2.10 reshape operators (reference: pivot_table QC:4559 +
 * PivotTableImpl groupby.py:251-506; melt QC:2918; get_dummies QC:4643;
 * explode QC:3461; cut base QC:4739; crosstab general.py:713).
 */
object ReshapeQueries {

  private val priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  val all: Seq[Q] = Seq(

    // pivot_table with explicit pivot values: one partial/final aggregate,
    // no extra distinct-scan job — the 100 TB pivot plan.
    Q("q80_pivot_table",
      (s, dir) => Frame(Reshape.pivotTable(
        t(s, dir, "orders"),
        index = Seq("o_orderstatus"),
        pivotCol = "o_orderpriority",
        pivotValues = priorities,
        agg = moneySum(col("o_totalprice"))))
        .sortValues(Seq(SortKey.asc("o_orderstatus"))).df,
      Some("""
        SELECT o_orderstatus,
               round(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS DECIMAL(18,0)))
                          FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE)
                     / 100.0, 2) AS "1-URGENT",
               round(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS DECIMAL(18,0)))
                          FILTER (WHERE o_orderpriority = '2-HIGH') AS DOUBLE)
                     / 100.0, 2) AS "2-HIGH",
               round(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS DECIMAL(18,0)))
                          FILTER (WHERE o_orderpriority = '3-MEDIUM') AS DOUBLE)
                     / 100.0, 2) AS "3-MEDIUM",
               round(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS DECIMAL(18,0)))
                          FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS DOUBLE)
                     / 100.0, 2) AS "4-NOT SPECIFIED",
               round(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS DECIMAL(18,0)))
                          FILTER (WHERE o_orderpriority = '5-LOW') AS DOUBLE)
                     / 100.0, 2) AS "5-LOW"
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // pivot_table(aggfunc=['sum','mean','count']) — Spark's native pivot
    // with MULTIPLE aggregates (one pass, one exchange; explicit pivot
    // values so no distinct-scan job). Column names are the flattened
    // pandas MultiIndex, value_agg.
    Q("q201_pivot_multiagg",
      (s, dir) => {
        val prios = Seq("1-URGENT", "5-LOW")
        Frame(t(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .pivot("o_orderpriority", prios)
          .agg(moneySum(col("o_totalprice")).as("sum"),
            round(avg(col("o_totalprice")), 4).as("mean"),
            count(lit(1)).as("n")))
          .sortValues(Seq(SortKey.asc("o_orderstatus"))).df
      },
      Some("""
        SELECT o_orderstatus,
               round(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS DECIMAL(18,0)))
                          FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE)
                     / 100.0, 2) AS "1-URGENT_sum",
               round(avg(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 4)
                 AS "1-URGENT_mean",
               count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS "1-URGENT_n",
               round(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS DECIMAL(18,0)))
                          FILTER (WHERE o_orderpriority = '5-LOW') AS DOUBLE)
                     / 100.0, 2) AS "5-LOW_sum",
               round(avg(o_totalprice) FILTER (WHERE o_orderpriority = '5-LOW'), 4)
                 AS "5-LOW_mean",
               count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS "5-LOW_n"
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // pandas explode keeps a NaN row for an EMPTY list (q84 covers the
    // plain expansion) — posexplode_outer is the exact Spark analog.
    // Docs whose >8-char word filter comes up empty survive with null
    // (match_no, word).
    Q("q208_explode_outer",
      (s, dir) => {
        val arr = t(s, dir, "documents").select(col("doc_id"),
          filter(split(trim(col("text")), "\\s+"), w => length(w) > 8).as("ws"))
        // -1 sentinel for the empty-list row: nullable ints desync the
        // harness dtypes/sorts (the q191 lesson)
        Frame(arr.select(col("doc_id"), posexplode_outer(col("ws")))
          .select(col("doc_id"),
            coalesce(col("pos").cast("long"), lit(-1L)).as("match_no"),
            col("col").as("word")))
          .sortValues(Seq(SortKey.asc("doc_id"), SortKey.asc("match_no"))).df
      },
      Some("""
        SELECT doc_id,
               CASE WHEN len(w) = 0 THEN -1
                    ELSE unnest(range(0, len(ws))) END AS match_no,
               CASE WHEN len(w) = 0 THEN NULL ELSE unnest(ws) END AS word
        FROM (SELECT doc_id,
                     CASE WHEN len(w) = 0 THEN [NULL] ELSE w END AS ws,
                     w
              FROM (SELECT doc_id,
                           list_filter(regexp_extract_all(trim(text), '\S+'),
                                       x -> strlen(x) > 8) AS w
                    FROM documents))
        ORDER BY doc_id, match_no""")),

    // value_counts(bins=5): pandas cuts the value range into five
    // equal-width bins over [min, max] and counts. The min/max anchors
    // are one scalar aggregate (the q48 discipline); binning is a
    // codegen'd floor expression with identical IEEE arithmetic in the
    // oracle, so edge ties land in the same bin in both engines.
    // Documented deviation (COVERAGE.md): floor-binning puts a value
    // sitting exactly on an interior bin edge into the RIGHT-hand bin,
    // whereas pandas cut intervals are right-closed (left bin); both
    // engines here apply the same rule, so the check is self-consistent.
    Q("q209_value_counts_bins",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val b = li.agg(min(col("l_extendedprice")).as("lo"),
          max(col("l_extendedprice")).as("hi")).head()
        val lo = b.getDouble(0); val hi = b.getDouble(1)
        // degenerate min==max range: pandas widens it; a unit width puts
        // every row in bin 0 instead of dividing by zero into NaN bins
        val width = if (hi == lo) 1.0 else (hi - lo) / 5.0
        val bin = least(floor((col("l_extendedprice") - lit(lo)) / lit(width)), lit(4.0))
          .cast("long")
        Frame(li.groupBy(bin.as("bin")).agg(count(lit(1)).as("n")))
          .sortValues(Seq(SortKey.asc("bin"))).df
      },
      Some("""
        WITH b AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
                   FROM lineitem)
        SELECT CAST(least(floor((l_extendedprice - lo) /
                          (CASE WHEN hi = lo THEN 1.0 ELSE (hi - lo) / 5.0 END)), 4)
                    AS BIGINT) AS bin,
               count(*) AS n
        FROM lineitem, b
        GROUP BY 1 ORDER BY 1""")),

    // melt / unpivot (Spark's native Unpivot node — row-expanding map,
    // zero shuffle before the final sort).
    Q("q81_melt",
      (s, dir) => Frame(Reshape.melt(
        t(s, dir, "lineitem"),
        ids = Seq("l_orderkey", "l_linenumber"),
        values = Seq("l_quantity", "l_discount", "l_tax")))
        .selectExprs(col("l_orderkey"), col("l_linenumber"),
          col("variable"), round(col("value"), 4).as("value"))
        // value completes the total order: (l_orderkey, l_linenumber) has
        // ~143k duplicate pairs in the fixture, so sorting on every output
        // column is the only way tied rows land identically in both
        // engines (flushed by the ~sf1 gate at 18M rows, round 15 —
        // smaller SFs passed on tie-order luck)
        .sortValues(Seq(SortKey.asc("l_orderkey"), SortKey.asc("l_linenumber"),
          SortKey.asc("variable"), SortKey.asc("value"))).df,
      Some("""
        SELECT l_orderkey, l_linenumber, variable, round(value, 4) AS value
        FROM (
          SELECT l_orderkey, l_linenumber, 'l_quantity' AS variable, l_quantity AS value FROM lineitem
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
        ORDER BY l_orderkey, l_linenumber, variable, value""")),

    // get_dummies / one-hot (pure column expressions, no shuffle),
    // summed per status so every row is exercised.
    Q("q82_get_dummies",
      (s, dir) => {
        val dummied = Reshape.getDummies(t(s, dir, "orders"), "o_orderpriority", priorities)
        Frame(dummied.groupBy(col("o_orderstatus"))
          .agg(sum(col("o_orderpriority_1-URGENT")).as("n_urgent"),
            sum(col("o_orderpriority_5-LOW")).as("n_low"),
            count(lit(1)).as("n")))
          .sortValues(Seq(SortKey.asc("o_orderstatus"))).df
      },
      Some("""
        SELECT o_orderstatus,
               CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
               CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
               count(*) AS n
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // cut with explicit bins — pandas right-closed (lo, hi], lowest edge
    // excluded (include_lowest=False).
    Q("q83_cut",
      (s, dir) => Frame(t(s, dir, "lineitem")
        .withColumn("qty_bin", Reshape.cut(col("l_quantity"), Seq(0.0, 10.0, 25.0, 50.0)))
        .groupBy(col("qty_bin")).agg(count(lit(1)).as("n")))
        .sortValues(Seq(SortKey(col("qty_bin"), asc = true, nullsFirst = true))).df,
      Some("""
        SELECT CASE WHEN l_quantity > 0.0 AND l_quantity <= 10.0 THEN '(0.0, 10.0]'
                    WHEN l_quantity > 10.0 AND l_quantity <= 25.0 THEN '(10.0, 25.0]'
                    WHEN l_quantity > 25.0 AND l_quantity <= 50.0 THEN '(25.0, 50.0]'
               END AS qty_bin, count(*) AS n
        FROM lineitem GROUP BY 1 ORDER BY 1 NULLS FIRST""")),

    // cut(right=False): left-closed [lo, hi) bins — the boundary mirror.
    Q("q176_cut_left_closed",
      (s, dir) => Frame(t(s, dir, "lineitem")
        .withColumn("qty_bin", Reshape.cutLeftClosed(col("l_quantity"), Seq(0.0, 10.0, 25.0, 50.0)))
        .groupBy(col("qty_bin")).agg(count(lit(1)).as("n")))
        .sortValues(Seq(SortKey(col("qty_bin"), asc = true, nullsFirst = true))).df,
      Some("""
        SELECT CASE WHEN l_quantity >= 0.0 AND l_quantity < 10.0 THEN '[0.0, 10.0)'
                    WHEN l_quantity >= 10.0 AND l_quantity < 25.0 THEN '[10.0, 25.0)'
                    WHEN l_quantity >= 25.0 AND l_quantity < 50.0 THEN '[25.0, 50.0)'
               END AS qty_bin, count(*) AS n
        FROM lineitem GROUP BY 1 ORDER BY 1 NULLS FIRST""")),

    // explode (reference QC:3461): word frequencies over documents.
    Q("q84_explode",
      (s, dir) => Frame(t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("n")))
        .sortValues(Seq(SortKey.desc("n"), SortKey.asc("word")))
        .head(20).df,
      Some("""
        SELECT word, count(*) AS n FROM (
          SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
        GROUP BY word ORDER BY n DESC, word LIMIT 20""")),

    // crosstab (reference general.py:713) — pivoted counts.
    Q("q85_crosstab",
      (s, dir) => Frame(Reshape.crosstab(
        t(s, dir, "orders"), "o_orderstatus", "o_orderpriority", priorities))
        .sortValues(Seq(SortKey.asc("o_orderstatus"))).df,
      Some("""
        SELECT o_orderstatus,
               count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS "1-URGENT",
               count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS "2-HIGH",
               count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
               count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
               count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS "5-LOW"
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // crosstab(normalize='index'): row proportions — corpus-side plan
    // unchanged, division over the tiny pivoted table.
    Q("q177_crosstab_norm",
      (s, dir) => {
        val ct = Reshape.crosstabNormalized(
          t(s, dir, "orders"), "o_orderstatus", "o_orderpriority", priorities,
          normalize = "index")
        Frame(ct.select(col("o_orderstatus") +:
          priorities.map(p => round(col(s"`$p`"), 6).as(p)): _*))
          .sortValues(Seq(SortKey.asc("o_orderstatus"))).df
      },
      Some("""
        SELECT o_orderstatus,
               round("1-URGENT" / t, 6) AS "1-URGENT",
               round("2-HIGH" / t, 6) AS "2-HIGH",
               round("3-MEDIUM" / t, 6) AS "3-MEDIUM",
               round("4-NOT SPECIFIED" / t, 6) AS "4-NOT SPECIFIED",
               round("5-LOW" / t, 6) AS "5-LOW"
        FROM (
          SELECT o_orderstatus,
                 count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS "1-URGENT",
                 count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS "2-HIGH",
                 count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
                 count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
                 count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS "5-LOW",
                 count(*) AS t
          FROM orders GROUP BY o_orderstatus)
        ORDER BY o_orderstatus"""))
  )
}

package graft.queries

import org.apache.spark.sql.functions._
import graft.api.{Frame, SortKey}
import QueryKit._

/**
 * Kaggle-style end-to-end stress chains (reference:
 * modin/stress_tests/kaggle/kaggle5.py — titanic feature engineering,
 * kaggle7/kaggle12 — temporal + regression prep). Each query chains 10+
 * operators the way a real notebook does (join → derive → str.extract →
 * binning → fillna → re-aggregate → window → sort), because cross-op
 * index/order/null propagation bugs only surface in long compositions —
 * the per-operator oracles can't see them.
 */
object StressQueries {

  val all: Seq[Q] = Seq(

    // Titanic-shape churn features: per-customer order aggregates, left
    // join onto the customer dim, fillna for the order-less, derived
    // ratio + regex id extraction + account-balance binning + categorical
    // coding, then the notebook's groupby summary table. 12 chained ops.
    Q("q213_e2e_customer_features",
      (s, dir) => {
        val perCust = f(s, dir, "orders")
          .withColumn("is_urgent",
            when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .groupby("o_custkey")
          .agg(
            "n_orders" -> count(lit(1)),
            "total_spend" -> round(sum(col("o_totalprice")), 2),
            "n_urgent" -> sum(col("is_urgent")))
        f(s, dir, "customer")
          .mergeOn(perCust, Seq("c_custkey"), Seq("o_custkey"), "left")
          .drop("o_custkey")
          .fillnaMap(Map("n_orders" -> 0L, "total_spend" -> 0.0, "n_urgent" -> 0L))
          .withColumn("avg_spend",
            when(col("n_orders") > 0, round(col("total_spend") / col("n_orders"), 2))
              .otherwise(0.0))
          .withColumn("cust_num",
            regexp_extract(col("c_name"), "([0-9]+)$", 1).cast("long"))
          .withColumn("bal_bin",
            when(col("c_acctbal") < 0, "negative")
              .when(col("c_acctbal") < 3000, "low")
              .when(col("c_acctbal") < 7000, "mid")
              .otherwise("high"))
          .withColumn("segment_code",
            when(col("c_mktsegment") === "AUTOMOBILE", 0L)
              .when(col("c_mktsegment") === "BUILDING", 1L)
              .when(col("c_mktsegment") === "FURNITURE", 2L)
              .when(col("c_mktsegment") === "HOUSEHOLD", 3L)
              .otherwise(4L))
          .groupby("c_mktsegment", "bal_bin")
          .agg(
            "n_cust" -> count(lit(1)),
            "active_frac" -> round(avg(when(col("n_orders") > 0, 1.0).otherwise(0.0)), 4),
            "avg_orders" -> round(avg(col("n_orders")), 4),
            "avg_spend_seg" -> round(avg(col("avg_spend")), 2),
            "max_urgent" -> max(col("n_urgent")),
            "seg_code" -> max(col("segment_code")),
            "max_custnum" -> max(col("cust_num")))
          .sortValues(Seq(SortKey.asc("c_mktsegment"), SortKey.asc("bal_bin"))).df
      },
      Some("""
        WITH per AS (
          SELECT o_custkey, count(*) AS n_orders,
                 round(sum(o_totalprice), 2) AS total_spend,
                 CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent
          FROM orders GROUP BY o_custkey),
        cf AS (
          SELECT c.c_name, c.c_mktsegment, c.c_acctbal,
                 coalesce(p.n_orders, 0) AS n_orders,
                 coalesce(p.total_spend, 0.0) AS total_spend,
                 coalesce(p.n_urgent, 0) AS n_urgent
          FROM customer c LEFT JOIN per p ON c.c_custkey = p.o_custkey),
        feat AS (
          SELECT *,
            CASE WHEN n_orders > 0 THEN round(total_spend / n_orders, 2)
                 ELSE 0.0 END AS avg_spend,
            CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) AS cust_num,
            CASE WHEN c_acctbal < 0 THEN 'negative'
                 WHEN c_acctbal < 3000 THEN 'low'
                 WHEN c_acctbal < 7000 THEN 'mid'
                 ELSE 'high' END AS bal_bin,
            CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 0 WHEN 'BUILDING' THEN 1
                 WHEN 'FURNITURE' THEN 2 WHEN 'HOUSEHOLD' THEN 3
                 ELSE 4 END AS seg_code_raw
          FROM cf)
        SELECT c_mktsegment, bal_bin,
               count(*) AS n_cust,
               round(avg(CASE WHEN n_orders > 0 THEN 1.0 ELSE 0.0 END), 4) AS active_frac,
               round(avg(n_orders), 4) AS avg_orders,
               round(avg(avg_spend), 2) AS avg_spend_seg,
               max(n_urgent) AS max_urgent,
               CAST(max(seg_code_raw) AS BIGINT) AS seg_code,
               max(cust_num) AS max_custnum
        FROM feat GROUP BY c_mktsegment, bal_bin
        ORDER BY c_mktsegment, bal_bin""")),

    // Taxi-notebook shape: revenue derivation, outlier filter, join to
    // the date dimension, calendar parts, monthly aggregate with a
    // weekend share, then month-over-month pct change per year. 11 ops.
    Q("q214_e2e_monthly_revenue",
      (s, dir) => {
        val ord = f(s, dir, "orders")
          .select("o_orderkey", "o_orderdate")
        f(s, dir, "lineitem")
          .withColumn("revenue", col("l_extendedprice") * (lit(1) - col("l_discount")))
          .filter(col("l_quantity") >= 1 && col("l_quantity") <= 49)
          .mergeOn(ord, Seq("l_orderkey"), Seq("o_orderkey"), "inner")
          .withColumn("yr", year(col("o_orderdate")).cast("long"))
          .withColumn("mo", month(col("o_orderdate")).cast("long"))
          .withColumn("is_weekend",
            when(dayofweek(col("o_orderdate")).isin(1, 7), 1.0).otherwise(0.0))
          .groupby("yr", "mo")
          .agg(
            "n_lines" -> count(lit(1)),
            "rev" -> round(sum(col("revenue")), 2),
            "avg_rev" -> round(avg(col("revenue")), 4),
            "wkd_frac" -> round(avg(col("is_weekend")), 4),
            "n_orders" -> count_distinct(col("l_orderkey")))
          .groupby("yr")
          .pctChange("rev", "rev_mom", Seq(SortKey.asc("mo")))
          .withColumn("rev_mom", round(col("rev_mom"), 6))
          .sortValues(Seq(SortKey.asc("yr"), SortKey.asc("mo"))).df
      },
      Some("""
        WITH j AS (
          SELECT l.l_orderkey,
                 l.l_extendedprice * (1 - l.l_discount) AS revenue,
                 o.o_orderdate
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE l.l_quantity BETWEEN 1 AND 49),
        m AS (
          SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
                 count(*) AS n_lines,
                 round(sum(revenue), 2) AS rev,
                 round(avg(revenue), 4) AS avg_rev,
                 round(avg(CASE WHEN dayofweek(o_orderdate) IN (0, 6)
                           THEN 1.0 ELSE 0.0 END), 4) AS wkd_frac,
                 count(DISTINCT l_orderkey) AS n_orders
          FROM j GROUP BY 1, 2)
        SELECT yr, mo, n_lines, rev, avg_rev, wkd_frac, n_orders,
               round((rev - lag(rev) OVER (PARTITION BY yr ORDER BY mo))
                     / lag(rev) OVER (PARTITION BY yr ORDER BY mo), 6) AS rev_mom
        FROM m ORDER BY yr, mo""")),

    // House-prices shape: sales aggregate joined onto the part dim,
    // regex feature extraction, size binning, zero-fill for never-sold
    // parts, MEDIAN-fill for the missing price feature (the notebook's
    // fillna(median) signature, via one broadcast scalar), markup
    // derivation, then the summary groupby. 12 ops. No intermediate
    // rounding: a 4-decimal markup rounded to 2 hits exact .xx5 ties
    // where Spark (decimal HALF_UP) and DuckDB (binary-double) disagree
    // per row — carry exact doubles through and round once at the end.
    Q("q215_e2e_part_pricing",
      (s, dir) => {
        val perPart = f(s, dir, "lineitem")
          .groupby("l_partkey")
          .agg(
            "n_sold" -> count(lit(1)),
            "qty_sold" -> sum(col("l_quantity")),
            "avg_sale" -> avg(col("l_extendedprice")))
        val joined = f(s, dir, "part")
          .mergeOn(perPart, Seq("p_partkey"), Seq("l_partkey"), "left")
          .drop("l_partkey")
          .withColumn("first_word", regexp_extract(col("p_name"), "^([a-z]+)", 1))
          .withColumn("brand_num",
            regexp_extract(col("p_brand"), "([0-9]+)$", 1).cast("long"))
          .withColumn("size_bin",
            when(col("p_size") <= 10, "small")
              .when(col("p_size") <= 25, "medium")
              .otherwise("large"))
          .fillnaMap(Map("n_sold" -> 0L, "qty_sold" -> 0.0))
        // median of the observed feature, broadcast as one scalar — the
        // distributed form of the notebook's fillna(df.col.median())
        val med = joined.df.agg(
          expr("percentile(avg_sale, 0.5)").as("__med"))
        Frame(joined.df.crossJoin(broadcast(med)))
          .withColumn("avg_sale_f", coalesce(col("avg_sale"), col("__med")))
          .drop("avg_sale", "__med")
          .withColumn("markup", col("avg_sale_f") - col("p_retailprice"))
          .groupby("first_word", "size_bin")
          .agg(
            "n_parts" -> count(lit(1)),
            "avg_markup" -> round(avg(col("markup")), 2),
            "sold_share" -> round(avg(when(col("n_sold") > 0, 1.0).otherwise(0.0)), 4),
            "total_qty" -> round(sum(col("qty_sold")), 2),
            "max_brand" -> max(col("brand_num")))
          .sortValues(Seq(SortKey.asc("first_word"), SortKey.asc("size_bin"))).df
      },
      Some("""
        WITH per AS (
          SELECT l_partkey, count(*) AS n_sold,
                 sum(l_quantity) AS qty_sold,
                 avg(l_extendedprice) AS avg_sale
          FROM lineitem GROUP BY l_partkey),
        joined AS (
          SELECT p.p_name, p.p_brand, p.p_size, p.p_retailprice,
                 regexp_extract(p.p_name, '^([a-z]+)', 1) AS first_word,
                 CAST(regexp_extract(p.p_brand, '([0-9]+)$', 1) AS BIGINT) AS brand_num,
                 CASE WHEN p.p_size <= 10 THEN 'small'
                      WHEN p.p_size <= 25 THEN 'medium'
                      ELSE 'large' END AS size_bin,
                 coalesce(s.n_sold, 0) AS n_sold,
                 coalesce(s.qty_sold, 0.0) AS qty_sold,
                 s.avg_sale
          FROM part p LEFT JOIN per s ON p.p_partkey = s.l_partkey),
        med AS (SELECT quantile_cont(avg_sale, 0.5) AS m FROM joined),
        feat AS (
          SELECT j.*, coalesce(j.avg_sale, med.m) AS avg_sale_f,
                 coalesce(j.avg_sale, med.m) - j.p_retailprice AS markup
          FROM joined j CROSS JOIN med)
        SELECT first_word, size_bin,
               count(*) AS n_parts,
               round(avg(markup), 2) AS avg_markup,
               round(avg(CASE WHEN n_sold > 0 THEN 1.0 ELSE 0.0 END), 4) AS sold_share,
               round(sum(qty_sold), 2) AS total_qty,
               max(brand_num) AS max_brand
        FROM feat GROUP BY first_word, size_bin
        ORDER BY first_word, size_bin"""))
  )
}

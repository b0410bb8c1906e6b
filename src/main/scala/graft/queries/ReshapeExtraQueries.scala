package graft.queries

import org.apache.spark.sql.functions._
import graft.api.{Frame, SortKey}
import graft.ops.Reshape
import QueryKit._

/**
 * §2.10 remainder: stack / unstack, transpose (driver-only, guarded),
 * repeat, qcut, wide_to_long (reference: QC:1988 stack, QC:1836 unstack,
 * frame transpose dataframe.py:4747, base:4720 repeat, general.py:313
 * qcut, base:4612 wide_to_long).
 */
object ReshapeExtraQueries {

  val all: Seq[Q] = Seq(

    // stack (wide→long via the `stack` SQL generator) then unstack back
    // (groupBy.pivot(first)) — the round-trip proves both directions.
    Q("q118_stack_unstack",
      (s, dir) => {
        val stacked = t(s, dir, "orders")
          .select(col("o_orderkey"),
            expr("stack(2, 'price', o_totalprice, 'cust', CAST(o_custkey AS DOUBLE)) AS (metric, value)"))
        val unstacked = stacked.groupBy(col("o_orderkey"))
          .pivot("metric", Seq("price", "cust"))
          .agg(first(col("value")))
        Frame(unstacked)
          .sortValues(Seq(SortKey.asc("o_orderkey"))).df
      },
      Some("""
        SELECT o_orderkey, o_totalprice AS price, CAST(o_custkey AS DOUBLE) AS cust
        FROM orders ORDER BY o_orderkey""")),

    // transpose — declared driver-only with a hard size guard (the
    // reference flips its 2-D block grid cheaply; Spark cannot, so only
    // reduction outputs may transpose — SURVEY §7.4.4 deviation).
    Q("q119_transpose_small",
      (s, dir) => {
        val agg = f(s, dir, "lineitem")
          .groupby("l_returnflag")
          .agg(
            "sum_qty" -> round(sum(col("l_quantity")), 2),
            "avg_price" -> round(avg(col("l_extendedprice")), 4))
          .sortValues(Seq(SortKey.asc("l_returnflag")))
        val rows = agg.df.collect() // tiny: one row per flag
        require(rows.length <= 100, "transpose guard: reduction outputs only")
        // build the transposed frame for ANY flag count (metric row per
        // input column, one output column per input row)
        val flags = rows.map(_.getString(0))
        val metrics = Seq("sum_qty" -> 1, "avg_price" -> 2)
        val schema = org.apache.spark.sql.types.StructType(
          org.apache.spark.sql.types.StructField("metric",
            org.apache.spark.sql.types.StringType) +:
            flags.map(f => org.apache.spark.sql.types.StructField(f,
              org.apache.spark.sql.types.DoubleType)).toIndexedSeq)
        val data = metrics.map { case (m, i) =>
          org.apache.spark.sql.Row.fromSeq(m +: rows.map(r => r.getDouble(i)).toIndexedSeq)
        }
        s.createDataFrame(s.sparkContext.parallelize(data), schema)
          .orderBy("metric")
      },
      Some("""
        SELECT 'avg_price' AS metric,
               round(avg(l_extendedprice) FILTER (WHERE l_returnflag = 'A'), 4) AS "A",
               round(avg(l_extendedprice) FILTER (WHERE l_returnflag = 'N'), 4) AS "N",
               round(avg(l_extendedprice) FILTER (WHERE l_returnflag = 'R'), 4) AS "R"
        FROM lineitem
        UNION ALL
        SELECT 'sum_qty',
               round(sum(l_quantity) FILTER (WHERE l_returnflag = 'A'), 2),
               round(sum(l_quantity) FILTER (WHERE l_returnflag = 'N'), 2),
               round(sum(l_quantity) FILTER (WHERE l_returnflag = 'R'), 2)
        FROM lineitem
        ORDER BY metric""")),

    // repeat (explode ∘ array_repeat) + qcut into quartile bin indices.
    // qcut bins by exact-percentile edges; an interpolated edge lies
    // strictly between two data cents, so ulp differences in the edge
    // cannot flip a row's bin (and d=0 edges are exact in both engines).
    Q("q120_repeat_qcut",
      (s, dir) => {
        val rep = t(s, dir, "region")
          .select(col("r_regionkey"),
            explode(array_repeat(col("r_name"), (col("r_regionkey") + 1).cast("int"))).as("name"))
          .groupBy(col("r_regionkey")).agg(count(lit(1)).as("n_rep"))
        val orders = t(s, dir, "orders")
        val e = orders.select(
          percentile(col("o_totalprice"), array(lit(0.25), lit(0.5), lit(0.75))).as("e"))
          .head().getSeq[Double](0)
        val binned = orders.select(
          (when(col("o_totalprice") <= e(0), 0)
            .when(col("o_totalprice") <= e(1), 1)
            .when(col("o_totalprice") <= e(2), 2)
            .otherwise(3)).as("price_quartile"))
          .groupBy(col("price_quartile")).agg(count(lit(1)).as("n_orders"))
        Frame(rep.crossJoin(binned))
          .sortValues(Seq(SortKey.asc("r_regionkey"), SortKey.asc("price_quartile"))).df
      },
      Some("""
        WITH rep AS (
          SELECT r_regionkey, count(*) AS n_rep FROM (
            SELECT r_regionkey, unnest(list_transform(range(r_regionkey + 1), x -> r_name)) AS name
            FROM region) GROUP BY r_regionkey),
        edges AS (
          SELECT quantile_cont(o_totalprice, [0.25, 0.5, 0.75]) AS e FROM orders),
        binned AS (
          SELECT CASE WHEN o_totalprice <= e[1] THEN 0
                      WHEN o_totalprice <= e[2] THEN 1
                      WHEN o_totalprice <= e[3] THEN 2
                      ELSE 3 END AS price_quartile, count(*) AS n_orders
          FROM orders, edges GROUP BY 1)
        SELECT r_regionkey, n_rep, price_quartile, n_orders
        FROM rep CROSS JOIN binned
        ORDER BY r_regionkey, price_quartile""")),

    // wide_to_long (melt + stub/suffix split from compound column names).
    Q("q121_wide_to_long",
      (s, dir) => {
        val wide = t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").as("val_qty"),
          col("l_extendedprice").as("val_price"))
        val long = wide.unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("val_qty"), col("val_price")),
          "compound", "val")
          .withColumn("suffix", regexp_extract(col("compound"), "^val_(.*)$", 1))
          .drop("compound")
        Frame(long.select(col("l_orderkey"), col("l_linenumber"), col("suffix"),
          round(col("val"), 2).as("val")))
          // val completes the total order over duplicate (l_orderkey,
          // l_linenumber) fixture pairs (~sf1 gate catch, round 15)
          .sortValues(Seq(SortKey.asc("l_orderkey"), SortKey.asc("l_linenumber"),
            SortKey.asc("suffix"), SortKey.asc("val"))).df
      },
      Some("""
        SELECT l_orderkey, l_linenumber, suffix, round(val, 2) AS val FROM (
          SELECT l_orderkey, l_linenumber, 'qty' AS suffix, l_quantity AS val FROM lineitem
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem)
        ORDER BY l_orderkey, l_linenumber, suffix, val""")),

    // pandas.lreshape (reference base QC:4612 — default_to_pandas):
    // parallel groups stack position-wise; a union of per-position
    // projections, map-only. Stacking (quantity, price) and (discount,
    // tax) as two groups of two; position is carried as a third group of
    // literals so the output rows sort deterministically.
    Q("q212_lreshape",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .withColumn("p0", lit(0L)).withColumn("p1", lit(1L))
        Frame(Reshape.lreshape(li,
          ids = Seq("l_orderkey", "l_linenumber"),
          groups = Seq(
            "pos" -> Seq("p0", "p1"),
            "amount" -> Seq("l_quantity", "l_extendedprice"),
            "rate" -> Seq("l_discount", "l_tax")))
          .select(col("l_orderkey"), col("l_linenumber"), col("pos"),
            round(col("amount"), 2).as("amount"), round(col("rate"), 2).as("rate")))
          // amount/rate complete the total order over duplicate
          // (l_orderkey, l_linenumber) fixture pairs (same class as the
          // q81/q121 ~sf1 gate catch, round 15)
          .sortValues(Seq(SortKey.asc("l_orderkey"), SortKey.asc("l_linenumber"),
            SortKey.asc("pos"), SortKey.asc("amount"), SortKey.asc("rate"))).df
      },
      Some("""
        SELECT l_orderkey, l_linenumber, pos,
               round(amount, 2) AS amount, round(rate, 2) AS rate FROM (
          SELECT l_orderkey, l_linenumber, CAST(0 AS BIGINT) AS pos,
                 l_quantity AS amount, l_discount AS rate FROM lineitem
          UNION ALL
          SELECT l_orderkey, l_linenumber, 1, l_extendedprice, l_tax FROM lineitem)
        ORDER BY l_orderkey, l_linenumber, pos, amount, rate""")),

    // MultiIndex round trip (reference set_index dataframe.py:4310,
    // swaplevel base.py:3297, sort_index base.py:2654): set_index(2) →
    // groupby(level=[0,1]) → swaplevel → sort_index → reset_index. The
    // level ops are indexCols-metadata reorders; what the oracle checks
    // is that they PROPAGATE — the reset puts the swapped levels
    // leftmost and sort_index orders rows by the post-swap level order.
    Q("q217_multiindex_roundtrip",
      (s, dir) => f(s, dir, "lineitem")
        .setIndex("l_returnflag", "l_linestatus")
        .groupbyLevel(0, 1)
        .agg(
          "n" -> count(lit(1)),
          "qty" -> round(sum(col("l_quantity")), 2),
          "rev" -> moneySum(col("l_extendedprice")))
        .swapLevel()
        .sortIndex()
        .resetIndex().df,
      Some("""
        SELECT l_linestatus, l_returnflag, count(*) AS n,
               round(sum(l_quantity), 2) AS qty,
               round(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS DECIMAL(18,0))) AS DOUBLE) / 100.0, 2) AS rev
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_linestatus, l_returnflag""")))
}

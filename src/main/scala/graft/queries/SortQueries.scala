package graft.queries

import org.apache.spark.sql.functions._
import graft.api.{Frame, SortKey}
import graft.ops.RowOrder
import QueryKit._

/**
 * §2.7 sorts / limits / top-k + §2.8 set operations
 * (reference: sort_rows_by_column_values QC:4773 — TeraSort via sampled
 * pivots, identical physics to Spark's RangePartitioner orderBy; nlargest
 * QC:2653; concat QC:482; set ops via concat/drop_duplicates/merge/isin).
 */
object SortQueries {

  val all: Seq[Q] = Seq(

    // Global sort (BASELINE shape 5): range-shuffle sort, no driver funnel.
    Q("q40_sort_global",
      (s, dir) => f(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .sortValues(Seq(SortKey.desc("o_totalprice"), SortKey.asc("o_orderkey"))).df,
      Some("""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey"""),
      headline = true),

    // nlargest/nsmallest (reference QC:2653): TakeOrdered physical plan —
    // per-partition top-k + driver merge of k·p rows, no global shuffle.
    Q("q41_nlargest",
      (s, dir) => {
        val top = f(s, dir, "orders")
          .select("o_orderkey", "o_totalprice")
          .sortValues(Seq(SortKey.desc("o_totalprice"), SortKey.asc("o_orderkey")))
          .head(100)
        top.df
      },
      Some("""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")),

    // head + tail under a declared ordering (reference head/tail via
    // positional masks over cached block lengths; here two TakeOrdered
    // passes — tail flips the order, takes n, restores order).
    Q("q42_head_tail",
      (s, dir) => {
        val o = f(s, dir, "orders")
          .select("o_orderkey", "o_totalprice")
          .copy(ordering = Seq(SortKey.asc("o_orderkey")))
        val h = o.sortValues(Seq(SortKey.asc("o_orderkey"))).head(50)
        val t = o.tail(50)
        h.concat(t).sortValues(Seq(SortKey.asc("o_orderkey"))).df
      },
      Some("""
        SELECT * FROM (
          (SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 50)
          UNION ALL
          (SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey DESC LIMIT 50))
        ORDER BY o_orderkey""")),

    // iloc positional slice (reference take_2d_positional QC:4684) —
    // exercises the two-pass block-offset row numbering in ops.RowOrder
    // (range repartition + per-partition offsets; no single-task window).
    Q("q43_iloc_slice",
      (s, dir) => {
        val o = Frame(
          t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
          ordering = Seq(SortKey.asc("o_orderkey")))
        RowOrder.ilocSlice(o, 1000, 1100)
          .sortValues(Seq(SortKey.asc("o_orderkey")))
          .drop(Frame.RowOrder).df
      },
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_orderkey LIMIT 100 OFFSET 1000""")),

    // concat axis=0 of two heterogeneous-but-aligned projections
    // (reference concat QC:482 — zero-shuffle union).
    Q("q44_concat",
      (s, dir) => {
        val c = f(s, dir, "customer")
          .selectExprs(col("c_custkey").as("id"), col("c_name").as("name"),
            lit("customer").as("src"))
        val sup = f(s, dir, "supplier")
          .selectExprs(col("s_suppkey").as("id"), col("s_name").as("name"),
            lit("supplier").as("src"))
        c.concat(sup).sortValues(Seq(SortKey.asc("src"), SortKey.asc("id"))).df
      },
      Some("""
        SELECT * FROM (
          SELECT c_custkey AS id, c_name AS name, 'customer' AS src FROM customer
          UNION ALL
          SELECT s_suppkey, s_name, 'supplier' FROM supplier)
        ORDER BY src, id""")),

    // concat axis=1 (reference concat QC:482 column-wise: copartition
    // rows, stitch columns). Spark has no row identity, so both sides
    // materialize __row_order__ under the SAME declared order (two-pass
    // block offsets — ops.RowOrder) and equi-join on it: a shuffle join
    // on a dense long key, scalable, order-faithful.
    Q("q136_concat_axis1",
      (s, dir) => {
        import graft.ops.RowOrder
        val ord = Seq(SortKey.asc("o_orderkey"))
        val left = RowOrder.withRowOrder(
          t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice")), ord)
        val right = RowOrder.withRowOrder(
          t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority")), ord)
          .withColumnRenamed("o_orderkey", "__k2__")
        Frame(left.join(right, "__row_order__")
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"),
            (col("o_orderkey") === col("__k2__")).as("aligned")))
          .sortValues(Seq(SortKey.asc("o_orderkey"))).df
      },
      Some("""
        SELECT o_orderkey, o_totalprice, o_orderpriority, true AS aligned
        FROM orders ORDER BY o_orderkey""")),

    // set ops (§2.8): intersect / except / union-distinct on key sets.
    Q("q45_setops",
      (s, dir) => {
        val cn = t(s, dir, "customer").select(col("c_nationkey").as("k")).distinct()
        val sn = t(s, dir, "supplier").select(col("s_nationkey").as("k")).distinct()
        val both = cn.intersect(sn).withColumn("op", lit("intersect"))
        val onlyC = cn.except(sn).withColumn("op", lit("except"))
        val either = cn.union(sn).distinct().withColumn("op", lit("union"))
        Frame(both.unionByName(onlyC).unionByName(either))
          .sortValues(Seq(SortKey.asc("op"), SortKey.asc("k"))).df
      },
      Some("""
        SELECT k, op FROM (
          SELECT k, 'intersect' AS op FROM
            (SELECT DISTINCT c_nationkey k FROM customer
             INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
          UNION ALL
          SELECT k, 'except' FROM
            (SELECT DISTINCT c_nationkey k FROM customer
             EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
          UNION ALL
          SELECT k, 'union' FROM
            (SELECT DISTINCT c_nationkey k FROM customer
             UNION SELECT DISTINCT s_nationkey FROM supplier))
        ORDER BY op, k""")),

    // unique / distinct + sort_index shape (reference unique QC:2231 family).
    Q("q46_unique_sorted",
      (s, dir) => f(s, dir, "lineitem")
        .select("l_quantity").df.distinct()
        .orderBy(col("l_quantity")),
      Some("""
        SELECT DISTINCT l_quantity FROM lineitem ORDER BY l_quantity""")),

    // sort_index(axis=1) + squeeze (r9 — upgrades the two tested-only
    // §2 rows to oracle rows). Column order is invisible to the gate's
    // name-sorted compare, so the query OBSERVES it: a md5 signature
    // concat_ws'd over the post-sort frame's column sequence — if the
    // reorder drifts from the label sort the signature flips. squeeze
    // collapses the one-column signature frame to its Series analog
    // before the final aggregate.
    Q("q227_sort_axis1_squeeze",
      (s, dir) => {
        // deliberately scrambled projection order
        val base = t(s, dir, "lineitem")
          .select(col("l_quantity"), col("l_orderkey"), col("l_returnflag"),
            col("l_linenumber"))
        val sorted = Frame(base).sortIndexAxis1() // linenumber, orderkey, quantity, returnflag
        val sig = sorted.df.select(md5(concat_ws("|",
          sorted.df.columns.toIndexedSeq.map(c => col(c).cast("string")): _*)).as("sig"))
        val series = Frame(sig).squeeze()
        series.df.agg(count(lit(1)).as("n"),
          count_distinct(col("sig")).as("n_distinct"),
          min(col("sig")).as("first_sig"))
      },
      Some("""
        SELECT count(*) AS n, count(DISTINCT sig) AS n_distinct, min(sig) AS first_sig
        FROM (SELECT md5(concat_ws('|',
                CAST(l_linenumber AS VARCHAR), CAST(l_orderkey AS VARCHAR),
                CAST(l_quantity AS VARCHAR), CAST(l_returnflag AS VARCHAR))) AS sig
              FROM lineitem)""")))
}

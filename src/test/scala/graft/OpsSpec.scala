package graft

import org.apache.spark.sql.functions._
import graft.api.{Frame, SortKey}
import graft.ops.{Cumulative, Ewm, Missing, RowOrder}

/** Distributed-plan ops: two-pass row order, parallel-prefix cumulatives,
  * ewm recurrence, exact interpolation. */
class OpsSpec extends SparkSuite {

  test("withRowOrder assigns dense 0..n-1 following the sort keys") {
    val df = table("orders").select("o_orderkey", "o_totalprice")
    val ordered = RowOrder.withRowOrder(df, Seq(SortKey.asc("o_orderkey")), Some(4))
    val rows = ordered.orderBy("__row_order__")
      .select("o_orderkey", "__row_order__").collect()
    assert(rows.map(_.getLong(1)).toSeq == rows.indices.map(_.toLong))
    // row order must follow key order
    val keys = rows.map(_.getLong(0))
    assert(keys.sorted.toSeq == keys.toSeq)
  }

  test("ilocSlice returns exactly [start, end) under the declared order") {
    val fr = Frame(table("orders").select("o_orderkey"),
      ordering = Seq(SortKey.asc("o_orderkey")))
    val sliced = RowOrder.ilocSlice(fr, 5, 9).df
      .orderBy("o_orderkey").collect().map(_.getLong(0)).toSeq
    val expected = table("orders").orderBy("o_orderkey")
      .collect().map(_.getLong(0)).slice(5, 9).toSeq
    assert(sliced == expected)
  }

  test("globalRunning sum/max equals the naive unpartitioned window") {
    val base = table("orders")
      .select(col("o_orderkey"), col("o_totalprice").cast("decimal(30,6)").as("v"))
    val run = Cumulative.globalRunning(base, Seq(SortKey.asc("o_orderkey")), "sum",
      Seq("v" -> "cs"), numPartitions = Some(5))
    val w = org.apache.spark.sql.expressions.Window.orderBy("o_orderkey")
      .rowsBetween(Long.MinValue, 0)
    val naive = base.withColumn("cs", sum(col("v")).over(w))
    assertParity(
      run.select(col("o_orderkey"), col("cs").cast("double")),
      naive.select(col("o_orderkey"), col("cs").cast("double")))
  }

  test("ewm recurrence matches the closed-form weighted mean") {
    import spark.implicits._
    val d = Seq((1L, 1L, 1L, 10.0), (1L, 2L, 2L, 20.0), (1L, 3L, 3L, 30.0))
      .toDF("k", "o", "id", "v")
    val out = Ewm.meanByKey(d, "k", "o", "id", "v", alpha = 0.5, out = "e")
      .orderBy("o").collect().map(_.getAs[Double]("e")).toSeq
    // adjust=True: [10, (20+0.5*10)/1.5, (30+0.5*20+0.25*10)/1.75]
    val expected = Seq(10.0, 25.0 / 1.5, 42.5 / 1.75)
    out.zip(expected).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9, s"$a vs $b") }
  }

  test("interpolateLinear fills interior gaps linearly, trailing with last, leading stays null") {
    import spark.implicits._
    val d = Seq[(String, Long, java.lang.Double)](
      ("u", 1L, null), ("u", 2L, 10.0), ("u", 3L, null), ("u", 4L, null),
      ("u", 5L, 16.0), ("u", 6L, null))
      .toDF("k", "i", "v")
    val out = Missing.interpolateLinear(d, Seq("k"), Seq(SortKey.asc("i")), "v", "vi")
      .orderBy("i").collect().map(r => Option(r.getAs[java.lang.Double]("vi")).map(_.toDouble)).toSeq
    assert(out == Seq(None, Some(10.0), Some(12.0), Some(14.0), Some(16.0), Some(16.0)))
  }
}

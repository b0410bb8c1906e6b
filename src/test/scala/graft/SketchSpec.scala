package graft

import org.apache.spark.sql.functions._
import graft.ops.Sketch

/** Bottom-k (KMV) cardinality sketch invariants: exactness below k,
  * estimator accuracy ~1/sqrt(k), buffer invariant under reduce/merge,
  * mergeability (sketch of union == merge of stored sketches), null
  * exclusion, and determinism. */
class SketchSpec extends SparkSuite {
  import spark.implicits._

  test("below k distinct values the estimate is exact") {
    val df = (1 to 40).map(i => ("g", i)).toDF("g", "v")
    val r = Sketch.ndvByGroup(df, Seq("g"), "v", k = 64).collect().head
    assert(r.getAs[Long]("sketch_size") == 40L)
    assert(r.getAs[Double]("ndv_est") == 40.0)
  }

  test("estimator lands within 3/sqrt(k) of the true cardinality") {
    val n = 20000
    val df = (1 to n).map(i => ("g", i)).toDF("g", "v")
    val k = 256
    val est = Sketch.ndvByGroup(df, Seq("g"), "v", k).collect().head.getAs[Double]("ndv_est")
    val relErr = math.abs(est - n) / n
    assert(relErr <= 3.0 / math.sqrt(k), s"est $est vs true $n: relErr $relErr")
  }

  test("reduce keeps the buffer sorted, distinct, and bounded at k") {
    val agg = new Sketch.BottomK(8)
    val vals = Seq(90L, 10L, 50L, 10L, 70L, 30L, 20L, 80L, 60L, 40L, 5L, 90L)
    val buf = vals.foldLeft(agg.zero)(agg.reduce)
    assert(buf.toSeq == Seq(5L, 10L, 20L, 30L, 40L, 50L, 60L, 70L))
    assert(buf.length == 8)
    // a value above the current max of a full buffer is a no-op
    assert(agg.reduce(buf, 99L) eq buf)
  }

  test("merge == sketch of the union, duplicates collapse once") {
    val agg = new Sketch.BottomK(6)
    val a = Seq(1L, 3L, 5L, 7L, 9L, 11L).toArray
    val b = Seq(2L, 3L, 6L, 7L, 10L, 12L).toArray
    val m = agg.merge(a, b)
    assert(m.toSeq == Seq(1L, 2L, 3L, 5L, 6L, 7L))
    val viaReduce = (a ++ b).foldLeft(agg.zero)(agg.reduce)
    assert(m.toSeq == viaReduce.toSeq)
    assert(agg.merge(agg.zero, a).toSeq == a.toSeq)
    assert(agg.merge(a, agg.zero).toSeq == a.toSeq)
  }

  test("per-shard sketches merged later equal the one-shot sketch") {
    // the incremental-catalog contract: persist a sketch per shard,
    // union the arrays with the same aggregator, estimate once
    val all = (1 to 5000).map(i => ("g", i * 17 + 3))
    val (s1, s2) = all.splitAt(2400)
    val k = 128
    def sk(rows: Seq[(String, Int)]) = {
      val df = rows.toDF("g", "v")
      df.select(Sketch.hash60(col("v")).as("h"))
        .groupBy().agg(Sketch.bottomKAgg(col("h"), k).as("sk"))
        .collect().head.getAs[scala.collection.Seq[Long]]("sk").toArray
    }
    val agg = new Sketch.BottomK(k)
    val merged = agg.merge(sk(s1), sk(s2))
    assert(merged.toSeq == sk(all).toSeq)
  }

  test("nulls are excluded like pandas nunique(dropna=True)") {
    val df = Seq(("g", Some(1)), ("g", None), ("g", Some(2)), ("g", None))
      .toDF("g", "v")
    val r = Sketch.ndvByGroup(df, Seq("g"), "v", 16).collect().head
    assert(r.getAs[Long]("sketch_size") == 2L)
    assert(r.getAs[Double]("ndv_est") == 2.0)
  }

  test("deterministic across reruns and partitionings") {
    val df = (1 to 3000).map(i => (s"g${i % 3}", i)).toDF("g", "v")
    def run(parts: Int) =
      Sketch.ndvByGroup(df.repartition(parts), Seq("g"), "v", 32)
        .orderBy("g").collect().map(_.toSeq).toSeq
    assert(run(2) == run(7))
    assert(run(7) == run(7))
  }

  test("GroupBy.nunique(approx=k) is exact below k and matches exact mode there") {
    val df = (1 to 90).map(i => (s"g${i % 3}", i % 25)).toDF("g", "v")
    val exact = graft.api.Frame(df).groupby("g").nunique("v", "ndv")
      .df.orderBy("g").collect().map(r => r.getString(0) -> r.getLong(1).toDouble)
    val approx = graft.api.Frame(df).groupby("g").nunique("v", "ndv", approx = 64)
      .df.orderBy("g").collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(approx.toSeq == exact.toSeq) // every group's NDV < k=64 -> exact
  }

  test("Frame.nunique long form: exact mode counts, approx=k exact below k") {
    val df = (1 to 50).map(i => (i % 7, s"s${i % 11}")).toDF("a", "b")
    val exact = graft.api.Frame(df).nunique(Seq("a", "b"))
      .df.orderBy("column").collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(exact.toSeq == Seq("a" -> 7.0, "b" -> 11.0))
    val approx = graft.api.Frame(df).nunique(Seq("a", "b"), approx = 32)
      .df.orderBy("column").collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(approx.toSeq == exact.toSeq)
  }
}

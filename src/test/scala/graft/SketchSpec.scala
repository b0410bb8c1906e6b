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

  // ---- heavy hitters (Misra–Gries candidates + exact verify) ----

  test("heavyHitters returns exactly the values with count >= phi*n, boundary inclusive") {
    val rows = Seq.fill(300)("a") ++ Seq.fill(100)("b") ++
      Seq.fill(50)("c") ++ (1 to 550).map(i => s"u$i") // n = 1000
    val df = rows.toDF("v")
    // phi = 5% -> threshold 50: "c" sits exactly on the boundary (>=)
    val r = Sketch.heavyHitters(df, "v", 5, 100)
      .orderBy(desc("cnt"), col("v")).collect()
      .map(x => (x.getString(0), x.getLong(1)))
    assert(r.toSeq == Seq("a" -> 300L, "b" -> 100L, "c" -> 50L))
  }

  test("heavyHitters deterministic across partitionings and equals brute force") {
    val rows = (1 to 5000).map(i => s"v${i % 37}") ++ Seq.fill(800)("hot")
    def run(p: Int) =
      Sketch.heavyHitters(rows.toDF("v").repartition(p), "v", 1, 10)
        .orderBy("v").collect().map(x => (x.getString(0), x.getLong(1))).toSeq
    val truth = rows.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
      .filter(_._2 * 10L >= rows.size.toLong).toSeq.sortBy(_._1)
    assert(run(1) == truth)
    assert(run(13) == truth)
    assert(run(32) == truth)
  }

  test("heavyHitters excludes nulls from counts and from the total") {
    val df = (Seq.fill(6)(Some("x")) ++ Seq.fill(4)(Option.empty[String]) ++
      Seq(Some("y"))).toDF("v")
    // n = 7 non-null; phi = 1/2 -> only x (6 >= 3.5)
    val r = Sketch.heavyHitters(df, "v", 1, 2).collect()
      .map(x => (x.getString(0), x.getLong(1)))
    assert(r.toSeq == Seq("x" -> 6L))
  }

  test("heavyHittersByGroup: per-group thresholds, group isolation, brute parity") {
    // "x" is heavy in g1 (60%) but light in g2 (2%); "y" heavy only in g2
    val rows = Seq.fill(60)(("g1", "x")) ++ (1 to 40).map(i => ("g1", s"a$i")) ++
      Seq.fill(4)(("g2", "x")) ++ Seq.fill(80)(("g2", "y")) ++
      (1 to 116).map(i => ("g2", s"b$i"))
    def run(p: Int) =
      Sketch.heavyHittersByGroup(rows.toDF("g", "v").repartition(p),
          Seq("g"), "v", 1, 10)
        .orderBy("g", "v").collect()
        .map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSeq
    val truth = rows.groupBy(identity).map { case ((g, v), occ) =>
      (g, v, occ.size.toLong)
    }.filter { case (g, _, c) =>
      c * 10L >= rows.count(_._1 == g).toLong
    }.toSeq.sortBy(x => (x._1, x._2))
    assert(truth.map(t => (t._1, t._2)) == Seq(("g1", "x"), ("g2", "y")))
    assert(run(1) == truth)
    assert(run(7) == truth)
    assert(run(32) == truth)
  }

  // ---- quantized-histogram quantile ----

  test("quantileQuantized matches pandas linear interpolation at a lossless scale") {
    val df = Seq(10, 20, 30, 40).toDF("v")
    val out = Sketch.quantileQuantized(df, "v",
        Seq((0L, 1L), (1L, 4L), (1L, 2L), (3L, 4L), (1L, 1L)), 0)
    // the exact rational rides along for integer-safe downstream pivots
    assert(out.columns.toSeq == Seq("q_num", "q_den", "q", "value"))
    val r = out.select("q", "value")
      .orderBy("q").collect().map(x => (x.getDouble(0), x.getDouble(1)))
    // pandas: r = (n-1)q over [10,20,30,40]
    assert(r.toSeq == Seq(0.0 -> 10.0, 0.25 -> 17.5, 0.5 -> 25.0,
      0.75 -> 32.5, 1.0 -> 40.0))
    val rats = out.select("q_num", "q_den").orderBy("q")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(rats.toSeq == Seq((0L, 1L), (1L, 4L), (1L, 2L), (3L, 4L), (1L, 1L)))
  }

  test("quantization error is bounded by half a unit of 10^-scale") {
    val vals = (1 to 999).map(_ * 0.777)
    val exactMedian = vals.sorted.apply(499) // (n-1)*0.5 = 499 exactly
    val r = Sketch.quantileQuantized(vals.toDF("v"), "v", Seq((1L, 2L)), 1)
      .collect().head.getAs[Double]("value")
    assert(math.abs(r - exactMedian) <= 0.05 + 1e-9,
      s"median $r vs exact $exactMedian")
  }

  test("negative scale buckets coarsely and rescales back") {
    val df = Seq(100.0, 200.0, 300.0).toDF("v")
    val r = Sketch.quantileQuantized(df, "v", Seq((1L, 2L)), -2)
      .collect().head.getAs[Double]("value")
    assert(r == 200.0)
  }

  test("grouped quantile sketch equals running each group alone; deterministic") {
    val df = (1 to 200).map(i => (s"g${i % 2}", i.toDouble)).toDF("g", "v")
    val qs = Seq((1L, 2L), (9L, 10L))
    val grouped = Sketch.quantileQuantizedBy(df.repartition(7), Seq("g"), "v", qs, 0)
      .select("g", "q", "value").orderBy("g", "q").collect()
      .map(x => (x.getString(0), x.getDouble(1), x.getDouble(2))).toSeq
    val solo = Seq("g0", "g1").flatMap { g =>
      Sketch.quantileQuantized(df.filter(col("g") === g), "v", qs, 0)
        .select("q", "value")
        .orderBy("q").collect().map(x => (g, x.getDouble(0), x.getDouble(1)))
    }
    assert(grouped == solo)
    val again = Sketch.quantileQuantizedBy(df.repartition(3), Seq("g"), "v", qs, 0)
      .select("g", "q", "value").orderBy("g", "q").collect()
      .map(x => (x.getString(0), x.getDouble(1), x.getDouble(2))).toSeq
    assert(grouped == again)
  }

  test("describeQuantized: exact moments at lossless scale, null std below 2 rows") {
    val df = Seq(10, 20, 30, 40).toDF("v")
    val r = Sketch.describeQuantized(df, "v", 0).collect()
      .map(x => x.getString(0) -> (if (x.isNullAt(1)) Double.NaN else x.getDouble(1)))
      .toMap
    assert(r("count") == 4.0 && r("mean") == 25.0)
    assert(r("min") == 10.0 && r("max") == 40.0)
    assert(r("25%") == 17.5 && r("50%") == 25.0 && r("75%") == 32.5)
    // sample var = (nΣq² − (Σq)²)/(n(n−1)) = (4·3000 − 10000)/12
    assert(r("std") == math.sqrt(2000.0 / 12.0))
    val one = Sketch.describeQuantized(Seq(7).toDF("v"), "v", 0).collect()
      .map(x => x.getString(0) -> x.isNullAt(1)).toMap
    assert(one("std"), "std of a single row must be null (pandas NaN)")
    // determinism across partitionings (the decimal moments are
    // associative — any partition order, same bits)
    val big = (1 to 5000).map(i => i * 0.37).toDF("v")
    def run(p: Int) = Sketch.describeQuantized(big.repartition(p), "v", 1)
      .orderBy("stat").collect().map(x => (x.getString(0), x.getDouble(1))).toSeq
    assert(run(2) == run(31))
  }

  test("weightedQuantileQuantized equals inverted-cdf on the weight-expanded multiset") {
    val data = Seq((1.0, 1), (2.0, 1), (3.0, 2), (5.0, 4))
    val df = data.toDF("v", "w")
    val expanded = data.flatMap { case (v, w) => Seq.fill(w)(v) }.sorted
    def invertedCdf(q: Double): Double = {
      // smallest x with ecdf(x) >= q over the expanded multiset
      val W = expanded.size
      expanded(math.max(0, math.ceil(q * W).toInt - 1))
    }
    val qs = Seq((1L, 4L), (1L, 2L), (3L, 4L), (1L, 1L))
    val r = Sketch.weightedQuantileQuantized(df.repartition(3), "v", "w", qs, 0)
      .select("q", "value")
      .orderBy("q").collect().map(x => (x.getDouble(0), x.getDouble(1))).toSeq
    assert(r == qs.map { case (n, d) =>
      (n.toDouble / d, invertedCdf(n.toDouble / d)) })
    // zero/negative/null weights drop (numpy's non-negativity contract)
    val dirty = Seq((1.0, Some(0)), (2.0, Some(-3)), (3.0, Option.empty[Int]),
      (4.0, Some(2))).toDF("v", "w")
    val only4 = Sketch.weightedQuantileQuantized(dirty, "v", "w", Seq((1L, 2L)), 0)
      .collect().head.getAs[Double]("value")
    assert(only4 == 4.0)
  }

  test("weightedQuantileQuantizedBy equals running each group alone") {
    val df = (1 to 120).map(i => (s"g${i % 3}", i.toDouble, 1 + i % 5))
      .toDF("g", "v", "w")
    val qs = Seq((1L, 2L), (9L, 10L))
    val grouped = Sketch.weightedQuantileQuantizedBy(
        df.repartition(7), Seq("g"), "v", "w", qs, 0)
      .select("g", "q", "value").orderBy("g", "q").collect()
      .map(x => (x.getString(0), x.getDouble(1), x.getDouble(2))).toSeq
    val solo = Seq("g0", "g1", "g2").flatMap { g =>
      Sketch.weightedQuantileQuantized(df.filter(col("g") === g), "v", "w", qs, 0)
        .select("q", "value")
        .orderBy("q").collect().map(x => (g, x.getDouble(0), x.getDouble(1)))
    }
    assert(grouped == solo)
  }

  test("describeQuantizedBy equals running describe on each group alone") {
    val df = (1 to 100).map(i => (s"g${i % 2}", i * 1.0)).toDF("g", "v")
    val grouped = Sketch.describeQuantizedBy(df.repartition(5), Seq("g"), "v", 0)
      .orderBy("g", "stat").collect()
      .map(x => (x.getString(0), x.getString(1), x.getDouble(2))).toSeq
    val solo = Seq("g0", "g1").flatMap { g =>
      Sketch.describeQuantized(df.filter(col("g") === g), "v", 0)
        .orderBy("stat").collect()
        .map(x => (g, x.getString(0), x.getDouble(1)))
    }
    assert(grouped == solo)
    val api = graft.api.Frame(df).groupby("g").describeApprox("v", 0)
      .df.orderBy("g", "stat").collect()
      .map(x => (x.getString(0), x.getString(1), x.getDouble(2))).toSeq
    assert(api == grouped)
  }

  test("Frame.heavyHitters / quantileApprox and GroupBy.quantileApprox wire through") {
    val hh = graft.api.Frame(
        (Seq.fill(30)("a") ++ Seq.fill(5)("b") ++ (1 to 65).map(i => s"u$i")).toDF("v"))
      .heavyHitters("v", 0.25).df.collect()
      .map(x => (x.getString(0), x.getLong(1)))
    assert(hh.toSeq == Seq("a" -> 30L)) // 30 >= 25, b/u* below
    val fq = graft.api.Frame(Seq(10, 20, 30, 40).toDF("v"))
      .quantileApprox("v", Seq(0.5), 0).df.collect().head
    assert(fq.getDouble(0) == 0.5 && fq.getDouble(1) == 25.0)
    val gq = graft.api.Frame((1 to 100).map(i => (s"g${i % 2}", i)).toDF("g", "v"))
      .groupby("g").quantileApprox("v", Seq(0.5), 0)
      .df.orderBy("g").collect()
      .map(x => (x.getString(0), x.getDouble(1), x.getDouble(2)))
    // g0: evens 2..100 -> median 51; g1: odds 1..99 -> median 50
    assert(gq.toSeq == Seq(("g0", 0.5, 51.0), ("g1", 0.5, 50.0)))
  }
}

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

  test("groupedRunning equals the naive keyed window under heavy skew and null edges") {
    import spark.implicits._
    // one hot key (0) holding ~70% of rows — forced to span several of
    // the 6 range partitions — plus singleton keys, a key whose rows are
    // all null, and a group whose FIRST rows are null (the carried-prefix
    // edge in combine)
    val rows = (0 until 700).map(i => (0L, i.toLong, Option(i.toDouble))) ++
      (0 until 100).map(i => (1L + i % 7, 1000L + i, if (i % 5 == 0) None else Some(i.toDouble))) ++
      Seq((99L, 1L, None), (99L, 2L, None),
        (98L, 1L, None), (98L, 2L, Some(5.0)), (98L, 3L, None), (98L, 4L, Some(7.0)))
    val d = rows.toDF("k", "o", "v")
    val run = Cumulative.groupedRunning(d, Seq("k"), Seq(SortKey.asc("o")), "sum",
      Seq("v" -> "cs"), numPartitions = Some(6))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("o")
      .rowsBetween(Long.MinValue, 0)
    val naive = d.withColumn("cs", sum(col("v")).over(w))
    assertParity(
      run.select(col("k"), col("o"), col("cs")),
      naive.select(col("k"), col("o"), col("cs")))
    // max flavor too (greatest-based combine)
    val runMax = Cumulative.groupedRunning(d, Seq("k"), Seq(SortKey.asc("o")), "max",
      Seq("v" -> "cm"), numPartitions = Some(6))
    val naiveMax = d.withColumn("cm", max(col("v")).over(w))
    assertParity(
      runMax.select(col("k"), col("o"), col("cm")),
      naiveMax.select(col("k"), col("o"), col("cm")))
  }

  test("groupedRunning carries the prefix for a NULL-keyed group spanning partitions") {
    import spark.implicits._
    // Window.partitionBy treats a null key as one ordinary group; the
    // boundary stitch must join null-safely (<=>) or the null group's
    // chunks past the first partition silently lose their carried prefix
    // (ADVICE r7, medium). 400 null-keyed rows across 6 range partitions
    // force the group over several boundaries.
    val rows: Seq[(java.lang.Long, Long, java.lang.Double)] =
      (0 until 400).map(i => (null: java.lang.Long, i.toLong,
        java.lang.Double.valueOf((i % 9).toDouble))) ++
      (0 until 60).map(i => (java.lang.Long.valueOf(i % 5), 1000L + i,
        if (i % 7 == 0) null else java.lang.Double.valueOf(1.0)))
    val d = rows.toDF("k", "o", "v")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("o")
      .rowsBetween(Long.MinValue, 0)
    for (f <- Seq("sum", "max", "min")) {
      val run = Cumulative.groupedRunning(d, Seq("k"), Seq(SortKey.asc("o")), f,
        Seq("v" -> "cs"), numPartitions = Some(6))
      val naiveAgg = f match {
        case "sum" => sum(col("v")) case "max" => max(col("v")) case _ => min(col("v"))
      }
      val naive = d.withColumn("cs", naiveAgg.over(w))
      assertParity(run.select(col("k"), col("o"), col("cs")),
        naive.select(col("k"), col("o"), col("cs")))
    }
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

  test("ewm skips null values while still decaying weights (ignore_na=False)") {
    import spark.implicits._
    val d = Seq[(Long, Long, Long, java.lang.Double)](
      (1L, 1L, 1L, null), (1L, 2L, 2L, 10.0), (1L, 3L, 3L, null), (1L, 4L, 4L, 30.0))
      .toDF("k", "o", "id", "v")
    val out = Ewm.meanByKey(d, "k", "o", "id", "v", alpha = 0.5, out = "e")
      .orderBy("o").collect()
      .map(r => Option(r.getAs[java.lang.Double]("e")).map(_.toDouble)).toSeq
    // pandas ewm(alpha=0.5, adjust=True): null before any value → NaN;
    // at the second null the prior mean carries; the gap decays the
    // weight of x=10 to 0.25 by the time x=30 arrives → (30+0.25*10)/1.25
    assert(out(0).isEmpty)
    assert(out(1).contains(10.0))
    assert(out(2).contains(10.0))
    assert(out(3).exists(v => math.abs(v - 32.5 / 1.25) < 1e-9))
  }

  test("resample bucketWith label=right works for quarter (no interval literal)") {
    import spark.implicits._
    // QUARTER is a date_trunc field but not a Spark interval unit — the
    // label=right edge must step 3 months instead of an interval literal
    val d = Seq("2024-02-15 10:00:00", "2024-11-01 00:00:00")
      .toDF("s").select(col("s").cast("timestamp").as("ts"))
    val got = d.select(graft.ops.Resample.bucketWith(col("ts"), "quarter",
      closed = "left", label = "right").cast("string").as("b"))
      .orderBy("b").collect().map(_.getString(0)).toSeq
    assert(got == Seq("2024-04-01 00:00:00", "2025-01-01 00:00:00"), got)
  }

  test("ewm treats a NaN value as missing, not a reset/poison observation") {
    import spark.implicits._
    // pandas ewm(alpha=0.5, adjust=True) on [1, NaN, 3]:
    //   mean = [1.0, 1.0, 2.6], var = [NaN, NaN, 2.0]
    val d = Seq((1L, 1L, 1L, 1.0), (1L, 2L, 2L, Double.NaN), (1L, 3L, 3L, 3.0))
      .toDF("k", "o", "id", "v")
    val m = Ewm.meanByKey(d, "k", "o", "id", "v", alpha = 0.5, out = "e")
      .orderBy("o").collect()
      .map(r => Option(r.getAs[java.lang.Double]("e")).map(_.toDouble)).toSeq
    assert(m(0).contains(1.0) && m(1).contains(1.0))
    assert(m(2).exists(x => math.abs(x - 2.6) < 1e-9), s"got ${m(2)}")
    val vr = Ewm.varByKey(d, "k", "o", "id", "v", alpha = 0.5, out = "ev")
      .orderBy("o").collect()
      .map(r => Option(r.getAs[java.lang.Double]("ev")).map(_.toDouble)).toSeq
    assert(vr(0).isEmpty && vr(1).isEmpty)
    assert(vr(2).exists(x => math.abs(x - 2.0) < 1e-9), s"got ${vr(2)}")
  }

  test("ewm adjust/ignore_na combinations match pandas on a gappy series") {
    import spark.implicits._
    // series [2, null, 4, null, null, 1, 5], alpha=0.5 — expectations
    // generated from pandas 2.x ewm(alpha=0.5, adjust=?, ignore_na=?)
    val d = Seq[(Long, Long, Long, java.lang.Double)](
      (1L, 1L, 1L, 2.0), (1L, 2L, 2L, null), (1L, 3L, 3L, 4.0),
      (1L, 4L, 4L, null), (1L, 5L, 5L, null), (1L, 6L, 6L, 1.0), (1L, 7L, 7L, 5.0))
      .toDF("k", "o", "id", "v")
    val expect = Map(
      (true, true)   -> Seq(2.0, 2.0, 3.3333333333, 3.3333333333, 3.3333333333, 2.0, 3.6),
      (true, false)  -> Seq(2.0, 2.0, 3.6, 3.6, 3.6, 1.3513513514, 3.6633663366),
      (false, true)  -> Seq(2.0, 2.0, 3.0, 3.0, 3.0, 2.0, 3.5),
      (false, false) -> Seq(2.0, 2.0, 3.3333333333, 3.3333333333, 3.3333333333, 1.4666666667, 3.2333333333))
    expect.foreach { case ((adjust, ignoreNa), want) =>
      val got = Ewm.meanByKey(d, "k", "o", "id", "v", alpha = 0.5, out = "e",
        adjust = adjust, ignoreNa = ignoreNa)
        .orderBy("o").collect().map(_.getAs[Double]("e")).toSeq
      got.zip(want).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"adjust=$adjust ignoreNa=$ignoreNa: $got vs $want")
      }
    }
  }

  test("multimodal extractFeatures survives a null payload") {
    import spark.implicits._
    val packed = Seq[(Long, Array[Byte])]((1L, "ab".getBytes("UTF-8")), (2L, null))
      .toDF("doc_id", "payload")
    val out = graft.ops.Multimodal.extractFeatures(packed, "doc_id")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("feat0") == 'a'.toLong)
    assert(out(1).isNullAt(out(1).fieldIndex("feat0")))
    assert(out(1).getAs[Int]("n_bytes") == 0)
  }

  test("graft_cosine declares nullable and returns null on length mismatch") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val e = graft.plans.CosineSim(
      Literal.create(Array(1.0f), ArrayType(FloatType)),
      Literal.create(Array(1.0f, 2.0f), ArrayType(FloatType)))
    assert(e.nullable)
    val d = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    graft.plans.GraftExtensions.register(spark)
    val r = d.select(org.apache.spark.sql.functions
      .call_function("graft_cosine", col("a"), col("b")).as("c")).head()
    assert(r.isNullAt(0))
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

  test("interpolate pad/nearest/index: fill rules, midpoint ties, x-coordinate line") {
    import spark.implicits._
    // group k: positions 1..6, valids at rows 2 and 5 (x = 10 and 40)
    val d = Seq[(String, Long, java.lang.Double)](
      ("k", 0L, null), ("k", 10L, 10.0), ("k", 20L, null),
      ("k", 30L, null), ("k", 40L, 40.0), ("k", 50L, null))
      .toDF("k", "x", "v")
    val ord = Seq(SortKey.asc("x"))
    def vals(df: org.apache.spark.sql.DataFrame, c: String) =
      df.orderBy("x").collect()
        .map(r => Option(r.getAs[java.lang.Double](c)).map(_.toDouble)).toSeq
    // pad: forward-fill, leading null stays
    assert(vals(Missing.interpolatePad(d, Seq("k"), ord, "v", "o"), "o")
      == Seq(None, Some(10.0), Some(10.0), Some(10.0), Some(40.0), Some(40.0)))
    // nearest BY ROW POSITION: row 3 is 1 from prev/2 from next → 10;
    // row 4 is 2 from prev/1 from next → 40; trailing → last valid
    assert(vals(Missing.interpolateNearest(d, Seq("k"), ord, "v", "o"), "o")
      == Seq(None, Some(10.0), Some(10.0), Some(40.0), Some(40.0), Some(40.0)))
    // nearest midpoint tie takes the PREVIOUS (scipy kind='nearest')
    val tie = Seq[(String, Long, java.lang.Double)](
      ("k", 1L, 1.0), ("k", 2L, null), ("k", 3L, 9.0)).toDF("k", "x", "v")
    assert(vals(Missing.interpolateNearest(tie, Seq("k"), ord, "v", "o"), "o")
      == Seq(Some(1.0), Some(1.0), Some(9.0)))
    // index: the line through (10, 10) and (40, 40) evaluated at x
    assert(vals(Missing.interpolateIndex(d, Seq("k"), ord, "x", "v", "o"), "o")
      == Seq(None, Some(10.0), Some(20.0), Some(30.0), Some(40.0), Some(40.0)))
    // index refuses a non-integral x column
    val bad = Seq(("k", 1.5, 1.0)).toDF("k", "x", "v")
    val e = intercept[IllegalArgumentException] {
      Missing.interpolateIndex(bad, Seq("k"), ord, "x", "v", "o")
    }
    assert(e.getMessage.contains("integral"))
    // duplicate index values: both neighbors at the same x would make
    // g = 0 (ANSI divide-by-zero without the guard); pandas/np.interp
    // right-bias the tie — pd.Series([1, NaN, 3], index=[5,5,5])
    // .interpolate('index') == [1, 3, 3]
    val dup = Seq[(String, Long, Long, java.lang.Double)](
      ("k", 1L, 5L, 1.0), ("k", 2L, 5L, null), ("k", 3L, 5L, 3.0))
      .toDF("k", "i", "x", "v")
    val dupOut = Missing.interpolateIndex(dup, Seq("k"), Seq(SortKey.asc("i")), "x", "v", "o")
      .orderBy("i").collect().map(_.getAs[Double]("o")).toSeq
    assert(dupOut == Seq(1.0, 3.0, 3.0))
  }

  test("lreshape stacks groups position-wise; dropna drops any-null stacked rows") {
    import spark.implicits._
    val wide = Seq(
      (1L, 10.0, 100.0, "a", "b"),
      (2L, 20.0, 200.0, null, "d"))
      .toDF("id", "v1", "v2", "t1", "t2")
    val groups = Seq("v" -> Seq("v1", "v2"), "t" -> Seq("t1", "t2"))
    val kept = graft.ops.Reshape.lreshape(wide, Seq("id"), groups)
      .orderBy("id", "v").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    // (2, 20.0, null) drops: one null in the stacked row is enough
    assert(kept == Seq((1L, 10.0, "a"), (1L, 100.0, "b"), (2L, 200.0, "d")))
    assert(graft.ops.Reshape.lreshape(wide, Seq("id"), groups, dropna = false).count() == 4)
    // mismatched group lengths fail fast
    val e = intercept[IllegalArgumentException] {
      graft.ops.Reshape.lreshape(wide, Seq("id"), Seq("v" -> Seq("v1", "v2"), "t" -> Seq("t1")))
    }
    assert(e.getMessage.contains("same number"))
  }

  test("withAvgRank matches the rank-window identity, nulls keep null") {
    import spark.implicits._
    val d = Seq[(Long, java.lang.Double)](
      (1L, 10.0), (2L, 20.0), (3L, 20.0), (4L, null), (5L, 5.0), (6L, 20.0))
      .toDF("id", "v")
    val got = graft.ops.Rank.withAvgRank(d, "v", "rk")
      .orderBy("id").collect()
      .map(r => Option(r.getAs[java.lang.Double]("rk")).map(_.toDouble)).toSeq
    // sorted non-nulls: 5,10,20,20,20 -> ranks 1,2,(3+4+5)/3=4
    assert(got == Seq(Some(2.0), Some(4.0), Some(4.0), None, Some(1.0), Some(4.0)))
  }

  test("withAvgRank treats NaN as missing (pandas na_option='keep'), not as the largest value") {
    import spark.implicits._
    val d = Seq[(Long, java.lang.Double)](
      (1L, 10.0), (2L, Double.NaN), (3L, 5.0), (4L, null))
      .toDF("id", "v")
    val got = graft.ops.Rank.withAvgRank(d, "v", "rk")
      .orderBy("id").collect()
      .map { r =>
        val v = r.getAs[java.lang.Double]("rk")
        if (v == null || v.isNaN) None else Some(v.toDouble)
      }.toSeq
    // NaN and null both rank as missing; 5.0 → 1, 10.0 → 2
    assert(got == Seq(Some(2.0), None, Some(1.0), None))
  }

  test("spearman is exactly ±1 on monotone transforms, matches window oracle") {
    val li = table("lineitem")
      .select(col("l_orderkey"), col("l_quantity"),
        (col("l_quantity") * 2 + 1).as("up"), (-col("l_quantity")).as("down"))
    val r = graft.ops.Rank.spearman(li, "l_quantity", Seq("up", "down")).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1) + 1.0) < 1e-12)
  }

  test("sketch aggregates land within tolerance of the exact answers") {
    import graft.functions.Stats
    val li = table("lineitem")
    val r = li.agg(
      Stats.nuniqueApprox(col("l_partkey"), rsd = 0.02).as("nd"),
      countDistinct(col("l_partkey")).as("nd_exact"),
      Stats.quantileApprox(col("l_extendedprice"), 0.5, accuracy = 10000).as("q50"),
      expr("percentile(l_extendedprice, 0.5)").as("q50_exact")).collect()(0)
    val nd = r.getAs[Long]("nd").toDouble
    val ndExact = r.getAs[Long]("nd_exact").toDouble
    assert(math.abs(nd - ndExact) / ndExact < 0.05,
      s"HLL distinct $nd should be within 5% of exact $ndExact")
    val q50 = r.getAs[Double]("q50")
    val q50Exact = r.getAs[Double]("q50_exact")
    assert(math.abs(q50 - q50Exact) / q50Exact < 0.02,
      s"approx median $q50 should be within 2% of exact $q50Exact")
  }

  test("ewm var matches pandas bias=False values") {
    import spark.implicits._
    // pandas: Series([1,2,4]).ewm(alpha=0.5).var() -> [NaN, 0.5, 2.5]
    val d = Seq((1L, 1L, 1L, 1.0), (1L, 2L, 2L, 2.0), (1L, 3L, 3L, 4.0))
      .toDF("k", "o", "id", "v")
    val out = Ewm.varByKey(d, "k", "o", "id", "v", alpha = 0.5, out = "ev")
      .orderBy("o").collect()
      .map(r => Option(r.getAs[java.lang.Double]("ev")).map(_.toDouble)).toSeq
    assert(out(0).isEmpty)
    assert(math.abs(out(1).get - 0.5) < 1e-12)
    assert(math.abs(out(2).get - 2.5) < 1e-12)
  }

  test("dyadic ewm var matches the double recurrence and handles null/NaN the same") {
    import spark.implicits._
    // pin: dyadic inputs quantize losslessly, so the capped path
    // reproduces pandas' [NaN, 0.5, 2.5] to fp-division precision
    val d = Seq((1L, 1L, 1L, 1.0), (1L, 2L, 2L, 2.0), (1L, 3L, 3L, 4.0))
      .toDF("k", "o", "id", "v")
    val out = Ewm.varByKeyDyadic(d, "k", "o", "id", "v", out = "ev")
      .orderBy("o").collect()
      .map(r => Option(r.getAs[java.lang.Double]("ev")).map(_.toDouble)).toSeq
    assert(out(0).isEmpty)
    assert(out(1).exists(x => math.abs(x - 0.5) < 1e-12), s"got $out")
    assert(out(2).exists(x => math.abs(x - 2.5) < 1e-12), s"got $out")

    // NaN is a missing observation, same as the recurrence path
    val gap = Seq((1L, 1L, 1L, 1.0), (1L, 2L, 2L, Double.NaN), (1L, 3L, 3L, 3.0))
      .toDF("k", "o", "id", "v")
    val gv = Ewm.varByKeyDyadic(gap, "k", "o", "id", "v", out = "ev")
      .orderBy("o").collect()
      .map(r => Option(r.getAs[java.lang.Double]("ev")).map(_.toDouble)).toSeq
    assert(gv(0).isEmpty && gv(1).isEmpty)
    assert(gv(2).exists(x => math.abs(x - 2.0) < 1e-9), s"got ${gv(2)}")

    // parity with the unbounded double recurrence on a 3-group random
    // fixture incl. nulls: the 2^-30 quantization and 2^-40 weight floor
    // perturb var by ≲2^-40·x_max² ABSOLUTE (the floor drops tail mass
    // proportional to the raw-moment sums, so the error scales with x²,
    // not with var)
    val rnd = new scala.util.Random(42)
    val rows = (1 to 300).map { i =>
      val v: java.lang.Double =
        if (rnd.nextInt(10) == 0) null else rnd.nextDouble() * 560.0
      (i % 3L, i.toLong, i.toLong, v)
    }
    val big = rows.toDF("k", "o", "id", "v")
    val a = Ewm.varByKey(big, "k", "o", "id", "v", alpha = 0.5, out = "ev")
      .select("id", "ev").as[(Long, Option[Double])].collect().toMap
    val b = Ewm.varByKeyDyadic(big, "k", "o", "id", "v", out = "ev")
      .select("id", "ev").as[(Long, Option[Double])].collect().toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (id, av) =>
      (av, b(id)) match {
        case (Some(x), Some(y)) =>
          assert(math.abs(x - y) <= 1e-6 + 1e-9 * math.abs(x), s"id=$id $x vs $y")
        case (x, y) => assert(x == y, s"id=$id $x vs $y")
      }
    }
  }

  test("ewm cov(x,x) equals ewm var; corr is ±1 on linear pairs, null on constants") {
    import spark.implicits._
    val d = Seq((1L, 1L, 1L, 1.0, 1.0), (1L, 2L, 2L, 2.0, 2.0), (1L, 3L, 3L, 4.0, 4.0))
      .toDF("k", "o", "id", "x", "y")
    // cov of a series with itself IS its variance — pandas identity
    val cov = Ewm.covByKey(d, "k", "o", "id", "x", "y", alpha = 0.5, out = "ec")
      .orderBy("o").collect()
    val vr = Ewm.varByKey(d, "k", "o", "id", "x", alpha = 0.5, out = "ev")
      .orderBy("o").collect()
    (1 until 3).foreach { i =>
      assert(math.abs(cov(i).getAs[Double]("ec") - vr(i).getAs[Double]("ev")) < 1e-12)
      assert(math.abs(cov(i).getAs[Double]("ec_corr") - 1.0) < 1e-12)
    }
    assert(cov(0).isNullAt(cov(0).fieldIndex("ec")))
    // y = -2x + 7: corr exactly -1
    val neg = Seq((1L, 1L, 1L, 1.0, 5.0), (1L, 2L, 2L, 2.0, 3.0), (1L, 3L, 3L, 4.0, -1.0))
      .toDF("k", "o", "id", "x", "y")
    val nc = Ewm.covByKey(neg, "k", "o", "id", "x", "y", alpha = 0.5, out = "ec")
      .orderBy("o").collect()
    assert(math.abs(nc(2).getAs[Double]("ec_corr") + 1.0) < 1e-12)
    // constant y: corr undefined (null), cov 0
    val const = Seq((1L, 1L, 1L, 1.0, 9.0), (1L, 2L, 2L, 2.0, 9.0))
      .toDF("k", "o", "id", "x", "y")
    val cc = Ewm.covByKey(const, "k", "o", "id", "x", "y", alpha = 0.5, out = "ec")
      .orderBy("o").collect()
    assert(cc(1).isNullAt(cc(1).fieldIndex("ec_corr")))
    assert(math.abs(cc(1).getAs[Double]("ec")) < 1e-12)
    // a null in EITHER series is a missing PAIR: decays but adds no obs
    val gappy = Seq((1L, 1L, 1L, Some(1.0), Some(1.0)), (1L, 2L, 2L, Some(2.0), None),
      (1L, 3L, 3L, Some(4.0), Some(4.0))).toDF("k", "o", "id", "x", "y")
    val gp = Ewm.covByKey(gappy, "k", "o", "id", "x", "y", alpha = 0.5, out = "ec")
      .orderBy("o").collect()
    assert(gp(1).isNullAt(gp(1).fieldIndex("ec"))) // still one pair only
    assert(gp(2).getAs[Double]("ec") > 0)          // second pair arrives
  }

  test("kendall tau-b is ±1 on monotone data and guards high-cardinality cells") {
    import spark.implicits._
    val d = (1 to 100).map(i => (i.toLong, i.toLong * 2, -i.toLong)).toDF("x", "up", "down")
    assert(math.abs(graft.ops.Rank.kendall(d, "x", "up").collect()(0).getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(graft.ops.Rank.kendall(d, "x", "down").collect()(0).getDouble(0) + 1.0) < 1e-12)
    intercept[IllegalArgumentException] {
      graft.ops.Rank.kendall(d, "x", "up", maxCells = 10)
    }
  }

  test("autocorr is 1 on a strictly increasing series") {
    import spark.implicits._
    val d = (1 to 200).map(i => (i.toLong, i.toDouble * 3 + 7)).toDF("i", "x")
    val r = graft.ops.Rank.autocorr(d, Seq(SortKey.asc("i")), "x", Seq(1, 3)).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-9)
  }

  test("RmsCentsAgg stays exact past the single-long Σc² overflow point") {
    import spark.implicits._
    // 50k rows of 15,000,000 cents: Σc² = 1.125e19 > 2⁶³ ≈ 9.22e18 — a
    // single-long buffer wraps negative here (the sf0.1 q128 bug); the
    // split accumulator must return exactly the common value
    val rms = udaf(graft.queries.RmsCentsAgg)
    val c = 15000000L
    val flat = (1 to 50000).map(_ => c).toDF("c")
      .agg(rms(col("c"))).head().getDouble(0)
    assert(flat == c / 100.0, s"got $flat")
    // mixed magnitudes vs a BigInt driver fold (order-independent check)
    val rng = new scala.util.Random(7)
    val vals = Seq.fill(20000)((rng.nextInt(40000000) + 1).toLong)
    val got = vals.toDF("c").repartition(8)
      .agg(rms(col("c"))).head().getDouble(0)
    val sumSq = vals.map(v => BigInt(v) * BigInt(v)).sum
    val want = math.sqrt((BigDecimal(sumSq) / vals.size).toDouble) / 100.0
    assert(math.abs(got - want) / want < 1e-12, s"got $got want $want")
  }
}

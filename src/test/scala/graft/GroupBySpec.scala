package graft

import org.apache.spark.sql.functions._
import graft.api.{Frame, SortKey}

/** §2.5 GroupBy semantics. */
class GroupBySpec extends SparkSuite {

  import org.apache.spark.sql.Row

  private def ev = Frame(table("events"))
  private val ord = Seq(SortKey.asc("ts"), SortKey.asc("event_id"))

  test("agg matches SQL group aggregate") {
    val got = Frame(table("lineitem")).groupby("l_returnflag")
      .agg("s" -> round(sum(col("l_quantity")), 2), "n" -> count(lit(1))).df
    assertMatchesSql(got,
      "SELECT l_returnflag, round(sum(l_quantity),2) AS s, count(*) AS n FROM lineitem GROUP BY 1",
      Seq("lineitem"))
  }

  test("cumsum is a running per-group prefix") {
    import spark.implicits._
    val d = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 4.0), ("b", 1L, 10.0))
      .toDF("k", "i", "v")
    val out = Frame(d).groupby("k")
      .cumsum("v", "cs", Seq(SortKey.asc("i")))
      .df.orderBy("k", "i").collect().map(_.getAs[Double]("cs")).toSeq
    assert(out == Seq(1.0, 3.0, 7.0, 10.0))
  }

  test("shift lags within group only") {
    import spark.implicits._
    val d = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 1L, 9.0)).toDF("k", "i", "v")
    val out = Frame(d).groupby("k").shift("v", "p", 1, Seq(SortKey.asc("i")))
      .df.orderBy("k", "i").collect().map(r => Option(r.getAs[java.lang.Double]("p"))).toSeq
    assert(out == Seq(None, Some(1.0), None))
  }

  test("pct_change over a zero base follows pandas/IEEE (±Inf, 0/0→NaN), not ANSI abort") {
    import spark.implicits._
    // base=0.0 under ANSI mode used to throw DIVIDE_BY_ZERO (round-12
    // fuzzer seed 78); pandas: (v - prev)/prev with prev=0 → ±inf, 0/0 → nan
    val d = Seq(("a", 1L, 0.0), ("a", 2L, 5.0), ("a", 3L, 0.0), ("a", 4L, 0.0),
      ("a", 5L, -3.0), ("b", 1L, 0.0), ("b", 2L, java.lang.Double.NaN))
      .toDF("k", "i", "v")
    val out = Frame(d).groupby("k").pctChange("v", "pc", Seq(SortKey.asc("i")))
      .df.orderBy("k", "i").collect()
      .map(r => Option(r.getAs[java.lang.Double]("pc")).map(_.doubleValue)).toSeq
    assert(out(0).isEmpty)                                  // first row: no base
    assert(out(1).contains(Double.PositiveInfinity))        // 5/0
    assert(out(2).contains(-1.0))                           // (0-5)/5
    assert(out(3).exists(_.isNaN))                          // 0/0
    assert(out(4).contains(Double.NegativeInfinity))        // -3/0
    assert(out(5).isEmpty)                                  // first row of b
    assert(out(6).exists(_.isNaN))                          // NaN input propagates
    // integer inputs divide as doubles (pandas pct_change is float64)
    val li = Seq(("a", 1L, 0L), ("a", 2L, 7L)).toDF("k", "i", "v")
    val got = Frame(li).groupby("k").pctChange("v", "pc", Seq(SortKey.asc("i")))
      .df.orderBy("i").collect().map(r => Option(r.getAs[java.lang.Double]("pc")))
    assert(got(0).isEmpty && got(1).exists(_.isInfinite))
  }

  test("rank method=min vs dense vs first") {
    import spark.implicits._
    val d = Seq(("a", 1.0), ("a", 1.0), ("a", 2.0)).toDF("k", "v")
    def ranks(m: String) = Frame(d).groupby("k").rank("v", "r", m)
      .df.orderBy(col("v"), col("r")).collect().map(_.getAs[Number]("r").longValue).toSeq
    assert(ranks("min") == Seq(1L, 1L, 3L))
    assert(ranks("dense") == Seq(1L, 1L, 2L))
    assert(ranks("first") == Seq(1L, 2L, 3L))
  }

  test("cumsum skips nulls in the carry but emits null AT null rows (pandas skipna)") {
    import spark.implicits._
    val d = Seq(("a", 1L, Some(1.0)), ("a", 2L, None), ("a", 3L, Some(2.0)))
      .toDF("k", "i", "v")
    val got = Frame(d).groupby("k").cumsum("v", "cs", Seq(SortKey.asc("i")))
      .df.orderBy("i").collect()
      .map(r => Option(r.getAs[java.lang.Double]("cs")).map(_.toDouble)).toSeq
    assert(got == Seq(Some(1.0), None, Some(3.0)))
  }

  test("rank dense pct divides by the per-group distinct count (null keys kept)") {
    import spark.implicits._
    // group "a": distinct {1,2,5} → pct = dense/3; null group: {7} → 1/1;
    // null AND NaN value rows never rank and never count toward the
    // denominator (pandas na_option='keep' treats NaN as missing)
    val d = Seq(
      (Some("a"), Some(1.0)), (Some("a"), Some(1.0)), (Some("a"), Some(2.0)),
      (Some("a"), Some(5.0)), (Some("a"), None), (Some("a"), Some(Double.NaN)),
      (None, Some(7.0))).toDF("k", "v")
    val got = Frame(d).groupby("k").rank("v", "r", "dense", pct = true)
      .df.orderBy(col("k").asc_nulls_last, col("v").asc_nulls_last)
      .collect().map(r => Option(r.getAs[java.lang.Double]("r")).map(_.toDouble))
    // ordering puts NaN after reals, nulls after NaN within group "a"
    assert(got.toSeq == Seq(
      Some(1.0 / 3), Some(1.0 / 3), Some(2.0 / 3), Some(3.0 / 3), None, None,
      Some(1.0)))
  }

  test("headPerGroup / nth / tailPerGroup positional semantics") {
    val h = ev.groupby("user_id").headPerGroup(3, ord).df
      .groupBy("user_id").count().agg(max("count")).head().getLong(0)
    assert(h <= 3)
    val n0 = ev.groupby("user_id").nth(0, ord).df.count()
    val users = table("events").select("user_id").distinct().count()
    assert(n0 == users)
  }

  test("ngroup ids are dense 0..G-1 in sorted key order") {
    val out = Frame(table("orders")).groupby("o_orderpriority").ngroup("gid")
      .df.select("o_orderpriority", "gid").distinct()
      .orderBy("o_orderpriority").collect()
    assert(out.map(_.getLong(1)).toSeq == out.indices.map(_.toLong))
  }

  test("cumprodLong exact integer running product") {
    import spark.implicits._
    val d = Seq(("a", 1L, 2L), ("a", 2L, 3L), ("a", 3L, 5L)).toDF("k", "i", "v")
    val out = Frame(d).groupby("k").cumprodLong("v", "cp", Seq(SortKey.asc("i")))
      .df.orderBy("i").collect().map(_.getAs[Long]("cp")).toSeq
    assert(out == Seq(2L, 6L, 30L))
  }

  test("cumprodDouble matches cumprodLong on bounded integer groups") {
    import spark.implicits._
    // 40 rows / 2 groups, factors in {1,2,3}: products stay ≪ 2^53 so the
    // exact path is a valid oracle for the exp∘sum∘log path
    val d = (1 to 40).map(i => (s"g${i % 2}", i.toLong, (i % 3 + 1).toLong))
      .toDF("k", "i", "v")
    val exact = Frame(d).groupby("k").cumprodLong("v", "cp", Seq(SortKey.asc("i")))
      .df.orderBy("i").collect().map(_.getAs[Long]("cp"))
    val approx = Frame(d).groupby("k").cumprodDouble("v", "cp", Seq(SortKey.asc("i")))
      .df.orderBy("i").collect().map(_.getAs[Double]("cp"))
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(a - e.toDouble) <= math.abs(e.toDouble) * 1e-12,
        s"exact=$e approx=$a") }
  }

  test("cumprodDouble sign, zero, and null handling") {
    import org.apache.spark.sql.Row
    import spark.implicits._
    val d = Seq(("a", 1L, Some(-2.0)), ("a", 2L, Some(3.0)), ("a", 3L, None),
      ("a", 4L, Some(0.0)), ("a", 5L, Some(-5.0)))
      .toDF("k", "i", "v")
    val out = Frame(d).groupby("k").cumprodDouble("v", "cp", Seq(SortKey.asc("i")))
      .df.orderBy("i").collect().map(r => Option(r.getAs[java.lang.Double]("cp")).map(_.toDouble))
    assert(out(0).contains(-2.0) && out(1).contains(-6.0)) // sign carried
    assert(out(2).isEmpty)                                 // null row → null
    assert(out(3).contains(-0.0) || out(3).contains(0.0))  // zero kills the product
    assert(out(4).exists(v => v == 0.0 || v == -0.0))      // …and stays dead
  }

  test("idxminmax picks extremum labels with deterministic ties") {
    import spark.implicits._
    val d = Seq(("g", 5L, 1.0), ("g", 3L, 1.0), ("g", 7L, 9.0)).toDF("k", "id", "v")
    val r = Frame(d).groupby("k").idxminmax("v", "id").df.head()
    assert(r.getAs[Long]("idxmin") == 3L) // smallest label among ties
    assert(r.getAs[Long]("idxmax") == 7L)
  }

  test("fluent grouped rolling gates on min_periods per group") {
    import spark.implicits._
    val d = Frame(Seq((1L, 1L, 2.0), (1L, 2L, 4.0), (1L, 3L, 6.0),
      (2L, 1L, 10.0)).toDF("k", "o", "v"))
    val got = d.groupby("k").rolling(2, Seq(SortKey.asc("o"))).mean("v", "m")
      .df.orderBy("k", "o").collect()
      .map(r => Option(r.getAs[java.lang.Double]("m")).map(_.toDouble))
    // group 1 warms up then rolls: null, 3, 5; group 2 restarts: null
    assert(got.toSeq == Seq(None, Some(3.0), Some(5.0), None))
  }

  test("rank keeps nulls out of both rank and pct denominator (na_option='keep')") {
    import spark.implicits._
    val d = Frame(Seq[(Long, java.lang.Double)]((1L, null), (1L, 5.0), (1L, 3.0))
      .toDF("k", "v"))
    val got = d.groupby("k").rank("v", "rk", method = "min", pct = true)
      .df.orderBy(col("v").asc_nulls_first).collect()
      .map(r => Option(r.getAs[java.lang.Double]("rk")).map(_.toDouble)).toSeq
    // null row → null; 3.0 → 1/2; 5.0 → 2/2 (nulls consume no ranks)
    assert(got == Seq(None, Some(0.5), Some(1.0)))
  }

  test("rolling center=true uses pandas even-window offsets (extra row on past side)") {
    import spark.implicits._
    val d = Frame((1L to 6L).map(i => (1L, i, i.toDouble)).toDF("k", "o", "v"))
    val got = d.groupby("k").rolling(4, Seq(SortKey.asc("o")), center = true)
      .sum("v", "s").df.orderBy("o").collect()
      .map(r => Option(r.getAs[java.lang.Double]("s")).map(_.toDouble))
    // pandas: rolling(4, center=True) frame at i = [i-2, i+1]; full frames
    // only at positions 3..5 (1-based): 1+2+3+4, 2+3+4+5, 3+4+5+6
    assert(got.toSeq == Seq(None, None, Some(10.0), Some(14.0), Some(18.0), None))
  }

  test("rollingTime closed variants pin exact interval edges and empty windows") {
    import spark.implicits._
    // rows at t = 0, 100, 200µs with window 100µs
    val d = Frame(Seq((1L, 0L, 1.0), (1L, 100L, 2.0), (1L, 200L, 4.0))
      .toDF("k", "us", "v"))
    def sums(closed: String): Seq[Option[Double]] =
      d.groupby("k").rollingTime(100L, "us", closed = closed).sum("v", "s")
        .df.orderBy("us").collect()
        .map(r => Option(r.getAs[java.lang.Double]("s")).map(_.toDouble)).toSeq
    assert(sums("right") == Seq(Some(1.0), Some(2.0), Some(4.0)))   // (t-w, t] — t-w itself excluded
    assert(sums("both") == Seq(Some(1.0), Some(3.0), Some(6.0)))    // [t-w, t]
    assert(sums("left") == Seq(None, Some(1.0), Some(2.0)))         // [t-w, t): first row empty
    assert(sums("neither") == Seq(None, None, None))                // (t-w, t): all empty
  }

  test("groupby.ewm fluent accessor equals the Ewm ops and routes alpha=0.5 to the dyadic kernel") {
    import spark.implicits._
    import graft.ops.Ewm
    val d = Seq((1L, 1L, 1L, 1.0), (1L, 2L, 2L, 2.0), (1L, 3L, 3L, 4.0),
      (2L, 1L, 4L, 10.0), (2L, 2L, 5L, 20.0)).toDF("k", "o", "id", "v")
    val g = Frame(d).groupby("k").ewm("o", "id", alpha = 0.5)

    val m = g.mean("v", "e").df.orderBy("id").collect().map(_.getAs[Double]("e")).toSeq
    val mOp = Ewm.meanByKey(d, "k", "o", "id", "v", 0.5, "e")
      .orderBy("id").collect().map(_.getAs[Double]("e")).toSeq
    assert(m == mOp)

    // alpha=0.5 variance goes through the deterministic dyadic kernel
    val v = g.variance("v", "ev").df.orderBy("id").collect()
      .map(r => Option(r.getAs[java.lang.Double]("ev")).map(_.toDouble)).toSeq
    val vOp = Ewm.varByKeyDyadic(d, "k", "o", "id", "v", out = "ev")
      .orderBy("id").collect()
      .map(r => Option(r.getAs[java.lang.Double]("ev")).map(_.toDouble)).toSeq
    assert(v == vOp)
    assert(v(1).exists(x => math.abs(x - 0.5) < 1e-12))  // pandas [NaN, 0.5, 2.5]

    val c = g.cov("v", "v", "ec").df.orderBy("id").collect()
    assert(c.forall(r => r.schema.fieldNames.contains("ec_corr")))
    // cov(x,x) is var; corr(x,x) is 1 once defined
    val corr2 = Option(c(2).getAs[java.lang.Double]("ec_corr")).map(_.toDouble)
    assert(corr2.exists(x => math.abs(x - 1.0) < 1e-9), s"got $corr2")

    // surface contract: multi-key groupby refuses (the kernel keys on one long)
    intercept[IllegalArgumentException] {
      Frame(d).groupby("k", "o").ewm("o", "id", alpha = 0.5)
    }
  }
}

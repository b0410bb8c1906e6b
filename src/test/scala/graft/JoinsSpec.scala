package graft

import org.apache.spark.sql.functions._
import graft.ops.Joins

/** merge_asof semantics — including the numeric-key path (advisor fix:
  * integer asof keys must NOT be reinterpreted as epoch seconds). */
class JoinsSpec extends SparkSuite {

  test("asof with numeric on-keys matches backward-nearest semantics") {
    import spark.implicits._
    val left = Seq((1L, 5L), (1L, 12L), (2L, 3L)).toDF("k", "t")
    val right = Seq((1L, 4L, "a"), (1L, 10L, "b"), (2L, 99L, "z")).toDF("k", "t", "tag")
    val out = Joins.asof(left, right,
      leftOn = "t", rightOn = "t", leftBy = "k", rightBy = "k",
      payload = Seq("tag"), tieBreak = col("t"))
      .orderBy("k", "t")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getAs[String]("tag"))))
    // t=5 matches right t=4 ('a'); t=12 matches t=10 ('b'); k=2 t=3 has
    // no right row at or before it -> null
    assert(out.toSeq == Seq((1L, 5L, Some("a")), (1L, 12L, Some("b")), (2L, 3L, None)))
  }

  test("asofByKeys multi-key by equals single-key asof on the concatenated key") {
    import spark.implicits._
    val left = Seq(("u1", "x", 5L), ("u1", "y", 5L), ("u2", "x", 9L), ("u1", "x", 20L))
      .toDF("u", "e", "t")
    val right = Seq(("u1", "x", 4L, "a"), ("u1", "y", 4L, "b"), ("u2", "x", 8L, "c"),
      ("u1", "x", 15L, "d")).toDF("u", "e", "t", "tag")
    val multi = Joins.asofByKeys(left, right, "t", "t",
      Seq("u", "e"), Seq("u", "e"), Seq("tag"), tieBreak = col("t"))
    val single = Joins.asof(
      left.withColumn("ue", concat_ws("|", col("u"), col("e"))),
      right.withColumn("ue", concat_ws("|", col("u"), col("e"))),
      "t", "t", "ue", "ue", Seq("tag"), tieBreak = col("t"))
      .drop("ue")
    assertParity(multi, single)
    val got = multi.orderBy("u", "e", "t").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getAs[String]("tag")))
    assert(got.toSeq == Seq(("u1", "x", 5L, "a"), ("u1", "x", 20L, "d"),
      ("u1", "y", 5L, "b"), ("u2", "x", 9L, "c")))
  }

  test("asof with timestamp keys takes the latest at-or-before per group") {
    import java.sql.Timestamp
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val trades = Seq((1L, ts("2024-01-01 10:00:05")), (1L, ts("2024-01-01 10:01:00")))
      .toDF("sym", "t")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 99.0),
      (1L, ts("2024-01-01 10:00:30"), 101.0)).toDF("sym", "t", "px")
    val out = Joins.asof(trades, quotes,
      leftOn = "t", rightOn = "t", leftBy = "sym", rightBy = "sym",
      payload = Seq("px"), tieBreak = unix_micros(col("t")))
      .orderBy("t").collect().map(_.getAs[Double]("px"))
    assert(out.toSeq == Seq(99.0, 101.0))
  }

  private def asofTags(direction: String, allowExact: Boolean,
      tol: Option[Long] = None): Seq[(Long, Option[String])] = {
    import spark.implicits._
    val left = Seq((1L, 10L), (1L, 20L), (1L, 35L)).toDF("k", "t")
    val right = Seq((1L, 10L, "at10"), (1L, 18L, "at18"), (1L, 22L, "at22"))
      .toDF("k", "t", "tag")
    graft.ops.Joins.asof(left, right, "t", "t", "k", "k",
      Seq("tag"), org.apache.spark.sql.functions.col("t"),
      direction = direction, allowExactMatches = allowExact, tolerance = tol)
      .orderBy("t").collect()
      .map(r => (r.getLong(1), Option(r.getAs[String]("tag")))).toSeq
  }

  test("rangeJoin matches points to enclosing intervals without duplicates") {
    import spark.implicits._
    val pts = Seq((1L, 5L), (2L, 10L), (3L, 25L), (4L, 99L)).toDF("pid", "t")
    val ivs = Seq((10L, 0L, 10L), (20L, 8L, 30L), (30L, 40L, 50L))
      .toDF("iid", "lo", "hi")
    val got = graft.ops.Joins.rangeJoin(pts, "t", ivs, "lo", "hi", bucketWidth = 7L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // t=5 ∈ [0,10]; t=10 ∈ [0,10] and [8,30]; t=25 ∈ [8,30]; t=99 nowhere
    assert(got == Set((1L, 10L), (2L, 10L), (2L, 20L), (3L, 20L)))
  }

  test("rangeJoin buckets exactly on negative and >2^53 long keys") {
    import spark.implicits._
    // past 2^53 double division rounds; the exact long path must still
    // co-bucket a point with its enclosing interval
    val big = (1L << 60) + 12345L
    val points = Seq((1L, -5L), (2L, big)).toDF("pid", "t")
    val intervals = Seq((10L, -7L, -3L), (20L, big - 10L, big + 10L))
      .toDF("iid", "lo", "hi")
    val out = Joins.rangeJoin(points, "t", intervals, "lo", "hi",
      bucketWidth = 1L << 41)
      .select("pid", "iid").orderBy("pid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 10L), (2L, 20L)))
  }

  test("rangeJoin handles keys within bucketWidth of Long.MinValue without overflow") {
    import spark.implicits._
    // the old `(c - pmod(c, w)) div w` floor form overflowed below
    // Long.MinValue for keys in the bottom bucket (ANSI arithmetic error);
    // the floor-div form must both survive and still co-bucket correctly
    val lo = Long.MinValue
    val points = Seq((1L, lo + 3L), (2L, lo + 150L)).toDF("pid", "t")
    val intervals = Seq((10L, lo, lo + 10L), (20L, lo + 100L, lo + 200L))
      .toDF("iid", "lo", "hi")
    val out = Joins.rangeJoin(points, "t", intervals, "lo", "hi", bucketWidth = 64L)
      .select("pid", "iid").orderBy("pid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 10L), (2L, 20L)))
  }

  test("rangeJoin fails fast on an interval exceeding the bucket-expansion cap") {
    import spark.implicits._
    val pts = Seq((1L, 5L)).toDF("pid", "t")
    val ivs = Seq((10L, 0L, 1000000L)).toDF("iid", "lo", "hi")
    intercept[Exception] {
      graft.ops.Joins.rangeJoin(pts, "t", ivs, "lo", "hi",
        bucketWidth = 1L, maxBucketsPerInterval = 100L).collect()
    }
  }

  test("asof direction=forward takes the first at-or-after match") {
    assert(asofTags("forward", allowExact = true) ==
      Seq(10L -> Some("at10"), 20L -> Some("at22"), 35L -> None))
  }

  test("asof allow_exact_matches=false excludes same-time rows both directions") {
    assert(asofTags("backward", allowExact = false) ==
      Seq(10L -> None, 20L -> Some("at18"), 35L -> Some("at22")))
    assert(asofTags("forward", allowExact = false) ==
      Seq(10L -> Some("at18"), 20L -> Some("at22"), 35L -> None))
  }

  test("asof direction=nearest picks the closer side, ties to backward") {
    // t=20: backward at18 (d=2) beats forward at22 (d=2 exact tie → backward)
    assert(asofTags("nearest", allowExact = true) ==
      Seq(10L -> Some("at10"), 20L -> Some("at18"), 35L -> Some("at22")))
  }

  test("asof tolerance nulls matches beyond the bound but keeps rows") {
    assert(asofTags("backward", allowExact = true, tol = Some(3L)) ==
      Seq(10L -> Some("at10"), 20L -> Some("at18"), 35L -> None))
    // nearest under tolerance: t=35's only neighbour (at22, d=13) is out
    assert(asofTags("nearest", allowExact = true, tol = Some(5L)) ==
      Seq(10L -> Some("at10"), 20L -> Some("at18"), 35L -> None))
  }

  test("asofGlobal equals the keyed asof run on a constant key") {
    val ev = table("events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("ts").as("p_ts"), col("value").as("pv"), col("event_id").as("p_id"))
    val global = Joins.asofGlobal(clicks, purchases, "ts", "p_ts",
      Seq("pv", "p_id"), tieBreak = col("p_id"))
    val keyed = Joins.asof(
      clicks.withColumn("k", lit(1L)), purchases.withColumn("k", lit(1L)),
      "ts", "p_ts", "k", "k", Seq("pv", "p_id"), tieBreak = col("p_id"))
      .drop("k")
    assertParity(global.drop("ts"), keyed.drop("ts"))
  }

  test("asof null on-keys: null right rows never match, null left rows keep null payload") {
    import spark.implicits._
    val left = Seq((1L, Some(5L)), (1L, None)).toDF("k", "t")
    val right = Seq((1L, None: Option[Long], "ghost"), (1L, Some(4L), "a"))
      .toDF("k", "t", "tag")
    Seq("backward", "forward", "nearest").foreach { dir =>
      val out = Joins.asof(left, right, "t", "t", "k", "k",
        payload = Seq("tag"), tieBreak = col("t"), direction = dir)
        .orderBy(col("t").asc_nulls_last).collect()
        .map(r => (Option(r.getAs[java.lang.Long]("t")).map(_.toLong),
          Option(r.getAs[String]("tag"))))
      // the null-key right row ('ghost') must never surface; the null-key
      // left row keeps its row with a null payload in every direction
      assert(out.toSeq == Seq(
        (Some(5L), if (dir == "backward") Some("a") else if (dir == "nearest") Some("a") else None),
        (None, None)), s"direction=$dir got ${out.toSeq}")
    }
  }

  test("asof rejects mismatched on-key kinds like asofGlobal") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, "2024-01-01", 5.0)).toDF("k", "r_ts", "pv")
    val e = intercept[IllegalArgumentException] {
      Joins.asof(left, right, "ts", "r_ts", "k", "k", Seq("pv"), tieBreak = lit(0L))
    }
    assert(e.getMessage.contains("numeric") && e.getMessage.contains("temporal"))
  }

  test("asofGlobal rejects mismatched on-key kinds with a descriptive error") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("id", "ts")          // numeric key
    val right = Seq(("2024-01-01", 5.0)).toDF("r_ts", "pv") // temporal key
    val e = intercept[IllegalArgumentException] {
      Joins.asofGlobal(left, right, "ts", "r_ts", Seq("pv"), tieBreak = lit(0L))
    }
    assert(e.getMessage.contains("numeric") && e.getMessage.contains("temporal"))
    assert(e.getMessage.contains("ts") && e.getMessage.contains("r_ts"))
  }
}

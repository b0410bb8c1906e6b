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
}

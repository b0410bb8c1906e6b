package graft

import org.apache.spark.sql.functions._
import graft.queries.QueryKit

/** The fixture loader's timestamp normalization: every physical layout
  * the driver's testdata has shipped (or plausibly could) must converge
  * on the same microsecond TIMESTAMP_NTZ. The r8 fixture drop switched
  * long-nanos to TIMESTAMP(MICROS) and crashed 45 time queries out of
  * the gate — the unit heuristic exists so a future drop (micros-as-
  * long, millis, seconds) cannot repeat that. */
class QueryKitSpec extends SparkSuite {

  private val usExpected = 1700000000000000L // 2023-11-14T22:13:20 in µs

  private def tsOf(df: org.apache.spark.sql.DataFrame): Long = {
    val out = QueryKit.normalizeTs(df)
    assert(out.schema("ts").dataType.typeName == "timestamp_ntz")
    out.select(unix_micros(col("ts").cast("timestamp"))).head().getLong(0)
  }

  test("long ts columns detect their epoch unit by magnitude") {
    import spark.implicits._
    assert(tsOf(Seq(1700000000000000000L).toDF("ts")) == usExpected) // nanos
    assert(tsOf(Seq(1700000000000000L).toDF("ts")) == usExpected)    // micros
    assert(tsOf(Seq(1700000000000L).toDF("ts")) == usExpected)       // millis
    assert(tsOf(Seq(1700000000L).toDF("ts")) == usExpected)          // seconds
  }

  test("timestamp and ntz columns pass through; frames without ts untouched") {
    import spark.implicits._
    val t = Seq(1700000000000000L).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    assert(tsOf(t) == usExpected)
    val ntz = t.select(col("ts").cast("timestamp_ntz").as("ts"))
    assert(tsOf(ntz) == usExpected)
    val none = Seq((1, "x")).toDF("a", "b")
    assert(QueryKit.normalizeTs(none).columns.toSeq == Seq("a", "b"))
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.Frame

/** One registered operator query: the Spark plan and (when the operator is
  * SQL-expressible) the equivalent DuckDB oracle SQL. Column names/aliases
  * must match exactly — the driver sorts columns by name before hashing.
  * `headline = true` marks the BASELINE.md bench shapes run by graft.Bench. */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String] = None,
    headline: Boolean = false)

object QueryKit {
  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  /** events.ts has shipped as parquet TIMESTAMP(NANOS) (which Spark's
    * vectorized reader rejects — readable only as raw long via the legacy
    * knob) and, in newer fixture drops, as plain TIMESTAMP(MICROS). Accept
    * either physical layout and normalize to a microsecond TIMESTAMP_NTZ:
    * every downstream query sees one dtype regardless of the writer.
    *
    * A LONG column no longer assumes nanos (the r8 fixture drop switched
    * units and crashed 45 time queries out of the gate): one sample row
    * decides the epoch unit by magnitude — 2020s instants are ~1.7e18 in
    * ns, ~1.7e15 in µs, ~1.7e12 in ms, ~1.7e9 in s, four orders apart,
    * so the thresholds are unambiguous for any plausible fixture. Nanos
    * convert with integer division (they overflow double precision, so
    * never `/ 1000.0`). */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        val sample = df.filter(col("ts").isNotNull).select(col("ts")).head(1)
          .headOption.map(r => math.abs(r.getLong(0))).getOrElse(0L)
        val micros =
          if (sample >= 100000000000000000L) expr("ts DIV 1000") // nanos
          else if (sample >= 100000000000000L) col("ts")         // micros
          else if (sample >= 100000000000L) col("ts") * 1000L    // millis
          else col("ts") * 1000000L                              // seconds
        df.withColumn("ts", timestamp_micros(micros.cast("long")).cast("timestamp_ntz"))
      case Some(TimestampType) =>
        df.withColumn("ts", col("ts").cast("timestamp_ntz"))
      case _ => df // TimestampNTZType already, or no ts column
    }

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeTs(s.read.parquet(s"$dir/$name.parquet"))
    } else s.read.parquet(s"$dir/$name.parquet")

  def f(s: SparkSession, dir: String, name: String): Frame = Frame(t(s, dir, name))

  /** Table scan rebalanced across the cluster before CPU-bound map work:
    * range-partition + in-partition sort on `key`. Test-fixture parquet
    * is a single small file (one row group — unsplittable, so the scan is
    * ONE task no matter the config), while per-row token analytics cost
    * far more CPU than the bytes suggest; the (tiny) shuffle buys
    * full-core parallelism, and at real scale the same rebalance evens
    * out skewed file sizes ahead of heavy per-row stages. Pre-sorting
    * here means a deterministic-output query needs NO trailing orderBy —
    * RangePartitioning and ordering survive narrow projections — where a
    * trailing orderBy's range exchange would sample and re-run the whole
    * heavy stage. Explicit partition count keeps AQE from byte-coalescing
    * the CPU-dense shuffle back to one task. */
  def tSplitSorted(s: SparkSession, dir: String, name: String, key: String): DataFrame =
    t(s, dir, name)
      .repartitionByRange(s.sparkContext.defaultParallelism, col(key))
      .sortWithinPartitions(key)
}

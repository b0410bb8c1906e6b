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
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects outright. Read the raw nanos as long (legacy knob)
      // and convert to a microsecond TIMESTAMP_NTZ with integer division
      // (ns since epoch overflow double precision, so no `/ 1000.0`).
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")).cast("timestamp_ntz"))
    } else s.read.parquet(s"$dir/$name.parquet")

  def f(s: SparkSession, dir: String, name: String): Frame = Frame(t(s, dir, name))

  /** Table scan rebalanced across the cluster before CPU-bound map work.
    * Test-fixture parquet is a single small file (one row group —
    * unsplittable, so the scan is ONE task no matter the config), while
    * per-row token analytics cost far more CPU than the bytes suggest; a
    * round-robin shuffle of the (tiny) input buys full-core parallelism.
    * At real scale the same rebalance is how a pipeline evens out skewed
    * file sizes ahead of heavy per-row stages — the shuffle moves the raw
    * text once and costs IO linear in input, never in work. */
  def tSplit(s: SparkSession, dir: String, name: String): DataFrame =
    t(s, dir, name).repartition(s.sparkContext.defaultParallelism)

  /** [[tSplit]] that also pre-sorts: range-partition + in-partition sort
    * on `key` BEFORE a CPU-heavy map stage, so a deterministic-output
    * query's final orderBy is satisfied by propagation (RangePartitioning
    * and ordering survive narrow projections) and the expensive
    * projection is evaluated ONCE — with a trailing orderBy the range
    * exchange would sample and re-run the whole heavy stage. Explicit
    * partition count keeps AQE from byte-coalescing the tiny-but-
    * CPU-dense shuffle back to one task. */
  def tSplitSorted(s: SparkSession, dir: String, name: String, key: String): DataFrame =
    t(s, dir, name)
      .repartitionByRange(s.sparkContext.defaultParallelism, col(key))
      .sortWithinPartitions(key)
}

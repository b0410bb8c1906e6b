package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Partitioned JDBC source/sink — the engine's `read_sql` / `to_sql`
 * (reference: modin/core/io/sql/sql_dispatcher.py, partitioned variant
 * modin/experimental/pandas/io.py:33 `read_sql` with
 * partition_column/lower_bound/upper_bound/num_partitions). The reference
 * splits the table by issuing one range query per partition; Spark's JDBC
 * relation does exactly this when given a partition column, so the scale
 * path is a thin delegation. The predicate generation is factored out and
 * unit-tested without a live endpoint (none exists in this sandbox):
 * the contract — ranges cover every value including NULLs and the
 * out-of-bounds tails, with no overlap — is what makes the parallel read
 * equal to the serial one.
 */
object Jdbc {

  /**
   * Split `[lowerBound, upperBound)` into `numPartitions` WHERE-clause
   * predicates over `column`. Mirrors the stride logic of Spark's own
   * `JDBCRelation.columnPartition`: the first predicate also catches
   * NULLs and everything below the bound, the last catches everything at
   * or above the final stride — so the union of partitions is always the
   * whole table even when the bounds are stale. Bounds are a *hint* for
   * splitting, never a filter.
   */
  def partitionPredicates(column: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int): Seq[String] = {
    require(numPartitions >= 1, s"numPartitions must be >= 1: $numPartitions")
    require(lowerBound < upperBound,
      s"lowerBound ($lowerBound) must be < upperBound ($upperBound)")
    if (numPartitions == 1) return Seq("1=1")
    val stride = (upperBound - lowerBound) / numPartitions max 1L
    // fewer partitions than requested when the range is narrower than one
    // stride each — matches Spark, which logs and clamps
    val n = math.min(numPartitions.toLong, (upperBound - lowerBound + stride - 1) / stride).toInt
    (0 until n).map { i =>
      val lo = lowerBound + i * stride
      val hi = lowerBound + (i + 1) * stride
      if (i == 0) s"$column < $hi OR $column IS NULL"
      else if (i == n - 1) s"$column >= $lo"
      else s"$column >= $lo AND $column < $hi"
    }
  }

  private def validateUrl(url: String): Unit =
    require(url.startsWith("jdbc:") && url.length > "jdbc:".length,
      s"not a JDBC url: $url (expected jdbc:<subprotocol>:…)")

  private def props(user: Option[String], password: Option[String],
      driver: Option[String]): Properties = {
    val p = new Properties()
    user.foreach(p.setProperty("user", _))
    password.foreach(p.setProperty("password", _))
    driver.foreach(p.setProperty("driver", _))
    p
  }

  /** Serial read — one connection, one task. For small dimension tables. */
  def read(spark: SparkSession, url: String, table: String,
      user: Option[String] = None, password: Option[String] = None,
      driver: Option[String] = None): DataFrame = {
    validateUrl(url)
    spark.read.jdbc(url, table, props(user, password, driver))
  }

  /**
   * Partitioned read — `numPartitions` concurrent range queries on
   * `partitionColumn` (must be numeric/date/timestamp on the DB side).
   * This is the 100 TB ingestion path: each executor core holds one
   * connection and streams one range; bounds come from a cheap
   * `SELECT min(col), max(col)` the caller runs (or estimates) up front.
   */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, user: Option[String] = None,
      password: Option[String] = None, driver: Option[String] = None): DataFrame = {
    validateUrl(url)
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props(user, password, driver))
  }

  /** Sink — `to_sql` (reference sql_dispatcher.py `to_sql`: one pandas
    * `to_sql` per partition; here one batched INSERT stream per task). */
  def write(df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.ErrorIfExists, user: Option[String] = None,
      password: Option[String] = None, driver: Option[String] = None): Unit = {
    validateUrl(url)
    df.write.mode(mode).jdbc(url, table, props(user, password, driver))
  }
}

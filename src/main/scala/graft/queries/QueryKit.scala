package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.api.Frame

/** One registered operator query: the Spark plan and (when the operator is
  * SQL-expressible) the equivalent DuckDB oracle SQL. Column names/aliases
  * must match exactly — the driver sorts columns by name before hashing. */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String] = None,
    headline: Boolean = false)

object QueryKit {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def f(s: SparkSession, dir: String, name: String): Frame = Frame(t(s, dir, name))
}

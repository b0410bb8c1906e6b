package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Extension system (reference: modin/pandas/api/extensions —
 * `register_dataframe_accessor` lets users graft custom namespaces onto
 * DataFrame/Series). The idiomatic Scala analog is implicit extension
 * classes: importing `graft.api.extensions._` adds user-defined
 * accessors to [[Frame]] and [[Column]] with zero runtime cost.
 */
object extensions {

  /** Frame accessor namespace — the `df.ext.*` pattern. */
  implicit class FrameExt(private val frame: Frame) extends AnyVal {
    /** Null ratio per listed column (a data-quality accessor). */
    def nullRatios(cols: String*): Frame = Frame(
      frame.df.select(cols.map(c =>
        (sum(when(col(c).isNull, 1).otherwise(0)) / count(lit(1)))
          .as(s"${c}_null_ratio")): _*))

    /** Snake-case every column name (an API-hygiene accessor). */
    def snakeCased: Frame = frame.rename(
      frame.df.columns.map(c =>
        c -> c.replaceAll("([a-z0-9])([A-Z])", "$1_$2").toLowerCase).toIndexedSeq: _*)
  }

  /** Column accessor namespace — the `col.ext.*` pattern. */
  implicit class ColumnExt(private val c: Column) extends AnyVal {
    /** Winsorize into [lo, hi]. */
    def winsorized(lo: Double, hi: Double): Column = greatest(least(c, lit(hi)), lit(lo))
    /** Null-safe z-score against precomputed moments. */
    def zscore(mean: Double, std: Double): Column = (c - lit(mean)) / lit(std)
  }
}

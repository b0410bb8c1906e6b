package graft.api

import org.apache.spark.sql.functions._
import graft.ops.Cumulative

/**
 * Fluent expanding-window surface (pandas `Expanding` — reference
 * modin/pandas/window.py expanding family). Terminals compose
 * [[Cumulative.globalRunning]] — the two-phase parallel prefix, never a
 * single-partition window. sum/count/mean run the value's running sum
 * and a validity-indicator running sum in the SAME pass (one range
 * shuffle total); `minPeriods` nulls outputs until that many valid
 * observations, as in pandas. min/max are a plain running fold and
 * support the default min_periods=1.
 */
final case class Expanding(frame: Frame, minPeriods: Int) {

  private val V = "__exp_v__"
  private val I = "__exp_i__" // validity indicator (input)
  private val C = "__exp_c__" // running valid count (output)

  /** running (Σ value, Σ valid) in one globalRunning pass. */
  private def sums(c: String) = Cumulative.globalRunning(
    frame.df.withColumn(I, when(col(c).isNotNull, 1L).otherwise(0L)),
    frame.ordering, "sum", Seq(c -> V, I -> C))

  private def emit(d: org.apache.spark.sql.DataFrame, as: String,
      value: org.apache.spark.sql.Column): Frame =
    frame.copy(df = d
      .withColumn(as, when(col(C) >= minPeriods, value))
      .drop(V, I, C))

  def sum(c: String, as: String): Frame = emit(sums(c), as, col(V))
  def count(c: String, as: String): Frame = emit(sums(c), as, col(C))
  def mean(c: String, as: String): Frame = emit(sums(c), as, col(V) / col(C))

  private def fold(c: String, fn: String, as: String): Frame = {
    require(minPeriods <= 1,
      s"expanding.$fn supports min_periods=1 (the fold carries no validity count)")
    val d = Cumulative.globalRunning(frame.df, frame.ordering, fn, Seq(c -> V))
    frame.copy(df = d.withColumn(as, col(V)).drop(V))
  }

  def min(c: String, as: String): Frame = fold(c, "min", as)
  def max(c: String, as: String): Frame = fold(c, "max", as)
}

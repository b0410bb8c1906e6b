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
  // C=0 (legal under min_periods=0) must yield null, not an ANSI 0/0
  def mean(c: String, as: String): Frame =
    emit(sums(c), as, when(col(C) > 0, col(V) / col(C)))

  private def fold(c: String, fn: String, as: String): Frame = {
    require(minPeriods <= 1,
      s"expanding.$fn supports min_periods=1 (the fold carries no validity count)")
    val d = Cumulative.globalRunning(frame.df, frame.ordering, fn, Seq(c -> V))
    frame.copy(df = d.withColumn(as, col(V)).drop(V))
  }

  def min(c: String, as: String): Frame = fold(c, "min", as)
  def max(c: String, as: String): Frame = fold(c, "max", as)

  /** pandas `expanding().corr(other)` / `.cov(other)` — SIX running sums
    * (Σx, Σy, Σxy, Σx², Σy², valid-pair count) in ONE globalRunning pass
    * (one range shuffle total), then the closed forms. Rows where either
    * side is null contribute nothing (pairwise-complete). `center`
    * shifts both inputs by a caller-chosen constant before accumulating:
    * corr/cov are shift-invariant, and centering near the data's
    * magnitude kills the catastrophic cancellation of n·Σxy − Σx·Σy on
    * large-magnitude columns. Null until max(minPeriods, 2) pairs. */
  def corr(x: String, y: String, as: String,
      centerX: Double = 0.0, centerY: Double = 0.0): Frame =
    corrCov(x, y, as, isCorr = true, centerX, centerY)

  def cov(x: String, y: String, as: String,
      centerX: Double = 0.0, centerY: Double = 0.0): Frame =
    corrCov(x, y, as, isCorr = false, centerX, centerY)

  private def corrCov(x: String, y: String, as: String, isCorr: Boolean,
      centerX: Double, centerY: Double): Frame = {
    val valid = col(x).isNotNull && col(y).isNotNull
    val xv = when(valid, col(x).cast("double") - centerX).otherwise(0.0)
    val yv = when(valid, col(y).cast("double") - centerY).otherwise(0.0)
    val prepped = frame.df
      .withColumn("__cx__", xv).withColumn("__cy__", yv)
      .withColumn("__cxy__", xv * yv)
      .withColumn("__cx2__", xv * xv).withColumn("__cy2__", yv * yv)
      .withColumn(I, when(valid, 1L).otherwise(0L))
    val run = Cumulative.globalRunning(prepped, frame.ordering, "sum",
      Seq("__cx__" -> "__sx__", "__cy__" -> "__sy__", "__cxy__" -> "__sxy__",
        "__cx2__" -> "__sx2__", "__cy2__" -> "__sy2__", I -> C))
    val n = col(C).cast("double")
    val value =
      if (isCorr) {
        // a zero-variance prefix (constant x or y) makes the denominator
        // sqrt(0) — pandas yields NaN there; ANSI division would throw
        val den = (n * col("__sx2__") - col("__sx__") * col("__sx__")) *
          (n * col("__sy2__") - col("__sy__") * col("__sy__"))
        when(den > 0,
          (n * col("__sxy__") - col("__sx__") * col("__sy__")) / sqrt(den))
      } else
        (col("__sxy__") - col("__sx__") * col("__sy__") / n) / (n - 1.0)
    frame.copy(df = run
      .withColumn(as, when(col(C) >= math.max(minPeriods, 2), value))
      .drop("__cx__", "__cy__", "__cxy__", "__cx2__", "__cy2__", I,
        "__sx__", "__sy__", "__sxy__", "__sx2__", "__sy2__", C))
  }
}

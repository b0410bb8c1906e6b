package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions.col

/**
 * Fluent grouped rolling surface (pandas `GroupBy.rolling` — reference
 * modin/pandas/window.py via groupby). Unlike [[Rolling]] (the GLOBAL
 * path, which needs block overlap), the group key IS the partition key,
 * so this is the plain bounded window Spark parallelizes natively — one
 * hash shuffle on the keys, whole-stage-codegen'd aggregates.
 *
 * `center=true` shifts the frame to pandas' centered bounds: with
 * offset = (window-1)/2 the frame covers rows [i+1+offset-window,
 * i+offset] — for even windows the extra row sits on the PAST side
 * (pandas FixedWindowIndexer). Same single window stage, no extra
 * shuffle.
 */
final case class GroupedRolling(frame: Frame, keys: Seq[String], window: Int,
    order: Seq[SortKey], minPeriods: Int, center: Boolean = false) {

  private def spec = {
    val offset = if (center) (window - 1) / 2 else 0
    Window.partitionBy(keys.map(col): _*)
      .orderBy(order.map(_.toColumn): _*)
      .rowsBetween(offset - (window - 1), offset)
  }

  private def gated(c: String, value: Column, as: String): Frame = {
    val vcnt = F.count(col(c)).over(spec) // valid observations, pandas rule
    frame.copy(df = frame.df.withColumn(as, F.when(vcnt >= minPeriods, value)))
  }

  def sum(c: String, as: String): Frame = gated(c, F.sum(col(c)).over(spec), as)
  def mean(c: String, as: String): Frame = gated(c, F.avg(col(c)).over(spec), as)
  def min(c: String, as: String): Frame = gated(c, F.min(col(c)).over(spec), as)
  def max(c: String, as: String): Frame = gated(c, F.max(col(c)).over(spec), as)
  def count(c: String, as: String): Frame = gated(c, F.count(col(c)).over(spec).cast("long"), as)
  def std(c: String, as: String): Frame = gated(c, F.stddev_samp(col(c)).over(spec), as)
  def variance(c: String, as: String): Frame = gated(c, F.var_samp(col(c)).over(spec), as)
  def median(c: String, as: String): Frame = quantile(c, 0.5, as)
  /** pandas rolling.quantile (linear interpolation — `percentile` over
    * the bounded row window is the exact same definition). */
  def quantile(c: String, q: Double, as: String): Frame =
    gated(c, F.percentile(col(c), F.lit(q)).over(spec), as)
}

/**
 * Grouped TIME-based rolling with the pandas `closed=` edge rule
 * (pandas `rolling('1h', closed=...)`). The order column must be an
 * integer microsecond timestamp (`unix_micros`) so the four interval
 * variants are EXACT integer range bounds — no epsilon arithmetic:
 *
 *   right (default): (t-w, t]   → RANGE [-w+1, 0]
 *   both:            [t-w, t]   → RANGE [-w,   0]
 *   left:            [t-w, t)   → RANGE [-w,  -1]
 *   neither:         (t-w, t)   → RANGE [-w+1, -1]
 *
 * An empty frame (left/neither with no earlier rows in range) yields
 * null, matching pandas NaN. min_periods defaults to 1 as in pandas
 * time-based rolling. One hash shuffle on the keys, native range
 * window.
 */
final case class GroupedTimeRolling(frame: Frame, keys: Seq[String],
    windowMicros: Long, orderMicrosCol: String, closed: String = "right",
    minPeriods: Int = 1) {

  private val (lo, hi): (Long, Long) = closed match {
    case "right"   => (-windowMicros + 1, 0L)
    case "both"    => (-windowMicros, 0L)
    case "left"    => (-windowMicros, -1L)
    case "neither" => (-windowMicros + 1, -1L)
    case other => sys.error(s"rolling closed= must be right|both|left|neither: $other")
  }

  private def spec = Window.partitionBy(keys.map(col): _*)
    .orderBy(col(orderMicrosCol)).rangeBetween(lo, hi)

  private def gated(c: String, value: Column, as: String): Frame = {
    val vcnt = F.count(col(c)).over(spec)
    frame.copy(df = frame.df.withColumn(as, F.when(vcnt >= minPeriods, value)))
  }

  def sum(c: String, as: String): Frame = gated(c, F.sum(col(c)).over(spec), as)
  def mean(c: String, as: String): Frame = gated(c, F.avg(col(c)).over(spec), as)
  def min(c: String, as: String): Frame = gated(c, F.min(col(c)).over(spec), as)
  def max(c: String, as: String): Frame = gated(c, F.max(col(c)).over(spec), as)
  def count(c: String, as: String): Frame = gated(c, F.count(col(c)).over(spec).cast("long"), as)
}

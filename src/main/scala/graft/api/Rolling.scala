package graft.api

import graft.ops.RollingBlocks

/**
 * Fluent rolling-window surface (pandas `Rolling` — reference
 * modin/pandas/window.py:99). Each terminal delegates to
 * [[RollingBlocks.rollingAgg]]: the distributed block-overlap plan, one
 * hash shuffle regardless of how many aggregates are chained through
 * [[agg]]. Grouped rolling stays on the plain by-key window (q55/q115) —
 * this class is the GLOBAL path, where the naive window would serialize.
 */
final case class Rolling(frame: Frame, window: Int, minPeriods: Option[Int]) {

  private def run(specs: (String, String, String)*): Frame =
    frame.copy(df = RollingBlocks.rollingAgg(
      frame.df, frame.ordering, window, specs, minPeriods))

  def sum(c: String, as: String): Frame = run((c, "sum", as))
  def mean(c: String, as: String): Frame = run((c, "mean", as))
  def min(c: String, as: String): Frame = run((c, "min", as))
  def max(c: String, as: String): Frame = run((c, "max", as))
  def count(c: String, as: String): Frame = run((c, "count", as))
  def std(c: String, as: String): Frame = run((c, "stddev", as))
  def variance(c: String, as: String): Frame = run((c, "variance", as))
  def median(c: String, as: String): Frame = run((c, "median", as))
  def quantile(c: String, q: Double, as: String): Frame = run((c, s"quantile:$q", as))
  def skew(c: String, as: String): Frame = run((c, "skew", as))
  def kurt(c: String, as: String): Frame = run((c, "kurt", as))
  def sem(c: String, as: String): Frame = run((c, "sem", as))

  /** Several aggregates in one pass (one shuffle, one window stage). */
  def agg(specs: (String, String, String)*): Frame = run(specs: _*)
}

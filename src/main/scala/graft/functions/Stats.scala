package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/**
 * Statistical aggregates composed to match *pandas* semantics (the reference
 * engine's oracle — modin runs the pandas kernel per partition).
 *
 * Spark's `skewness`/`kurtosis` are the population moments g1 / g2; pandas
 * (and DuckDB) report the bias-corrected sample statistics G1 / G2
 * (reference: modin's groupby_skew is the pandas sample skew,
 * modin/core/storage_formats/pandas/query_compiler.py:116-183 builds it from
 * per-partition moment sums). We compose the correction from Spark's
 * codegen'd built-ins instead of a UDAF, so the whole thing stays inside
 * whole-stage codegen and keeps partial aggregation.
 */
object Stats {

  /** The 100 TB sketch path for nunique: HLL++ with relative standard
    * deviation `rsd`. Exact `countDistinct` shuffles every distinct value
    * to a single reducer per group; the sketch is a fixed-size partial
    * aggregate (map-side combined, bytes per group independent of
    * cardinality). Use when the answer tolerates ±rsd — the exact path
    * (q02) stays the default. */
  def nuniqueApprox(c: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(c, rsd)

  /** The 100 TB sketch path for quantiles: Greenwald-Khanna with
    * `accuracy` (error ≤ 1/accuracy of the rank). Exact `percentile`
    * buffers each group's values; the sketch is a bounded-size partial
    * aggregate. q07's exact percentile stays the correctness oracle. */
  def quantileApprox(c: Column, p: Double, accuracy: Int = 10000): Column =
    percentile_approx(c, lit(p), lit(accuracy))

  /** pandas `sum(min_count=k)` gate: null when fewer than `minCount`
    * valid values (pandas default min_count=0 makes an all-null sum 0;
    * min_count=1 restores null). Same contract for any aggregate —
    * pass the aggregate expression in. */
  def withMinCount(c: Column, agg: Column, minCount: Int): Column =
    when(count(c) >= minCount, agg)

  /** Adjusted Fisher–Pearson sample skewness
    * G1 = g1 * sqrt(n(n-1))/(n-2), where g1 = m3/m2^1.5 (Spark `skewness`). */
  def sampleSkew(c: Column): Column = {
    val n = count(c).cast("double")
    skewness(c) * sqrt(n * (n - lit(1.0))) / (n - lit(2.0))
  }

  /** Bias-corrected excess kurtosis
    * G2 = ((n-1)/((n-2)(n-3))) * ((n+1)*g2 + 6), g2 = Spark `kurtosis`. */
  def sampleKurt(c: Column): Column = {
    val n = count(c).cast("double")
    (n - lit(1.0)) / ((n - lit(2.0)) * (n - lit(3.0))) *
      ((n + lit(1.0)) * kurtosis(c) + lit(6.0))
  }

  /** Standard error of the mean (reference groupby_sem, base QC:4046). */
  def sem(c: Column): Column = stddev_samp(c) / sqrt(count(c).cast("double"))

  /** Exact median via Spark's exact `percentile` (reference QC:1107 computes
    * it single-task per column; Spark's percentile is a distributed
    * partial/final aggregate). */
  def median(c: Column): Column = percentile(c, lit(0.5))

  /** Exact quantile with linear interpolation (pandas default). */
  def quantile(c: Column, q: Double): Column = percentile(c, lit(q))

  // Windowed variants of the moment corrections — same formulas with
  // every aggregate evaluated over the window frame, so rolling/expanding
  // skew/kurt/sem (pandas rolling_skew QC:1475+, expanding family) stay
  // ordinary window aggregates: one shuffle on the partition key, no UDAF.

  /** Rolling/expanding sample skewness G1 over a window frame. Null
    * until the frame holds ≥3 non-null values (n−2 in the denominator). */
  def skewOver(c: Column, w: WindowSpec): Column = {
    val n = count(c).over(w).cast("double")
    when(n >= 3, skewness(c).over(w) * sqrt(n * (n - lit(1.0))) / (n - lit(2.0)))
  }

  /** Rolling/expanding bias-corrected excess kurtosis G2 over a window
    * frame. Null until the frame holds ≥4 non-null values. */
  def kurtOver(c: Column, w: WindowSpec): Column = {
    val n = count(c).over(w).cast("double")
    when(n >= 4,
      (n - lit(1.0)) / ((n - lit(2.0)) * (n - lit(3.0))) *
        ((n + lit(1.0)) * kurtosis(c).over(w) + lit(6.0)))
  }

  /** Rolling/expanding standard error of the mean over a window frame. */
  def semOver(c: Column, w: WindowSpec): Column =
    stddev_samp(c).over(w) / sqrt(count(c).over(w).cast("double"))
}

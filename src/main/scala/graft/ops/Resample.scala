package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series resample (reference base query_compiler.py:5879-6233,
 * ~29 `resample_*` methods; implemented there as a full-axis pandas
 * `resample` per column block or a range-partitioning shuffle by time bins,
 * modin/core/dataframe/pandas/utils.py:509 `ShuffleResample`).
 *
 * On Spark a downsample is just `groupBy(time_bucket)` — one partial/final
 * aggregate; an upsample (`asfreq`) is a generated time spine joined against
 * the data. Neither needs a global sort.
 */
object Resample {

  /** Truncate to a tumbling bucket. `unit` ∈ second/minute/hour/day/week/
    * month/quarter/year (date_trunc semantics — identical in DuckDB). */
  def bucket(ts: Column, unit: String): Column = date_trunc(unit, ts)

  /** pandas `closed=`/`label=` bucket variants. `closed='right'` puts a
    * point sitting exactly on a boundary into the EARLIER bin (bin =
    * (H-1u, H]): truncate ts−1µs so boundary points shift down.
    * `label='right'` stamps the bin with its upper edge (+1 unit).
    * Both are per-row expression arithmetic — the groupBy shape (one
    * partial+final agg pair) is unchanged. */
  def bucketWith(ts: Column, unit: String,
      closed: String = "left", label: String = "left"): Column = {
    require(Set("left", "right")(closed) && Set("left", "right")(label),
      s"closed/label must be left|right: $closed/$label")
    val edge =
      if (closed == "left") date_trunc(unit, ts)
      else date_trunc(unit, ts - expr("INTERVAL 1 MICROSECOND"))
    if (label == "left") edge
    // QUARTER is a valid date_trunc field but NOT a Spark interval unit —
    // interval literals would ParseException, so step by 3 months
    else if (unit.equalsIgnoreCase("quarter")) edge + expr("INTERVAL 3 MONTH")
    else edge + expr(s"INTERVAL 1 $unit")
  }

  /** Downsample: tumbling-window aggregate (resample_sum/mean/…,
    * base QC:5879+). */
  def downsample(df: DataFrame, tsCol: String, unit: String, aggs: (String, Column)*): DataFrame =
    downsampleWith(df, tsCol, unit, "left", "left", aggs: _*)

  /** Downsample with pandas closed/label control. */
  def downsampleWith(df: DataFrame, tsCol: String, unit: String,
      closed: String, label: String, aggs: (String, Column)*): DataFrame = {
    require(aggs.nonEmpty, "downsample: at least one (name, agg) pair required")
    df.groupBy(bucketWith(col(tsCol), unit, closed, label).as("bucket"))
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*)
  }

  /** GroupBy.resample (reference groupby.resample, pandas/groupby.py:1408
    * — per-group tumbling-window aggregate): group by the caller's keys
    * PLUS the time bucket in one pass. Same single hash exchange as the
    * global downsample — the keys just widen the grouping tuple, so per-key
    * time series aggregate without a per-group loop or secondary shuffle. */
  def downsampleBy(df: DataFrame, keys: Seq[String], tsCol: String,
      unit: String, aggs: (String, Column)*): DataFrame = {
    require(keys.nonEmpty, "downsampleBy: at least one grouping key")
    require(aggs.nonEmpty, "downsampleBy: at least one (name, agg) pair required")
    df.groupBy((keys.map(col) :+ bucket(col(tsCol), unit).as("bucket")): _*)
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*)
  }

  /** Upsample / asfreq (reference resample_asfreq base QC:5879): build a
    * dense time spine with `sequence` + `explode` (computed inside the plan
    * from a 1-row min/max aggregate — no driver round-trip), left-join the
    * bucketed data, then optionally forward-fill. */
  def asfreq(
      df: DataFrame,
      tsCol: String,
      unit: String,
      step: Column,
      aggs: Seq[(String, Column)],
      fillZero: Boolean): DataFrame = {
    val bucketed = downsample(df, tsCol, unit, aggs: _*)
    val bounds = df.agg(
      date_trunc(unit, min(col(tsCol))).as("lo"),
      date_trunc(unit, max(col(tsCol))).as("hi"))
    val spine = bounds.select(explode(sequence(col("lo"), col("hi"), step)).as("bucket"))
    val joined = spine.join(bucketed, Seq("bucket"), "left")
    if (fillZero) aggs.foldLeft(joined) { case (d, (n, _)) => d.na.fill(0.0, Seq(n)) }
    else joined
  }

  /** Forward-fill the resampled series (resample_ffill): last-ignoreNulls
    * running window over the spine. Keyless here (the spine is one series);
    * for per-key resample partition by the keys — no global-order hazard. */
  def ffill(df: DataFrame, orderCol: String, valueCols: Seq[String], keys: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** resample().nearest() (reference resample_nearest base QC:5879+):
    * fill each spine point from the closer of the previous/next known
    * observation, measured along `orderCol` (epoch seconds for a time
    * spine); exact midpoints take the previous one, matching pandas'
    * `left_dist <= right_dist` tie rule. Two running windows (ffill +
    * bfill of value and position) — per-key when `keys` is set, else a
    * keyless spine-sized window (the spine is range/step-sized, not
    * data-sized, so the single task is bounded by construction). */
  def nearest(df: DataFrame, orderCol: String, valueCol: String, out: String,
      keys: Seq[String] = Nil): DataFrame = {
    val wb = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wa = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(0, Window.unboundedFollowing)
    val pv = last(col(valueCol), ignoreNulls = true).over(wb)
    val pr = last(when(col(valueCol).isNotNull, col(orderCol)), ignoreNulls = true).over(wb)
    val nv = first(col(valueCol), ignoreNulls = true).over(wa)
    val nr = first(when(col(valueCol).isNotNull, col(orderCol)), ignoreNulls = true).over(wa)
    df.withColumn(out,
      when(col(valueCol).isNotNull, col(valueCol))
        .when(pv.isNull, nv)
        .when(nv.isNull, pv)
        .when(col(orderCol) - pr <= nr - col(orderCol), pv)
        .otherwise(nv))
  }

  /** Gap-based sessionization over an event stream: a session break is a
    * gap > `gapSeconds` since the previous event of the same user; session
    * ids are the running count of breaks. One shuffle on the key, two
    * stacked windows — the standard scalable formulation. */
  def sessionize(df: DataFrame, userCol: String, tsCol: String, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val prev = lag(col(tsCol), 1).over(byUser)
    // Microsecond precision: unix_timestamp would truncate to whole
    // seconds and misclassify gaps within 1s of the threshold.
    def us(c: Column): Column = unix_micros(c.cast("timestamp"))
    val isBreak = when(prev.isNull ||
      us(col(tsCol)) - us(prev) > gapSeconds * 1000000L, 1).otherwise(0)
    df.withColumn("__brk__", isBreak)
      .withColumn("session_id",
        sum(col("__brk__")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__brk__")
  }

  /** resample(...).apply(f) (reference resample_app_ser/resample_app_df,
    * base QC:5879-6233): arbitrary Scala per time bin via
    * `groupByKey.mapGroups` — the same physics as groupby.apply (one hash
    * shuffle on the bucket key, then a streamed per-group iterator; no
    * driver round-trip, no per-bin collect). `f` maps the bin's values to
    * a fixed-width result row; null values are dropped before `f` (the
    * skipna default of the pandas aggregations `apply` usually wraps).
    * Bins are epoch-microsecond keyed through the shuffle and come back as
    * a `bucket` timestamp_ntz column, followed by `outCols` as doubles. */
  def applyGroups(df: DataFrame, tsCol: String, unit: String, valueCol: String,
      outCols: Seq[String])(f: Iterator[Double] => Array[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val binned = df
      .filter(col(valueCol).isNotNull)
      .select(
        unix_micros(bucket(col(tsCol), unit).cast("timestamp")).as("__bucket_us__"),
        col(valueCol).cast("double").as("__v__"))
      .as[(Long, Double)]
    val applied = binned.groupByKey(_._1)
      .mapGroups { (k, it) => (k, f(it.map(_._2)).toSeq) }
      .toDF("__bucket_us__", "__out__")
    val withBucket = applied.withColumn("bucket",
      timestamp_micros(col("__bucket_us__")).cast("timestamp_ntz"))
    outCols.zipWithIndex.foldLeft(withBucket) { case (d, (n, i)) =>
      d.withColumn(n, col("__out__").getItem(i))
    }.select(("bucket" +: outCols).map(col): _*)
  }
}

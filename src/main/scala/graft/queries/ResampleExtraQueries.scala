package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.{Frame, SortKey}
import QueryKit._

/**
 * §2.12 remainder: resample ohlc / nunique / first / last, and an
 * upsampled asfreq + ffill (reference base query_compiler.py:5879-6233;
 * ohlc base QC:6044; ffill-after-asfreq base QC:5935).
 */
object ResampleExtraQueries {

  val all: Seq[Q] = Seq(

    // resample('1d').ohlc() + nunique + first/last: one tumbling-bucket
    // aggregate; open/close = min_by/max_by on the (time, id) struct —
    // no window, one shuffle.
    Q("q130_resample_ohlc",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .withColumn("bucket", date_trunc("day", col("ts")))
          .withColumn("ord", struct(col("ts"), col("event_id")))
        Frame(ev.groupBy(col("bucket"))
          .agg(
            round(min_by(col("value"), col("ord")), 2).as("open"),
            round(max(col("value")), 2).as("high"),
            round(min(col("value")), 2).as("low"),
            round(max_by(col("value"), col("ord")), 2).as("close"),
            countDistinct(col("event_type")).as("n_types")))
          .sortValues(Seq(SortKey.asc("bucket"))).df
      },
      Some("""
        WITH e AS (
          SELECT date_trunc('day', ts) AS bucket, value, event_type,
                 row_number() OVER (PARTITION BY date_trunc('day', ts)
                                    ORDER BY ts, event_id) AS rn_a,
                 row_number() OVER (PARTITION BY date_trunc('day', ts)
                                    ORDER BY ts DESC, event_id DESC) AS rn_d
          FROM events)
        SELECT bucket,
               round(min(CASE WHEN rn_a = 1 THEN value END), 2) AS open,
               round(max(value), 2) AS high,
               round(min(value), 2) AS low,
               round(min(CASE WHEN rn_d = 1 THEN value END), 2) AS close,
               count(DISTINCT event_type) AS n_types
        FROM e GROUP BY bucket ORDER BY bucket""")),

    // resample('1d') statistical family: mean (exact-integer), std/var/
    // sem, exact quantile — base QC resample_{mean,std,var,sem,quantile}.
    Q("q133_resample_stats",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .withColumn("bucket", date_trunc("day", col("ts")))
        val n = count(lit(1))
        val cents = sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
        Frame(ev.groupBy(col("bucket"))
          .agg(
            (floor((cents * 200 + n) / (n * 2)) / lit(10000.0)).as("day_mean"),
            round(stddev_samp(col("value")), 4).as("day_std"),
            round(var_samp(col("value")), 4).as("day_var"),
            round(stddev_samp(col("value")) / sqrt(n), 4).as("day_sem"),
            round(percentile(col("value"), lit(0.9)), 4).as("day_p90")))
          .sortValues(Seq(SortKey.asc("bucket"))).df
      },
      Some("""
        SELECT date_trunc('day', ts) AS bucket,
               floor((200 * sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                      + count(*)) / (2 * count(*))) / 10000.0 AS day_mean,
               round(stddev_samp(value), 4) AS day_std,
               round(var_samp(value), 4) AS day_var,
               round(stddev_samp(value) / sqrt(count(*)), 4) AS day_sem,
               round(quantile_cont(value, 0.9), 4) AS day_p90
        FROM events GROUP BY 1 ORDER BY 1""")),

    // resample('6h').asfreq().ffill(): dense 6-hour spine, buckets with
    // no events forward-fill the previous bucket's mean. The global
    // ffill window runs over the SPINE (bucket-count sized — months of
    // 6h buckets, never data-sized), so the unpartitioned window is safe
    // by construction.
    Q("q131_upsample_ffill",
      (s, dir) => {
        val ev = t(s, dir, "events")
        // 6h-epoch-aligned bucket key, as epoch seconds (exact longs —
        // the join key and the spine use the identical alignment).
        // positive epoch seconds: double division + truncation == floor,
        // and the magnitudes (<2^31) are exact in double.
        val epochSec = (unix_micros(col("ts").cast("timestamp")) / lit(1000000L)).cast("long")
        val bucketSec = (epochSec / lit(21600L)).cast("long") * 21600L
        val bounds = ev.agg(min(bucketSec).as("lo"), max(bucketSec).as("hi")).head()
        val spine = ev.sparkSession.range(bounds.getLong(0), bounds.getLong(1) + 1, 21600L)
          .select(col("id").as("bucket_sec"))
        val agg = ev.groupBy(bucketSec.as("bucket_sec"))
          .agg(count(lit(1)).as("n_raw"))
        val w = Window.orderBy(col("bucket_sec"))
          .rowsBetween(Window.unboundedPreceding, 0)
        Frame(spine.join(agg, Seq("bucket_sec"), "left")
          .withColumn("n_ffill", last(col("n_raw"), ignoreNulls = true).over(w))
          .select(timestamp_seconds(col("bucket_sec")).cast("timestamp_ntz").as("bucket"),
            col("n_ffill")))
          .sortValues(Seq(SortKey.asc("bucket"))).df
      },
      Some("""
        WITH spine AS (
          SELECT unnest(range(
            (SELECT CAST(floor(epoch(min(ts)) / 21600) AS BIGINT) * 21600 FROM events),
            (SELECT CAST(floor(epoch(max(ts)) / 21600) AS BIGINT) * 21600 + 1 FROM events),
            21600)) AS bucket_sec),
        agg AS (
          SELECT CAST(floor(epoch(ts) / 21600) AS BIGINT) * 21600 AS bucket_sec,
                 count(*) AS n_raw
          FROM events GROUP BY 1)
        SELECT TIMESTAMP '1970-01-01 00:00:00' + spine.bucket_sec * INTERVAL 1 SECOND
                 AS bucket,
               last_value(n_raw IGNORE NULLS) OVER (ORDER BY spine.bucket_sec
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_ffill
        FROM spine LEFT JOIN agg USING (bucket_sec)
        ORDER BY bucket""")),

    // resample nearest + interpolate (reference resample_nearest /
    // resample_interpolate base QC:5879-6233): 6h bucket totals (exact
    // cents longs) upsampled to a 1h spine. nearest = the closer known
    // neighbor along epoch seconds (midpoint ties → previous, pandas'
    // left_dist <= right_dist rule, via Resample.nearest); interpolate =
    // time-linear between the bracketing knowns with the q122 exact
    // integer half-up formula — identical arithmetic in both engines.
    // The spine window is keyless but spine-sized (range/step), not
    // data-sized.
    Q("q144_resample_nearest_interp",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val epochSec = (unix_micros(col("ts").cast("timestamp")) / lit(1000000L)).cast("long")
        val bucketSec = (epochSec / lit(21600L)).cast("long") * 21600L
        val known = ev.groupBy(bucketSec.as("ksec"))
          .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long")).as("vc"))
        val bounds = ev.agg(min(bucketSec).as("lo"), max(bucketSec).as("hi")).head()
        val spine = s.range(bounds.getLong(0), bounds.getLong(1) + 1, 3600L)
          .select(col("id").as("sec"))
        val joined = spine.join(known, spine("sec") === known("ksec"), "left")
          .select(col("sec"), col("vc"))
        val wb = Window.orderBy(col("sec")).rowsBetween(Window.unboundedPreceding, 0)
        val wa = Window.orderBy(col("sec")).rowsBetween(0, Window.unboundedFollowing)
        val pv = last(col("vc"), ignoreNulls = true).over(wb)
        val pr = last(when(col("vc").isNotNull, col("sec")), ignoreNulls = true).over(wb)
        val nv = first(col("vc"), ignoreNulls = true).over(wa)
        val nr = first(when(col("vc").isNotNull, col("sec")), ignoreNulls = true).over(wa)
        val nearestC = graft.ops.Resample.nearest(joined, "sec", "vc", "__near_c__")
        val interp = when(col("vc").isNotNull, col("vc") / lit(100.0))
          .when(pv.isNull, lit(null).cast("double"))
          .when(nv.isNull, pv / lit(100.0))
          .otherwise(
            floor((lit(2) * (pv * 100 * (nr - pr) + (nv - pv) * 100 * (col("sec") - pr))
              + (nr - pr)) / (lit(2) * (nr - pr))) / lit(10000.0))
        Frame(nearestC
          .withColumn("v_interp", interp)
          .select(
            timestamp_seconds(col("sec")).cast("timestamp_ntz").as("bucket"),
            (col("__near_c__") / 100.0).as("v_nearest"),
            col("v_interp")))
          .sortValues(Seq(SortKey.asc("bucket"))).df
      },
      Some("""
        WITH spine AS (
          SELECT unnest(range(
            (SELECT CAST(floor(epoch(min(ts)) / 21600) AS BIGINT) * 21600 FROM events),
            (SELECT CAST(floor(epoch(max(ts)) / 21600) AS BIGINT) * 21600 + 1 FROM events),
            3600)) AS sec),
        known AS (
          SELECT CAST(floor(epoch(ts) / 21600) AS BIGINT) * 21600 AS ksec,
                 sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS vc
          FROM events GROUP BY 1),
        fbv AS (
          SELECT sec, vc,
                 last_value(vc IGNORE NULLS) OVER wb AS pv,
                 last_value(CASE WHEN vc IS NOT NULL THEN sec END IGNORE NULLS) OVER wb AS pr,
                 first_value(vc IGNORE NULLS) OVER wa AS nv,
                 first_value(CASE WHEN vc IS NOT NULL THEN sec END IGNORE NULLS) OVER wa AS nr
          FROM spine LEFT JOIN known ON spine.sec = known.ksec
          WINDOW wb AS (ORDER BY sec ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 wa AS (ORDER BY sec ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        SELECT TIMESTAMP '1970-01-01 00:00:00' + sec * INTERVAL 1 SECOND AS bucket,
               CASE WHEN vc IS NOT NULL THEN vc / 100.0
                    WHEN pv IS NULL THEN nv / 100.0
                    WHEN nv IS NULL THEN pv / 100.0
                    WHEN sec - pr <= nr - sec THEN pv / 100.0
                    ELSE nv / 100.0 END AS v_nearest,
               CASE WHEN vc IS NOT NULL THEN vc / 100.0
                    WHEN pv IS NULL THEN NULL
                    WHEN nv IS NULL THEN pv / 100.0
                    ELSE floor((2 * (pv * 100 * (nr - pr) + (nv - pv) * 100 * (sec - pr))
                                + (nr - pr)) / (2 * (nr - pr))) / 10000.0
               END AS v_interp
        FROM fbv ORDER BY bucket""")),

    // resample('1h').apply(f) (reference resample_app_ser/df, base
    // QC:5879-6233): a genuinely non-algebraic per-bin function — the
    // 10%-trimmed sum needs the bin's sorted values, so no built-in
    // aggregate expresses it. Runs as groupByKey.mapGroups over the hour
    // bucket (one shuffle, streamed iterator per bin). Values go through
    // exact 1e-4 integer units so the trim and sum are bit-identical to
    // the oracle's window/CTE formulation.
    Q("q158_resample_apply",
      (s, dir) => {
        val out = graft.ops.Resample.applyGroups(
          t(s, dir, "events"), "ts", "hour", "value",
          Seq("trimmed_sum4", "n_kept")) { it =>
          val v4 = it.map(v => math.round(v * 10000)).toArray
          java.util.Arrays.sort(v4)
          val trim = v4.length / 10
          var sum = 0L
          var i = trim
          while (i < v4.length - trim) { sum += v4(i); i += 1 }
          Array(sum.toDouble, (v4.length - 2 * trim).toDouble)
        }
        Frame(out.select(col("bucket"),
          col("trimmed_sum4").cast("long").as("trimmed_sum4"),
          col("n_kept").cast("long").as("n_kept")))
          .sortValues(Seq(SortKey.asc("bucket"))).df
      },
      Some("""
        WITH v AS (
          SELECT date_trunc('hour', ts) AS bucket,
                 CAST(round(value * 10000, 0) AS BIGINT) AS v4,
                 row_number() OVER (PARTITION BY date_trunc('hour', ts)
                                    ORDER BY value) AS rn,
                 count(*) OVER (PARTITION BY date_trunc('hour', ts)) AS n
          FROM events)
        SELECT bucket, CAST(sum(v4) AS BIGINT) AS trimmed_sum4,
               count(*) AS n_kept
        FROM v
        WHERE rn > n // 10 AND rn <= n - n // 10
        GROUP BY bucket ORDER BY bucket""")),

    // resample('W') — pandas' Sunday-ending weekly bins (label=right,
    // the 'W' default). Bin label = the next Sunday at or after the
    // date; Spark dayofweek is 1=Sunday, DuckDB dayofweek is 0=Sunday,
    // so each side states its own branch of the same arithmetic. One
    // groupBy exchange, the q90 shape at weekly grain.
    Q("q204_resample_weekly",
      (s, dir) => {
        val d = to_date(col("ts"))
        val label = when(dayofweek(d) === 1, d)
          .otherwise(date_add(d, lit(8) - dayofweek(d)))
        Frame(t(s, dir, "events")
          .groupBy(label.cast("timestamp_ntz").as("week_end"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value")))
          .sortValues(Seq(SortKey.asc("week_end"))).df
      },
      Some("""
        SELECT CAST(CAST(ts AS DATE)
                 + CAST((7 - dayofweek(CAST(ts AS DATE))) % 7 AS INTEGER) AS TIMESTAMP)
                 AS week_end,
               count(*) AS n,
               round(sum(value), 4) AS sum_value
        FROM events GROUP BY 1 ORDER BY 1""")),

    // groupby.resample (reference pandas/groupby.py:1408): per-event-type
    // daily bins — keys + bucket in ONE grouping tuple, one hash exchange,
    // no per-group loop.
    Q("q247_groupby_resample",
      (s, dir) => Frame(graft.ops.Resample.downsampleBy(
          t(s, dir, "events"), Seq("event_type"), "ts", "day",
          "n" -> count(lit(1)),
          "sum_value" -> round(sum(col("value")), 4),
          "max_value" -> round(max(col("value")), 4)))
        .sortValues(Seq(SortKey.asc("event_type"), SortKey.asc("bucket"))).df,
      Some("""
        SELECT event_type, date_trunc('day', ts) AS bucket, count(*) AS n,
               round(sum(value), 4) AS sum_value,
               round(max(value), 4) AS max_value
        FROM events GROUP BY 1, 2 ORDER BY event_type, bucket""")))
}

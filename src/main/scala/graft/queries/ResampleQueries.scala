package graft.queries

import org.apache.spark.sql.functions._
import graft.api.{Frame, SortKey}
import graft.ops.Resample
import QueryKit._

/**
 * §2.12 resample family (reference base query_compiler.py:5879-6233) +
 * event sessionization. Downsamples are plain tumbling-bucket aggregates
 * (one shuffle); the upsample builds its time spine inside the plan.
 */
object ResampleQueries {

  val all: Seq[Q] = Seq(

    // 1h tumbling downsample (BASELINE shape 8): resample('1h').agg(...).
    Q("q90_resample_hour",
      (s, dir) => Frame(Resample.downsample(
        t(s, dir, "events"), "ts", "hour",
        "n" -> count(lit(1)),
        "sum_value" -> round(sum(col("value")), 4),
        "n_users" -> countDistinct(col("user_id"))))
        .sortValues(Seq(SortKey.asc("bucket"))).df,
      Some("""
        SELECT date_trunc('hour', ts) AS bucket, count(*) AS n,
               round(sum(value), 4) AS sum_value,
               count(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1 ORDER BY 1"""),
      headline = true),

    // resample closed='right', label='right' (pandas bin-edge options):
    // boundary points shift into the earlier (H-1h, H] bin via a 1µs
    // nudge before truncation; the label stamps the upper edge. Same
    // one-exchange groupBy shape as q90.
    Q("q173_resample_closed_right",
      (s, dir) => Frame(Resample.downsampleWith(
        t(s, dir, "events"), "ts", "hour", closed = "right", label = "right",
        "n" -> count(lit(1)),
        "sum_value" -> round(sum(col("value")), 4)))
        .sortValues(Seq(SortKey.asc("bucket"))).df,
      Some("""
        SELECT date_trunc('hour', ts::TIMESTAMP - INTERVAL 1 MICROSECOND)
                 + INTERVAL 1 HOUR AS bucket,
               count(*) AS n,
               round(sum(value), 4) AS sum_value
        FROM events GROUP BY 1 ORDER BY 1""")),

    // resample('1d').asfreq + fill 0 (reference resample_asfreq QC:5879):
    // dense daily spine generated inside the plan, left-joined.
    Q("q91_asfreq_daily",
      (s, dir) => Frame(Resample.asfreq(
        t(s, dir, "events"), "ts", "day", expr("INTERVAL 1 DAY"),
        Seq("n" -> count(lit(1)).cast("double"),
          "sum_value" -> round(sum(col("value")), 4)),
        fillZero = true))
        .sortValues(Seq(SortKey.asc("bucket"))).df,
      Some("""
        WITH spine AS (
          SELECT unnest(generate_series(
            (SELECT date_trunc('day', min(ts)) FROM events),
            (SELECT date_trunc('day', max(ts)) FROM events),
            INTERVAL 1 DAY)) AS bucket),
        agg AS (
          SELECT date_trunc('day', ts) AS bucket,
                 CAST(count(*) AS DOUBLE) AS n, round(sum(value), 4) AS sum_value
          FROM events GROUP BY 1)
        SELECT spine.bucket, coalesce(n, 0.0) AS n, coalesce(sum_value, 0.0) AS sum_value
        FROM spine LEFT JOIN agg USING (bucket) ORDER BY bucket""")),

    // gap-based sessionization (30 min): two stacked windows per user —
    // one shuffle on user_id, no global order.
    Q("q92_sessionize",
      (s, dir) => Frame(Resample.sessionize(
        t(s, dir, "events"), "user_id", "ts", 1800))
        .groupby("user_id").agg(
          "n_sessions" -> max(col("session_id")),
          "n_events" -> count(lit(1)))
        .sortValues(Seq(SortKey.asc("user_id"))).df,
      Some("""
        SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions, count(*) AS n_events
        FROM (
          SELECT user_id,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800000000
                        THEN 1 ELSE 0 END AS brk
            FROM events))
        GROUP BY user_id ORDER BY user_id""")))
}

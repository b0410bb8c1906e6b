package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.{Frame, SortKey}
import graft.ops.{Ewm, RowOrder}
import QueryKit._

/**
 * §2.6 remainder: ewm, time-based rolling (rangeBetween), rolling
 * var/std/median/rank, global rank + pct_change without an
 * unpartitioned window (reference: QC:1668-1783 rolling family;
 * modin/pandas/window.py:99 time-offset rolling, :34 ewm; QC:2862 rank;
 * base QC:2083 pct_change).
 */
object WindowExtraQueries {

  val all: Seq[Q] = Seq(

    // ewm(alpha=0.5).mean() per user — O(n) recurrence per group via
    // flatMapGroups (ops.Ewm); oracle = the O(n²) closed form (weights
    // are exact powers of 2, so both engines sum the same quantities).
    Q("q114_ewm",
      (s, dir) => {
        val src = t(s, dir, "events")
          .withColumn("__ord__", unix_micros(col("ts").cast("timestamp")))
        Frame(Ewm.meanByKey(src, "user_id", "__ord__", "event_id", "value",
          alpha = 0.5, out = "ewm")
          .select(col("event_id"), round(col("ewm"), 4).as("ewm_mean")))
          .sortValues(Seq(SortKey.asc("event_id"))).df
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, value,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events)
        SELECT a.event_id,
               round(sum(power(0.5, a.rn - b.rn) * b.value)
                     / sum(power(0.5, a.rn - b.rn)), 4) AS ewm_mean
        FROM e a JOIN e b ON a.user_id = b.user_id AND b.rn <= a.rn
        GROUP BY a.event_id
        ORDER BY a.event_id""")),

    // Time-based rolling (pandas rolling('1h')): RANGE window over the
    // event-time axis per user — sum/count of the trailing hour.
    Q("q115_rolling_time",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(unix_micros(col("ts").cast("timestamp")))
          .rangeBetween(-3600L * 1000000L, 0)
        Frame(t(s, dir, "events").select(
          col("event_id"),
          count(lit(1)).over(w).as("n_1h"),
          round(sum(col("value")).over(w), 4).as("sum_1h")))
          .sortValues(Seq(SortKey.asc("event_id"))).df
      },
      Some("""
        SELECT event_id,
               count(*) OVER w AS n_1h,
               round(sum(value) OVER w, 4) AS sum_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        ORDER BY event_id""")),

    // rolling var/std/median + rolling rank over a 7-row window.
    // Median interpolates the two middle cents at factor exactly 0.5, so
    // a 4-decimal round can't tie; var/std are messy rationals (no ties).
    // Rolling rank = count of window values ≤ current, via a lambda over
    // the windowed collect_list (stays in codegen, no UDF).
    Q("q116_rolling_var_median_rank",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(-6, 0)
        val cnt = count(lit(1)).over(w)
        val vals = collect_list(col("value")).over(w)
        Frame(t(s, dir, "events").select(
          col("event_id"),
          when(cnt >= 7, round(var_samp(col("value")).over(w), 4)).as("roll_var"),
          when(cnt >= 7, round(stddev_samp(col("value")).over(w), 4)).as("roll_std"),
          when(cnt >= 7, round(percentile(col("value"), lit(0.5)).over(w), 4)).as("roll_median"),
          size(filter(vals, v => v <= col("value"))).cast("long").as("roll_rank")))
          .sortValues(Seq(SortKey.asc("event_id"))).df
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, value,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events)
        SELECT a.event_id,
               CASE WHEN count(*) >= 7 THEN round(var_samp(b.value), 4) END AS roll_var,
               CASE WHEN count(*) >= 7 THEN round(stddev_samp(b.value), 4) END AS roll_std,
               CASE WHEN count(*) >= 7 THEN round(quantile_cont(b.value, 0.5), 4) END AS roll_median,
               count(*) FILTER (WHERE b.value <= a.value) AS roll_rank
        FROM e a JOIN e b
          ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 6 AND a.rn
        GROUP BY a.event_id, a.value
        ORDER BY a.event_id""")),

    // expanding().median() / quantile (reference expanding_median,
    // expanding_quantile QC:1475-1667): exact percentile over the
    // unbounded-preceding frame per user. Median of cents interpolates
    // two cents at factor 0.5 — no 4-decimal rounding tie possible.
    Q("q138_expanding_median",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, 0)
        Frame(t(s, dir, "events").select(
          col("event_id"),
          round(percentile(col("value"), lit(0.5)).over(w), 4).as("exp_median"),
          round(percentile(col("value"), lit(0.25)).over(w), 4).as("exp_q25")))
          .sortValues(Seq(SortKey.asc("event_id"))).df
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, value,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events)
        SELECT a.event_id,
               round(quantile_cont(b.value, 0.5), 4) AS exp_median,
               round(quantile_cont(b.value, 0.25), 4) AS exp_q25
        FROM e a JOIN e b ON a.user_id = b.user_id AND b.rn <= a.rn
        GROUP BY a.event_id
        ORDER BY a.event_id""")),

    // Weighted rolling window (pandas rolling(7, win_type='triang') —
    // reference modin/pandas/window.py:34, the family modin defaults to
    // pandas for). Triangular weights [1,2,3,4,3,2,1] applied by position
    // over the windowed collect_list; exact integer arithmetic (Σw·cents
    // then one half-up division) so both engines agree bit-for-bit.
    Q("q137_rolling_weighted",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(-6, 0)
        val centsArr = collect_list((col("value").cast("decimal(18,2)") * 100).cast("long")).over(w)
        val cnt = size(centsArr)
        // weight for position i in a full 7-window: 4 - |3 - i|
        val weighted = aggregate(
          zip_with(centsArr, sequence(lit(0), cnt - 1),
            (c, i) => c * (lit(4) - abs(lit(3) - i))),
          lit(0L), (acc, x) => acc + x)
        // mean dollars at 4 decimals: S*25/4 per 1e-4 unit (Σw = 16)
        val mean4 = floor((weighted * 50 + 4) / 8) / lit(10000.0)
        Frame(t(s, dir, "events").select(
          col("event_id"),
          when(cnt >= 7, mean4).as("triang_mean")))
          .sortValues(Seq(SortKey.asc("event_id"))).df
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events)
        SELECT a.event_id,
               CASE WHEN count(*) >= 7
                    THEN floor((50 * sum(b.c * (4 - abs(3 - (b.rn - a.rn + 6)))) + 4) / 8)
                         / 10000.0
               END AS triang_mean
        FROM e a JOIN e b
          ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 6 AND a.rn
        GROUP BY a.event_id
        ORDER BY a.event_id""")),

    // rolling(7, win_type='gaussian').mean(std=2) — the scipy
    // get_window('gaussian') weights w_i = exp(-((i-center)/std)²/2),
    // center = (M-1)/2. Unlike the triang row there is no exact-integer
    // formulation (the weights are transcendental), so both engines
    // compute the identical double formula and the result rounds to 4 —
    // the same float-compare exposure the ewm family documents. Same
    // one-exchange keyed window as q137.
    Q("q250_rolling_gaussian",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(-6, 0)
        val vals = collect_list(col("value").cast("double")).over(w)
        val cnt = size(vals)
        val weighted = aggregate(
          zip_with(vals, sequence(lit(0), cnt - 1),
            (v, i) => v * exp((lit(3.0) - i) * (i - lit(3.0)) / lit(8.0))),
          lit(0.0), (acc, x) => acc + x)
        val wsum = aggregate(sequence(lit(0), cnt - 1),
          lit(0.0), (acc, i) => acc + exp((lit(3.0) - i) * (i - lit(3.0)) / lit(8.0)))
        Frame(t(s, dir, "events").select(
          col("event_id"),
          when(cnt >= 7, round(weighted / wsum, 4)).as("gauss_mean")))
          .sortValues(Seq(SortKey.asc("event_id"))).df
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, value,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events)
        SELECT a.event_id,
               CASE WHEN count(*) >= 7
                    THEN round(
                      sum(b.value * exp(-((b.rn - a.rn + 6) - 3.0)
                                       * ((b.rn - a.rn + 6) - 3.0) / 8.0))
                      / sum(exp(-((b.rn - a.rn + 6) - 3.0)
                               * ((b.rn - a.rn + 6) - 3.0) / 8.0)), 4)
               END AS gauss_mean
        FROM e a JOIN e b
          ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 6 AND a.rn
        GROUP BY a.event_id
        ORDER BY a.event_id""")),

    // The remaining closed-form win_type windows pandas/scipy support
    // without a free parameter: bartlett (triangular with ZERO endpoints
    // — exact-integer arithmetic like q137), hamming and blackman
    // (cosine-sum windows — the 7 weights are precomputed ONCE and
    // embedded as identical double literals in the Spark plan and the
    // oracle SQL, so no libm cos() divergence can leak in; only the
    // Σw·v fold and one divide are computed at runtime, the q250
    // float-compare exposure). Same one-exchange keyed window as q137.
    Q("q261_rolling_win_types",
      (s, dir) => {
        val hamW = Seq(0.08000000000000002, 0.30999999999999994, 0.7699999999999999,
          1.0, 0.7700000000000002, 0.30999999999999994, 0.08000000000000002)
        val blaW = Seq(-1.3877787807814457e-17, 0.12999999999999995, 0.6299999999999999,
          0.9999999999999999, 0.6300000000000002, 0.12999999999999995,
          -1.3877787807814457e-17)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(-6, 0)
        val centsArr = collect_list((col("value").cast("decimal(18,2)") * 100).cast("long")).over(w)
        val vals = collect_list(col("value").cast("double")).over(w)
        val cnt = size(vals)
        // bartlett scaled ints [0,1,2,3,2,1,0], Σ=9; half-up 4dp division
        val bart = aggregate(
          zip_with(centsArr, sequence(lit(0), cnt - 1),
            (c, i) => c * (lit(3) - abs(lit(3) - i))),
          lit(0L), (acc, x) => acc + x)
        val bart4 = floor((bart * 200 + 9) / 18) / lit(10000.0)
        def cosWin(weights: Seq[Double], wsum: Double) = {
          val warr = array(weights.map(lit): _*)
          round(aggregate(
            zip_with(vals, sequence(lit(0), cnt - 1),
              (v, i) => v * element_at(warr, i.cast("int") + 1)),
            lit(0.0), (acc, x) => acc + x) / wsum, 4)
        }
        Frame(t(s, dir, "events").select(
          col("event_id"),
          when(cnt >= 7, bart4).as("bartlett_mean"),
          when(cnt >= 7, cosWin(hamW, 3.3200000000000007)).as("hamming_mean"),
          when(cnt >= 7, cosWin(blaW, 2.52)).as("blackman_mean")))
          .sortValues(Seq(SortKey.asc("event_id"))).df
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, value,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events)
        SELECT a.event_id,
               CASE WHEN count(*) >= 7
                    THEN floor((200 * sum(b.c * (3 - abs(3 - (b.rn - a.rn + 6)))) + 9)
                               / 18) / 10000.0
               END AS bartlett_mean,
               CASE WHEN count(*) >= 7
                    THEN round(sum(b.value * list_extract(
                           [0.08000000000000002, 0.30999999999999994,
                            0.7699999999999999, 1.0, 0.7700000000000002,
                            0.30999999999999994, 0.08000000000000002],
                           (b.rn - a.rn + 6) + 1)) / 3.3200000000000007, 4)
               END AS hamming_mean,
               CASE WHEN count(*) >= 7
                    THEN round(sum(b.value * list_extract(
                           [-1.3877787807814457e-17, 0.12999999999999995,
                            0.6299999999999999, 0.9999999999999999,
                            0.6300000000000002, 0.12999999999999995,
                            -1.3877787807814457e-17],
                           (b.rn - a.rn + 6) + 1)) / 2.52, 4)
               END AS blackman_mean
        FROM e a JOIN e b
          ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 6 AND a.rn
        GROUP BY a.event_id
        ORDER BY a.event_id""")),

    // The PARAMETERIZED scipy win_types (the last win_type tail —
    // VERDICT r12 "what's missing" 3): kaiser(beta=14) whose weights need
    // a Bessel I0 term, and exponential(tau=1) — both resolved at
    // BUILD time to 7 double literals embedded identically in the Spark
    // plan and the oracle SQL (the q261 discipline: no runtime
    // libm/Bessel divergence can leak in; only the Σw·v fold and one
    // divide run per row — the documented q250 float-compare exposure).
    // Kaiser weights computed from the public scipy formula
    // w[n] = I0(β·√(1−((n−α)/α)²))/I0(β), α=(M−1)/2, via the power
    // series Σ(x/2)^2k/(k!)²; exponential w[n] = exp(−|n−center|/τ).
    // Same one-exchange keyed window as q137/q250/q261.
    Q("q280_rolling_kaiser_exponential",
      (s, dir) => {
        val kaiW = Seq(7.726866835270366e-06, 0.032885525977867806, 0.4627164978007909,
          1.0, 0.4627164978007909, 0.032885525977867806, 7.726866835270366e-06)
        val expW = Seq(0.049787068367863944, 0.1353352832366127, 0.36787944117144233,
          1.0, 0.36787944117144233, 0.1353352832366127, 0.049787068367863944)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(-6, 0)
        val vals = collect_list(col("value").cast("double")).over(w)
        val cnt = size(vals)
        def winMean(weights: Seq[Double], wsum: Double) = {
          val warr = array(weights.map(lit): _*)
          round(aggregate(
            zip_with(vals, sequence(lit(0), cnt - 1),
              (v, i) => v * element_at(warr, i.cast("int") + 1)),
            lit(0.0), (acc, x) => acc + x) / wsum, 4)
        }
        Frame(t(s, dir, "events").select(
          col("event_id"),
          when(cnt >= 7, winMean(kaiW, 1.991219501290988)).as("kaiser_mean"),
          when(cnt >= 7, winMean(expW, 2.106003585551838)).as("exp_mean")))
          .sortValues(Seq(SortKey.asc("event_id"))).df
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, value,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events)
        SELECT a.event_id,
               CASE WHEN count(*) >= 7
                    THEN round(sum(b.value * list_extract(
                           [7.726866835270366e-06, 0.032885525977867806,
                            0.4627164978007909, 1.0, 0.4627164978007909,
                            0.032885525977867806, 7.726866835270366e-06],
                           (b.rn - a.rn + 6) + 1)) / 1.991219501290988, 4)
               END AS kaiser_mean,
               CASE WHEN count(*) >= 7
                    THEN round(sum(b.value * list_extract(
                           [0.049787068367863944, 0.1353352832366127,
                            0.36787944117144233, 1.0, 0.36787944117144233,
                            0.1353352832366127, 0.049787068367863944],
                           (b.rn - a.rn + 6) + 1)) / 2.106003585551838, 4)
               END AS exp_mean
        FROM e a JOIN e b
          ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 6 AND a.rn
        GROUP BY a.event_id
        ORDER BY a.event_id""")),

    // rolling corr/cov over a 10-row window per user (reference
    // rolling_corr/cov base QC:6715,6740) — Spark's corr/covar_samp are
    // window-capable aggregates, so this stays one shuffle on user_id.
    Q("q132_rolling_corr",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(-9, 0)
        val cnt = count(lit(1)).over(w)
        // event_id is strictly increasing, so the second variable always
        // has positive variance — a constant window column would make
        // ANSI-mode corr divide by zero
        val vid = col("event_id").cast("double")
        Frame(t(s, dir, "events").select(
          col("event_id"),
          when(cnt >= 10, roundz(corr(col("value"), vid).over(w), 4)).as("roll_corr"),
          when(cnt >= 10, roundz(covar_samp(col("value"), vid).over(w), 4)).as("roll_cov")))
          .sortValues(Seq(SortKey.asc("event_id"))).df
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, value,
                 CAST(event_id AS DOUBLE) AS vid,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events)
        SELECT a.event_id,
               CASE WHEN count(*) >= 10 THEN round(corr(b.value, b.vid), 4) + 0.0 END AS roll_corr,
               CASE WHEN count(*) >= 10 THEN round(covar_samp(b.value, b.vid), 4) + 0.0 END AS roll_cov
        FROM e a JOIN e b
          ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 9 AND a.rn
        GROUP BY a.event_id
        ORDER BY a.event_id""")),

    // GLOBAL time-based rolling ((t-1h, t] per row, ties share windows)
    // via time-sliced block overlap — no unpartitioned range window.
    // Oracle runs the single-partition formulation on epoch µs.
    Q("q174_global_time_rolling",
      (s, dir) => {
        val src = t(s, dir, "events").select(col("event_id"), col("ts"), col("value"))
        Frame(graft.ops.RollingBlocks.rollingTimeAgg(
          src, "ts", windowSec = 3600L,
          Seq(("value", "count", "n_1h"), ("value", "sum", "sum_1h")))
          .select(col("event_id"), col("n_1h"), round(col("sum_1h"), 4).as("sum_1h")))
          .sortValues(Seq(SortKey.asc("event_id"))).df
      },
      Some("""
        SELECT event_id, n_1h, round(s, 4) AS sum_1h FROM (
          SELECT event_id,
                 count(value) OVER w AS n_1h,
                 sum(value) OVER w AS s
          FROM (SELECT event_id, epoch_us(ts::TIMESTAMP) AS tus, value FROM events)
          WINDOW w AS (ORDER BY tus RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW))
        ORDER BY event_id""")),

    // GLOBAL expanding through the fluent API — parallel-prefix running
    // sums (value + validity) in one pass, min_periods gate, no
    // unpartitioned window. Oracle = the single-partition formulation.
    Q("q171_expanding_fluent",
      (s, dir) => {
        // exact-cents running sum: the sum-then-divide mean hits last-ulp
        // rounding ties vs the oracle's avg(), so the mean is derived
        // half-up from exact integers (the q117 discipline)
        val fr = Frame(t(s, dir, "orders").select(col("o_orderkey"),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents")))
          .sortValues(Seq(SortKey.asc("o_orderkey")))
        val withS = fr.expanding(minPeriods = 10).sum("cents", "s")
          .expanding(minPeriods = 10).count("cents", "c")
        // round(mean,4) half-up = floor((2·s·100 + c)/(2c)) / 1e4 — exact
        // in double while the numerator < 2^53
        val mean4 = floor((col("s") * 200 + col("c")) / (col("c") * 2)) / 10000.0
        Frame(withS.df.select(col("o_orderkey"), mean4.as("exp_mean")))
          .sortValues(Seq(SortKey.asc("o_orderkey"))).df
      },
      Some("""
        SELECT o_orderkey,
               CASE WHEN c >= 10 THEN floor((s * 200 + c) / (c * 2)) / 10000.0 END AS exp_mean
        FROM (
          SELECT o_orderkey,
                 sum(cents) OVER w AS s,
                 count(cents) OVER w AS c
          FROM (SELECT o_orderkey,
                       CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
                FROM orders)
          WINDOW w AS (ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        ORDER BY o_orderkey""")),

    // GLOBAL bounded rolling with NO unpartitioned window: block-overlap
    // (ops/RollingBlocks) — row order → block id → ghost the last w-1
    // rows into the next block → per-block bounded window. One hash
    // shuffle; ghost volume (w-1)/B of the corpus. The oracle runs the
    // formulation this plan exists to avoid.
    Q("q169_global_rolling",
      (s, dir) => {
        val src = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
        Frame(graft.ops.RollingBlocks.rollingAgg(
          src, Seq(SortKey.asc("o_orderkey")), window = 20,
          Seq(("o_totalprice", "sum", "rsum"), ("o_totalprice", "mean", "rmean"),
            ("o_totalprice", "count", "rcnt")))
          .select(col("o_orderkey"), round(col("rsum"), 2).as("rsum"),
            round(col("rmean"), 4).as("rmean"), col("rcnt")))
          .sortValues(Seq(SortKey.asc("o_orderkey"))).df
      },
      Some("""
        SELECT o_orderkey,
               CASE WHEN cnt >= 20 THEN round(s, 2) END AS rsum,
               CASE WHEN cnt >= 20 THEN round(m, 4) END AS rmean,
               CASE WHEN cnt >= 20 THEN cnt END AS rcnt
        FROM (
          SELECT o_orderkey,
                 sum(o_totalprice) OVER w AS s,
                 avg(o_totalprice) OVER w AS m,
                 count(o_totalprice) OVER w AS cnt
          FROM orders
          WINDOW w AS (ORDER BY o_orderkey ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        ORDER BY o_orderkey""")),

    // GLOBAL rolling skew/kurt/sem through the fluent API — the same
    // block-overlap plan as q169 carrying the bias-corrected higher
    // moments (Stats.skewOver/kurtOver/semOver inside the per-block
    // window); DuckDB's skewness/kurtosis are already the pandas
    // G1/G2-corrected forms, so the oracle is the single-partition
    // formulation the plan exists to avoid (same pattern as q143's
    // grouped twin).
    Q("q233_rolling_global_moments",
      (s, dir) => {
        val fr = Frame(t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice")))
          .sortValues(Seq(SortKey.asc("o_orderkey")))
        Frame(fr.rolling(20).agg(
          ("o_totalprice", "skew", "r_skew"),
          ("o_totalprice", "kurt", "r_kurt"),
          ("o_totalprice", "sem", "r_sem")).df
          .select(col("o_orderkey"), roundz(col("r_skew"), 4).as("r_skew"),
            roundz(col("r_kurt"), 4).as("r_kurt"), round(col("r_sem"), 4).as("r_sem")))
          .sortValues(Seq(SortKey.asc("o_orderkey"))).df
      },
      Some("""
        SELECT o_orderkey,
               CASE WHEN cnt >= 20 THEN round(sk, 4) + 0.0 END AS r_skew,
               CASE WHEN cnt >= 20 THEN round(kt, 4) + 0.0 END AS r_kurt,
               CASE WHEN cnt >= 20 THEN round(se, 4) END AS r_sem
        FROM (
          SELECT o_orderkey,
                 count(o_totalprice) OVER w AS cnt,
                 skewness(o_totalprice) OVER w AS sk,
                 kurtosis(o_totalprice) OVER w AS kt,
                 stddev_samp(o_totalprice) OVER w
                   / sqrt(count(o_totalprice) OVER w) AS se
          FROM orders
          WINDOW w AS (ORDER BY o_orderkey ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        ORDER BY o_orderkey""")),

    // GLOBAL rank + pct_change with NO unpartitioned window: materialize
    // __row_order__ with the two-pass block-offset plan (ops.RowOrder),
    // then rank(ties=min) = min row-number per value (a value-partitioned
    // window) and pct_change = equi-join on adjacent positions (a shuffle
    // join on the position key — both stages scale with partitions).
    Q("q117_global_rank_pctchange",
      (s, dir) => {
        val fr = Frame(t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice")),
          ordering = Seq(SortKey.desc("o_totalprice"), SortKey.asc("o_orderkey")))
        val ordered = RowOrder.withRowOrder(fr.df, fr.ordering)
        val wVal = Window.partitionBy(col("o_totalprice"))
        // pandas-default average ties share the value partitioning: no
        // extra exchange for the second method
        val ranked = ordered
          .withColumn("rnk", min(col("__row_order__") + 1).over(wVal))
          .withColumn("avg_rnk",
            col("rnk").cast("double") +
              (count(lit(1)).over(wVal) - 1).cast("double") / 2.0)
        val prev = ordered.select(
          (col("__row_order__") + 1).as("__ro_next__"),
          col("o_totalprice").as("__prev_price__"))
        // pct_change at 6 decimals via exact integer cents arithmetic —
        // Spark's round() rounds the shortest decimal repr while DuckDB
        // rounds the exact binary value, so true x.xxxxx5 ties diverge;
        // half-up division on exact cents is identical in both engines.
        val cCur = (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        val cPrev = (col("__prev_price__").cast("decimal(18,2)") * 100).cast("long")
        val pct6 = floor(((cCur - cPrev) * 2000000L + cPrev) / (cPrev * 2)) / lit(1000000.0)
        Frame(ranked
          .join(prev, ranked("__row_order__") === prev("__ro_next__"), "left")
          .select(
            col("o_orderkey"),
            col("rnk"),
            col("avg_rnk"),
            pct6.as("pct_change")))
          .sortValues(Seq(SortKey.asc("o_orderkey"))).df
      },
      Some("""
        SELECT o_orderkey,
               rank() OVER (ORDER BY o_totalprice DESC) AS rnk,
               rank() OVER (ORDER BY o_totalprice DESC)
                 + (count(*) OVER (PARTITION BY o_totalprice) - 1) / 2.0 AS avg_rnk,
               floor(((c - pc) * 2000000 + pc) / (pc * 2)) / 1000000.0 AS pct_change
        FROM (
          SELECT o_orderkey, o_totalprice,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
                 lag(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                   OVER (ORDER BY o_totalprice DESC, o_orderkey) AS pc
          FROM orders)
        ORDER BY o_orderkey""")),

    // rolling(10).skew()/kurt() + expanding sem/skew (reference
    // rolling_skew/rolling_kurt QC:1475-1783, expanding_sem/skew family):
    // Stats.skewOver/kurtOver compose the pandas bias corrections from
    // Spark's windowed moment aggregates — plain window functions, one
    // shuffle on user_id, whole-stage codegen throughout. Rolling gates
    // at the full window (pandas min_periods = window); expanding gates
    // at the moment's own minimum n.
    Q("q143_rolling_skew_kurt",
      (s, dir) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        val w10 = byUser.rowsBetween(-9, 0)
        val wExp = byUser.rowsBetween(Window.unboundedPreceding, 0)
        val n10 = count(col("value")).over(w10)
        val nExp = count(col("value")).over(wExp)
        Frame(t(s, dir, "events").select(
          col("event_id"),
          when(n10 === 10, roundz(graft.functions.Stats.skewOver(col("value"), w10), 4))
            .as("roll_skew"),
          when(n10 === 10, roundz(graft.functions.Stats.kurtOver(col("value"), w10), 4))
            .as("roll_kurt"),
          when(nExp >= 2, round(graft.functions.Stats.semOver(col("value"), wExp), 4))
            .as("exp_sem"),
          roundz(graft.functions.Stats.skewOver(col("value"), wExp), 4).as("exp_skew")))
          .sortValues(Seq(SortKey.asc("event_id"))).df
      },
      Some("""
        SELECT event_id,
               CASE WHEN n10 = 10 THEN round(sk10, 4) + 0.0 END AS roll_skew,
               CASE WHEN n10 = 10 THEN round(kt10, 4) + 0.0 END AS roll_kurt,
               CASE WHEN ne >= 2 THEN round(seme, 4) END AS exp_sem,
               CASE WHEN ne >= 3 THEN round(ske, 4) + 0.0 END AS exp_skew
        FROM (
          SELECT event_id,
                 count(value) OVER w10 AS n10,
                 skewness(value) OVER w10 AS sk10,
                 kurtosis(value) OVER w10 AS kt10,
                 count(value) OVER we AS ne,
                 stddev_samp(value) OVER we / sqrt(count(value) OVER we) AS seme,
                 skewness(value) OVER we AS ske
          FROM events
          WINDOW w10 AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
                 we AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        ORDER BY event_id""")),

    // rolling(center=True) — odd AND even windows (the even case pins
    // pandas' extra-row-on-the-past-side offset rule) — plus time-based
    // rolling closed='left'/'both' as exact integer µs range bounds
    // (api/GroupedRolling, GroupedTimeRolling). Same one-shuffle window
    // plans as q55/q115; only the frame bounds move.
    Q("q186_rolling_center_closed",
      (s, dir) => {
        val ord = Seq(SortKey.asc("o_orderkey"))
        val centered = f(s, dir, "orders")
          .groupby("o_orderpriority").rolling(5, ord, center = true)
          .mean("o_totalprice", "c5_mean")
          .groupby("o_orderpriority").rolling(4, ord, center = true)
          .sum("o_totalprice", "c4_sum")
        val ev = Frame(t(s, dir, "events").select(
          col("event_id"), col("user_id"), col("value"),
          unix_micros(col("ts").cast("timestamp")).as("us")))
        val hour = 3600L * 1000000L
        val timed = ev.groupby("user_id").rollingTime(hour, "us", closed = "left")
          .sum("value", "sum_left")
          .groupby("user_id").rollingTime(hour, "us", closed = "both")
          .count("value", "n_both")
        val a = Frame(centered.df.select(col("o_orderkey").as("k"),
          round(col("c5_mean"), 4).as("c5_mean"), round(col("c4_sum"), 2).as("c4_sum"))
          .filter(col("k") <= 4000))
        val b = timed.df.select(col("event_id").as("k"),
          round(col("sum_left"), 4).as("sum_left"), col("n_both"))
          .filter(col("k") <= 1000)
        Frame(a.df.join(b, Seq("k"), "full_outer"))
          .sortValues(Seq(SortKey.asc("k"))).df
      },
      Some("""
        WITH c AS (
          SELECT o_orderkey AS k,
                 CASE WHEN count(o_totalprice) OVER w5 >= 5
                      THEN round(avg(o_totalprice) OVER w5, 4) END AS c5_mean,
                 CASE WHEN count(o_totalprice) OVER w4 >= 4
                      THEN round(sum(o_totalprice) OVER w4, 2) END AS c4_sum
          FROM orders
          WINDOW w5 AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
                        ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING),
                 w4 AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
                        ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING)),
        t AS (
          SELECT event_id AS k,
                 CASE WHEN count(value) OVER wl >= 1
                      THEN round(sum(value) OVER wl, 4) END AS sum_left,
                 count(value) OVER wb AS n_both
          FROM (SELECT event_id, user_id, value, epoch_us(ts::TIMESTAMP) AS us
                FROM events)
          WINDOW wl AS (PARTITION BY user_id ORDER BY us
                        RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING),
                 wb AS (PARTITION BY user_id ORDER BY us
                        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW))
        SELECT coalesce(c.k, t.k) AS k, c5_mean, c4_sum, sum_left, n_both
        FROM (SELECT * FROM c WHERE k <= 4000) c
        FULL OUTER JOIN (SELECT * FROM t WHERE k <= 1000) t ON c.k = t.k
        ORDER BY 1""")),

    // rolling.quantile at arbitrary q — grouped (native bounded window)
    // AND global (the block-overlap plan, no unpartitioned window; the
    // oracle runs the single-window formulation the plan exists to
    // avoid). Exact linear interpolation = DuckDB quantile_cont.
    Q("q193_rolling_quantile",
      (s, dir) => {
        val wG = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc).rowsBetween(-6, 0)
        val cntG = count(col("value")).over(wG)
        val grouped = t(s, dir, "events").select(
          col("event_id").as("k"),
          when(cntG >= 7, round(percentile(col("value"), lit(0.25)).over(wG), 4)).as("g_q25"),
          when(cntG >= 7, round(percentile(col("value"), lit(0.75)).over(wG), 4)).as("g_q75"))
        val global = Frame(t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice")))
          .sortValues(Seq(SortKey.asc("o_orderkey")))
          .rolling(20).quantile("o_totalprice", 0.9, "r_q90")
        val globalOut = global.df.select(col("o_orderkey").as("k"),
          round(col("r_q90"), 4).as("r_q90"))
        Frame(grouped.join(globalOut, Seq("k"), "full_outer"))
          .sortValues(Seq(SortKey.asc("k"))).df
      },
      Some("""
        WITH g AS (
          SELECT event_id AS k,
                 CASE WHEN count(value) OVER w >= 7
                      THEN round(quantile_cont(value, 0.25) OVER w, 4) END AS g_q25,
                 CASE WHEN count(value) OVER w >= 7
                      THEN round(quantile_cont(value, 0.75) OVER w, 4) END AS g_q75
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
        r AS (
          SELECT o_orderkey AS k,
                 CASE WHEN count(o_totalprice) OVER w >= 20
                      THEN round(quantile_cont(o_totalprice, 0.9) OVER w, 4) END AS r_q90
          FROM orders
          WINDOW w AS (ORDER BY o_orderkey ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        SELECT coalesce(g.k, r.k) AS k, g_q25, g_q75, r_q90
        FROM g FULL OUTER JOIN r ON g.k = r.k
        ORDER BY 1""")),

    // ewm.var / ewm.std (bias=False, adjust=True), alpha=0.5 — the
    // bit-deterministic dyadic path (ops/Ewm.varByKeyDyadic): quantized
    // inputs, 40-step weight cap, exact 128-bit integer moment sums,
    // one fixed double tree — see the op's doc for why the plain
    // recurrence/closed-form pair hash-drifted at sf0.1 (deviation 14).
    // The oracle replays the identical integer sums as HUGEINTs over a
    // capped O(n·41) self-join (n = a.rn is the total-observation count
    // — the fixture has no null values) plus the identical conversion
    // tree: the 3×36-bit chunk split exists because DuckDB's direct
    // HUGEINT→DOUBLE cast is not correctly rounded (~1% off-by-ulp,
    // measured), while BIGINT chunks < 2^53 convert exactly everywhere.
    Q("q195_ewm_var",
      (s, dir) => {
        val src = t(s, dir, "events")
          .withColumn("__ord__", unix_micros(col("ts").cast("timestamp")))
        Frame(Ewm.varByKeyDyadic(src, "user_id", "__ord__", "event_id", "value",
          out = "ev")
          .select(col("event_id"), round(col("ev"), 4).as("ewm_var"),
            round(col("ev_std"), 4).as("ewm_std")))
          .sortValues(Seq(SortKey.asc("event_id"))).df
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, value,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events),
        sums AS (
          SELECT a.event_id, a.rn AS n,
                 sum((1::BIGINT << (40 - (a.rn - b.rn)))::HUGEINT) AS sw_s,
                 sum(((1::BIGINT << (40 - (a.rn - b.rn)))::HUGEINT)
                     * ((1::BIGINT << (40 - (a.rn - b.rn)))::HUGEINT)) AS sw2_s,
                 sum(CAST(floor(b.value * 1073741824.0) AS HUGEINT)
                     * (1::BIGINT << (40 - (a.rn - b.rn)))::HUGEINT) AS swx_s,
                 sum(CAST(floor(b.value * 1073741824.0) AS HUGEINT)
                     * CAST(floor(b.value * 1073741824.0) AS HUGEINT)
                     * (1::BIGINT << (40 - (a.rn - b.rn)))::HUGEINT) AS swx2_s
          FROM e a JOIN e b ON a.user_id = b.user_id
                           AND b.rn <= a.rn AND b.rn >= a.rn - 40
          GROUP BY a.event_id, a.rn),
        d AS (
          SELECT event_id, n,
                 (CAST(CAST(sw_s // (1::HUGEINT << 80) AS BIGINT) AS DOUBLE) * 1208925819614629174706176.0
                  + (CAST(CAST((sw_s // 1099511627776) % 1099511627776 AS BIGINT) AS DOUBLE) * 1099511627776.0
                     + CAST(CAST(sw_s % 1099511627776 AS BIGINT) AS DOUBLE))) / 1099511627776.0 AS sw,
                 (CAST(CAST(sw2_s // (1::HUGEINT << 80) AS BIGINT) AS DOUBLE) * 1208925819614629174706176.0
                  + (CAST(CAST((sw2_s // 1099511627776) % 1099511627776 AS BIGINT) AS DOUBLE) * 1099511627776.0
                     + CAST(CAST(sw2_s % 1099511627776 AS BIGINT) AS DOUBLE))) / 1208925819614629174706176.0 AS sw2,
                 (CAST(CAST(swx_s // (1::HUGEINT << 80) AS BIGINT) AS DOUBLE) * 1208925819614629174706176.0
                  + (CAST(CAST((swx_s // 1099511627776) % 1099511627776 AS BIGINT) AS DOUBLE) * 1099511627776.0
                     + CAST(CAST(swx_s % 1099511627776 AS BIGINT) AS DOUBLE))) / 1180591620717411303424.0 AS swx,
                 (CAST(CAST(swx2_s // (1::HUGEINT << 80) AS BIGINT) AS DOUBLE) * 1208925819614629174706176.0
                  + (CAST(CAST((swx2_s // 1099511627776) % 1099511627776 AS BIGINT) AS DOUBLE) * 1099511627776.0
                     + CAST(CAST(swx2_s % 1099511627776 AS BIGINT) AS DOUBLE))) / 1267650600228229401496703205376.0 AS swx2
          FROM sums)
        SELECT event_id,
               CASE WHEN n >= 2 AND sw * sw - sw2 > 0
                    THEN round(greatest((sw * sw / (sw * sw - sw2))
                         * (swx2 / sw - (swx / sw) * (swx / sw)), 0.0), 4) END AS ewm_var,
               CASE WHEN n >= 2 AND sw * sw - sw2 > 0
                    THEN round(sqrt(greatest((sw * sw / (sw * sw - sw2))
                         * (swx2 / sw - (swx / sw) * (swx / sw)), 0.0)), 4) END AS ewm_std
        FROM d ORDER BY event_id""")),

    // ewm.cov / ewm.corr (r9 — completes the ewm family): the O(n)
    // seven-sum recurrence vs the oracle's O(n²) closed form over decayed
    // weights, same pairing as q195. The second series is a
    // deterministic never-null function of event_id so both sides share
    // the no-missing-pair case exactly; corr's debias factors cancel, so
    // the oracle computes it from biased central moments directly.
    Q("q230_ewm_cov",
      (s, dir) => {
        val src = t(s, dir, "events")
          .withColumn("__ord__", unix_micros(col("ts").cast("timestamp")))
          .withColumn("y", pmod(col("event_id"), lit(997)).cast("double"))
        Frame(Ewm.covByKey(src, "user_id", "__ord__", "event_id", "value", "y",
          alpha = 0.5, out = "ec")
          .select(col("event_id"), roundz(col("ec"), 4).as("ewm_cov"),
            roundz(col("ec_corr"), 4).as("ewm_corr")))
          .sortValues(Seq(SortKey.asc("event_id"))).df
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, value,
                 CAST(event_id % 997 AS DOUBLE) AS y,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events),
        sums AS (
          SELECT a.event_id,
                 count(*) AS n,
                 sum(power(0.5, a.rn - b.rn)) AS sw,
                 sum(power(0.5, 2 * (a.rn - b.rn))) AS sw2,
                 sum(power(0.5, a.rn - b.rn) * b.value) AS swx,
                 sum(power(0.5, a.rn - b.rn) * b.y) AS swy,
                 sum(power(0.5, a.rn - b.rn) * b.value * b.y) AS swxy,
                 sum(power(0.5, a.rn - b.rn) * b.value * b.value) AS swx2,
                 sum(power(0.5, a.rn - b.rn) * b.y * b.y) AS swy2
          FROM e a JOIN e b ON a.user_id = b.user_id AND b.rn <= a.rn
          GROUP BY a.event_id)
        SELECT event_id,
               CASE WHEN n >= 2 AND sw * sw - sw2 > 0
                    THEN round((sw * sw / (sw * sw - sw2))
                         * (swxy / sw - (swx / sw) * (swy / sw)), 4) + 0.0 END AS ewm_cov,
               CASE WHEN n >= 2 AND sw * sw - sw2 > 0
                         AND swx2 / sw - (swx / sw) * (swx / sw) > 0
                         AND swy2 / sw - (swy / sw) * (swy / sw) > 0
                    THEN round(greatest(-1.0, least(1.0,
                         (swxy / sw - (swx / sw) * (swy / sw))
                         / sqrt(greatest(swx2 / sw - (swx / sw) * (swx / sw), 0)
                              * greatest(swy2 / sw - (swy / sw) * (swy / sw), 0)))), 4) + 0.0
                    END AS ewm_corr
        FROM sums ORDER BY event_id""")),

    // expanding.corr / expanding.cov — six running sums in one parallel
    // prefix (api/Expanding.corrCov), inputs centered by constants so the
    // closed form stays accurate at price magnitudes. The oracle uses
    // DuckDB's NATIVE windowed corr/covar_samp (Welford-style) — an
    // independent algorithm agreeing to 6 decimals.
    Q("q196_expanding_corr",
      (s, dir) => {
        val fr = Frame(t(s, dir, "orders").select(
          col("o_orderkey"), col("o_totalprice"),
          pmod(col("o_custkey"), lit(1000)).cast("double").as("ckm")))
          .sortValues(Seq(SortKey.asc("o_orderkey")))
        val out = fr.expanding(minPeriods = 10)
          .corr("o_totalprice", "ckm", "exp_corr", centerX = 150000.0, centerY = 500.0)
          .expanding(minPeriods = 10)
          .cov("o_totalprice", "ckm", "exp_cov", centerX = 150000.0, centerY = 500.0)
        Frame(out.df.select(col("o_orderkey"),
          roundz(col("exp_corr"), 6).as("exp_corr"),
          roundz(col("exp_cov"), 2).as("exp_cov")))
          .sortValues(Seq(SortKey.asc("o_orderkey"))).df
      },
      Some("""
        SELECT o_orderkey,
               CASE WHEN n >= 10 THEN round(c, 6) + 0.0 END AS exp_corr,
               CASE WHEN n >= 10 THEN round(cv, 2) + 0.0 END AS exp_cov
        FROM (
          SELECT o_orderkey,
                 count(*) OVER w AS n,
                 corr(o_totalprice, ckm) OVER w AS c,
                 covar_samp(o_totalprice, ckm) OVER w AS cv
          FROM (SELECT o_orderkey, o_totalprice,
                       CAST(o_custkey % 1000 AS DOUBLE) AS ckm
                FROM orders)
          WINDOW w AS (ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        ORDER BY o_orderkey""")))
}

package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.{Frame, SortKey}
import graft.ops.Missing
import QueryKit._

/**
 * §2.11 remainder + §2.2 conditionals: linear interpolate, bfill,
 * replace (dict + regex), case_when, compare, reindex
 * (reference: base QC:2172 interpolate; QC:2710-2812 fillna family;
 * QC:2107 replace; QC:4818 case_when; QC:4807 compare; base QC:1917
 * reindex).
 */
object MissingQueries {

  val all: Seq[Q] = Seq(

    // interpolate(method='linear') per user over induced nulls — exact
    // integer interpolation (see ops.Missing for why doubles can't be
    // rounded portably). Trailing nulls take the last value, leading
    // nulls stay null (pandas limit_direction='forward').
    Q("q122_interpolate",
      (s, dir) => {
        val masked = t(s, dir, "events")
          .withColumn("v", when(col("value") < 20 || col("value") > 30, col("value")))
        Frame(Missing.interpolateLinear(
          masked, Seq("user_id"), Seq(SortKey.asc("ts"), SortKey.asc("event_id")),
          "v", "v_interp")
          .select(col("event_id"), col("v_interp")))
          .sortValues(Seq(SortKey.asc("event_id"))).df
      },
      Some("""
        WITH m AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN value < 20 OR value > 30 THEN value END AS v
          FROM events),
        r AS (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM m),
        fbv AS (
          SELECT *,
                 last_value(CASE WHEN v IS NOT NULL
                   THEN CAST(CAST(v AS DECIMAL(18,2)) * 100 AS BIGINT) END IGNORE NULLS)
                   OVER wb AS pv,
                 last_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER wb AS pr,
                 first_value(CASE WHEN v IS NOT NULL
                   THEN CAST(CAST(v AS DECIMAL(18,2)) * 100 AS BIGINT) END IGNORE NULLS)
                   OVER wa AS nv,
                 first_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER wa AS nr
          FROM r
          WINDOW wb AS (PARTITION BY user_id ORDER BY rn
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 wa AS (PARTITION BY user_id ORDER BY rn
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        SELECT event_id,
               CASE WHEN v IS NOT NULL THEN v
                    WHEN pv IS NULL THEN NULL
                    WHEN nv IS NULL THEN pv / 100.0
                    ELSE floor((2 * (pv * 100 * (nr - pr) + (nv - pv) * 100 * (rn - pr))
                                + (nr - pr))
                               / (2 * (nr - pr))) / 10000.0
               END AS v_interp
        FROM fbv ORDER BY event_id""")),

    // bfill per user + replace dict (event_type) + replace regex (props
    // digit-masking) in one pass.
    Q("q123_bfill_replace",
      (s, dir) => {
        val masked = t(s, dir, "events")
          .withColumn("v", when(col("value") < 20 || col("value") > 30, col("value")))
        Frame(Frame(masked)
          .bfill("v", Seq("user_id"), Seq(SortKey.asc("ts"), SortKey.asc("event_id")))
          .replaceValues("event_type", Map("click" -> "tap"))
          .withColumn("props_masked", regexp_replace(col("props"), "[0-9]+", "N"))
          .df.select(col("event_id"), col("v").as("v_bfill"),
            col("event_type"), col("props_masked")))
          .sortValues(Seq(SortKey.asc("event_id"))).df
      },
      Some("""
        SELECT event_id,
               first_value(CASE WHEN value < 20 OR value > 30 THEN value END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v_bfill,
               CASE WHEN event_type = 'click' THEN 'tap' ELSE event_type END AS event_type,
               regexp_replace(props, '[0-9]+', 'N', 'g') AS props_masked
        FROM events ORDER BY event_id""")),

    // ffill(limit=2) (reference fillna limit handling QC:2710-2812): the
    // fill only reaches 2 rows past the last non-null — a bounded
    // trailing window instead of the unbounded one.
    Q("q139_ffill_limit",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(-2, 0)
        val v = when(col("value") < 20 || col("value") > 30, col("value"))
        Frame(t(s, dir, "events")
          .withColumn("v_limited", last(v, ignoreNulls = true).over(w))
          .select(col("event_id"), col("v_limited")))
          .sortValues(Seq(SortKey.asc("event_id"))).df
      },
      Some("""
        SELECT event_id,
               last_value(CASE WHEN value < 20 OR value > 30 THEN value END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS v_limited
        FROM events ORDER BY event_id""")),

    // case_when chain (reference QC:4818) + df.compare (QC:4807): rows
    // whose modified copy differs, with self/other values side by side.
    Q("q124_case_when_compare",
      (s, dir) => {
        val orders = t(s, dir, "orders")
        val tiered = orders.withColumn("tier",
          when(col("o_totalprice") > 300000, "high")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("low"))
        val other = orders.select(col("o_orderkey"),
          when(col("o_orderstatus") === "O", col("o_totalprice") + 1)
            .otherwise(col("o_totalprice")).as("price_other"))
        Frame(tiered.join(other, "o_orderkey")
          .filter(col("o_totalprice") =!= col("price_other"))
          .select(col("o_orderkey"), col("tier"),
            col("o_totalprice").as("price_self"), col("price_other")))
          .sortValues(Seq(SortKey.asc("o_orderkey"))).df
      },
      Some("""
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 300000 THEN 'high'
                    WHEN o_totalprice > 100000 THEN 'mid'
                    ELSE 'low' END AS tier,
               o_totalprice AS price_self,
               o_totalprice + 1 AS price_other
        FROM orders WHERE o_orderstatus = 'O'
        ORDER BY o_orderkey""")),

    // reindex to a dense key spine (reference base QC:1917 — full-axis
    // join with new labels): every key in [1, max+3], missing rows
    // zero-filled. The spine is generated inside the plan (spark.range —
    // parallel, no driver materialization).
    Q("q125_reindex",
      (s, dir) => {
        val cust = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_acctbal"))
        val maxKey = cust.agg(max(col("c_custkey"))).head().getLong(0)
        val spine = s.range(1, maxKey + 4).select(col("id").as("c_custkey"))
        Frame(spine.join(cust, Seq("c_custkey"), "left")
          .select(col("c_custkey"),
            coalesce(col("c_acctbal"), lit(0.0)).as("c_acctbal")))
          .sortValues(Seq(SortKey.asc("c_custkey"))).df
      },
      Some("""
        WITH spine AS (
          SELECT unnest(range(1, (SELECT max(c_custkey) + 4 FROM customer))) AS k)
        SELECT spine.k AS c_custkey, coalesce(c_acctbal, 0.0) AS c_acctbal
        FROM spine LEFT JOIN customer ON spine.k = customer.c_custkey
        ORDER BY spine.k""")),

    // interpolate methods beyond linear (reference base.py:2172 surface;
    // modin defaults every method to pandas — these are distributed
    // plans): pad = ignore-null running window; nearest = closer of the
    // two surrounding valids by row distance, midpoint ties to the
    // previous (scipy kind='nearest'); index = the line evaluated at the
    // event_id x-coordinate instead of the row position, in exact 1e-4
    // integer units (the q122 discipline).
    Q("q211_interpolate_methods",
      (s, dir) => {
        val masked = t(s, dir, "events")
          .withColumn("v", when(col("value") < 20 || col("value") > 30, col("value")))
        val ord = Seq(SortKey.asc("ts"), SortKey.asc("event_id"))
        val pad = Missing.interpolatePad(masked, Seq("user_id"), ord, "v", "v_pad")
        val near = Missing.interpolateNearest(pad, Seq("user_id"), ord, "v", "v_near")
        val byIdx = Missing.interpolateIndex(near, Seq("user_id"),
          Seq(SortKey.asc("event_id")), "event_id", "v", "v_idx")
        Frame(byIdx.select(col("event_id"), col("v_pad"), col("v_near"), col("v_idx")))
          .sortValues(Seq(SortKey.asc("event_id"))).df
      },
      Some("""
        WITH m AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN value < 20 OR value > 30 THEN value END AS v
          FROM events),
        r AS (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM m),
        fbv AS (
          SELECT *,
                 last_value(v IGNORE NULLS) OVER wb AS pad,
                 last_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS) OVER wb AS pv,
                 last_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER wb AS pr,
                 first_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS) OVER wa AS nv,
                 first_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER wa AS nr,
                 last_value(CASE WHEN v IS NOT NULL
                   THEN CAST(CAST(v AS DECIMAL(18,2)) * 100 AS BIGINT) END IGNORE NULLS)
                   OVER ib AS ipv,
                 last_value(CASE WHEN v IS NOT NULL THEN event_id END IGNORE NULLS)
                   OVER ib AS ipx,
                 first_value(CASE WHEN v IS NOT NULL
                   THEN CAST(CAST(v AS DECIMAL(18,2)) * 100 AS BIGINT) END IGNORE NULLS)
                   OVER ia AS inv,
                 first_value(CASE WHEN v IS NOT NULL THEN event_id END IGNORE NULLS)
                   OVER ia AS inx
          FROM r
          WINDOW wb AS (PARTITION BY user_id ORDER BY rn
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 wa AS (PARTITION BY user_id ORDER BY rn
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
                 ib AS (PARTITION BY user_id ORDER BY event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 ia AS (PARTITION BY user_id ORDER BY event_id
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        SELECT event_id,
               pad AS v_pad,
               CASE WHEN v IS NOT NULL THEN v
                    WHEN pv IS NULL THEN NULL
                    WHEN nv IS NULL THEN pv
                    WHEN rn - pr <= nr - rn THEN pv
                    ELSE nv END AS v_near,
               CASE WHEN v IS NOT NULL THEN v
                    WHEN ipv IS NULL THEN NULL
                    WHEN inv IS NULL THEN ipv / 100.0
                    ELSE floor((2 * (ipv * 100 * (inx - ipx)
                                     + (inv - ipv) * 100 * (event_id - ipx))
                                + (inx - ipx))
                               / (2 * (inx - ipx))) / 10000.0
               END AS v_idx
        FROM fbv ORDER BY event_id""")))
}

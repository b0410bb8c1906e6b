package graft.queries

import org.apache.spark.sql.functions._
import graft.api.{Frame, SortKey}
import QueryKit._

/**
 * §2.4 remainder: prod / any / all, quantile lists, corrwith,
 * searchsorted (reference: query_compiler.py:976-1159 Reduce family;
 * QC:2815 quantile_for_list_of_values; base QC:1326 corrwith; QC:2272
 * searchsorted).
 */
object AggExtraQueries {

  val all: Seq[Q] = Seq(

    // prod / any / all per group. Product is computed over exact integer
    // factors in [1,9] (long fold over collect_list) — a double product's
    // rounding depends on multiplication order, which differs between
    // engines; with ≤13 single-digit factors per group the int64 product
    // stays < 2^53, exact in both engines' arithmetic. floor() before the
    // int cast because DuckDB's double→int cast rounds while Spark's
    // truncates.
    Q("q14_prod_anyall",
      (s, dir) => f(s, dir, "lineitem")
        .filter(col("l_linenumber") <= 4)
        .groupby("l_orderkey")
        .agg(
          "prod_qty_digit" -> aggregate(
            collect_list(lit(1L) + pmod(floor(col("l_quantity")).cast("long"), lit(9L))),
            lit(1L), (acc, x) => acc * x),
          "any_big" -> bool_or(col("l_quantity") > 45),
          "all_pos" -> bool_and(col("l_quantity") > 0))
        .sortValues(Seq(SortKey.asc("l_orderkey"))).df,
      Some("""
        SELECT l_orderkey,
               CAST(product(1 + CAST(floor(l_quantity) AS BIGINT) % 9) AS BIGINT)
                 AS prod_qty_digit,
               bool_or(l_quantity > 45) AS any_big,
               bool_and(l_quantity > 0) AS all_pos
        FROM lineitem WHERE l_linenumber <= 4
        GROUP BY l_orderkey ORDER BY l_orderkey""")),

    // quantile(list) — one exact-percentile aggregate returning the whole
    // list (reference QC:2815) — plus corrwith as pairwise corr of one
    // anchor column against the rest (base QC:1326). The list is computed
    // as a single array aggregate and unpacked to scalar columns so the
    // oracle harness (which sorts result columns) can compare values.
    Q("q15_quantile_list_corrwith",
      (s, dir) => t(s, dir, "lineitem").agg(
        transform(
          percentile(col("l_extendedprice"), array(lit(0.1), lit(0.5), lit(0.9))),
          v => round(v, 4)).as("pq"),
        roundz(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corrwith_price"),
        roundz(corr(col("l_quantity"), col("l_discount")), 6).as("corrwith_disc"),
        roundz(corr(col("l_quantity"), col("l_tax")), 6).as("corrwith_tax"))
        .select(
          element_at(col("pq"), 1).as("price_q10"),
          element_at(col("pq"), 2).as("price_q50"),
          element_at(col("pq"), 3).as("price_q90"),
          col("corrwith_price"), col("corrwith_disc"), col("corrwith_tax")),
      Some("""
        SELECT round(qs[1], 4) AS price_q10,
               round(qs[2], 4) AS price_q50,
               round(qs[3], 4) AS price_q90,
               corrwith_price, corrwith_disc, corrwith_tax
        FROM (
          SELECT quantile_cont(l_extendedprice, [0.1, 0.5, 0.9]) AS qs,
                 round(corr(l_quantity, l_extendedprice), 6) + 0.0 AS corrwith_price,
                 round(corr(l_quantity, l_discount), 6) + 0.0 AS corrwith_disc,
                 round(corr(l_quantity, l_tax), 6) + 0.0 AS corrwith_tax
          FROM lineitem)""")),

    // searchsorted (reference QC:2272): insertion index of each probe
    // value into the sorted l_quantity column = count of rows strictly
    // below the probe — one distributed aggregate, no materialized sort.
    Q("q16_searchsorted",
      (s, dir) => {
        val probes = Seq(1.0, 10.0, 25.0, 40.0, 50.0)
        t(s, dir, "lineitem").agg(
          count(when(col("l_quantity") < probes.head, 1)).as("pos_1"),
          probes.tail.map(p =>
            count(when(col("l_quantity") < p, 1))
              .as(s"pos_${p.toInt}")): _*)
      },
      Some("""
        SELECT count(*) FILTER (WHERE l_quantity < 1) AS pos_1,
               count(*) FILTER (WHERE l_quantity < 10) AS pos_10,
               count(*) FILTER (WHERE l_quantity < 25) AS pos_25,
               count(*) FILTER (WHERE l_quantity < 40) AS pos_40,
               count(*) FILTER (WHERE l_quantity < 50) AS pos_50
        FROM lineitem""")),

    // pivot_table(margins=True) generalized: CUBE over two keys gives
    // every sub-total and the grand total in ONE pass (SURVEY §2.4 notes
    // pandas/modin lack grouping sets — Spark gets them free, and the
    // single cube aggregate replaces the reference's N margin recomputes).
    Q("q17_cube_margins",
      (s, dir) => Frame(t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          // grand-total cube margin sums the WHOLE table — exact cent
          // units (QueryKit.moneySum pattern) keep it order-invariant
          moneySum(col("o_totalprice")).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total")))
        .sortValues(Seq(SortKey.asc("status"), SortKey.asc("priority"))).df,
      Some("""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n,
               round(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS DECIMAL(18,0))) AS DOUBLE)
                     / 100.0, 2) AS total
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY status, priority""")),

    // corr(method='spearman') + Series.autocorr (reference defaults both
    // to single-node pandas). Spearman = Pearson over average ranks;
    // ranks come from the distinct-value-count + parallel-prefix plan
    // (ops/Rank — no unpartitioned rank window), autocorr shifts via the
    // block-offset row order. Oracle restates average rank with the
    // q165 window identity.
    Q("q185_spearman_autocorr",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val sp = graft.ops.Rank.spearman(
          li, "l_quantity", Seq("l_extendedprice", "l_discount"))
          .select(roundz(col("spearman_l_extendedprice"), 8).as("sp_price"),
            roundz(col("spearman_l_discount"), 8).as("sp_disc"))
        val ac = graft.ops.Rank.autocorr(
          t(s, dir, "orders"), Seq(SortKey.asc("o_orderkey")),
          "o_totalprice", Seq(1, 5))
          .select(roundz(col("autocorr_1"), 8).as("ac1"),
            roundz(col("autocorr_5"), 8).as("ac5"))
        sp.crossJoin(ac)
      },
      Some("""
        SELECT round(corr(rq, rp), 8) + 0.0 AS sp_price,
               round(corr(rq, rd), 8) + 0.0 AS sp_disc,
               (SELECT round(corr(x, x1), 8) + 0.0 FROM (
                  SELECT o_totalprice AS x,
                         lead(o_totalprice, 1) OVER (ORDER BY o_orderkey) AS x1
                  FROM orders)) AS ac1,
               (SELECT round(corr(x, x5), 8) + 0.0 FROM (
                  SELECT o_totalprice AS x,
                         lead(o_totalprice, 5) OVER (ORDER BY o_orderkey) AS x5
                  FROM orders)) AS ac5
        FROM (
          SELECT rank() OVER (ORDER BY l_quantity)
                   + (count(*) OVER (PARTITION BY l_quantity) - 1) / 2.0 AS rq,
                 rank() OVER (ORDER BY l_extendedprice)
                   + (count(*) OVER (PARTITION BY l_extendedprice) - 1) / 2.0 AS rp,
                 rank() OVER (ORDER BY l_discount)
                   + (count(*) OVER (PARTITION BY l_discount) - 1) / 2.0 AS rd
          FROM lineitem)""")),

    // corr(method='kendall') — exact tau-b from the joint contingency
    // (ops/Rank.kendall): one distributed groupBy(x,y).count, then a
    // cells² self-join (550 cells here, NOT 60k² rows). The oracle
    // restates the same identity independently in SQL.
    Q("q192_kendall",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        graft.ops.Rank.kendall(li, "l_quantity", "l_discount")
          .select(round(col("tau_b"), 8).as("tau_qty_disc"))
      },
      Some("""
        WITH cells AS (
          SELECT l_quantity AS x, l_discount AS y, count(*) AS n
          FROM lineitem GROUP BY 1, 2),
        pairs AS (
          SELECT sum(CASE WHEN a.y < b.y THEN a.n * b.n ELSE 0 END) AS conc,
                 sum(CASE WHEN a.y > b.y THEN a.n * b.n ELSE 0 END) AS disc
          FROM cells a JOIN cells b ON a.x < b.x),
        m AS (SELECT sum(n) AS ntot FROM cells),
        tx AS (SELECT sum(nx * (nx - 1) / 2.0) AS n1t
               FROM (SELECT sum(n) AS nx FROM cells GROUP BY x)),
        ty AS (SELECT sum(ny * (ny - 1) / 2.0) AS n2t
               FROM (SELECT sum(n) AS ny FROM cells GROUP BY y))
        SELECT round((conc - disc) /
                 sqrt((ntot * (ntot - 1) / 2.0 - n1t)
                    * (ntot * (ntot - 1) / 2.0 - n2t)), 8) AS tau_qty_disc
        FROM pairs, m, tx, ty""")),

    // nunique at 100 TB without the cardinality-sized shuffle: the
    // bottom-k (KMV) sketch (ops/Sketch) caps the per-group exchange at
    // k longs — partial buffers merge like any algebraic aggregate, the
    // sketch output is mergeable across persisted shards, and the
    // estimator (k−1)·2⁶⁰/h₍ₖ₎ carries ~1/√k relative error. The hash
    // is the portable md5 60-bit fold, so DuckDB replays the identical
    // bottom-64 set and the identical closed-form double — hash-exact,
    // not a tolerance check. ndv_exact rides along to show the error.
    Q("q262_ndv_sketch",
      (s, dir) => {
        val ord = t(s, dir, "orders")
        val sk = graft.ops.Sketch.ndvByGroup(ord, Seq("o_orderpriority"), "o_custkey", 64)
        val exact = ord.groupBy(col("o_orderpriority"))
          .agg(countDistinct(col("o_custkey")).as("ndv_exact"))
        Frame(sk.join(exact, Seq("o_orderpriority")))
          .sortValues(Seq(SortKey.asc("o_orderpriority"))).df
      },
      Some("""
        WITH h AS (
          SELECT o_orderpriority AS g,
                 CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)) AS UBIGINT) AS hv
          FROM orders WHERE o_custkey IS NOT NULL),
        d AS (SELECT DISTINCT g, hv FROM h),
        r AS (SELECT g, hv,
                     row_number() OVER (PARTITION BY g ORDER BY hv) AS rn
              FROM d),
        sk AS (
          SELECT g, CAST(count(*) AS BIGINT) AS sketch_size,
                 CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                      ELSE floor((63.0 * 1152921504606846976.0
                                  / max(CASE WHEN rn = 64 THEN hv END)) * 10) / 10
                 END AS ndv_est
          FROM r WHERE rn <= 64 GROUP BY g),
        ex AS (SELECT o_orderpriority AS g,
                      count(DISTINCT o_custkey) AS ndv_exact
               FROM orders GROUP BY 1)
        SELECT sk.g AS o_orderpriority, sk.sketch_size, sk.ndv_est, ex.ndv_exact
        FROM sk JOIN ex USING (g)
        ORDER BY 1""")),

    // value_counts' frequent tail at 100 TB: exact φ-heavy-hitters
    // WITHOUT the cardinality-sized shuffle (ops/Sketch.heavyHitters —
    // per-partition Misra–Gries keeps ⌈1/φ⌉ counters and emits only
    // candidates; completeness is the pigeonhole argument in the doc
    // comment; a broadcast semi-join + partial-agg count then yields
    // EXACT counts, so the answer is deterministic regardless of which
    // extra candidates each partitioning surfaces). The oracle counts
    // exactly — a hash match proves candidate recall, not a tolerance.
    Q("q263_heavy_hitters",
      (s, dir) => f(s, dir, "events")
        .heavyHitters("user_id", 0.008).df,
      Some("""
        WITH n AS (SELECT count(*) AS n FROM events WHERE user_id IS NOT NULL)
        SELECT user_id, count(*) AS cnt
        FROM events, n
        WHERE user_id IS NOT NULL
        GROUP BY user_id, n.n
        HAVING CAST(count(*) AS HUGEINT) * 1000000 >= CAST(n.n AS HUGEINT) * 8000
        ORDER BY cnt DESC, user_id""")),

    // quantile at 100 TB without buffering the column: the quantized-
    // histogram sketch (ops/Sketch.quantileQuantized). Values round to
    // 10-currency-unit buckets (scale=-1), the aggregate state is the
    // span-bounded histogram, and the pandas (n−1)·q linear
    // interpolation runs in EXACT integer arithmetic (q as a rational
    // over 10⁶) until one double division — bit-identical in both
    // engines, hash-exact oracle with a deterministic half-bucket error
    // bound vs the true quantile.
    Q("q264_quantile_sketch",
      (s, dir) => f(s, dir, "orders")
        .quantileApprox("o_totalprice", Seq(0.25, 0.5, 0.75, 0.99), -1)
        .sortValues(Seq(SortKey.asc("q"))).df,
      Some("""
        WITH hist AS (
          SELECT CAST(floor(o_totalprice / 10 + 0.5) AS BIGINT) AS qv,
                 count(*) AS cnt
          FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1),
        cum AS (
          SELECT qv, sum(cnt) OVER (ORDER BY qv) AS cum,
                 sum(cnt) OVER () AS n
          FROM hist),
        qs AS (SELECT * FROM (VALUES (250000), (500000), (750000), (990000)) AS q(num)),
        picks AS (
          SELECT num,
                 min(CASE WHEN cum >= ((n-1)*num - (((n-1)*num) % 1000000)) // 1000000 + 1
                     THEN qv END) AS lo,
                 min(CASE WHEN cum >= ((n-1)*num - (((n-1)*num) % 1000000)) // 1000000 + 1
                               + (CASE WHEN ((n-1)*num) % 1000000 > 0 THEN 1 ELSE 0 END)
                     THEN qv END) AS hi,
                 max(((n-1)*num) % 1000000) AS rem
          FROM cum, qs GROUP BY num)
        SELECT CAST(num AS DOUBLE) / 1000000 AS q,
               CAST(((1000000 - rem) * lo + rem * hi) * 10 AS DOUBLE) / 1000000 AS value
        FROM picks ORDER BY q""")),

    // the per-group face of the same sketch: groupby.quantile where the
    // per-group aggregate state is that group's bounded histogram (the
    // exact `percentile` buffers every value of the group — the state
    // Spark spills at corpus scale). Same exact-integer rank math.
    Q("q265_groupby_quantile_sketch",
      (s, dir) => f(s, dir, "orders")
        .groupby("o_orderpriority")
        .quantileApprox("o_totalprice", Seq(0.5, 0.9), -1)
        .sortValues(Seq(SortKey.asc("o_orderpriority"), SortKey.asc("q"))).df,
      Some("""
        WITH hist AS (
          SELECT o_orderpriority AS g,
                 CAST(floor(o_totalprice / 10 + 0.5) AS BIGINT) AS qv,
                 count(*) AS cnt
          FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1, 2),
        cum AS (
          SELECT g, qv, sum(cnt) OVER (PARTITION BY g ORDER BY qv) AS cum,
                 sum(cnt) OVER (PARTITION BY g) AS n
          FROM hist),
        qs AS (SELECT * FROM (VALUES (500000), (900000)) AS q(num)),
        picks AS (
          SELECT g, num,
                 min(CASE WHEN cum >= ((n-1)*num - (((n-1)*num) % 1000000)) // 1000000 + 1
                     THEN qv END) AS lo,
                 min(CASE WHEN cum >= ((n-1)*num - (((n-1)*num) % 1000000)) // 1000000 + 1
                               + (CASE WHEN ((n-1)*num) % 1000000 > 0 THEN 1 ELSE 0 END)
                     THEN qv END) AS hi,
                 max(((n-1)*num) % 1000000) AS rem
          FROM cum, qs GROUP BY 1, 2)
        SELECT g AS o_orderpriority,
               CAST(num AS DOUBLE) / 1000000 AS q,
               CAST(((1000000 - rem) * lo + rem * hi) * 10 AS DOUBLE) / 1000000 AS value
        FROM picks ORDER BY 1, 2""")),

    // describe() without buffering the column (q22's scale sibling):
    // count/mean/std from EXACT integer moments of the quantized values
    // (decimal sums are associative in any partition order — the q248
    // idiom extended to second moments, so the one double conversion at
    // the end is bit-identical), min/max exact on raw values, quartiles
    // from the span-bounded histogram. Two data passes, every exchange
    // bounded; the whole summary is hash-exact vs DuckDB replaying the
    // identical integer arithmetic in HUGEINT.
    Q("q269_describe_sketch",
      (s, dir) => f(s, dir, "orders")
        .describeApprox("o_totalprice", -1)
        .sortValues(Seq(SortKey.asc("stat"))).df,
      Some("""
        WITH base AS (SELECT o_totalprice AS v FROM orders WHERE o_totalprice IS NOT NULL),
        qz AS (SELECT CAST(floor(v / 10 + 0.5) AS BIGINT) AS qv FROM base),
        m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     sum(CAST(qv AS HUGEINT)) AS s1,
                     sum(CAST(qv AS HUGEINT) * qv) AS s2 FROM qz),
        ext AS (SELECT min(v) AS mn, max(v) AS mx FROM base),
        hist AS (SELECT qv, count(*) AS cnt FROM qz GROUP BY 1),
        cum AS (SELECT qv, sum(cnt) OVER (ORDER BY qv) AS cum,
                       sum(cnt) OVER () AS n FROM hist),
        qs AS (SELECT * FROM (VALUES (1, 4), (1, 2), (3, 4)) AS r(num, den)),
        picks AS (
          SELECT num, den,
                 min(CASE WHEN cum >= ((n-1)*num - (((n-1)*num) % den)) // den + 1
                     THEN qv END) AS lo,
                 min(CASE WHEN cum >= ((n-1)*num - (((n-1)*num) % den)) // den + 1
                               + (CASE WHEN ((n-1)*num) % den > 0 THEN 1 ELSE 0 END)
                     THEN qv END) AS hi,
                 max(((n-1)*num) % den) AS rem
          FROM cum, qs GROUP BY 1, 2),
        quart AS (
          SELECT CAST(num AS DOUBLE) / den AS qq,
                 CAST(((den - rem) * lo + rem * hi) * 10 AS DOUBLE) / den AS value
          FROM picks)
        SELECT stat, value FROM (
          SELECT 'count' AS stat, CAST(n AS DOUBLE) AS value FROM m
          UNION ALL SELECT 'mean', CAST(s1 * 10 AS DOUBLE) / CAST(n AS DOUBLE) FROM m
          UNION ALL SELECT 'std',
            sqrt(CAST(CAST(n AS HUGEINT) * s2 - s1 * s1 AS DOUBLE)
                 / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE)) * 10.0 FROM m
          UNION ALL SELECT 'min', mn FROM ext
          UNION ALL SELECT 'max', mx FROM ext
          UNION ALL SELECT '25%', value FROM quart WHERE qq = 0.25
          UNION ALL SELECT '50%', value FROM quart WHERE qq = 0.5
          UNION ALL SELECT '75%', value FROM quart WHERE qq = 0.75)
        ORDER BY stat""")),

    // WEIGHTED quantile (numpy 2.0 inverted_cdf) — the corpus-budgeting
    // cut: "the price below which half the QUANTITY-mass sits", the same
    // shape as token-weighted quality thresholds in an LLM pipeline.
    // ops/Sketch.weightedQuantileQuantized: exact long weight sums over
    // the span-bounded histogram, selection by pure integer comparison
    // (cum·den ≥ W·num in decimal) — deterministic any partition order.
    Q("q270_weighted_quantile_sketch",
      (s, dir) => f(s, dir, "lineitem")
        .weightedQuantileApprox("l_extendedprice", "l_quantity",
          Seq(0.5, 0.9, 0.99), -1)
        .sortValues(Seq(SortKey.asc("q"))).df,
      Some("""
        WITH hist AS (
          SELECT CAST(floor(l_extendedprice / 10 + 0.5) AS BIGINT) AS qv,
                 sum(CAST(l_quantity AS BIGINT)) AS w
          FROM lineitem
          WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
            AND CAST(l_quantity AS BIGINT) > 0
          GROUP BY 1),
        cum AS (
          SELECT qv, sum(w) OVER (ORDER BY qv) AS cum,
                 sum(w) OVER () AS tw
          FROM hist),
        qs AS (SELECT * FROM (VALUES (500000), (900000), (990000)) AS r(num))
        SELECT CAST(num AS DOUBLE) / 1000000 AS q,
               CAST(min(CASE WHEN CAST(cum AS HUGEINT) * 1000000
                                  >= CAST(tw AS HUGEINT) * num
                        THEN qv END) * 10 AS DOUBLE) AS value
        FROM cum, qs GROUP BY num ORDER BY q""")),

    // the per-group face: quantity-weighted price quantiles per return
    // flag — the per-domain weighted-cut shape (each language's
    // token-weighted quality p90) on TPC-H columns. Same exact-integer
    // selection, cumulative-weight window partitioned by group.
    Q("q272_groupby_weighted_quantile",
      (s, dir) => f(s, dir, "lineitem")
        .groupby("l_returnflag")
        .weightedQuantileApprox("l_extendedprice", "l_quantity",
          Seq(0.5, 0.9), -1)
        .sortValues(Seq(SortKey.asc("l_returnflag"), SortKey.asc("q"))).df,
      Some("""
        WITH hist AS (
          SELECT l_returnflag AS g,
                 CAST(floor(l_extendedprice / 10 + 0.5) AS BIGINT) AS qv,
                 sum(CAST(l_quantity AS BIGINT)) AS w
          FROM lineitem
          WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
            AND CAST(l_quantity AS BIGINT) > 0
          GROUP BY 1, 2),
        cum AS (
          SELECT g, qv, sum(w) OVER (PARTITION BY g ORDER BY qv) AS cum,
                 sum(w) OVER (PARTITION BY g) AS tw
          FROM hist),
        qs AS (SELECT * FROM (VALUES (500000), (900000)) AS r(num))
        SELECT g AS l_returnflag,
               CAST(num AS DOUBLE) / 1000000 AS q,
               CAST(min(CASE WHEN CAST(cum AS HUGEINT) * 1000000
                                  >= CAST(tw AS HUGEINT) * num
                        THEN qv END) * 10 AS DOUBLE) AS value
        FROM cum, qs GROUP BY g, num ORDER BY 1, 2""")),

    // the incremental-catalog contract as an ORACLE row, not just a
    // spec: per-shard KMV sketches (orders split by orderkey parity)
    // are PERSISTED to parquet, read back in a separate job, and merged
    // by re-aggregating the stored hash arrays — bottom-k(bottom-k(A) ∪
    // bottom-k(B)) = bottom-k(A ∪ B), so the merged estimate must equal
    // the one-shot sketch bit-for-bit, and the oracle is LITERALLY
    // q262's one-shot construction. This is how a 100 TB catalog keeps
    // per-day NDV: store k longs per (shard, group), merge on read.
    Q("q274_sketch_merge_persisted",
      (s, dir) => {
        import graft.ops.Sketch
        val ord = t(s, dir, "orders")
        val path = QueryKit.scratch("/tmp/graft_io", dir, "kmv_shards_q274")
        ord.filter(col("o_custkey").isNotNull)
          .select(col("o_orderpriority"), (col("o_orderkey") % 2).as("__shard"),
            Sketch.hash60(col("o_custkey")).as("__h60"))
          .groupBy(col("o_orderpriority"), col("__shard"))
          .agg(Sketch.bottomKAgg(col("__h60"), 64).as("sk"))
          .write.mode("overwrite").parquet(path)
        val merged = s.read.parquet(path)
          .select(col("o_orderpriority"), explode(col("sk")).as("__h60"))
          .groupBy(col("o_orderpriority"))
          .agg(Sketch.bottomKAgg(col("__h60"), 64).as("__sk"))
          .select(col("o_orderpriority"),
            size(col("__sk")).cast("long").as("sketch_size"),
            Sketch.estimate(col("__sk"), 64).as("ndv_est"))
        merged.orderBy(col("o_orderpriority"))
      },
      Some("""
        WITH h AS (
          SELECT o_orderpriority AS g,
                 CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)) AS UBIGINT) AS hv
          FROM orders WHERE o_custkey IS NOT NULL),
        d AS (SELECT DISTINCT g, hv FROM h),
        r AS (SELECT g, hv,
                     row_number() OVER (PARTITION BY g ORDER BY hv) AS rn
              FROM d)
        SELECT g AS o_orderpriority, CAST(count(*) AS BIGINT) AS sketch_size,
               CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                    ELSE floor((63.0 * 1152921504606846976.0
                                / max(CASE WHEN rn = 64 THEN hv END)) * 10) / 10
               END AS ndv_est
        FROM r WHERE rn <= 64 GROUP BY g
        ORDER BY g""")),

    // the per-group face of q269 (groupby.describe at scale, the approx
    // sibling of q207): per-group exact integer moments + histogram
    // quartiles, one (group, stat, value) row each — the q248 idiom
    // keeps every group's mean/std bit-identical in any partition order.
    Q("q275_groupby_describe_sketch",
      (s, dir) => f(s, dir, "orders")
        .groupby("o_orderpriority")
        .describeApprox("o_totalprice", -1)
        .sortValues(Seq(SortKey.asc("o_orderpriority"), SortKey.asc("stat"))).df,
      Some("""
        WITH base AS (
          SELECT o_orderpriority AS g, o_totalprice AS v
          FROM orders WHERE o_totalprice IS NOT NULL),
        qz AS (SELECT g, CAST(floor(v / 10 + 0.5) AS BIGINT) AS qv FROM base),
        m AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
                     sum(CAST(qv AS HUGEINT)) AS s1,
                     sum(CAST(qv AS HUGEINT) * qv) AS s2 FROM qz GROUP BY 1),
        ext AS (SELECT g, min(v) AS mn, max(v) AS mx FROM base GROUP BY 1),
        hist AS (SELECT g, qv, count(*) AS cnt FROM qz GROUP BY 1, 2),
        cum AS (SELECT g, qv, sum(cnt) OVER (PARTITION BY g ORDER BY qv) AS cum,
                       sum(cnt) OVER (PARTITION BY g) AS n FROM hist),
        qs AS (SELECT * FROM (VALUES (1, 4), (1, 2), (3, 4)) AS r(num, den)),
        picks AS (
          SELECT g, num, den,
                 min(CASE WHEN cum >= ((n-1)*num - (((n-1)*num) % den)) // den + 1
                     THEN qv END) AS lo,
                 min(CASE WHEN cum >= ((n-1)*num - (((n-1)*num) % den)) // den + 1
                               + (CASE WHEN ((n-1)*num) % den > 0 THEN 1 ELSE 0 END)
                     THEN qv END) AS hi,
                 max(((n-1)*num) % den) AS rem
          FROM cum, qs GROUP BY 1, 2, 3),
        quart AS (
          SELECT g, CAST(num AS DOUBLE) / den AS qq,
                 CAST(((den - rem) * lo + rem * hi) * 10 AS DOUBLE) / den AS value
          FROM picks)
        SELECT g AS o_orderpriority, stat, value FROM (
          SELECT g, 'count' AS stat, CAST(n AS DOUBLE) AS value FROM m
          UNION ALL SELECT g, 'mean', CAST(s1 * 10 AS DOUBLE) / CAST(n AS DOUBLE) FROM m
          UNION ALL SELECT g, 'std',
            sqrt(CAST(CAST(n AS HUGEINT) * s2 - s1 * s1 AS DOUBLE)
                 / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE)) * 10.0 FROM m
          UNION ALL SELECT g, 'min', mn FROM ext
          UNION ALL SELECT g, 'max', mx FROM ext
          UNION ALL SELECT g, '25%', value FROM quart WHERE qq = 0.25
          UNION ALL SELECT g, '50%', value FROM quart WHERE qq = 0.5
          UNION ALL SELECT g, '75%', value FROM quart WHERE qq = 0.75)
        ORDER BY 1, 2""")))
}

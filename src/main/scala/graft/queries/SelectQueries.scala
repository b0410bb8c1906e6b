package graft.queries

import org.apache.spark.sql.functions._
import graft.api.{Frame, SortKey}
import QueryKit._

/**
 * §2.2 projection / selection / filtering + §2.11 missing data
 * (reference: getitem_column_array QC:3105, getitem_array QC:3072,
 * rowwise_query QC:3585, dropna QC:3249, fillna QC:2710, replace QC:2107,
 * astype QC:2335, isin QC:2009, clip QC:2438, where/mask QC:626/base:2069,
 * case_when QC:2155).
 *
 * Map-shaped ops are verified through compact aggregate checksums where a
 * full-row dump would add nothing: the derived columns still run over
 * every row, the output stays one row per group.
 */
object SelectQueries {

  val all: Seq[Q] = Seq(

    // scan → filter → project (BASELINE shape 1): predicate + column
    // pruning must reach the parquet scan (PushedFilters in .explain).
    Q("q60_scan_filter_project",
      (s, dir) => f(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1997-04-01") &&
          col("l_discount") > 0.05)
        // No row-level rounding: both engines compute the identical IEEE
        // product, while round() at a .xx5 boundary diverges between
        // Spark's HALF_UP-on-BigDecimal and DuckDB's scaled-double path.
        .selectExprs(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        // revenue tiebreak: (l_orderkey, l_linenumber) duplicates exist in
        // the fixture and the harness compares in row order
        .sortValues(Seq(SortKey.asc("l_orderkey"), SortKey.asc("l_linenumber"),
          SortKey.asc("revenue"))).df,
      Some("""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01' AND l_discount > 0.05
        ORDER BY l_orderkey, l_linenumber, revenue"""),
      headline = true),

    // string-expression filter (reference rowwise_query/eval QC:3585).
    Q("q61_query_expr",
      (s, dir) => f(s, dir, "orders")
        .query("o_totalprice > 200000 and o_orderstatus = 'F'")
        .select("o_orderkey", "o_totalprice")
        .sortValues(Seq(SortKey.asc("o_orderkey"))).df,
      Some("""
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > 200000 AND o_orderstatus = 'F'
        ORDER BY o_orderkey""")),

    // query/eval in the PANDAS expression dialect (reference rowwise_query
    // QC:3585 parses pandas syntax) — `and`/`not`/`==`/`in [..]`/`//`/`**`
    // translated to Spark SQL by api.PandasExpr, so `df.query("...")`
    // strings port verbatim.
    Q("q145_query_pandas_dialect",
      (s, dir) => f(s, dir, "orders")
        .queryPandas("""o_orderstatus in ['O', 'F'] and not (o_totalprice <= 50000.0) and o_orderpriority != "1-URGENT"""")
        .evalPandas("price_k", "o_totalprice // 1000")
        .evalPandas("cust_sq", "o_custkey ** 2 + 1.5")
        .evalPandas("keep", "o_orderstatus == 'O' or False")
        .select("o_orderkey", "price_k", "cust_sq", "keep")
        .sortValues(Seq(SortKey.asc("o_orderkey"))).df,
      Some("""
        SELECT o_orderkey,
               CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_k,
               pow(o_custkey, 2) + 1.5 AS cust_sq,
               o_orderstatus = 'O' OR FALSE AS keep
        FROM orders
        WHERE o_orderstatus IN ('O', 'F') AND NOT (o_totalprice <= 50000.0)
          AND o_orderpriority <> '1-URGENT'
        ORDER BY o_orderkey""")),

    // Deterministic content-hash sampling (pandas sample(frac,seed)
    // re-expressed as the reproducible pipeline split — Frame.sampleByHash):
    // the train flag is md5(salt+key) under an 8-hex threshold, so the
    // SAME row lands in the same split on any engine/cluster/run, and
    // sample + complement partition the table exactly.
    // sample(n=...): exactly n rows by content-hash order — a TakeOrdered
    // plan (per-partition top-n + driver merge of n·partitions candidates,
    // no global sort). The same md5 order reproduces in any engine.
    Q("q172_sample_n",
      (s, dir) => f(s, dir, "documents")
        .sampleN("doc_id", 50, salt = "sn1")
        .select("doc_id", "lang")
        .sortValues(Seq(SortKey.asc("doc_id"))).df,
      Some("""
        SELECT doc_id, lang FROM (
          SELECT doc_id, lang FROM documents
          ORDER BY md5('sn1' || CAST(doc_id AS VARCHAR)), doc_id LIMIT 50)
        ORDER BY doc_id""")),

    Q("q155_deterministic_sample",
      (s, dir) => {
        // single-pass conditional aggregation over the split flag — an
        // inner join of the two splits' aggregates would silently drop
        // any status group that lands entirely in one split, where the
        // oracle's FILTER form keeps it (Frame.sampleByHash itself is
        // spec-covered in FrameSpec)
        val isTrain = graft.api.Frame.hashBucket(col("o_orderkey"), "split1") <
          graft.api.Frame.hexThreshold(0.25)
        Frame(t(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(
            count(when(isTrain, 1)).as("n_train"),
            // LONG-cents kernel (QueryKit.moneySum discipline, r15):
            // floor(double) is already LongType — sum in codegen'd long
            // adds, one division at the end; exact, permutation-invariant,
            // ANSI-loud past 2^63. Oracle unchanged by exactness.
            round(sum(when(isTrain, floor(col("o_totalprice") * 100 + 0.5)))
              .cast("double") / 100.0, 2).as("total_train"),
            count(when(!isTrain, 1)).as("n_rest")))
          .sortValues(Seq(SortKey.asc("o_orderstatus"))).df
      },
      Some("""
        SELECT o_orderstatus,
               count(*) FILTER (WHERE h < '40000000') AS n_train,
               round(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS DECIMAL(18,0)))
                          FILTER (WHERE h < '40000000') AS DOUBLE) / 100.0, 2) AS total_train,
               count(*) FILTER (WHERE h >= '40000000') AS n_rest
        FROM (SELECT o_orderstatus, o_totalprice,
                     md5('split1' || CAST(o_orderkey AS VARCHAR)) AS h
              FROM orders)
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // isin / clip / where / mask / case_when over every row, checked via
    // per-group aggregates.
    Q("q62_isin_clip_where",
      (s, dir) => {
        val base = f(s, dir, "lineitem")
          .isin("l_returnflag", Seq("A", "R"))
          .clip("l_quantity", 10.0, 40.0)
          .whereCol("l_discount", col("l_discount") >= 0.02, lit(0.0))
          .maskCol("l_tax", col("l_tax") > 0.07, lit(0.07))
          .withColumn("tier",
            when(col("l_extendedprice") > 50000, "high")
              .when(col("l_extendedprice") > 20000, "mid")
              .otherwise("low"))
        base.groupby("tier").agg(
          "n" -> count(lit(1)),
          "n_ar" -> sum(col("l_returnflag_isin").cast("long")),
          "sum_qty_clipped" -> round(sum(col("l_quantity")), 2),
          "sum_disc_kept" -> round(sum(col("l_discount")), 4),
          "sum_tax_capped" -> round(sum(col("l_tax")), 4))
          .sortValues(Seq(SortKey.asc("tier"))).df
      },
      Some("""
        SELECT CASE WHEN l_extendedprice > 50000 THEN 'high'
                    WHEN l_extendedprice > 20000 THEN 'mid' ELSE 'low' END AS tier,
               count(*) AS n,
               CAST(sum(CASE WHEN l_returnflag IN ('A','R') THEN 1 ELSE 0 END) AS BIGINT) AS n_ar,
               round(sum(greatest(least(l_quantity, 40.0), 10.0)), 2) AS sum_qty_clipped,
               round(sum(CASE WHEN l_discount >= 0.02 THEN l_discount ELSE 0.0 END), 4) AS sum_disc_kept,
               round(sum(CASE WHEN l_tax > 0.07 THEN 0.07 ELSE l_tax END), 4) AS sum_tax_capped
        FROM lineitem GROUP BY 1 ORDER BY 1""")),

    // astype / rename / add_prefix (reference QC:2335, rename family).
    // Double→int casts truncate toward zero in both engines when spelled
    // with trunc (bare CAST rounds in DuckDB — a real semantic difference).
    Q("q63_astype_rename",
      (s, dir) => f(s, dir, "lineitem")
        .astype("l_quantity" -> "bigint")
        .rename("l_quantity" -> "qty_int")
        .groupby("qty_int").size("n")
        .sortValues(Seq(SortKey.asc("qty_int"))).df,
      Some("""
        SELECT CAST(trunc(l_quantity) AS BIGINT) AS qty_int, count(*) AS n
        FROM lineitem GROUP BY 1 ORDER BY 1""")),

    // dropna / fillna over injected nulls (reference QC:3249, 2710).
    Q("q64_dropna_fillna",
      (s, dir) => {
        val withNulls = f(s, dir, "events")
          .withColumn("v", when(col("value") < 0.2, lit(null).cast("double"))
            .otherwise(col("value")))
        val dropped = withNulls.dropna(subset = Seq("v")).df
          .agg(count(lit(1)).as("n_after_dropna"))
        val filled = withNulls.fillna(-1.0, Seq("v")).df
          .agg(round(sum(col("v")), 4).as("sum_filled"))
        dropped.crossJoin(filled)
      },
      Some("""
        SELECT (SELECT count(*) FROM events WHERE value >= 0.2) AS n_after_dropna,
               (SELECT round(sum(CASE WHEN value < 0.2 THEN -1.0 ELSE value END), 4)
                FROM events) AS sum_filled""")),

    // replace dict-mode + abs/round/sign/floor/ceil map family
    // (reference replace QC:2107; numpy map surface QC:2036-2113).
    Q("q65_replace_math",
      (s, dir) => {
        val base = f(s, dir, "orders")
          .replaceValues("o_orderstatus",
            Map("O" -> "OPEN", "F" -> "FINISHED", "P" -> "PENDING"))
          .withColumn("bal_shift", col("o_totalprice") - lit(150000.0))
        base.groupby("o_orderstatus").agg(
          "n" -> count(lit(1)),
          "sum_abs" -> round(sum(abs(col("bal_shift"))), 2),
          "sum_sign" -> sum(signum(col("bal_shift")).cast("long")),
          "sum_floor" -> sum(floor(col("o_totalprice"))),
          "sum_ceil" -> sum(ceil(col("o_totalprice"))),
          "sum_round0" -> sum(round(col("o_totalprice"), 0)))
          .sortValues(Seq(SortKey.asc("o_orderstatus"))).df
      },
      Some("""
        SELECT CASE o_orderstatus WHEN 'O' THEN 'OPEN' WHEN 'F' THEN 'FINISHED'
                    WHEN 'P' THEN 'PENDING' ELSE o_orderstatus END AS o_orderstatus,
               count(*) AS n,
               round(sum(abs(o_totalprice - 150000.0)), 2) AS sum_abs,
               CAST(sum(CAST(sign(o_totalprice - 150000.0) AS BIGINT)) AS BIGINT) AS sum_sign,
               CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS sum_floor,
               CAST(sum(CAST(ceil(o_totalprice) AS BIGINT)) AS BIGINT) AS sum_ceil,
               sum(round(o_totalprice, 0)) AS sum_round0
        FROM orders GROUP BY 1 ORDER BY 1""")),

    // ffill within groups (reference fillna method='ffill' QC:2710-2812 —
    // one shuffle on the key, running last-ignoreNulls window).
    Q("q66_ffill",
      (s, dir) => f(s, dir, "events")
        .withColumn("v", when(col("value") < 0.3, lit(null).cast("double"))
          .otherwise(col("value")))
        .ffill("v", Seq("user_id"), Seq(SortKey.asc("ts"), SortKey.asc("event_id")))
        .groupby("user_id").agg(
          "n_null" -> sum(col("v").isNull.cast("long")),
          "sum_v" -> round(sum(col("v")), 4))
        .sortValues(Seq(SortKey.asc("user_id"))).df,
      Some("""
        SELECT user_id,
               CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
               round(sum(v), 4) AS sum_v
        FROM (
          SELECT user_id,
                 last_value(CASE WHEN value < 0.3 THEN NULL ELSE value END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
          FROM events)
        GROUP BY user_id ORDER BY user_id""")),

    // unary math + logical surface (sqrt/exp/ln/log10/pow, and/or/not,
    // isna/notna — reference QC:2036-2113 Map registrations) as one
    // whole-table checksum row.
    Q("q67_math_logical",
      (s, dir) => t(s, dir, "lineitem").agg(
        round(sum(sqrt(col("l_quantity"))), 4).as("sum_sqrt"),
        round(sum(exp(col("l_discount"))), 4).as("sum_exp"),
        round(sum(log(col("l_extendedprice"))), 4).as("sum_ln"),
        round(sum(log10(col("l_extendedprice"))), 4).as("sum_log10"),
        round(sum(pow(col("l_tax"), 2)), 6).as("sum_pow2"),
        sum((col("l_discount") > 0.05 && col("l_tax") < 0.04).cast("long")).as("n_and"),
        sum((col("l_returnflag") === "A" || col("l_linestatus") === "O").cast("long")).as("n_or"),
        sum((!(col("l_discount") > 0.05)).cast("long")).as("n_not"),
        sum(col("l_quantity").isNull.cast("long")).as("n_isna"),
        sum(col("l_quantity").isNotNull.cast("long")).as("n_notna")),
      Some("""
        SELECT round(sum(sqrt(l_quantity)), 4) AS sum_sqrt,
               round(sum(exp(l_discount)), 4) AS sum_exp,
               round(sum(ln(l_extendedprice)), 4) AS sum_ln,
               round(sum(log10(l_extendedprice)), 4) AS sum_log10,
               round(sum(pow(l_tax, 2)), 6) AS sum_pow2,
               CAST(sum(CASE WHEN l_discount > 0.05 AND l_tax < 0.04 THEN 1 ELSE 0 END) AS BIGINT) AS n_and,
               CAST(sum(CASE WHEN l_returnflag = 'A' OR l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_or,
               CAST(sum(CASE WHEN NOT (l_discount > 0.05) THEN 1 ELSE 0 END) AS BIGINT) AS n_not,
               CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_isna,
               CAST(sum(CASE WHEN l_quantity IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_notna
        FROM lineitem""")),

    // pandas sample(n=, weights=) as the deterministic Efraimidis–
    // Spirakis reservoir (Frame.sampleWeighted): score = rounded
    // ln(hash-uniform)·10^6 / weight, top n by score — a TakeOrdered
    // plan, no global sort, no RNG. The oracle replays the identical
    // md5 → 52-bit uniform → scaled-ln arithmetic, so the SAME 100
    // orders are selected on both engines.
    Q("q242_weighted_sample",
      (s, dir) => f(s, dir, "orders")
        .sampleWeighted("o_orderkey", "o_totalprice", 100, salt = "ws1")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .sortValues(Seq(SortKey.asc("o_orderkey"))).df,
      Some("""
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM (
          SELECT o_orderkey, o_orderstatus, o_totalprice,
                 round(ln((CAST('0x' || substr(md5('ws1' || CAST(o_orderkey AS VARCHAR)), 1, 13) AS BIGINT) + 0.5)
                       / 4503599627370496.0) * 1000000.0 / o_totalprice, 6) AS es
          FROM orders WHERE o_totalprice > 0
          ORDER BY es DESC, o_orderkey LIMIT 100)
        ORDER BY o_orderkey""")),

    // The index-surgery surface as one oracle row (upgrades the §2.2
    // rows that were spec-only): MultiIndex set_index → reorder_levels
    // (pure metadata permutation) → xs cross-section (pushdown-able
    // level filter + level drop) → truncate (closed label-range filter,
    // reaches the scan) → select_dtypes(number) (schema projection;
    // index survives) → rename_axis. Every step is metadata or a
    // scan-level predicate/projection — zero exchanges before the
    // output sort.
    Q("q277_index_surgery",
      (s, dir) => f(s, dir, "orders")
        .setIndex("o_orderpriority", "o_orderkey")
        .reorderLevels(Seq(1, 0))
        .xs("1-URGENT", level = 1)
        .truncate(100L, 30000L)
        .selectDtypes(include = Seq("number"))
        .renameAxis("okey")
        .sortValues(Seq(SortKey.asc("okey"))).df,
      Some("""
        SELECT o_orderkey AS okey, o_custkey, o_totalprice
        FROM orders
        WHERE o_orderpriority = '1-URGENT' AND o_orderkey BETWEEN 100 AND 30000
        ORDER BY okey""")),

    // IEEE-division opt-in for the pandas STRING dialect (closes the
    // deviation-16 seam: reference query/eval hand the text to pandas'
    // parser whose `/` is numpy division — QC rowwise_query:3585). divr
    // cycles −2..2 so ~1/5 of rows divide by ZERO, and divd is zeroed on
    // the 7-cycle so 0/0 (NaN) and ±x/0 (±Inf) both occur; `//` runs the
    // floorDouble-wrapped variant over the same degenerate values. The
    // oracle spells the identical CASE (DuckDB's native double division
    // returns NULL on zero divisors, so IEEE must be explicit there too);
    // fdiv floors through BIGINT exactly like Spark's FLOOR, which kills
    // the −0.0 that DuckDB's double floor would preserve. The final
    // queryPandas filter runs a zero-divisor division through the FILTER
    // path as well (always-true predicate — NaN != x and ±Inf != x hold
    // in both engines' total orderings).
    Q("q278_pandas_ieee_div",
      (s, dir) => f(s, dir, "orders")
        .withColumn("divr", (col("o_orderkey") % 5 - 2).cast("double"))
        .withColumn("divd",
          when(col("o_orderkey") % 7 === 0, lit(0.0))
            .otherwise(col("o_totalprice")))
        .evalPandas("ratio", "divd / divr", ieeeDivision = true)
        .evalPandas("fdiv", "divd // divr", ieeeDivision = true)
        .queryPandas("divd / divr != 123456789.0", ieeeDivision = true)
        .select("o_orderkey", "divr", "divd", "ratio", "fdiv")
        .sortValues(Seq(SortKey.asc("o_orderkey"))).df,
      Some("""
        WITH base AS (
          SELECT o_orderkey,
                 CAST(o_orderkey % 5 - 2 AS DOUBLE) AS divr,
                 CASE WHEN o_orderkey % 7 = 0 THEN 0.0::DOUBLE
                      ELSE o_totalprice END AS divd
          FROM orders
        ), d AS (
          SELECT o_orderkey, divr, divd,
                 -- full mirror of the engine's ieeeDiv branch order,
                 -- including the −0.0-divisor sign probe (divr's zero is
                 -- always +0.0 in THIS data — the branch is dead here —
                 -- but mirroring it keeps the twin synchronized if the
                 -- divisor expression ever changes)
                 CASE WHEN divd IS NULL OR divr IS NULL THEN NULL
                      WHEN divr != 0.0 THEN divd / divr
                      WHEN starts_with(CAST(divr AS VARCHAR), '-')
                        THEN (-divd) * 'Infinity'::DOUBLE
                      ELSE divd * 'Infinity'::DOUBLE END AS ratio
          FROM base
        )
        SELECT o_orderkey, divr, divd, ratio,
               CASE WHEN isnan(ratio) OR abs(ratio) >= 9007199254740992.0 THEN ratio
                    ELSE CAST(CAST(floor(ratio) AS BIGINT) AS DOUBLE) END AS fdiv
        FROM d
        WHERE ratio != 123456789.0
        ORDER BY o_orderkey""")))
}

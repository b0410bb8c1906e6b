package graft.queries

import org.apache.spark.sql.functions._
import graft.api.{Frame, SortKey}
import graft.ops.RowOrder
import QueryKit._

/**
 * Remaining §2 singles: argsort (base QC:2308), time-based first/last +
 * between_time (base:5828,5847,5331), align + dot (base QC:1067,
 * QC:2546), list/struct accessors (base QC:7354-7420).
 */
object ExtrasQueries {

  val all: Seq[Q] = Seq(

    // argsort: position each row would occupy under the value order —
    // the two-pass block-offset row numbering (no unpartitioned window).
    Q("q47_argsort",
      (s, dir) => {
        val ordered = RowOrder.withRowOrder(
          t(s, dir, "customer").select(col("c_custkey"), col("c_acctbal")),
          Seq(SortKey.asc("c_acctbal"), SortKey.asc("c_custkey")))
        Frame(ordered.select(col("c_custkey"), col("__row_order__").as("argsort_pos")))
          .sortValues(Seq(SortKey.asc("c_custkey"))).df
      },
      Some("""
        SELECT c_custkey,
               row_number() OVER (ORDER BY c_acctbal, c_custkey) - 1 AS argsort_pos
        FROM customer ORDER BY c_custkey""")),

    // first('3 days') / last('3 days') / between_time('08:00','09:00') —
    // timestamp-filter plans; the min/max anchors are scalar aggregates.
    Q("q48_first_last_time",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val bounds = ev.agg(min(col("ts")).as("lo"), max(col("ts")).as("hi")).head()
        val lo = bounds.getAs[java.time.LocalDateTime]("lo")
        val hi = bounds.getAs[java.time.LocalDateTime]("hi")
        Frame(ev.agg(
          count(when(col("ts") < lit(lo.plusDays(3)), 1)).as("n_first3d"),
          count(when(col("ts") > lit(hi.minusDays(3)), 1)).as("n_last3d"),
          count(when(hour(col("ts")) === 8, 1)).as("n_between_8_9")))
          .df
      },
      Some("""
        SELECT count(*) FILTER (WHERE ts < (SELECT min(ts) FROM events) + INTERVAL 3 DAY)
                 AS n_first3d,
               count(*) FILTER (WHERE ts > (SELECT max(ts) FROM events) - INTERVAL 3 DAY)
                 AS n_last3d,
               count(*) FILTER (WHERE hour(ts) = 8) AS n_between_8_9
        FROM events""")),

    // align (outer join on the index) + dot (multiply-aggregate by key —
    // the small side would broadcast; here both sides are key-aligned
    // aggregates so the join is a co-partitioned equi-join).
    Q("q49_align_dot",
      (s, dir) => {
        val a = t(s, dir, "orders").groupBy(col("o_custkey").as("k"))
          .agg(count(lit(1)).cast("double").as("n_orders"))
        val b = t(s, dir, "customer").select(col("c_custkey").as("k"), col("c_acctbal"))
        val aligned = a.join(b, Seq("k"), "full_outer")
        Frame(aligned.agg(
          count(lit(1)).as("n_aligned"),
          count(when(col("n_orders").isNull || col("c_acctbal").isNull, 1)).as("n_unmatched"),
          // LONG-cents kernel (QueryKit.moneySum discipline, r15): exact
          // per-row integer ≤ 2^26 cents x small count, summed in
          // codegen'd long adds; ANSI errors loudly past 2^63 (capacity
          // ~6e17 at a 100 TB customer count). Values identical to the
          // previous DECIMAL(18,0) fold by exactness — oracle unchanged.
          round(sum(col("n_orders").cast("long") *
            floor(col("c_acctbal") * 100 + 0.5))
            .cast("double") / 100.0, 2).as("dot")))
          .df
      },
      Some("""
        WITH a AS (SELECT o_custkey AS k, CAST(count(*) AS DOUBLE) AS n_orders
                   FROM orders GROUP BY 1),
             b AS (SELECT c_custkey AS k, c_acctbal FROM customer)
        SELECT count(*) AS n_aligned,
               count(*) FILTER (WHERE n_orders IS NULL OR c_acctbal IS NULL) AS n_unmatched,
               round(CAST(sum(CAST(n_orders AS DECIMAL(18,0))
                               * CAST(floor(c_acctbal * 100 + 0.5) AS DECIMAL(18,0)))
                          AS DOUBLE) / 100.0, 2) AS dot
        FROM a FULL OUTER JOIN b USING (k)""")),

    // Categorical dtype (SURVEY §1.3: StringType + dictionary via a
    // lookup join): cat_codes = dense id in sorted category order,
    // built from the DISTINCT category set (group-count sized) and
    // broadcast back — same physics as groupby ngroup.
    Q("q86_cat_codes",
      (s, dir) => {
        val coded = f(s, dir, "orders")
          .groupby("o_orderpriority").ngroup("cat_code")
        Frame(coded.df
          .groupBy(col("o_orderpriority"), col("cat_code"))
          .agg(count(lit(1)).as("n")))
          .sortValues(Seq(SortKey.asc("cat_code"))).df
      },
      Some("""
        SELECT o_orderpriority, cat_code, count(*) AS n FROM orders
        JOIN (SELECT o_orderpriority,
                     CAST(row_number() OVER (ORDER BY o_orderpriority) - 1 AS BIGINT)
                       AS cat_code
              FROM (SELECT DISTINCT o_orderpriority FROM orders)) USING (o_orderpriority)
        GROUP BY o_orderpriority, cat_code ORDER BY cat_code""")),

    // memory_usage: per-column Tungsten UnsafeRow footprint (fixed width ×
    // rows; var-width = byte sum + an 8-byte word per row) — one
    // distributed aggregate, independently recomputable in SQL, so the
    // engine-specific definition is oracle-pinned rather than hand-waved.
    Q("q161_memory_usage",
      (s, dir) => {
        val mu = f(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
          .memoryUsage()
        Frame(mu).sortValues(Seq(SortKey.asc("column"))).df
      },
      Some("""
        SELECT * FROM (
          SELECT 'l_orderkey' AS "column", CAST(8*count(*) AS BIGINT) AS bytes FROM lineitem
          UNION ALL SELECT 'l_linenumber', CAST(4*count(*) AS BIGINT) FROM lineitem
          UNION ALL SELECT 'l_quantity', CAST(8*count(*) AS BIGINT) FROM lineitem
          UNION ALL SELECT 'l_returnflag',
            CAST(sum(strlen(l_returnflag)) + 8*count(*) AS BIGINT) FROM lineitem)
        ORDER BY "column"""")),

    // list/struct accessors: list_len / list_getitem / slice /
    // contains + struct_field / struct_explode over derived nested cols.
    Q("q77_list_struct",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .withColumn("words", split(trim(col("text")), "\\s+"))
          .withColumn("meta", struct(col("lang").as("lang"), octet_length(col("text")).as("len")))
        Frame(d.select(
          col("doc_id"),
          size(col("words")).cast("long").as("list_len"),
          element_at(col("words"), 1).as("first_word"),
          element_at(col("words"), -1).as("last_word"),
          concat_ws(" ", slice(col("words"), 1, 3)).as("first3"),
          array_contains(col("words"), "data").as("has_data"),
          col("meta").getField("lang").as("meta_lang"),
          col("meta.len").cast("long").as("meta_len")))
          .sortValues(Seq(SortKey.asc("doc_id"))).df
      },
      Some("""
        SELECT doc_id,
               len(w) AS list_len,
               w[1] AS first_word,
               w[-1] AS last_word,
               array_to_string(w[1:3], ' ') AS first3,
               list_contains(w, 'data') AS has_data,
               lang AS meta_lang,
               strlen(text) AS meta_len
        FROM (SELECT doc_id, lang, text,
                     regexp_extract_all(trim(text), '\S+') AS w
              FROM documents)
        ORDER BY doc_id""")),

    // axis=1 (row-wise) family: sum/mean skipna, diff, cumsum with null
    // skip, rank(method='average') with ties — each ONE codegen'd
    // projection over an array of the row's values (Frame.sumAxis1 et
    // al.), zero shuffles. The c column is nulled on line 1 to pin the
    // skipna contracts; b/c share the 0..59 range so rank ties occur.
    Q("q187_axis1_ops",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("double").as("a"),
          pmod(col("l_partkey"), lit(60)).cast("double").as("b"),
          when(col("l_linenumber") === 1, lit(null))
            .otherwise(pmod(col("l_suppkey"), lit(60))).cast("double").as("c"))
        val fr = Frame(li)
          .sumAxis1(Seq("a", "b", "c"), "rsum")
          .meanAxis1(Seq("a", "b", "c"), "rmean")
          .diffAxis1(Seq("a", "b", "c"))
          .rankAxis1(Seq("a", "b", "c"))
          .cumsumAxis1(Seq("a", "b", "c"))
        Frame(fr.df.select(col("l_orderkey"), col("l_linenumber"),
          col("rsum"), round(col("rmean"), 6).as("rmean"),
          col("b_d"), col("c_d"),
          col("a_rk"), col("b_rk"), col("c_rk"),
          col("b_cs"), col("c_cs")))
          // duplicate (l_orderkey, l_linenumber) rows exist: rsum/b_d/c_d
          // pin the tie so both engines emit identical row order
          .sortValues(Seq(SortKey.asc("l_orderkey"), SortKey.asc("l_linenumber"),
            SortKey.asc("rsum"), SortKey.asc("b_d"), SortKey.asc("c_d"))).df
      },
      Some("""
        SELECT l_orderkey, l_linenumber,
               a + b + coalesce(c, 0) AS rsum,
               round((a + b + coalesce(c, 0))
                     / (2 + CASE WHEN c IS NULL THEN 0 ELSE 1 END), 6) AS rmean,
               b - a AS b_d,
               c - b AS c_d,
               CAST((CASE WHEN b < a THEN 1 ELSE 0 END)
                  + (CASE WHEN c IS NOT NULL AND c < a THEN 1 ELSE 0 END) AS DOUBLE)
                 + (1 + (CASE WHEN b = a THEN 1 ELSE 0 END)
                      + (CASE WHEN c IS NOT NULL AND c = a THEN 1 ELSE 0 END) + 1) / 2.0
                 AS a_rk,
               CAST((CASE WHEN a < b THEN 1 ELSE 0 END)
                  + (CASE WHEN c IS NOT NULL AND c < b THEN 1 ELSE 0 END) AS DOUBLE)
                 + (1 + (CASE WHEN a = b THEN 1 ELSE 0 END)
                      + (CASE WHEN c IS NOT NULL AND c = b THEN 1 ELSE 0 END) + 1) / 2.0
                 AS b_rk,
               CASE WHEN c IS NOT NULL THEN
                 CAST((CASE WHEN a < c THEN 1 ELSE 0 END)
                    + (CASE WHEN b < c THEN 1 ELSE 0 END) AS DOUBLE)
                   + (1 + (CASE WHEN a = c THEN 1 ELSE 0 END)
                        + (CASE WHEN b = c THEN 1 ELSE 0 END) + 1) / 2.0
               END AS c_rk,
               a + b AS b_cs,
               CASE WHEN c IS NOT NULL THEN a + b + c END AS c_cs
        FROM (
          SELECT l_orderkey, l_linenumber,
                 CAST(l_quantity AS DOUBLE) AS a,
                 CAST(l_partkey % 60 AS DOUBLE) AS b,
                 CASE WHEN l_linenumber = 1 THEN NULL
                      ELSE CAST(l_suppkey % 60 AS DOUBLE) END AS c
          FROM lineitem)
        ORDER BY l_orderkey, l_linenumber, rsum, b_d, c_d""")),

    // axis=1 reductions (count/nunique/any/all with the pandas skipna and
    // empty-reduction contracts) + str.get_dummies with explicit
    // categories (no distinct-scan job). b/c hit zero on the %60
    // residues so any/all actually vary; dummies run over a composed
    // 'source|lang' tag string.
    Q("q191_axis1_extras_dummies",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("double").as("a"),
          pmod(col("l_partkey"), lit(60)).cast("double").as("b"),
          when(col("l_linenumber") === 1, lit(null))
            .otherwise(pmod(col("l_suppkey"), lit(60))).cast("double").as("c"))
        val ax = Frame(li)
          .countAxis1(Seq("a", "b", "c"), "cnt")
          .nuniqueAxis1(Seq("a", "b", "c"), "nun")
          .anyAxis1(Seq("b", "c"), "anybc")
          .allAxis1(Seq("b", "c"), "allbc")
        val axOut = ax.df.select(col("l_orderkey"), col("l_linenumber"),
          col("cnt"), col("nun"), col("anybc"), col("allbc"))
          .filter(col("l_orderkey") <= 30000)
        val dm = Frame(t(s, dir, "documents").select(col("doc_id"),
          concat(col("source"), lit("|"), col("lang")).as("tag")))
          .strGetDummies("tag", "|", Seq("en", "zh", "src4", "src15"), prefix = "is_")
        val dmOut = dm.df.select(col("doc_id"), col("is_en"), col("is_zh"),
          col("is_src4"), col("is_src15"))
        // coalesce the sparse indicators to a -1 sentinel: nullable-int
        // columns survive pandas round-trips with dtype-dependent NaN
        // sort positions, which desyncs the harness row sort
        val joined = axOut.join(dmOut,
          axOut("l_orderkey") === dmOut("doc_id"), "left").drop("doc_id")
        val filled = Seq("is_en", "is_zh", "is_src4", "is_src15")
          .foldLeft(joined)((d, c) => d.withColumn(c, coalesce(col(c), lit(-1))))
        // (l_orderkey, l_linenumber) duplicates exist in the fixture —
        // sort on every output column so tied rows land identically in
        // both engines (the harness compares in order)
        Frame(filled)
          .sortValues(Seq(SortKey.asc("l_orderkey"), SortKey.asc("l_linenumber"),
            SortKey.asc("cnt"), SortKey.asc("nun"),
            SortKey.asc("anybc"), SortKey.asc("allbc"))).df
      },
      Some("""
        WITH ax AS (
          SELECT l_orderkey, l_linenumber,
                 CAST(2 + CASE WHEN c IS NULL THEN 0 ELSE 1 END AS BIGINT) AS cnt,
                 CAST(1 + CASE WHEN b <> a THEN 1 ELSE 0 END
                        + CASE WHEN c IS NOT NULL AND c <> a AND c <> b
                               THEN 1 ELSE 0 END AS BIGINT) AS nun,
                 (b <> 0 OR coalesce(c <> 0, false)) AS anybc,
                 (b <> 0 AND coalesce(c <> 0, true)) AS allbc
          FROM (SELECT l_orderkey, l_linenumber,
                       CAST(l_quantity AS DOUBLE) AS a,
                       CAST(l_partkey % 60 AS DOUBLE) AS b,
                       CASE WHEN l_linenumber = 1 THEN NULL
                            ELSE CAST(l_suppkey % 60 AS DOUBLE) END AS c
                FROM lineitem)
          WHERE l_orderkey <= 30000),
        dm AS (
          SELECT doc_id,
                 CAST(list_contains(string_split(tag, '|'), 'en') AS INT) AS is_en,
                 CAST(list_contains(string_split(tag, '|'), 'zh') AS INT) AS is_zh,
                 CAST(list_contains(string_split(tag, '|'), 'src4') AS INT) AS is_src4,
                 CAST(list_contains(string_split(tag, '|'), 'src15') AS INT) AS is_src15
          FROM (SELECT doc_id, source || '|' || lang AS tag FROM documents))
        SELECT ax.*, coalesce(dm.is_en, -1) AS is_en,
               coalesce(dm.is_zh, -1) AS is_zh,
               coalesce(dm.is_src4, -1) AS is_src4,
               coalesce(dm.is_src15, -1) AS is_src15
        FROM ax LEFT JOIN dm ON ax.l_orderkey = dm.doc_id
        ORDER BY l_orderkey, l_linenumber, cnt, nun, anybc, allbc""")),

    // axis=1 statistics: prod (empty product = 1), sample var/std with
    // the <2-valid null rule — same zero-shuffle array projections as
    // q187, oracle restated as explicit arithmetic.
    Q("q203_axis1_stats",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("double").as("a"),
          pmod(col("l_partkey"), lit(60)).cast("double").as("b"),
          when(col("l_linenumber") === 1, lit(null))
            .otherwise(pmod(col("l_suppkey"), lit(60))).cast("double").as("c"))
        val fr = Frame(li)
          .prodAxis1(Seq("a", "b", "c"), "rprod")
          .varAxis1(Seq("a", "b", "c"), "rvar")
          .stdAxis1(Seq("a", "b", "c"), "rstd")
        Frame(fr.df.select(col("l_orderkey"), col("l_linenumber"),
          round(col("rprod"), 4).as("rprod"),
          round(col("rvar"), 6).as("rvar"), round(col("rstd"), 6).as("rstd")))
          .sortValues(Seq(SortKey.asc("l_orderkey"), SortKey.asc("l_linenumber"),
            SortKey.asc("rprod"), SortKey.asc("rvar"))).df
      },
      Some("""
        SELECT l_orderkey, l_linenumber,
               round(a * b * coalesce(c, 1), 4) AS rprod,
               round(ss / (n - 1), 6) AS rvar,
               round(sqrt(ss / (n - 1)), 6) AS rstd
        FROM (
          SELECT l_orderkey, l_linenumber, a, b, c, n,
                 (a - m) * (a - m) + (b - m) * (b - m)
                   + coalesce((c - m) * (c - m), 0) AS ss
          FROM (
            SELECT *,
                   2 + CASE WHEN c IS NULL THEN 0 ELSE 1 END AS n,
                   (a + b + coalesce(c, 0))
                     / (2 + CASE WHEN c IS NULL THEN 0 ELSE 1 END) AS m
            FROM (SELECT l_orderkey, l_linenumber,
                         CAST(l_quantity AS DOUBLE) AS a,
                         CAST(l_partkey % 60 AS DOUBLE) AS b,
                         CASE WHEN l_linenumber = 1 THEN NULL
                              ELSE CAST(l_suppkey % 60 AS DOUBLE) END AS c
                  FROM lineitem)))
        ORDER BY l_orderkey, l_linenumber, rprod, rvar""")),

    // factorize(): integer codes in FIRST-APPEARANCE order under the
    // declared ordering (the appearance-order sibling of q86's lexical
    // cat_codes). Engine: two RowOrder passes + a vocab-sized join —
    // never an unpartitioned data-sized window; the oracle replays the
    // same min-position/dense-code construction.
    Q("q234_factorize",
      (s, dir) => {
        val fr = Frame(t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority")))
          .sortValues(Seq(SortKey.asc("o_orderkey")))
        fr.factorize("o_orderpriority", "prio_code")
          .sortValues(Seq(SortKey.asc("o_orderkey")))
          .df.select(col("o_orderkey"), col("o_orderpriority"), col("prio_code"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        WITH firsts AS (
          SELECT o_orderpriority AS v, min(o_orderkey) AS f
          FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY 1),
        codes AS (
          SELECT v, row_number() OVER (ORDER BY f) - 1 AS prio_code FROM firsts)
        SELECT o_orderkey, o_orderpriority,
               coalesce(prio_code, -1) AS prio_code
        FROM orders LEFT JOIN codes ON v = o_orderpriority
        ORDER BY o_orderkey""")),

    // floordiv / mod / pow through the aligned-binop machinery (the
    // numpy forms: floor(a/b); a − floor(a/b)·b so the remainder carries
    // the DIVISOR's sign, unlike SQL's %; power). The signed columns
    // exercise the sign rule both ways; the oracle computes the
    // identical double formulas.
    Q("q235_binop_floordiv_mod_pow",
      (s, dir) => {
        val fr = Frame(t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            (col("l_quantity").cast("double") - 25.5).as("a"),
            (col("l_linenumber").cast("double") - 3.5).as("b")))
        fr.binopFill("a", "b", "fd", "floordiv", 0.0)
          .binopFill("a", "b", "md", "mod", 0.0)
          .binopFill("b", "a", "md_rev", "mod", 0.0)
          .binopFill("b", "l_linenumber", "pw", "pow", 0.0)
          .df.select(col("l_orderkey"), col("l_linenumber"),
            round(col("fd"), 4).as("fd"), round(col("md"), 4).as("md"),
            round(col("md_rev"), 4).as("md_rev"), round(col("pw"), 4).as("pw"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""
        SELECT l_orderkey, l_linenumber,
               round(floor(a / b), 4) AS fd,
               round(a - floor(a / b) * b, 4) AS md,
               round(b - floor(b / a) * a, 4) AS md_rev,
               round(power(b, l_linenumber), 4) AS pw
        FROM (SELECT l_orderkey, l_linenumber,
                     CAST(l_quantity AS DOUBLE) - 25.5 AS a,
                     CAST(l_linenumber AS DOUBLE) - 3.5 AS b
              FROM lineitem)
        ORDER BY l_orderkey, l_linenumber""")))
}

package graft.queries

import org.apache.spark.sql.functions._
import graft.api.{Frame, SortKey}
import QueryKit._

/**
 * §2.9 string / date scalar functions (reference: str_* map registrations
 * QC:2129-2236 ~50 ops; dt_* QC:2240-2331 ~60 ops). All 1:1 Spark
 * built-ins — codegen'd column expressions, zero shuffle, verified over
 * every row via full-row dumps or group checksums.
 */
object StringDateQueries {

  val all: Seq[Q] = Seq(

    // str case/length/trim/substr/concat/reverse/pad over part names
    // (reference str_upper/lower/len/strip/slice/cat QC:2129+).
    Q("q70_string_funcs",
      (s, dir) => Frame(t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("u"),
        lower(col("p_type")).as("lo"),
        length(col("p_name")).cast("long").as("len"),
        trim(col("p_name")).as("trimmed"),
        substring(col("p_name"), 1, 5).as("pre5"),
        concat_ws("|", col("p_brand"), col("p_type")).as("cat"),
        reverse(col("p_name")).as("rev"),
        lpad(col("p_brand"), 10, "_").as("padded"),
        repeat(col("p_brand"), 2).as("rep")))
        .sortValues(Seq(SortKey.asc("p_partkey"))).df,
      Some("""
        SELECT p_partkey, upper(p_name) AS u, lower(p_type) AS lo,
               length(p_name) AS len, trim(p_name) AS trimmed,
               substr(p_name, 1, 5) AS pre5,
               concat_ws('|', p_brand, p_type) AS cat,
               reverse(p_name) AS rev,
               lpad(p_brand, 10, '_') AS padded,
               repeat(p_brand, 2) AS rep
        FROM part ORDER BY p_partkey"""),
      headline = true),

    // str contains/startswith/endswith/match/extract/replace/split
    // (reference str_contains/startswith/extract/replace/split QC:2150+).
    Q("q71_string_match",
      (s, dir) => t(s, dir, "part").agg(
        sum(col("p_name").contains("red").cast("long")).as("n_contains"),
        sum(col("p_name").startsWith("small").cast("long")).as("n_starts"),
        sum(col("p_name").endsWith("bolt").cast("long")).as("n_ends"),
        sum(col("p_name").rlike("^(red|blue)\\s").cast("long")).as("n_match"),
        sum((regexp_extract(col("p_name"), "^(\\w+)", 1) === "green").cast("long")).as("n_first_green"),
        sum(length(regexp_replace(col("p_name"), "[aeiou]", "")).cast("long")).as("len_novowels"),
        sum(size(split(col("p_name"), " ")).cast("long")).as("n_words_total")),
      Some("""
        SELECT CAST(sum(CASE WHEN p_name LIKE '%red%' THEN 1 ELSE 0 END) AS BIGINT) AS n_contains,
               CAST(sum(CASE WHEN p_name LIKE 'small%' THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
               CAST(sum(CASE WHEN p_name LIKE '%bolt' THEN 1 ELSE 0 END) AS BIGINT) AS n_ends,
               CAST(sum(CASE WHEN regexp_matches(p_name, '^(red|blue)\s') THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
               CAST(sum(CASE WHEN regexp_extract(p_name, '^(\w+)', 1) = 'green' THEN 1 ELSE 0 END) AS BIGINT) AS n_first_green,
               CAST(sum(length(regexp_replace(p_name, '[aeiou]', '', 'g'))) AS BIGINT) AS len_novowels,
               CAST(sum(len(string_split(p_name, ' '))) AS BIGINT) AS n_words_total
        FROM part""")),

    // str breadth 2: title/swapcase/zfill/center/translate/find/count/
    // removeprefix/removesuffix (reference QC:2129-2230 Map family —
    // each a 1:1 codegen'd expression; swapcase is the chained-translate
    // trick, zfill = lpad, center = rpad∘lpad).
    Q("q78_string_funcs2",
      (s, dir) => Frame(t(s, dir, "part").select(
        col("p_partkey"),
        initcap(col("p_name")).as("title"),
        translate(col("p_brand"),
          "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ",
          "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz").as("swapped"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("zfilled"),
        rpad(lpad(col("p_brand"),
          floor((lit(14) + length(col("p_brand"))) / 2).cast("int"), lit(" ")), 14, " ")
          .as("centered"),
        (instr(col("p_name"), "re") - 1).cast("long").as("find_re"),
        size(split(col("p_name"), "a", -1)).cast("long").-(1).as("count_a"),
        regexp_replace(col("p_brand"), "^Brand#", "").as("noprefix"),
        regexp_replace(col("p_type"), "ed$", "").as("nosuffix")))
        .sortValues(Seq(SortKey.asc("p_partkey"))).df,
      Some("""
        SELECT p_partkey,
               list_aggregate([upper(x[1]) || x[2:] FOR x IN string_split(p_name, ' ')],
                              'string_agg', ' ') AS title,
               translate(p_brand,
                 'abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ',
                 'ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz') AS swapped,
               lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS zfilled,
               rpad(lpad(p_brand, CAST(floor((14 + length(p_brand)) / 2) AS INT), ' '), 14, ' ')
                 AS centered,
               CAST(instr(p_name, 're') - 1 AS BIGINT) AS find_re,
               CAST(len(string_split(p_name, 'a')) - 1 AS BIGINT) AS count_a,
               regexp_replace(p_brand, '^Brand#', '') AS noprefix,
               regexp_replace(p_type, 'ed$', '') AS nosuffix
        FROM part ORDER BY p_partkey""")),

    // str.partition/rpartition (3-way split at first/last separator) and
    // the is* predicate family (isalpha/isdigit/isalnum/isspace/islower/
    // isupper) — all pure instr/substr/rlike expressions, no UDF
    // (reference partition base:6234+, predicates QC:2129-2230).
    Q("q154_partition_predicates",
      (s, dir) => {
        val sep = lit(" ")
        val name = col("p_name")
        val idx = instr(name, " ")
        val rIdx = instr(reverse(name), " ")
        val n = length(name)
        Frame(t(s, dir, "part").select(
          col("p_partkey"),
          when(idx > 0, name.substr(lit(1), idx - 1)).otherwise(name).as("part_head"),
          when(idx > 0, sep).otherwise(lit("")).as("part_sep"),
          when(idx > 0, name.substr(idx + 1, n)).otherwise(lit("")).as("part_tail"),
          when(rIdx > 0, name.substr(lit(1), n - rIdx)).otherwise(lit("")).as("rpart_head"),
          when(rIdx > 0, name.substr(n - rIdx + 2, n)).otherwise(name).as("rpart_tail"),
          col("p_brand").rlike("^[A-Za-z]+$").as("is_alpha"),
          col("p_brand").rlike("^[0-9]+$").as("is_digit"),
          col("p_brand").rlike("^[A-Za-z0-9]+$").as("is_alnum"),
          col("p_brand").rlike("^\\s+$").as("is_space"),
          (col("p_type") === lower(col("p_type"))).as("is_lower"),
          (col("p_type") === upper(col("p_type"))).as("is_upper")))
          .sortValues(Seq(SortKey.asc("p_partkey"))).df
      },
      Some("""
        SELECT p_partkey,
               CASE WHEN strpos(p_name, ' ') > 0
                    THEN substring(p_name, 1, strpos(p_name, ' ') - 1)
                    ELSE p_name END AS part_head,
               CASE WHEN strpos(p_name, ' ') > 0 THEN ' ' ELSE '' END AS part_sep,
               CASE WHEN strpos(p_name, ' ') > 0
                    THEN substring(p_name, strpos(p_name, ' ') + 1)
                    ELSE '' END AS part_tail,
               CASE WHEN strpos(reverse(p_name), ' ') > 0
                    THEN substring(p_name, 1,
                           length(p_name) - strpos(reverse(p_name), ' '))
                    ELSE '' END AS rpart_head,
               CASE WHEN strpos(reverse(p_name), ' ') > 0
                    THEN substring(p_name,
                           length(p_name) - strpos(reverse(p_name), ' ') + 2)
                    ELSE p_name END AS rpart_tail,
               regexp_matches(p_brand, '^[A-Za-z]+$') AS is_alpha,
               regexp_matches(p_brand, '^[0-9]+$') AS is_digit,
               regexp_matches(p_brand, '^[A-Za-z0-9]+$') AS is_alnum,
               regexp_matches(p_brand, '^\s+$') AS is_space,
               p_type = lower(p_type) AS is_lower,
               p_type = upper(p_type) AS is_upper
        FROM part ORDER BY p_partkey""")),

    // str.findall (serialized match list), slice_replace (substring
    // surgery), groupwise str.cat (ordered string_agg), and the axis=1
    // reduction idxmax (argmax across row columns as a greatest +
    // case-when name pick) — reference findall QC:2160, slice_replace
    // base:6470, cat base:6635, idxmax(axis=1) QC:1101.
    Q("q156_findall_cat_rowwise",
      (s, dir) => {
        val brandDigits = concat_ws(",",
          regexp_extract_all(col("p_brand"), lit("[0-9]"), lit(0)))
        val sliced = concat(
          substring(col("p_name"), 1, 3), lit("***"),
          expr("substring(p_name, 7)"))
        val (a, b, c) = (col("p_retailprice"), col("p_size").cast("double"),
          col("p_partkey").cast("double") / 100.0)
        val mx = greatest(a, b, c)
        val idxmaxRow = when(mx === a, "retail").when(mx === b, "size").otherwise("key")
        val perPart = t(s, dir, "part").select(
          col("p_partkey"), col("p_brand"),
          brandDigits.as("brand_digits"),
          sliced.as("name_spliced"),
          idxmaxRow.as("rowwise_idxmax"))
        // groupwise str.cat: partkeys per brand in key order, '|'-joined
        val cats = t(s, dir, "part")
          .groupBy(col("p_brand"))
          .agg(concat_ws("|",
            transform(array_sort(collect_list(col("p_partkey"))),
              x => x.cast("string"))).as("cat_keys"))
        Frame(perPart.join(cats, "p_brand")
          .select("p_partkey", "brand_digits", "name_spliced",
            "rowwise_idxmax", "cat_keys"))
          .sortValues(Seq(SortKey.asc("p_partkey"))).df
      },
      Some("""
        SELECT p_partkey,
               array_to_string(regexp_extract_all(p_brand, '[0-9]'), ',') AS brand_digits,
               substring(p_name, 1, 3) || '***' || substring(p_name, 7) AS name_spliced,
               CASE WHEN greatest(p_retailprice, CAST(p_size AS DOUBLE), p_partkey / 100.0)
                         = p_retailprice THEN 'retail'
                    WHEN greatest(p_retailprice, CAST(p_size AS DOUBLE), p_partkey / 100.0)
                         = CAST(p_size AS DOUBLE) THEN 'size'
                    ELSE 'key' END AS rowwise_idxmax,
               cat_keys
        FROM part
        JOIN (SELECT p_brand,
                     string_agg(CAST(p_partkey AS VARCHAR), '|' ORDER BY p_partkey)
                       AS cat_keys
              FROM part GROUP BY p_brand) USING (p_brand)
        ORDER BY p_partkey""")),

    // dt breadth 2: is_month/quarter/year_start+end, is_leap_year,
    // daysinmonth, isocalendar week, month_name/day_name, dt floor
    // (reference dt_* QC:2284-2331 — all 1:1 expressions).
    Q("q79_date_parts2",
      (s, dir) => {
        val d = col("o_orderdate")
        Frame(t(s, dir, "orders").select(
          col("o_orderkey"),
          (dayofmonth(d) === 1).as("is_month_start"),
          (d.cast("date") === last_day(d)).as("is_month_end"),
          (month(d).isin(1, 4, 7, 10) && (dayofmonth(d) === 1)).as("is_quarter_start"),
          ((month(d) === 1) && (dayofmonth(d) === 1)).as("is_year_start"),
          (((year(d) % 4 === 0) && (year(d) % 100 =!= 0)) || (year(d) % 400 === 0))
            .as("is_leap_year"),
          dayofmonth(last_day(d)).cast("long").as("daysinmonth"),
          weekofyear(d).cast("long").as("iso_week"),
          date_format(d, "MMMM").as("month_name"),
          date_format(d, "EEEE").as("day_name"),
          date_trunc("month", d).as("month_floor")))
          .sortValues(Seq(SortKey.asc("o_orderkey"))).df
      },
      Some("""
        SELECT o_orderkey,
               day(o_orderdate) = 1 AS is_month_start,
               CAST(o_orderdate AS DATE) = last_day(o_orderdate) AS is_month_end,
               month(o_orderdate) IN (1, 4, 7, 10) AND day(o_orderdate) = 1
                 AS is_quarter_start,
               month(o_orderdate) = 1 AND day(o_orderdate) = 1 AS is_year_start,
               (year(o_orderdate) % 4 = 0 AND year(o_orderdate) % 100 <> 0)
                 OR year(o_orderdate) % 400 = 0 AS is_leap_year,
               CAST(day(last_day(o_orderdate)) AS BIGINT) AS daysinmonth,
               CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
               monthname(o_orderdate) AS month_name,
               dayname(o_orderdate) AS day_name,
               date_trunc('month', o_orderdate) AS month_floor
        FROM orders ORDER BY o_orderkey""")),

    // JSON accessor over the events props column (reference list/struct
    // accessors §2.9: struct_field / get_json_object-style access).
    Q("q72_json_accessor",
      (s, dir) => f(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupby("event_type").agg(
          "n" -> count(lit(1)),
          "sum_k" -> sum(col("k")),
          "max_k" -> max(col("k")))
        .sortValues(Seq(SortKey.asc("event_type"))).df,
      Some("""
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS sum_k,
               max(CAST(props->>'k' AS INTEGER)) AS max_k
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // dt parts: year…second, dayofweek/dayofyear/week/quarter (reference
    // dt_year…dt_second QC:2240+; Spark dayofweek is 1=Sunday, DuckDB dow
    // is 0=Sunday — the +1 is the documented mapping).
    Q("q73_date_parts",
      (s, dir) => f(s, dir, "events")
        .selectExprs(
          year(col("ts")).as("y"),
          month(col("ts")).cast("long").as("mo"),
          dayofmonth(col("ts")).cast("long").as("d"),
          hour(col("ts")).as("h"),
          minute(col("ts")).as("mi"),
          second(col("ts")).as("sec"),
          dayofweek(col("ts")).cast("long").as("dow"),
          dayofyear(col("ts")).cast("long").as("doy"),
          weekofyear(col("ts")).cast("long").as("wk"),
          quarter(col("ts")).cast("long").as("q"))
        .groupby("mo", "d", "dow", "doy", "wk", "q")
        .agg("n" -> count(lit(1)), "sum_h" -> sum(col("h")),
          "sum_mi" -> sum(col("mi")), "sum_sec" -> sum(col("sec")),
          "sum_y" -> sum(col("y")))
        .sortValues(Seq(SortKey.asc("mo"), SortKey.asc("d"))).df,
      Some("""
        SELECT month(ts) AS mo, day(ts) AS d, dayofweek(ts) + 1 AS dow,
               dayofyear(ts) AS doy, weekofyear(ts) AS wk, quarter(ts) AS q,
               count(*) AS n,
               CAST(sum(hour(ts)) AS BIGINT) AS sum_h,
               CAST(sum(minute(ts)) AS BIGINT) AS sum_mi,
               CAST(sum(CAST(second(ts) AS BIGINT)) AS BIGINT) AS sum_sec,
               CAST(sum(year(ts)) AS BIGINT) AS sum_y
        FROM events GROUP BY 1,2,3,4,5,6 ORDER BY mo, d""")),

    // dt arithmetic: date_add / add_months / datediff / trunc / last_day /
    // is_month_start/end (reference dt_round/floor/normalize QC:2270+).
    Q("q74_date_arith",
      // All date-typed outputs are normalized to TIMESTAMP_NTZ: parquet
      // date32 round-trips as python `date` objects while DuckDB emits
      // datetime64 — same values, incomparable dtypes in the hash gate.
      (s, dir) => Frame(t(s, dir, "orders").select(
        col("o_orderkey"),
        date_add(to_date(col("o_orderdate")), 30).cast("timestamp_ntz").as("d30"),
        add_months(to_date(col("o_orderdate")), 2).cast("timestamp_ntz").as("m2"),
        datediff(lit("1998-12-31").cast("date"), to_date(col("o_orderdate"))).cast("long").as("days_to_end"),
        date_trunc("month", col("o_orderdate")).as("mstart"),
        last_day(to_date(col("o_orderdate"))).cast("timestamp_ntz").as("mend"),
        (dayofmonth(col("o_orderdate")) === 1).as("is_month_start"),
        (to_date(col("o_orderdate")) === last_day(to_date(col("o_orderdate")))).as("is_month_end")))
        .sortValues(Seq(SortKey.asc("o_orderkey"))).df,
      Some("""
        SELECT o_orderkey,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS TIMESTAMP) AS d30,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS TIMESTAMP) AS m2,
               datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_end,
               date_trunc('month', o_orderdate) AS mstart,
               CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS mend,
               day(o_orderdate) = 1 AS is_month_start,
               CAST(o_orderdate AS DATE) = last_day(CAST(o_orderdate AS DATE)) AS is_month_end
        FROM orders ORDER BY o_orderkey""")),

    // strftime / date_format (reference dt_strftime QC:2301).
    Q("q75_strftime",
      (s, dir) => f(s, dir, "orders")
        .selectExprs(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .groupby("ym").size("n")
        .sortValues(Seq(SortKey.asc("ym"))).df,
      Some("""
        SELECT strftime(o_orderdate, '%Y-%m') AS ym, count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1""")),

    // timedelta components: per-user inter-event gap seconds (reference
    // dt_total_seconds / timedelta accessors QC:2320+).
    Q("q76_timedelta",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
        Frame(t(s, dir, "events")
          .withColumn("gap_s",
            (unix_micros(col("ts").cast("timestamp")) -
              unix_micros(lag(col("ts"), 1).over(w).cast("timestamp"))).cast("double") / 1e6)
          .groupBy(col("user_id"))
          .agg(round(avg(col("gap_s")), 3).as("avg_gap_s"),
            round(max(col("gap_s")), 3).as("max_gap_s")))
          .sortValues(Seq(SortKey.asc("user_id"))).df
      },
      Some("""
        SELECT user_id,
               round(avg(gap_s), 3) AS avg_gap_s,
               round(max(gap_s), 3) AS max_gap_s
        FROM (
          SELECT user_id,
                 CAST(epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                      AS DOUBLE) / 1e6 AS gap_s
          FROM events)
        GROUP BY user_id ORDER BY user_id""")),

    // tz_localize / tz_convert (reference dt_tz_localize QC base:5396,
    // dt_tz_convert :5354): localize = interpret the naive wall time in a
    // zone (→ the UTC instant), convert = re-render an instant in another
    // zone's wall time. Spark's to_utc_timestamp/from_utc_timestamp are
    // exactly these two halves; outputs are normalized back to naive
    // TIMESTAMP_NTZ for dtype parity with DuckDB's timezone() pairs.
    // (events.ts is all Jan-2024 — no DST transition in any zone used.)
    Q("q141_tz_localize_convert",
      (s, dir) => {
        val ts = col("ts").cast("timestamp")
        Frame(t(s, dir, "events").select(
          col("event_id"),
          to_utc_timestamp(ts, "America/New_York").cast("timestamp_ntz").as("ny_localized_utc"),
          from_utc_timestamp(ts, "Asia/Tokyo").cast("timestamp_ntz").as("utc_to_tokyo"),
          from_utc_timestamp(to_utc_timestamp(ts, "America/New_York"), "Europe/Paris")
            .cast("timestamp_ntz").as("ny_to_paris"),
          hour(from_utc_timestamp(ts, "Australia/Sydney")).cast("long").as("sydney_hour")))
          .sortValues(Seq(SortKey.asc("event_id"))).df
      },
      Some("""
        SELECT event_id,
               timezone('UTC', timezone('America/New_York', CAST(ts AS TIMESTAMP)))
                 AS ny_localized_utc,
               timezone('Asia/Tokyo', timezone('UTC', CAST(ts AS TIMESTAMP)))
                 AS utc_to_tokyo,
               timezone('Europe/Paris', timezone('America/New_York', CAST(ts AS TIMESTAMP)))
                 AS ny_to_paris,
               hour(timezone('Australia/Sydney', timezone('UTC', CAST(ts AS TIMESTAMP))))
                 AS sydney_hour
        FROM events ORDER BY event_id""")),

    // between_time / at_time (reference base:5331): select rows by
    // time-of-day regardless of date — a pure filter on
    // microseconds-since-midnight, pushed to the scan like any predicate.
    // pandas includes both endpoints by default; at_time is the
    // equality case (whole minute 12:00 here — event times carry
    // microseconds, so exact-instant equality would select nothing).
    Q("q151_between_time",
      (s, dir) => {
        val us = unix_micros(col("ts").cast("timestamp"))
        val dayUs = pmod(us, lit(86400000000L))
        val lo = ((9L * 60 + 15) * 60) * 1000000L
        val hi = ((17L * 60 + 45) * 60) * 1000000L
        val noon = (12L * 3600) * 1000000L
        Frame(t(s, dir, "events")
          .withColumn("__day_us__", dayUs)
          .groupBy(col("event_type"))
          .agg(
            count(when(col("__day_us__") >= lo && col("__day_us__") <= hi, 1))
              .as("n_between"),
            round(sum(when(col("__day_us__") >= lo && col("__day_us__") <= hi,
              col("value"))), 2).as("sum_between"),
            count(when(col("__day_us__") >= noon && col("__day_us__") < noon + 60000000L, 1))
              .as("n_at_noon")))
          .sortValues(Seq(SortKey.asc("event_type"))).df
      },
      Some("""
        SELECT event_type,
               count(*) FILTER (WHERE day_us BETWEEN 33300000000 AND 63900000000)
                 AS n_between,
               round(sum(value) FILTER (WHERE day_us BETWEEN 33300000000 AND 63900000000), 2)
                 AS sum_between,
               count(*) FILTER (WHERE day_us >= 43200000000 AND day_us < 43260000000)
                 AS n_at_noon
        FROM (SELECT event_type, value, epoch_us(ts) % 86400000000 AS day_us
              FROM events)
        GROUP BY event_type ORDER BY event_type""")),

    // dt.floor/ceil/round to a frequency (reference dt_round/floor/ceil
    // QC:2284+): exact integer microsecond arithmetic on the epoch —
    // floor = truncating division, ceil = floor of (us + step - 1),
    // round = floor of (us + step/2), identical formulas in both engines
    // (pandas rounds half-to-even on exact midpoints; the event stream's
    // microsecond timestamps never land on a 7.5-minute boundary, and the
    // half-up formula is what both sides compute here).
    Q("q152_dt_floor_ceil_round",
      (s, dir) => {
        val us = unix_micros(col("ts").cast("timestamp"))
        val step = 900000000L // 15 min
        def toTs(c: org.apache.spark.sql.Column) =
          timestamp_micros(c * step).cast("timestamp_ntz")
        Frame(t(s, dir, "events").select(
          col("event_id"),
          toTs(floor(us / step).cast("long")).as("floor_15m"),
          toTs(floor((us + step - 1) / step).cast("long")).as("ceil_15m"),
          toTs(floor((us + step / 2) / step).cast("long")).as("round_15m")))
          .sortValues(Seq(SortKey.asc("event_id"))).df
      },
      Some("""
        SELECT event_id,
               make_timestamp(CAST(floor(epoch_us(ts) / 900000000) AS BIGINT) * 900000000)
                 AS floor_15m,
               make_timestamp(CAST(floor((epoch_us(ts) + 899999999) / 900000000) AS BIGINT)
                 * 900000000) AS ceil_15m,
               make_timestamp(CAST(floor((epoch_us(ts) + 450000000) / 900000000) AS BIGINT)
                 * 900000000) AS round_15m
        FROM events ORDER BY event_id""")),

    // isocalendar (ISO year differs from the calendar year around new
    // year: the week's THURSDAY determines it) + is_quarter_end /
    // is_year_end (reference isocalendar, is_*_end QC:2284-2331). All
    // arithmetic — Spark has no isoyear builtin, so both engines compute
    // year(date + (4 - isodow) days) with isodow = Mon1..Sun7.
    Q("q153_isocalendar_flags",
      (s, dir) => {
        val d = to_date(col("o_orderdate"))
        val isoDow = (pmod(dayofweek(d) + 5, lit(7)) + 1).cast("long")
        Frame(t(s, dir, "orders").select(
          col("o_orderkey"),
          year(date_add(d, (lit(4) - isoDow).cast("int"))).cast("long").as("iso_year"),
          weekofyear(d).cast("long").as("iso_week"),
          isoDow.as("iso_day"),
          (d === last_day(d) && month(d).isin(3, 6, 9, 12)).as("is_quarter_end"),
          ((month(d) === 12) && (dayofmonth(d) === 31)).as("is_year_end")))
          .sortValues(Seq(SortKey.asc("o_orderkey"))).df
      },
      Some("""
        SELECT o_orderkey,
               year(CAST(o_orderdate AS DATE) + (4 - isodow(o_orderdate)) * INTERVAL 1 DAY)
                 AS iso_year,
               weekofyear(o_orderdate) AS iso_week,
               CAST(isodow(o_orderdate) AS BIGINT) AS iso_day,
               CAST(o_orderdate AS DATE) = last_day(CAST(o_orderdate AS DATE))
                 AND month(o_orderdate) IN (3, 6, 9, 12) AS is_quarter_end,
               month(o_orderdate) = 12 AND day(o_orderdate) = 31 AS is_year_end
        FROM orders ORDER BY o_orderkey""")),

    // Period family (reference dt_to_period QC base:2311, dt_qyear :2317,
    // period start_time/end_time :2322-2328): a period is just its label
    // plus its [start, end] span — date_trunc + offset arithmetic, all
    // codegen'd scalar expressions. qyear uses fiscal freq Q-SEP (year of
    // the quarter's end when quarters close in September): Oct-Dec roll
    // into the next fiscal year. end_time = next period start − 1 µs.
    Q("q142_period_ops",
      (s, dir) => {
        val d = col("o_orderdate")
        Frame(t(s, dir, "orders").select(
          col("o_orderkey"),
          date_format(d, "yyyy-MM").as("period_m"),
          concat(year(d).cast("string"), lit("Q"), quarter(d).cast("string")).as("period_q"),
          (year(d) + (month(d) > 9).cast("int")).cast("long").as("qyear_sep"),
          date_trunc("month", d).as("m_start_time"),
          (date_trunc("month", add_months(d, 1)).cast("timestamp_ntz")
            - expr("INTERVAL 1 MICROSECOND")).as("m_end_time"),
          date_trunc("quarter", d).as("q_start_time")))
          .sortValues(Seq(SortKey.asc("o_orderkey"))).df
      },
      Some("""
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m') AS period_m,
               CAST(year(o_orderdate) AS VARCHAR) || 'Q' ||
                 CAST(quarter(o_orderdate) AS VARCHAR) AS period_q,
               CAST(year(o_orderdate) +
                 CASE WHEN month(o_orderdate) > 9 THEN 1 ELSE 0 END AS BIGINT)
                 AS qyear_sep,
               date_trunc('month', o_orderdate) AS m_start_time,
               CAST(date_trunc('month', CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH)
                    AS TIMESTAMP) - INTERVAL 1 MICROSECOND AS m_end_time,
               date_trunc('quarter', o_orderdate) AS q_start_time
        FROM orders ORDER BY o_orderkey""")),

    // str.extractall (reference str accessor family — one row per regex
    // match with the pandas 0-based match index). regexp_extract_all is
    // a codegen'd map over the scan; posexplode expands matches without
    // any shuffle, and non-matching rows drop (extractall contract).
    Q("q189_extractall",
      (s, dir) => {
        val ms = t(s, dir, "documents").select(
          col("doc_id"),
          regexp_extract_all(col("text"), lit("([a-z]{7,})"), lit(1)).as("ms"))
        Frame(ms.select(col("doc_id"), posexplode(col("ms")))
          .select(col("doc_id"), col("pos").cast("long").as("match_no"),
            col("col").as("m")))
          .sortValues(Seq(SortKey.asc("doc_id"), SortKey.asc("match_no"))).df
      },
      Some("""
        SELECT doc_id,
               unnest(range(0, len(ms))) AS match_no,
               unnest(ms) AS m
        FROM (SELECT doc_id, regexp_extract_all(text, '([a-z]{7,})', 1) AS ms
              FROM documents)
        ORDER BY doc_id, match_no""")),

    // to_numeric / to_datetime errors='coerce' (Frame.toNumeric /
    // toDatetime — try_cast / try_to_timestamp): unparseable input nulls
    // instead of failing the job, the ingestion-robustness valve. Messy
    // strings are built deterministically (number, garbage, empty,
    // valid date, month-13 date) so both engines coerce the same cells.
    Q("q199_coerce",
      (s, dir) => {
        val messy = t(s, dir, "documents").select(col("doc_id"),
          when(pmod(col("doc_id"), lit(4)) === 0, concat(col("doc_id").cast("string"), lit(".25")))
            .when(pmod(col("doc_id"), lit(4)) === 1, lit("n/a"))
            .when(pmod(col("doc_id"), lit(4)) === 2, lit(""))
            .otherwise(col("doc_id").cast("string")).as("numstr"),
          when(pmod(col("doc_id"), lit(3)) === 0, lit("2024-03-15"))
            .when(pmod(col("doc_id"), lit(3)) === 1, lit("2024-13-05"))
            .otherwise(lit("garbage")).as("datestr"))
        val parsed = Frame(messy)
          .toNumeric("numstr", "num", errors = "coerce")
          .toDatetime("datestr", "dt", "yyyy-MM-dd", errors = "coerce")
        Frame(parsed.df.select(col("doc_id"), col("num"), col("dt")))
          .sortValues(Seq(SortKey.asc("doc_id"))).df
      },
      Some("""
        SELECT doc_id,
               TRY_CAST(CASE WHEN doc_id % 4 = 0 THEN doc_id || '.25'
                             WHEN doc_id % 4 = 1 THEN 'n/a'
                             WHEN doc_id % 4 = 2 THEN ''
                             ELSE CAST(doc_id AS VARCHAR) END AS DOUBLE) AS num,
               try_strptime(CASE WHEN doc_id % 3 = 0 THEN '2024-03-15'
                                 WHEN doc_id % 3 = 1 THEN '2024-13-05'
                                 ELSE 'garbage' END, '%Y-%m-%d') AS dt
        FROM documents ORDER BY doc_id""")),

    // json_normalize (pandas pd.json_normalize(record_path, meta)):
    // from_json with an explicit schema → meta fields + posexplode of
    // the record array → flattened struct fields. The nested JSON is
    // built deterministically from order columns, so the oracle states
    // the expected flattening directly — the round-trip proves Spark's
    // parse + normalize. (pandas explode(['a','b']) is the same
    // machinery: posexplode(arrays_zip(a, b)).)
    Q("q200_json_normalize",
      (s, dir) => {
        val js = t(s, dir, "orders").filter(col("o_orderkey") <= 2000)
          .select(col("o_orderkey"), concat(
            lit("{\"id\": "), col("o_orderkey").cast("string"),
            lit(", \"user\": {\"name\": \"u"), col("o_custkey").cast("string"),
            lit("\", \"prio\": \""), col("o_orderpriority"),
            lit("\"}, \"items\": [{\"sku\": "), (col("o_orderkey") * 10).cast("string"),
            lit(", \"qty\": 1}, {\"sku\": "), (col("o_orderkey") * 10 + 1).cast("string"),
            lit(", \"qty\": 2}]}")).as("js"))
        val schema = "id BIGINT, user STRUCT<name: STRING, prio: STRING>, " +
          "items ARRAY<STRUCT<sku: BIGINT, qty: BIGINT>>"
        val parsed = js.select(
          from_json(col("js"), org.apache.spark.sql.types.StructType.fromDDL(schema)).as("r"))
        Frame(parsed
          .select(col("r.id").as("id"), col("r.user.name").as("user_name"),
            col("r.user.prio").as("prio"), posexplode(col("r.items")))
          .select(col("id"), col("user_name"), col("prio"),
            col("pos").cast("long").as("item_no"),
            col("col.sku").as("sku"), col("col.qty").as("qty")))
          .sortValues(Seq(SortKey.asc("id"), SortKey.asc("item_no"))).df
      },
      Some("""
        SELECT o_orderkey AS id, 'u' || CAST(o_custkey AS VARCHAR) AS user_name,
               o_orderpriority AS prio,
               CAST(unnest([0, 1]) AS BIGINT) AS item_no,
               unnest([o_orderkey * 10, o_orderkey * 10 + 1]) AS sku,
               CAST(unnest([1, 2]) AS BIGINT) AS qty
        FROM orders WHERE o_orderkey <= 2000
        ORDER BY id, item_no""")),

    // str casefold / normalize(NFC) / wrap / encode / decode (reference
    // str_casefold/str_normalize/str_wrap/str_encode/str_decode, base
    // QC:6234-6644). The corpus is ASCII, so the oracle pins the full
    // plumbing end-to-end (wrap's reflow regex runs identically in RE2);
    // the Unicode-specific kernels (ß→ss, combining marks) are pinned in
    // TextSpec where DuckDB has no casefold to compare against.
    Q("q210_str_casefold_wrap",
      (s, dir) => Frame(t(s, dir, "documents").select(
        col("doc_id"),
        graft.functions.Text.casefold(col("text")).as("cf"),
        graft.functions.Text.normalize(col("text"), "NFC").as("nfc"),
        graft.functions.Text.wrap(col("text"), 40).as("wrapped"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        (decode(encode(col("text"), "UTF-8"), "UTF-8") === col("text")).as("rt_ok")))
        .sortValues(Seq(SortKey.asc("doc_id"))).df,
      Some("""
        SELECT doc_id,
               lower(text) AS cf,
               nfc_normalize(text) AS nfc,
               regexp_replace(regexp_replace(trim(regexp_replace(text, '\s+', ' ', 'g')),
                   '(.{1,40})( |$)', '\1' || chr(10), 'g'), chr(10) || '$', '') AS wrapped,
               octet_length(encode(text)) AS n_bytes,
               decode(encode(text)) = text AS rt_ok
        FROM documents ORDER BY doc_id""")),

    // str accessor tail (capitalize / fullmatch / isdecimal / istitle /
    // ljust / rjust / lstrip / rstrip / rfind / rsplit) — the last
    // uncovered reference series_utils.py methods. rfind is the
    // 0-based last-occurrence index via the reversed-locate identity
    // (-1 when absent, the python contract); rsplit(maxsplit=1) is the
    // right-split pair. ASCII fixture strings, so the is* classes match
    // python's on this domain (documented at the call).
    Q("q238_str_accessor_tail",
      (s, dir) => {
        val c = col("p_name")
        val n = length(c)
        val sub = lit("al")
        val rp = locate("la", reverse(c)) // reverse("al")
        Frame(t(s, dir, "part").select(
          col("p_partkey"),
          concat(upper(substring(c, 1, 1)), lower(substring(c, 2, 200))).as("cap"),
          col("p_brand").rlike("^Brand#[0-9]+$").as("fm"),
          regexp_extract(col("p_brand"), "[0-9]+", 0).rlike("^[0-9]+$").as("isdec"),
          initcap(c).rlike("^(?:[^A-Za-z]*[A-Z][a-z]*)*[^A-Za-z]*$").as("istitle_t"),
          c.rlike("^(?:[^A-Za-z]*[A-Z][a-z]*)*[^A-Za-z]*$").as("istitle_f"),
          rpad(col("p_brand"), 12, "_").as("lj"),
          lpad(col("p_brand"), 12, "_").as("rj"),
          ltrim(concat(lit("  "), c, lit("  "))).as("ls"),
          rtrim(concat(lit("  "), c, lit("  "))).as("rs"),
          when(rp > 0, n - rp - length(sub) + 1).otherwise(-1).cast("long").as("rf"),
          substring_index(c, " ", -1).as("rsp_last"),
          when(c.contains(" "),
            expr("substring(p_name, 1, length(p_name) - " +
              "length(substring_index(p_name, ' ', -1)) - 1)")).as("rsp_head")))
          .sortValues(Seq(SortKey.asc("p_partkey"))).df
      },
      Some("""
        SELECT p_partkey,
               upper(substr(p_name, 1, 1)) || lower(substr(p_name, 2)) AS cap,
               regexp_full_match(p_brand, 'Brand#[0-9]+') AS fm,
               regexp_full_match(regexp_extract(p_brand, '[0-9]+'), '[0-9]+') AS isdec,
               regexp_full_match(
                 list_aggregate(list_transform(string_split(p_name, ' '),
                   w -> upper(substr(w,1,1)) || lower(substr(w,2))), 'string_agg', ' '),
                 '(?:[^A-Za-z]*[A-Z][a-z]*)*[^A-Za-z]*') AS istitle_t,
               regexp_full_match(p_name, '(?:[^A-Za-z]*[A-Z][a-z]*)*[^A-Za-z]*') AS istitle_f,
               rpad(p_brand, 12, '_') AS lj,
               lpad(p_brand, 12, '_') AS rj,
               ltrim('  ' || p_name || '  ') AS ls,
               rtrim('  ' || p_name || '  ') AS rs,
               CASE WHEN strpos(reverse(p_name), reverse('al')) > 0
                    THEN length(p_name) - strpos(reverse(p_name), reverse('al'))
                         - length('al') + 1
                    ELSE -1 END AS rf,
               CASE WHEN strpos(p_name, ' ') > 0
                    THEN array_extract(string_split(p_name, ' '), -1)
                    ELSE p_name END AS rsp_last,
               CASE WHEN strpos(p_name, ' ') > 0
                    THEN substr(p_name, 1, length(p_name)
                         - length(array_extract(string_split(p_name, ' '), -1)) - 1)
                    END AS rsp_head
        FROM part ORDER BY p_partkey""")),

    // dt accessor tail: weekday (Monday=0, python/pandas convention —
    // Spark's dayofweek is Sunday=1) and days_in_month via last_day.
    Q("q239_dt_accessor_tail",
      (s, dir) => Frame(t(s, dir, "events").select(
        col("event_id"),
        pmod(dayofweek(col("ts")) + 5, lit(7)).cast("long").as("weekday"),
        dayofmonth(last_day(col("ts"))).cast("long").as("days_in_month")))
        .sortValues(Seq(SortKey.asc("event_id"))).df,
      Some("""
        SELECT event_id,
               CAST(isodow(ts) - 1 AS BIGINT) AS weekday,
               CAST(date_part('day', last_day(ts)) AS BIGINT) AS days_in_month
        FROM events ORDER BY event_id""")),

    // `.dt.components` (reference timedelta accessors QC:2320+): the
    // seven-field decomposition of a timedelta, over BOTH signs — fwd =
    // ts − lag(ts) ≥ 0, back = ts − lead(ts) ≤ 0 — because pandas'
    // negative normalization (days floors toward −∞, sub-day components
    // stay non-negative: −1h → days −1, hours 23) is the part a naive
    // trunc-div port gets wrong. Engine side is Frame.dtComponents (one
    // codegen'd integer projection); the oracle spells the same floor-mod
    // arithmetic (DuckDB's % follows the dividend sign, so pmod is
    // ((x % d) + d) % d; the day quotient divides the exact multiple with
    // integer // — no float in the loop). nanoseconds omitted from the
    // row (constant 0 at µs resolution, pinned in FrameSpec instead).
    Q("q279_dt_components",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
        val us = unix_micros(col("ts").cast("timestamp"))
        val fwd = us - unix_micros(lag(col("ts"), 1).over(w).cast("timestamp"))
        val back = us - unix_micros(lead(col("ts"), 1).over(w).cast("timestamp"))
        Frame(t(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            graft.api.Frame.dtComponents(fwd).as("f"),
            graft.api.Frame.dtComponents(back).as("b"))
          .select(col("event_id"),
            col("f.days").as("f_days"), col("f.hours").as("f_hours"),
            col("f.minutes").as("f_minutes"), col("f.seconds").as("f_seconds"),
            col("f.milliseconds").as("f_ms"), col("f.microseconds").as("f_us"),
            col("b.days").as("b_days"), col("b.hours").as("b_hours"),
            col("b.minutes").as("b_minutes"), col("b.seconds").as("b_seconds")))
          .sortValues(Seq(SortKey.asc("event_id"))).df
      },
      Some("""
        WITH td AS (
          SELECT event_id,
                 epoch_us(ts) - epoch_us(lag(ts) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id)) AS fus,
                 epoch_us(ts) - epoch_us(lead(ts) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id)) AS bus
          FROM events
        ), r AS (
          SELECT event_id, fus, bus,
                 ((fus % 86400000000) + 86400000000) % 86400000000 AS frem,
                 ((bus % 86400000000) + 86400000000) % 86400000000 AS brem
          FROM td
        )
        SELECT event_id,
               (fus - frem) // 86400000000 AS f_days,
               frem // 3600000000 AS f_hours,
               (frem % 3600000000) // 60000000 AS f_minutes,
               (frem % 60000000) // 1000000 AS f_seconds,
               (frem % 1000000) // 1000 AS f_ms,
               frem % 1000 AS f_us,
               (bus - brem) // 86400000000 AS b_days,
               brem // 3600000000 AS b_hours,
               (brem % 3600000000) // 60000000 AS b_minutes,
               (brem % 60000000) // 1000000 AS b_seconds
        FROM r ORDER BY event_id""")))
}

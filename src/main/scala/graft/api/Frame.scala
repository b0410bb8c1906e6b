package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Frame — an ordered, labeled 2-D table on top of a Spark [[DataFrame]].
 *
 * The reference engine (modin) models a pandas DataFrame as a 2-D grid of
 * pandas blocks with a row index carried as metadata, and moves labels
 * into/out of data columns via `from_labels`/`to_labels`
 * (reference: modin/core/dataframe/pandas/dataframe/dataframe.py:1451,1556).
 * Spark relations are unordered and unlabeled, so we carry both concepts as
 * data:
 *
 *   - `indexCols`: ordinary columns that play the role of the pandas row
 *     index (possibly several → MultiIndex).
 *   - `ordering`: the sort keys that define pandas row order. Kept *lazy* as
 *     a list of sort expressions (mirroring modin's lazily materialized
 *     `ModinIndex`, modin/core/dataframe/pandas/metadata/index.py:24); a
 *     physical `__row_order__` column is only computed when a positional
 *     operator (iloc/tail/shift without keys) actually needs it — see
 *     [[graft.ops.RowOrder]] for the scalable two-pass implementation.
 *
 * Every operator is a pure function `Frame => Frame` compiling to a single
 * Catalyst plan; there is no eager materialization except in operators
 * documented as driver-only (e.g. [[transpose]]).
 */
/** A sort key with an explicit direction — Spark 4's `Column` no longer
  * exposes its expression publicly, so order must be first-class data for
  * [[Frame.tail]] to be able to flip it. */
final case class SortKey(c: Column, asc: Boolean = true, nullsFirst: Boolean = false) {
  def toColumn: Column = (asc, nullsFirst) match {
    case (true, true)   => c.asc_nulls_first
    case (true, false)  => c.asc_nulls_last
    case (false, true)  => c.desc_nulls_first
    case (false, false) => c.desc_nulls_last
  }
  def reversed: SortKey = copy(asc = !asc, nullsFirst = !nullsFirst)
}

object SortKey {
  def asc(name: String): SortKey = SortKey(col(name), asc = true)
  def desc(name: String): SortKey = SortKey(col(name), asc = false)
}

final case class Frame(
    df: DataFrame,
    indexCols: Seq[String] = Nil,
    ordering: Seq[SortKey] = Nil) {

  import Frame._

  def spark = df.sparkSession

  // ---------------------------------------------------------------------
  // §2.2 projection / selection / filtering
  // (reference: modin getitem_column_array, storage_formats/pandas/query_compiler.py:3105)
  // ---------------------------------------------------------------------

  /** Column projection; index columns are always retained (pandas keeps the
    * index on `df[cols]`). Catalyst prunes the parquet scan accordingly. */
  def select(cols: String*): Frame =
    copy(df = df.select((indexCols ++ cols).distinct.map(col): _*))

  def selectExprs(cols: Column*): Frame = copy(df = df.select(cols: _*))

  /** Boolean-mask filter (reference getitem_array QC:3072 / filter algebra). */
  def filter(cond: Column): Frame = copy(df = df.filter(cond))

  /** String-predicate filter (reference rowwise_query QC:3585). */
  def query(predicate: String): Frame = copy(df = df.filter(expr(predicate)))

  /** `query` in the pandas expression dialect (`and`/`or`/`==`/`in [...]`/
    * `True`…) — translated to Spark SQL by [[PandasExpr]], so ported
    * pandas code runs unchanged. `ieeeDivision = true` opts `/`/`//` into
    * numpy semantics (x/0 → ±Inf, 0/0 → NaN) instead of the default ANSI
    * DIVIDE_BY_ZERO error — see PandasExpr's deviation-16 note. */
  def queryPandas(predicate: String, ieeeDivision: Boolean = false): Frame =
    copy(df = df.filter(expr(PandasExpr.toSparkSql(predicate, ieeeDivision))))

  /** `eval` in the pandas expression dialect: adds `name` = the evaluated
    * expression (reference rowwise_query/eval surface); `ieeeDivision` as
    * in [[queryPandas]]. */
  def evalPandas(name: String, expression: String, ieeeDivision: Boolean = false): Frame =
    copy(df = df.withColumn(name, expr(PandasExpr.toSparkSql(expression, ieeeDivision))))

  def withColumn(name: String, c: Column): Frame = copy(df = df.withColumn(name, c))

  /** Drop columns by label (reference QC:3326 — metadata-only there; a plain
    * projection here, equally metadata-only for Catalyst). */
  def drop(cols: String*): Frame = copy(
    df = df.drop(cols: _*),
    indexCols = indexCols.filterNot(cols.contains))

  def rename(mapping: (String, String)*): Frame = {
    val m = mapping.toMap
    copy(
      df = df.select(df.columns.map(c => col(c).as(m.getOrElse(c, c))).toIndexedSeq: _*),
      indexCols = indexCols.map(c => m.getOrElse(c, c)))
  }

  def addPrefix(p: String): Frame =
    rename(df.columns.filterNot(indexCols.contains).map(c => c -> s"$p$c").toIndexedSeq: _*)

  def addSuffix(s: String): Frame =
    rename(df.columns.filterNot(indexCols.contains).map(c => c -> s"$c$s").toIndexedSeq: _*)

  // ---------------------------------------------------------------------
  // MultiIndex levels (reference set_index/reset_index/swaplevel/
  // sort_index — dataframe.py:4310, base.py:2654, base.py:3297; the index
  // is carried as `indexCols` metadata, so level ops are metadata
  // reorders and only reset_index/sort_index touch the plan)
  // ---------------------------------------------------------------------

  /** pandas set_index(keys): the named columns become the row index
    * (2+ names → MultiIndex). */
  def setIndex(cols: String*): Frame = {
    cols.foreach(c => require(df.columns.contains(c), s"set_index: unknown column $c"))
    copy(indexCols = cols.toIndexedSeq)
  }

  /** pandas reset_index(): index levels return to ordinary columns,
    * placed leftmost in level order like pandas does. */
  def resetIndex(): Frame = copy(
    df = df.select((indexCols ++ df.columns.filterNot(indexCols.contains)).map(col): _*),
    indexCols = Nil)

  /** pandas swaplevel(i, j) — reorder two MultiIndex levels. Pure
    * metadata: no plan change until sort_index/reset_index observe it. */
  def swapLevel(i: Int = 0, j: Int = 1): Frame = {
    require(indexCols.size >= 2, "swaplevel: need a MultiIndex (2+ index levels)")
    require(i >= 0 && j >= 0 && i < indexCols.size && j < indexCols.size,
      s"swaplevel: levels ($i, $j) out of range for ${indexCols.size} levels")
    val arr = indexCols.toArray
    val t = arr(i); arr(i) = arr(j); arr(j) = t
    copy(indexCols = arr.toIndexedSeq)
  }

  /** pandas sort_index(): sort by the index levels left to right. */
  def sortIndex(ascending: Boolean = true): Frame = {
    require(indexCols.nonEmpty, "sort_index: no index levels set")
    sortValues(indexCols.map(c =>
      if (ascending) SortKey.asc(c) else SortKey.desc(c)).toIndexedSeq)
  }

  /** pandas truncate(before, after): keep rows whose (single-level) index
    * lies in the closed label range — a plain range filter, which Catalyst
    * pushes to the scan. pandas requires a sorted index only because its
    * implementation slices positionally; the semantics ARE the range
    * filter, so no sort is needed here. Pass null for an open end. */
  def truncate(before: Any = null, after: Any = null): Frame = {
    require(indexCols.size == 1, s"truncate: needs exactly one index level, have $indexCols")
    val ix = col(indexCols.head)
    val lo = Option(before).map(b => ix >= lit(b))
    val hi = Option(after).map(a => ix <= lit(a))
    (lo ++ hi).reduceOption(_ && _).map(p => copy(df = df.filter(p))).getOrElse(this)
  }

  /** pandas reorder_levels(order): permute ALL MultiIndex levels at once
    * (the n-ary generalization of [[swapLevel]]). Pure metadata. Accepts
    * level positions or names; must be a complete permutation. */
  def reorderLevels(order: Seq[Any]): Frame = {
    require(order.size == indexCols.size,
      s"reorder_levels: order has ${order.size} entries for ${indexCols.size} levels")
    val named = order.map {
      case i: Int => indexCols(i)
      case n: String =>
        require(indexCols.contains(n), s"reorder_levels: unknown level $n"); n
      case other => sys.error(s"reorder_levels: bad level spec $other")
    }
    require(named.distinct.size == indexCols.size, "reorder_levels: not a permutation")
    copy(indexCols = named.toIndexedSeq)
  }

  /** pandas rename_axis(mapper) on the index: rename the index LEVELS
    * (the columns backing them rename with the level, as reset_index
    * would surface them). */
  def renameAxis(names: String*): Frame = {
    require(names.size == indexCols.size,
      s"rename_axis: ${names.size} names for ${indexCols.size} levels")
    rename(indexCols.zip(names).filter { case (a, b) => a != b }: _*)
  }

  /** pandas xs(key, level): cross-section — the rows whose index level
    * equals `key`, with that level dropped from the result (pandas
    * drop_level=True default). A plain pushdown-able filter plus level
    * metadata removal. */
  def xs(key: Any, level: Int = 0): Frame = {
    require(level >= 0 && level < indexCols.size,
      s"xs: level $level out of range for ${indexCols.size} levels")
    val c = indexCols(level)
    copy(df = df.filter(col(c) === lit(key)).drop(c),
      indexCols = indexCols.patch(level, Nil, 1))
  }

  /** pandas select_dtypes(include=, exclude=): keep data columns whose
    * Spark type falls in the requested classes — "number", "integer",
    * "floating", "string"/"object", "boolean"/"bool", "datetime",
    * "binary". Index levels always survive (pandas keeps the index). */
  def selectDtypes(include: Seq[String] = Nil, exclude: Seq[String] = Nil): Frame = {
    import org.apache.spark.sql.types._
    require(include.nonEmpty || exclude.nonEmpty,
      "select_dtypes: at least one of include/exclude is required")
    def matches(dt: DataType, cls: String): Boolean = cls match {
      case "number" => dt.isInstanceOf[NumericType]
      case "integer" | "int" =>
        dt == ByteType || dt == ShortType || dt == IntegerType || dt == LongType
      case "floating" | "float" =>
        dt == DoubleType || dt == FloatType || dt.isInstanceOf[DecimalType]
      case "string" | "object" => dt == StringType
      case "boolean" | "bool" => dt == BooleanType
      case "datetime" => dt == TimestampType || dt == TimestampNTZType || dt == DateType
      case "binary" => dt == BinaryType
      case other => sys.error(s"select_dtypes: unknown type class $other")
    }
    val keep = df.schema.fields.filter { f =>
      indexCols.contains(f.name) ||
        ((include.isEmpty || include.exists(matches(f.dataType, _))) &&
          !exclude.exists(matches(f.dataType, _)))
    }.map(_.name)
    copy(df = df.select(keep.map(col): _*))
  }

  /** pandas `df.asof(where)` — the METHOD, not merge_asof: for each
    * query label, the most recent row whose (single-level) index is at
    * or before it, null columns when nothing precedes. Rides
    * [[graft.ops.Joins.asofGlobal]] (union + running-max prefix — one
    * range shuffle, no per-label scans), so `where` can itself be huge.
    * Deviation: among DUPLICATE index labels pandas keeps the
    * positionally last row; here the largest payload tuple wins
    * (deterministic without a position column — declared at the call). */
  def asofLabels(where: Seq[Any]): Frame = {
    require(indexCols.size == 1, s"asof: needs exactly one index level, have $indexCols")
    val ix = indexCols.head
    val payload = df.columns.filterNot(_ == ix).toIndexedSeq
    val ixType = df.schema(ix).dataType
    val spine = spark.createDataFrame(
      java.util.Arrays.asList(where.map(org.apache.spark.sql.Row(_)): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__where__", ixType))))
    copy(df = graft.ops.Joins.asofGlobal(spine, df, "__where__", ix,
      payload, tieBreak = lit(0L))
      .withColumnRenamed("__where__", ix),
      indexCols = Seq(ix))
  }

  /** pandas factorize(): integer codes in FIRST-APPEARANCE order under
    * the frame's declared ordering (cat_codes q86 is the lexical-order
    * sibling). Two-pass, cluster-shaped: materialize row order, take each
    * value's first position (one hash shuffle on the value), row-order
    * the (vocab-sized) firsts frame by that position — codes — and join
    * back on the value. Nulls get code -1 like pandas. */
  def factorize(c: String, as: String): Frame = {
    val ordered = graft.ops.RowOrder.withRowOrder(df, ordering)
    val firsts = ordered.filter(col(c).isNotNull)
      .groupBy(col(c)).agg(min(col(Frame.RowOrder)).as("__first__"))
    val coded = graft.ops.RowOrder.withRowOrder(
      firsts, Seq(SortKey.asc("__first__")))
      .select(col(c), col(Frame.RowOrder).as(as))
    copy(df = ordered.join(coded, Seq(c), "left")
      .withColumn(as, coalesce(col(as), lit(-1L)))
      .drop(Frame.RowOrder)
      .select((df.columns :+ as).map(col): _*)) // join put the key first
  }

  /** pandas sort_index(axis=1): reorder columns by label. A pure
    * projection — metadata-only for Catalyst, exactly like the
    * reference's columnar reindex — but semantically observable through
    * any order-sensitive consumer (to_records, concat_ws signatures,
    * positional iloc), which is what the oracle query checks. */
  def sortIndexAxis1(ascending: Boolean = true): Frame = {
    val sorted = df.columns.sorted.toIndexedSeq
    val names = if (ascending) sorted else sorted.reverse
    copy(df = df.select(names.map(col): _*))
  }

  /** pandas squeeze(axis=1): a one-data-column frame collapses to its
    * Series analog — here a single-column Frame with the index dropped
    * from the column set; frames with more columns return unchanged,
    * like pandas. */
  def squeeze(): Frame = {
    val dataCols = df.columns.filterNot(indexCols.contains)
    if (dataCols.length == 1) Frame(df.select(col(dataCols.head)))
    else this
  }

  /** pandas groupby(level=...): group by index levels by position. */
  def groupbyLevel(levels: Int*): GroupBy = {
    levels.foreach(l => require(l >= 0 && l < indexCols.size,
      s"groupby(level=$l): index has ${indexCols.size} levels"))
    new GroupBy(this, levels.map(indexCols).toIndexedSeq)
  }

  /** pandas `to_numeric(errors=)`: 'coerce' nulls unparseable input
    * (try_cast); 'raise' is the ANSI cast (Spark 4 ANSI mode throws on
    * bad input — the same contract as pandas raise). */
  def toNumeric(c: String, as: String, errors: String = "raise"): Frame = {
    require(errors == "raise" || errors == "coerce",
      s"toNumeric: errors must be 'raise' or 'coerce' ('ignore' is unsupported): $errors")
    withColumn(as,
      if (errors == "coerce") expr(s"try_cast(`$c` as double)")
      else col(c).cast("double"))
  }

  /** pandas `to_datetime(format=, errors=)` — same coerce/raise split;
    * result is session-zone-free (timestamp_ntz) so round-trips are
    * wall-clock stable. */
  def toDatetime(c: String, as: String, fmt: String, errors: String = "raise"): Frame = {
    require(errors == "raise" || errors == "coerce",
      s"toDatetime: errors must be 'raise' or 'coerce' ('ignore' is unsupported): $errors")
    withColumn(as,
      (if (errors == "coerce") try_to_timestamp(col(c), lit(fmt))
       else to_timestamp(col(c), fmt)).cast("timestamp_ntz"))
  }

  /** Cast columns (reference astype, QC:2335; frame astype dataframe.py:1707). */
  def astype(casts: (String, String)*): Frame = {
    val m = casts.toMap
    copy(df = df.select(df.columns.map { c =>
      m.get(c).map(t => col(c).cast(t).as(c)).getOrElse(col(c))
    }.toIndexedSeq: _*))
  }

  /** pandas clip (reference QC:2438) — `greatest(least(c, hi), lo)`,
    * with missing kept missing: Spark's least/greatest SKIP nulls (and
    * sort NaN above every double), so an unguarded clip would turn each
    * null/NaN into the cap value. */
  def clip(column: String, lo: Double, hi: Double): Frame = {
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    val missing = df.schema(column).dataType match {
      case DoubleType | FloatType => col(column).isNull || isnan(col(column))
      case _ => col(column).isNull
    }
    withColumn(column,
      when(!missing, greatest(least(col(column), lit(hi)), lit(lo))))
  }

  /** pandas where: keep values where cond holds, else replacement
    * (reference QC:626). Note pandas `where` keeps-if-true. */
  def whereCol(column: String, cond: Column, other: Column): Frame =
    withColumn(column, when(cond, col(column)).otherwise(other))

  /** pandas mask: replace values where cond holds (reference base QC:2069). */
  def maskCol(column: String, cond: Column, other: Column): Frame =
    withColumn(column, when(cond, other).otherwise(col(column)))

  /** Membership test (reference isin QC:2009 — values broadcast). */
  def isin(column: String, values: Seq[Any]): Frame =
    withColumn(s"${column}_isin", col(column).isin(values: _*))

  /** Deterministic content-hash sampling (pandas `sample(frac,
    * random_state)` re-expressed for pipelines): keep a row iff
    * md5(salt + key) falls below the `frac` quantile of the hash space —
    * an 8-hex-digit threshold compared lexicographically, which is
    * uniform over lowercase hex strings. Unlike RNG sampling this is
    * reproducible across engines, runs, partitionings, and cluster
    * sizes, and the SAME row lands in the same split every time — the
    * property a train/test split of a 100 TB corpus actually needs.
    * Pure codegen'd expressions, zero shuffle. */
  def sampleByHash(keyCol: String, frac: Double, salt: String = ""): Frame = {
    require(frac >= 0.0 && frac <= 1.0, s"frac must be in [0,1]: $frac")
    copy(df = df.filter(Frame.hashBucket(col(keyCol), salt) < Frame.hexThreshold(frac)))
  }

  /** Complement split: rows NOT selected by [[sampleByHash]] with the
    * same arguments — together they partition the frame exactly. Rows
    * with a NULL key hash to NULL and can match neither comparison, so
    * they are routed HERE (the not-sampled side) rather than silently
    * vanishing from both splits. */
  def sampleByHashComplement(keyCol: String, frac: Double, salt: String = ""): Frame = {
    require(frac >= 0.0 && frac <= 1.0, s"frac must be in [0,1]: $frac")
    copy(df = df.filter(
      !coalesce(Frame.hashBucket(col(keyCol), salt) < Frame.hexThreshold(frac), lit(false))))
  }

  /** sklearn-style `train_test_split(test_size=)` (reference
    * modin/experimental/sklearn/model_selection/train_test_split.py:18):
    * the (train, test) pair of deterministic content-hash splits —
    * disjoint, exhaustive, reproducible across engines and cluster
    * sizes. Null-key rows land in train (see
    * [[sampleByHashComplement]]), never silently vanish. */
  def trainTestSplit(keyCol: String, testSize: Double, salt: String = ""): (Frame, Frame) =
    (sampleByHashComplement(keyCol, testSize, salt), sampleByHash(keyCol, testSize, salt))

  /** pandas `sample(n=...)`: EXACTLY n rows, deterministic for a given
    * salt, engine-portable (the same md5 order any engine reproduces).
    * Ordering by the content hash and taking n plans as TakeOrdered —
    * per-partition top-n then a driver-side merge of n candidates per
    * partition, never a global sort. NULL keys sort after every hash
    * (hash NULL → orders last), so they are picked only when fewer than
    * n hashable rows exist. */
  def sampleN(keyCol: String, n: Int, salt: String = ""): Frame = {
    require(n >= 0, s"n must be >= 0: $n")
    copy(df = df
      .orderBy(Frame.hashBucket(col(keyCol), salt).asc_nulls_last, col(keyCol).asc)
      .limit(n))
  }

  /** Stratified deterministic sampling: a different keep-fraction per
    * value of `stratCol` (corpus balancing — e.g. keep 10% of English
    * but 100% of a low-resource language). Same content-hash mechanics
    * as [[sampleByHash]]; strata absent from `fracs` keep
    * `defaultFrac`. The threshold is a per-row when-chain over a handful
    * of literals — no join, no shuffle, still one codegen'd filter. */
  def sampleByHashStratified(keyCol: String, stratCol: String,
      fracs: Map[String, Double], defaultFrac: Double = 0.0,
      salt: String = ""): Frame =
    copy(df = df.filter(
      Frame.stratifiedKeep(keyCol, stratCol, fracs, defaultFrac, salt)))

  /** Rows NOT kept by [[sampleByHashStratified]] with the same
    * arguments — exact partition, with NULL-key rows routed here (same
    * contract as [[sampleByHashComplement]]: an unhashable key is never
    * silently lost, it is just not sampled). */
  def sampleByHashStratifiedComplement(keyCol: String, stratCol: String,
      fracs: Map[String, Double], defaultFrac: Double = 0.0,
      salt: String = ""): Frame =
    copy(df = df.filter(
      !coalesce(Frame.stratifiedKeep(keyCol, stratCol, fracs, defaultFrac, salt), lit(false))))

  /** pandas `sample(n=, weights=)` as a DETERMINISTIC weighted reservoir
    * (Efraimidis–Spirakis A-ES): each row draws u uniform in (0,1) from
    * its content hash and scores ln(u)/w — the top n scores are exactly
    * an n-sample without replacement with inclusion probability
    * proportional to weight. The hash-derived u makes the draw
    * reproducible across engines, runs, and cluster sizes (the same
    * md5 arithmetic runs verbatim in the DuckDB oracle), and the plan is
    * TakeOrdered: per-partition top-n then a driver merge of
    * n·partitions candidates — no global sort, no RNG state.
    *
    * pandas semantics carried over: rows with NULL or non-positive
    * weight are never selected (pandas excludes zero-weight rows and
    * raises on negatives; the distributed analog filters both — a raise
    * would make a 100 TB sample abort on one bad row).
    *
    * The score is scaled by 10^6 and ROUNDED to 6 decimals before
    * ranking (ties then break on the key column): `ln` is the one
    * non-algebraic step, and libm implementations may differ by an ulp —
    * unrounded, a 1-ulp drift at the top-n cutoff could select a
    * different row on a different engine. At the score's 10^0–10^5
    * magnitude the 10^-6 quantum is ~10 orders above ulp noise and ~10
    * below the score spread: cross-engine stable, statistically
    * indistinguishable from exact A-ES. */
  def sampleWeighted(keyCol: String, weightCol: String, n: Int,
      salt: String = ""): Frame = {
    require(n >= 0, s"n must be >= 0: $n")
    val esScore = round(
      log(Frame.hashUnit(col(keyCol), salt)) * lit(1000000.0) / col(weightCol), 6)
    copy(df = df
      .filter(col(weightCol) > 0)
      .orderBy(esScore.desc, col(keyCol).asc)
      .limit(n))
  }

  // ---------------------------------------------------------------------
  // §2.11 missing data
  // ---------------------------------------------------------------------

  /** reference dropna QC:3249 → Spark na.drop. */
  def dropna(how: String = "any", subset: Seq[String] = Nil, thresh: Option[Int] = None): Frame = {
    val cols = if (subset.isEmpty) df.columns.toIndexedSeq else subset
    val d = thresh match {
      case Some(t) => df.na.drop(t, cols)
      case None    => df.na.drop(how, cols)
    }
    copy(df = d)
  }

  /** reference fillna QC:2710 (scalar / per-column dict). */
  def fillna(value: Any, subset: Seq[String] = Nil): Frame = {
    val cols = if (subset.isEmpty) df.columns.toIndexedSeq else subset
    val d = value match {
      case v: Double => df.na.fill(v, cols)
      case v: Long   => df.na.fill(v, cols)
      case v: Int    => df.na.fill(v.toLong, cols)
      case v: String => df.na.fill(v, cols)
      case v: Boolean => df.na.fill(v, cols)
      case other => sys.error(s"fillna: unsupported $other")
    }
    copy(df = d)
  }

  def fillnaMap(values: Map[String, Any]): Frame = copy(df = df.na.fill(values))

  /** Forward-fill within key groups ordered by `order` (reference fillna
    * method='ffill', QC:2710-2812 — a Fold across partitions there; a
    * last-ignoreNulls running window here, which Spark evaluates with a
    * single shuffle on the partition keys — scalable, no global order). */
  def ffill(column: String, partitionBy: Seq[String], order: Seq[SortKey]): Frame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partitionBy.map(col): _*)
      .orderBy(order.map(_.toColumn): _*)
      .rowsBetween(Long.MinValue, 0)
    withColumn(column, last(col(column), ignoreNulls = true).over(w))
  }

  def bfill(column: String, partitionBy: Seq[String], order: Seq[SortKey]): Frame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partitionBy.map(col): _*)
      .orderBy(order.map(_.toColumn): _*)
      .rowsBetween(0, Long.MaxValue)
    withColumn(column, first(col(column), ignoreNulls = true).over(w))
  }

  /** Value replacement (reference replace QC:2107, dict mode). */
  def replaceValues(column: String, mapping: Map[Any, Any]): Frame = {
    val c = mapping.foldLeft(col(column)) { case (acc, (from, to)) =>
      when(col(column) === lit(from), lit(to)).otherwise(acc)
    }
    withColumn(column, c)
  }

  // ---------------------------------------------------------------------
  // §2.7 sorts / limits / top-k
  // ---------------------------------------------------------------------

  /** Global sort (reference sort_rows_by_column_values QC:4773 — a
    * sample→pivot→range-shuffle TeraSort; Spark's orderBy is the identical
    * algorithm via RangePartitioner, so we just declare it). */
  def sortValues(by: Seq[SortKey]): Frame =
    copy(df = df.orderBy(by.map(_.toColumn): _*), ordering = by)

  def sortValues(c: String, ascending: Boolean = true): Frame =
    sortValues(Seq(SortKey(col(c), ascending)))

  /** head(n): re-asserts the declared ordering first — an exchange
    * between sortValues and head (dropDuplicates' window, a join) would
    * otherwise leave limit() taking n ARBITRARY rows. Sort+Limit plans as
    * TakeOrdered (per-partition top-n + driver merge, no global
    * shuffle), and EliminateSorts drops the sort when the child is
    * already ordered. */
  def head(n: Int): Frame = copy(df =
    (if (ordering.nonEmpty) df.orderBy(ordering.map(_.toColumn): _*) else df)
      .limit(n))

  /** tail(n) without collecting: reverse the declared ordering, take n,
    * restore order. Two TakeOrdered passes, still no global shuffle. */
  def tail(n: Int): Frame = {
    require(ordering.nonEmpty, "tail requires a declared ordering")
    copy(df = df
      .orderBy(ordering.map(_.reversed.toColumn): _*)
      .limit(n)
      .orderBy(ordering.map(_.toColumn): _*))
  }

  /** Top-k by one column (reference nlargest QC:2653) — TakeOrdered. */
  def nlargest(n: Int, c: String): Frame =
    sortValues(Seq(SortKey(col(c), asc = false))).head(n)

  def nsmallest(n: Int, c: String): Frame =
    sortValues(Seq(SortKey(col(c), asc = true))).head(n)

  // ---------------------------------------------------------------------
  // §2.3 joins   (details in graft.ops.Joins)
  // ---------------------------------------------------------------------

  /** pandas merge on columns (reference storage_formats/pandas/merge.py:104-252
    * broadcast path, :39-101 range-partitioning path). Spark's planner (plus
    * AQE at runtime) chooses broadcast vs sort-merge from statistics, which
    * subsumes both reference strategies; `broadcastRight` forces the hint for
    * dimension tables known small.
    *
    * `indicator` (pandas `indicator=`) adds a column of
    * both/left_only/right_only derived from non-null presence markers
    * attached to each side before the join — a projection, no extra
    * shuffle. `validate` (pandas `validate=`: "1:1" | "1:m" | "m:1" |
    * "m:m") asserts key uniqueness on the constrained side(s) before
    * joining — eager (it runs a count job per checked side), exactly like
    * pandas' eager MergeError. */
  def merge(
      right: Frame,
      on: Seq[String],
      how: String = "inner",
      broadcastRight: Boolean = false,
      indicator: Option[String] = None,
      validate: Option[String] = None): Frame = {
    validate.foreach(graft.ops.Joins.validateMerge(df, right.df, on, _))
    indicator match {
      case None =>
        val r = if (broadcastRight) broadcast(right.df) else right.df
        copy(df = df.join(r, on, how))
      case Some(name) =>
        val lf = df.withColumn("__l_present__", lit(1))
        val rf0 = right.df.withColumn("__r_present__", lit(1))
        val rf = if (broadcastRight) broadcast(rf0) else rf0
        val ind = when(col("__l_present__").isNotNull && col("__r_present__").isNotNull, "both")
          .when(col("__l_present__").isNotNull, "left_only")
          .otherwise("right_only")
        copy(df = lf.join(rf, on, how)
          .withColumn(name, ind)
          .drop("__l_present__", "__r_present__"))
    }
  }

  /** pandas merge(left_on=, right_on=) — differently-named keys; also
    * accepts a join-strategy hint ("broadcast" | "merge" | "shuffle_hash")
    * to pin the physical join when statistics would mislead. */
  def mergeOn(
      right: Frame,
      leftOn: Seq[String],
      rightOn: Seq[String],
      how: String = "inner",
      hint: Option[String] = None): Frame = {
    val r = hint.map(right.df.hint(_)).getOrElse(right.df)
    val cond = leftOn.zip(rightOn)
      .map { case (l, rc) => df(l) === r(rc) }
      .reduce(_ && _)
    copy(df = df.join(r, cond, how))
  }

  def semiJoin(right: Frame, on: Seq[String]): Frame =
    copy(df = df.join(right.df, on, "left_semi"))

  def antiJoin(right: Frame, on: Seq[String]): Frame =
    copy(df = df.join(right.df, on, "left_anti"))

  /** §2.8/§2.3 concat axis=0 (reference concat QC:482 — stacks partition
    * grids; unionByName here, a zero-shuffle plan node). */
  def concat(other: Frame): Frame =
    copy(df = df.unionByName(other.df, allowMissingColumns = true))

  // ---------------------------------------------------------------------
  // §2.4 duplicates
  // ---------------------------------------------------------------------

  /** drop_duplicates under a deterministic order (reference QC:2231 —
    * range-partition shuffle keep-first; here one hash shuffle on the
    * subset keys + per-group rank — same physics, AQE-skew-aware).
    * `keep` ∈ first | last | none (pandas keep=False: drop every member
    * of any duplicated group). last = first under the reversed order;
    * none = per-group count filter, no ordered window at all. */
  def dropDuplicates(subset: Seq[String], firstBy: Seq[SortKey],
      keep: String = "first"): Frame = keep match {
    case "first" | "last" =>
      val order = if (keep == "first") firstBy else firstBy.map(_.reversed)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(subset.map(col): _*)
        .orderBy(order.map(_.toColumn): _*)
      copy(df = df
        .withColumn(RowNum, row_number().over(w))
        .filter(col(RowNum) === 1)
        .drop(RowNum))
    case "none" =>
      val w = org.apache.spark.sql.expressions.Window.partitionBy(subset.map(col): _*)
      copy(df = df
        .withColumn(RowNum, count(lit(1)).over(w))
        .filter(col(RowNum) === 1)
        .drop(RowNum))
    case other => sys.error(s"dropDuplicates keep must be first|last|none: $other")
  }

  /** duplicated flag (reference QC:3346); same `keep` contract as
    * [[dropDuplicates]] — keep='none' marks every member of a
    * duplicated group. */
  def duplicated(subset: Seq[String], firstBy: Seq[SortKey],
      keep: String = "first"): Frame = keep match {
    case "first" | "last" =>
      val order = if (keep == "first") firstBy else firstBy.map(_.reversed)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(subset.map(col): _*)
        .orderBy(order.map(_.toColumn): _*)
      copy(df = df.withColumn("duplicated", row_number().over(w) > 1))
    case "none" =>
      val w = org.apache.spark.sql.expressions.Window.partitionBy(subset.map(col): _*)
      copy(df = df.withColumn("duplicated", count(lit(1)).over(w) > 1))
    case other => sys.error(s"duplicated keep must be first|last|none: $other")
  }

  /** value_counts (reference modin/pandas/general.py:398 — groupby size +
    * sort). Deterministic tie-break on the value itself. `normalize`
    * divides by the total via a window over the AGGREGATED output
    * (|distinct| rows — the single-partition exchange there is on group
    * counts, never the corpus). `dropna=false` keeps the null bucket
    * (pandas default drops it). `ascending` flips the count order. */
  def valueCounts(c: String, normalize: Boolean = false,
      dropna: Boolean = true, ascending: Boolean = false): Frame = {
    val base = (if (dropna) df.filter(col(c).isNotNull) else df)
      .groupBy(c).agg(count(lit(1)).as("count"))
    val valued =
      if (!normalize) base
      else base.withColumn("proportion",
        col("count") / sum(col("count")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
    Frame(valued.orderBy(
      (if (ascending) col("count").asc else col("count").desc), col(c).asc))
  }

  /** value_counts' frequent tail at corpus scale: every value whose
    * count ≥ φ·n, with its EXACT count ([[graft.ops.Sketch.heavyHitters]]
    * — per-partition Misra–Gries candidates + broadcast semi-join
    * verify; no cardinality-sized shuffle, unlike [[valueCounts]]). φ is
    * quantized to a rational over 10⁶ so the threshold compare stays
    * exact integer arithmetic; output is (value, cnt) sorted count-desc
    * with the value as deterministic tie-break. */
  def heavyHitters(c: String, phi: Double): Frame = {
    require(phi > 0 && phi < 1, s"heavyHitters needs 0 < phi < 1: $phi")
    val num = math.max(1L, math.round(phi * 1000000L))
    Frame(graft.ops.Sketch.heavyHitters(df, c, num, 1000000L)
      .orderBy(col("cnt").desc, col(c).asc))
  }

  /** `df.quantile(qs)` on the bounded-memory quantized-histogram path
    * ([[graft.ops.Sketch.quantileQuantized]]): values round to integer
    * units of 10^−scale, the aggregate state is the value-span-bounded
    * histogram (never the data), and the deterministic error is half a
    * unit. Each q is quantized to a rational over 10⁶ so the pandas
    * linear-interpolation rank math stays exact-integer. Output: one
    * (q, value) row per requested quantile. */
  def quantileApprox(c: String, qs: Seq[Double], scale: Int): Frame = {
    val rs = qs.map(q => (math.round(q * 1000000L), 1000000L))
    // keep the pandas-facing (q, value) shape; the exact q_num/q_den
    // rational is an ops-layer contract for integer-safe pivots
    Frame(graft.ops.Sketch.quantileQuantized(df, c, rs, scale)
      .drop("q_num", "q_den"))
  }

  /** numpy 2.0 `quantile(weights=…, method='inverted_cdf')` on the
    * bounded-state path ([[graft.ops.Sketch.weightedQuantileQuantized]]):
    * token/byte-weighted percentile cuts with exact integer cumulative
    * weights — rows with null or non-positive weight drop. */
  def weightedQuantileApprox(c: String, weightCol: String, qs: Seq[Double],
      scale: Int): Frame = {
    val rs = qs.map(q => (math.round(q * 1000000L), 1000000L))
    Frame(graft.ops.Sketch.weightedQuantileQuantized(df, c, weightCol, rs, scale)
      .drop("q_num", "q_den"))
  }

  /** `df[col].describe()` on the bounded-state path
    * ([[graft.ops.Sketch.describeQuantized]]): exact integer moments for
    * count/mean/std, exact min/max, histogram-sketch quartiles — two
    * data passes, every exchange bounded, long-form (stat, value)
    * output. `scale` = decimal digits kept (negative = coarser than
    * integer units). */
  def describeApprox(c: String, scale: Int): Frame =
    Frame(graft.ops.Sketch.describeQuantized(df, c, scale))

  /** pandas `df.rolling(window, min_periods)` over the frame's declared
    * ordering — the fluent face of [[graft.ops.RollingBlocks]] (global
    * bounded windows at full parallelism, no single-partition sort).
    * Requires a declared ordering, like [[tail]]. */
  def rolling(window: Int, minPeriods: Option[Int] = None): Rolling = {
    require(ordering.nonEmpty, "rolling requires a declared ordering (sortValues first)")
    Rolling(this, window, minPeriods)
  }

  /** pandas `df.expanding(min_periods)` over the frame's declared
    * ordering — composes the two-phase parallel prefix ([[Expanding]]). */
  def expanding(minPeriods: Int = 1): Expanding = {
    require(ordering.nonEmpty, "expanding requires a declared ordering (sortValues first)")
    Expanding(this, minPeriods)
  }

  /** first_valid_index / last_valid_index (reference base QC — pandas
    * scans the index for the first/last row with any valid value; here
    * per requested column in ONE aggregate over the order column:
    * first = min(order where col non-null), last = max. A single
    * partial+final agg pair — no sort, no window, no collect of data
    * rows. Returns one row with `<col>_first` / `<col>_last` per column
    * (null when the column is all-null). */
  def validIndexBounds(orderCol: String, cols: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(cols.nonEmpty, "validIndexBounds needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(min(when(col(c).isNotNull, col(orderCol))).as(s"${c}_first"),
        max(when(col(c).isNotNull, col(orderCol))).as(s"${c}_last"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** pandas `Series.hasnans`: does the column hold any null/NaN? One
    * distributed aggregate (max over a 0/1 flag — map-side combined,
    * scan short-circuits nothing but carries 8 bytes per partition). */
  def hasnans(column: String): Boolean = {
    val flag = col(column).isNull ||
      (df.schema(column).dataType match {
        case org.apache.spark.sql.types.DoubleType |
             org.apache.spark.sql.types.FloatType => isnan(col(column))
        case _ => lit(false)
      })
    df.agg(max(when(flag, 1).otherwise(0)).as("f"))
      .head().getInt(0) == 1
  }

  /** pandas `Series.is_unique`: no value occurs twice. Pandas counts
    * each NaN as a distinct value (is_unique is True for [NaN, NaN] only
    * in older pandas; 2.x treats repeated NaN as non-unique) — here the
    * 2.x rule: nulls count like any value. One aggregate: total rows vs
    * distinct values (+1 if any null, since count_distinct skips them). */
  def isUnique(column: String): Boolean = {
    val r = df.agg(
      count(lit(1)).as("n"),
      countDistinct(col(column)).as("d"),
      max(when(col(column).isNull, 1).otherwise(0)).as("hasNull"),
      sum(when(col(column).isNull, 1L).otherwise(0L)).as("nulls")).head()
    val (n, d, nulls) = (r.getLong(0), r.getLong(1), r.getLong(3))
    if (nulls > 1) false else n == d + nulls
  }

  /** pandas `df.nunique(axis=0)` as a long-form (column, nunique) frame,
    * nulls excluded (dropna=True). `approx <= 0` is exact: ONE aggregate
    * row of countDistinct per column (Spark expands multi-distinct into
    * one pass), melted to long form. `approx = k` switches to the
    * bottom-k KMV sketch ([[graft.ops.Sketch]]): the table melts once to
    * (column, 60-bit hash) pairs and a single bounded aggregate keeps the
    * k smallest hashes per column — the exchange is ≤ k longs per column
    * per task REGARDLESS of cardinality, where exact countDistinct must
    * shuffle every distinct value. The estimate is EXACT (the sketch
    * holds every hash) whenever a column's true NDV is below k. */
  def nunique(cols: Seq[String], approx: Int = 0): Frame =
    if (approx <= 0) {
      val aggs = cols.map(c => countDistinct(col(c)).as(c))
      Frame(df.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(cols.map(c =>
          struct(lit(c).as("column"), col(c).cast("double").as("nunique"))): _*)).as("p"))
        .select(col("p.column").as("column"), col("p.nunique").as("nunique")))
    } else {
      import graft.ops.Sketch
      val pairs = df
        .select(explode(array(cols.map(c =>
          struct(lit(c).as("column"), Sketch.hash60(col(c)).as("h"))): _*)).as("p"))
        .select(col("p.column").as("column"), col("p.h").as("__h60"))
        .filter(col("__h60").isNotNull)
      Frame(pairs.groupBy(col("column"))
        .agg(Sketch.estimate(Sketch.bottomKAgg(col("__h60"), approx), approx)
          .as("nunique")))
    }

  /** memory_usage (reference base QC / DataFrame.memory_usage — pandas
    * reports per-block nbytes). There is no block model here, so the
    * documented analog is the Tungsten UnsafeRow footprint per column:
    * fixed-width types cost their width × rows, var-width types cost
    * their summed byte length plus an 8-byte offset-and-length word per
    * row (nulls cost only the word). One distributed aggregate — a
    * single job, no collect of data rows; deep=False has no meaning
    * (the JVM engine has no object-dtype indirection to skip). */
  def memoryUsage(): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    val aggs = df.schema.fields.map { f =>
      val fixed: Option[Int] = f.dataType match {
        case BooleanType | ByteType => Some(1)
        case ShortType => Some(2)
        case IntegerType | FloatType | DateType => Some(4)
        case LongType | DoubleType | TimestampType | TimestampNTZType => Some(8)
        case _ => None
      }
      fixed match {
        case Some(w) => sum(lit(w)).cast("long").as(f.name)
        case None =>
          // octet_length covers string/binary; everything else (arrays,
          // structs, decimals) is measured through its serialized json —
          // an upper-bound proxy, documented as estimate
          val bytes = f.dataType match {
            case StringType | BinaryType => octet_length(col(f.name))
            case _ => octet_length(to_json(struct(col(f.name))))
          }
          sum(coalesce(bytes.cast("long"), lit(0L)) + lit(8L)).as(f.name)
      }
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot to the pandas shape: one row per column, (column, bytes)
    val first = wide.collect()(0) // one row of n_cols longs — driver-safe
    val out = df.schema.fields.zipWithIndex.map { case (f, i) =>
      (f.name, if (first.isNullAt(i)) 0L else first.getLong(i))
    }
    df.sparkSession.createDataFrame(out.toIndexedSeq).toDF("column", "bytes")
  }

  // ---------------------------------------------------------------------
  // axis=1 (row-wise) reductions and transforms (reference base QC axis=1
  // paths — pandas folds across the block grid; here each is ONE pure
  // projection over an array of the row's values: zero shuffles, stays in
  // whole-stage codegen at any row count).
  // ---------------------------------------------------------------------

  // Frame.filter (the row filter) shadows functions.filter inside this
  // class — alias the array higher-order function.
  private def arrFilter(a: Column, f: Column => Column): Column =
    org.apache.spark.sql.functions.filter(a, f)

  private def rowArr(cols: Seq[String]): Column =
    array(cols.map(c => col(c).cast("double")): _*)

  /** pandas `df[cols].sum(axis=1)` — skipna: nulls drop out; an all-null
    * row sums to 0.0 (the pandas contract). */
  def sumAxis1(cols: Seq[String], as: String): Frame = withColumn(as,
    aggregate(arrFilter(rowArr(cols), _.isNotNull), lit(0.0), (acc, x) => acc + x))

  /** pandas `df[cols].mean(axis=1)` — skipna; all-null row → null (NaN). */
  def meanAxis1(cols: Seq[String], as: String): Frame = {
    val valid = arrFilter(rowArr(cols), _.isNotNull)
    withColumn(as, when(size(valid) > 0,
      aggregate(valid, lit(0.0), (acc, x) => acc + x) / size(valid)))
  }

  /** pandas aligned binary arithmetic with `fill_value` (`a.add(b,
    * fill_value=0)`): after the index alignment join, a side missing in
    * one frame takes the fill; only both-missing stays null (the pandas
    * rule). Pure projection over the join — `op` ∈ add|sub|mul|div. */
  def binopFill(aCol: String, bCol: String, as: String, op: String,
      fillValue: Double): Frame = {
    val a = col(aCol).cast("double")
    val b = col(bCol).cast("double")
    val af = coalesce(a, lit(fillValue))
    val bf = coalesce(b, lit(fillValue))
    val combined = op match {
      case "add" => af + bf
      case "sub" => af - bf
      case "mul" => af * bf
      // pandas a.div(b, fill_value=0) follows IEEE on zero divisors —
      // Frame.ieeeDiv (its scaladoc has the ANSI story); operands are
      // coalesced non-null here so its null branch is inert
      case "div" => Frame.ieeeDiv(af, bf)
      // numpy/pandas floor division: floor(a/b); b=0 follows the IEEE
      // div above (floor(±Inf) = ±Inf, floor(NaN) = NaN)
      case "floordiv" => Frame.floorDouble(Frame.ieeeDiv(af, bf))
      // numpy mod: a - floor(a/b)·b — the result carries the DIVISOR's
      // sign (unlike SQL/Java %); mod by zero is NaN like numpy
      case "mod" =>
        when(bf =!= 0.0, af - Frame.floorDouble(af / bf) * bf)
          .otherwise(lit(Double.NaN))
      case "pow" => pow(af, bf)
      case other => sys.error(s"binopFill: unsupported op $other")
    }
    withColumn(as, when(a.isNull && b.isNull, lit(null)).otherwise(combined))
  }

  /** The pandas reversed-operand family (`rsub`, `rdiv`, `rfloordiv`,
    * `rmod`, `rpow`, …) is the operand swap of [[binopFill]]; exposed
    * explicitly so call sites read like the pandas they mirror. */
  def rbinopFill(aCol: String, bCol: String, as: String, op: String,
      fillValue: Double): Frame = binopFill(bCol, aCol, as, op, fillValue)

  /** pandas `df.prod(axis=1)` — skipna; an all-null row is 1.0 (the
    * pandas empty-product contract). */
  def prodAxis1(cols: Seq[String], as: String): Frame = withColumn(as,
    aggregate(arrFilter(rowArr(cols), _.isNotNull), lit(1.0), (acc, x) => acc * x))

  /** pandas `df.var(axis=1, ddof=1)` / `std(axis=1)` — sample variance
    * across the row's non-null values; null when fewer than two. */
  def varAxis1(cols: Seq[String], as: String): Frame = {
    val valid = arrFilter(rowArr(cols), _.isNotNull)
    val n = size(valid).cast("double")
    val mean = aggregate(valid, lit(0.0), (acc, x) => acc + x) / n
    val ss = aggregate(valid, lit(0.0), (acc, x) => acc + (x - mean) * (x - mean))
    withColumn(as, when(n >= 2, ss / (n - 1.0)))
  }

  def stdAxis1(cols: Seq[String], as: String): Frame = {
    val tmp = s"__std1_${as}__"
    val f = varAxis1(cols, tmp)
    f.withColumn(as, sqrt(col(tmp))).drop(tmp)
  }

  /** pandas `df.cumsum(axis=1)`: left-to-right running sum; a null cell
    * stays null but does not break the carry (pandas skipna). Adds one
    * `<col><suffix>` output per input column. */
  def cumsumAxis1(cols: Seq[String], suffix: String = "_cs"): Frame = {
    val f = cols.indices.foldLeft(this) { case (fr, i) =>
      val prefix = cols.take(i + 1)
      fr.withColumn(cols(i) + suffix, when(col(cols(i)).isNotNull,
        aggregate(arrFilter(rowArr(prefix), _.isNotNull), lit(0.0), (acc, x) => acc + x)))
    }
    f
  }

  /** pandas `df.diff(axis=1)`: col minus the previous col; the first
    * column is all null. */
  def diffAxis1(cols: Seq[String], suffix: String = "_d"): Frame =
    cols.indices.foldLeft(this) { case (fr, i) =>
      fr.withColumn(cols(i) + suffix,
        if (i == 0) lit(null).cast("double")
        else col(cols(i)).cast("double") - col(cols(i - 1)).cast("double"))
    }

  /** pandas `df[cols].count(axis=1)`: valid (non-null) values per row. */
  def countAxis1(cols: Seq[String], as: String): Frame =
    withColumn(as, size(arrFilter(rowArr(cols), _.isNotNull)).cast("long"))

  /** pandas `df.nunique(axis=1)`: distinct non-null values per row. */
  def nuniqueAxis1(cols: Seq[String], as: String): Frame =
    withColumn(as,
      size(array_distinct(arrFilter(rowArr(cols), _.isNotNull))).cast("long"))

  /** pandas `df.any(axis=1)` / `df.all(axis=1)` with skipna: nonzero is
    * truthy, null cells are skipped (an all-null row is any=false,
    * all=true — the pandas empty-reduction contract). */
  def anyAxis1(cols: Seq[String], as: String): Frame =
    withColumn(as, exists(rowArr(cols), x => x.isNotNull && x =!= 0.0))

  def allAxis1(cols: Seq[String], as: String): Frame =
    withColumn(as, forall(rowArr(cols), x => x.isNull || x =!= 0.0))

  /** pandas `Series.str.get_dummies(sep)` with EXPLICIT categories (the
    * q80 discipline — no distinct-scan job; the caller names the label
    * set). One indicator column per category, pure projection. */
  def strGetDummies(c: String, sep: String, categories: Seq[String],
      prefix: String = ""): Frame =
    categories.foldLeft(this) { case (fr, cat) =>
      // a null input row is an ALL-ZEROS indicator row (pandas
      // str.get_dummies NaN contract), not a null
      fr.withColumn(s"$prefix$cat",
        coalesce(
          array_contains(split(col(c), java.util.regex.Pattern.quote(sep)), cat)
            .cast("int"),
          lit(0)))
    }

  /** pandas `df.rank(axis=1, method='average')`: rank of each cell among
    * the row's non-null values — (#smaller) + (#equal + 1)/2; null cells
    * rank null. */
  def rankAxis1(cols: Seq[String], suffix: String = "_rk"): Frame = {
    val arr = rowArr(cols)
    cols.indices.foldLeft(this) { case (fr, i) =>
      val v = col(cols(i)).cast("double")
      fr.withColumn(cols(i) + suffix, when(v.isNotNull,
        size(arrFilter(arr, x => x.isNotNull && x < v)) +
          (size(arrFilter(arr, x => x.isNotNull && x === v)) + 1) / 2.0))
    }
  }

  // ---------------------------------------------------------------------
  // groupby entry point (§2.5) — see graft.api.GroupBy
  // ---------------------------------------------------------------------

  def groupby(keys: String*): GroupBy = new GroupBy(this, keys.toIndexedSeq)

  // ---------------------------------------------------------------------
  // driver-only ops (declared, size-guarded — reference default_to_pandas
  // valve, base QC:290; SURVEY §7.4.4)
  // ---------------------------------------------------------------------

  /** Transpose is fundamentally anti-Spark (reference does a cheap 2-D grid
    * flip, dataframe.py:4747; we cannot). Driver-only with a hard size guard;
    * documented deviation. */
  def transpose(maxCells: Long = 1000000L): Seq[Seq[Any]] = {
    val n = df.count()
    require(n * df.columns.length <= maxCells, s"transpose limited to $maxCells cells")
    val rows = df.collect()
    df.columns.indices.map(i => rows.toIndexedSeq.map(_.get(i)))
  }

  // ---------------------------------------------------------------------
  // Driver-side text renderers (pandas to_string / to_markdown / to_latex,
  // index=False shapes) — display helpers, size-guarded like transpose.
  // to_string and to_latex are pinned BYTE-EXACT against genuine pandas
  // output in FrameSpec; to_markdown follows the documented
  // github-pipe format (tabulate, pandas' renderer, is not in this
  // environment to pin against — deviation noted in COVERAGE.md).
  // ---------------------------------------------------------------------

  /** Per-column display strings under pandas' default rules: floats use
    * the column-uniform minimal decimals (≥1, capped at 6 like pandas
    * display.precision), float null → "NaN", other null → "None". */
  private def renderCells(maxRows: Long): (Seq[String], Seq[Seq[String]], Seq[Boolean]) = {
    import org.apache.spark.sql.types._
    val n = df.count()
    require(n <= maxRows, s"driver-side render limited to $maxRows rows, have $n")
    val rows = df.collect().toIndexedSeq
    val fields = df.schema.fields.toIndexedSeq
    val numeric = fields.map(_.dataType.isInstanceOf[NumericType])
    val cols = fields.zipWithIndex.map { case (f, i) =>
      f.dataType match {
        case DoubleType | FloatType =>
          val vs = rows.map(r => if (r.isNullAt(i)) None else Some(r.get(i) match {
            case d: Double => d
            case fl: Float => fl.toDouble
          }))
          val dec = math.min(6, math.max(1, vs.flatten.map { v =>
            val s = BigDecimal(v).bigDecimal.stripTrailingZeros.scale
            math.max(s, 0)
          }.maxOption.getOrElse(1)))
          vs.map {
            case None => "NaN"
            case Some(v) if v.isNaN => "NaN"
            case Some(v) => String.format(java.util.Locale.ROOT, s"%.${dec}f", Double.box(v))
          }
        case _ =>
          rows.map(r => if (r.isNullAt(i)) "None" else String.valueOf(r.get(i)))
      }
    }
    (fields.map(_.name), cols.transpose, numeric)
  }

  /** pandas `to_string(index=False)`: every cell (and header) right-
    * justified to its column width, two-space separator. */
  def toStringTable(maxRows: Long = 100000L): String = {
    val (names, rows, _) = renderCells(maxRows)
    val widths = names.indices.map(i =>
      (names(i).length +: rows.map(_(i).length)).max)
    def line(cells: Seq[String]) =
      cells.zip(widths).map { case (c, w) => c.reverse.padTo(w, ' ').reverse }
        .mkString("  ")
    (line(names) +: rows.map(line)).mkString("\n")
  }

  /** `to_markdown(index=False)` in the github pipe format: ':---' for
    * text columns, '---:' for numeric, cells left-padded to width. */
  def toMarkdownTable(maxRows: Long = 100000L): String = {
    val (names, rows, numeric) = renderCells(maxRows)
    val widths = names.indices.map(i =>
      math.max(3, (names(i).length +: rows.map(_(i).length)).max))
    def row(cells: Seq[String]) =
      cells.zip(widths).zip(numeric).map { case ((c, w), num) =>
        if (num) c.reverse.padTo(w, ' ').reverse else c.padTo(w, ' ')
      }.mkString("| ", " | ", " |")
    val sep = widths.zip(numeric).map { case (w, num) =>
      if (num) "-" * (w + 1) + ":" else ":" + "-" * (w + 1)
    }.mkString("|", "|", "|")
    (row(names) +: sep +: rows.map(row)).mkString("\n")
  }

  /** pandas `to_latex(index=False)`: booktabs tabular, 'l' for text /
    * 'r' for numeric columns, floats at 6 decimals, null → NaN. */
  def toLatexTable(maxRows: Long = 100000L): String = {
    import org.apache.spark.sql.types._
    val n = df.count()
    require(n <= maxRows, s"driver-side render limited to $maxRows rows, have $n")
    val rows = df.collect().toIndexedSeq
    val fields = df.schema.fields.toIndexedSeq
    val spec = fields.map(f =>
      if (f.dataType.isInstanceOf[NumericType]) "r" else "l").mkString
    def cell(r: org.apache.spark.sql.Row, i: Int): String = fields(i).dataType match {
      case DoubleType | FloatType =>
        if (r.isNullAt(i)) "NaN"
        else String.format(java.util.Locale.ROOT, "%.6f", Double.box(r.get(i) match {
          case d: Double => d; case fl: Float => fl.toDouble
        }))
      case _ => if (r.isNullAt(i)) "NaN" else String.valueOf(r.get(i))
    }
    val header = fields.map(_.name).mkString("", " & ", " \\\\")
    val body = rows.map(r => fields.indices.map(cell(r, _)).mkString("", " & ", " \\\\"))
    (Seq(s"\\begin{tabular}{$spec}", "\\toprule", header, "\\midrule") ++
      body ++ Seq("\\bottomrule", "\\end{tabular}", "")).mkString("\n")
  }
}

object Frame {
  /** Name of the materialized positional-order column (see ops.RowOrder). */
  val RowOrder = "__row_order__"

  /** floor() that STAYS double: Spark's `floor(double)` returns LONG,
    * which overflows on ±Inf and on |x| ≥ 2⁶³ — exactly the values the
    * IEEE binop family must pass through unchanged. Doubles ≥ 2⁵³ are
    * already integral, so forwarding them IS their floor. */
  private[api] def floorDouble(d: Column): Column =
    when(isnan(d) || abs(d) >= lit(9.007199254740992E15), d)
      .otherwise(floor(d).cast("double"))

  /** pandas/IEEE-754 true division under ANSI mode. Spark 4's ANSI
    * divide throws DIVIDE_BY_ZERO even for DOUBLE operands, but pandas
    * follows IEEE: x/0 = ±Inf signed by the dividend AND the zero
    * (1/-0.0 = -Inf), 0/0 = NaN, nulls propagate. Non-zero divisors take
    * the plain (exact) ANSI divide — CaseWhen evaluates branches lazily,
    * so the throwing path is never reached; the zero branch reproduces
    * the IEEE signs with a multiply by +∞ (the divisor's signed zero is
    * only observable through its string form, the one codegen'd sign
    * probe ANSI leaves us). Callers pass double-typed columns. */
  private[graft] def ieeeDiv(a: Column, b: Column): Column = {
    val negZero = b.cast("string").startsWith("-")
    when(a.isNull || b.isNull, lit(null).cast("double"))
      .when(b =!= 0.0, a / b)
      .otherwise(when(negZero, -a).otherwise(a) * lit(Double.PositiveInfinity))
  }
  /** pandas `.dt.components` over a timedelta carried as MICROSECONDS
    * (the engine's timedelta representation — cf. q76's unix_micros
    * gaps): one struct with the seven pandas fields. Negative timedeltas
    * follow pandas' normalization — days floors toward −∞ and every
    * sub-day component stays non-negative (Timedelta('-1h').components =
    * days −1, hours 23), which is exactly `pmod`'s contract. Pure
    * integer arithmetic in one codegen'd projection; `nanoseconds` is
    * constant 0 at µs resolution (the documented precision boundary —
    * timestamps in this engine are timestamp[us]). The day quotient
    * routes through an exact-by-construction double divide: (us − rem)
    * is an exact multiple of DAY, and any |td| < 2⁵³ µs (≈285 years)
    * divides exactly. */
  def dtComponents(micros: Column): Column = {
    val us = micros.cast("long")
    val DAY = 86400000000L
    val rem = pmod(us, lit(DAY))
    // (us − rem) is an exact DAY multiple, but `/` is a double divide and
    // cast-to-long TRUNCATES — a quotient computed one ulp low would floor
    // to q−1. round() first: the relative error (≤2⁻⁵² · q) is ≪ 0.5.
    val days = round((us - rem) / lit(DAY)).cast("long")
    struct(
      days.as("days"),
      (rem / lit(3600000000L)).cast("long").as("hours"),
      (pmod(rem, lit(3600000000L)) / lit(60000000L)).cast("long").as("minutes"),
      (pmod(rem, lit(60000000L)) / lit(1000000L)).cast("long").as("seconds"),
      (pmod(rem, lit(1000000L)) / lit(1000L)).cast("long").as("milliseconds"),
      pmod(rem, lit(1000L)).as("microseconds"),
      lit(0L).as("nanoseconds"))
  }

  private[api] val RowNum = "__rn__"

  /** md5(salt + key) — lowercase hex, the engine-portable uniform order
    * behind [[Frame.sampleByHash]] (DuckDB computes the identical string). */
  private[graft] def hashBucket(key: Column, salt: String): Column =
    md5(concat(lit(salt), key.cast("string")))

  /** Uniform double in (0,1) from the content hash: the first 13 hex
    * digits of md5 are 52 bits — exact in a double — and the +0.5 keeps
    * the value strictly positive so ln(u) is always finite. DuckDB
    * reproduces it verbatim as
    * `(CAST('0x' || substr(md5(s),1,13) AS BIGINT) + 0.5) / 4503599627370496.0`. */
  private[graft] def hashUnit(key: Column, salt: String): Column =
    (conv(substring(hashBucket(key, salt), 1, 13), 16, 10).cast("double") + lit(0.5)) /
      lit(4503599627370496.0)

  /** Keep-condition behind the stratified sampler pair: hash under the
    * stratum's threshold (NULL for a NULL key — the sample side's filter
    * drops it, the complement's null-coalescing filter keeps it). */
  private[graft] def stratifiedKeep(keyCol: String, stratCol: String,
      fracs: Map[String, Double], defaultFrac: Double, salt: String): Column = {
    (fracs.values ++ Seq(defaultFrac)).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"frac must be in [0,1]: $f"))
    val threshold = fracs.foldLeft(lit(null).cast("string")) {
      case (acc, (value, f)) => when(col(stratCol) === value, hexThreshold(f)).otherwise(acc)
    }
    hashBucket(col(keyCol), salt) < coalesce(threshold, hexThreshold(defaultFrac))
  }

  /** First-8-hex-digit threshold for `frac` of the md5 space, rendered
    * lowercase and zero-padded so lexicographic hex comparison equals
    * numeric comparison. frac=1 → "g" (sorts above every hex digit).
    * The unit count clamps to [0, 2^32-1]: frac·2^32 can round UP to
    * exactly 2^32 for a frac just under 1.0, and %08x on that (or on a
    * negative) would emit a 9- or 16-char string that no longer compares
    * as an 8-hex prefix. */
  private[graft] def hexThreshold(frac: Double): Column = {
    val t = if (frac >= 1.0) "g"
    else {
      val units = math.min(math.max((frac * 4294967296.0).toLong, 0L), 0xFFFFFFFFL)
      f"$units%08x"
    }
    lit(t)
  }
}

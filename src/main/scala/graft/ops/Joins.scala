package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.SortKey

/**
 * Join operators beyond plain equi-joins.
 *
 * Equi-joins (reference `merge`, modin/core/storage_formats/pandas/merge.py)
 * map 1:1 onto `DataFrame.join` — Spark's planner already implements both of
 * the reference's strategies (broadcast :104-252, range-partitioned
 * shuffle :39-101) and picks between them from statistics + AQE. What Spark
 * lacks natively is pandas' `merge_asof` (reference base
 * query_compiler.py:1713, which falls back to a *driver-side* pandas
 * merge_asof — not scalable). Here it is rebuilt as a distributed plan.
 */
object Joins {

  private val T = "__asof_t__"
  private val Tag = "__asof_tag__"
  private val Payload = "__asof_p__"
  private val Tie = "__asof_tie__"

  /**
   * Distributed `merge_asof` (reference base query_compiler.py:1713 —
   * driver-side pandas there). Full pandas option surface: `direction`
   * backward / forward / nearest, `allowExactMatches`, and `tolerance`.
   *
   * Strategy: tag and union both sides, then for every left row take the
   * nearest non-null right payload in a running window partitioned by the
   * `by` keys and ordered by (time, tag) — the tag decides whether a right
   * row at the SAME time is visible (exact matches) by sorting it before
   * or after the left row, per direction. One hash shuffle on the `by`
   * keys; no global sort, no driver materialization; skewed keys are split
   * by AQE. `nearest` evaluates both one-sided windows over the same
   * union (no second shuffle — same partitioning) and picks the smaller
   * time distance, ties to backward (pandas rule). Ties among right rows
   * at the same time resolve to the greatest `tieBreak` for backward
   * (pandas keeps the last right row) and the smallest for forward.
   * `tolerance` (µs for time keys, raw units for numeric keys) nulls the
   * payload when the matched row is farther than the bound — the row
   * itself is kept, as in pandas.
   *
   * @param payload columns pulled from `right` into the result.
   */
  def asof(
      left: DataFrame,
      right: DataFrame,
      leftOn: String,
      rightOn: String,
      leftBy: String,
      rightBy: String,
      payload: Seq[String],
      tieBreak: Column,
      direction: String = "backward",
      allowExactMatches: Boolean = true,
      tolerance: Option[Long] = None): DataFrame =
    asofByKeys(left, right, leftOn, rightOn, Seq(leftBy), Seq(rightBy),
      payload, tieBreak, direction, allowExactMatches, tolerance)

  /** pandas `merge_asof(by=[k1, k2, ...])` — the multi-key `by` form of
    * [[asof]] (same plan: ONE hash shuffle, now on the composite key).
    * `leftBy`/`rightBy` pair positionally, like pandas. */
  def asofByKeys(
      left: DataFrame,
      right: DataFrame,
      leftOn: String,
      rightOn: String,
      leftBy: Seq[String],
      rightBy: Seq[String],
      payload: Seq[String],
      tieBreak: Column,
      direction: String = "backward",
      allowExactMatches: Boolean = true,
      tolerance: Option[Long] = None): DataFrame = {
    require(leftBy.nonEmpty && leftBy.size == rightBy.size,
      s"asof: by-key lists must pair up: $leftBy vs $rightBy")

    require(Set("backward", "forward", "nearest")(direction),
      s"asof direction must be backward|forward|nearest: $direction")

    // Numeric asof keys (supported by pandas merge_asof) must NOT be cast
    // to timestamp — that would reinterpret ints as epoch seconds. Only
    // normalize date/string/ntz keys; numeric keys order on the raw type.
    // The coercion must agree on BOTH sides (same guard as asofGlobal) —
    // a numeric right key under a temporal left key would silently be
    // reinterpreted as epoch seconds.
    import org.apache.spark.sql.types._
    def keyKind(dt: DataType): String = dt match {
      case _: DateType | _: StringType | _: TimestampType | _: TimestampNTZType => "temporal"
      case _: NumericType => "numeric"
      case other => sys.error(s"asof: unsupported on-key type $other")
    }
    val leftKind = keyKind(left.schema(leftOn).dataType)
    val rightKind = keyKind(right.schema(rightOn).dataType)
    require(leftKind == rightKind,
      s"asof: on-key types disagree — left '$leftOn' is " +
        s"${left.schema(leftOn).dataType.simpleString} ($leftKind) but right " +
        s"'$rightOn' is ${right.schema(rightOn).dataType.simpleString} ($rightKind); " +
        "cast one side so both keys are numeric or both are temporal")
    val (onKey, toNum): (Column => Column, Column => Column) =
      if (leftKind == "temporal")
        ((c: Column) => c.cast("timestamp"), (c: Column) => unix_micros(c))
      else (identity[Column] _, (c: Column) => c.cast("double"))

    // matched right time rides inside the payload struct — tolerance and
    // the nearest-side choice both need it after the window
    val MT = "__asof_mt__"
    val pStruct = struct((onKey(col(rightOn)).as(MT) +: payload.map(col)): _*)
    val pType = right.select(pStruct).schema.head.dataType

    // pandas merge_asof RAISES on null merge keys; the deterministic
    // distributed analog (same rule as asofGlobal): null-key right rows
    // can never match, null-key left rows keep their row with null
    // payload (masked at extraction below — without the mask a null left
    // key would sort FIRST and grab the earliest right row under
    // direction=forward).
    val r = right.filter(col(rightOn).isNotNull).select(
      (rightBy.zip(leftBy).map { case (rb, lb) => col(rb).as(lb) } :+
      onKey(col(rightOn)).as(T)) :+
      lit(0).as(Tag) :+
      pStruct.as(Payload) :+
      tieBreak.cast("long").as(Tie): _*)

    val leftCols = left.columns.toIndexedSeq
    val l = left.select(
      (leftCols.map(col) :+
        onKey(col(leftOn)).as(T) :+
        lit(1).as(Tag) :+
        lit(null).cast(pType).as(Payload) :+
        lit(Long.MaxValue).as(Tie)): _*)

    // Null-pad the right side with the left's columns so the union lines up.
    val rPadded = r.select(
      (leftCols.filterNot(leftBy.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        leftBy.map(col) ++ Seq(col(T), col(Tag), col(Payload), col(Tie))): _*)
    val lAligned = l.select(
      (leftCols.filterNot(leftBy.contains).map(col) ++
        leftBy.map(col) ++ Seq(col(T), col(Tag), col(Payload), col(Tie))): _*)

    val unioned = lAligned.unionByName(rPadded)
    val isRight = col(Tag) === 0

    // Exact-match visibility = sort order of right vs left rows at equal T:
    // a right row is visible to a backward window only if it sorts BEFORE
    // the left row, and to a forward window only if it sorts AFTER.
    def sideTag(visible: Boolean, rightFirst: Boolean): Column =
      if (visible == rightFirst) when(isRight, 0).otherwise(1)
      else when(isRight, 1).otherwise(0)

    def backCol: Column = {
      val w = Window.partitionBy(leftBy.map(col): _*)
        .orderBy(col(T).asc, sideTag(allowExactMatches, rightFirst = true).asc, col(Tie).asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      last(col(Payload), ignoreNulls = true).over(w)
    }
    def fwdCol: Column = {
      val w = Window.partitionBy(leftBy.map(col): _*)
        .orderBy(col(T).asc, sideTag(allowExactMatches, rightFirst = false).asc, col(Tie).asc)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      first(col(Payload), ignoreNulls = true).over(w)
    }

    def withinTol(p: Column): Column = tolerance match {
      case None => p
      case Some(tol) =>
        when(p.isNotNull &&
          abs(toNum(col(T)) - toNum(p.getField(MT))) <= lit(tol.toDouble), p)
    }

    val matched = direction match {
      case "backward" => unioned.withColumn(Payload, withinTol(backCol))
      case "forward"  => unioned.withColumn(Payload, withinTol(fwdCol))
      case "nearest"  =>
        val b = withinTol(backCol)
        val f = withinTol(fwdCol)
        val db = toNum(col(T)) - toNum(b.getField(MT))
        val df_ = toNum(f.getField(MT)) - toNum(col(T))
        unioned.withColumn(Payload,
          when(b.isNull, f).when(f.isNull, b)
            .when(db <= df_, b).otherwise(f)) // tie → backward (pandas)
    }

    val out = payload.foldLeft(matched.filter(col(Tag) === 1)) { (d, p) =>
      d.withColumn(p, when(col(T).isNotNull, col(Payload).getField(p)))
    }
    out.select((leftCols.map(col) ++ payload.map(col)): _*)
  }

  /**
   * GLOBAL `merge_asof` — pandas' by=None form (the most common call).
   * [[asof]] partitions its running window by the `by` keys; with no
   * keys that window would collapse to a single task. Instead: tag and
   * union both sides, pack each right row's (time, tieBreak, payload)
   * into ONE comparable struct (struct ordering is field-lexicographic,
   * so the running MAX of that struct IS "the latest visible right row,
   * ties to the greatest tieBreak" — the pandas backward rule), and run
   * it through the two-phase parallel prefix ([[Cumulative.globalRunning]]).
   * Range shuffle + per-partition window + tiny offset broadcast — no
   * stage sees more than 1/n of the rows. Backward direction,
   * allowExactMatches=true (right rows sort before left at equal time).
   */
  def asofGlobal(
      left: DataFrame,
      right: DataFrame,
      leftOn: String,
      rightOn: String,
      payload: Seq[String],
      tieBreak: Column): DataFrame = {
    import org.apache.spark.sql.types._
    // the on-key coercion must agree on BOTH sides: a numeric left key
    // with a temporal right key (or vice versa) would otherwise union
    // into a mismatched schema and die with an opaque analysis error
    def keyKind(dt: DataType): String = dt match {
      case _: DateType | _: StringType | _: TimestampType | _: TimestampNTZType => "temporal"
      case _: NumericType => "numeric"
      case other => sys.error(s"asofGlobal: unsupported on-key type $other")
    }
    val leftKind = keyKind(left.schema(leftOn).dataType)
    val rightKind = keyKind(right.schema(rightOn).dataType)
    require(leftKind == rightKind,
      s"asofGlobal: on-key types disagree — left '$leftOn' is " +
        s"${left.schema(leftOn).dataType.simpleString} ($leftKind) but right " +
        s"'$rightOn' is ${right.schema(rightOn).dataType.simpleString} ($rightKind); " +
        "cast one side so both keys are numeric or both are temporal")
    val onKey: Column => Column =
      if (leftKind == "temporal") (c: Column) => c.cast("timestamp")
      else identity[Column]
    val S = "__asof_s__"
    val Latest = "__asof_latest__"
    val leftCols = left.columns.toIndexedSeq
    // field order IS the precedence: time, then tieBreak (pandas keeps
    // the last right row among exact-time ties), then the payload
    val sStruct = struct((onKey(col(rightOn)).as(T) +:
      tieBreak.cast("long").as(Tie) +: payload.map(col)): _*)
    val sType = right.select(sStruct).schema.head.dataType

    // pandas merge_asof RAISES on null merge keys; distributed, the
    // deterministic analog is: null-key right rows can never match
    // (dropped), null-key left rows keep their row with null payload.
    val l = left.select(
      (leftCols.map(col) :+ onKey(col(leftOn)).as(T) :+ lit(1).as(Tag) :+
        lit(null).cast(sType).as(S)): _*)
    val r = right.filter(col(rightOn).isNotNull).select(
      (leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        onKey(col(rightOn)).as(T) :+ lit(0).as(Tag) :+ sStruct.as(S)): _*)

    val unioned = l.unionByName(r)
    val run = Cumulative.globalRunning(unioned,
      Seq(SortKey(col(T)), SortKey(col(Tag))), "max", Seq(S -> Latest))
    val out = payload.foldLeft(run.filter(col(Tag) === 1)) { (d, p) =>
      d.withColumn(p, when(col(T).isNotNull, col(Latest).getField(p)))
    }
    out.select((leftCols.map(col) ++ payload.map(col)): _*)
  }

  /**
   * Scalable range join: points to enclosing intervals (`lo ≤ t ≤ hi`).
   * Spark's native plan for an inequality-only join is
   * BroadcastNestedLoop (or cartesian) — O(|points|·|intervals|), the
   * first thing to die at corpus scale. This formulation turns it into
   * an EQUI-join: slice the number line into buckets of `bucketWidth`,
   * explode each interval to the buckets it overlaps (`sequence()` — in
   * plan, no driver work), map each point to its single bucket, hash-join
   * on the bucket id, then apply the exact range predicate as a residual
   * filter. Cost is linear in points + interval-bucket expansions
   * (≈ len/bucketWidth + 1 per interval) — pick bucketWidth near the
   * typical interval length so expansion stays O(1) per interval. Skewed
   * buckets (hot time ranges) split under AQE like any equi-join.
   *
   * All three columns are numeric longs (cast timestamps to epoch µs
   * first); `maxBucketsPerInterval` guards runaway expansion from one
   * pathological interval (fail fast, not OOM).
   */
  def rangeJoin(
      points: DataFrame, tCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long, maxBucketsPerInterval: Long = 10000L): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1: $bucketWidth")
    val B = "__rj_b__"
    // Integral keys bucket in EXACT long arithmetic via floor division:
    // truncating `div`, minus 1 when a negative key has a remainder.
    // floor(c / w) goes through double division, which past 2^53 can
    // round a point and its enclosing interval into different buckets —
    // a silently dropped match the residual filter can't recover. (The
    // earlier `(c - pmod(c, w)) div w` form was exact too but its
    // subtraction passes below Long.MinValue for keys within bucketWidth
    // of the bottom of the range — an ANSI overflow; every intermediate
    // here stays within the key's own range.) Fractional keys keep the
    // double path (their precision is bounded by the type itself).
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    def bucketOf(df: DataFrame, c: String): Column = df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        expr(s"(`$c` div ${bucketWidth}L) - " +
          s"(case when `$c` < 0 and `$c` % ${bucketWidth}L != 0 then 1 else 0 end)")
      case _ => floor(col(c) / bucketWidth).cast("long")
    }
    val loB = bucketOf(intervals, loCol)
    val hiB = bucketOf(intervals, hiCol)
    val guarded = intervals.filter(col(loCol) <= col(hiCol))
    // fail fast on runaway expansion — one bad interval must not OOM a task
    val expanded = guarded
      .withColumn("__rj_n__", hiB - loB + 1)
      .withColumn(B, explode(when(col("__rj_n__") <= maxBucketsPerInterval,
        sequence(loB, hiB))
        .otherwise(raise_error(concat(lit("rangeJoin: interval spans "),
          col("__rj_n__"), lit(s" buckets > cap $maxBucketsPerInterval; " +
            "raise bucketWidth or the cap"))))))
      .drop("__rj_n__")
    val bucketedPoints = points.withColumn(B, bucketOf(points, tCol))
    bucketedPoints.join(expanded, Seq(B))
      .filter(col(tCol) >= col(loCol) && col(tCol) <= col(hiCol))
      .drop(B)
  }

  /** merge_ordered (reference base QC:1682 — single-node there): ordered
    * full-outer merge on a key column, optionally forward-filling. Here a
    * plain full outer join; the ordering is declarative. */
  def mergeOrdered(left: DataFrame, right: DataFrame, on: Seq[String]): DataFrame =
    left.join(right, on, "full_outer")

  /** pandas `align` (reference base QC:1067): copartition both frames to the
    * union of their indexes — a full outer join on the index columns. */
  def align(left: DataFrame, right: DataFrame, indexCols: Seq[String]): DataFrame =
    left.join(right, indexCols, "full_outer")

  /** combine_first (reference QC:538): coalesce left over right after
    * aligning on the index. */
  def combineFirst(left: DataFrame, right: DataFrame, indexCols: Seq[String],
      valueCols: Seq[(String, String, String)]): DataFrame = {
    val joined = align(left, right, indexCols)
    valueCols.foldLeft(joined) { case (d, (lc, rc, out)) =>
      d.withColumn(out, coalesce(col(lc), col(rc)))
    }
  }

  /** pandas merge(validate=) (reference merge.py signature surface):
    * asserts key uniqueness on the side(s) the spec constrains. Each check
    * is one partial-aggregated count job that short-circuits at the first
    * duplicate (`limit(1)`) — eager by design, matching pandas' eager
    * MergeError, and the message text mirrors pandas'. */
  def validateMerge(left: DataFrame, right: DataFrame, on: Seq[String], spec: String): Unit = {
    def unique(side: DataFrame): Boolean =
      side.groupBy(on.map(col): _*).count()
        .filter(col("count") > 1).limit(1).isEmpty
    val (checkLeft, checkRight, word) = spec match {
      case "1:1" => (true, true, "one-to-one")
      case "1:m" => (true, false, "one-to-many")
      case "m:1" => (false, true, "many-to-one")
      case "m:m" => (false, false, "many-to-many")
      case other => throw new IllegalArgumentException(
        s""""$other" is not a valid argument. Valid arguments are: "1:1", "1:m", "m:1", "m:m"""")
    }
    if (checkLeft && !unique(left)) throw new IllegalArgumentException(
      s"Merge keys are not unique in left dataset; not a $word merge")
    if (checkRight && !unique(right)) throw new IllegalArgumentException(
      s"Merge keys are not unique in right dataset; not a $word merge")
  }
}

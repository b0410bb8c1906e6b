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
   * Distributed `merge_asof` (direction=backward, allow_exact_matches=true —
   * the pandas defaults).
   *
   * Strategy: tag and union both sides, then for every left row take the
   * last non-null right payload in a running window partitioned by the `by`
   * keys and ordered by (time, tag) — right rows sort before left rows at
   * equal times, so exact matches are visible. One hash shuffle on the `by`
   * keys; no global sort, no driver materialization; skewed keys are split
   * by AQE. Ties among right rows at the same time resolve to the greatest
   * `tieBreak` (pandas keeps the last right row).
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
      tieBreak: Column): DataFrame = {

    val pStruct = struct(payload.map(col): _*)
    val pType = right.select(pStruct).schema.head.dataType

    // Numeric asof keys (supported by pandas merge_asof) must NOT be cast
    // to timestamp — that would reinterpret ints as epoch seconds. Only
    // normalize date/string/ntz keys; numeric keys order on the raw type.
    import org.apache.spark.sql.types._
    val onKey: Column => Column = left.schema(leftOn).dataType match {
      case _: DateType | _: StringType | _: TimestampType | _: TimestampNTZType =>
        c => c.cast("timestamp")
      case _: NumericType => identity
      case other => sys.error(s"asof: unsupported on-key type $other")
    }

    val r = right.select(
      col(rightBy).as(leftBy),
      onKey(col(rightOn)).as(T),
      lit(0).as(Tag),
      pStruct.as(Payload),
      tieBreak.cast("long").as(Tie))

    val leftCols = left.columns.toIndexedSeq
    val l = left.select(
      (leftCols.map(col) :+
        onKey(col(leftOn)).as(T) :+
        lit(1).as(Tag) :+
        lit(null).cast(pType).as(Payload) :+
        lit(Long.MaxValue).as(Tie)): _*)

    // Null-pad the right side with the left's columns so the union lines up.
    val rPadded = r.select(
      (leftCols.filterNot(_ == leftBy).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(leftBy), col(T), col(Tag), col(Payload), col(Tie))): _*)
    val lAligned = l.select(
      (leftCols.filterNot(_ == leftBy).map(col) ++
        Seq(col(leftBy), col(T), col(Tag), col(Payload), col(Tie))): _*)

    val unioned = lAligned.unionByName(rPadded)
    val w = Window.partitionBy(col(leftBy))
      .orderBy(col(T).asc, col(Tag).asc, col(Tie).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = unioned
      .withColumn(Payload, last(col(Payload), ignoreNulls = true).over(w))
      .filter(col(Tag) === 1)

    val out = payload.foldLeft(matched) { (d, p) =>
      d.withColumn(p, col(Payload).getField(p))
    }
    out.select((leftCols.map(col) ++ payload.map(col)): _*)
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

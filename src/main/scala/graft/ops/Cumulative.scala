package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.SortKey

/**
 * Global (ungrouped) running aggregates — the skip-and-carry prefix under
 * pandas cumsum/cummax/cummin over the whole frame (reference base
 * query_compiler.py:1475-1585, a Fold over the partition grid with
 * carried state). NOTE: like SQL window aggregates, a null-valued row
 * emits the carried running value, not null — internal consumers
 * (asofGlobal, Rank, Expanding, Corpus.packChunks) depend on exactly
 * that; pandas-facing cumulatives add the null-position mask themselves
 * (GroupBy.cumsum, Frame.cumsumAxis1).
 *
 * The naive Spark translation — `sum(x).over(Window.orderBy(key))` with no
 * partition keys — funnels ALL rows into one task (Spark even warns), the
 * first scale-killer at 100 TB. This implements the reference's fold idea
 * as the classic two-phase parallel prefix:
 *
 *   1. range-repartition + sort within partitions on the order keys and
 *      stamp `spark_partition_id()`; eagerly localCheckpoint so the
 *      sampled range bounds are frozen for both consumers;
 *   2. per-partition running aggregate via a window PARTITIONED by the
 *      partition id (parallel across partitions);
 *   3. per-partition totals (one row per partition — thousands of rows at
 *      cluster scale, never data-sized) get an exclusive running prefix on
 *      the tiny side, broadcast-joined back and combined.
 *
 * Wall-clock: one range shuffle + one hash shuffle of the data, one tiny
 * aggregate. No stage sees more than 1/n of the rows.
 */
object Cumulative {

  private val Pid = "__pid__"

  /** fn ∈ sum|max|min. Adds one output column per (valueCol -> outName). */
  def globalRunning(
      df: DataFrame,
      order: Seq[SortKey],
      fn: String,
      cols: Seq[(String, String)],
      numPartitions: Option[Int] = None): DataFrame = {

    // the per-pair foldLeft adds output columns in sequence — an output
    // name shadowing a LATER pair's input would silently corrupt it
    require(!cols.map(_._2).exists(out => cols.map(_._1).contains(out)),
      s"globalRunning: output names ${cols.map(_._2)} must not collide with inputs")
    val n = numPartitions.getOrElse(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val sortCols = order.map(_.toColumn)
    val sorted = df
      .repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn(Pid, spark_partition_id())
      .localCheckpoint(true)

    def agg(c: Column): Column = fn match {
      case "sum" => sum(c)
      case "max" => max(c)
      case "min" => min(c)
      case other => sys.error(s"globalRunning: unsupported $other")
    }
    def combine(local: Column, prefix: Column): Column = fn match {
      // null-guard instead of `+ coalesce(prefix, 0.0)`: a double literal
      // would silently promote decimal inputs back to double.
      case "sum" => when(prefix.isNull, local).otherwise(local + prefix)
      case "max" => when(prefix.isNull, local).otherwise(greatest(local, prefix))
      case "min" => when(prefix.isNull, local).otherwise(least(local, prefix))
    }

    val wLocal = Window.partitionBy(col(Pid)).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = cols.foldLeft(sorted) { case (d, (v, out)) =>
      d.withColumn(out, agg(col(v)).over(wLocal))
    }

    // One row per partition; the exclusive-prefix window over it is a
    // single task over ~numPartitions rows — constant-size at any data
    // scale, so the "global window" here is safe by construction.
    val totals = sorted.groupBy(col(Pid))
      .agg(agg(col(cols.head._1)).as(s"__t0__"),
        cols.tail.zipWithIndex.map { case ((v, _), i) => agg(col(v)).as(s"__t${i + 1}__") }: _*)
    val wPrefix = Window.orderBy(col(Pid))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = totals.select(
      col(Pid) +: cols.zipWithIndex.map { case (_, i) =>
        agg(col(s"__t${i}__")).over(wPrefix).as(s"__p${i}__")
      }: _*)

    val joined = local.join(broadcast(prefixes), Seq(Pid))
    val out = cols.zipWithIndex.foldLeft(joined) { case (d, ((_, outName), i)) =>
      d.withColumn(outName, combine(col(outName), col(s"__p${i}__")))
    }
    out.drop(Pid +: cols.indices.map(i => s"__p${i}__"): _*)
  }
}

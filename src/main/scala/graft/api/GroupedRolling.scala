package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions.col

/**
 * Fluent grouped rolling surface (pandas `GroupBy.rolling` — reference
 * modin/pandas/window.py via groupby). Unlike [[Rolling]] (the GLOBAL
 * path, which needs block overlap), the group key IS the partition key,
 * so this is the plain bounded window Spark parallelizes natively — one
 * hash shuffle on the keys, whole-stage-codegen'd aggregates.
 */
final case class GroupedRolling(frame: Frame, keys: Seq[String], window: Int,
    order: Seq[SortKey], minPeriods: Int) {

  private def spec = Window.partitionBy(keys.map(col): _*)
    .orderBy(order.map(_.toColumn): _*)
    .rowsBetween(-(window - 1), Window.currentRow)

  private def gated(c: String, value: Column, as: String): Frame = {
    val vcnt = F.count(col(c)).over(spec) // valid observations, pandas rule
    frame.copy(df = frame.df.withColumn(as, F.when(vcnt >= minPeriods, value)))
  }

  def sum(c: String, as: String): Frame = gated(c, F.sum(col(c)).over(spec), as)
  def mean(c: String, as: String): Frame = gated(c, F.avg(col(c)).over(spec), as)
  def min(c: String, as: String): Frame = gated(c, F.min(col(c)).over(spec), as)
  def max(c: String, as: String): Frame = gated(c, F.max(col(c)).over(spec), as)
  def count(c: String, as: String): Frame = gated(c, F.count(col(c)).over(spec).cast("long"), as)
  def std(c: String, as: String): Frame = gated(c, F.stddev_samp(col(c)).over(spec), as)
}

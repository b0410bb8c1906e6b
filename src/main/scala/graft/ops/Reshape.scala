package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Reshape operators (reference §2.10: pivot_table QC:4559, melt QC:2918,
 * get_dummies QC:4643, explode QC:3461, cut/qcut base QC:4739).
 */
object Reshape {

  /** pivot_table (reference QC:4559 + PivotTableImpl,
    * storage_formats/pandas/groupby.py:251-506 — groupby + unstack there).
    * Spark's `groupBy().pivot(values).agg()` is a single partial/final
    * aggregate when the pivot values are supplied explicitly (no extra
    * distinct-scan job), which is how a 100 TB pivot should run. */
  def pivotTable(
      df: DataFrame,
      index: Seq[String],
      pivotCol: String,
      pivotValues: Seq[String],
      agg: Column): DataFrame =
    df.groupBy(index.map(col): _*).pivot(pivotCol, pivotValues).agg(agg)

  /** melt / unpivot (reference QC:2918; Spark 3.4+ has a native unpivot
    * logical plan — zero shuffle, row-expanding map). */
  def melt(df: DataFrame, ids: Seq[String], values: Seq[String],
      varName: String = "variable", valueName: String = "value"): DataFrame =
    df.unpivot(ids.map(col).toArray, values.map(col).toArray, varName, valueName)

  /** pandas `lreshape(data, groups)` (reference base QC:4612 — modin
    * defaults to pandas): each group maps an output column name to a
    * same-length list of wide columns; position p of every group stacks
    * into one long row. A union of `groupLen` projections — map-only,
    * zero shuffles, linear at any scale. `dropna=true` (the pandas
    * default) drops a stacked row when ANY of its group values is null. */
  def lreshape(df: DataFrame, ids: Seq[String],
      groups: Seq[(String, Seq[String])], dropna: Boolean = true): DataFrame = {
    require(groups.nonEmpty, "lreshape: groups must be non-empty")
    val lens = groups.map(_._2.length).distinct
    require(lens.size == 1,
      s"lreshape: all groups must list the same number of columns, got $lens")
    val stacked = (0 until lens.head).map { p =>
      df.select((ids.map(col) ++ groups.map { case (nm, cols) =>
        col(cols(p)).as(nm)
      }): _*)
    }.reduce(_ unionAll _)
    if (dropna) stacked.na.drop(groups.map(_._1)) else stacked
  }

  /** get_dummies / one-hot (reference QC:4643) — pure column expressions,
    * no shuffle. */
  def getDummies(df: DataFrame, c: String, values: Seq[String]): DataFrame =
    values.foldLeft(df) { (d, v) =>
      d.withColumn(s"${c}_$v", when(col(c) === v, 1).otherwise(0))
    }

  /** pandas cut with explicit bins (reference base QC:4739; bins are
    * computed driver-side in the reference too). Right-closed like pandas
    * default: every bin is (lo, hi], and a value equal to the lowest edge
    * falls in NO bin (NULL) — pandas include_lowest=False. Pass
    * `includeLowest = true` for pandas' include_lowest=True, which widens
    * the first bin to [lo, hi] and labels it accordingly. */
  def cut(c: Column, bins: Seq[Double], includeLowest: Boolean = false): Column =
    bins.sliding(2).zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, (Seq(lo, hi), i)) =>
        val first = i == 0 && includeLowest
        val cond = if (first) c >= lo && c <= hi else c > lo && c <= hi
        val label = if (first) s"[$lo, $hi]" else s"($lo, $hi]"
        when(cond, lit(label)).otherwise(acc)
    }

  /** pandas `cut(right=False)`: left-closed bins `[lo, hi)` — the mirror
    * of the default. The last bin stays half-open (pandas drops the max
    * unless the edge list covers it); same when-chain, still one
    * codegen'd expression. */
  def cutLeftClosed(c: Column, bins: Seq[Double]): Column =
    bins.sliding(2).foldLeft(lit(null).cast("string")) {
      case (acc, Seq(lo, hi)) =>
        when(c >= lo && c < hi, lit(s"[$lo, $hi)")).otherwise(acc)
    }

  /** qcut: quantile bin edges via one exact-percentile aggregate (a handful
    * of doubles to the driver — same contract as the reference, which
    * computes bins driver-side), then a cut. */
  def qcut(df: DataFrame, c: String, q: Int): (DataFrame, Seq[Double]) = {
    val probs = (0 to q).map(_.toDouble / q)
    val edges = df.select(percentile(col(c), lit(probs.toArray)).as("e"))
      .head().getSeq[Double](0)
    // pandas qcut always includes the minimum in the first bin.
    (df.withColumn(s"${c}_bin", cut(col(c), edges, includeLowest = true)), edges)
  }

  /** crosstab-style frequency table (reference general.py:713) — a pivoted
    * count. */
  def crosstab(df: DataFrame, rowCol: String, colCol: String, colValues: Seq[String]): DataFrame =
    pivotTable(df, Seq(rowCol), colCol, colValues, count(lit(1)))

  /** pandas `crosstab(normalize=)`: 'index' divides each cell by its row
    * total, 'columns' by its column total, 'all' by the grand total. The
    * division runs over the PIVOTED output (|rows| × |cols| cells — tiny
    * relative to the corpus), so the corpus-side plan is identical to
    * [[crosstab]]; the empty-frame windows for columns/all shuffle only
    * that small table. Missing cells normalize as 0 (pandas). */
  def crosstabNormalized(df: DataFrame, rowCol: String, colCol: String,
      colValues: Seq[String], normalize: String): DataFrame = {
    require(Set("index", "columns", "all")(normalize),
      s"normalize must be index|columns|all: $normalize")
    val counts = crosstab(df, rowCol, colCol, colValues)
    val cells = colValues.map(v => coalesce(col(s"`$v`"), lit(0L)))
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val denom: Seq[Column] = normalize match {
      case "index"   => val rt = cells.reduce(_ + _); colValues.map(_ => rt)
      case "columns" => cells.map(c => sum(c).over(w))
      case "all"     => val gt = sum(cells.reduce(_ + _)).over(w); colValues.map(_ => gt)
    }
    counts.select(col(rowCol) +: colValues.zip(cells).zip(denom).map {
      // a zero denominator (a listed pivot value absent from the data, or
      // a row whose values all fall outside colValues) is pandas NaN —
      // ANSI division would throw
      case ((v, c), d) => when(d > 0, c.cast("double") / d).as(v)
    }: _*)
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.api.SortKey

/**
 * Global (ungrouped) rank-based statistics: pandas `rank(method='average')`
 * at scale, Spearman correlation, and `Series.autocorr`.
 *
 * (reference: modin base query_compiler rank → default pandas rank per
 * column partition + global offset pass; corr(method='spearman') defaults
 * to pandas, single-node — this formulation is the distributed design.)
 *
 * The naive global rank — `rank().over(Window.orderBy(v))` — funnels every
 * row through one task. This instead ranks via the DISTINCT-value table:
 *
 *   1. `groupBy(v).count()` — one hash aggregate (map-side combined);
 *   2. exclusive prefix of counts over the distinct table, value-ordered,
 *      with the two-phase parallel prefix ([[Cumulative.globalRunning]] —
 *      range shuffle + per-partition window + tiny offset broadcast);
 *   3. average rank of value v = (#below v) + (#equal v + 1) / 2 —
 *      attached back to the data with a hash equi-join on v.
 *
 * Every stage is linear and fully parallel; the distinct table is at most
 * data-sized (continuous values) and usually far smaller.
 */
object Rank {

  /** Attach pandas `rank(method='average', na_option='keep')` of
    * `valueCol` as `outCol`. Nulls rank as null and do not consume ranks
    * (pandas keep semantics). */
  def withAvgRank(df: DataFrame, valueCol: String, outCol: String): DataFrame = {
    require(!df.columns.contains(outCol), s"withAvgRank: $outCol already exists")
    val cnt = "__cnt__"
    val cum = "__cum__"
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol)).agg(count(lit(1)).as(cnt))
    val prefixed = Cumulative.globalRunning(
      counts, Seq(SortKey.asc(valueCol)), "sum", Seq((cnt, cum)))
    val ranks = prefixed.select(
      col(valueCol),
      (col(cum) - col(cnt) + (col(cnt) + lit(1)) / 2.0).as(outCol))
    df.join(ranks, Seq(valueCol), "left")
  }

  /** Spearman rank correlation of each (anchor, other) column pair — one
    * row, one column per pair, Pearson over average ranks. Rows are
    * ranked per column over that column's non-null values; Spark's
    * `corr` then skips pairwise-incomplete rows (matches pandas when the
    * columns are null-free; with nulls pandas re-ranks the pairwise
    * subset — documented deviation, COVERAGE.md). */
  def spearman(df: DataFrame, anchor: String, others: Seq[String]): DataFrame = {
    val cols = anchor +: others
    val ranked = cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      withAvgRank(d, c, s"__rk${i}__")
    }
    ranked.agg(
      corr(col("__rk0__"), col("__rk1__")).as(s"spearman_${others.head}"),
      others.tail.zipWithIndex.map { case (c, i) =>
        corr(col("__rk0__"), col(s"__rk${i + 2}__")).as(s"spearman_$c")
      }: _*)
  }

  /** pandas `Series.autocorr(lag)`: Pearson corr of the value column with
    * itself shifted by `lag` positions under the declared order. The
    * shift is an equi-join on adjacent positions of the materialized
    * block-offset row order (the q117 pct_change discipline) — no
    * unpartitioned window. */
  def autocorr(df: DataFrame, order: Seq[SortKey], valueCol: String,
      lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ > 0), "autocorr: lags must be positive")
    val pos = graft.api.Frame.RowOrder
    // order.map(_.c) — the bare key columns; toColumn yields SortOrder
    // expressions, which only sorts accept
    val ro = RowOrder.withRowOrder(df.select(order.map(_.c) :+ col(valueCol): _*), order)
      .select(col(pos), col(valueCol))
    val joined = lags.foldLeft(ro) { case (d, lag) =>
      d.join(
        ro.select((col(pos) - lag).as(pos), col(valueCol).as(s"__lead${lag}__")),
        Seq(pos), "left")
    }
    joined.agg(
      corr(col(valueCol), col(s"__lead${lags.head}__")).as(s"autocorr_${lags.head}"),
      lags.tail.map(l => corr(col(valueCol), col(s"__lead${l}__")).as(s"autocorr_$l")): _*)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.SortKey

/**
 * §2.11 missing-data transforms beyond na.fill: linear interpolation
 * (reference base query_compiler.py:2172 — modin defaults to pandas;
 * here a genuine distributed plan: two ignore-null windows per group,
 * one shuffle on the keys).
 */
object Missing {

  /**
   * pandas `interpolate(method='linear')` within key groups:
   *   - interior nulls: straight line between the surrounding non-nulls,
   *     positioned by row number;
   *   - leading nulls stay null; trailing nulls take the last value
   *     (pandas limit_direction='forward' default).
   *
   * `valueCol` must be a 2-decimal quantity: interpolation runs in exact
   * integer units of 1e-4 with half-up rounding — division of doubles
   * would round differently across engines on exact ties (Spark rounds
   * the shortest decimal repr, DuckDB the binary value).
   */
  def interpolateLinear(
      df: DataFrame, partitionBy: Seq[String], order: Seq[SortKey],
      valueCol: String, out: String): DataFrame = {

    val keys = partitionBy.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(order.map(_.toColumn): _*)
    val before = w.rowsBetween(Window.unboundedPreceding, 0)
    val after = w.rowsBetween(0, Window.unboundedFollowing)

    val v = col(valueCol)
    val rn = row_number().over(w)
    val vu = (v.cast("decimal(18,2)") * 100).cast("long") // 1e-4 units /100

    val d = df
      .withColumn("__rn__", rn)
      .withColumn("__pv__", last(when(v.isNotNull, vu), ignoreNulls = true).over(before))
      .withColumn("__pr__", last(when(v.isNotNull, col("__rn__")), ignoreNulls = true).over(before))
      .withColumn("__nv__", first(when(v.isNotNull, vu), ignoreNulls = true).over(after))
      .withColumn("__nr__", first(when(v.isNotNull, col("__rn__")), ignoreNulls = true).over(after))

    // value in 1e-4 units, half-up: (2*(pv*g + d*p) + g) div (2*g)
    val g = col("__nr__") - col("__pr__")
    val p = col("__rn__") - col("__pr__")
    val numer = col("__pv__") * lit(100) * g + (col("__nv__") - col("__pv__")) * lit(100) * p
    val interp4 = floor((numer * 2 + g) / (g * 2))

    d.withColumn(out,
      when(v.isNotNull, v)
        .when(col("__pv__").isNull, lit(null).cast("double"))
        .when(col("__nv__").isNull, col("__pv__").cast("double") / 100.0)
        .otherwise(interp4 / lit(10000.0)))
      .drop("__rn__", "__pv__", "__pr__", "__nv__", "__nr__")
  }
}

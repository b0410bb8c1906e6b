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

  /** pandas `interpolate(method='pad')` — forward-fill of nulls from the
    * last valid value within the group (leading nulls stay null). Exact
    * copies, no arithmetic: one ignore-null running window per group. */
  def interpolatePad(
      df: DataFrame, partitionBy: Seq[String], order: Seq[SortKey],
      valueCol: String, out: String): DataFrame = {
    val w = Window.partitionBy(partitionBy.map(col): _*)
      .orderBy(order.map(_.toColumn): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn(out, last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** pandas `interpolate(method='nearest')` — each null takes whichever
    * surrounding valid value is nearer BY ROW POSITION; exact midpoint
    * ties take the previous value (scipy interp1d kind='nearest' rounds
    * down). Leading nulls stay null; trailing nulls take the last value
    * (limit_direction='forward', same contract as linear). Exact value
    * copies — no arithmetic, so no cross-engine rounding surface. */
  def interpolateNearest(
      df: DataFrame, partitionBy: Seq[String], order: Seq[SortKey],
      valueCol: String, out: String): DataFrame = {
    val w = Window.partitionBy(partitionBy.map(col): _*)
      .orderBy(order.map(_.toColumn): _*)
    val before = w.rowsBetween(Window.unboundedPreceding, 0)
    val after = w.rowsBetween(0, Window.unboundedFollowing)
    val v = col(valueCol)
    val d = df
      .withColumn("__rn__", row_number().over(w))
      .withColumn("__pv__", last(when(v.isNotNull, v), ignoreNulls = true).over(before))
      .withColumn("__pr__", last(when(v.isNotNull, col("__rn__")), ignoreNulls = true).over(before))
      .withColumn("__nv__", first(when(v.isNotNull, v), ignoreNulls = true).over(after))
      .withColumn("__nr__", first(when(v.isNotNull, col("__rn__")), ignoreNulls = true).over(after))
    d.withColumn(out,
      when(v.isNotNull, v)
        .when(col("__pv__").isNull, lit(null).cast("double"))
        .when(col("__nv__").isNull, col("__pv__"))
        .when(col("__rn__") - col("__pr__") <= col("__nr__") - col("__rn__"), col("__pv__"))
        .otherwise(col("__nv__")))
      .drop("__rn__", "__pv__", "__pr__", "__nv__", "__nr__")
  }

  /** pandas `interpolate(method='index')` — linear interpolation with the
    * (integral) index column as the x-coordinate instead of the row
    * position. Same exact-integer-unit discipline as
    * [[interpolateLinear]]: `valueCol` is a 2-decimal quantity, the line
    * is evaluated in 1e-4 units with half-up rounding, so both engines
    * land on identical doubles.
    *
    * EXACTNESS ENVELOPE: the half-up arithmetic computes
    * (value x 10^4) x gap in a long and divides via double, so it is
    * exact only while |value| x 10^4 x (x-gap between valid neighbors)
    * stays under 2^52. Choose the x unit accordingly — epoch SECONDS or
    * coarser for day-scale gaps; raw epoch microseconds with 6-digit
    * values overflows the envelope (silently pre-ANSI, an error under
    * ANSI). */
  def interpolateIndex(
      df: DataFrame, partitionBy: Seq[String], order: Seq[SortKey],
      xCol: String, valueCol: String, out: String): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    require(Seq(ByteType, ShortType, IntegerType, LongType)
        .contains(df.schema(xCol).dataType),
      s"interpolateIndex: x column '$xCol' must be integral for exact arithmetic; " +
        "cast timestamps to epoch units first")
    val w = Window.partitionBy(partitionBy.map(col): _*)
      .orderBy(order.map(_.toColumn): _*)
    val before = w.rowsBetween(Window.unboundedPreceding, 0)
    val after = w.rowsBetween(0, Window.unboundedFollowing)
    val v = col(valueCol)
    val x = col(xCol).cast("long")
    val vu = (v.cast("decimal(18,2)") * 100).cast("long")
    val d = df
      .withColumn("__pv__", last(when(v.isNotNull, vu), ignoreNulls = true).over(before))
      .withColumn("__px__", last(when(v.isNotNull, x), ignoreNulls = true).over(before))
      .withColumn("__nv__", first(when(v.isNotNull, vu), ignoreNulls = true).over(after))
      .withColumn("__nx__", first(when(v.isNotNull, x), ignoreNulls = true).over(after))
    val g = col("__nx__") - col("__px__")
    val p = x - col("__px__")
    val numer = col("__pv__") * lit(100) * g + (col("__nv__") - col("__pv__")) * lit(100) * p
    val interp4 = floor((numer * 2 + g) / (g * 2))
    d.withColumn(out,
      when(v.isNotNull, v)
        .when(col("__pv__").isNull, lit(null).cast("double"))
        .when(col("__nv__").isNull, col("__pv__").cast("double") / 100.0)
        // duplicate index values: both neighbors at the same x make the
        // line degenerate (g = 0 would divide by zero under ANSI);
        // np.interp right-biases at ties, so take the NEXT valid value —
        // pinned against pandas in OpsSpec
        .when(g === 0, col("__nv__").cast("double") / 100.0)
        .otherwise(interp4 / lit(10000.0)))
      .drop("__pv__", "__px__", "__nv__", "__nx__")
  }
}

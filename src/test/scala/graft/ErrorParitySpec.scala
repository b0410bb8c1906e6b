package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import graft.api.{Frame, SortKey}

/**
 * Exception parity (reference: `eval_general` asserts that modin raises
 * where pandas raises, modin/tests/pandas/utils.py:1000-1037). The engine
 * maps pandas' KeyError/ValueError family onto Spark's typed
 * AnalysisException at plan-build time: every case here raises in pandas
 * and must raise — eagerly, not at materialization — on this engine too.
 */
class ErrorParitySpec extends SparkSuite {

  private def orders = Frame(table("orders"))

  test("selecting a missing column raises (pandas KeyError)") {
    assertThrows[AnalysisException](orders.select("no_such_column").df.schema)
  }

  test("filter on a missing column raises (pandas KeyError / UndefinedVariableError)") {
    assertThrows[AnalysisException](orders.query("no_such_column > 1").df.schema)
  }

  test("pandas-dialect query on a missing column raises") {
    assertThrows[AnalysisException](
      orders.queryPandas("no_such_column == 'x'").df.schema)
  }

  test("unparseable query text raises (pandas SyntaxError)") {
    intercept[Exception](orders.query("o_orderkey >>> 1").df.schema)
    intercept[Exception](orders.queryPandas("o_orderkey ==").df.schema)
  }

  test("rolling without a declared ordering raises; bad agg and direction raise") {
    import org.apache.spark.sql.functions.col
    intercept[IllegalArgumentException](orders.rolling(5))
    intercept[RuntimeException] {
      orders.sortValues(Seq(SortKey.asc("o_orderkey")))
        .rolling(5).agg(("o_totalprice", "no_such_agg", "x")).df.schema
    }
    intercept[IllegalArgumentException] {
      graft.ops.Joins.asof(orders.df, orders.df, "o_orderkey", "o_orderkey",
        "o_custkey", "o_custkey", Seq("o_totalprice"), col("o_orderkey"),
        direction = "sideways")
    }
  }

  test("astype to a nonexistent type raises (pandas TypeError)") {
    intercept[Exception](orders.astype("o_orderkey" -> "not_a_type").df.schema)
  }

  test("merge on a missing key column raises (pandas KeyError)") {
    val other = Frame(table("customer"))
    intercept[Exception](
      orders.merge(other, Seq("no_such_key"), "inner").df.schema)
  }

  test("merge validate raises on duplicate keys (pandas MergeError)") {
    val cust = Frame(table("customer"))
    // orders:custkey is many-to-one against customer — declaring 1:1 must
    // raise with pandas' message, eagerly (at merge call, not at action)
    val e = intercept[IllegalArgumentException](
      orders.merge(cust.rename("c_custkey" -> "o_custkey"),
        Seq("o_custkey"), "inner", validate = Some("1:1")))
    assert(e.getMessage.contains("not unique in left dataset"))
    assert(e.getMessage.contains("one-to-one"))
    // an unknown spec raises the pandas ValueError text
    val bad = intercept[IllegalArgumentException](
      orders.merge(cust.rename("c_custkey" -> "o_custkey"),
        Seq("o_custkey"), "inner", validate = Some("2:2")))
    assert(bad.getMessage.contains("not a valid argument"))
    // the satisfied direction passes and still joins
    assert(orders.merge(cust.rename("c_custkey" -> "o_custkey"),
      Seq("o_custkey"), "inner", validate = Some("m:1")).df.columns.contains("c_name"))
  }

  test("sort on a missing column raises (pandas KeyError)") {
    assertThrows[AnalysisException](
      orders.sortValues(Seq(SortKey.asc("no_such_column"))).df.schema)
  }

  test("tail and expanding without a declared ordering raise (positional ops need an order)") {
    val e = intercept[IllegalArgumentException](orders.tail(5))
    assert(e.getMessage.contains("ordering"))
    val e2 = intercept[IllegalArgumentException](orders.expanding())
    assert(e2.getMessage.contains("ordering"))
  }

  test("transpose past the cell cap raises with the cap in the message (declared valve)") {
    val e = intercept[IllegalArgumentException](orders.transpose(maxCells = 10L))
    assert(e.getMessage.contains("transpose limited to 10 cells"))
  }

  test("rangeJoin rejects a non-positive bucket width eagerly") {
    val e = intercept[IllegalArgumentException](
      graft.ops.Joins.rangeJoin(orders.df, "o_orderkey",
        orders.df.selectExpr("o_orderkey AS lo", "o_orderkey + 5 AS hi"),
        "lo", "hi", bucketWidth = 0L))
    assert(e.getMessage.contains("bucketWidth"))
  }

  test("sample guards: frac outside [0,1] and negative n raise (pandas ValueError)") {
    val e = intercept[IllegalArgumentException](orders.sampleByHash("o_orderkey", 1.5))
    assert(e.getMessage.contains("[0,1]"))
    intercept[IllegalArgumentException](orders.sampleByHashComplement("o_orderkey", -0.1))
    val en = intercept[IllegalArgumentException](orders.sampleN("o_orderkey", -1))
    assert(en.getMessage.contains(">= 0"))
    intercept[IllegalArgumentException](
      orders.sampleByHashStratified("o_orderkey", "o_orderstatus",
        Map("O" -> 2.0)).df.schema)
  }

  test("to_numeric: errors='ignore' unsupported, 'raise' raises on bad text, 'coerce' nulls it") {
    intercept[IllegalArgumentException](
      orders.toNumeric("o_orderpriority", "p", errors = "ignore"))
    // '1-URGENT' is not a number: raise must raise AT MATERIALIZATION
    // (pandas ValueError), coerce must produce nulls and NOT raise
    intercept[Exception](
      orders.toNumeric("o_orderpriority", "p", errors = "raise").df.collect())
    val coerced = orders.toNumeric("o_orderpriority", "p", errors = "coerce")
      .df.select("p").limit(5).collect()
    assert(coerced.forall(_.isNullAt(0)))
  }

  test("to_datetime rejects unknown errors= mode eagerly") {
    intercept[IllegalArgumentException](
      orders.toDatetime("o_orderpriority", "d", "yyyy-MM-dd", errors = "ignore"))
  }

  test("drop_duplicates with an unknown keep mode raises (pandas ValueError)") {
    val e = intercept[RuntimeException](
      orders.dropDuplicates(Seq("o_custkey"),
        Seq(SortKey.asc("o_orderkey")), keep = "both"))
    assert(e.getMessage.contains("first|last|none"))
  }

  test("groupby on a missing key column raises (pandas KeyError)") {
    assertThrows[AnalysisException](
      orders.groupby("no_such_key").agg("n" -> count(lit(1))).df.schema)
  }

  test("str.wrap with a non-positive width raises (textwrap ValueError)") {
    val e = intercept[IllegalArgumentException](
      graft.functions.Text.wrap(col("o_orderpriority"), 0))
    assert(e.getMessage.contains("width"))
  }

  test("str.index/rindex raise on a missing substring (python ValueError)") {
    import spark.implicits._
    val d = Seq("alphabetical", "zzz").toDF("text")
    // raise_error surfaces from the executor wrapped in SparkException —
    // the message is what carries the python contract
    val e = intercept[Exception](
      d.select(graft.functions.Text.strIndex(col("text"), "al")).collect())
    assert(e.getMessage.contains("substring not found") ||
      Option(e.getCause).exists(_.getMessage.contains("substring not found")))
    val e2 = intercept[Exception](
      d.select(graft.functions.Text.strRindex(col("text"), "al")).collect())
    assert(e2.getMessage.contains("substring not found") ||
      Option(e2.getCause).exists(_.getMessage.contains("substring not found")))
  }

  test("pandas-dialect zero divisor: ANSI error by default, ±Inf/NaN with ieeeDivision") {
    import spark.implicits._
    val d = Seq((4.0, 0.0), (-3.0, 0.0), (0.0, 0.0), (6.0, -2.0)).toDF("a", "b")
    // default: deviation 16 — ANSI DIVIDE_BY_ZERO surfaces at collect
    val e = intercept[Exception](
      Frame(d).evalPandas("r", "a / b").df.collect())
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("DIVIDE_BY_ZERO"))
    // opt-in: numpy semantics, matching Frame.ieeeDiv's method surface
    val r = Frame(d).evalPandas("r", "a / b", ieeeDivision = true)
      .df.select("r").collect().map(_.getDouble(0))
    assert(r(0).isPosInfinity && r(1).isNegInfinity && r(2).isNaN && r(3) == -3.0)
  }

  test("dt.components: negative timedeltas normalize like pandas; ns is 0") {
    import spark.implicits._
    // −1h → days −1, hours 23 (pandas floors days, keeps sub-day parts
    // non-negative); +90091s+1500µs → 1d 1h 1m 31s 1ms 500µs
    val d = Seq(-3600000000L, 90091001500L).toDF("us")
    val out = d.select(Frame.dtComponents(col("us")).as("c")).select("c.*").collect()
    assert(out(0).toSeq == Seq(-1L, 23L, 0L, 0L, 0L, 0L, 0L))
    assert(out(1).toSeq == Seq(1L, 1L, 1L, 31L, 1L, 500L, 0L))
  }

  test("duplicate query registration is rejected eagerly (engine invariant)") {
    // not a pandas case, but the same fail-fast contract: Registry refuses
    // colliding names at class load rather than shadowing one silently
    assert(queries.Registry.all.map(_.name).distinct.size ==
      queries.Registry.all.size)
  }

  test("registry count is pinned (bump intentionally when adding queries)") {
    // doc-drift guard: README/COVERAGE quote this number — a silent
    // registry change must turn the suite red, not the docs stale
    assert(queries.Registry.all.size == 260,
      s"registry has ${queries.Registry.all.size} queries; update this pin " +
        "and the README/COVERAGE counts together")
  }
}

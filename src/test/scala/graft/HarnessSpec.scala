package graft

import org.apache.spark.sql.Row

/** Regression pins for the TEST HARNESS itself (VERDICT r13 §1): the
  * parity helpers in [[SparkSuite]] are the signal every other spec and
  * fuzz sweep leans on, so their own historical defect classes get unit
  * cases here — a canon sort-key that can pair unrelated rows, or a
  * keyStr rendering that diverges the canonical order between equal
  * cross-type values, silently poisons hundreds of tests at once.
  */
class HarnessSpec extends SparkSuite {

  test("canon sort keys cannot collide across column boundaries") {
    import spark.implicits._
    // With cells joined by an EMPTY separator, (2.0,"3x") and (23.0,"x")
    // both keyed "23x": stable sortBy then preserves each side's INPUT
    // order on the tie, and two sides built in opposite orders pair
    // unrelated rows — a false parity failure at unlucky fuzz seeds.
    // The NUL (u0000) separator keys them apart; opposite input orders must
    // canonicalize identically.
    val a = Seq((2.0, "3x"), (23.0, "x")).toDF("d", "s")
    val b = Seq((23.0, "x"), (2.0, "3x")).toDF("d", "s")
    assert(canon(a).toSeq == canon(b).toSeq)
    assertParity(a, b)
  }

  test("keyStr keys DECIMAL cells like their DOUBLE/BIGINT twins") {
    // java.math.BigDecimal cells come out of Spark DECIMAL columns; their
    // toString renders "2.0" (scale 1) or "1E+2" (negative scale after
    // stripTrailingZeros) where the BIGINT/DOUBLE twin keys "2"/"100" —
    // the canonical orders diverge and the positional compare pairs
    // unrelated rows.
    assert(keyStr(new java.math.BigDecimal("2.0")) == "2")
    assert(keyStr(new java.math.BigDecimal("100.00")) == "100")
    assert(keyStr(new java.math.BigDecimal("20.0").stripTrailingZeros) == "20")
    assert(keyStr(new java.math.BigDecimal("2.50")) == "2.5")
    assert(keyStr(BigDecimal("3.0")) == "3")
    assert(keyStr(2L) == "2")
    assert(keyStr(java.lang.Double.valueOf(2.0)) == "2")
  }

  test("keyStr keys whole doubles >= 2^53 as plain integers, not scientific") {
    // String.valueOf(9007199254740994.0) is "9.007199254740994E15" —
    // scientific notation sorts differently from the BIGINT twin's
    // "9007199254740994" and diverges the canonical order.
    assert(keyStr(java.lang.Double.valueOf(9007199254740994.0)) == "9007199254740994")
    assert(keyStr(java.lang.Double.valueOf(1.0e18)) == "1000000000000000000")
    // non-whole / non-finite doubles keep their native rendering
    assert(keyStr(java.lang.Double.valueOf(2.5)) == "2.5")
    assert(keyStr(java.lang.Double.valueOf(Double.NaN)) == "NaN")
    assert(keyStr(java.lang.Double.valueOf(Double.PositiveInfinity)) == "Infinity")
  }

  test("keyStr-aligned canon pairs DECIMAL rows with their DOUBLE twins positionally") {
    import spark.implicits._
    // End-to-end: a DECIMAL(12,1) side and a DOUBLE side holding the same
    // values must canonicalize to the same row order so the cross-type
    // cell compare (string-form equality on "100.0") sees matched rows.
    val dec = Seq("100.0", "15.0").toDF("raw")
      .selectExpr("CAST(raw AS DECIMAL(12,1)) AS v")
    val dbl = Seq(15.0, 100.0).toDF("v")
    val decKeys = canon(dec).map(r => keyStr(r.get(0))).toSeq
    val dblKeys = canon(dbl).map(r => keyStr(r.get(0))).toSeq
    assert(decKeys == dblKeys, s"dec=$decKeys dbl=$dblKeys")
  }
}

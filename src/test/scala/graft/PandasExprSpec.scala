package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.PandasExpr

class PandasExprSpec extends AnyFunSuite {

  private def t(s: String) = PandasExpr.toSparkSql(s)

  test("keywords, equality, and booleans translate") {
    assert(t("a > 1 and b == 'x' or not c") == "a > 1 AND b = 'x' OR NOT c")
    assert(t("flag == True and other == None") == "flag = TRUE AND other = NULL")
    assert(t("(a > 1) & (b < 2) | ~c") == "( a > 1 ) AND ( b < 2 ) OR NOT c")
  }

  test("in / not in list literals become SQL IN lists") {
    assert(t("status in ['O', 'F']") == "status IN ( 'O' , 'F' )")
    assert(t("k not in [1, 2, 3]") == "k NOT IN ( 1 , 2 , 3 )")
  }

  test("double-quoted strings become escaped single-quoted SQL strings") {
    // \' not '' — Spark concatenates ADJACENT string literals, so
    // 'it''s' would silently parse as 'it' ++ 's' = 'its'
    assert(t("""name == "it's"""") == """name = 'it\'s'""")
    // 'and' inside a string literal is never rewritten
    assert(t("""name == "x and y"""") == "name = 'x and y'")
  }

  test("power and floor division on simple operands") {
    assert(t("a ** 2") == "POWER(a, 2)")
    assert(t("a ** -2 > 1") == "POWER(a, -2) > 1")
    assert(t("total // 1000 == 3") == "FLOOR(total / 1000) = 3")
  }

  test("backslash escapes survive: ordered unescape + Spark-SQL re-escape") {
    // python 'C:\\new' is backslash+n-e-w, NOT newline: the unescape scan
    // must consume \\ before looking at the n
    assert(t("""p == 'C:\\new'""") == """p = 'C:\\new'""")
    // a real newline escape re-emits as a literal newline character
    assert(t("""p == 'a\nb'""") == "p = 'a\nb'")
    // python keeps unknown escapes verbatim
    assert(t("""p == '\q'""") == """p = '\\q'""")
  }

  test("chained ** is rejected rather than silently left-associated") {
    assertThrows[IllegalArgumentException](t("x ** 2 ** 3"))
    // // is left-associative in python, so chaining IS correct
    assert(t("x // 2 // 3") == "FLOOR(FLOOR(x / 2) / 3)")
    assert(t("x ** 2 // 3") == "FLOOR(POWER(x, 2) / 3)")
  }

  test("python hex/unicode escapes are interpreted") {
    assert(t("""c == '\x41'""") == "c = 'A'")
    assert(t("c == '\\u0042'") == "c = 'B'")
  }

  test("backticked columns pass through") {
    assert(t("`my col` > 5 and `other col` == 'x'") == "`my col` > 5 AND `other col` = 'x'")
  }

  test("@variable references and complex power operands are rejected") {
    assertThrows[IllegalArgumentException](t("a > @threshold"))
    assertThrows[IllegalArgumentException](t("(a + b) ** 2"))
  }

  test("ieeeDivision opt-in wraps / and // in the Frame.ieeeDiv CASE") {
    val e = PandasExpr.toSparkSql("a / b", ieeeDivision = true)
    assert(e.contains("CASE WHEN CAST(a AS DOUBLE) IS NULL"))
    assert(e.contains("!= 0.0D THEN CAST(a AS DOUBLE) / CAST(b AS DOUBLE)"))
    assert(e.contains("CAST('Infinity' AS DOUBLE)"))
    // signed-zero divisor probe mirrors Frame.ieeeDiv's string cast
    assert(e.contains("STARTSWITH(CAST(CAST(b AS DOUBLE) AS STRING), '-')"))
    // // = floorDouble(ieeeDiv): the NaN/2^53 passthrough guard wraps it
    val f = PandasExpr.toSparkSql("x // 3", ieeeDivision = true)
    assert(f.contains("ISNAN") && f.contains("9.007199254740992E15"))
    assert(f.contains("CAST(FLOOR("))
    // left-associative chains stay legal (synthesized left operand)
    PandasExpr.toSparkSql("x / 2 / 3", ieeeDivision = true)
    PandasExpr.toSparkSql("x // 2 // 3", ieeeDivision = true)
    // default (flag off) stays ANSI: `/` passes through untouched,
    // deviation 16's documented boundary
    assert(t("a / b") == "a / b")
  }

  test("same-precedence left context is rejected, never misassociated") {
    // python is LEFT-associative across * / // %: `a * b / c` is (a*b)/c.
    // A tokenizer-level rewrite of `b / c` would silently compute
    // a * (b/c) — different rounding (1e-300 * 1e-300 / 1e-300 is 0.0 in
    // numpy, 1e-300 if misassociated) — so the rewrite refuses loudly
    // when the captured left operand is preceded by a same-precedence
    // operator, for every rewritten form (// always; / under ieee).
    assertThrows[IllegalArgumentException](
      PandasExpr.toSparkSql("a * b / c", ieeeDivision = true))
    assertThrows[IllegalArgumentException](
      PandasExpr.toSparkSql("a * b // c", ieeeDivision = true))
    assertThrows[IllegalArgumentException](t("a * b // c"))
    assertThrows[IllegalArgumentException](t("a % b // c"))
    // a RAW `/` before `//` (ieee off: `/` passes through untranslated)
    assertThrows[IllegalArgumentException](t("a / b // c"))
    // unary minus after a same-precedence operator is the same trap
    assertThrows[IllegalArgumentException](
      PandasExpr.toSparkSql("a * -b / c", ieeeDivision = true))
    // LOWER-precedence context stays legal: `/` binds tighter than +/-
    assert(PandasExpr.toSparkSql("a + b / c", ieeeDivision = true)
      .startsWith("a + (CASE"))
    assert(t("a - b // c") == "a - FLOOR(b / c)")
    // `**` binds TIGHTER than *: a * POWER(b, c) is already right
    assert(t("a * b ** 2") == "a * POWER(b, 2)")
  }

  test("unary sign before a division's left operand folds into the operand") {
    // python unary minus binds tighter than // and /: `-b // c` is
    // (-b) // c — leaving the sign OUTSIDE the synthesized FLOOR would
    // compute -floor(b/c), off by one whenever b/c is non-integral
    assert(t("-b // c") == "FLOOR((-b) / c)")
    assert(t("a + -b // c") == "a + FLOOR((-b) / c)")
    assert(t("(a, -b // c)") == "( a , FLOOR((-b) / c) )")
    // unary plus is a numeric no-op and just drops
    assert(t("+b // c") == "FLOOR(b / c)")
    // BINARY minus before the operand is lower precedence: sign stays out
    assert(t("a - b // c") == "a - FLOOR(b / c)")
    // ** keeps the python rule -a**b == -(a**b): sign stays OUTSIDE
    assert(t("-a ** 2") == "- POWER(a, 2)")
  }

  test("chained ieee divisions are depth-guarded, not exponentially expanded") {
    // each ieee `//` level re-expands its operand text ~16x (ieeeDivSql
    // references each operand 4x, floorDoubleSql its argument 4x); the
    // rewrite refuses unreviewably deep chains loudly (64 KiB budget:
    // two chained ieee // levels = 24 KiB, four ieee / levels = 28 KiB,
    // the next level of each is 390 KiB / 114 KiB)
    PandasExpr.toSparkSql("x // 2 // 3", ieeeDivision = true)
    val e = intercept[IllegalArgumentException](
      PandasExpr.toSparkSql("x // 2 // 3 // 4", ieeeDivision = true))
    assert(e.getMessage.contains("chain too deep"))
    PandasExpr.toSparkSql("x / 2 / 3 / 4 / 5", ieeeDivision = true)
    val e2 = intercept[IllegalArgumentException](
      PandasExpr.toSparkSql("x / 2 / 3 / 4 / 5 / 6", ieeeDivision = true))
    assert(e2.getMessage.contains("chain too deep"))
  }
}

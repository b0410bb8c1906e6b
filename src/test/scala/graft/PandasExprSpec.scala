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

  test("same-precedence left context folds left-associatively, never misassociates") {
    // python is LEFT-associative across * / // %: `a * b / c` is (a*b)/c.
    // A tokenizer-level rewrite of only `b / c` would silently compute
    // a * (b/c) — different rounding (1e-300 * 1e-300 / 1e-300 is 0.0 in
    // numpy, 1e-300 if misassociated) — so the rewrite folds the MAXIMAL
    // preceding same-precedence chain into the left operand, for every
    // rewritten form (// always; / under ieee).
    assert(t("a * b // c") == "FLOOR((a * b) / c)")
    // `%` is itself rewritten (python-sign modulo), so it reaches the
    // chain as a synthesized operand rather than a raw `%` token
    assert(t("a % b // c").startsWith("FLOOR((CASE WHEN (a % b) != 0"))
    // a RAW `/` in the chain (ieee off: `/` passes through untranslated)
    assert(t("a / b // c") == "FLOOR((a / b) / c)")
    assert(t("a * b * c // d") == "FLOOR((a * b * c) / d)")
    // the folded product is the IEEE CASE's dividend, verbatim
    assert(PandasExpr.toSparkSql("a * b / c", ieeeDivision = true)
      .contains("CAST((a * b) AS DOUBLE)"))
    assert(PandasExpr.toSparkSql("a * b // c", ieeeDivision = true)
      .contains("CAST((a * b) AS DOUBLE)"))
    // unary minus INSIDE the chain binds tighter than *: a * (-b) first
    assert(PandasExpr.toSparkSql("a * -b / c", ieeeDivision = true)
      .contains("CAST((a * (-b)) AS DOUBLE)"))
    assert(t("-a * b // c") == "FLOOR(((-a) * b) / c)")
    // a synthesized FLOOR from an earlier `//` participates in the chain
    assert(t("x // a * b // c") == "FLOOR((FLOOR(x / a) * b) / c)")
    // genuinely unfoldable left sides still reject loudly: `)` before a
    // same-precedence operator means the python operand is parenthesized
    assertThrows[IllegalArgumentException](t("(a + b) * c // d"))
    // LOWER-precedence context stays legal: `/` binds tighter than +/-
    assert(PandasExpr.toSparkSql("a + b / c", ieeeDivision = true)
      .startsWith("a + (CASE"))
    assert(t("a - b // c") == "a - FLOOR(b / c)")
    assert(t("a - b * c // d") == "a - FLOOR((b * c) / d)")
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

  test("% translates to python-sign modulo, not a raw pass-through") {
    // python % takes the DIVISOR's sign (-7 % 3 == 2), Spark/Java the
    // dividend's (-7 % 3 == -1) — a raw pass-through silently flips every
    // negative-operand modulo (found by PandasExprFuzzSpec's first run)
    assert(t("a % b") ==
      "(CASE WHEN (a % b) != 0 AND ((a % b) < 0) != ((b) < 0) " +
        "THEN (a % b) + b ELSE a % b END)")
    // same-precedence chain folds into the dividend like / and //
    assert(t("a * b % c").contains("((a * b) % c)"))
    assert(t("a % b // c").startsWith("FLOOR((CASE"))
    // ieee opt-in: nulls propagate, zero divisor -> NaN BEFORE the native
    // % can raise ANSI's REMAINDER_BY_ZERO
    val e = PandasExpr.toSparkSql("a % b", ieeeDivision = true)
    assert(e.contains("WHEN CAST(b AS DOUBLE) = 0.0D THEN CAST('NaN' AS DOUBLE)"))
    assert(e.contains("CAST(a AS DOUBLE) IS NULL"))
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

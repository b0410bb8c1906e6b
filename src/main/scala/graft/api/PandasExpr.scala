package graft.api

import scala.collection.mutable.ArrayBuffer

/**
 * Translates the pandas `DataFrame.query`/`eval` expression dialect into
 * Spark SQL (reference: `rowwise_query`, modin base query_compiler.py:3585,
 * which hands the string to pandas' own expression parser). A user porting
 * `df.query("a > 1 and b == 'x'")` should not have to learn that Spark
 * spells it `a > 1 AND b = 'x'`.
 *
 * Token-level rewriting over a real tokenizer (string/backtick literals are
 * opaque — `and` inside a string is never touched):
 *   - `and` / `or` / `not` / `&` / `|` / `~`  →  AND / OR / NOT
 *   - `==` → `=`; `!=`, `<=`, `>=`, `<`, `>` pass through
 *   - `True` / `False` / `None`  →  TRUE / FALSE / NULL
 *   - `x in [a, b]` / `x not in [a, b]`  →  x IN (a, b) / x NOT IN (a, b)
 *   - `a ** b` → POWER(a, b); `a // b` → FLOOR(a / b)  (simple operands:
 *     literals, identifiers, backticked columns, signed numbers)
 *   - double-quoted strings → single-quoted SQL strings; backtick-quoted
 *     column names pass through (both dialects use backticks)
 *   - `@variable` references raise: there is no enclosing Python scope —
 *     callers inline the value instead.
 *
 * Chained comparisons (`1 < a < 5`) and method calls (`a.str.len()`) are
 * outside the supported subset and surface as Spark analysis errors with
 * the translated text in hand.
 */
object PandasExpr {

  private sealed trait Tok { def s: String }
  private final case class StrLit(s: String) extends Tok
  private final case class Ident(s: String) extends Tok
  private final case class Num(s: String) extends Tok
  private final case class Op(s: String) extends Tok

  private val tokenRe =
    ("""\G\s*(?:("(?:[^"\\]|\\.)*")|('(?:[^'\\]|\\.)*')|(`[^`]*`)|""" +
      """([A-Za-z_][A-Za-z0-9_]*)|(\d+(?:\.\d*)?(?:[eE][+-]?\d+)?|\.\d+)|""" +
      """(\*\*|//|==|!=|<=|>=|[-+*/%<>&|~^(),\[\]])|(@))""").r

  private def tokenize(s: String): Vector[Tok] = {
    val out = ArrayBuffer.empty[Tok]
    var pos = 0
    while (pos < s.length) {
      tokenRe.findPrefixMatchOf(s.subSequence(pos, s.length)) match {
        case Some(m) =>
          if (m.group(1) != null) out += StrLit(m.group(1))
          else if (m.group(2) != null) out += StrLit(m.group(2))
          else if (m.group(3) != null) out += Ident(m.group(3))
          else if (m.group(4) != null) out += Ident(m.group(4))
          else if (m.group(5) != null) out += Num(m.group(5))
          else if (m.group(6) != null) out += Op(m.group(6))
          else throw new IllegalArgumentException(
            "@variable references are not supported in query/eval " +
              "(no enclosing Python scope) — inline the value instead")
          pos += m.end
        case None =>
          if (s.substring(pos).trim.isEmpty) pos = s.length
          else throw new IllegalArgumentException(
            s"cannot tokenize pandas expression at offset $pos: '${s.substring(pos)}'")
      }
    }
    out.toVector
  }

  /** SQL-escape a python string literal (either quote style) into '…'.
    * Unescaping is a single left-to-right scan (sequential replaces
    * corrupt an escaped backslash followed by n/t/quote); the emitted
    * literal re-escapes backslashes because Spark's SQL parser treats
    * backslash as an escape character inside string literals. */
  private def toSqlString(lit: String): String = {
    val body = lit.substring(1, lit.length - 1)
    val sb = new StringBuilder
    var i = 0
    while (i < body.length) {
      if (body.charAt(i) == '\\' && i + 1 < body.length) {
        body.charAt(i + 1) match {
          case 'n' => sb += '\n'
          case 't' => sb += '\t'
          case 'r' => sb += '\r'
          case c @ ('\\' | '\'' | '"') => sb += c
          case other => sb += '\\' += other // python keeps unknown escapes
        }
        i += 2
      } else { sb += body.charAt(i); i += 1 }
    }
    "'" + sb.toString.replace("\\", "\\\\").replace("'", "''") + "'"
  }

  private def isSimpleOperand(t: Tok): Boolean = t match {
    case Num(_) => true
    // synthesized POWER(..)/FLOOR(..) idents are excluded: accepting one
    // as a ** operand would translate python's RIGHT-associative
    // `x ** 2 ** 3` into left-associated POWER(POWER(x,2),3) silently
    case Ident(s) => s != "AND" && s != "OR" && s != "NOT" && s != "IN" &&
      !s.contains("(")
    case _ => false
  }

  def toSparkSql(pandasExpr: String): String = {
    // pass 1: keyword/operator/literal mapping
    var toks: Vector[Tok] = tokenize(pandasExpr).map {
      case Ident("and") => Op("AND")
      case Ident("or") => Op("OR")
      case Ident("not") => Op("NOT")
      case Ident("in") => Op("IN")
      case Ident("True") => Ident("TRUE")
      case Ident("False") => Ident("FALSE")
      case Ident("None") => Ident("NULL")
      case Op("==") => Op("=")
      case Op("&") => Op("AND")
      case Op("|") => Op("OR")
      case Op("~") => Op("NOT")
      case s: StrLit => StrLit(toSqlString(s.s))
      case t => t
    }

    // pass 2: `IN [ … ]` list literals → IN ( … )  (only the bracket pair
    // immediately after IN — stray brackets elsewhere are left for Spark
    // to reject with its own message)
    val b2 = ArrayBuffer.empty[Tok]
    var i = 0
    while (i < toks.length) {
      if (toks(i) == Op("IN") && i + 1 < toks.length && toks(i + 1) == Op("[")) {
        b2 += Op("IN") += Op("(")
        var depth = 1
        i += 2
        while (i < toks.length && depth > 0) {
          toks(i) match {
            case Op("[") => depth += 1; b2 += Op("(")
            case Op("]") => depth -= 1; if (depth > 0) b2 += Op(")")
            case t => b2 += t
          }
          i += 1
        }
        b2 += Op(")")
      } else { b2 += toks(i); i += 1 }
    }
    toks = b2.toVector

    // pass 3: `a ** b` → POWER(a, b), `a // b` → FLOOR(a / b) for simple
    // operands (optionally signed on the right)
    val b3 = ArrayBuffer.empty[Tok]
    i = 0
    while (i < toks.length) {
      val isPowOrFloor = toks(i) == Op("**") || toks(i) == Op("//")
      if (isPowOrFloor) {
        val fn = if (toks(i) == Op("**")) "POWER" else "FLOORDIV"
        if (b3.isEmpty || !isSimpleOperand(b3.last))
          throw new IllegalArgumentException(
            s"'${toks(i).s}' is supported only between simple operands " +
              s"(column, number); parenthesized sub-expressions are not — " +
              s"rewrite using POWER()/FLOOR() directly")
        val left = b3.remove(b3.length - 1)
        val (sign, next) =
          if (i + 1 < toks.length && toks(i + 1) == Op("-")) ("-", i + 2) else ("", i + 1)
        if (next >= toks.length || !isSimpleOperand(toks(next)))
          throw new IllegalArgumentException(
            s"'${toks(i).s}' right operand must be a simple column or number")
        val right = sign + toks(next).s
        if (fn == "POWER") b3 += Ident(s"POWER(${left.s}, $right)")
        else b3 += Ident(s"FLOOR(${left.s} / $right)")
        i = next + 1
      } else { b3 += toks(i); i += 1 }
    }

    b3.map(_.s).mkString(" ")
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * Native Catalyst expression: 64-bit SimHash of a token array.
 *
 * Semantics identical to [[graft.functions.Text.simhash]] (per-token
 * xxhash64 with Spark's default seed 42, ±1 vote per bit, majority
 * packs the output long) — but where the expression-tree version
 * materializes a 64-element vote array per token through
 * `aggregate`/`transform` lambdas, this compiles to a tight two-loop
 * Java kernel inside whole-stage codegen: one `long[64]` per ROW, one
 * xxhash per token. This is preference order (b) from the build rules:
 * a custom `Expression` with `doGenCode` beating both the lambda tree
 * and any UDF.
 *
 * (reference context: modin has no simhash; this backs the near-dup
 * pipeline ops in graft.ops.Dedup at 100 TB document scale.)
 */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      // a null token hashes to the seed itself (xxhash64 of null keeps
      // the accumulator at 42) — matching Text.simhash bit-for-bit
      val h =
        if (arr.isNullAt(i)) 42L
        else {
          val s = arr.getUTF8String(i)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        }
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val xxh = classOf[XXH64].getName.stripSuffix("$")
      s"""
         |int[] $votes = new int[64];
         |final int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h;
         |  if ($arr.isNullAt($i)) {
         |    $h = 42L; // xxhash64 of a null token keeps the seed (Text.simhash parity)
         |  } else {
         |    org.apache.spark.unsafe.types.UTF8String $s = $arr.getUTF8String($i);
         |    $h = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(),
         |      $s.numBytes(), 42L);
         |  }
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |${ev.value} = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) ${ev.value} |= (1L << $b);
         |}
       """.stripMargin
    })
}

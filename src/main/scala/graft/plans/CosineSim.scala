package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Native Catalyst expression: cosine similarity of two float vectors.
 *
 * Semantics identical to [[graft.functions.Similarity.cosine]] — each
 * float casts to double, three sequential left-fold accumulations
 * (dot, |a|², |b|²) — but compiled as one fused loop in whole-stage
 * codegen instead of three `zip_with`+`aggregate` lambda trees that
 * each materialize an intermediate array per row. The ANN scoring hot
 * path (corpus × queries) runs this once per candidate pair.
 */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  // float OR double elements, per side independently: fixture drops have
  // re-typed columns between rounds (events.ts three times), so the vector
  // kernels must not pin the storage width. Double input is consumed
  // as-is (no lossy down-cast — parity with a double-reading oracle holds);
  // float input upcasts exactly, as before.
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_cosine requires array<float|double> inputs, got (${l.catalogString}, ${r.catalogString})")
  }

  private def isDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  // element-type dispatch resolved once per expression instance — the
  // interpreted eval reads these inside its per-element loop
  @transient private lazy val leftIsDouble = isDouble(left)
  @transient private lazy val rightIsDouble = isDouble(right)
  override def dataType: DataType = DoubleType
  // Can return NULL from non-null inputs (length mismatch, null array
  // element) — must be declared, or with non-nullable children codegen
  // emits an assignment to a `false` literal and NullPropagation folds
  // IsNull(graft_cosine(..)) to false.
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // match the zip_with/aggregate fold exactly: a length mismatch pads
    // with null and a null element nulls the whole fold — return NULL,
    // never a silently-truncated score
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (leftIsDouble) x.getDouble(i) else x.getFloat(i).toDouble
      val yi = if (rightIsDouble) y.getDouble(i) else y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val getX = if (isDouble(left)) s"$x.getDouble($i)" else s"(double) $x.getFloat($i)"
      val getY = if (isDouble(right)) s"$y.getDouble($i)" else s"(double) $y.getFloat($i)"
      s"""
         |if ($x.numElements() != $y.numElements()) { ${ev.isNull} = true; }
         |else {
         |  final int $n = $x.numElements();
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; }
         |    else {
         |      double $xi = $getX;
         |      double $yi = $getY;
         |      $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })
}

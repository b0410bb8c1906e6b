package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * `graft_cosine(v, v)` specialized to one accumulator: computes
 * na = Σx² once and returns na / (√na · √na) — BIT-IDENTICAL to
 * [[CosineSim]] on identical children (including the ≈0.999… results
 * where √na·√na ≠ na in floating point, NaN for zero/empty vectors,
 * null for null elements) at a third of the multiplications. This is
 * what [[SelfCosineRule]] rewrites to: the rule is a pure cost
 * optimization, not a value change.
 */
case class SelfCosine(child: Expression) extends UnaryExpression {

  // float OR double elements, matching CosineSim's widened contract (the
  // rule must stay applicable to whatever vector width the fixture ships).
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"self_cosine requires array<float|double>, got ${other.catalogString}")
  }

  private def isDoubleElems: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def dataType: DataType = DoubleType
  // Null array elements yield NULL from a non-null input — declare it so
  // codegen/NullPropagation don't assume non-nullability (see CosineSim).
  override def nullable: Boolean = true
  override def prettyName: String = "graft_self_cosine"

  override protected def withNewChildInternal(newChild: Expression): SelfCosine =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    var na = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null // matches CosineSim's null-element rule
      val xi = if (isDoubleElems) x.getDouble(i) else x.getFloat(i).toDouble
      na += xi * xi
      i += 1
    }
    na / (math.sqrt(na) * math.sqrt(na))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val na = ctx.freshName("na")
      val xi = ctx.freshName("xi")
      val getX = if (isDoubleElems) s"$x.getDouble($i)" else s"(double) $x.getFloat($i)"
      s"""
         |final int $n = $x.numElements();
         |double $na = 0.0;
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($x.isNullAt($i)) { ${ev.isNull} = true; }
         |  else { double $xi = $getX; $na += $xi * $xi; }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $na / (Math.sqrt($na) * Math.sqrt($na));
         |}
       """.stripMargin
    })
}

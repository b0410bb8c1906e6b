package graft.plans

import org.apache.spark.sql.catalyst.expressions.{IsNull, If, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/**
 * Optimizer rule: `graft_cosine(v, v)` is 1.0 for any non-null, non-zero
 * vector — fold the whole O(d) per-row loop away at plan time,
 * null-preserving (`if v is null then null else 1.0`).
 *
 * The point is the extension mechanism as much as the rewrite: graft
 * registers expressions (injectFunction), AND plan rewrites
 * (injectOptimizerRule) through one SparkSessionExtensions entry point —
 * the pattern any heavier graft-specific optimization (e.g. collapsing
 * a self-join ANN probe) would follow.
 */
object SelfCosineRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSim(a, b) if a.deterministic && a.semanticEquals(b) =>
        If(IsNull(a), Literal(null, DoubleType), Literal(1.0, DoubleType))
    }
}

package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Optimizer rule: `graft_cosine(v, v)` → [[SelfCosine]]`(v)` — one
 * accumulator instead of three, value-identical in every case (FP
 * quirks, NaN-for-zero-vector, null elements included), so the rewrite
 * is a pure cost optimization and safe as an optimizer rule.
 *
 * The point is the extension mechanism as much as the rewrite: graft
 * registers expressions (injectFunction) AND plan rewrites
 * (injectOptimizerRule) through one SparkSessionExtensions entry point —
 * the pattern any heavier graft-specific optimization (e.g. collapsing
 * a self-join ANN probe) would follow.
 */
object SelfCosineRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSim(a, b) if a.deterministic && a.semanticEquals(b) =>
        SelfCosine(a)
    }
}

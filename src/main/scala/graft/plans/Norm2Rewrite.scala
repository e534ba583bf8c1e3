package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{DotProduct, Norm2}

/** Optimizer rewrite: `graft_dot(e, e)` → `graft_norm2(e)`.
  *
  * A self-dot walks the array twice per row through the two-argument
  * loop (two null checks and two element loads per step); [[Norm2]]
  * loads each element once and squares. Users — and generated SQL —
  * naturally write `graft_dot(emb, emb)` for a squared norm, so the
  * engine canonicalizes instead of trusting call sites. Registered via
  * [[graft.GraftExtensions]] (injectOptimizerRule) or post-hoc through
  * `spark.experimental.extraOptimizations` in
  * [[graft.GraftExtensions.install]].
  */
object Norm2Rewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotProduct(l, r) if l.deterministic && l.semanticEquals(r) =>
        Norm2(l)
    }
}

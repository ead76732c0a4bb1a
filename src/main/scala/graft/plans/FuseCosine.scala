package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{CosineSimilarity, DotProduct}

/** Optimizer rule: rewrite the composed cosine-similarity pattern
  *
  * {{{ graft_dot(a, b) / (sqrt(graft_dot(a, a)) * sqrt(graft_dot(b, b))) }}}
  *
  * into the fused single-pass [[CosineSimilarity]] expression. Users
  * (and generated SQL) naturally write the composed form; the fused
  * form traverses each array once instead of three times and is
  * bit-identical (same per-accumulator fold order, same final IEEE
  * combination — see ExtensionsSpec). One observable difference:
  * under ANSI mode the composed form throws DIVIDE_BY_ZERO on a
  * zero-norm vector where the fused form yields NaN — the rewrite
  * adopts the fused stance (a zero embedding is data corruption, not
  * a query error), identical to calling `graft_cosine` directly.
  * Registered via `GraftExtensions.injectOptimizerRule`.
  *
  * Matching is `semanticEquals`-based, so aliased or cosmetically
  * different subtrees still fuse.
  */
object FuseCosine extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(
          DotProduct(a1, b1),
          Multiply(Sqrt(DotProduct(a2, a3)), Sqrt(DotProduct(b2, b3)), _), _)
          if a2.semanticEquals(a3) && b2.semanticEquals(b3)
            && a1.semanticEquals(a2) && b1.semanticEquals(b2) =>
        CosineSimilarity(a1, b1)
    }
}

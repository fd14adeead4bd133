package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, IntegerLiteral}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.RoundBin

/** Optimizer rule: collapse provably-redundant `round_bin` quantizers.
  *
  * Oracle-compared pipelines round at every materialization boundary
  * (house rule: all compared doubles go through `round_bin`), so
  * compositions like `round_bin(min(round_bin(x, 2)), 2)` arise
  * naturally when one gated query consumes another's rounded output.
  * Two identities make the OUTER quantizer a no-op:
  *
  *  - `round_bin(round_bin(x, s1), s2)` with `s2 >= s1` — the value is
  *    already on the coarser grid (the converse is NOT an identity:
  *    half-up cascades differ, e.g. round2(round4(0.04495)) = 0.05 but
  *    round2(0.04495) = 0.04 — so the rule fires only on `s2 >= s1`);
  *  - `round_bin(min|max(round_bin(x, s1)), s2)` with `s2 >= s1` —
  *    min/max SELECT from the already-quantized value set (any other
  *    aggregate — sum, avg — leaves the grid and must keep its round).
  *
  * Registered both ways a production job would: via
  * [[graft.GraftExtensions]] (`injectOptimizerRule`, the
  * spark.sql.extensions path) and imperatively through
  * `spark.experimental.extraOptimizations` in
  * `GraftFunctions.install`. The rewrite is idempotent, so the rule
  * batches running twice reach the same fixed point.
  */
object RoundBinSimplify extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
  import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Project}

  /** Scale the expression is provably quantized at — either a direct
    * `round_bin` or an attribute aliased to one in the child Project
    * (ProjectCollapse does not fold projections under Aggregate, so
    * the quantizer usually sits one operator below the min/max). */
  private def gridScale(e: Expression, defs: Map[Long, Int]): Option[Int] = e match {
    case RoundBin(_, IntegerLiteral(s)) => Some(s)
    case ar: AttributeReference => defs.get(ar.exprId.id)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val aggRewritten = plan.transform {
      case agg: Aggregate =>
        val defs: Map[Long, Int] = agg.child match {
          case p: Project => p.projectList.collect {
            case a @ Alias(RoundBin(_, IntegerLiteral(s)), _) => a.exprId.id -> s
          }.toMap
          case _ => Map.empty
        }
        agg.transformExpressions {
          case RoundBin(ae: AggregateExpression, IntegerLiteral(s2))
              if (ae.aggregateFunction match {
                case Min(c) => gridScale(c, defs).exists(s2 >= _)
                case Max(c) => gridScale(c, defs).exists(s2 >= _)
                case _ => false
              }) =>
            ae
        }
    }
    aggRewritten.transformAllExpressions {
      case RoundBin(inner @ RoundBin(_, IntegerLiteral(s1)), IntegerLiteral(s2))
          if s2 >= s1 =>
        inner
    }
  }
}

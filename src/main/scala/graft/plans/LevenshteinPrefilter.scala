package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: prepend the classic edit-distance lower bound to
  * threshold predicates on `levenshtein`.
  *
  * `levenshtein(a, b) <= k` implies `abs(length(a) - length(b)) <= k`
  * (each edit changes the length by at most 1), so the rewrite
  *
  * {{{ levenshtein(a,b) <= k  ==>  abs(length(a)-length(b)) <= k
  *                                   AND levenshtein(a,b) <= k }}}
  *
  * is semantics-preserving, and because `And` short-circuits left to
  * right, rows failing the O(1) length test skip the O(|a|·|b|) dynamic
  * program entirely — the standard guard for fuzzy-matching filters over
  * a corpus where most candidate pairs differ wildly in length.
  *
  * Installed via [[GraftExtensions]] (`injectOptimizerRule`) or
  * `spark.experimental.extraOptimizations`. Runs inside a fixed-point
  * batch, so the rewrite tracks already-guarded (left, right) pairs to
  * stay idempotent. PlanRuleSuite asserts the injected bound, the
  * unchanged results, and the idempotence.
  */
object LevenshteinPrefilter extends Rule[LogicalPlan] {

  private def lenBound(mk: (Expression, Expression) => Expression,
      l: Expression, r: Expression, k: Expression): Expression =
    mk(Abs(Subtract(Length(l), Length(r))), k)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      // pairs already carrying a length-bound conjunct (from a previous
      // fixed-point iteration) — do not guard twice
      val guarded: Set[(Expression, Expression)] = cond.collect {
        case LessThanOrEqual(Abs(Subtract(Length(a), Length(b), _), _), _) =>
          (a.canonicalized, b.canonicalized)
        case LessThan(Abs(Subtract(Length(a), Length(b), _), _), _) =>
          (a.canonicalized, b.canonicalized)
      }.toSet
      def fresh(lev: Levenshtein): Boolean =
        !guarded((lev.left.canonicalized, lev.right.canonicalized))
      var changed = false
      val newCond = cond.transformUp {
        case orig @ LessThanOrEqual(lev: Levenshtein, k @ Literal(_, IntegerType))
            if fresh(lev) =>
          changed = true
          And(lenBound(LessThanOrEqual, lev.left, lev.right, k), orig)
        case orig @ LessThan(lev: Levenshtein, k @ Literal(_, IntegerType))
            if fresh(lev) =>
          changed = true
          And(lenBound(LessThan, lev.left, lev.right, k), orig)
        // reversed forms: k >= lev ≡ lev <= k, k > lev ≡ lev < k
        case orig @ GreaterThanOrEqual(k @ Literal(_, IntegerType), lev: Levenshtein)
            if fresh(lev) =>
          changed = true
          And(lenBound(LessThanOrEqual, lev.left, lev.right, k), orig)
        case orig @ GreaterThan(k @ Literal(_, IntegerType), lev: Levenshtein)
            if fresh(lev) =>
          changed = true
          And(lenBound(LessThan, lev.left, lev.right, k), orig)
      }
      if (changed) Filter(newCond, child) else f
  }
}

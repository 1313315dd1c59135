package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Catalyst optimizer rule: bounded edit-distance comparisons get a
  * cheap length-difference prefilter and an early-exit threshold.
  *
  *   `levenshtein(a, b) <= k`  ⇒
  *   `abs(length(a) - length(b)) <= k AND levenshtein(a, b, k) >= 0`
  *
  * Sound because edit distance is bounded below by the length
  * difference (each edit changes the length by at most 1), and
  * Spark's thresholded levenshtein returns the distance when ≤ k and
  * -1 otherwise. The rewrite turns the O(|a|·|b|) full DP into (1) a
  * codegen'd integer compare that prunes most candidate pairs of a
  * fuzzy join before any DP runs, and (2) a banded O(k·|a|) DP for
  * the survivors — the difference between a fuzzy self-join finishing
  * and not at corpus scale. Null semantics are preserved: a null
  * input nulls both forms, and a false guard implies the original
  * predicate was false (the bound).
  *
  * Injected by [[graft.functions.GraftExtensions]]; idempotent — the
  * rewritten levenshtein carries a threshold, which the matcher
  * excludes. */
object LevenshteinPrefilter extends Rule[LogicalPlan] {

  /** Match `levenshtein(a,b) <= k` / `< k` with a non-negative int
    * literal bound, DETERMINISTIC operands (the rewrite evaluates each
    * operand twice — duplicating a non-deterministic expression would
    * change results), and no threshold already present; normalize to
    * the inclusive bound. */
  private object Bounded {
    def unapply(e: Expression): Option[(Expression, Expression, Int)] = {
      val m = e match {
        case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 0 => Some((a, b, k))
        case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 1 => Some((a, b, k - 1))
        case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 0 => Some((a, b, k))
        case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 1 => Some((a, b, k - 1))
        case _ => None
      }
      m.filter { case (a, b, _) => a.deterministic && b.deterministic }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Bounded(a, b, k) =>
        And(
          LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), Literal(k)),
          GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k))), Literal(0)))
    }
}

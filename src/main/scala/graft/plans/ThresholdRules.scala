package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: bound levenshtein comparisons run the banded DP.
  *
  * `levenshtein(a, b) <= k` computes the full O(|a|·|b|) distance
  * matrix and then throws most of it away; Spark's three-argument
  * `levenshtein(a, b, k)` computes only the width-2k+1 band — O(k·n)
  * — and returns -1 when the distance exceeds k. The predicates are
  * equivalent rewrites:
  *
  *   d <= k  ⇔  levenshtein(a, b, k)   >= 0
  *   d <  k  ⇔  levenshtein(a, b, k-1) >= 0
  *   d >  k  ⇔  levenshtein(a, b, k)    = -1
  *   d >= k  ⇔  levenshtein(a, b, k-1)  = -1
  *
  * Null semantics are preserved: both the two- and three-argument
  * forms are null-intolerant, so a null input yields a null predicate
  * before and after the rewrite. Thresholds are kept strictly
  * positive (k, or k-1, >= 1) so the rewrite never manufactures a
  * degenerate band; non-literal or non-integer bounds are left alone.
  *
  * This is the plan-level form of the hand rewrite measured on
  * `dedup_fuzzy_verify` (full-matrix → banded: 9.8 s → 2.5 s at
  * sf0.1, BASELINE.md round 3): a SQL user writing the natural
  * `WHERE levenshtein(a, b) <= 2` gets the banded plan without
  * knowing the three-argument form exists. Registered through
  * [[graft.functions.GraftExtensions]] (injectOptimizerRule).
  */
object LevenshteinThresholdRule extends Rule[LogicalPlan] {

  private def intLit(e: Expression): Option[Int] = e match {
    case Literal(v: Int, IntegerType) => Some(v)
    case _ => None
  }

  private def banded(a: Expression, b: Expression, k: Int): Expression =
    Levenshtein(a, b, Some(Literal(k)))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(
      _.containsPattern(org.apache.spark.sql.catalyst.trees
        .TreePattern.BINARY_COMPARISON)) {
      // d <= k  /  k >= d
      case LessThanOrEqual(Levenshtein(a, b, None), kk)
          if intLit(kk).exists(_ >= 1) =>
        GreaterThanOrEqual(banded(a, b, intLit(kk).get), Literal(0))
      case GreaterThanOrEqual(kk, Levenshtein(a, b, None))
          if intLit(kk).exists(_ >= 1) =>
        GreaterThanOrEqual(banded(a, b, intLit(kk).get), Literal(0))
      // d < k  /  k > d
      case LessThan(Levenshtein(a, b, None), kk)
          if intLit(kk).exists(_ >= 2) =>
        GreaterThanOrEqual(banded(a, b, intLit(kk).get - 1), Literal(0))
      case GreaterThan(kk, Levenshtein(a, b, None))
          if intLit(kk).exists(_ >= 2) =>
        GreaterThanOrEqual(banded(a, b, intLit(kk).get - 1), Literal(0))
      // d > k  /  k < d
      case GreaterThan(Levenshtein(a, b, None), kk)
          if intLit(kk).exists(_ >= 1) =>
        EqualTo(banded(a, b, intLit(kk).get), Literal(-1))
      case LessThan(kk, Levenshtein(a, b, None))
          if intLit(kk).exists(_ >= 1) =>
        EqualTo(banded(a, b, intLit(kk).get), Literal(-1))
      // d >= k  /  k <= d
      case GreaterThanOrEqual(Levenshtein(a, b, None), kk)
          if intLit(kk).exists(_ >= 2) =>
        EqualTo(banded(a, b, intLit(kk).get - 1), Literal(-1))
      case LessThanOrEqual(kk, Levenshtein(a, b, None))
          if intLit(kk).exists(_ >= 2) =>
        EqualTo(banded(a, b, intLit(kk).get - 1), Literal(-1))
    }
}

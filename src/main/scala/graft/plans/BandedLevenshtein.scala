package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite threshold comparisons over the full Levenshtein
  * distance into Spark's banded 3-arg form.
  *
  * `levenshtein(a, b) <= k` computes the complete O(|a|·|b|) dynamic
  * program per pair and then throws most of it away; the banded form
  * `levenshtein(a, b, k)` only fills the 2k+1 diagonal band and early-exits
  * to -1 the moment the distance must exceed k — O(k·min(|a|,|b|)). In a
  * fuzzy-join verify stage evaluating millions of candidate pairs the
  * difference is the dominant cost (see [[graft.operators.FuzzyJoin]]).
  *
  * The rewrite `lev(a,b) <= k  →  lev(a,b,k) >= 0` is exact, including
  * null semantics (null input → null comparison on both sides). Applied
  * only for foldable non-negative integer thresholds; the banded form's
  * `Some(threshold)` no longer matches the pattern, so the rule is
  * idempotent.
  */
object BandedLevenshtein extends Rule[LogicalPlan] {

  private def threshold(e: Expression): Option[Int] = e match {
    case Literal(v: Int, IntegerType) if v >= 0 => Some(v)
    case _ => None
  }

  private def banded(l: Expression, r: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(l, r, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThanOrEqual(Levenshtein(l, r, None), k) if threshold(k).isDefined =>
      banded(l, r, threshold(k).get)
    case GreaterThanOrEqual(k, Levenshtein(l, r, None)) if threshold(k).isDefined =>
      banded(l, r, threshold(k).get)
    case LessThan(Levenshtein(l, r, None), k) if threshold(k).exists(_ >= 1) =>
      banded(l, r, threshold(k).get - 1)
    case GreaterThan(k, Levenshtein(l, r, None)) if threshold(k).exists(_ >= 1) =>
      banded(l, r, threshold(k).get - 1)
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.fuzzy.{BoundedFuzzyDistance, FuzzyDistance}

/** Catalyst optimizer rule: thresholded fuzzy-distance predicates written
  * with the plain kernel — `levenshtein_dist(a, b) <= 0.3` and its
  * `<` / `>=` / `>` / similarity mirrors, the natural form for SQL
  * clients — are rewritten to the banded [[BoundedFuzzyDistance]] kernel
  * the DataFrame matcher uses: length pre-bounds and an early-exit banded
  * DP (Ukkonen), so the rewrite is the difference between O(n·m) and
  * O(n·k) per pair on the crossjoin hot path.
  *
  * Safe because [[BoundedFuzzyDistance]] returns the EXACT distance
  * whenever it is <= maxDist and 2.0 otherwise (every true distance is in
  * [0, 1]) — indistinguishable from [[FuzzyDistance]] under the matched
  * comparison. Only the comparison NODE is rewritten, never a bare
  * distance in a projection, so no observable value changes. Null
  * semantics are identical (both are null-safe binary expressions).
  *
  * Runs in the user-provided optimizer batch, i.e. after constant
  * folding, so SQL decimal literals have already collapsed to foldable
  * doubles. Registered by [[graft.GraftExtensions]]; DataFrame callers go
  * through `FuzzyMatcher`, which emits the bounded kernel directly.
  */
object BoundedDistanceRewrite extends Rule[LogicalPlan] {

  private object Threshold {
    def unapply(e: Expression): Option[Double] = e match {
      case Literal(d: Double, DoubleType) => Some(d)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // dist <= t  /  dist < t
      case c @ LessThanOrEqual(d: FuzzyDistance, Threshold(t)) =>
        c.copy(left = bounded(d, t))
      case c @ LessThan(d: FuzzyDistance, Threshold(t)) =>
        c.copy(left = bounded(d, t))
      // t >= dist  /  t > dist
      case c @ GreaterThanOrEqual(Threshold(t), d: FuzzyDistance) =>
        c.copy(right = bounded(d, t))
      case c @ GreaterThan(Threshold(t), d: FuzzyDistance) =>
        c.copy(right = bounded(d, t))
      // similarity form: (1.0 - dist) >= s  ⟺  dist <= 1 - s (and mirrors)
      case c @ GreaterThanOrEqual(Subtract(Threshold(one), d: FuzzyDistance, _), Threshold(s))
          if one == 1.0 =>
        c.copy(left = Subtract(Literal(1.0), bounded(d, 1.0 - s)))
      case c @ LessThanOrEqual(Threshold(s), Subtract(Threshold(one), d: FuzzyDistance, _))
          if one == 1.0 =>
        c.copy(right = Subtract(Literal(1.0), bounded(d, 1.0 - s)))
    }

  private def bounded(d: FuzzyDistance, maxDist: Double): BoundedFuzzyDistance =
    BoundedFuzzyDistance(d.left, d.right, d.algo, maxDist)
}

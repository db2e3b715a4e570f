package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Abs, And, Expression, GreaterThan, GreaterThanOrEqual, Length, LessThan, LessThanOrEqual, Levenshtein, Literal, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType
import graft.functions.expressions.DamerauLevenshtein

/** Optimizer rule: in front of every thresholded edit-distance
  * comparison — `levenshtein(a, b) ≤ k` (Spark built-in) or
  * `graft damerau(a, b) ≤ k` — inject the cheap NECESSARY condition
  * `abs(length(a) − length(b)) ≤ k`, so the O(|a|·|b|) dynamic program
  * only runs on rows that could possibly pass. Every unit-cost edit
  * operation (insert/delete/substitute/transpose) changes a string's
  * length by at most 1, so `dist ≥ |len(a) − len(b)|` always: the guard
  * is IMPLIED by the comparison, which makes `guard AND cmp ≡ cmp` in
  * ANY boolean context (conjunction, disjunction, negation) — the
  * rewrite never changes results, it only gives the runtime a
  * short-circuit that skips the DP.
  *
  * This is the guard [[graft.ops.FuzzyJoin]] writes by hand, promoted to
  * the optimizer so ad-hoc SQL and Column users get it for free — on
  * `Filter` conditions and `Join` conditions alike (in a join it prunes
  * the candidate pair BEFORE the quadratic verifier, which is where it
  * matters at scale).
  *
  * Idempotence: a comparison whose guard already appears anywhere in
  * the same condition tree (semantically) is left alone, so the
  * fixed-point optimizer loop adds each guard exactly once.
  *
  * Registered by [[graft.GraftExtensions]] via `injectOptimizerRule`.
  */
object EditDistanceGuardRule extends Rule[LogicalPlan] {

  /** (left, right) when `e` is a guardable edit-distance expression. */
  private def distanceArgs(e: Expression): Option[(Expression, Expression)] = e match {
    // the 3-arg (thresholded) levenshtein already bails out internally;
    // guard only the full-DP 2-arg form
    case l: Levenshtein if l.threshold.isEmpty => Some((l.left, l.right))
    case d: DamerauLevenshtein => Some((d.left, d.right))
    case _ => None
  }

  private def guardFor(a: Expression, b: Expression, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k)

  private def smallIntLiteral(e: Expression): Boolean = e match {
    case Literal(_, IntegerType) => true
    case Literal(_, org.apache.spark.sql.types.LongType) => true
    case _ => false
  }

  /** STRUCTURAL already-guarded check: constant folding rewrites the
    * injected guard on later optimizer passes (`length("martha")` → 6),
    * so exact semantic equality against a freshly-built guard misses it
    * and the fixed-point loop would stack guards. Instead: any
    * `abs(…) ≤/ < …` whose subtree takes `length` of one of this
    * comparison's string arguments counts as its guard.
    */
  private def hasGuardFor(condition: Expression, a: Expression, b: Expression): Boolean = {
    def guardsArg(absChild: Expression): Boolean = absChild.exists {
      case Length(x) => x.semanticEquals(a) || x.semanticEquals(b)
      case _ => false
    }
    condition.exists {
      case LessThanOrEqual(abs: Abs, _) => guardsArg(abs.child)
      case LessThan(abs: Abs, _) => guardsArg(abs.child)
      case _ => false
    }
  }

  private def addGuards(condition: Expression): Expression = {
    def maybeGuard(cmp: Expression, d: Expression, k: Expression): Expression =
      distanceArgs(d) match {
        case Some((a, b)) if !hasGuardFor(condition, a, b) => And(guardFor(a, b, k), cmp)
        case _ => cmp
      }
    condition transformUp {
      case cmp @ LessThanOrEqual(d, k) if smallIntLiteral(k) => maybeGuard(cmp, d, k)
      case cmp @ LessThan(d, k) if smallIntLiteral(k) => maybeGuard(cmp, d, k)
      // k >= dist / k > dist spellings of the same comparisons
      case cmp @ GreaterThanOrEqual(k, d) if smallIntLiteral(k) => maybeGuard(cmp, d, k)
      case cmp @ GreaterThan(k, d) if smallIntLiteral(k) => maybeGuard(cmp, d, k)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, _) =>
      val guarded = addGuards(cond)
      if (guarded.fastEquals(cond)) f else f.copy(condition = guarded)
    case j @ Join(_, _, _, Some(cond), _) =>
      val guarded = addGuards(cond)
      if (guarded.fastEquals(cond)) j else j.copy(condition = Some(guarded))
  }
}

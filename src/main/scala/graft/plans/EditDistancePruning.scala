package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (the `Rule[LogicalPlan]` tier of the extension
  * surface, injected through `SparkSessionExtensions` alongside the
  * native functions): length pruning for edit-distance predicates.
  *
  * `levenshtein(a, b) <= k` implies `abs(length(a) - length(b)) <= k`
  * — every insert/delete changes the length by one — so the rule
  * prepends the O(1) length guard to the O(|a|·|b|) dynamic program
  * inside the same conjunction. Whole-stage codegen evaluates the
  * conjunction left-to-right with short-circuiting, so candidate
  * pairs whose lengths already rule them out never run the DP. This
  * is the reference's reduction-factor idea (reference:
  * query/TableStats.java computeReductionFactor) applied INSIDE a
  * predicate: a cheap necessary condition screens an expensive exact
  * one.
  *
  * Null semantics are unchanged (null lengths make the guard null,
  * exactly as the DP comparison would be), and idempotence is
  * guaranteed by skipping predicates already guarded.
  */
object EditDistancePruning extends Rule[LogicalPlan] with PredicateHelper {

  private def lengthGuard(a: Expression, b: Expression, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val guarded = conjuncts.flatMap {
        case cmp @ LessThanOrEqual(Levenshtein(a, b, _), k: Literal) =>
          val g = lengthGuard(a, b, k)
          if (conjuncts.exists(_.semanticEquals(g))) Seq(cmp) else Seq(g, cmp)
        case cmp @ LessThan(Levenshtein(a, b, _), k: Literal) =>
          val g = lengthGuard(a, b, k)
          if (conjuncts.exists(_.semanticEquals(g))) Seq(cmp) else Seq(g, cmp)
        case other => Seq(other)
      }
      if (guarded.length == conjuncts.length) f
      else Filter(guarded.reduce(And), child)
  }
}

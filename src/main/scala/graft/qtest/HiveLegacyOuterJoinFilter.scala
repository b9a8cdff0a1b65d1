package graft.qtest

import org.apache.spark.sql.catalyst.expressions.{And, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.{FullOuter, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Hive 1.2's OUTER-JOIN ON-clause filter placement UNDER
  * `hive.outerjoin.supports.filters=false`, golden-pinned by
  * join_filters.q / auto_join_filters.q / join_1to1.q (each runs its
  * query battery twice — standard semantics first, then again after
  * `SET hive.outerjoin.supports.filters=false`): with the flag off, an
  * ON conjunct that references only ONE side of an outer join is
  * applied as a FILTER ON THAT SIDE'S INPUT — including the PRESERVED
  * side, whose non-qualifying rows are dropped entirely instead of
  * null-extended (`FROM a LEFT OUTER JOIN b ON a.key > 40 AND …` loses
  * the a-rows with key <= 40). The old JoinPPD transferred these
  * "during-join" single-alias predicates to the joined table's
  * TableScan filter when filter support was off (ref
  * ql/ppd/OpProcFactory.java JoinPPD.getQualifiedAliases +
  * auto_join_filters.q.out lines 26-128), which is this transform.
  *
  * Registered ONLY in the QtestRunner session (extraOptimizations) —
  * the library front door keeps SQL-standard outer joins. It runs in
  * the optimizer's user-provided batch, after Spark's own pushdown has
  * already moved the non-preserved-side conjuncts, so the transform
  * sees and relocates the preserved-side leftovers. `enabled` reads
  * the live hiveconf so mid-script SETs take effect per statement. */
class HiveLegacyOuterJoinFilter(enabled: () => Boolean)
    extends Rule[LogicalPlan] with PredicateHelper {
  /** Only plain comparisons over bare column references and literals
    * transfer — a COMPUTED single-side predicate (cast arithmetic like
    * `b.key*10 < '1000'`, struct-field access like `b.kv.key > 200`)
    * stays a during-join filter even with the flag off (mapjoin1.q
    * golden keeps 238 null-extended while join_filters.q's plain
    * `a.key > 40` conjuncts pre-filter): Hive's ExprWalker pushdown
    * only transferred predicates whose expressions it could map back
    * to the input RowResolver verbatim. */
  private def plainComparison(e: Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    def bare(x: Expression): Boolean = x match {
      case _: AttributeReference | _: Literal => true
      case _ => false
    }
    e match {
      case b: BinaryComparison => bare(b.left) && bare(b.right)
      case IsNull(c) => bare(c)
      case IsNotNull(c) => bare(c)
      case Not(inner) => plainComparison(inner)
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled()) plan else plan.transform {
    case j @ Join(left, right, jt @ (LeftOuter | RightOuter | FullOuter),
        Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      def oneSided(side: LogicalPlan)(e: Expression): Boolean =
        e.deterministic && e.references.nonEmpty &&
          e.references.subsetOf(side.outputSet) && plainComparison(e)
      val (leftOnly, rest1) = conjuncts.partition(oneSided(left))
      val (rightOnly, rest) = rest1.partition(oneSided(right))
      if (leftOnly.isEmpty && rightOnly.isEmpty) j
      else {
        val newLeft =
          if (leftOnly.isEmpty) left else Filter(leftOnly.reduce(And), left)
        val newRight =
          if (rightOnly.isEmpty) right
          else Filter(rightOnly.reduce(And), right)
        Join(newLeft, newRight, jt, rest.reduceOption(And), hint)
      }
  }
}

package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Metadata-only COUNT(*) answering — the Spark realization of Hive's
  * StatsOptimizer (reference: ql/optimizer/StatsOptimizer.java:89-94,
  * gated there by hive.compute.query.using.stats): a bare
  * `SELECT count(*) FROM t` over an ANALYZEd table collapses to a
  * LocalRelation carrying the catalog row count, skipping the scan.
  *
  * Gated OFF by default (`spark.graft.statsOptimizer.enabled`) with the
  * same caveat as the reference: catalog stats must be trusted (stale
  * stats after out-of-band writes would be served verbatim).
  */
case class StatsCountRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.statsOptimizer.enabled")
      .contains("true")

  private def isCountStar(e: Any): Boolean = e match {
    // filter must be None: count(*) FILTER (WHERE p) cannot be answered
    // from the catalog row count (the reference rule likewise only fires
    // on unfiltered count(*)).
    case Alias(AggregateExpression(Count(Seq(Literal(1, _))), Complete, false, None, _), _) => true
    case _ => false
  }

  /** Bare relation, possibly under the pure column-pruning Project the
    * optimizer inserts beneath a count-only Aggregate. */
  private def bareRelation(p: LogicalPlan): Option[LogicalRelation] = p match {
    case rel: LogicalRelation => Some(rel)
    case Project(projectList, rel: LogicalRelation)
        if projectList.forall(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Attribute]) =>
      Some(rel)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case agg @ Aggregate(Nil, exprs, child, _)
          if exprs.nonEmpty && exprs.forall(isCountStar) &&
            bareRelation(child).exists(
              _.catalogTable.flatMap(_.stats).flatMap(_.rowCount).isDefined) =>
        val n = bareRelation(child).get
          .catalogTable.flatMap(_.stats).flatMap(_.rowCount).get
        LocalRelation(
          agg.output.map(_.toAttribute),
          Seq(InternalRow.fromSeq(exprs.map(_ => n.toLong))))
    }
}

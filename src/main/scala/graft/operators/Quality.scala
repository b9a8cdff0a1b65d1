package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking — the validation gate a
  * training-data pipeline runs before a corpus snapshot is promoted
  * (the public pattern: completeness / uniqueness / range / pattern /
  * membership checks compiled to one aggregation pass).
  *
  * Scale shape: every requested metric compiles into a single
  * `df.agg(...)` — ONE scan of the input regardless of how many
  * constraints are declared, all of it map-side combinable (the
  * uniqueness counts go through Spark's Expand-based multi-distinct,
  * still one scan). The one-row aggregate is materialized driver-side
  * (it is one row — the corrMatrix contract) and fanned out into one
  * report row per constraint, so the fan-out cannot regress into
  * per-constraint rescans if exchange reuse fails to fire.
  *
  * Determinism: every metric is a single division of two exact longs,
  * bit-identical to a SQL oracle's replay; no float accumulation.
  */
object Quality {

  /** A constraint over one column. `metric` is the observed fraction
    * (or ratio), `minFraction` the pass threshold. */
  sealed trait Constraint {
    def column: String
    def minFraction: Double
    def label: String
  }

  /** Fraction of rows with a non-NULL value. */
  final case class Complete(column: String, minFraction: Double = 1.0)
      extends Constraint { val label = "complete" }

  /** Distinct non-NULL values over non-NULL rows (1.0 = unique). */
  final case class Unique(column: String, minFraction: Double = 1.0)
      extends Constraint { val label = "unique" }

  /** Fraction of non-NULL values inside [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double,
      minFraction: Double = 1.0)
      extends Constraint { val label = s"in_range[$lo,$hi]" }

  /** Fraction of non-NULL values matching the (Java) regex. */
  final case class Matches(column: String, regex: String,
      minFraction: Double = 1.0)
      extends Constraint { val label = s"matches[$regex]" }

  /** Fraction of non-NULL values inside the allowed set. */
  final case class InSet(column: String, values: Seq[String],
      minFraction: Double = 1.0)
      extends Constraint { val label = "in_set" }

  /** Compile `constraints` into one aggregation pass and report one row
    * per constraint: (constraint, column, metric, threshold, passed).
    * On empty input (or an all-NULL column for the non-NULL-scoped
    * metrics) the metric is NULL and the constraint passes vacuously —
    * emptiness itself is a row-count check, not a fraction check. */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "need at least one constraint")
    val satisfied: Seq[(Constraint, Column)] = constraints.map { c =>
      val v = col(c.column)
      c -> (c match {
        case _: Complete      => v.isNotNull
        case _: Unique        => lit(null) // counted via distinct below
        case r: InRange       =>
          v.isNotNull && v.cast("double").between(r.lo, r.hi)
        case m: Matches       => v.isNotNull && v.rlike(m.regex)
        case s: InSet         => v.isNotNull && v.isin(s.values: _*)
      })
    }
    val aggs = satisfied.zipWithIndex.flatMap { case ((c, sat), i) =>
      val v = col(c.column)
      c match {
        case _: Unique => Seq(
          countDistinct(v).as(s"__hit_$i"),
          count(v).as(s"__base_$i"))
        case _: Complete => Seq(
          count(when(sat, lit(1))).as(s"__hit_$i"),
          count(lit(1)).as(s"__base_$i"))
        case _ => Seq(
          count(when(sat, lit(1))).as(s"__hit_$i"),
          count(v).as(s"__base_$i"))
      }
    }
    val aggOnce = df.agg(aggs.head, aggs.tail: _*)
    // one row, pinned — the fan-out below must not re-trigger the scan
    val one = df.sparkSession.createDataFrame(
      java.util.Collections.singletonList(aggOnce.head()), aggOnce.schema)
    val rows = constraints.zipWithIndex.map { case (c, i) =>
      val hit = col(s"__hit_$i").cast("double")
      val base = col(s"__base_$i")
      val metric = when(base === 0, lit(null).cast("double"))
        .otherwise(hit / base.cast("double"))
      one.select(
        lit(c.label).as("constraint"),
        lit(c.column).as("column"),
        metric.as("metric"),
        lit(c.minFraction).as("threshold"),
        (metric.isNull || metric >= c.minFraction).as("passed"))
    }
    rows.reduce(_ unionByName _)
  }
}

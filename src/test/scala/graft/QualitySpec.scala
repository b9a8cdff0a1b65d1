package graft

import graft.operators.Quality
import graft.operators.Quality._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def report(df: org.apache.spark.sql.DataFrame,
      cs: Seq[Constraint]): Map[String, (Option[Double], Boolean)] =
    Quality.check(df, cs).collect()
      .map(r => s"${r.getString(0)}:${r.getString(1)}" ->
        (Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(4)))
      .toMap

  test("check: completeness, uniqueness, range, pattern, set metrics") {
    val df = Seq(
      (Some(1L), Some("en"), Some(10.0), Some("srcA")),
      (Some(2L), Some("fr"), Some(20.0), Some("srcB")),
      (Some(2L), Some("DE"), Some(999.0), Some("other")),
      (Some(3L), None, None, Some("srcA"))
    ).toDF("id", "lang", "score", "src")
    val out = report(df, Seq(
      Complete("lang", minFraction = 0.9),
      Unique("id"),
      InRange("score", 0.0, 100.0, minFraction = 0.5),
      Matches("lang", "^[a-z]{2}$", minFraction = 0.5),
      InSet("src", Seq("srcA", "srcB"), minFraction = 0.7)))
    assert(out("complete:lang") == (Some(0.75), false))
    assert(out("unique:id") == (Some(0.75), false)) // 3 distinct / 4
    // range/pattern/set fractions are over NON-NULL rows
    assert(out("in_range[0.0,100.0]:score") == (Some(2.0 / 3), true))
    assert(out("matches[^[a-z]{2}$]:lang") == (Some(2.0 / 3), true))
    assert(out("in_set:src") == (Some(0.75), true))
  }

  test("check: empty input and all-NULL column pass vacuously") {
    val empty = Seq.empty[(Option[Long], Option[String])].toDF("id", "s")
    val out = report(empty, Seq(Complete("id"), Unique("id"),
      Matches("s", "x")))
    assert(out.values.forall { case (m, p) => m.isEmpty && p })
    val allNull = Seq((Option.empty[String], 1), (None, 2)).toDF("s", "i")
    val out2 = report(allNull, Seq(Complete("s"), Matches("s", "x")))
    assert(out2("complete:s") == (Some(0.0), false)) // over ALL rows
    assert(out2("matches[x]:s") == (None, true)) // over non-NULL rows
  }

  test("check compiles to one aggregation over the input") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val out = Quality.check(df, Seq(Complete("id"), Unique("id"),
      Matches("s", "^[ab]$"), InSet("s", Seq("a", "b")),
      InRange("id", 0, 10)))
    // the fan-out reads a materialized one-row local relation — no
    // constraint row may re-trigger a scan of the input
    assert(out.queryExecution.optimizedPlan.collect {
      case s: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => s
    }.nonEmpty)
    assert(out.count() == 5)
  }
}

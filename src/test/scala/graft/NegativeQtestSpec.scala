package graft

import graft.qtest.QtestRunner

/** The reference's expected-error surface, run VERBATIM: every script in
  * `src/test/resources/qtest_negative.txt` (curated from
  * ql/src/test/queries/clientnegative by the NegativeDrive discovery
  * loop) must be REJECTED by the engine — some statement raises a parse/
  * analysis/runtime error, matching the reference's golden `.q.out`
  * ending in a FAILED: SemanticException/ParseException line.
  *
  * Parity here is a comparable REJECTION, not text-equal error copy
  * (different engine, different message catalog) — the same standard the
  * reference applies across engines (its Tez/Spark golden variants also
  * differ in error text). Scripts the engine ACCEPTS are either real
  * fidelity gaps (tracked in SURVEY.md §5) or out-of-engine-scope
  * surfaces (authorization/archive/protect-mode metadata the engine
  * deliberately no-ops).
  *
  * Requires /root/reference checked out (read-only); skips cleanly when
  * absent so the suite stays green outside the build container.
  */
class NegativeQtestSpec extends SparkSpec {

  private val refRoot = sys.env.getOrElse("GRAFT_REF_ROOT", "/root/reference")

  private lazy val scripts: Seq[String] = {
    val res = getClass.getResourceAsStream("/qtest_negative.txt")
    require(res != null, "qtest_negative.txt resource missing")
    val src = scala.io.Source.fromInputStream(res)(scala.io.Codec.UTF8)
    try src.getLines().map(_.trim)
      .filterNot(l => l.isEmpty || l.startsWith("#")).toList
    finally src.close()
  }

  test("reference clientnegative scripts are rejected like the goldens") {
    assume(new java.io.File(refRoot).isDirectory,
      s"reference checkout not present at $refRoot")
    val runner = new QtestRunner(spark, refRoot)
    val accepted = scripts.flatMap { s =>
      val r =
        try runner.runNegative(s)
        catch { case e: Exception =>
          // a harness-level throw is still a rejection of the script
          runner.NegativeResult(s, 0, Some(-1),
            Some(e.getClass.getSimpleName),
            Some(Option(e.getMessage).getOrElse("").take(150)))
        }
      if (r.rejected) None else Some(s)
    }
    info(s"${scripts.size} negative scripts, ${accepted.size} wrongly accepted")
    assert(accepted.isEmpty,
      s"scripts ran clean but must be rejected: ${accepted.take(15).mkString(", ")}")
    assert(scripts.size >= 50, "negative list shrank below the round-9 bar")
  }
}

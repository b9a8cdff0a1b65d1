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
    // A rejection only counts when it came from STATEMENT EXECUTION
    // (rejectedAt >= 0): a missing script file or a runner routing
    // fault reaching this level is a harness error, not evidence the
    // engine enforces the rule the script pins (ADVICE r09).
    val harnessErrors = scala.collection.mutable.ListBuffer.empty[String]
    val accepted = scripts.flatMap { s =>
      try {
        val r = runner.runNegative(s)
        if (r.rejected && r.rejectedAt.exists(_ >= 0)) None else Some(s)
      } catch { case e: Exception =>
        harnessErrors += s"$s: ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").take(150)
        None
      }
    }
    info(s"${scripts.size} negative scripts, ${accepted.size} wrongly " +
      s"accepted, ${harnessErrors.size} harness errors")
    assert(harnessErrors.isEmpty,
      s"harness faults (not rejections): ${harnessErrors.take(10).mkString("; ")}")
    assert(accepted.isEmpty,
      s"scripts ran clean but must be rejected: ${accepted.take(15).mkString(", ")}")
    assert(scripts.size >= 50, "negative list shrank below the round-9 bar")
  }
}

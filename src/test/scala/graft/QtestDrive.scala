package graft

import graft.qtest.QtestRunner

/** Batch driver over candidate reference qtest scripts: runs each and
  * prints PASS/FAIL with the first mismatch — the discovery loop used to
  * curate QtestSpec's green list. Usage:
  *   sbt "Test/runMain graft.QtestDrive join1.q join2.q …"
  *   sbt "Test/runMain graft.QtestDrive @/tmp/candidates.txt"
  */
object QtestDrive {
  def main(args: Array[String]): Unit = {
    val scripts: Seq[String] =
      if (args.isEmpty) Seq("join1.q")
      else if (args(0).startsWith("@"))
        scala.io.Source.fromFile(args(0).drop(1)).getLines()
          .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toSeq
      else args.toSeq
    val spark = SparkSpec.session
    val runner = new QtestRunner(spark)
    var pass = 0
    scripts.foreach { s =>
      val t0 = System.nanoTime()
      val r =
        try runner.run(s)
        catch { case e: Exception =>
          runner.ScriptResult(s, 0, Nil, Some(
            s"harness: ${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").take(300)))
        }
      val secs = (System.nanoTime() - t0) / 1e9
      val diag =
        (if (r.emptyEchoAligns > 0) s", ${r.emptyEchoAligns} empty-echo" else "") +
        (if (r.collectRetries > 0) s", ${r.collectRetries} collect-retries" else "")
      if (r.ok) { pass += 1; println(f"QTEST PASS $s (${r.queriesChecked} queries, $secs%.1fs$diag)") }
      else {
        val why = r.error.getOrElse(
          r.mismatches.headOption.map(m =>
            s"${m.detail}\n  stmt: ${m.stmt}").getOrElse("no queries checked"))
        println(s"QTEST FAIL $s (${r.queriesChecked} checked, " +
          f"${r.mismatches.length} mismatched, $secs%.1f s): $why")
        if (sys.env.contains("QTEST_VERBOSE"))
          r.mismatches.drop(1).foreach(m =>
            println(s"  ALSO: ${m.detail}\n  stmt: ${m.stmt}"))
      }
    }
    println(s"QTEST TOTAL: $pass/${scripts.length} pass")
  }
}

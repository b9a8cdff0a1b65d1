package graft

import graft.qtest.QtestRunner

/** Discovery drive over reference clientnegative scripts: runs each and
  * prints whether the engine REJECTS it (parity with the reference's
  * FAILED golden) or ACCEPTS it (a fidelity gap worth reading). Used to
  * curate NegativeQtestSpec's list. Usage:
  *   sbt "Test/runMain graft.NegativeDrive"            (all scripts)
  *   sbt "Test/runMain graft.NegativeDrive @file"      (listed scripts)
  */
object NegativeDrive {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(
      "/root/reference/ql/src/test/queries/clientnegative")
    val scripts: Seq[String] =
      if (args.isEmpty) dir.list().filter(_.endsWith(".q")).sorted.toSeq
      else if (args(0).startsWith("@"))
        scala.io.Source.fromFile(args(0).drop(1)).getLines()
          .map(_.trim).filter(_.nonEmpty).toSeq
      else args.toSeq
    val spark = SparkSpec.session
    val runner = new QtestRunner(spark)
    var rejected = 0
    scripts.foreach { s =>
      val r =
        try runner.runNegative(s)
        catch { case e: Exception =>
          runner.NegativeResult(s, 0, Some(-1),
            Some("harness:" + e.getClass.getSimpleName),
            Some(Option(e.getMessage).getOrElse("").take(150)))
        }
      if (r.rejected) {
        rejected += 1
        println(s"QNEG REJECT $s @${r.rejectedAt.get}/${r.stmts} " +
          s"${r.exception.get}: ${r.message.get.replaceAll("\\s+", " ").take(120)}")
      } else println(s"QNEG ACCEPT $s (${r.stmts} stmts ran clean)")
    }
    println(s"QNEG TOTAL: $rejected/${scripts.length} rejected")
  }
}

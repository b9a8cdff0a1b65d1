package graft

import graft.qtest.QtestRunner

/** Debug drive: run a script's statements up to N, then print the
  * runner's DESC FORMATTED render for a table next to the golden. */
object DescDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val runner = new QtestRunner(spark)
    if (args.length == 2 && args(0) == "--script") {
      val r = runner.run(args(1))
      println(s"SCRIPT ${args(1)}: checked=${r.queriesChecked} " +
        s"mismatches=${r.mismatches.size} error=${r.error}")
      r.mismatches.foreach { m =>
        println("MISMATCH stmt: " + m.stmt.replaceAll("\\s+", " ").take(120))
        println(m.detail)
        println("-----")
      }
      spark.stop(); return
    }
    // args are joined and split on ";;" so statements with spaces and
    // quotes survive sbt's tokenizer
    val stmts = args.mkString(" ").split(";;").map(_.trim)
      .filter(_.nonEmpty).toSeq
    stmts.foreach { st =>
      val (kind, res) = runner.execute(st)
      res match {
        case Some(df) if kind != runner.Ignored =>
          println(s"== $st")
          df.collect().foreach(r => println("|" + r.getString(0) + "|"))
        case _ => println(s"== $st -> $kind")
      }
    }
    spark.stop()
  }
}

package graft

import graft.qtest.QtestRunner

/** Scratch driver: replays an exim script statement-by-statement and
  * prints the rows the runner produced for each checked statement, for
  * golden-diff debugging. Run via
  * `sbt "Test/runMain graft.EximDebugDrive exim_02_part.q"`. */
object EximDebugDrive {
  def main(args: Array[String]): Unit = {
    val script = args.headOption.getOrElse("exim_02_part.q")
    val spark = SparkSpec.session
    val runner = new QtestRunner(spark)
    val text = scala.io.Source.fromFile(
      s"/root/reference/ql/src/test/queries/clientpositive/$script").mkString
    val stmts = graft.qtest.Qtest.splitStatements(text)
    spark.sql("DROP DATABASE IF EXISTS exim_dbg CASCADE")
    spark.sql("CREATE DATABASE exim_dbg")
    spark.catalog.setCurrentDatabase("exim_dbg")
    stmts.foreach { st =>
      println(s"STMT: ${st.replaceAll("\\s+", " ").take(120)}")
      try {
        val (kind, res) = runner.execute(st)
        res.foreach { df =>
          df.collect().map(r =>
            graft.qtest.Qtest.formatRow(r, df.schema))
            .foreach(r => println(s"  ROW: [$r]"))
        }
        println(s"  KIND: $kind")
      } catch { case e: Exception =>
        println(s"  ERR: ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").take(300))
      }
    }
  }
}

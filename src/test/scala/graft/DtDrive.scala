package graft

import graft.qtest.QtestRunner

/** Scratch drive for the legacy-datetime qtest debugging (run via
  * `sbt "Test/runMain graft.DtDrive"`). */
object DtDrive {
  def main(args: Array[String]): Unit = {
    val s0 = SparkSpec.session
    val runner = new QtestRunner(s0)
    val s = runner.spark
    try {
      s.sql("select date_format('2015-04-08', 'E') as x").show(false)
    } catch {
      case e: Throwable =>
        println("FAILED: " + e)
        e.printStackTrace()
    }
    try {
      s.sql(
        "select months_between(cast('2002-02-31 00:00:00' as timestamp)," +
          " cast('2002-03-01 00:00:00' as timestamp)) as mb").show(false)
    } catch { case e: Throwable => println("FAILED2: " + e) }
    graft.sources.ThriftSeq.readComplex(s,
      "/root/reference/data/files/complex.seq").show(15, false)
    val stmt = """select
date_format('2015-04-08', 'E'),
date_format('2015-04-08', 'G'),
date_format('2015-04-08', 'y'),
date_format('2015-04-08', 'Y'),
date_format('2015-04-08', 'MMM'),
date_format('2015-04-08', 'w'),
date_format('2015-04-08', 'W'),
date_format('2015-04-08', 'D'),
date_format('2015-04-08', 'd'),
date_format(cast(null as string), 'dd'),
date_format('01/29/2014', 'dd')"""
    try s.sql(stmt).show(false)
    catch { case e: Throwable => println("FAILED3: " + e); e.printStackTrace() }
  }
}

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
    {
      import org.apache.spark.sql.functions._
      val raw = s.read.orc("/root/reference/data/files/alltypesorc")
      val fixed = raw.schema.fields
        .filter(_.dataType == org.apache.spark.sql.types.TimestampType)
        .foldLeft(raw)((d, f) => d.withColumn(f.name,
          to_utc_timestamp(col(f.name), "America/Los_Angeles")))
      fixed.filter("cint is null and ctinyint is not null")
        .orderBy("ctinyint", "csmallint", "cint", "cbigint", "cfloat",
          "cdouble", "cstring1", "cstring2", "ctimestamp1",
          "ctimestamp2", "cboolean1", "cboolean2")
        .limit(5).select("ctimestamp1", "ctimestamp2").show(5, false)
    }
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

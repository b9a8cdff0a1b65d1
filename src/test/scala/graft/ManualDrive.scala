package graft

import org.apache.spark.sql.functions._

/** Manual end-to-end drive of the warehouse surface (run via
  * `sbt "Test/runMain graft.ManualDrive"`) — prints observable evidence
  * of partition-granular rewrites that specs assert only by value. */
object ManualDrive {
  def main(args: Array[String]): Unit = {
    val s = SparkSpec.session
    Warehouse.dropTable(s, "drv_orders")
    val df = Tables.load(s, "/root/testdata/sf0.001", "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    Warehouse.createTable(df, "drv_orders", partitionBy = Seq("o_year"))

    val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    def mtimes: Map[String, Long] =
      new java.io.File(wh, "drv_orders").listFiles()
        .filter(_.getName.startsWith("o_year="))
        .map(f => f.getName -> f.listFiles().map(_.lastModified).max).toMap

    val sumBefore = s.table("drv_orders").filter("o_year = 1996")
      .agg(sum("o_totalprice")).collect().head.getDouble(0)
    val before = mtimes
    Thread.sleep(1100)
    Warehouse.update(s, "drv_orders",
      Map("o_totalprice" -> "o_totalprice + 1"),
      "o_year = 1996 AND o_orderkey % 2 = 0")
    val after = mtimes
    val changed = after.filter { case (k, v) => before(k) != v }.keys.toSeq.sorted
    val untouched = after.count { case (k, v) => before(k) == v }
    val sumAfter = s.table("drv_orders").filter("o_year = 1996")
      .agg(sum("o_totalprice")).collect().head.getDouble(0)
    val bumped = s.table("drv_orders")
      .filter("o_year = 1996 AND o_orderkey % 2 = 0").count()
    println(s"DRIVE-PARTS changed: ${changed.mkString(",")}")
    println(s"DRIVE-UNTOUCHED: $untouched")
    println(s"DRIVE-SUM delta (expect $bumped): ${math.round(sumAfter - sumBefore)}")
    try {
      Warehouse.update(s, "drv_orders", Map("nope" -> "1"), "o_year = 1996")
      println("DRIVE-ERR: no error raised!")
    } catch {
      case e: Exception =>
        println("DRIVE-ERR: " + e.getMessage.split("\n").head.take(120))
    }
    Warehouse.dropTable(s, "drv_orders")
    s.stop()
  }
}

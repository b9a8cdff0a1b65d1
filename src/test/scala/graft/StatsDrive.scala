package graft

/** Manual drive of StatsCountRule: observable plan + latency difference
  * on a real table (`sbt "Test/runMain graft.StatsDrive"`). */
object StatsDrive {
  def main(args: Array[String]): Unit = {
    val s = SparkSpec.session
    s.experimental.extraOptimizations = Seq(graft.plans.StatsCountRule(s))
    val t = "stats_drive_li"
    Warehouse.dropTable(s, t)
    Warehouse.createTable(Tables.load(s, "/root/testdata/sf0.1", "lineitem"), t)
    Warehouse.analyze(s, t)
    def timeCount(): (Long, Double, String) = {
      val t0 = System.nanoTime()
      val df = s.sql(s"SELECT count(*) AS n FROM $t")
      val n = df.collect().head.getLong(0)
      (n, (System.nanoTime() - t0) / 1e6,
        if (df.queryExecution.optimizedPlan.toString.contains("LocalRelation"))
          "stats-answered" else "scanned")
    }
    s.conf.set("spark.graft.statsOptimizer.enabled", "false")
    val off = timeCount()
    s.conf.set("spark.graft.statsOptimizer.enabled", "true")
    val on = timeCount()
    println(s"DRIVE-OFF: n=${off._1} ${off._3} ${off._2}%.0f".replace("%.0f", f"${off._2}%.0fms"))
    println(s"DRIVE-ON:  n=${on._1} ${on._3} " + f"${on._2}%.0fms")
    assert(off._1 == on._1, "stats answer must equal scan answer")
    Warehouse.dropTable(s, t)
    s.stop()
  }
}

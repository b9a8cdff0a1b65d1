package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions: config-only install (spark.sql.extensions) and the
  * StatsCountRule metadata-only COUNT(*) path. */
class ExtensionsSpec extends SparkSpec {

  test("extensions-built session resolves graft functions via config only") {
    val shared = spark
    // getOrCreate returns the active session verbatim; clear the
    // singletons so a genuinely new session (sharing the SparkContext)
    // is built with the extensions config applied
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // spark.sql.extensions is a STATIC conf read from the SparkContext,
      // which this JVM already created; withExtensions is the equivalent
      // programmatic install path and exercises the same class
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      assert(s2 ne shared, "must be a fresh session")
      val r = s2.sql("SELECT mask_first_n('Abc123', 3) AS m").collect().head
      assert(r.getString(0) == "Xxx123")
      // aggregate injection path (UDAF via extensions config)
      val b = s2.sql(
        "SELECT bitmap_count(ewah_bitmap(x)) FROM VALUES (1),(2),(2) t(x)")
        .collect().head
      assert(b.getLong(0) == 2L)
      // the rule is installed too (conf off → no rewrite, no error)
      assert(s2.sql("SELECT count(*) FROM VALUES (1),(2) t(x)")
        .collect().head.getLong(0) == 2L)
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }

  test("StatsCountRule answers count(*) from catalog stats when enabled") {
    val t = "ext_stats_t"
    Warehouse.dropTable(spark, t)
    Warehouse.createTable(Tables.load(spark, "/root/testdata/sf0.001", "nation"), t)
    Warehouse.analyze(spark, t)
    spark.experimental.extraOptimizations =
      Seq(graft.plans.StatsCountRule(spark))
    try {
      spark.conf.set("spark.graft.statsOptimizer.enabled", "true")
      val df = spark.sql(s"SELECT count(*) AS n FROM $t")
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("LocalRelation"),
        s"count must be answered from stats:\n$optimized")
      assert(df.collect().head.getLong(0) == 25L)

      // guard rails: filters and grouped counts must NOT be rewritten
      val filtered = spark.sql(s"SELECT count(*) FROM $t WHERE n_nationkey > 5")
      assert(!filtered.queryExecution.optimizedPlan.toString.contains("LocalRelation"))
      assert(filtered.collect().head.getLong(0) == 19L)

      // count(*) FILTER (WHERE p) cannot be served from catalog stats
      val filterAgg = spark.sql(
        s"SELECT count(*) FILTER (WHERE n_nationkey > 5) AS n FROM $t")
      assert(!filterAgg.queryExecution.optimizedPlan.toString.contains("LocalRelation"),
        "FILTER-qualified count(*) must not be answered from stats")
      assert(filterAgg.collect().head.getLong(0) == 19L)

      spark.conf.set("spark.graft.statsOptimizer.enabled", "false")
      val off = spark.sql(s"SELECT count(*) FROM $t")
      assert(!off.queryExecution.optimizedPlan.toString.contains("LocalRelation"))
    } finally {
      spark.conf.unset("spark.graft.statsOptimizer.enabled")
      spark.experimental.extraOptimizations = Nil
      Warehouse.dropTable(spark, t)
    }
  }
}

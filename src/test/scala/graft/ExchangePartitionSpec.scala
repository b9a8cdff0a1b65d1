package graft

/** ALTER TABLE … EXCHANGE PARTITION … WITH TABLE — Hive's metadata-level
  * partition re-homing (ref ql/parse/DDLSemanticAnalyzer.java
  * analyzeExchangePartition, Hive.exchangeTablePartitions): files move by
  * directory rename, no rows are read or rewritten, and the reference's
  * validation matrix (schema equality, prefix spec, source present, dest
  * absent) is enforced. Statement surface via GraftSession.sql. */
class ExchangePartitionSpec extends SparkSpec {
  import spark.implicits._

  private def mk(name: String, parts: Seq[String]): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // a previous JVM's warehouse dir survives the catalog (in-memory)
    // and fails CREATE with LOCATION_ALREADY_EXISTS — remove it
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    rm(new java.io.File(wh, name))
    spark.sql(s"CREATE TABLE $name (f1 STRING) USING parquet " +
      s"PARTITIONED BY (${parts.mkString(", ")})")
  }
  private def partsOf(t: String): Seq[String] =
    spark.sql(s"SHOW PARTITIONS $t").collect().map(_.getString(0)).sorted.toSeq

  test("exchange moves a registered partition between tables") {
    mk("exch_dst1", Seq("ds STRING")); mk("exch_src1", Seq("ds STRING"))
    spark.sql("ALTER TABLE exch_src1 ADD PARTITION (ds='2013-04-05')")
    GraftSession.sql(spark,
      "ALTER TABLE exch_dst1 EXCHANGE PARTITION (ds='2013-04-05') " +
        "WITH TABLE exch_src1")
    assert(partsOf("exch_dst1") == Seq("ds=2013-04-05"))
    assert(partsOf("exch_src1").isEmpty)
  }

  test("exchange moves partition DATA without rewriting rows") {
    mk("exch_dst2", Seq("ds STRING")); mk("exch_src2", Seq("ds STRING"))
    Seq(("a", "d1"), ("b", "d1"), ("c", "d2")).toDF("f1", "ds")
      .write.insertInto("exch_src2")
    GraftSession.sql(spark,
      "ALTER TABLE exch_dst2 EXCHANGE PARTITION (ds='d1') WITH TABLE exch_src2")
    assert(spark.table("exch_dst2").collect().map(_.getString(0)).sorted
      .toSeq == Seq("a", "b"))
    assert(spark.table("exch_src2").collect().map(_.getString(0)).toSeq ==
      Seq("c"))
  }

  test("prefix spec exchanges every matching sub-partition") {
    mk("exch_dst3", Seq("ds STRING", "hr STRING"))
    mk("exch_src3", Seq("ds STRING", "hr STRING"))
    spark.sql("ALTER TABLE exch_src3 ADD PARTITION (ds='d', hr='1')")
    spark.sql("ALTER TABLE exch_src3 ADD PARTITION (ds='d', hr='2')")
    spark.sql("ALTER TABLE exch_src3 ADD PARTITION (ds='e', hr='1')")
    GraftSession.sql(spark,
      "ALTER TABLE exch_dst3 EXCHANGE PARTITION (ds='d') WITH TABLE exch_src3")
    assert(partsOf("exch_dst3") == Seq("ds=d/hr=1", "ds=d/hr=2"))
    assert(partsOf("exch_src3") == Seq("ds=e/hr=1"))
  }

  test("reference validation matrix is enforced") {
    mk("exch_dst4", Seq("ds STRING", "hr STRING"))
    mk("exch_src4", Seq("ds STRING", "hr STRING"))
    spark.sql("ALTER TABLE exch_src4 ADD PARTITION (ds='d', hr='1')")
    // spec gap: hr without ds (exchange_partition_neg_incomplete_partition)
    assertThrows[IllegalArgumentException](GraftSession.sql(spark,
      "ALTER TABLE exch_dst4 EXCHANGE PARTITION (hr='1') WITH TABLE exch_src4"))
    // missing source partition (…_neg_partition_missing)
    assertThrows[IllegalArgumentException](GraftSession.sql(spark,
      "ALTER TABLE exch_dst4 EXCHANGE PARTITION (ds='nope') WITH TABLE exch_src4"))
    // dest partition already exists (…_neg_partition_exists)
    spark.sql("ALTER TABLE exch_dst4 ADD PARTITION (ds='d', hr='1')")
    assertThrows[IllegalArgumentException](GraftSession.sql(spark,
      "ALTER TABLE exch_dst4 EXCHANGE PARTITION (ds='d') WITH TABLE exch_src4"))
    // incompatible schemas (…_neg_test)
    mk("exch_dst5", Seq("ds STRING"))
    assertThrows[IllegalArgumentException](GraftSession.sql(spark,
      "ALTER TABLE exch_dst5 EXCHANGE PARTITION (ds='d') WITH TABLE exch_src4"))
    // missing table (…_neg_table_missing)
    assertThrows[IllegalArgumentException](GraftSession.sql(spark,
      "ALTER TABLE exch_nope EXCHANGE PARTITION (ds='d') WITH TABLE exch_src4"))
  }
}

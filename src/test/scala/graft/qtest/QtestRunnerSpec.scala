package graft.qtest

/** Unit coverage for the qtest runner's own statement plumbing — the
  * pieces of harness behavior the golden scripts exercise only
  * implicitly. Pure runner mechanics: no reference checkout needed
  * (fixtures are only registered by `run`, not `execute`).
  */
class QtestRunnerSpec extends graft.SparkSpec {

  private def tmpText(lines: Seq[String]): String = {
    val f = java.nio.file.Files.createTempFile("graft-qtest-load", ".txt")
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  test("LOAD DATA OVERWRITE into the same partition replaces, not appends") {
    val runner = new QtestRunner(spark)
    val db = "qtest_runner_spec_load"
    runner.spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    runner.spark.sql(s"CREATE DATABASE $db")
    runner.spark.catalog.setCurrentDatabase(db)
    try {
      val data = tmpText(Seq("1a", "2b", "3c"))
      runner.execute(
        "CREATE TABLE loadt (key INT, value STRING) PARTITIONED BY (ds STRING)")
      // twice OVERWRITE into the SAME partition: exactly one copy survives
      runner.execute(
        s"LOAD DATA LOCAL INPATH '$data' OVERWRITE INTO TABLE loadt PARTITION (ds='1')")
      runner.execute(
        s"LOAD DATA LOCAL INPATH '$data' OVERWRITE INTO TABLE loadt PARTITION (ds='1')")
      assert(runner.spark.table("loadt").count() == 3)
      // dynamic overwrite scope: an untouched partition survives a later
      // OVERWRITE into a different one
      runner.execute(
        s"LOAD DATA LOCAL INPATH '$data' OVERWRITE INTO TABLE loadt PARTITION (ds='2')")
      assert(runner.spark.table("loadt").count() == 6)
      // plain INTO appends
      runner.execute(
        s"LOAD DATA LOCAL INPATH '$data' INTO TABLE loadt PARTITION (ds='1')")
      assert(runner.spark.table("loadt").count() == 9)
      // unpartitioned table: OVERWRITE replaces the whole table
      runner.execute("CREATE TABLE loadu (key INT, value STRING)")
      runner.execute(s"LOAD DATA LOCAL INPATH '$data' INTO TABLE loadu")
      runner.execute(s"LOAD DATA LOCAL INPATH '$data' OVERWRITE INTO TABLE loadu")
      assert(runner.spark.table("loadu").count() == 3)
    } finally {
      runner.spark.catalog.setCurrentDatabase("default")
      runner.spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }

  test("hive double literals: suffix only unquoted decimal numerals") {
    val runner = new QtestRunner(spark)
    assert(runner.hiveDoubleLiterals("select 1.5 + 2") == "select 1.5D + 2")
    assert(runner.hiveDoubleLiterals("select '1.5'") == "select '1.5'")
    assert(runner.hiveDoubleLiterals("select a.b, 0.25 from t a") ==
      "select a.b, 0.25D from t a")
  }
}

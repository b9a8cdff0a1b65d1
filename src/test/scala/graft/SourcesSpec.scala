package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Scan/source/sink parity (SURVEY §2.2): round-trips through every format
  * the environment provides (parquet, ORC, CSV, JSON, delimited text), the
  * RegexSerDe equivalent, and schema-on-read semantics. spark-avro is not
  * in /opt/spark/jars (zero-egress env) — documented in COVERAGE.md. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private lazy val nation = Tables.load(spark, dir, "nation")

  test("ORC round-trip with predicate pushdown (OrcInputFormat / SearchArgument)") {
    val out = tmp("orc") + "/nation"
    nation.write.orc(out)
    val back = spark.read.orc(out)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
    val plan = back.filter($"n_nationkey" > 20).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_nationkey), GreaterThan(n_nationkey,20)]"),
      s"ORC PPD missing:\n$plan")
  }

  test("CSV round-trip with header + explicit schema (OpenCSVSerde)") {
    val out = tmp("csv") + "/nation"
    nation.write.option("header", "true").csv(out)
    val back = spark.read.option("header", "true")
      .schema(nation.schema).csv(out)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("delimited text with custom delimiter (LazySimpleSerDe default tables)") {
    val out = tmp("tsv") + "/nation"
    nation.write.option("delimiter", "").csv(out)  // Hive's ^A default
    val back = spark.read.option("delimiter", "")
      .schema(nation.schema).csv(out)
    assert(back.count() == nation.count())
    assert(back.filter($"n_name" === "CHINA").count() ==
      nation.filter($"n_name" === "CHINA").count())
  }

  test("JSON round-trip + schema-on-read with missing fields as null") {
    val out = tmp("json") + "/nation"
    nation.write.json(out)
    val widened = spark.read
      .schema(nation.schema.add("extra_col", StringType)).json(out)
    assert(widened.count() == nation.count())
    assert(widened.filter($"extra_col".isNotNull).count() == 0,
      "schema-on-read: missing fields read as NULL (Hive semantics)")
  }

  test("get_json_object / from_json over raw JSON strings (JsonSerDe)") {
    val raw = Seq("""{"k": 1, "tags": ["a","b"]}""", """{"k": 2}""").toDS()
    val parsed = spark.read.json(raw)
    assert(parsed.agg(sum($"k")).collect().head.getLong(0) == 3L)
    val viaScalar = raw.toDF("j")
      .select(get_json_object($"j", "$.k").cast("long").as("k"))
      .agg(sum($"k")).collect().head.getLong(0)
    assert(viaScalar == 3L)
  }

  test("RegexSerDe equivalent: regexp_extract over text lines") {
    val out = tmp("rx")
    Seq("2024-01-01 ERROR something bad", "2024-01-02 INFO all good")
      .toDF("line").write.text(out + "/logs")
    val parsed = spark.read.text(out + "/logs")
      .select(
        regexp_extract($"value", "^(\\S+) (\\S+) (.*)$", 1).as("d"),
        regexp_extract($"value", "^(\\S+) (\\S+) (.*)$", 2).as("level"),
        regexp_extract($"value", "^(\\S+) (\\S+) (.*)$", 3).as("msg"))
    val rows = parsed.orderBy("d").collect()
    assert(rows(0).getString(1) == "ERROR" && rows(1).getString(1) == "INFO")
  }

  test("partitioned parquet write + read reconstructs partition column") {
    val out = tmp("pq") + "/orders"
    val orders = Tables.load(spark, dir, "orders")
      .withColumn("yr", year($"o_orderdate"))
    orders.write.partitionBy("yr").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.select(countDistinct($"yr")).collect().head.getLong(0) ==
      orders.select(countDistinct($"yr")).collect().head.getLong(0))
    assert(back.count() == orders.count())
  }

  test("compressed write (snappy parquet / zlib orc) stays readable") {
    val o1 = tmp("comp") + "/p"
    nation.write.option("compression", "snappy").parquet(o1)
    assert(spark.read.parquet(o1).count() == 25)
    val o2 = tmp("comp") + "/o"
    nation.write.option("compression", "zlib").orc(o2)
    assert(spark.read.orc(o2).count() == 25)
  }
}

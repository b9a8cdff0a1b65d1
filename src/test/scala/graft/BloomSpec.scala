package graft

import org.apache.spark.sql.functions._

import graft.functions.BloomFunctions
import graft.operators.Decontaminate

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val (bits, k) = BloomFunctions.optimalParams(5000, 0.01)

  test("no false negatives, ever: every inserted value probes true") {
    val vals = (0 until 5000).map(i => s"member_$i")
    val filter = vals.toDF("v").repartition(16)
      .agg(Decontaminate.bloomBuild(col("v"), bits, k).as("f"))
      .head().getAs[Array[Byte]](0)
    val misses = vals.toDF("v")
      .filter(!Decontaminate.bloomContains(lit(filter), col("v")))
      .count()
    assert(misses == 0L)
  }

  test("false-positive rate on a disjoint probe set stays near fpp") {
    val filter = (0 until 5000).map(i => s"member_$i").toDF("v")
      .agg(Decontaminate.bloomBuild(col("v"), bits, k).as("f"))
      .head().getAs[Array[Byte]](0)
    val fps = (0 until 20000).map(i => s"stranger_$i").toDF("v")
      .filter(Decontaminate.bloomContains(lit(filter), col("v")))
      .count()
    val rate = fps.toDouble / 20000
    assert(rate < 0.025, s"fp rate $rate vs configured 0.01")
  }

  test("filter bytes are partition-invariant (merge is word-wise OR)") {
    val df = (0 until 3000).map(i => s"v$i").toDF("v")
    def build(d: org.apache.spark.sql.DataFrame): Seq[Byte] =
      d.agg(Decontaminate.bloomBuild(col("v"), bits, k))
        .head().getAs[Array[Byte]](0).toSeq
    assert(build(df.coalesce(1)) == build(df.repartition(32)))
  }

  test("integral keys normalize to long: int build, bigint probe agree") {
    val filter = (0 until 1000).toDF("v") // IntegerType
      .agg(Decontaminate.bloomBuild(col("v"), bits, k).as("f"))
      .head().getAs[Array[Byte]](0)
    val misses = (0L until 1000L).toDF("v") // LongType
      .filter(!Decontaminate.bloomContains(lit(filter), col("v")))
      .count()
    assert(misses == 0L)
  }

  test("SQL surface: bloom_build / bloom_contains / bloom_or") {
    Seq("a", "b").toDF("v").createOrReplaceTempView("bloom_left")
    Seq("c").toDF("v").createOrReplaceTempView("bloom_right")
    val merged = spark.sql(s"""
      WITH l AS (SELECT bloom_build(v, 1024, 5) AS f FROM bloom_left),
           r AS (SELECT bloom_build(v, 1024, 5) AS f FROM bloom_right)
      SELECT bloom_contains(bloom_or(l.f, r.f), probe.v) AS hit, probe.v
      FROM l, r,
        (SELECT 'a' AS v UNION ALL SELECT 'c' UNION ALL SELECT 'zq9') probe
      ORDER BY probe.v""")
      .collect().map(r => r.getString(1) -> r.getBoolean(0)).toMap
    assert(merged("a") && merged("c"))
    // 'zq9' could be a false positive in principle, but at 1024 bits /
    // 3 members the probability is ~1e-9 — assert the overwhelmingly
    // likely exact behavior
    assert(!merged("zq9"))
  }

  test("mismatched filter shapes refuse to merge") {
    val e = intercept[Exception] {
      BloomFunctions.or(
        new graft.functions.GraftBloom(16, 5).serialize(),
        new graft.functions.GraftBloom(32, 5).serialize())
    }
    assert(e.getMessage.contains("different shape"))
  }

  test("overlapBloom output is bit-identical to the exact overlap") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val evalSet = docs.filter(col("doc_id") % 10 === 7)
      .select(concat_ws(" ",
        slice(graft.operators.TextOps.tokens(col("text")), 1, 40))
        .as("text"))
    val exact = Decontaminate.overlap(docs, evalSet, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = Decontaminate
      .overlapBloom(docs, evalSet, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty && bloom == exact)
  }
}

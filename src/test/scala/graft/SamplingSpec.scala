package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0L until 1000L).map(i =>
    (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "zh" else "de"))
    .toDF("id", "lang")

  test("hash-based selection is deterministic and repartition-invariant") {
    val a = Sampling.stratified(corpus, "lang", "id", Map("en" -> 0.5))
      .select("id").collect().map(_.getLong(0)).sorted
    val b = Sampling.stratified(corpus.repartition(17), "lang", "id",
        Map("en" -> 0.5))
      .select("id").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b), "same rows must be kept under any partitioning")
  }

  test("per-stratum rates are honored (exact with modulo buckets)") {
    val kept = Sampling.stratified(corpus, "lang", "id",
        Map("en" -> 0.5, "zh" -> 0.25), buckets = 4,
        bucketExpr = Some(pmod(col("id"), lit(4))))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // en ids ≡ 0 mod 3: buckets {0,1} of 4 → about half; exact per id set
    val en = (0L until 1000L).filter(i => i % 3 == 0 && i % 4 < 2).size
    val zh = (0L until 1000L).filter(i => i % 3 == 1 && i % 4 < 1).size
    val de = (0L until 1000L).count(i => i % 3 == 2)
    assert(kept == Map("en" -> en.toLong, "zh" -> zh.toLong, "de" -> de.toLong))
  }

  test("hash buckets hit the target rate approximately on clustered ids") {
    // sequential ids are the adversarial case for modulo; xxhash64 must
    // still land within a loose tolerance of the nominal rate
    val n = Sampling.stratified(corpus, "lang", "id", Map.empty,
      defaultRate = 0.5).count()
    assert(n > 400 && n < 600, s"expected ~500 of 1000 kept, got $n")
  }

  test("NULL stratum falls back to the default rate") {
    val docs = Seq((Option("en"), 1L), (None, 2L), (None, 3L))
      .toDF("lang", "id")
    val kept = Sampling.stratified(docs, "lang", "id",
        Map("en" -> 0.0), defaultRate = 1.0,
        bucketExpr = Some(pmod(col("id"), lit(10))))
      .select("id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(2L, 3L), "en dropped at rate 0, NULLs kept at default")
  }

  test("assignSplits: exhaustive, disjoint, append-stable, near-ratio") {
    val df = (1L to 2000L).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Sampling.assignSplits(df, "id", "s1", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 2000, "every row gets exactly one label")
    val counts = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 1600) < 80 &&
      math.abs(counts("val") - 200) < 60 && math.abs(counts("test") - 200) < 60,
      s"ratios roughly honored: $counts")
    // appending rows never moves existing assignments
    val appended = Sampling.assignSplits(
      (1L to 3000L).toDF("id"), "id", "s1", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((1L to 2000L).forall(i => appended(i) == got(i)))
    // a different seed re-deals
    val redealt = Sampling.assignSplits(df, "id", "other", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((1L to 2000L).exists(i => redealt(i) != got(i)))
  }

  test("resampleByWeight: integer, fractional, and zero weights") {
    val docs = Seq((0L, "en"), (1L, "en"), (5L, "en"), (2L, "zh"), (3L, "de"))
      .toDF("id", "lang")
    val out = Sampling.resampleByWeight(docs, "lang", "id",
        Map("en" -> 1.5, "zh" -> 3.0, "de" -> 0.0),
        buckets = 10, bucketExpr = Some(pmod(col("id"), lit(10))))
      .groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // en 1.5: buckets 0,1 < 5 → 2 copies; bucket 5 → 1 copy
    assert(out == Map(0L -> 2L, 1L -> 2L, 5L -> 1L, 2L -> 3L),
      s"de (weight 0) must vanish, fractional en split by bucket: $out")
  }

  test("resampleByWeight copies are distinguishable and deterministic") {
    val docs = Seq((7L, "zh")).toDF("id", "lang")
    val a = Sampling.resampleByWeight(docs, "lang", "id", Map("zh" -> 3.0))
      .select("copy_id").collect().map(_.getInt(0)).sorted
    assert(a.toSeq == Seq(0, 1, 2))
  }

  test("rate cutoffs are integer-exact, immune to double epsilon (0.29 * 100)") {
    val docs = (0L until 100L).map((_, "en")).toDF("id", "lang")
    // 0.29 * 100 = 28.999999999999996 in doubles; per-row float floor
    // would keep 28 buckets — the contract says exactly 29
    val n = Sampling.stratified(docs, "lang", "id", Map("en" -> 0.29),
      buckets = 100, bucketExpr = Some(pmod(col("id"), lit(100)))).count()
    assert(n == 29L, s"expected exactly 29 of 100 buckets kept, got $n")
  }

  test("NULL ids survive as a block instead of vanishing in the filter") {
    val docs = Seq((Option(1L), "en"), (Option.empty[Long], "en"))
      .toDF("id", "lang")
    val kept = Sampling.stratified(docs, "lang", "id", Map("en" -> 1.0),
        bucketExpr = Some(pmod(col("id"), lit(10))))
      .count()
    assert(kept == 2L, "rate 1.0 must keep NULL-id rows too")
    val copies = Sampling.resampleByWeight(docs, "lang", "id",
        Map("en" -> 2.0), bucketExpr = Some(pmod(col("id"), lit(10))))
      .count()
    assert(copies == 4L, "weight 2 must duplicate NULL-id rows too")
  }

  test("weightedSample: deterministic, repartition-invariant, nested in k") {
    val weighted = (0L until 1000L).map(i => (i, 1.0 + (i % 7)))
      .toDF("id", "w")
    val a = Sampling.weightedSample(weighted, "id", "w", 50, "s1")
      .select("id").collect().map(_.getLong(0)).sorted
    val b = Sampling.weightedSample(weighted.repartition(13), "id", "w",
        50, "s1")
      .select("id").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
    // A-Res keys don't depend on k: the 50-sample is a subset of the 80
    val c = Sampling.weightedSample(weighted, "id", "w", 80, "s1")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a.forall(c.contains), "smaller sample nests inside larger")
  }

  test("weightedSample favors heavy rows; drops NULL/zero-weight rows") {
    // 100 rows at weight 40 vs 900 at weight 1: heavy rows should
    // dominate a 100-row sample (uniform would give them ~10 slots)
    val skewed = (0L until 1000L)
      .map(i => (i, if (i < 100) 40.0 else 1.0)).toDF("id", "w")
    val got = Sampling.weightedSample(skewed, "id", "w", 100, "s2")
      .select("id").collect().map(_.getLong(0))
    assert(got.length == 100)
    val heavy = got.count(_ < 100)
    assert(heavy > 60, s"heavy rows got $heavy of 100 slots")
    val withBad = skewed.union(Seq((2000L, 0.0), (2001L, -1.0))
      .toDF("id", "w"))
      .union(Seq((Option.empty[Long], Option(5.0)),
        (Option(2002L), Option.empty[Double])).toDF("id", "w"))
    val clean = Sampling.weightedSample(withBad, "id", "w", 2000, "s2")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(clean.size == 1000 && !clean.exists(_ >= 2000),
      "zero/negative/NULL weights and NULL ids are excluded")
  }

  test("resampleByWeight rejects an input that already has copy_id") {
    val docs = Seq((1L, "en", 0)).toDF("id", "lang", "copy_id")
    intercept[IllegalArgumentException] {
      Sampling.resampleByWeight(docs, "lang", "id", Map("en" -> 2.0))
    }
  }
}

class NormalizeSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.TextOps

  test("NFC composes decomposed sequences; composed input is unchanged") {
    val df = Seq(
      ("decomposed", "cafe\u0301"),
      ("composed", "caf\u00e9"),
      ("ascii", "plain text")
    ).toDF("k", "s")
    val out = df.select(col("k"), TextOps.nfcNormalize(col("s")).as("n"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("decomposed") == "caf\u00e9", "NFC must compose e+U+0301 into U+00E9")
    assert(out("composed") == "caf\u00e9")
    assert(out("ascii") == "plain text")
  }

  test("cleanText collapses whitespace runs and trims after NFC") {
    val out = Seq("  á   b\t\nc  ").toDF("s")
      .select(TextOps.cleanText(col("s"))).collect().head.getString(0)
    assert(out == "á b c")
  }

  test("nfcNormalize is null-safe") {
    val out = Seq(Option.empty[String]).toDF("s")
      .select(TextOps.nfcNormalize(col("s"))).collect().head
    assert(out.isNullAt(0))
  }

  test("groupSample keeps and caps the NULL group (null-safe join-back)") {
    val df = ((1 to 10).map(i => (i.toLong, "a")) ++
      (11 to 20).map(i => (i.toLong, null.asInstanceOf[String])))
      .toDF("id", "g")
    val out = Sampling.groupSample(df, "g", "id", k = 3, seed = "s1")
    val byGroup = out.collect().groupBy(r => Option(r.getString(1)))
    assert(byGroup(Some("a")).length == 3)
    assert(byGroup(None).length == 3) // NULL group capped, not dropped
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Mix

class MixSpec extends SparkSpec {
  import spark.implicits._

  test("klDrift matches hand-computed KL against the global distribution") {
    // slice A: x×2 y×2 (p = .5/.5); slice B: x×4 (p = 1/0)
    // global: x:6 y:2 of 8 (q = .75/.25)
    val df = (Seq.fill(2)(("A", "x")) ++ Seq.fill(2)(("A", "y")) ++
      Seq.fill(4)(("B", "x"))).toDF("src", "k")
    val out = Mix.klDrift(df, "src", "k").orderBy("src").collect()
    val klA = 0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)
    val klB = 1.0 * math.log(1.0 / 0.75)
    assert(out.map(_.getString(0)).toSeq == Seq("A", "B"))
    assert(out.map(_.getLong(1)).toSeq == Seq(4L, 4L))
    assert(math.abs(out(0).getDouble(2) - klA) < 1e-6)
    assert(math.abs(out(1).getDouble(2) - klB) < 1e-6)
  }

  test("klDrift is zero when every slice matches the global distribution") {
    val df = (Seq.fill(3)(("A", "x")) ++ Seq.fill(1)(("A", "y")) ++
      Seq.fill(6)(("B", "x")) ++ Seq.fill(2)(("B", "y"))).toDF("src", "k")
    val out = Mix.klDrift(df, "src", "k").collect()
    assert(out.forall(_.getDouble(2) == 0.0))
  }

  test("takeByTokenBudget: boundary doc included, nested, repartition-invariant") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def budgets(b: Long) = docs.select("source").distinct()
      .withColumn("budget", lit(b))
    val sel = Mix.takeByTokenBudget(docs, "source", "doc_id", "n_chars",
      budgets(3000), "s1")
    // every non-exhausted source reaches >= its budget (boundary included)
    val totals = docs.groupBy("source").agg(sum("n_chars").as("avail"))
    val taken = sel.groupBy("source").agg(sum("n_chars").as("got"))
      .join(totals, "source").collect()
    assert(taken.nonEmpty)
    taken.foreach { r =>
      val got = r.getLong(1); val avail = r.getLong(2)
      assert(got >= math.min(3000L, avail), s"${r.getString(0)}: $got")
    }
    // nested: raising the budget keeps every previously selected doc
    val more = Mix.takeByTokenBudget(docs, "source", "doc_id", "n_chars",
      budgets(6000), "s1")
    assert(sel.select("doc_id").except(more.select("doc_id")).count() == 0)
    // deterministic under repartition
    val again = Mix.takeByTokenBudget(docs.repartition(13), "source",
      "doc_id", "n_chars", budgets(3000), "s1")
    assert(sel.select("doc_id").except(again.select("doc_id")).count() == 0 &&
      again.count() == sel.count())
  }

  test("withTokensBeforePerGroup handles NULL groups and matches a window") {
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, null, 5L),
      (4L, null, 7L), (5L, "b", 1L)).toDF("id", "g", "n")
    val got = operators.Packing
      .withTokensBeforePerGroup(df, "g", "id", "n", "bef")
      .select("id", "bef").collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == Map(1L -> 0L, 2L -> 10L, 3L -> 0L, 4L -> 5L, 5L -> 0L))
  }

  test("fixMojibake repairs double-encoded text, leaves clean text alone") {
    import graft.operators.TextOps
    val cases = Seq(
      // é, ü, 3-byte € all round-trip
      ("cafÃ©", "café"),
      ("grÃ¼n", "grün"),
      // clean ASCII untouched
      ("plain ascii", "plain ascii"),
      // genuine Ã before a non-continuation char is NOT "repaired"
      ("Ã propos", "Ã propos"),
      // already-clean text with chars outside Latin-1 untouched
      ("中文 text", "中文 text"),
      (null, null))
    val out = cases.map(_._1).toDF("s")
      .select(TextOps.fixMojibake(col("s"))).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0))
    cases.map(_._2).zip(out).foreach { case (want, got) =>
      assert(got == want, s"want $want, got $got")
    }
  }

  test("bigramNll: hand-computed two-doc corpus") {
    import graft.operators.TextAnalysis
    // corpus: "a b a b" + "a b"; bigrams: (a,b)x3, (b,a)x1; ctx a=3, b=1
    // V = 2; p(b|a) = 3.5/4, p(a|b) = 1.5/2
    val df = Seq((1L, "a b a b"), (2L, "a b")).toDF("id", "t")
    val out = TextAnalysis.bigramNll(df, "id", "t").orderBy("id").collect()
    def r12(x: Double) = BigDecimal(x).setScale(12,
      BigDecimal.RoundingMode.HALF_UP)
    val pAB = math.log(3.5 / 4.0); val pBA = math.log(1.5 / 2.0)
    val d1 = -((r12(pAB) * 2 + r12(pBA)) / 3).toDouble
    val d2 = -r12(pAB).toDouble
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 1L))
    assert(math.abs(out(0).getDouble(2) - d1) < 1e-6)
    assert(math.abs(out(1).getDouble(2) - d2) < 1e-6)
    // single-token and empty docs are excluded, not scored as zero
    val edge = TextAnalysis.bigramNll(
      Seq((1L, "a b"), (2L, "solo"), (3L, "")).toDF("id", "t"), "id", "t")
    assert(edge.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("klDrift is repartition-invariant (exact decimal term sum)") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("source"), col("lang"))
    val a = Mix.klDrift(df, "source", "lang").orderBy("source").collect()
    val b = Mix.klDrift(df.repartition(13), "source", "lang")
      .orderBy("source").collect()
    assert(a.map(_.toSeq.toList).toList == b.map(_.toSeq.toList).toList)
    assert(a.nonEmpty)
  }

  test("temperatureMix: alpha=0 flattens quotas toward uniform, " +
    "alpha=1 keeps natural proportions, output is repartition-invariant") {
    import spark.implicits._
    // big: 900 rows, small: 100 rows
    val df = ((1L to 900L).map(i => (i, "big")) ++
      (901L to 1000L).map(i => (i, "small"))).toDF("id", "src")
    def quotas(alpha: Double) = Mix.temperatureMix(
        df, "src", "id", alpha, targetRows = 500, buckets = 1000)
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val flat = quotas(0.0)
    // alpha=0: each source gets ~250 of the 500 target (the fractional
    // copy is realized by hash buckets — allow ~3σ binomial wobble)
    assert(math.abs(flat("big") - 250) <= 40 &&
      math.abs(flat("small") - 250) <= 40, s"flat: $flat")
    val natural = quotas(1.0)
    // alpha=1: proportional 450/50
    assert(math.abs(natural("big") - 450) <= 45 &&
      math.abs(natural("small") - 50) <= 20, s"natural: $natural")
    // alpha=0.5 boosts the small source above natural, below uniform
    val mid = quotas(0.5)
    assert(mid("small") > natural("small") + 20 && mid("small") < 250,
      s"mid: $mid")
    val a = Mix.temperatureMix(df.coalesce(1), "src", "id", 0.5, 500)
      .collect().map(_.toSeq).toSet
    val b = Mix.temperatureMix(df.repartition(7), "src", "id", 0.5, 500)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("temperature mixing: a high-cardinality slice column fails loudly " +
    "instead of collecting unbounded rows") {
    import spark.implicits._
    // every row its own "source" — not a source column
    val df = (1L to 50L).map(i => (i, s"host-$i", 10L))
      .toDF("id", "src", "n")
    val e1 = intercept[IllegalArgumentException] {
      Mix.temperatureMix(df, "src", "id", 0.5, 100, maxSources = 20)
    }
    assert(e1.getMessage.contains("distinct 'src'"))
    val e2 = intercept[IllegalArgumentException] {
      Mix.temperatureMixByTokens(df, "src", "id", "n", 0.5, 100L,
        seed = "s", maxSources = 20)
    }
    assert(e2.getMessage.contains("distinct 'src'"))
    // at or under the cap, the same frame mixes fine
    assert(Mix.temperatureMix(df, "src", "id", 0.5, 100,
      maxSources = 50).count() >= 0)
  }
}

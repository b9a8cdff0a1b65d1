package graft

import graft.operators.{Sampling, TextAnalysis, TextOps}
import org.apache.spark.sql.functions._

/** Round-4 scale operators: bounded min_k aggregate, inverted index,
  * PMI collocations, deterministic shuffle/sample, URL canonicalization. */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("min_k keeps the k smallest distinct values across partitions") {
    val df = (1 to 1000).map(i => (i % 10, (1000 - i).toLong))
      .toDF("g", "v").repartition(7)
    val rows = df.groupBy("g")
      .agg(expr("min_k(v, 5)").as("m"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    // values for group g are {0+? ...}: v = 1000 - i where i ≡ g (mod 10)
    // smallest five are g', g'+10, g'+20, g'+30, g'+40 with g' = (1000-g)%10...
    // simpler: check against a brute-force reference
    val ref = (1 to 1000).map(i => (i % 10, (1000 - i).toLong))
      .groupBy(_._1).map { case (g, vs) =>
        g -> vs.map(_._2).distinct.sorted.take(5) }
    rows.foreach { case (g, m) => assert(m == ref(g), s"group $g") }
  }

  test("min_k dedups and skips NULLs") {
    val df = Seq(Some(3L), Some(3L), Some(1L), None, Some(2L), Some(1L))
      .toDF("v")
    val m = df.agg(expr("min_k(v, 10)")).collect().head.getSeq[Long](0)
    assert(m == Seq(1L, 2L, 3L))
  }

  test("invertedIndex: exact df, capped sorted postings") {
    val docs = Seq(
      (1L, "alpha beta"), (2L, "alpha beta beta"), (3L, "alpha gamma"),
      (4L, "beta")).toDF("id", "text")
    val idx = TextAnalysis.invertedIndex(docs, "id", "text", maxPostings = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Long](2)))
      .toMap
    assert(idx("alpha") == ((3L, Seq(1L, 2L)))) // df exact, postings capped
    assert(idx("beta") == ((3L, Seq(1L, 2L)))) // within-doc repeat counts once
    assert(idx("gamma") == ((1L, Seq(3L))))
  }

  test("invertedIndex plans two-phase min_k (map-side partial, no full buffering)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val idx = TextAnalysis.invertedIndex(docs, "doc_id", "text", 10)
    idx.collect()
    val p = idx.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final ObjectHashAggregate pair:\n$p")
    assert(p.contains("partial_"), s"no partial aggregation phase:\n$p")
  }

  test("collocations PMI matches hand computation") {
    val docs = Seq("a b", "a b", "a c").toDF("text")
    val rows = TextAnalysis.collocations(docs, "text", minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // M=3 bigrams, N=6 tokens; c_a=3 c_b=2 c_c=1
    // pmi(a,b) = ln(2·36 / (3·3·2)) = ln 4; pmi(a,c) = ln(1·36/(3·3·1)) = ln 4
    val ln4 = BigDecimal(math.log(4.0)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows(("a", "b")) == ((2L, ln4)))
    assert(rows(("a", "c")) == ((1L, ln4)))
  }

  test("deterministicShuffle: stable permutation, balanced shards, repartition-invariant") {
    val df = (0L until 100L).toDF("id")
    val once = Sampling.deterministicShuffle(df, "id", "s1", 4)
      .select("id", "pos", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // pos is a permutation of 0..99
    assert(once.map(_._2).sorted.sameElements(0L until 100L))
    // shards balanced exactly (round-robin)
    val sizes = once.groupBy(_._3).view.mapValues(_.length).toMap
    assert(sizes.values.toSet == Set(25))
    // identical under a different input layout
    val again = Sampling.deterministicShuffle(df.repartition(13), "id", "s1", 4)
      .select("id", "pos", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(once.sameElements(again))
    // different seed ⇒ different permutation
    val other = Sampling.deterministicShuffle(df, "id", "s2", 4)
      .select("id", "pos").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    assert(!once.map(t => (t._1, t._2)).sameElements(other))
  }

  test("hashMinK: deterministic and nested across k") {
    val df = (0L until 200L).toDF("id")
    val k10 = Sampling.hashMinK(df, "id", 10, "s").collect().map(_.getLong(0)).toSet
    val k20 = Sampling.hashMinK(df, "id", 20, "s").collect().map(_.getLong(0)).toSet
    assert(k10.size == 10 && k20.size == 20 && k10.subsetOf(k20))
    val k10b = Sampling.hashMinK(df.repartition(9), "id", 10, "s")
      .collect().map(_.getLong(0)).toSet
    assert(k10 == k10b)
  }

  test("topKBatch matches per-query topKForId on every query") {
    import graft.operators.Similarity
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, dir, "embeddings")
    val batch = Similarity.topKBatch(emb, "vec_id", "embedding",
        emb.filter($"vec_id" < 3), "vec_id", "embedding", k = 4)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq }
    (0L until 3L).foreach { q =>
      val single = Similarity.topKForId(emb, "vec_id", "embedding", q, 4)
        .collect().map(_.getLong(0)).toSeq
      assert(batch(q) == single, s"query $q")
    }
  }

  test("groupSample: k per group, deterministic, subset of the group") {
    val df = (0L until 300L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val s1 = Sampling.groupSample(df, "g", "id", 5, "s").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(s1.length == 15)
    assert(s1.groupBy(_._2).forall(_._2.length == 5))
    s1.foreach { case (id, g) => assert(s"g${id % 3}" == g) }
    val s2 = Sampling.groupSample(df.repartition(11), "g", "id", 5, "s")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(s1.sorted.sameElements(s2.sorted))
  }

  test("minhashAgainstIndex: copy of an indexed doc hits, novel doc doesn't") {
    import graft.operators.Dedup
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "a completely different second document about spark engines"),
      (3L, "yet another unrelated piece of text for the index")).toDF("id", "text")
    val idx = Dedup.buildMinhashIndex(corpus, "id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again"),
      (11L, "nothing like anything stored in that index whatsoever right"))
      .toDF("id", "text")
    val hits = Dedup.minhashAgainstIndex(batch, "id", "text", idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(hits.exists(h => h._1 == 10L && h._2 == 1L && h._3 == 1.0))
    assert(!hits.exists(_._1 == 11L))
  }

  test("dedupByClusterKeepBest keeps the highest score, ties to smallest id") {
    import graft.operators.Dedup
    val docs = Seq((1L, 10L), (2L, 30L), (3L, 30L), (5L, 7L), (7L, 1L), (8L, 2L))
      .toDF("id", "score")
    // cluster {1,2,3} (chain), cluster {7,8}, 5 isolated
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val kept = Dedup.dedupByClusterKeepBest(docs, "id", pairs, "id_a", "id_b", "score")
      .collect().map(_.getLong(0)).sorted.toSeq
    // {1,2,3}: max score 30 tie between 2 and 3 → 2; {7,8}: 8 has score 2
    assert(kept == Seq(2L, 5L, 8L))
  }

  test("stripHtml: tags/scripts/comments out, entities decoded, ws collapsed") {
    val cases = Seq(
      ("<p>Hello <b>world</b></p>", "Hello world"),
      ("<script>var x = '<p>';</script>text<style>a{}</style>", "text"),
      ("<!-- hidden -->shown", "shown"),
      ("a &lt;tag&gt; &amp; &quot;q&quot; &nbsp; b", "a <tag> & \"q\" b"),
      // &amp;lt; is the literal text "&lt;", not "<"
      ("x &amp;lt; y", "x &lt; y"),
      ("no markup at all", "no markup at all"),
      ("  <div>\n\n  spaced \t out </div> ", "spaced out"))
    val out = cases.map(_._1).toDF("h")
      .select(graft.operators.TextOps.stripHtml($"h"))
      .collect().map(_.getString(0))
    cases.map(_._2).zip(out).foreach { case (want, got) =>
      assert(got == want, s"want [$want] got [$got]")
    }
  }

  test("datasetDiff classifies added/removed/changed/unchanged per key") {
    import graft.operators.Diff
    val a = Seq((1L, "x", 10), (2L, "y", 20), (3L, "z", 30)).toDF("id", "v", "n")
    val b = Seq((2L, "y", 20), (3L, "z", 31), (4L, "w", 40)).toDF("id", "v", "n")
    val st = Diff.datasetDiff(a, b, Seq("id")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
    // NULL non-key values compare null-safely (NULL == NULL is unchanged)
    val an = Seq((1L, null.asInstanceOf[String])).toDF("id", "v")
    val bn = Seq((1L, null.asInstanceOf[String])).toDF("id", "v")
    assert(Diff.datasetDiff(an, bn, Seq("id")).collect()
      .head.getString(1) == "unchanged")
  }

  test("canonicalUrl edge cases") {
    val cases = Seq(
      // default port + tracking params + fragment all normalized away
      ("HTTP://Example.COM:80/A/B/?utm_source=x&q=1#frag",
        "http://example.com/A/B?q=1"),
      // non-default port kept; param order preserved
      ("https://h.io:8443/p?b=2&a=1", "https://h.io:8443/p?b=2&a=1"),
      // all params tracking ⇒ no '?'; empty path ⇒ '/'
      ("https://h.io?utm_campaign=z&ref=abc", "https://h.io/"),
      // root slash stays; fbclid/gclid dropped
      ("https://h.io/?fbclid=1&gclid=2", "https://h.io/"),
      // trailing '?' and trailing '&' don't create distinct dedup keys
      ("https://h.io/p?", "https://h.io/p"),
      ("https://h.io/p?q=1&", "https://h.io/p?q=1"),
      ("not a url at all", null))
    val out = cases.map(_._1).toDF("u")
      .select(TextOps.canonicalUrl($"u")).collect().map(_.getString(0))
    cases.map(_._2).zip(out).foreach { case (want, got) =>
      assert(got == want, s"want $want, got $got")
    }
  }

  test("searchAllTerms finds only docs containing every query term") {
    val docs = Seq(
      (1L, "spark runs fast queries"),
      (2L, "spark queries"),
      (3L, "fast queries"),
      (4L, "spark spark fast")   // repeated term must not fake a hit
    ).toDF("doc_id", "text")
    val hit = TextAnalysis.searchAllTerms(docs, "doc_id", "text",
        Seq("spark", "fast")).collect().map(_.getLong(0)).toSet
    assert(hit == Set(1L, 4L))
  }

  test("tableFingerprint: partitioning-invariant, sensitive to any row " +
    "change, counts duplicate multiplicity") {
    import graft.operators.Diff
    val df = (1L to 500L).map(i => (i, s"v$i")).toDF("id", "v")
    def fp(d: org.apache.spark.sql.DataFrame) =
      Diff.tableFingerprint(d, Seq("id", "v")).collect().head.getString(1)
    assert(fp(df) == fp(df.repartition(17)), "order/partitioning invariant")
    assert(fp(df) != fp(df.filter($"id" =!= 250L)), "missing row detected")
    assert(fp(df) != fp(df.union(df.limit(1))), "duplicated row detected")
  }

  test("fuzzyJoin pairs one-edit strings via prefix/suffix blocks, " +
    "skips distant ones") {
    import graft.operators.Joins
    val l = Seq((1L, "warehouse-alpha"), (2L, "warehouse-beta"))
      .toDF("id", "name")
    val r = Seq((10L, "warehouse-alphx"),  // 1 sub of alpha
      (11L, "warehouse-betas"),            // 1 insert on beta
      (12L, "completely-other")).toDF("id", "name")
    val pairs = Joins.fuzzyJoin(l, "id", "name", r, "id", "name", 1)
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
    assert(pairs == Set((1L, 10L), (2L, 11L)))
  }

  test("hashingTf: dense dim-length counts, identical tokens collide, " +
    "empty doc gets the zero vector") {
    val docs = Seq(
      (1L, "spark spark hive"),
      (2L, "spark"),
      (3L, "")
    ).toDF("doc_id", "text")
    val vecs = TextAnalysis.hashingTf(docs, "doc_id", "text",
        dim = 16, seed = "t")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(vecs.values.forall(_.length == 16))
    assert(vecs(1L).sum == 3 && vecs(2L).sum == 1, "tf counts all tokens")
    assert(vecs(3L).forall(_ == 0), "token-less doc -> zero vector")
    // the same token hashes to the same bucket in every document
    val sparkBucket = vecs(2L).indexWhere(_ == 1)
    assert(vecs(1L)(sparkBucket) >= 2)
  }
}

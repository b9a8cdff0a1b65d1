package graft

import graft.operators.{Dedup, Similarity, TextAnalysis, TextOps, Vectors}
import org.apache.spark.sql.functions._

/** Planted-duplicate specs for the LSH dedup family — the recall evidence
  * the SQL oracle can't provide (LSH is sub-linear, not exhaustive). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches " +
      "from a warm window sill and the birds sing in the garden outside"

  private lazy val docs = Seq(
    (0L, base),
    (1L, base),                                         // exact dup of 0
    (2L, base.replace("quick", "speedy")),              // near dup of 0
    (3L, "completely different content about spark sql engines and " +
      "distributed query processing with shuffles and partitions galore"),
    (4L, "another unrelated document mentioning neither foxes nor dogs " +
      "but plenty of parquet files and columnar formats for analytics")
  ).toDF("doc_id", "text")

  test("exact dedup keeps one row per distinct text") {
    assert(Dedup.exact(docs, Seq("text")).count() == 4)
  }

  test("minhash LSH finds exact and near dup, not unrelated docs") {
    val pairs = Dedup.minhashNearDups(
      docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "exact dup must collide")
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)),
      "one-word-edit near dup must collide")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash hamming distance separates dups from unrelated") {
    val pairs = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "identical text ⇒ hamming 0")
    assert(!pairs.contains((0L, 3L)) && !pairs.contains((0L, 4L)))
  }

  test("ngram jaccard: exact dup scores 1.0, near dup high, within block") {
    val blocked = docs.withColumn("blk", lit("all"))
    val rows = Dedup.ngramJaccardPairs(
      blocked, "doc_id", "text", Seq("blk"), threshold = 0.1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(rows((0L, 1L)) == 1.0)
    assert(rows((0L, 2L)) > 0.5 && rows((0L, 2L)) < 1.0)
    assert(!rows.contains((0L, 3L)))
  }

  test("embedding near-dups: identical and close vectors collide") {
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(1f, 0f, 0f, 0f)),            // identical
      (2L, Array(0.99f, 0.1f, 0f, 0f)),       // close
      (3L, Array(-1f, 0f, 0f, 0f)),           // opposite
      (4L, Array(0f, 1f, 0f, 0f))             // orthogonal
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(
      vecs, "vec_id", "embedding", threshold = 0.95,
      signatureBits = 8, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
    assert(!pairs.exists(p => p._2 == 4L || p._1 == 4L))
  }

  test("semantic dedup drops the later of near-identical vectors, " +
    "keeps cluster loners, and skips oversized clusters") {
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),      // centroid A (k=2 lowest ids)
      (1L, Array(0f, 1f, 0f, 0f)),      // centroid B
      (2L, Array(0.99f, 0.1f, 0f, 0f)), // cluster A, ~dup of 0 -> dropped
      (3L, Array(0.1f, 0.99f, 0f, 0f)), // cluster B, ~dup of 1 -> dropped
      (4L, Array(-1f, 0.5f, 0f, 0f))    // cluster B loner -> kept
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(vecs, "vec_id", "embedding",
      k = 2, eps = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(out(0L) == (0L, false) && out(2L) == (0L, true))
    assert(out(1L) == (1L, false) && out(3L) == (1L, true))
    assert(out(4L) == (1L, false), "dissimilar cluster member survives")
    // oversized clusters skip the quadratic prune instead of running it
    val capped = Dedup.semanticDedupWith(vecs, "vec_id", "embedding",
      vecs.limit(2).selectExpr("vec_id as cid", "embedding as cvec"),
      eps = 0.95, maxCluster = 2)
    assert(capped.filter($"dropped").count() == 1,
      "3-member cluster B exceeds the cap; only cluster A prunes")
  }

  test("brute-force topK is exact and IVF reaches high recall on it") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, dir, "embeddings")
    val exact = Similarity.topKForId(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val q = emb.filter($"vec_id" === 0L)
      .select($"embedding").collect().head.getSeq[Float](0)
    val ivf = Similarity.buildIvf(emb, "vec_id", "embedding", nlist = 4)
    val approx = Similarity.searchIvf(ivf, q, k = 10, nprobe = 2)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(exact.contains(0L), "query vector is its own best match")
    assert(recall >= 0.5, s"IVF recall too low: $recall")
  }

  test("hardNegatives excludes the query's own label, ranks by cosine") {
    // axis-aligned vectors: label 0 along +x, label 1 along +y, label 2
    // mixed — negatives for query 0 (label 0) must all be label 1/2,
    // led by the mixed vector (cosine ~0.707 beats the orthogonal 0.0)
    val emb = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(0.9f, 0f), 0),
      (2L, Array(0f, 1f), 1), (3L, Array(0f, 0.8f), 1),
      (4L, Array(1f, 1f), 2)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(emb, "vec_id", "embedding", "label",
        queryIds = Seq(0L), k = 3)
      .collect().map(r => (r.getInt(4), r.getLong(1), r.getInt(2)))
      .sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq(4L, 2L, 3L),
      s"mixed vector first, then orthogonal by id: ${got.toSeq}")
    assert(got.forall(_._3 != 0), "no same-label row may appear")
  }

  test("simhash ignores token-less docs (no false hamming-0 pairs)") {
    // CJK-only and punctuation-only docs have zero [a-z0-9] tokens; all
    // would hash to 0 and pair with each other without the guard
    val base = Seq.tabulate(30)(i => s"token$i word$i filler$i").mkString(" ")
    val df = Seq(
      (1L, "金糸雀の鳴き声が響く"), (2L, "!!! --- ???"), (3L, "完全に異なる文書"),
      (4L, base + " ending one"),
      (5L, base + " ending two"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDups(df, "doc_id", "text", maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!pairs.exists(p => Set(1L, 2L, 3L)(p._1) || Set(1L, 2L, 3L)(p._2)),
      s"token-less docs must not pair: ${pairs.toSeq}")
    assert(pairs.contains((4L, 5L)), "real near-dups still found")
  }

  test("IVF build is deterministic: identical assignments across builds") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, dir, "embeddings").repartition(7)
    def buildAssignments(): Map[Long, Int] =
      Similarity.buildIvf(emb, "vec_id", "embedding", nlist = 4)
        .assigned.collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[Int]("cid")).toMap
    val a = buildAssignments()
    val b = buildAssignments()
    assert(a == b, "decimal-exact centroids + cid tie-break must make " +
      "assignment independent of partial-merge order")
  }

  test("quantized IVF matches float IVF ranking within rounding error") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.filter($"vec_id" === 0L)
      .select($"embedding").collect().head.getSeq[Float](0)
    val ivf = Similarity.buildIvf(emb, "vec_id", "embedding", nlist = 4)
    val f = Similarity.searchIvf(ivf, q, k = 10, nprobe = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val qv = Similarity.quantizeIvf(ivf)
    val g = Similarity.searchIvfQuantized(qv, q, k = 10, nprobe = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val common = f.keySet.intersect(g.keySet)
    assert(common.size >= 8, s"int8 must not change top-10 much: $common")
    common.foreach { id =>
      assert(math.abs(f(id) - g(id)) < 0.05,
        s"cosine drift too large for $id: ${f(id)} vs ${g(id)}")
    }
  }

  test("IVF persisted partitionBy(cid) prunes unprobed partitions on search") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, dir, "embeddings")
    val ivf = Similarity.buildIvf(emb, "vec_id", "embedding", nlist = 4)
    val out = java.nio.file.Files.createTempDirectory("ivf").toString + "/idx"
    ivf.assigned.write.partitionBy("cid").parquet(out)
    val stored = ivf.copy(assigned = spark.read.parquet(out))
    val q = emb.filter($"vec_id" === 0L)
      .select($"embedding").collect().head.getSeq[Float](0)
    val res = Similarity.searchIvf(stored, q, k = 5, nprobe = 1)
    val rows = res.collect()
    assert(rows.nonEmpty && rows.head.getLong(0) == 0L)
    // the probe joins against a 1-centroid broadcast list: DPP/pruning
    // means the scan reads at most the probed partition's files
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("PartitionFilters"),
      s"expected partition pruning on cid:\n$plan")
  }

  test("cosine column math matches manual computation") {
    val df = Seq((Array(1f, 2f, 2f), Array(2f, 4f, 4f))).toDF("a", "b")
    val c = df.select(Vectors.cosine($"a", $"b")).collect().head.getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
    val o = Seq((Array(1f, 0f), Array(0f, 1f))).toDF("a", "b")
      .select(Vectors.cosine($"a", $"b")).collect().head.getDouble(0)
    assert(math.abs(o) < 1e-12)
  }

  test("exactKeepMin deterministically keeps the lowest-id row per key") {
    val df = Seq((5L, "dup", "e"), (1L, "dup", "a"), (3L, "dup", "c"),
      (2L, "solo", "b")).toDF("id", "text", "v").repartition(4)
    val out = Dedup.exactKeepMin(df, Seq("text"), "id")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(2)))
    assert(out.toSeq == Seq((1L, "a"), (2L, "b")),
      "keeps the min-id row with ALL its columns")
    // NULL ordering values sort last; an all-NULL group keeps a REAL row
    val withNulls = Seq((Some(9L), "k", "x"), (None, "k", "y"),
      (None, "solo", "z")).toDF("id", "text", "v")
    val got = Dedup.exactKeepMin(withNulls, Seq("text"), "id")
      .orderBy("text").collect()
    assert(got(0).getLong(0) == 9L, "non-NULL order wins over NULL")
    assert(got(1).getString(1) == "solo" && got(1).getString(2) == "z",
      "all-NULL-order group must keep a real row, not fabricate NULLs")
  }

  test("l2-normalize yields unit vectors; zero vector stays zero") {
    val df = Seq((1L, Array(3f, 4f)), (2L, Array(0f, 0f))).toDF("id", "v")
    val out = Vectors.withL2Normalized(df, "v", "u").orderBy("id")
      .select(Vectors.norm($"u")).collect().map(_.getDouble(0))
    assert(math.abs(out(0) - 1.0) < 1e-12)
    assert(out(1) == 0.0)
  }

  test("int8 quantize/dequantize bounds the error at half a scale step") {
    val df = Seq((1L, Array(0.9f, -0.45f, 0.001f, 0f))).toDF("id", "v")
    val q = Vectors.withInt8Quantized(df, "v")
    val row = q.select($"q_vec", $"q_scale").collect().head
    val scale = row.getDouble(1)
    val ints = row.getAs[scala.collection.Seq[Int]](0)
    assert(ints.head == 127, "max element maps to 127")
    assert(ints.forall(i => i >= -127 && i <= 127))
    val err = q.select(
      aggregate(zip_with($"v", Vectors.dequantize($"q_vec", $"q_scale"),
        (x, y) => abs(x.cast("double") - y)),
        lit(0.0), (a, b) => greatest(a, b))).collect().head.getDouble(0)
    assert(err <= scale / 2 + 1e-12)
  }

  test("meanPool averages element-wise per group in position order") {
    val df = Seq(
      (1, Array(1f, 10f)), (1, Array(3f, 30f)), (2, Array(5f, 7f)))
      .toDF("g", "v")
    val out = Vectors.meanPool(df, Seq("g"), "v").orderBy("g").collect()
    assert(out(0).getAs[scala.collection.Seq[Double]]("mean_vec").toSeq ==
      Seq(2.0, 20.0))
    assert(out(1).getAs[scala.collection.Seq[Double]]("mean_vec").toSeq ==
      Seq(5.0, 7.0))
  }

  test("langid picks the right stopword profile and zh via CJK") {
    val df = Seq(
      "the cat is in the garden and it is warm",
      "der hund ist nicht mit der katze auf dem sofa",
      "le chat est dans le jardin et la maison est grande",
      "el perro y el gato es una historia que por siempre",
      "这是一个中文句子",
      "zzz qqq xxx").toDF("text")
    val out = df.select(TextAnalysis.langId($"text")).collect().map(_.getString(0))
    assert(out.sameElements(Array("en", "de", "fr", "es", "zh", "und")))
  }

  test("fingerprints: whitespace/case-normalized; robust min is monotone") {
    val df = Seq(
      ("Hello  World foo bar baz", "hello world foo bar baz")).toDF("a", "b")
    val r = df.select(
      TextAnalysis.fingerprint($"a") === TextAnalysis.fingerprint($"b"),
      TextAnalysis.robustFingerprint($"a") === TextAnalysis.robustFingerprint($"b"))
      .collect().head
    assert(r.getBoolean(0), "normalized-equal texts share fingerprint")
    assert(r.getBoolean(1), "normalized-equal texts share robust fingerprint")
    // appending content can only keep or lower the min-shingle hash
    val m = Seq(("some shared long prefix that dominates the shingle set",
      "some shared long prefix that dominates the shingle set plus tail"))
      .toDF("a", "b")
      .select(TextAnalysis.robustFingerprint($"b") <=
        TextAnalysis.robustFingerprint($"a"))
      .collect().head
    assert(m.getBoolean(0))
  }

  test("connectedComponents resolves transitive chains to the min id") {
    // 1-2, 2-3 (chain), 7-8 (pair), 5 isolated
    val nodes = Seq(1L, 2L, 3L, 5L, 7L, 8L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(nodes, "id", pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L,
      7L -> 7L, 8L -> 7L))
  }

  test("connectedComponents converges on a long path (multi-round propagation)") {
    // path 1-2-...-12 forces the min label to walk the diameter
    val n = 12
    val nodes = (1 to n).map(_.toLong).toDF("id")
    val pairs = (1 until n).map(i => (i.toLong, i.toLong + 1))
      .toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(nodes, "id", pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(1)).distinct
    assert(comp.sameElements(Array(1L)))
  }

  test("connectedComponents on an empty node set returns empty, no NPE") {
    val nodes = Seq.empty[Long].toDF("id")
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(nodes, "id", pairs, "id_a", "id_b")
    assert(comp.count() == 0L)
  }

  test("dedupByCluster keeps exactly one canonical doc per cluster") {
    val docs = Seq((1L, "a"), (2L, "a2"), (3L, "a3"), (5L, "solo"),
      (7L, "b"), (8L, "b2")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val kept = Dedup.dedupByCluster(docs, "doc_id", pairs, "id_a", "id_b")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.sameElements(Array(1L, 5L, 7L)))
  }

  test("sharedSpans finds exact k-token runs across docs, counts aligned grams") {
    val span = (1 to 6).map(i => s"w$i").mkString(" ") // 6 shared tokens
    val docs = Seq(
      (1L, s"unique one two three $span tail1 x"),
      (2L, s"other head words here $span tail2 y"),
      (3L, "completely different text with no overlap at all"),
      // internal repetition in one doc must NOT create a self-pair
      (4L, s"$span again $span once more")).toDF("doc_id", "text")
    val out = Dedup.sharedSpans(docs, "doc_id", "text", spanTokens = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // docs 1,2 share exactly the 6-token span → exactly 1 aligned gram
    assert(out((1L, 2L)) == 1L)
    // doc 4 contains the span twice → 2 position pairs against 1 and 2
    assert(out((1L, 4L)) == 2L && out((2L, 4L)) == 2L)
    // no pair involves doc 3, no self-pairs
    assert(!out.keys.exists(k => k._1 == 3L || k._2 == 3L || k._1 == k._2))
  }

  test("containmentPairs: embedded quote scores 1.0 one way, small the other") {
    val long = (1 to 40).map(i => s"w$i").mkString(" ")    // 40 tokens
    val quote = (11 to 22).map(i => s"w$i").mkString(" ")  // 12 of them
    val docs = Seq(
      (1L, long), (2L, quote),
      (3L, "totally different text about other things entirely with " +
        "many words that overlap nothing at all in the corpus here")
    ).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, "doc_id", "text",
        spanTokens = 8, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // all 5 of the quote's 8-grams appear in the long doc
    assert(out((2L, 1L)) == 1.0)
    // the reverse direction: 5 of the long doc's 33 grams → small
    assert(out((1L, 2L)) == 5.0 / 33.0)
    assert(!out.keys.exists(k => k._1 == 3L || k._2 == 3L))
    // threshold gates: only the quote direction survives 0.8
    val gated = Dedup.containmentPairs(docs, "doc_id", "text",
        spanTokens = 8, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gated == Set((2L, 1L)))
  }

  test("containmentPairs df cap drops boilerplate grams instead of pairing everything") {
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    // 6 docs all sharing one boilerplate 8-gram + distinct content
    val docs = (1L to 6L).map(i =>
      (i, s"$boiler unique$i content$i words$i here$i now$i more$i x$i y$i"))
      .toDF("doc_id", "text")
    // cap 3 < 6 docs → the boilerplate gram is dropped, no pairs at all
    val out = Dedup.containmentPairs(docs, "doc_id", "text",
      spanTokens = 8, threshold = 0.0, maxDf = 3)
    assert(out.count() == 0)
  }
}

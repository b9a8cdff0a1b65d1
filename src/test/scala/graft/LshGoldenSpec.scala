package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Full-output goldens for the five rows-only LSH/fingerprint queries
  * (q51/q53/q54/q56/q60 — VERDICT r11 #7). Their driver check is
  * rows-only with planted-pair invariant companions; these goldens pin
  * the COMPLETE output so a refactor that silently changes shingling,
  * signature hashing, banding, or IVF assignment is caught even when
  * the planted pairs survive.
  *
  * The corpus is synthesized here from a fixed seed (not the driver's
  * testdata, which regenerates between rounds): 160 documents in 40
  * quadruplets of one base text, one near-dup (one token edited), one
  * shuffled dup, and one unrelated; 96 embeddings in 32 triplets of a
  * base vector, a small perturbation, and an independent vector. Every
  * operator under test is deterministic (fixed hash seeds), so the
  * expected hash is a constant of (corpus seed, operator code).
  */
object LshGolden {
  def docs(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val rnd = new scala.util.Random(20260815L)
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima",
      "mike", "november", "oscar", "papa", "quebec", "romeo", "sierra",
      "tango", "uniform", "victor", "whiskey", "xray", "yankee", "zulu")
    def sentence(n: Int): Vector[String] =
      Vector.fill(n)(vocab(rnd.nextInt(vocab.size)))
    val rows = (0 until 40).flatMap { g =>
      val base = sentence(24)
      val edited = base.updated(rnd.nextInt(base.size),
        vocab(rnd.nextInt(vocab.size)))
      val shuffled = rnd.shuffle(base)
      val other = sentence(24)
      Seq(
        (g * 4 + 0L, base.mkString(" ")),
        (g * 4 + 1L, edited.mkString(" ")),
        (g * 4 + 2L, shuffled.mkString(" ")),
        (g * 4 + 3L, other.mkString(" ")))
    }
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  def embeddings(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val rnd = new scala.util.Random(42424242L)
    def vec(): Array[Float] = Array.fill(16)(rnd.nextGaussian().toFloat)
    val rows = (0 until 32).flatMap { g =>
      val base = vec()
      val near = base.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
      Seq((g * 3 + 0L, base.toSeq), (g * 3 + 1L, near.toSeq),
        (g * 3 + 2L, vec().toSeq))
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  /** Order-independent digest of the FULL result: stringified rows
    * (doubles rounded to 6 before stringify by the callers where they
    * appear) sorted and fed through one MD5. */
  def digest(df: DataFrame): String = {
    val lines = df.collect().map((r: Row) =>
      r.toSeq.map {
        case null => "\\N"
        case s: Seq[_] => s.mkString("[", ",", "]")
        case x => x.toString
      }.mkString("")).sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    lines.foreach(l => md.update((l + "\n").getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }
}

class LshGoldenSpec extends SparkSpec {
  import LshGolden._

  private lazy val d = docs(spark).cache()
  private lazy val e = embeddings(spark).cache()

  private def checkGolden(name: String, got: DataFrame, expect: String,
      minRows: Long): Unit = {
    val rows = got.count()
    assert(rows >= minRows, s"$name returned only $rows rows")
    val h = digest(got)
    assert(h == expect,
      s"$name full-output hash moved: got $h expected $expect " +
        s"($rows rows) — the bucketing/signature path changed; " +
        "re-derive the golden ONLY after verifying the change is intended")
  }

  test("q51 minhash near-dups: full-output golden") {
    checkGolden("minhash",
      Dedup.minhashNearDups(d, "doc_id", "text",
        shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6)),
      "b04e7a96517fcabd763f767fc93e5396", 40)
  }

  test("q53 simhash near-dups: full-output golden") {
    checkGolden("simhash",
      Dedup.simhashNearDups(d, "doc_id", "text")
        .select(col("id_a"), col("id_b")),
      "af2f85d6af45e439d5653cce1e492303", 10)
  }

  test("q54 embedding near-dups: full-output golden") {
    checkGolden("embed",
      Dedup.embeddingNearDups(e, "vec_id", "embedding",
        threshold = 0.5, signatureBits = 64, bands = 16)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6)),
      "bbc26439ff97bf01f99fa48ad936814b", 25)
  }

  test("q56 IVF ANN: full-output golden") {
    val q = e.filter(col("vec_id") === 0L)
      .select(col("embedding")).collect().head.getSeq[Float](0)
    val ivf = Similarity.buildIvf(e, "vec_id", "embedding", nlist = 8)
    checkGolden("ivf",
      Similarity.searchIvf(ivf, q, k = 10, nprobe = 3)
        .select(col("id"), round(col("cosine"), 4)),
      "15fb17ce442e0b013c1adfaee574a340", 5)
  }

  test("q60 fingerprints: full-output golden") {
    checkGolden("fingerprint",
      d.select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"),
        TextAnalysis.robustFingerprint(col("text")).as("fp_robust")),
      "261dad2ea9569d0f5546fe140fad70c4", 160)
  }
}

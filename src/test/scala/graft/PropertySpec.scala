package graft

import graft.operators.{TextOps, Vectors}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Property-style invariants over seeded random inputs (plain loops — the
  * scalatestplus-scalacheck bridge isn't in the offline cache).
  * Mirrors the reference's requirement that aggregation buffers be
  * merge-associative and sketches permutation-invariant (SURVEY §7). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(42)
  private val vocab = Seq("spark", "hive", "query", "row", "column", "scan",
    "join", "merge", "sort", "hash", "table", "data", "fast", "slow")
  private def sentence(n: Int): String =
    Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  test("native ShingleSet ≡ composed split/filter/transform pipeline") {
    val texts = Seq.fill(60)(sentence(3 + rnd.nextInt(40))) ++
      Seq("", "a", "a b", "  Punct,--here!! and\tsome\nspace  ", "ÜBER hällo")
    val df = texts.toDF("text")
    val both = df.select(
      TextOps.shingleSet($"text", 3).as("native"),
      array_distinct(TextOps.wordNgrams(TextOps.tokens($"text"), 3))
        .as("composed"))
    val diff = both.filter(not($"native" <=> $"composed")).collect()
    assert(diff.isEmpty, s"mismatch: ${diff.take(2).mkString}")
  }

  test("minhash signatures are permutation-invariant and reflexive") {
    val sets = Seq.fill(30)(Seq.fill(5 + rnd.nextInt(30))(
      vocab(rnd.nextInt(vocab.size)) + rnd.nextInt(100)).distinct)
    val df = sets.map(s => (s, rnd.shuffle(s))).toDF("a", "b")
    val neq = df.select(
      TextOps.minhashSignature($"a", 32).as("sa"),
      TextOps.minhashSignature($"b", 32).as("sb"))
      .filter(not($"sa" <=> $"sb")).count()
    assert(neq == 0, "signature must not depend on element order")
  }

  test("minhash signature equality rate estimates jaccard") {
    // two sets with known overlap: J = |∩|/|∪| = 50/150
    val a = (0 until 100).map("tok" + _)
    val b = (50 until 150).map("tok" + _)
    val row = Seq((a, b)).toDF("a", "b")
      .select(TextOps.minhashSignature($"a", 256).as("sa"),
        TextOps.minhashSignature($"b", 256).as("sb"))
      .select(size(filter(zip_with($"sa", $"sb", (x, y) => x === y),
        b => b)).as("eq"))
      .collect().head
    val est = row.getInt(0) / 256.0
    val truth = 50.0 / 150.0
    assert(math.abs(est - truth) < 0.12, s"estimate $est vs $truth")
  }

  test("simhash: permutation-invariant; small edits stay close in hamming") {
    val base = Seq.fill(60)(vocab(rnd.nextInt(vocab.size)))
    val df = Seq((base, rnd.shuffle(base), base.updated(0, "EDITED")))
      .toDF("a", "b", "c")
      .select(
        TextOps.hamming64(TextOps.simhash64($"a"), TextOps.simhash64($"b")).as("perm"),
        TextOps.hamming64(TextOps.simhash64($"a"), TextOps.simhash64($"c")).as("edit"))
      .collect().head
    assert(df.getInt(0) == 0, "permutation must not change simhash")
    assert(df.getInt(1) <= 16, s"one-token edit moved ${df.getInt(1)} bits")
  }

  test("decimal-sum strategy is exact for 2dp doubles in any split") {
    val values = Seq.fill(2000)((rnd.nextInt(1000000)).toDouble / 100)
    val exact = values.map(v => BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
    for (parts <- Seq(1, 7, 32)) {
      val got = values.toDF("v").repartition(parts)
        .select(expr("cast(sum(cast(v as decimal(18,2))) as double)"))
        .collect().head.getDouble(0)
      assert(got == exact.toDouble, s"parts=$parts: $got != $exact")
    }
  }

  test("cosine is scale-invariant and bounded") {
    for (_ <- 0 until 20) {
      val v = Array.fill(16)(rnd.nextFloat() * 2 - 1)
      val w = Array.fill(16)(rnd.nextFloat() * 2 - 1)
      val scaled = v.map(_ * 7.5f)
      val r = Seq((v, w, scaled)).toDF("v", "w", "s")
        .select(Vectors.cosine($"v", $"w").as("c1"),
          Vectors.cosine($"s", $"w").as("c2"))
        .collect().head
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6)
      assert(math.abs(r.getDouble(0)) <= 1.0 + 1e-12)
    }
  }

  test("mask preserves length and masks exactly the three char classes") {
    for (_ <- 0 until 50) {
      val s = Random.alphanumeric.take(1 + rnd.nextInt(30)).mkString +
        "-,.!? ".take(rnd.nextInt(6))
      val m = spark.sql(s"SELECT mask('${s.replace("'", "")}')")
        .collect().head.getString(0)
      val in = s.replace("'", "")
      assert(m.length == in.length)
      in.zip(m).foreach { case (orig, masked) =>
        if (orig.isUpper) assert(masked == 'X')
        else if (orig.isLower) assert(masked == 'x')
        else if (orig.isDigit) assert(masked == 'n')
        else assert(masked == orig)
      }
    }
  }
}

package graft

import graft.operators.SetSim
import org.apache.spark.sql.functions._

class SetSimSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("id", "text")

  /** Brute-force Jaccard over all pairs — the correctness oracle the
    * prefix filter must exactly reproduce. */
  private def brute(rows: Seq[(Long, String)], t: Double) = {
    def toks(s: String) =
      s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet
    (for {
      (ia, ta) <- rows; (ib, tb) <- rows if ia < ib
      a = toks(ta); b = toks(tb) if a.nonEmpty && b.nonEmpty
      inter = a.intersect(b).size
      uni = a.size + b.size - inter
      if inter.toDouble >= t * uni
    } yield (ia, ib)).toSet
  }

  test("setsim: exact pair set matches brute force at several thresholds") {
    val rows = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumped over a lazy dog",
      3L -> "lorem ipsum dolor sit amet consectetur",
      4L -> "quick brown fox over lazy dog the jumps",  // permuted copy of 1
      5L -> "the the the quick quick dog",
      6L -> "entirely different words appear here now",
      7L -> "lorem ipsum dolor sit amet",
      8L -> "")
    for (t <- Seq(0.3, 0.5, 0.8, 1.0)) {
      val got = SetSim.jaccardSelfJoin(docs(rows: _*), "id", "text", t)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute(rows, t), s"threshold $t")
    }
  }

  test("setsim: permuted token order is jaccard 1.0") {
    val out = SetSim.jaccardSelfJoin(docs(
      1L -> "alpha beta gamma", 2L -> "gamma alpha beta"),
      "id", "text", 0.9).collect()
    assert(out.length == 1)
    assert(out.head.getDouble(2) == 1.0)
  }

  test("setsim: result is invariant to input partitioning") {
    val rows = (1L to 40L).map(i =>
      i -> s"tok${i % 7} tok${i % 5} tok${i % 3} shared common t$i")
    val expected = SetSim.jaccardSelfJoin(
      docs(rows: _*).coalesce(1), "id", "text", 0.4)
      .collect().map(_.toSeq).toSet
    val got = SetSim.jaccardSelfJoin(
      docs(rows: _*).repartition(7), "id", "text", 0.4)
      .collect().map(_.toSeq).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("setsim: maxBucket caps candidate fan-out (documented recall " +
    "trade) but never invents pairs") {
    val rows = (1L to 30L).map(i => i -> s"stop word every doc unique$i")
    val exact = SetSim.jaccardSelfJoin(docs(rows: _*), "id", "text", 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = SetSim.jaccardSelfJoin(
      docs(rows: _*), "id", "text", 0.5, maxBucket = 5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(exact))
  }
}

package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** BPE trainer/encoder against the classic hand-computed corpus
  * (low/lower/newest/widest — Sennrich et al. 2016 §3.2 style). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // word frequencies: low 5, lower 2, newest 6, widest 3
  private lazy val corpus = Seq(
    ("low " * 5) + ("lower " * 2),
    ("newest " * 6) + ("widest " * 3)
  ).toDF("text")

  test("bpeTrain learns the hand-computed merges with exact counts " +
    "and deterministic tie-breaks") {
    val got = TextAnalysis.bpeTrain(corpus, "text", 3)
      .orderBy("step")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    // round 1: e-s and s-t tie at 9; (l asc) picks (e, s)
    // round 2: es-t now 9, unique max
    // round 3: l-o and o-w tie at 7; picks (l, o)
    assert(got.toSeq == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L)))
  }

  test("bpeTrain stops early when no pairs remain") {
    val tiny = Seq("a b a b").toDF("text") // single-char words only
    assert(TextAnalysis.bpeTrain(tiny, "text", 5).count() == 0)
  }

  test("bpeEncode applies merges per word in order; greedy on runs") {
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"))
    val out = Seq("lowest newest").toDF("text")
      .select(TextAnalysis.bpeEncode(col("text"), merges).as("toks"))
      .collect().head.getSeq[String](0)
    assert(out == Seq("lo", "w", "est", "n", "e", "w", "est"))
    // greedy left-to-right on a run: aaaa -> aa aa (not a aa a)
    val run = Seq("aaaa aaa").toDF("text")
      .select(TextAnalysis.bpeEncode(col("text"),
        Seq(("a", "a"))).as("toks"))
      .collect().head.getSeq[String](0)
    assert(run == Seq("aa", "aa", "aa", "a"))
  }

  test("bpeEncode with no merges yields characters; empty text yields " +
    "empty array") {
    val out = Seq("ab", "").toDF("text")
      .select(TextAnalysis.bpeEncode(col("text"), Nil).as("toks"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("a", "b") && out(1).isEmpty)
  }
}

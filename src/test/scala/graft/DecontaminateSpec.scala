package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Decontaminate}

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val evalText = "the quick brown fox jumps over the lazy dog tonight"

  test("flag marks docs sharing an 8-gram with the eval set, keeps the rest") {
    val corpus = Seq(
      (1L, s"intro words here $evalText and a trailing tail"), // contains eval span
      (2L, "totally unrelated content with many distinct words to say"),
      (3L, "the quick brown fox sat still")                    // <8-gram overlap only
    ).toDF("doc_id", "text")
    val evalSet = Seq(evalText).toDF("text")

    val flagged = Decontaminate.flag(corpus, evalSet, "doc_id", "text", n = 8)
      .select("doc_id", "n_hits", "contaminated")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1)

    // eval text has 10 tokens → 3 distinct 8-grams, all inside doc 1
    assert(flagged(0) == ((1L, 3L, true)))
    assert(flagged(1) == ((2L, 0L, false)))
    assert(flagged(2) == ((3L, 0L, false)))
  }

  test("eval gram dictionary is broadcast — corpus side never shuffles") {
    val corpus = Seq((1L, evalText)).toDF("doc_id", "text")
    val evalSet = Seq(evalText).toDF("text")
    val df = Decontaminate.overlap(corpus, evalSet, "doc_id", "text")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"eval-set join must be a broadcast hash join:\n$p")
  }

  test("domainFilter drops blocked hosts via broadcast anti join") {
    val docs = Seq(
      (1L, "https://good.example.com/a"),
      (2L, "https://spam.example.com/b"),
      (3L, "https://good.example.com/c")
    ).toDF("doc_id", "url")
    val kept = Curation.domainFilter(docs, "url", Seq("spam.example.com"))
    val rows = kept.select("doc_id", "host").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(rows.toSeq == Seq((1L, "good.example.com"), (3L, "good.example.com")))

    kept.collect()
    val p = kept.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"blocklist must broadcast as an anti join:\n$p")
  }
}

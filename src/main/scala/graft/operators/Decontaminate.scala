package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find corpus documents that share word
  * n-grams with an evaluation set (the standard contamination check run
  * before training on web-scale corpora).
  *
  * 100 TB shape: eval sets are MBs while the corpus is TBs, so the
  * distinct eval n-gram dictionary is built once and BROADCAST; the
  * corpus is scanned exactly once, its shingles stream through a
  * broadcast hash join (no corpus-side shuffle of raw text), and only
  * the surviving (id, ngram) hits reach the per-document aggregation.
  * Per-document shingles are already distinct (ShingleSet), so the hit
  * count is a plain count, not a count-distinct.
  *
  * Reference seed: Hive's ngrams machinery
  * (ql/udf/generic/GenericUDAFnGrams.java) provides the tokenization
  * convention; the decontamination composition itself is an
  * LLM-pipeline extension beyond the reference.
  */
object Decontaminate {

  /** Per-document overlap counts: (idCol, n_hits) for every corpus
    * document sharing at least one n-gram with the eval set. */
  def overlap(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8): DataFrame = {
    val evalGrams = evalSet
      .select(explode(TextOps.shingleSet(col(textCol), n)).as("ngram"))
      .distinct()
    corpus
      .select(col(idCol), explode(TextOps.shingleSet(col(textCol), n)).as("ngram"))
      .join(broadcast(evalGrams), "ngram")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Corpus with a `contaminated` flag: true when a document shares at
    * least `minHits` distinct n-grams with the eval set. Left join keeps
    * clean documents (the common case) flowing through untouched. */
  def flag(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      minHits: Int = 1): DataFrame = {
    val hits = overlap(corpus, evalSet, idCol, textCol, n)
    corpus
      .join(hits, Seq(idCol), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("contaminated", col("n_hits") >= minHits)
  }
}

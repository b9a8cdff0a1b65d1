package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document line-level boilerplate removal (the RefinedWeb/CCNet
  * cleanup step): a line that appears in many distinct documents is
  * navigation/footer/licence boilerplate, not content — strip it from
  * every document and rebuild the text.
  *
  * Scale shape: lines shuffle by an 8-byte xxhash64 of their content for
  * the document-frequency count (never by the line text itself); the
  * frequent-line set is the filter side of a left-anti join that AQE can
  * collapse to a broadcast at runtime (boilerplate sets are tiny relative
  * to the corpus); the rebuild is one groupBy(doc) with an array sort —
  * three shuffles total, all on keys, no driver involvement.
  */
object Lines {

  /** Fixed-width pseudo-lines: consecutive `n`-token groups of a text
    * column — the line splitter to use when the corpus has no natural
    * newlines (or to catch boilerplate that ignores line breaks). */
  def pseudoLines(text: Column, n: Int): Column = {
    val toks = when(text.isNull || length(trim(text)) === 0,
      array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))
    val groups = ceil(size(toks) / lit(n.toDouble)).cast("int")
    when(groups >= 1,
      transform(sequence(lit(0), groups - 1),
        g => concat_ws(" ", slice(toks, g * n + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Strip lines whose document frequency (distinct docs containing the
    * line) reaches `minDocFreq`, then rebuild each document by joining
    * the surviving lines in order. Documents whose every line is
    * boilerplate come back with empty text. Output: idCol, clean_text,
    * n_kept, n_dropped. */
  def stripBoilerplate(
      df: DataFrame,
      idCol: String,
      linesCol: Column,
      minDocFreq: Long,
      joiner: String = "\n"): DataFrame = {
    require(minDocFreq >= 2, "minDocFreq must be >= 2")
    val lines = df
      .select(col(idCol), posexplode(linesCol).as(Seq("__pos", "__line")))
      .withColumn("__lh", xxhash64(col("__line")))
    val frequent = lines
      .groupBy("__lh").agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") >= minDocFreq)
      .select("__lh")
    val kept = lines.join(frequent, Seq("__lh"), "left_anti")
      .groupBy(idCol)
      .agg(
        concat_ws(joiner,
          transform(
            array_sort(collect_list(struct(col("__pos"), col("__line")))),
            s => s.getField("__line"))).as("clean_text"),
        count(lit(1)).as("n_kept"))
    val totals = df.select(col(idCol),
      size(linesCol).cast("long").as("__total"))
    totals.join(kept, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__total") - coalesce(col("n_kept"), lit(0L)))
          .as("n_dropped"))
  }
}

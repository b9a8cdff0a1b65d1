package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation pipeline composing the text
  * operators: quality gate → language ID → exact dedup → per-language
  * corpus stats. Every stage is a narrow column expression or one
  * hash-shuffle — the canonical 100 TB pre-training cleanup job shape
  * (filter early, dedup on the reduced set, aggregate last).
  */
object Curation {

  /** Quality-gated, deduplicated corpus with predicted language.
    * Keeps the lowest doc id per distinct text. */
  def curate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minTokens: Int = 20,
      maxPunctRatio: Double = 0.05,
      langCol: String = "lang"): DataFrame = {
    val m = docs.select(
      col(idCol).as("doc_id"),
      col(textCol).as("text"),
      col(langCol).as("lang"),
      TextAnalysis.qualityMetrics(col(textCol)).as("m"),
      TextAnalysis.langId(col(textCol)).as("predicted"))
      .filter(col("m.n_tokens") >= minTokens &&
        col("m.punct_ratio") < maxPunctRatio)
    m.groupBy(col("text"))
      .agg(
        min(col("doc_id")).as("keep_id"),
        min_by(col("lang"), col("doc_id")).as("lang"),
        min_by(col("predicted"), col("doc_id")).as("predicted"),
        min_by(col("m.n_tokens"), col("doc_id")).as("n_tokens"))
      .select(col("keep_id"), col("lang"), col("predicted"),
        col("n_tokens"), col("text"))
  }

  /** Drop documents whose URL host is on a blocklist (spam/SEO domain
    * filtering — the first gate of a web-corpus pipeline). Blocklists
    * are thousands of hosts while the corpus is TBs, so the blocklist
    * broadcasts and the corpus streams through a broadcast LEFT ANTI
    * hash join with no shuffle. Adds a `host` column. */
  def domainFilter(
      docs: DataFrame,
      urlCol: String,
      blockedHosts: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val blocked = blockedHosts.map(_.toLowerCase).toDF("blocked_host")
    // hosts compare case-insensitively (RFC 3986); an unparseable URL
    // (NULL host) fails CLOSED — NULL === blocked is never true, so
    // without the explicit filter the anti join would keep the row
    docs
      .withColumn("host", lower(try_parse_url(col(urlCol), lit("HOST"))))
      .filter(col("host").isNotNull)
      .join(broadcast(blocked), col("host") === col("blocked_host"),
        "left_anti")
  }

  /** Per-language stats over the curated corpus: volume, token mass,
    * lang-id agreement — the report a curation run ends with. */
  def corpusStats(curated: DataFrame): DataFrame =
    curated.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        count(when(col("predicted") === col("lang"), 1)).as("n_pred_match"))
      .orderBy(col("lang"))
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction for training-data curation — the standard
  * pre-training cleanup step next to dedup and quality gating. Pure
  * codegen'd regexp expressions: no UDF, no shuffle, one pass; at 100 TB
  * the cost is the text scan itself.
  *
  * Pattern classes follow the common curation tooling set (emails,
  * North-American phone numbers, IPv4 addresses, SSNs); patterns are
  * deliberately conservative (word-bounded) so redaction never eats
  * surrounding text. All regexes are RE2-compatible so the DuckDB oracle
  * can replicate them exactly.
  */
object Pii {

  val Email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ssn = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val Phone = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val Ipv4 = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** Redact all PII classes with typed placeholders. Order matters:
    * emails first (digit-bearing local parts), SSN before phone (both
    * are dash-digit shapes), IP last. */
  def redact(text: Column): Column = {
    val e = regexp_replace(text, Email, "<EMAIL>")
    val s = regexp_replace(e, Ssn, "<SSN>")
    val p = regexp_replace(s, Phone, "<PHONE>")
    regexp_replace(p, Ipv4, "<IP>")
  }

  /** Per-class match counts on the ORIGINAL text (audit trail — counts
    * must be taken before redaction rewrites the matches). */
  def counts(text: Column): Column = struct(
    regexp_count(text, lit(Email)).as("n_emails"),
    regexp_count(text, lit(Ssn)).as("n_ssns"),
    regexp_count(text, lit(Phone)).as("n_phones"),
    regexp_count(text, lit(Ipv4)).as("n_ips"))

  /** Curation-stage wrapper: text column redacted in place, counts kept. */
  def withRedaction(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("pii", counts(col(textCol)))
      .withColumn(textCol, redact(col(textCol)))
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Orderless dataset comparison — the validation step between two runs of
  * a 100 TB pipeline ("did the refactor change any output row?"). A
  * driver-side collect-and-compare can never do this; the diff is one
  * full-outer shuffle on the key columns with all non-key columns folded
  * into a struct (columnar, codegen'd null-safe comparison — no
  * row-to-JSON detour).
  *
  * Reference seed: Hive ships no diff operator; its qtest harness diffs
  * sorted text dumps driver-side (ql/QTestUtil.java) — this is the same
  * contract made distributed.
  */
object Diff {

  /** Per-key status of `newDf` relative to `oldDf`:
    * `added` (key only in new), `removed` (key only in old), `changed`
    * (both sides, any non-key column differs under null-safe equality),
    * `unchanged`. Schemas must match. Keys should be unique per side;
    * NULL keys never match across sides (SQL join semantics), so a
    * NULL-key row counts as removed+added rather than compared. */
  def datasetDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(oldDf.columns.sameElements(newDf.columns),
      s"schemas must match: ${oldDf.columns.mkString(",")} vs " +
        newDf.columns.mkString(","))
    require(keyCols.nonEmpty && keyCols.forall(oldDf.columns.contains),
      "keyCols must be non-empty columns of both frames")
    val nonKey = oldDf.columns.filterNot(keyCols.contains)
    def packed(df: DataFrame, as: String) =
      df.select(keyCols.map(col) :+ struct(nonKey.map(col): _*).as(as): _*)
    packed(oldDf, "__old").join(packed(newDf, "__new"), keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("__old").isNull, lit("added"))
          .when(col("__new").isNull, lit("removed"))
          .when(!(col("__old") <=> col("__new")), lit("changed"))
          .otherwise(lit("unchanged")).as("status"): _*)
  }

  /** The one-line summary of a diff: status → row count. */
  def diffSummary(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCols: Seq[String]): DataFrame =
    datasetDiff(oldDf, newDf, keyCols)
      .groupBy("status").agg(count(lit(1)).as("n"))

  /** Order-independent table fingerprint over `cols`: one (n_rows, fp)
    * row, where fp = Σ per-row 40-bit md5 key as an exact decimal —
    * commutative, so any partitioning/ordering of the same rows yields
    * the same fingerprint, and two copies of a pipeline output can be
    * compared with a single row exchange instead of a full diff join.
    * 40-bit keys keep a 2^38-row table's sum inside decimal(38,0);
    * duplicate-row multiplicity is counted (a sum, not a set hash). */
  def tableFingerprint(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val canon = concat_ws("|", cols.map(c => col(c).cast("string")): _*)
    val key = pmod(
      conv(substring(md5(canon), 1, 15), 16, 10).cast("long"),
      lit(1L << 40))
    df.select(key.as("k"))
      .agg(count(lit(1)).as("n_rows"),
        // decimal-exact sum rendered as digits: the value exceeds
        // double's 2^53 integer range on real tables, and engines render
        // wide decimals differently — a string survives any transport
        sum(col("k").cast("decimal(38,0)")).cast("string").as("fp"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture application: compact a changelog onto a base
  * snapshot — the MERGE INTO / upsert shape. The reference engine (Hive
  * 1.2, SURVEY §2.9) stops at UPDATE/DELETE; MERGE arrives in Hive 2.2
  * (`ql/parse/MergeSemanticAnalyzer` upstream), and a training-data
  * warehouse needs the changelog-compaction form of it anyway: apply a
  * day of I/U/D events to yesterday's snapshot in one pass.
  *
  * Scale shape: one map-side-combinable reduction collapses the changelog
  * to its latest row per key (changelogs repeat hot keys; partial
  * aggregation eats that before the shuffle), then ONE key-partitioned
  * full-outer join against the base. No windows over the base, no
  * driver-side state. At 100 TB the base-side shuffle dominates; when the
  * compacted changelog is small Spark's AQE broadcasts it and the base
  * never shuffles at all. Pair with `Warehouse` partition-granular
  * rewrite to persist only partitions that received changes.
  */
object Cdc {

  /** Apply `changes` (keyCols + seqCol + opCol + the base's payload
    * columns) to `base` (keyCols + payload). Per key, the change with the
    * highest (seq, op, payload...) struct wins — the tail of that struct
    * only matters if a key repeats a sequence number, where it makes the
    * pick deterministic instead of run-dependent; give changes unique
    * (key, seq) and ordering is purely by sequence. Ops: 'D' deletes the
    * key; any other op ('I'/'U') upserts the change's payload. Deletes of
    * absent keys and stale lower-seq changes are no-ops. */
  def applyCdc(
      base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      seqCol: String, opCol: String): DataFrame = {
    val payload = base.columns.filterNot(keyCols.contains).toSeq
    val missing = (keyCols ++ payload :+ seqCol :+ opCol)
      .filterNot(changes.columns.contains)
    require(missing.isEmpty, s"changes is missing columns: $missing")

    val latest = changes
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(
        struct((opCol +: payload).map(col): _*),
        struct((seqCol +: opCol +: payload).map(col): _*)).as("__c"))
      .select(keyCols.map(col) :+ col(s"__c.$opCol").as("__op") :++
        payload.map(p => col(s"__c.$p").as(s"__c_$p")): _*)

    base.join(latest, keyCols, "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(keyCols.map(col) ++ payload.map(p =>
        when(col("__op").isNotNull, col(s"__c_$p")).otherwise(col(p))
          .as(p)): _*)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Build a mergeable aggregate snapshot: per key, row count `n` and an
    * exact-decimal `<c>_sum` per value column. This is the materialized-
    * view state for incremental ETL: counts and decimal sums combine
    * associatively, so a snapshot can absorb any number of later batches
    * through `mergeSnapshots` and stay bit-identical to a full recompute
    * (derive avg as sum/n at read time). */
  def aggregateSnapshot(
      df: DataFrame, keyCols: Seq[String], valCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        valCols.map(c =>
          sum(col(c).cast("decimal(18,2)")).cast("decimal(38,2)")
            .as(s"${c}_sum")): _*)
  }

  /** Merge two aggregate snapshots (same schema, from
    * `aggregateSnapshot`): one key-partitioned full-outer join, counts
    * and sums added. The join is NULL-SAFE on the keys (a NULL group is
    * one group, as groupBy treats it — a plain equi-join would emit a
    * duplicate NULL-key row per merge), and a sum stays NULL when BOTH
    * sides are NULL (all values NULL so far — SQL sum semantics; a
    * coalesce-to-0 would diverge from the full recompute). Incremental
    * refresh is `mergeSnapshots(yesterday, aggregateSnapshot(batch,
    * …))` — history is never rescanned, and when the batch snapshot is
    * small AQE broadcasts it so the stored side never shuffles either. */
  def mergeSnapshots(
      a: DataFrame, b: DataFrame,
      keyCols: Seq[String], valCols: Seq[String]): DataFrame = {
    val sums = valCols.map(c => s"${c}_sum")
    val bb = (keyCols ++ Seq("n") ++ sums).foldLeft(b)((d, c) =>
      d.withColumnRenamed(c, s"__b_$c"))
    val cond = keyCols.map(c => col(c) <=> col(s"__b_$c")).reduce(_ && _)
    def addSum(c: String): Column =
      when(col(c).isNull && col(s"__b_$c").isNull,
        lit(null).cast("decimal(38,2)"))
        .otherwise(
          (coalesce(col(c), lit(BigDecimal(0)).cast("decimal(38,2)")) +
            coalesce(col(s"__b_$c"), lit(BigDecimal(0)).cast("decimal(38,2)")))
            .cast("decimal(38,2)"))
    a.join(bb, cond, "full_outer")
      .select(keyCols.map(c => coalesce(col(c), col(s"__b_$c")).as(c)) ++
        Seq((coalesce(col("n"), lit(0L)) +
          coalesce(col("__b_n"), lit(0L))).as("n")) ++
        sums.map(c => addSum(c).as(c)): _*)
  }

  /** Slowly-changing-dimension Type 2: turn a per-key change log into a
    * versioned history. Consecutive rows (per key, ordered by `orderCols`)
    * whose tracked attributes are unchanged are collapsed; each surviving
    * version carries `valid_from` (its first order value), `valid_to`
    * (the next version's `valid_from`, NULL while current) and
    * `is_current`. The warehouse counterpart of `applyCdc`: applyCdc
    * keeps only the latest state, scdType2 keeps every state with its
    * validity interval — the dimension-table shape point-in-time joins
    * (`AsOfJoin`) need.
    *
    * Scale shape: both the change-detection lag and the valid_to lead are
    * windows PARTITIONED BY the key — one hash shuffle on the key total
    * (Catalyst collapses adjacent same-partitioning windows), per-key
    * state is a single row of lag memory, and no window ever spans the
    * whole table. Hot keys are bounded by their own change count, not by
    * table size. `orderCols` must be unique per key (add a sequence/event
    * id as tiebreak) or version order is data-dependent; `validCol`
    * (defaults to the first order column) is the value that becomes the
    * version's `valid_from` / the predecessor's `valid_to`. */
  def scdType2(
      changes: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      attrCols: Seq[String], validCol: String = ""): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty && attrCols.nonEmpty,
      "keyCols, orderCols and attrCols must all be non-empty")
    val vc = if (validCol.nonEmpty) validCol else orderCols.head
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val attrs = struct(attrCols.map(col): _*)
    // NULL-safe change test: the first row per key (lag = NULL struct)
    // always starts a version; later rows only when attrs differ.
    changes
      .withColumn("__changed",
        !(attrs <=> lag(attrs, 1).over(w)))
      .filter(col("__changed"))
      .withColumn("valid_from", col(vc))
      .withColumn("valid_to", lead(col(vc), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols ++ attrCols).map(col) :+
        col("valid_from") :+ col("valid_to") :+ col("is_current"): _*)
  }

  /** Incrementally fold a new change batch into an existing
    * `scdType2` history — cost ∝ (touched keys' versions + batch), the
    * stored history is never rescanned beyond a key semi-join. Keys
    * absent from the batch pass through untouched; touched keys replay
    * (their stored versions, re-expressed as change rows at
    * `valid_from`) ∪ (their batch rows) through the same collapse.
    *
    * Contract: the batch must be strictly LATER than the stored history
    * (per key, every batch order value > the key's last `valid_from`) —
    * version collapse is order-sensitive, so late-arriving data needs a
    * replay from the full log instead. Violations fail loudly (one
    * aggregate over the touched keys, not a full-history pass, embedded
    * in the output plan so the check rides the job the caller already
    * pays and raises when the result materializes) rather than silently
    * producing a history that a from-scratch rebuild would contradict.
    * Equivalence to the full rebuild is spec-pinned.
    *
    * `history` must be in scdType2's output shape; `orderCols` is the
    * batch's ordering (first column is the `valid_from` source, the rest
    * tiebreaks — same contract as `scdType2`). Stored versions replay in
    * their chain order, reconstructed as (valid_from, valid_to NULLS
    * LAST): along a key's version chain valid_to is non-decreasing and
    * only the current version's is NULL, so equal-valid_from versions
    * (built with a tiebreak column the history does not store) still
    * replay in build order. */
  def scdType2Apply(
      history: DataFrame, batch: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String], attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty && attrCols.nonEmpty,
      "keyCols, orderCols and attrCols must be non-empty")
    import org.apache.spark.sql.expressions.Window
    val vc = orderCols.head
    val outCols = (keyCols ++ attrCols).map(col) :+
      col("valid_from") :+ col("valid_to") :+ col("is_current")
    val touched = batch.select(keyCols.map(col): _*).distinct()
    val untouched = history.join(touched, keyCols, "left_anti")
    val affectedHist = history.join(touched, keyCols, "left_semi")
    // loud late-data guard: newest stored valid_from vs oldest batch
    // row. r15: evaluated LAZILY inside the output plan (a one-row
    // violation-count scalar cross-joined into the rebuilt branch and
    // asserted per-row) instead of an eager count() — same aggregate
    // over the touched keys, but it rides the job the caller already
    // pays instead of a separate driver-blocking action. A violation
    // still fails the apply loudly (now when its result materializes —
    // the streaming sink's batch contract is unchanged).
    val lateCount = affectedHist
      .groupBy(keyCols.map(col): _*)
      .agg(max(col("valid_from")).as("__last"))
      .join(batch.groupBy(keyCols.map(col): _*)
        .agg(min(col(vc)).as("__first")), keyCols)
      .filter(col("__first") <= col("__last"))
      .agg(count(lit(1)).as("__late"))
    // Per-key replay position: history versions first (chain order), then
    // batch rows (their own orderCols) — the guard above guarantees every
    // batch row is strictly later, so (segment, row_number) totally orders
    // the replay even when the raw order values tie. Both row_numbers
    // window over the same key partitioning, so this folds into the one
    // key shuffle the replay needs anyway.
    val histW = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("valid_from").asc, col("valid_to").asc_nulls_last)
    val batchW = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(c => col(c).asc): _*)
    val replay = affectedHist
      .select((keyCols ++ attrCols).map(col) :+ col("valid_from").as(vc) :+
        lit(0).as("__seg") :+ row_number().over(histW).as("__pos"): _*)
      .unionByName(batch.select(
        (keyCols ++ attrCols).map(col) :+ col(vc) :+
          lit(1).as("__seg") :+ row_number().over(batchW).as("__pos"): _*))
    val rebuilt =
      scdType2(replay, keyCols, Seq("__seg", "__pos"), attrCols, validCol = vc)
    // guard attachment: every rebuilt row filters through the one-row
    // broadcast violation count (assert_true returns NULL ⇒ keep row;
    // a non-zero count raises instead). Violations imply a non-empty
    // rebuilt branch (the violating keys are touched), so the check
    // cannot be skipped by emptiness; a clean batch costs one
    // broadcast scalar.
    val guarded = rebuilt
      .crossJoin(broadcast(lateCount))
      .filter(assert_true(col("__late") === 0L,
        concat(lit("scdType2Apply: "), col("__late"),
          lit(" key(s) have batch rows at or before their stored " +
            "history — late data needs a full-log rebuild"))).isNull)
      .drop("__late")
    untouched.select(outCols: _*).unionByName(guarded.select(outCols: _*))
  }

  /** Point-in-time enrichment against an `scdType2` history: each fact
    * row picks up the version whose `[valid_from, valid_to)` interval
    * contains `facts(tsCol)` (open-ended current versions match
    * everything from their `valid_from`). Facts with no active version
    * (before the key's first change, or unknown key) survive with NULL
    * attrs under "left".
    *
    * Scale shape: the join is KEYED — one hash shuffle on the key for
    * both sides, interval containment as a residual filter; per-key
    * fan-out is that key's version count, never table size. No bucket
    * explosion is needed (that is `RangeJoin.pointInRange`'s job for
    * UN-keyed interval joins). Version intervals per key are disjoint
    * by construction, so each fact matches at most one version. */
  def pointInTimeJoin(
      facts: DataFrame, history: DataFrame, keyCols: Seq[String],
      tsCol: String, joinType: String = "left"): DataFrame = {
    // the output is facts.* ++ history-payload.*; a shared name (e.g. a
    // fact column called valid_from) would silently produce a duplicate
    // column — fail loudly instead and let the caller rename
    val histPayloadNames = history.columns.filterNot(keyCols.contains)
    val clash = facts.columns.intersect(histPayloadNames)
    require(clash.isEmpty,
      s"pointInTimeJoin: fact and history column name(s) collide: " +
        s"${clash.mkString(", ")} — rename before joining")
    val f = facts.alias("__f")
    val h = history.alias("__h")
    val keyEq = keyCols.map(k => col(s"__f.$k") === col(s"__h.$k"))
      .reduce(_ && _)
    val contained = col(s"__f.$tsCol") >= col("__h.valid_from") &&
      (col("__h.valid_to").isNull ||
        col(s"__f.$tsCol") < col("__h.valid_to"))
    val histPayload = history.columns.filterNot(keyCols.contains)
    f.join(h, keyEq && contained, joinType)
      .select(facts.columns.map(c => col(s"__f.$c")) ++
        histPayload.map(c => col(s"__h.$c")): _*)
  }
}

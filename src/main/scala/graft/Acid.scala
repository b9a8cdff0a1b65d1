package graft

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ACID delta-file table layout + compactor, re-expressed Spark-first.
  *
  * Directory contract mirrors the reference's `ql/io/AcidUtils.java:60-126`:
  * a table directory holds `base_%07d` (rows compacted through that write
  * id) and `delta_%07d_%07d` (the events of write ids min..max); names
  * starting with `.` or `_` are invisible to readers
  * (`AcidUtils.hiddenFileFilter`), which is what makes staged writes
  * crash-safe here — every writer stages into `_tmp_<target>` inside the
  * table dir and atomically renames to the final name, so a crash leaves
  * only an ignored temp dir, never a half-visible delta.
  *
  * Event rows use the ACID event schema of
  * `ql/io/orc/OrcRecordUpdater.java:204-224` — (operation,
  * originalTransaction, bucket, rowId, currentTransaction, row) with
  * operation 0=insert / 1=update / 2=delete — stored as parquet instead of
  * ORC (the engine's native columnar format; same information, including
  * predicate pushdown on the id columns). A row's identity is
  * (originalTransaction, bucket, rowId), assigned at insert and carried
  * unchanged by every later update/delete of that row, exactly as
  * `OrcRecordUpdater.update/delete` reuse the original RecordIdentifier.
  *
  * Snapshot semantics (`AcidUtils.getAcidState`, `OrcRawRecordMerger`):
  * pick the highest base, then the non-subsumed deltas above it, and for
  * each row identity let the event with the highest currentTransaction
  * win; a winning delete removes the row. The reference merges
  * sorted-ORC streams per bucket; here the same resolution is ONE
  * map-side-combinable `max_by` aggregation keyed on the row identity —
  * a single shuffle whose width is the number of live+dead row versions,
  * the plan you want at 100 TB.
  *
  * Why this layout matters vs `Warehouse.update/delete` (the
  * partition-rewrite path): a mutation here writes O(changed rows) — a
  * delete of 100 rows in a 100 TB table writes one tiny delta dir, not a
  * partition rewrite. The compactor then folds deltas back in off the
  * write path: `compactMinor` merges deltas into one (reference
  * `ql/txn/compactor/Worker.java` MINOR), `compactMajor` resolves
  * everything into a new base (MAJOR), `maybeCompact` is the
  * `Initiator.java` heuristic (delta count / delta-to-base size ratio),
  * and `clean` is `Cleaner.java` — obsolete dirs survive until it runs,
  * so in-flight readers holding the old dir list stay consistent.
  *
  * Single-writer assumption: write-id allocation lists the directory
  * (`nextWriteId`). The reference serializes writers through the
  * metastore transaction manager (`DbTxnManager`), which is service
  * infrastructure out of engine scope here, like the HS2 wire protocol.
  */
object Acid {

  private val MetaCols = Seq("operation", "originalTransaction", "bucket",
    "rowId", "currentTransaction")
  val InsertOp = 0
  val UpdateOp = 1
  val DeleteOp = 2

  private def deltaName(min: Long, max: Long) = f"delta_$min%07d_$max%07d"
  private def baseName(w: Long) = f"base_$w%07d"

  private[graft] final case class Delta(min: Long, max: Long, dir: File)
  private[graft] final case class State(base: Option[(Long, File)],
      deltas: Seq[Delta])

  private def visible(f: File): Boolean = {
    val n = f.getName
    f.isDirectory && !n.startsWith(".") && !n.startsWith("_")
  }

  /** Directory census: highest base + the deltas above it, with subsumed
    * delta ranges (a minor-compacted `delta_1_5` next to not-yet-cleaned
    * `delta_2_2`) dropped so no event is read twice. Mirrors
    * `AcidUtils.getAcidState`. */
  private[graft] def state(path: String): State = {
    val children = Option(new File(path).listFiles()).getOrElse(Array.empty)
      .filter(visible)
    val base = children.collect {
      case f if f.getName.startsWith("base_") =>
        (f.getName.stripPrefix("base_").toLong, f)
    }.sortBy(_._1).lastOption
    val floor = base.map(_._1).getOrElse(0L)
    val all = children.collect {
      case f if f.getName.startsWith("delta_") =>
        val Array(mn, mx) = f.getName.stripPrefix("delta_").split("_")
        Delta(mn.toLong, mx.toLong, f)
    }.filter(_.max > floor)
    // widest-first selection: a delta strictly inside an already-selected
    // range is the pre-compaction original of a merged delta — skip it
    val selected = scala.collection.mutable.ArrayBuffer.empty[Delta]
    all.sortBy(d => (d.min, -d.max)).foreach { d =>
      if (!selected.exists(s => s.min <= d.min && d.max <= s.max))
        selected += d
    }
    State(base, selected.toSeq)
  }

  private[graft] def nextWriteId(path: String): Long = {
    val s = state(path)
    (s.base.map(_._1).getOrElse(0L) +: s.deltas.map(_.max)).max + 1
  }

  /** Stage-then-rename: parquet lands in `_tmp_<name>` (invisible to
    * readers), one atomic dir rename publishes it. `marker`, when set,
    * is an empty `_`-prefixed file created inside the staged dir BEFORE
    * the rename — it publishes atomically with the data (parquet readers
    * skip `_`/`.` files), which is what makes the streaming sink's
    * batch-id bookkeeping exactly-once without a second commit point. */
  private def writeDir(df: DataFrame, path: String, name: String,
      marker: Option[String] = None): Unit = {
    val tmp = new File(path, s"_tmp_$name")
    df.write.mode("overwrite").parquet(tmp.toString)
    marker.foreach(m => new File(tmp, m).createNewFile())
    Files.move(tmp.toPath, new File(path, name).toPath,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Wrap data rows as insert events for write id `w`. Bucket is the
    * writing task's partition id and rowId a per-bucket sequence —
    * the same writer-local assignment as `OrcRecordUpdater.insert`
    * (bucket file + monotonically increasing rowid), so ids are unique
    * without any global coordination. The per-bucket row_number is one
    * shuffle on bucket — the cost of any bucketed write. */
  private def asInsertEvents(df: DataFrame, w: Long): DataFrame = {
    require(df.columns.map(_.toLowerCase).intersect(
      (MetaCols :+ "row").map(_.toLowerCase)).isEmpty,
      "data columns may not collide with ACID event columns")
    df.withColumn("bucket", spark_partition_id())
      .withColumn("__seq", monotonically_increasing_id())
      .withColumn("rowId", row_number().over(
        Window.partitionBy(col("bucket"))
          .orderBy(col("__seq"))).cast("long") - 1)
      .select(
        lit(InsertOp).as("operation"),
        lit(w).as("originalTransaction"),
        col("bucket"),
        col("rowId"),
        lit(w).as("currentTransaction"),
        struct(df.columns.map(col): _*).as("row"))
  }

  /** Create an empty ACID table directory. Like the reference, a fresh
    * table has no base — the first base appears at major compaction. */
  def create(path: String): Unit = { new File(path).mkdirs() }

  /** INSERT transaction: appends one `delta_w_w` of insert events. */
  def insertTxn(spark: SparkSession, path: String, df: DataFrame): Long = {
    val w = nextWriteId(path)
    writeDir(asInsertEvents(df, w), path, deltaName(w, w))
    w
  }

  /** Current committed snapshot with the ROW__ID virtual column exposed
    * (originalTransaction, bucket, rowId) — the reference's ROW__ID. */
  def snapshotWithRowId(spark: SparkSession, path: String): DataFrame = {
    val s = state(path)
    val deltas = s.deltas.map(d =>
      spark.read.parquet(d.dir.toString))
    val baseEvents = s.base.map { case (w, dir) =>
      val b = spark.read.parquet(dir.toString)
      val dataCols = b.columns
        .filterNot(Set("originalTransaction", "bucket", "rowId"))
      b.select(
        lit(InsertOp).as("operation"),
        col("originalTransaction"),
        col("bucket"),
        col("rowId"),
        lit(w).as("currentTransaction"),
        struct(dataCols.map(col): _*).as("row"))
    }
    val events = (baseEvents.toSeq ++ deltas) match {
      case Seq() => return spark.emptyDataFrame
      case es    => es.reduce(_ unionByName _)
    }
    // last event per row identity wins; a winning delete drops the row.
    // max_by over (currentTransaction) is map-side combinable — partial
    // aggregation resolves most versions before the single shuffle.
    events
      .groupBy(col("originalTransaction"), col("bucket"), col("rowId"))
      .agg(max_by(struct(col("operation"), col("row")),
        col("currentTransaction")).as("last"))
      .filter(col("last.operation") =!= DeleteOp)
      .select(
        struct(col("originalTransaction"), col("bucket"), col("rowId"))
          .as("row__id"),
        col("last.row.*"))
  }

  /** Current committed snapshot (data columns only). */
  def snapshot(spark: SparkSession, path: String): DataFrame =
    snapshotWithRowId(spark, path).drop("row__id")

  /** UPDATE transaction: SQL simultaneous-assignment semantics (every SET
    * expression and the predicate see the PRE-update row), writing update
    * events that keep the original ROW__ID — O(matched rows), never a
    * table rewrite. */
  def updateTxn(spark: SparkSession, path: String,
      sets: Map[String, String], where: String): Long = {
    val cur = snapshotWithRowId(spark, path)
    val dataCols = cur.columns.filterNot(_ == "row__id")
    val setsLower = sets.map { case (c, e) => c.toLowerCase -> e }
    val unknown = setsLower.keySet.diff(dataCols.map(_.toLowerCase).toSet)
    require(unknown.isEmpty,
      s"UPDATE SET references column(s) ${unknown.mkString(", ")} not in $path")
    val w = nextWriteId(path)
    val matched = cur.filter(expr(where))
    val updatedRow = struct(dataCols.map { c =>
      setsLower.get(c.toLowerCase) match {
        // cast back: the event schema is the table schema — a SET whose
        // expression widens the type would silently fork the row struct
        case Some(e) => expr(e).cast(matched.schema(c).dataType).as(c)
        case None    => col(c)
      }
    }: _*)
    writeDir(matched.select(
      lit(UpdateOp).as("operation"),
      col("row__id.originalTransaction"),
      col("row__id.bucket"),
      col("row__id.rowId"),
      lit(w).as("currentTransaction"),
      updatedRow.as("row")), path, deltaName(w, w))
    w
  }

  /** DELETE transaction: delete events carry only the ROW__ID (row is
    * NULL), matching `OrcRecordUpdater.delete`. NULL predicate keeps the
    * row (three-valued logic, as in `Warehouse.delete`). */
  def deleteTxn(spark: SparkSession, path: String, where: String): Long = {
    val cur = snapshotWithRowId(spark, path)
    val dataCols = cur.columns.filterNot(_ == "row__id")
    val w = nextWriteId(path)
    val rowType = cur.select(struct(dataCols.map(col): _*)).schema.head.dataType
    writeDir(cur.filter(coalesce(expr(where), lit(false))).select(
      lit(DeleteOp).as("operation"),
      col("row__id.originalTransaction"),
      col("row__id.bucket"),
      col("row__id.rowId"),
      lit(w).as("currentTransaction"),
      lit(null).cast(rowType).as("row")), path, deltaName(w, w))
    w
  }

  /** MERGE INTO as ONE transaction (Hive 2.2 MERGE over ACID tables,
    * `SemanticAnalyzer` merge path): matched rows take the first WHEN
    * clause whose condition holds (update or delete events keeping their
    * ROW__ID), unmatched source rows become insert events — all in a
    * single `delta_w_w`, one snapshot-source join. The reference's
    * cardinality check (a target row matching >1 source row is an error)
    * keys on ROW__ID here, which the rewrite-path `Warehouse.merge` has
    * to approximate by whole-row value. */
  def mergeTxn(spark: SparkSession, path: String,
      source: DataFrame, sourceAlias: String, targetAlias: String,
      on: String,
      matched: Seq[Warehouse.MatchedClause],
      notMatched: Option[Warehouse.NotMatchedInsert]): Long = {
    require(matched.nonEmpty || notMatched.nonEmpty,
      "MERGE needs at least one WHEN clause")
    val cur = snapshotWithRowId(spark, path)
    val dataCols = cur.columns.filterNot(_ == "row__id")
    val w = nextWriteId(path)
    val t = cur.alias(targetAlias)
    val s = source.alias(sourceAlias)
    // persisted: cardinality check + matched events + anti-join inserts
    // all read this join; without it the dominant join re-executes per
    // action (and a nondeterministic source could pass the check yet
    // write different events)
    val joined = t.join(s, expr(on), "inner")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dup = joined.groupBy(col(s"$targetAlias.row__id"))
        .agg(count(lit(1)).as("n")).filter(col("n") > 1).limit(1).count()
      require(dup == 0,
        s"MERGE cardinality violation: a row of $path matches more than " +
          "one source row")
      // first listed WHEN MATCHED clause whose condition holds applies;
      // 0 = no clause matched (row untouched — emit no event)
      val outcome = matched.zipWithIndex.foldRight(lit(0)) {
        case ((cl, i), els) =>
          val c = cl match {
            case Warehouse.MatchedUpdate(cond, _) => cond
            case Warehouse.MatchedDelete(cond)    => cond
          }
          when(c.map(expr).getOrElse(lit(true)), lit(i + 1)).otherwise(els)
      }
      val withOut = joined.withColumn("__out", outcome)
      val rowType = cur.select(struct(dataCols.map(c =>
        col(c)): _*)).schema.head.dataType
      val matchedEvents = matched.zipWithIndex.map {
        case (Warehouse.MatchedUpdate(_, sets), i) =>
          val setsLower = sets.map { case (c, e) => c.toLowerCase -> e }
          withOut.filter(col("__out") === (i + 1)).select(
            lit(UpdateOp).as("operation"),
            col(s"$targetAlias.row__id.originalTransaction"),
            col(s"$targetAlias.row__id.bucket"),
            col(s"$targetAlias.row__id.rowId"),
            lit(w).as("currentTransaction"),
            struct(dataCols.map { c =>
              setsLower.get(c.toLowerCase) match {
                case Some(e) => expr(e)
                  .cast(cur.schema(c).dataType).as(c)
                case None => col(s"$targetAlias.$c")
              }
            }: _*).as("row"))
        case (Warehouse.MatchedDelete(_), i) =>
          withOut.filter(col("__out") === (i + 1)).select(
            lit(DeleteOp).as("operation"),
            col(s"$targetAlias.row__id.originalTransaction"),
            col(s"$targetAlias.row__id.bucket"),
            col(s"$targetAlias.row__id.rowId"),
            lit(w).as("currentTransaction"),
            lit(null).cast(rowType).as("row"))
      }
      val insertEvents = notMatched.map { ins =>
        require(ins.values.size == dataCols.length,
          s"MERGE INSERT VALUES arity ${ins.values.size} != " +
            s"${dataCols.length} columns of $path")
        val unmatchedSrc = s.join(t, expr(on), "left_anti")
          .filter(ins.cond.map(expr).getOrElse(lit(true)))
        asInsertEvents(unmatchedSrc.select(
          ins.values.zip(dataCols).map { case (v, c) =>
            expr(v).cast(cur.schema(c).dataType).as(c)
          }: _*), w)
      }
      val events = (matchedEvents ++ insertEvents).reduce(_ unionByName _)
      writeDir(events, path, deltaName(w, w))
      w
    } finally { joined.unpersist(); () }
  }

  // ---- streaming ingest (HiveEndPoint/TransactionBatch semantics) ----

  private val BatchMarker = "_batch_"

  /** Highest streaming batch id committed into this table: markers ride
    * inside the atomically-renamed dirs, so a batch is recorded iff its
    * delta is visible. Compaction carries the max marker forward into
    * the dir it writes (see below) — cleaning originals must not forget
    * history, or a replay after compaction would double-insert. */
  private[graft] def lastCommittedBatch(path: String): Long = {
    val children = Option(new File(path).listFiles()).getOrElse(Array.empty)
      .filter(visible)
    val ids = for {
      dir <- children
      f <- Option(dir.listFiles()).getOrElse(Array.empty)
      if f.getName.startsWith(BatchMarker)
    } yield f.getName.stripPrefix(BatchMarker).toLong
    if (ids.isEmpty) -1L else ids.max
  }

  /** One micro-batch = one insert transaction (the reference's streaming
    * `TransactionBatch.commit`, `hcatalog/streaming/HiveEndPoint.java`):
    * replayed batches (id at or below the committed watermark) are
    * skipped, so foreachBatch redelivery after a crash is exactly-once.
    * Returns the write id, or None for a skipped replay. */
  def streamingInsertTxn(spark: SparkSession, path: String, df: DataFrame,
      batchId: Long): Option[Long] =
    if (batchId <= lastCommittedBatch(path)) None
    else {
      val w = nextWriteId(path)
      writeDir(asInsertEvents(df, w), path, deltaName(w, w),
        marker = Some(s"$BatchMarker$batchId"))
      Some(w)
    }

  /** Continuous transactional ingest: each micro-batch commits as one
    * delta. Pair with `maybeCompact` on a maintenance cadence. */
  def startStreamingInsert(stream: DataFrame, path: String,
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        streamingInsertTxn(batch.sparkSession, path, batch, batchId)
        ()
      }
      .start()

  /** MINOR compaction (`Worker.java` CompactionType.MINOR): merge the
    * active deltas into one `delta_min_max`, events untouched. The
    * originals stay until `clean` — readers that listed them keep a
    * consistent view, and `state`'s widest-first selection already
    * ignores them for new readers. */
  def compactMinor(spark: SparkSession, path: String): Unit = {
    val s = state(path)
    if (s.deltas.size > 1) {
      val merged = s.deltas.map(d => spark.read.parquet(d.dir.toString))
        .reduce(_ unionByName _)
      writeDir(merged, path,
        deltaName(s.deltas.map(_.min).min, s.deltas.map(_.max).max),
        marker = maxMarker(s.deltas.map(_.dir)))
    }
  }

  /** Streaming batch watermark carried into a compacted dir: forgetting
    * it when the Cleaner drops the originals would let a post-compaction
    * replay double-insert an already-committed batch. */
  private def maxMarker(dirs: Seq[File]): Option[String] = {
    val ids = for {
      dir <- dirs
      f <- Option(dir.listFiles()).getOrElse(Array.empty)
      if f.getName.startsWith(BatchMarker)
    } yield f.getName.stripPrefix(BatchMarker).toLong
    if (ids.isEmpty) None else Some(s"$BatchMarker${ids.max}")
  }

  /** MAJOR compaction: resolve base+deltas into a new `base_w` of plain
    * rows that KEEP their original ROW__IDs (compaction never renumbers a
    * live row — later deltas still reference it). */
  def compactMajor(spark: SparkSession, path: String): Unit = {
    val s = state(path)
    val w = (s.base.map(_._1).getOrElse(0L) +: s.deltas.map(_.max)).max
    if (w > 0L) {
      val resolved = snapshotWithRowId(spark, path).select(
        col("row__id.originalTransaction"),
        col("row__id.bucket"),
        col("row__id.rowId"),
        col("*")).drop("row__id")
      writeDir(resolved, path, baseName(w),
        marker = maxMarker(s.base.map(_._2).toSeq ++ s.deltas.map(_.dir)))
    }
  }

  /** `Initiator.java` heuristic: enough deltas piled up → compact; MAJOR
    * when delta bytes outweigh `ratio` of the base (or there is no base),
    * MINOR otherwise. Returns what it did. */
  def maybeCompact(spark: SparkSession, path: String,
      minDeltas: Int = 10, ratio: Double = 0.1): String = {
    val s = state(path)
    if (s.deltas.size < minDeltas) "none"
    else {
      def bytes(f: File): Long =
        Option(f.listFiles()).getOrElse(Array.empty).map(_.length()).sum
      val deltaBytes = s.deltas.map(d => bytes(d.dir)).sum.toDouble
      val baseBytes = s.base.map(b => bytes(b._2)).getOrElse(0L).toDouble
      if (baseBytes == 0d || deltaBytes / baseBytes > ratio) {
        compactMajor(spark, path); "major"
      } else { compactMinor(spark, path); "minor" }
    }
  }

  /** `Cleaner.java`: drop directories a new reader can no longer select —
    * bases below the best base, deltas at or below it, and deltas strictly
    * inside a selected (compacted) delta. Run only when in-flight readers
    * of the old census are done; that handoff is the reference Cleaner's
    * job too (it waits out open transactions). */
  def clean(path: String): Unit = {
    val s = state(path)
    val keep = (s.base.map(_._2) ++ s.deltas.map(_.dir)).map(_.getName).toSet
    Option(new File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => visible(f) &&
        (f.getName.startsWith("base_") || f.getName.startsWith("delta_")) &&
        !keep(f.getName))
      .foreach { dir =>
        Option(dir.listFiles()).getOrElse(Array.empty).foreach(_.delete())
        dir.delete()
      }
  }
}

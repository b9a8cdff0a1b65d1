package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with a typed metadata struct. The Spark side — schema,
  * partition-parallel batch processing, sizing stats — is real; the
  * codec itself is STUBBED with a deterministic fake (this container has
  * no image/audio libraries), clearly marked below. At deployment the
  * stub body is replaced by a real decoder; every shape around it stays.
  */
object Multimodal {

  /** Typed metadata carried next to the binary payload. */
  final case class MediaMeta(
      kind: String,        // "image" | "audio" | "video"
      mimeType: String,
      width: Int, height: Int,
      durationMs: Long)

  final case class MediaRow(id: Long, content: Array[Byte], meta: MediaMeta)

  /** Wrap a (id, binary) DataFrame into the canonical media schema with
    * metadata extracted by the (stub) decoder — pure column expressions,
    * one pass, no shuffle. */
  def withDecodedMeta(df: DataFrame, idCol: String, binCol: String,
      kind: String): DataFrame = {
    // ---- STUB decode ----------------------------------------------------
    // A real build decodes headers (e.g. PNG IHDR / WAV fmt chunk). The
    // deterministic fake derives plausible dimensions from a content hash
    // so downstream partitioning/grouping logic is exercised honestly.
    val h = xxhash64(col(binCol))
    val width = (pmod(h, lit(1920L)) + 32).cast("int")
    val height = (pmod(xxhash64(col(binCol), lit(1)), lit(1080L)) + 32).cast("int")
    val durationMs = when(lit(kind) === "image", lit(0L))
      .otherwise(pmod(h, lit(600000L)))
    // ---- END STUB -------------------------------------------------------
    df.select(
      col(idCol).cast("long").as("id"),
      col(binCol).as("content"),
      struct(
        lit(kind).as("kind"),
        lit(s"application/x-$kind").as("mimeType"),
        width.as("width"), height.as("height"),
        durationMs.as("durationMs")).as("meta"),
      length(col(binCol)).as("n_bytes"),
      sha2(col(binCol), 256).as("content_sha256"))
  }

  /** Batch feature extraction over media rows via mapPartitions — the
    * shape a real decoder plugs into (per-partition init of the codec,
    * row-batched processing, typed output). The feature vector here is a
    * deterministic stub (byte histogram head). */
  def extractFeatures(ds: Dataset[MediaRow], dim: Int = 16): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // real impl: initialize codec/model once per partition here
      rows.map { r =>
        val hist = new Array[Float](dim)
        // ---- STUB featurize: byte-value histogram over the payload ----
        var i = 0
        while (i < r.content.length) {
          hist((r.content(i) & 0xff) % dim) += 1f
          i += 1
        }
        val n = math.max(r.content.length, 1).toFloat
        (r.id, hist.map(_ / n), r.meta.kind)
        // ---- END STUB -------------------------------------------------
      }
    }.toDF("id", "features", "kind")
  }

  /** Partition-parallel "resize": keeps schema + metadata consistent; the
    * pixel work is the stub (identity on bytes, metadata rewritten). */
  def resize(df: DataFrame, w: Int, hgt: Int): DataFrame =
    df.withColumn("meta", struct(
      col("meta.kind"), col("meta.mimeType"),
      lit(w).as("width"), lit(hgt).as("height"),
      col("meta.durationMs")))

  /** Frame sampling for video rows: explode into (id, frame_idx) stubs at
    * a fixed rate; real impl replaces the payload with the decoded frame. */
  def sampleFrames(df: DataFrame, everyMs: Long): DataFrame =
    df.filter(col("meta.kind") === "video")
      .select(col("id"), col("meta"),
        explode(sequence(lit(0L), col("meta.durationMs"), lit(everyMs)))
          .as("frame_ms"))
}

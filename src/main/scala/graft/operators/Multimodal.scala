package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with a typed metadata struct. PNG (IHDR), GIF, BMP, WAV
  * (RIFF fmt) headers and JPEG SOF segments are decoded for REAL —
  * pure byte-reading column expressions, fully codegen'd, no library.
  * Formats beyond those fall back to a clearly-marked deterministic
  * stub (this container has no image/audio codec libraries); the Spark
  * side — schema, partition-parallel batch processing, sizing stats —
  * is real either way.
  */
object Multimodal {

  /** Typed metadata carried next to the binary payload. */
  final case class MediaMeta(
      kind: String,        // "image" | "audio" | "video"
      mimeType: String,
      width: Int, height: Int,
      durationMs: Long,
      sampleRateHz: Int, channels: Int)

  final case class MediaRow(id: Long, content: Array[Byte], meta: MediaMeta)

  // ---- real header decoding: byte-level reads as column expressions ----

  /** Big-endian uint32 read at 1-based byte position. */
  private def beUint32(bin: Column, pos: Int): Column =
    conv(hex(substring(bin, pos, 4)), 16, 10).cast("long")
  private def byteAt(bin: Column, pos: Int): Column =
    conv(hex(substring(bin, pos, 1)), 16, 10).cast("long")
  /** Little-endian uint16/uint32 reads at 1-based byte position. */
  private def leUint16(bin: Column, pos: Int): Column =
    byteAt(bin, pos) + byteAt(bin, pos + 1) * 256L
  private def leUint32(bin: Column, pos: Int): Column =
    leUint16(bin, pos) + leUint16(bin, pos + 2) * 65536L

  /** PNG signature (spec §5.2) + IHDR width/height at offsets 16/20. */
  def isPng(bin: Column): Column =
    length(bin) >= 24 && upper(hex(substring(bin, 1, 8))) === "89504E470D0A1A0A"
  def pngWidth(bin: Column): Column = beUint32(bin, 17).cast("int")
  def pngHeight(bin: Column): Column = beUint32(bin, 21).cast("int")

  /** JPEG: dimensions from the SOF marker segment (variable offset —
    * native marker-walk expression graft.functions.JpegDims; null when
    * the payload has no SOF). */
  def jpegDims(bin: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    toCol(graft.functions.JpegDims(toExpr(bin)))
  }

  /** GIF87a/GIF89a: "GIF8" @0, logical-screen width/height LE16 @6/@8. */
  def isGif(bin: Column): Column =
    length(bin) >= 10 && upper(hex(substring(bin, 1, 4))) === "47494638"
  def gifWidth(bin: Column): Column = leUint16(bin, 7).cast("int")
  def gifHeight(bin: Column): Column = leUint16(bin, 9).cast("int")

  /** BMP: "BM" @0, BITMAPINFOHEADER width LE32 @18, height signed LE32
    * @22 (negative = top-down row order, so the magnitude is taken).
    * The DIB header-size field @14 must name an INFO-family header —
    * the 2-byte magic alone would misclassify text starting "BM", and
    * OS/2 BITMAPCOREHEADER (size 12) has 16-bit dims at other offsets. */
  def isBmp(bin: Column): Column =
    length(bin) >= 26 && upper(hex(substring(bin, 1, 2))) === "424D" &&
      leUint32(bin, 15).isin(40L, 52L, 56L, 108L, 124L)
  def bmpWidth(bin: Column): Column = leUint32(bin, 19).cast("int")
  def bmpHeight(bin: Column): Column = {
    val raw = leUint32(bin, 23) // unsigned read of the signed field
    // least() guards abs(Int.MinValue) = 2^31, which a bare int cast
    // would wrap back to negative
    least(abs(when(raw >= 2147483648L, raw - 4294967296L).otherwise(raw)),
      lit(Int.MaxValue.toLong)).cast("int")
  }

  /** RIFF/WAVE header: "RIFF" @0, "WAVE" @8, canonical fmt chunk @12 —
    * channels @22 (LE16), sample rate @24 (LE32), byte rate @28 (LE32). */
  def isWav(bin: Column): Column =
    length(bin) >= 44 &&
      upper(hex(substring(bin, 1, 4))) === "52494646" &&
      upper(hex(substring(bin, 9, 8))) === "57415645666D7420"
  def wavChannels(bin: Column): Column = leUint16(bin, 23).cast("int")
  def wavSampleRate(bin: Column): Column = leUint32(bin, 25).cast("int")
  /** Duration from payload size / byte rate (44-byte canonical header). */
  def wavDurationMs(bin: Column): Column = {
    val byteRate = leUint32(bin, 29)
    when(byteRate > 0,
      ((length(bin).cast("long") - 44L) * 1000L / byteRate).cast("long"))
      .otherwise(lit(0L))
  }

  /** REAL audio content features: PCM16 sample count / peak / sum of
    * squares from the payload bytes (graft.functions.WavPcm16Stats);
    * null for non-WAV or non-PCM16 rows. Derive RMS as
    * sqrt(sum_sq / n_samples) in query space. */
  def wavPcm16Stats(bin: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    toCol(graft.functions.WavPcm16Stats(toExpr(bin)))
  }

  /** Wrap a (id, binary) DataFrame into the canonical media schema.
    * Recognized headers (PNG, GIF, JPEG, BMP, WAV) are decoded for
    * real; anything else gets the stub metadata — one pass of codegen'd
    * expressions, no shuffle either way. */
  def withDecodedMeta(df: DataFrame, idCol: String, binCol: String,
      kind: String): DataFrame = {
    val bin = col(binCol)
    // ---- STUB decode (unrecognized formats only) ------------------------
    // A real build adds more header parsers (JPEG SOF, MP4 mvhd, ...); the
    // deterministic fake derives plausible dimensions from a content hash
    // so downstream partitioning/grouping logic is exercised honestly.
    val h = xxhash64(bin)
    val stubWidth = (pmod(h, lit(1920L)) + 32).cast("int")
    val stubHeight = (pmod(xxhash64(bin, lit(1)), lit(1080L)) + 32).cast("int")
    val stubDuration = when(lit(kind) === "image", lit(0L))
      .otherwise(pmod(h, lit(600000L)))
    val stubMeta = struct(
      lit(kind).as("kind"),
      lit(s"application/x-$kind").as("mimeType"),
      stubWidth.as("width"), stubHeight.as("height"),
      stubDuration.as("durationMs"),
      lit(0).as("sampleRateHz"), lit(0).as("channels"))
    // ---- END STUB -------------------------------------------------------
    val pngMeta = struct(
      lit("image").as("kind"), lit("image/png").as("mimeType"),
      pngWidth(bin).as("width"), pngHeight(bin).as("height"),
      lit(0L).as("durationMs"),
      lit(0).as("sampleRateHz"), lit(0).as("channels"))
    val gifMeta = struct(
      lit("image").as("kind"), lit("image/gif").as("mimeType"),
      gifWidth(bin).as("width"), gifHeight(bin).as("height"),
      lit(0L).as("durationMs"),
      lit(0).as("sampleRateHz"), lit(0).as("channels"))
    val jpeg = jpegDims(bin)
    val jpegMeta = struct(
      lit("image").as("kind"), lit("image/jpeg").as("mimeType"),
      jpeg.getField("width").as("width"), jpeg.getField("height").as("height"),
      lit(0L).as("durationMs"),
      lit(0).as("sampleRateHz"), lit(0).as("channels"))
    val bmpMeta = struct(
      lit("image").as("kind"), lit("image/bmp").as("mimeType"),
      bmpWidth(bin).as("width"), bmpHeight(bin).as("height"),
      lit(0L).as("durationMs"),
      lit(0).as("sampleRateHz"), lit(0).as("channels"))
    val wavMeta = struct(
      lit("audio").as("kind"), lit("audio/wav").as("mimeType"),
      lit(0).as("width"), lit(0).as("height"),
      wavDurationMs(bin).as("durationMs"),
      wavSampleRate(bin).as("sampleRateHz"), wavChannels(bin).as("channels"))
    df.select(
      col(idCol).cast("long").as("id"),
      bin.as("content"),
      when(isPng(bin), pngMeta)
        .when(isGif(bin), gifMeta)
        .when(jpeg.isNotNull, jpegMeta)
        .when(isBmp(bin), bmpMeta)
        .when(isWav(bin), wavMeta)
        .otherwise(stubMeta).as("meta"),
      length(bin).as("n_bytes"),
      sha2(bin, 256).as("content_sha256"))
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
      col("meta.durationMs"),
      col("meta.sampleRateHz"), col("meta.channels")))

  /** Frame sampling for video rows: explode into (id, frame_idx) stubs at
    * a fixed rate; real impl replaces the payload with the decoded frame. */
  def sampleFrames(df: DataFrame, everyMs: Long): DataFrame =
    df.filter(col("meta.kind") === "video")
      .select(col("id"), col("meta"),
        explode(sequence(lit(0L), col("meta.durationMs"), lit(everyMs)))
          .as("frame_ms"))
}

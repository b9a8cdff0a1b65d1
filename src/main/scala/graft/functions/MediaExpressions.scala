package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** jpeg_dims(binary) → struct<width:int, height:int> | null.
  *
  * JPEG dimensions live in a SOF segment at a variable offset, so unlike
  * PNG/GIF/WAV they cannot be read with fixed-position column
  * expressions — this walks the marker chain (SOI, then FF-prefixed
  * segments with big-endian lengths) until a baseline/extended/
  * progressive SOF (C0/C1/C2) and reads height@+5, width@+7. Returns
  * null for non-JPEG or truncated payloads. One bounded pass over the
  * header bytes; entropy-coded data is never touched.
  *
  * Codegen: participates in whole-stage codegen by emitting a call to
  * the compiled static walker (the `StaticInvoke` pattern) — no
  * CodegenFallback node, so surrounding expressions stay fused in one
  * generated function and the per-row boxing of the interpreted path is
  * gone. */
case class JpegDims(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    JpegDims.evalBytes(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val row = ctx.freshName("jpegDims")
      s"""
      org.apache.spark.sql.catalyst.InternalRow $row = graft.functions.JpegDims.evalBytes($c);
      if ($row == null) { ${ev.isNull} = true; } else { ${ev.value} = $row; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JpegDims {
  /** Static marker-walk shared by the interpreted and generated paths. */
  def evalBytes(b: Array[Byte]): InternalRow = {
    @inline def u(i: Int): Int = b(i) & 0xff
    if (b.length < 4 || u(0) != 0xff || u(1) != 0xd8) return null
    var i = 2
    while (i + 3 < b.length) {
      if (u(i) != 0xff) return null
      val marker = u(i + 1)
      if (marker == 0xff) { i += 1 } // fill byte
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) {
        i += 2 // standalone marker, no length
      } else {
        val segLen = (u(i + 2) << 8) | u(i + 3)
        if (segLen < 2) return null
        if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
          if (i + 8 >= b.length) return null
          val height = (u(i + 5) << 8) | u(i + 6)
          val width = (u(i + 7) << 8) | u(i + 8)
          return new GenericInternalRow(Array[Any](width, height))
        }
        i += 2 + segLen
      }
    }
    null
  }
}

/** wav_pcm16_stats(binary) → struct<n_samples:int, peak:int, sum_sq:bigint>
  * | null — REAL audio content decode: walks the RIFF chunk chain to the
  * fmt and data chunks (LIST/INFO/fact chunks and extended fmt sizes are
  * routine in real recorder output, so nothing sits at a fixed offset),
  * then folds count, peak |amplitude| and the sum of squared samples
  * over EXACTLY the data chunk's PCM16LE words (integer math only, so
  * the result is bit-deterministic under any partitioning; derive
  * RMS/dBFS from sum_sq in query space). Null for non-WAV payloads and
  * non-PCM16 encodings (audioFormat != 1 or bitsPerSample != 16). One
  * bounded pass over the payload bytes, no library, no copy.
  *
  * Codegen: static-call emission like `JpegDims` — the sample fold runs
  * as compiled JVM code inside the whole-stage-generated function, which
  * matters on a media scan where this loop touches every payload byte. */
case class WavPcm16Stats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_samples", IntegerType, nullable = false),
    StructField("peak", IntegerType, nullable = false),
    StructField("sum_sq", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    WavPcm16Stats.evalBytes(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val row = ctx.freshName("pcmStats")
      s"""
      org.apache.spark.sql.catalyst.InternalRow $row = graft.functions.WavPcm16Stats.evalBytes($c);
      if ($row == null) { ${ev.isNull} = true; } else { ${ev.value} = $row; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WavPcm16Stats {
  /** Static RIFF walk + PCM16 fold shared by both execution paths. */
  def evalBytes(b: Array[Byte]): InternalRow = {
    @inline def u(i: Int): Int = b(i) & 0xff
    @inline def le16(i: Int): Int = u(i) | (u(i + 1) << 8)
    @inline def le32(i: Int): Long =
      le16(i).toLong | (le16(i + 2).toLong << 16)
    @inline def id4(i: Int, s: String): Boolean =
      u(i) == s.charAt(0) && u(i + 1) == s.charAt(1) &&
        u(i + 2) == s.charAt(2) && u(i + 3) == s.charAt(3)
    if (b.length < 44) return null
    if (!(id4(0, "RIFF") && id4(8, "WAVE"))) return null
    // walk the chunk chain: real files carry LIST/INFO/fact chunks and
    // extended fmt sizes, so nothing sits at a fixed offset past byte 12.
    // Decoding to EOF without honoring the data-chunk size would fold
    // trailing metadata bytes into the "samples".
    var pos = 12
    var fmtPos = -1
    var dataPos = -1
    var dataLen = 0L
    while (pos + 8 <= b.length && (fmtPos < 0 || dataPos < 0)) {
      val size = le32(pos + 4)
      if (id4(pos, "fmt ")) fmtPos = pos + 8
      else if (id4(pos, "data")) { dataPos = pos + 8; dataLen = size }
      // chunks are word-aligned: odd sizes carry a pad byte
      val step = 8L + size + (size & 1L)
      if (step <= 0 || pos + step > Int.MaxValue) pos = b.length
      else pos += step.toInt
    }
    if (fmtPos < 0 || dataPos < 0 || fmtPos + 16 > b.length) return null
    if (le16(fmtPos) != 1 || le16(fmtPos + 14) != 16) return null // PCM16 only
    val end = math.min(b.length.toLong, dataPos + dataLen).toInt
    var i = dataPos
    var n = 0
    var peak = 0
    var sumSq = 0L
    while (i + 1 < end) {
      val s = (b(i + 1) << 8) | u(i) // sign carried by the high byte
      val a = math.abs(s)
      if (a > peak) peak = a
      sumSq += s.toLong * s
      n += 1
      i += 2
    }
    new GenericInternalRow(Array[Any](n, peak, sumSq))
  }
}

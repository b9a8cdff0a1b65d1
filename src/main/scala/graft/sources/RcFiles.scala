package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Clean-room RCFile reader — the reference's legacy Record Columnar
  * File layout (`STORED AS RCFILE`), implemented from the normative
  * pseudo-BNF in ql/io/RCFile.java's class javadoc: `RCF1` magic,
  * boolean compression flag + codec class name, Text-pair metadata
  * carrying `hive.io.rcfile.column.number`, a 16-byte sync hash, then
  * row groups of (record-length, key-length, compressed-key-length)
  * ints, a key section holding the VInt row count plus per-column
  * (on-disk length, uncompressed length, key-buffer length) and the
  * run-length-encoded per-field byte lengths, followed by one value
  * buffer per column. A `-1` record length marks an interleaved sync
  * marker. Column bytes are LazySimpleSerDe text fields (`\N` nulls),
  * exactly like the SequenceFile rows next door.
  *
  * Supported codecs: none (plain), DefaultCodec/DeflateCodec (zlib) and
  * GzipCodec via `java.util.zip` — each column buffer is independently
  * compressed, the key section as one unit (detected by compressed-key
  * length ≠ key length, which also covers writers that never compress
  * keys). Files are parsed whole per task (one task per file — RCFile
  * row groups are ~4 MB, and the migration corpus this reader exists
  * for is legacy warehouse files, not new 100 TB layouts; new data
  * belongs in parquet/ORC).
  */
object RcFiles {

  val NullSequence = "\\N"

  /** Read RCFile(s) at `path` into the given schema: column i of the
    * file binds to schema field i, text fields cast to the field type. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val n = schema.size
    val rows = spark.sparkContext.binaryFiles(path)
      .flatMap { case (_, stream) => parse(stream.toArray(), n) }
      .map(cells => Row.fromSeq(cells.toSeq))
    val asStrings = spark.createDataFrame(rows,
      StructType(schema.fieldNames.map(f =>
        StructField(f, StringType, nullable = true))))
    asStrings.select(schema.fields.map(f =>
      col(f.name).cast(f.dataType).as(f.name)): _*)
  }

  // ---- Hadoop writable primitives (WritableUtils VInt encoding) ----

  private def vIntSize(first: Byte): Int =
    if (first >= -112) 1
    else if (first < -120) -119 - first
    else -111 - first

  private def vIntNegative(first: Byte): Boolean =
    first < -120 || (first >= -112 && first < 0)

  private[sources] def readVLong(in: java.io.DataInput): Long = {
    val first = in.readByte()
    val len = vIntSize(first)
    if (len == 1) return first.toLong
    var x = 0L
    var i = 0
    while (i < len - 1) {
      x = (x << 8) | (in.readByte() & 0xffL)
      i += 1
    }
    if (vIntNegative(first)) ~x else x
  }

  private[sources] def readVInt(in: java.io.DataInput): Int =
    readVLong(in).toInt

  private def readText(in: java.io.DataInput): String = {
    val len = readVInt(in)
    val b = new Array[Byte](len)
    in.readFully(b)
    new String(b, java.nio.charset.StandardCharsets.UTF_8)
  }

  // ---- codec dispatch (JDK zlib/gzip; no Hadoop codec classes) ----

  private def inflate(bytes: Array[Byte], outLen: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(bytes)
      val out = new Array[Byte](outLen)
      var off = 0
      while (off < outLen && !inf.finished()) {
        val k = inf.inflate(out, off, outLen - off)
        if (k == 0 && inf.needsInput()) sys.error("truncated zlib buffer")
        off += k
      }
      out
    } finally inf.end()
  }

  private def gunzip(bytes: Array[Byte], outLen: Int): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val out = new Array[Byte](outLen)
      var off = 0
      while (off < outLen) {
        val k = in.read(out, off, outLen - off)
        if (k < 0) sys.error("truncated gzip buffer")
        off += k
      }
      out
    } finally in.close()
  }

  private def decompressor(
      codecClass: String): (Array[Byte], Int) => Array[Byte] =
    codecClass match {
      case c if c.endsWith("DefaultCodec") || c.endsWith("DeflateCodec") =>
        inflate
      case c if c.endsWith("GzipCodec") => gunzip
      case other => sys.error(
        s"unsupported RCFile compression codec: $other " +
          "(plain, DefaultCodec/DeflateCodec, GzipCodec are readable)")
    }

  // ---- the format walk ----

  private[sources] def parse(
      bytes: Array[Byte], nCols: Int): Iterator[Array[String]] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val magic = new Array[Byte](4)
    in.readFully(magic)
    // file-version-header ::= {'S','E','Q',6} | {'R','C','F',1}
    // (ql/io/RCFile.java BNF: the original release reused the
    // SequenceFile header — key/value class names and a
    // block-compressed flag precede the common fields in that form)
    val seq6 = magic(0) == 'S' && magic(1) == 'E' && magic(2) == 'Q' &&
      magic(3) == 6
    require(seq6 || magic.sameElements(Array[Byte]('R', 'C', 'F', 1)),
      "not an RCFile: bad magic")
    if (seq6) {
      val keyClass = readText(in)
      val valueClass = readText(in)
      require(keyClass.endsWith("RCFile$KeyBuffer") &&
        valueClass.endsWith("RCFile$ValueBuffer"),
        s"SEQ6 header is a SequenceFile, not an RCFile " +
          s"($keyClass/$valueClass)")
    }
    val compressed = in.readBoolean()
    if (seq6) {
      val blockCompressed = in.readBoolean()
      require(!blockCompressed,
        "RCFile file-is-block-compressed must be false")
    }
    val decomp =
      if (compressed) decompressor(readText(in)) else null
    val nMeta = in.readInt()
    var fileCols = -1
    var m = 0
    while (m < nMeta) {
      val k = readText(in)
      val v = readText(in)
      if (k == "hive.io.rcfile.column.number") fileCols = v.toInt
      m += 1
    }
    require(fileCols >= 0, "RCFile metadata lacks the mandatory " +
      "hive.io.rcfile.column.number entry")
    // fileCols < nCols is legal: Hive's ColumnarSerDe reads missing
    // trailing columns as NULL (smb_mapjoin_10.q loads 2-column
    // smbbucket_*.rc files into a 4-column table); the cells arrays
    // are nCols wide and unfilled slots stay null.
    in.skipBytes(16) // file sync hash

    val out = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
    while (in.available() >= 4) {
      var recordLen = in.readInt()
      if (recordLen == -1) { // interleaved sync marker
        in.skipBytes(16)
        if (in.available() < 4) recordLen = Int.MinValue
        else recordLen = in.readInt()
      }
      if (recordLen != Int.MinValue) {
        val keyLen = in.readInt()
        val compKeyLen = in.readInt()
        val keyBytes = new Array[Byte](compKeyLen)
        in.readFully(keyBytes)
        val key = new java.io.DataInputStream(new java.io.ByteArrayInputStream(
          if (compressed && compKeyLen != keyLen) decomp(keyBytes, keyLen)
          else keyBytes))
        val numRows = readVInt(key)
        val diskLens = new Array[Int](fileCols)
        val plainLens = new Array[Int](fileCols)
        val fieldLens = new Array[Array[Int]](fileCols)
        var c = 0
        while (c < fileCols) {
          diskLens(c) = readVInt(key)
          plainLens(c) = readVInt(key)
          val keyBufLen = readVInt(key)
          val kb = new Array[Byte](keyBufLen)
          key.readFully(kb)
          // run-length decode: v ≥ 0 is a field length; v < 0 says the
          // previous length repeats ~v more times (1,1,1,2 ⇒ 1,~2,2)
          val kin = new java.io.DataInputStream(
            new java.io.ByteArrayInputStream(kb))
          val lens = new Array[Int](numRows)
          var r = 0
          var last = 0
          while (r < numRows) {
            val v = readVInt(kin)
            if (v >= 0) { last = v; lens(r) = v; r += 1 }
            else {
              var reps = ~v
              while (reps > 0 && r < numRows) {
                lens(r) = last; r += 1; reps -= 1
              }
            }
          }
          fieldLens(c) = lens
          c += 1
        }
        // value part: one buffer per column, sliced by the key's lengths
        val cells = Array.fill(numRows)(new Array[String](nCols))
        c = 0
        while (c < fileCols) {
          val raw = new Array[Byte](diskLens(c))
          in.readFully(raw)
          if (c < nCols) { // requested columns only; extras are skipped
            val plain =
              if (compressed) decomp(raw, plainLens(c)) else raw
            var off = 0
            var r = 0
            while (r < numRows) {
              val s = new String(plain, off, fieldLens(c)(r),
                java.nio.charset.StandardCharsets.UTF_8)
              cells(r)(c) = if (s == NullSequence) null else s
              off += fieldLens(c)(r)
              r += 1
            }
          }
          c += 1
        }
        out ++= cells
      }
    }
    out.iterator
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Bloom filter — the compact set-membership sketch a
  * 100 TB decontamination / blocklist pass needs when the reference set
  * is large enough that broadcasting the raw values (GBs as a hash
  * set) is off the table but a few MB of bits is not. Same
  * extensibility contract as the bitmap family (ref:
  * ql/udf/generic/GenericUDAFEWAHBitmap.java exercises Hive's
  * init/iterate/merge/terminate UDAF surface; the Bloom composition
  * itself is an LLM-pipeline extension beyond the reference):
  * `bloom_build` is a TypedImperativeAggregate whose buffer is the bit
  * array itself (merge = word-wise OR, fully partial-aggregatable), and
  * `bloom_contains` / `bloom_or` are scalar codegen'd expressions over
  * the serialized filter.
  *
  * Hashing: standard double hashing (Kirsch–Mitzenmacher) —
  * index_i = (h1 + i*h2) mod m with two independent xxhash64 seeds, so
  * k probes cost two hash evaluations. Integral inputs normalize to
  * long before hashing and strings hash their UTF-8 bytes, so build
  * and probe agree across input widths (int vs bigint).
  *
  * Serialized layout (little-endian, used for BOTH the partial buffer
  * and the final BinaryType value): magic 'F', version 1, k int32,
  * numWords int32, then numWords × int64 bit words. Probing reads the
  * serialized bytes directly (no deserialization allocation per row).
  *
  * No false negatives by construction; false-positive rate is set by
  * sizing — `BloomFunctions.optimalParams(n, fpp)` gives the textbook
  * m = -n·ln(fpp)/ln(2)², k = (m/n)·ln(2).
  */
private[graft] final class GraftBloom(val numWords: Int, val k: Int) {
  require(numWords > 0, s"bloom numBits must be positive")
  require(k > 0 && k <= 64, s"bloom numHashes must be in [1, 64], got $k")
  val words = new Array[Long](numWords)

  private def m: Long = numWords.toLong * 64L

  def set(h1: Long, h2: Long): Unit = {
    var i = 0
    while (i < k) {
      val idx = ((h1 + i.toLong * h2) & Long.MaxValue) % m
      words((idx >>> 6).toInt) |= (1L << (idx & 63L))
      i += 1
    }
  }

  def or(other: GraftBloom): Unit = {
    require(other.numWords == numWords && other.k == k,
      s"cannot merge bloom filters of different shape: " +
        s"($numWords words, $k hashes) vs " +
        s"(${other.numWords} words, ${other.k} hashes)")
    var i = 0
    while (i < numWords) { words(i) |= other.words(i); i += 1 }
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(10 + 8 * numWords)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(GraftBloom.Magic).put(GraftBloom.Version)
    bb.putInt(k).putInt(numWords)
    var i = 0
    while (i < numWords) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }
}

private[graft] object GraftBloom {
  val Magic: Byte = 'F'
  val Version: Byte = 1

  def valueOf(bytes: Array[Byte]): GraftBloom = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bb.get() == Magic && bb.get() == Version,
      "not a graft bloom filter")
    val k = bb.getInt()
    val numWords = bb.getInt()
    val bf = new GraftBloom(numWords, k)
    var i = 0
    while (i < numWords) { bf.words(i) = bb.getLong(); i += 1 }
    bf
  }
}

object BloomFunctions {
  // two fixed seeds make the pair of hashes independent; build and
  // probe must agree, so these are part of the serialized contract
  private val Seed1 = 0x9e3779b97f4a7c15L
  private val Seed2 = 0xc2b2ae3d27d4eb4fL

  /** Textbook sizing: bits m = -n·ln(p)/ln(2)², hashes k = (m/n)·ln(2),
    * returned as (numBits rounded up to a multiple of 64, k). */
  def optimalParams(expectedItems: Long, fpp: Double): (Int, Int) = {
    require(expectedItems > 0, "expectedItems must be positive")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val ln2 = math.log(2.0)
    val mBits = math.ceil(-expectedItems * math.log(fpp) / (ln2 * ln2))
    val words = math.max(1L, math.ceil(mBits / 64.0).toLong)
    require(words <= Int.MaxValue / 8,
      s"bloom filter would exceed 16 GB: $expectedItems items @ $fpp")
    val k = math.max(1, math.round(mBits / expectedItems * ln2).toInt)
    (words.toInt * 64, math.min(64, k))
  }

  def hashUtf8(v: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(v.getBaseObject, v.getBaseOffset, v.numBytes, seed)

  def h1(v: UTF8String): Long = hashUtf8(v, Seed1)
  def h2(v: UTF8String): Long = hashUtf8(v, Seed2)
  def h1(v: Long): Long = XXH64.hashLong(v, Seed1)
  def h2(v: Long): Long = XXH64.hashLong(v, Seed2)

  /** Bit probe straight over the serialized filter bytes — zero
    * allocation per row (the filter is typically a folded literal). */
  private def testBits(f: Array[Byte], hh1: Long, hh2: Long): Boolean = {
    val k = readInt(f, 2)
    val numWords = readInt(f, 6)
    val m = numWords.toLong * 64L
    var i = 0
    while (i < k) {
      val idx = ((hh1 + i.toLong * hh2) & Long.MaxValue) % m
      val word = readLong(f, 10 + 8 * (idx >>> 6).toInt)
      if ((word & (1L << (idx & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  def contains(f: Array[Byte], v: UTF8String): Boolean =
    testBits(f, h1(v), h2(v))
  def contains(f: Array[Byte], v: Long): Boolean =
    testBits(f, h1(v), h2(v))

  def or(l: Array[Byte], r: Array[Byte]): Array[Byte] = {
    val a = GraftBloom.valueOf(l)
    a.or(GraftBloom.valueOf(r))
    a.serialize()
  }

  private def readInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def readLong(b: Array[Byte], off: Int): Long =
    (readInt(b, off) & 0xffffffffL) |
      ((readInt(b, off + 4) & 0xffffffffL) << 32)
}

/** `bloom_build(value, numBits, numHashes)` — aggregate a Bloom filter
  * over string or integral values; NULLs are skipped. The buffer IS the
  * bit array, so partial aggregation and merge are word-wise OR —
  * byte-identical output for any partitioning of the input. */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[GraftBloom] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType | ByteType | ShortType | IntegerType | LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_build requires a string or integral value, " +
          s"got ${other.catalogString}")
    }
  }
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): GraftBloom =
    new GraftBloom(numBits / 64, numHashes)

  private lazy val isString = child.dataType == StringType

  override def update(buf: GraftBloom, input: InternalRow): GraftBloom = {
    val v = child.eval(input)
    if (v != null) {
      if (isString) {
        val s = v.asInstanceOf[UTF8String]
        buf.set(BloomFunctions.h1(s), BloomFunctions.h2(s))
      } else {
        val l = v.asInstanceOf[Number].longValue()
        buf.set(BloomFunctions.h1(l), BloomFunctions.h2(l))
      }
    }
    buf
  }

  override def merge(buf: GraftBloom, other: GraftBloom): GraftBloom = {
    buf.or(other); buf
  }

  override def eval(buf: GraftBloom): Any = buf.serialize()
  override def serialize(buf: GraftBloom): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): GraftBloom =
    GraftBloom.valueOf(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `bloom_contains(filter, value)` — codegen'd membership probe; value
  * hashing matches `bloom_build` (strings by UTF-8 bytes, integrals
  * normalized to long). */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_contains"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (BinaryType,
          StringType | ByteType | ShortType | IntegerType | LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains requires (binary, string-or-integral), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  }

  private lazy val isString = right.dataType == StringType

  override protected def nullSafeEval(f: Any, v: Any): Any =
    if (isString)
      BloomFunctions.contains(f.asInstanceOf[Array[Byte]],
        v.asInstanceOf[UTF8String])
    else
      BloomFunctions.contains(f.asInstanceOf[Array[Byte]],
        v.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (f, v) =>
      if (isString) s"graft.functions.BloomFunctions.contains($f, $v)"
      else s"graft.functions.BloomFunctions.contains($f, (long) $v)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `bloom_or(a, b)` — union of two same-shape filters (rollup merge). */
case class BloomOr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_or"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    BloomFunctions.or(l.asInstanceOf[Array[Byte]],
      r.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.BloomFunctions.or($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomExpressions {
  private def foldedInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval().asInstanceOf[Number].intValue()
  }

  val registrations: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "bloom_build" -> (args => BloomAgg(args.head,
      foldedInt(args(1), "bloom_build numBits"),
      foldedInt(args(2), "bloom_build numHashes")).toAggregateExpression()),
    "bloom_contains" -> (args => BloomContains(args(0), args(1))),
    "bloom_or" -> (args => BloomOr(args(0), args(1)))
  )
}

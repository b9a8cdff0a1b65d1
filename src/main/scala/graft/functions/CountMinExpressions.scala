package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch — the mergeable frequency estimator that answers
  * "how often does key x occur in 100 TB?" in O(d·w) memory with the
  * classic one-sided guarantee: estimate ≥ true count always, and
  * estimate ≤ true + ε·N with probability 1−δ for w = ⌈e/ε⌉,
  * d = ⌈ln(1/δ)⌉ (Cormode–Muthukrishnan). Completes the mergeable
  * sketch family (HLL / KLL / top-k / SpaceSaving / Bloom): SpaceSaving
  * tracks the top keys only; count-min answers point queries for ANY
  * key after one pass.
  *
  * Same UDAF contract as the bitmap/bloom families (ref:
  * ql/udf/generic/GenericUDAFEWAHBitmap.java for the Hive
  * init/iterate/merge/terminate surface): `cm_build` is a
  * TypedImperativeAggregate whose buffer is the d×w count matrix
  * (merge = element-wise add — counts are exact longs, so the merged
  * sketch is byte-identical for any partitioning), `cm_estimate` /
  * `cm_merge` are scalar expressions over the serialized sketch.
  *
  * Row hashing reuses the Bloom double-hashing contract: row i probes
  * column (h1 + i·h2) mod w, two xxhash64 evaluations total per
  * update regardless of depth. Integral inputs normalize to long,
  * strings hash their UTF-8 bytes (build/probe agree across widths).
  *
  * Serialized layout (little-endian): magic 'C', version 1, d int32,
  * w int32, then d·w int64 counts row-major. Estimates read the bytes
  * directly — no per-row deserialization.
  */
private[graft] final class GraftCountMin(val depth: Int, val width: Int) {
  require(depth > 0 && depth <= 64, s"depth must be in [1,64], got $depth")
  require(width > 0, s"width must be positive, got $width")
  val counts = new Array[Long](depth * width)

  def add(h1: Long, h2: Long, inc: Long): Unit = {
    var i = 0
    while (i < depth) {
      val c = (((h1 + i.toLong * h2) & Long.MaxValue) % width).toInt
      counts(i * width + c) += inc
      i += 1
    }
  }

  def merge(other: GraftCountMin): Unit = {
    require(other.depth == depth && other.width == width,
      s"cannot merge count-min sketches of different shape: " +
        s"(${depth}x$width) vs (${other.depth}x${other.width})")
    var i = 0
    while (i < counts.length) { counts(i) += other.counts(i); i += 1 }
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(10 + 8 * counts.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(GraftCountMin.Magic).put(GraftCountMin.Version)
    bb.putInt(depth).putInt(width)
    var i = 0
    while (i < counts.length) { bb.putLong(counts(i)); i += 1 }
    bb.array()
  }
}

private[graft] object GraftCountMin {
  val Magic: Byte = 'C'
  val Version: Byte = 1

  def valueOf(bytes: Array[Byte]): GraftCountMin = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bb.get() == Magic && bb.get() == Version,
      "not a graft count-min sketch")
    val d = bb.getInt(); val w = bb.getInt()
    val cm = new GraftCountMin(d, w)
    var i = 0
    while (i < cm.counts.length) { cm.counts(i) = bb.getLong(); i += 1 }
    cm
  }
}

object CountMinFunctions {
  /** (width, depth) for the ε/δ guarantee: w = ⌈e/ε⌉, d = ⌈ln(1/δ)⌉. */
  def optimalParams(eps: Double, delta: Double): (Int, Int) = {
    require(eps > 0 && eps < 1, s"eps must be in (0,1), got $eps")
    require(delta > 0 && delta < 1, s"delta must be in (0,1), got $delta")
    (math.ceil(math.E / eps).toInt,
      math.max(1, math.ceil(math.log(1.0 / delta)).toInt))
  }

  private def est(f: Array[Byte], h1: Long, h2: Long): Long = {
    val d = readInt(f, 2)
    val w = readInt(f, 6)
    var min = Long.MaxValue
    var i = 0
    while (i < d) {
      val c = (((h1 + i.toLong * h2) & Long.MaxValue) % w).toInt
      val v = readLong(f, 10 + 8 * (i * w + c))
      if (v < min) min = v
      i += 1
    }
    min
  }

  def estimate(f: Array[Byte], v: UTF8String): Long =
    est(f, BloomFunctions.h1(v), BloomFunctions.h2(v))
  def estimate(f: Array[Byte], v: Long): Long =
    est(f, BloomFunctions.h1(v), BloomFunctions.h2(v))

  def merge(l: Array[Byte], r: Array[Byte]): Array[Byte] = {
    val a = GraftCountMin.valueOf(l)
    a.merge(GraftCountMin.valueOf(r))
    a.serialize()
  }

  private def readInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def readLong(b: Array[Byte], off: Int): Long =
    (readInt(b, off) & 0xffffffffL) |
      ((readInt(b, off + 4) & 0xffffffffL) << 32)
}

/** `cm_build(value, width, depth)` — aggregate a count-min sketch over
  * string or integral values; NULLs are skipped. Counts are exact
  * longs, so partial aggregation and merge (element-wise add) give
  * byte-identical output for any partitioning of the input. */
case class CountMinAgg(
    child: Expression,
    width: Int,
    depth: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[GraftCountMin] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType | ByteType | ShortType | IntegerType | LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cm_build requires a string or integral value, " +
          s"got ${other.catalogString}")
    }
  }
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): GraftCountMin =
    new GraftCountMin(depth, width)

  private lazy val isString = child.dataType == StringType

  override def update(buf: GraftCountMin, input: InternalRow)
      : GraftCountMin = {
    val v = child.eval(input)
    if (v != null) {
      if (isString) {
        val s = v.asInstanceOf[UTF8String]
        buf.add(BloomFunctions.h1(s), BloomFunctions.h2(s), 1L)
      } else {
        val l = v.asInstanceOf[Number].longValue()
        buf.add(BloomFunctions.h1(l), BloomFunctions.h2(l), 1L)
      }
    }
    buf
  }

  override def merge(buf: GraftCountMin, other: GraftCountMin)
      : GraftCountMin = {
    buf.merge(other); buf
  }

  override def eval(buf: GraftCountMin): Any = buf.serialize()
  override def serialize(buf: GraftCountMin): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): GraftCountMin =
    GraftCountMin.valueOf(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `cm_estimate(sketch, value)` — point frequency estimate (min over
  * the depth rows); ≥ the true count, always. */
case class CountMinEstimate(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cm_estimate"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (BinaryType,
          StringType | ByteType | ShortType | IntegerType | LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cm_estimate requires (binary, string-or-integral), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  }

  private lazy val isString = right.dataType == StringType

  override protected def nullSafeEval(f: Any, v: Any): Any =
    if (isString)
      CountMinFunctions.estimate(f.asInstanceOf[Array[Byte]],
        v.asInstanceOf[UTF8String])
    else
      CountMinFunctions.estimate(f.asInstanceOf[Array[Byte]],
        v.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (f, v) =>
      if (isString) s"graft.functions.CountMinFunctions.estimate($f, $v)"
      else s"graft.functions.CountMinFunctions.estimate($f, (long) $v)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `cm_merge(a, b)` — element-wise sum of two same-shape sketches. */
case class CountMinMerge(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cm_merge"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    CountMinFunctions.merge(l.asInstanceOf[Array[Byte]],
      r.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CountMinFunctions.merge($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CountMinExpressions {
  private def foldedInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval().asInstanceOf[Number].intValue()
  }

  val registrations: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cm_build" -> (args => CountMinAgg(args.head,
      foldedInt(args(1), "cm_build width"),
      foldedInt(args(2), "cm_build depth")).toAggregateExpression()),
    "cm_estimate" -> (args => CountMinEstimate(args(0), args(1))),
    "cm_merge" -> (args => CountMinMerge(args(0), args(1)))
  )
}

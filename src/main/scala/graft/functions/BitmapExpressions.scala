package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Compressed distinct-membership bitmap: the container design the
  * reference's EWAH run-length compression exists for
  * (ql/udf/generic/GenericUDAFEWAHBitmap.java uses RLE words; this uses
  * roaring-style chunks — both make buffer size track CARDINALITY, not
  * key range). The key space [0, Int.MaxValue] is split into 2^16-key
  * chunks addressed by the high 15 bits; each present chunk is either a
  * sorted uint16 array (≤ 4096 entries ⇒ ≤ 8 KB) or a dense 1024-word
  * bitmap (8 KB), whichever is smaller — so a group holding keys
  * {0, 10^9} costs tens of bytes where a word-aligned
  * `java.util.BitSet` would allocate max_key/8 ≈ 128 MB.
  *
  * Serialized layout (little-endian, self-describing, used for BOTH the
  * partial-aggregation buffer and the final BinaryType value):
  * magic 'G', version 1, chunk count, then per chunk:
  * (chunkId int32, type byte 0=array|1=bitmap, n int32, payload).
  */
private[graft] final class GraftBitmap {
  import GraftBitmap._

  // high-bits chunk id -> container; TreeMap keeps serialization canonical
  private[functions] val chunks =
    new java.util.TreeMap[Integer, Container]()

  def set(key: Int): Unit = {
    require(key >= 0, s"bitmap keys must be non-negative, got $key")
    val cid = key >>> 16
    val low = key & 0xffff
    chunks.get(cid) match {
      case null =>
        val arr = new ArrayContainer()
        arr.add(low)
        chunks.put(cid, arr)
      case a: ArrayContainer =>
        if (a.add(low) && a.n > ArrayContainer.MaxSize)
          chunks.put(cid, a.toBitmap)
      case b: BitmapContainer => b.add(low)
    }
  }

  def or(other: GraftBitmap): Unit = {
    val it = other.chunks.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      chunks.get(e.getKey) match {
        case null => chunks.put(e.getKey, e.getValue.copy())
        case mine => chunks.put(e.getKey, Container.or(mine, e.getValue))
      }
    }
  }

  def and(other: GraftBitmap): Unit = {
    val it = chunks.entrySet().iterator()
    val dead = new java.util.ArrayList[Integer]()
    val updates = new java.util.HashMap[Integer, Container]()
    while (it.hasNext) {
      val e = it.next()
      other.chunks.get(e.getKey) match {
        case null => dead.add(e.getKey)
        case theirs =>
          val merged = Container.and(e.getValue, theirs)
          if (merged.cardinality == 0) dead.add(e.getKey)
          else updates.put(e.getKey, merged)
      }
    }
    dead.forEach(k => chunks.remove(k))
    updates.forEach((k, v) => chunks.put(k, v))
  }

  def cardinality: Long = {
    var n = 0L
    val it = chunks.values().iterator()
    while (it.hasNext) n += it.next().cardinality
    n
  }

  def isEmpty: Boolean = cardinality == 0L

  def serialize(): Array[Byte] = {
    var size = 6 // magic + version + chunk count
    val it0 = chunks.values().iterator()
    while (it0.hasNext) size += 9 + it0.next().payloadBytes
    val bb = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(Magic).put(Version)
    bb.putInt(chunks.size())
    val it = chunks.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putInt(e.getKey)
      e.getValue.writeTo(bb)
    }
    bb.array()
  }
}

private[graft] object GraftBitmap {
  val Magic: Byte = 'G'
  val Version: Byte = 1

  sealed trait Container {
    def cardinality: Int
    def payloadBytes: Int
    def writeTo(bb: java.nio.ByteBuffer): Unit
    def copy(): Container
    def contains(low: Int): Boolean
    def foreachLow(f: Int => Unit): Unit
  }

  object Container {
    def or(a: Container, b: Container): Container = (a, b) match {
      case (x: BitmapContainer, y) =>
        y.foreachLow(x.add); x
      case (x, y: BitmapContainer) =>
        val out = y.copy().asInstanceOf[BitmapContainer]
        x.foreachLow(out.add); out
      case (x: ArrayContainer, y: ArrayContainer) =>
        val out = new ArrayContainer()
        x.foreachLow(out.add); y.foreachLow(out.add)
        if (out.n > ArrayContainer.MaxSize) out.toBitmap else out
    }

    def and(a: Container, b: Container): Container = {
      // walk the smaller side, probe the larger; result ≤ min cardinality
      // ≤ 4096 only if either side is an array — bitmap∩bitmap words
      // first, then shrink to an array when it fits
      (a, b) match {
        case (x: BitmapContainer, y: BitmapContainer) =>
          val out = new BitmapContainer()
          var i = 0
          while (i < 1024) {
            out.words(i) = x.words(i) & y.words(i)
            i += 1
          }
          if (out.cardinality <= ArrayContainer.MaxSize) out.toArray else out
        case (x, y) =>
          val (walk, probe) =
            if (x.cardinality <= y.cardinality) (x, y) else (y, x)
          val out = new ArrayContainer()
          walk.foreachLow(low => if (probe.contains(low)) out.add(low))
          out
      }
    }
  }

  /** Sorted uint16 array, ≤ 4096 entries (beyond that the dense bitmap
    * is smaller: 4096×2 B = 8 KB = 1024 words). */
  final class ArrayContainer extends Container {
    var values = new Array[Char](4)
    var n = 0

    /** true iff newly inserted */
    def add(low: Int): Boolean = {
      val c = low.toChar
      var idx = java.util.Arrays.binarySearch(values, 0, n, c)
      if (idx >= 0) return false
      idx = -idx - 1
      if (n == values.length)
        values = java.util.Arrays.copyOf(values, values.length * 2)
      System.arraycopy(values, idx, values, idx + 1, n - idx)
      values(idx) = c
      n += 1
      true
    }

    def toBitmap: BitmapContainer = {
      val b = new BitmapContainer()
      var i = 0
      while (i < n) { b.add(values(i)); i += 1 }
      b
    }

    override def cardinality: Int = n
    override def payloadBytes: Int = 2 * n
    override def writeTo(bb: java.nio.ByteBuffer): Unit = {
      bb.put(0.toByte).putInt(n)
      var i = 0
      while (i < n) { bb.putChar(values(i)); i += 1 }
    }
    override def copy(): Container = {
      val c = new ArrayContainer()
      c.values = java.util.Arrays.copyOf(values, math.max(n, 4))
      c.n = n
      c
    }
    override def contains(low: Int): Boolean =
      java.util.Arrays.binarySearch(values, 0, n, low.toChar) >= 0
    override def foreachLow(f: Int => Unit): Unit = {
      var i = 0
      while (i < n) { f(values(i)); i += 1 }
    }
  }
  object ArrayContainer { val MaxSize = 4096 }

  /** Dense 2^16-bit bitmap: 1024 words, fixed 8 KB. */
  final class BitmapContainer extends Container {
    val words = new Array[Long](1024)

    def add(low: Int): Unit =
      words(low >>> 6) |= (1L << (low & 63))

    def toArray: ArrayContainer = {
      val a = new ArrayContainer()
      foreachLow(l => a.add(l))
      a
    }

    override def cardinality: Int = {
      var c = 0
      var i = 0
      while (i < 1024) { c += java.lang.Long.bitCount(words(i)); i += 1 }
      c
    }
    override def payloadBytes: Int = 8192
    override def writeTo(bb: java.nio.ByteBuffer): Unit = {
      bb.put(1.toByte).putInt(cardinality)
      var i = 0
      while (i < 1024) { bb.putLong(words(i)); i += 1 }
    }
    override def copy(): Container = {
      val c = new BitmapContainer()
      System.arraycopy(words, 0, c.words, 0, 1024)
      c
    }
    override def contains(low: Int): Boolean =
      (words(low >>> 6) & (1L << (low & 63))) != 0
    override def foreachLow(f: Int => Unit): Unit = {
      var i = 0
      while (i < 1024) {
        var w = words(i)
        while (w != 0) {
          f((i << 6) + java.lang.Long.numberOfTrailingZeros(w))
          w &= w - 1
        }
        i += 1
      }
    }
  }

  def valueOf(bytes: Array[Byte]): GraftBitmap = {
    val bm = new GraftBitmap()
    if (bytes.isEmpty) return bm
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bb.get() == Magic && bb.get() == Version,
      "not a graft bitmap payload")
    val nChunks = bb.getInt
    var c = 0
    while (c < nChunks) {
      val cid = bb.getInt
      val tpe = bb.get()
      val n = bb.getInt
      if (tpe == 0) {
        val a = new ArrayContainer()
        a.values = new Array[Char](math.max(n, 4))
        var i = 0
        while (i < n) { a.values(i) = bb.getChar; i += 1 }
        a.n = n
        bm.chunks.put(cid, a)
      } else {
        val b = new BitmapContainer()
        var i = 0
        while (i < 1024) { b.words(i) = bb.getLong; i += 1 }
        bm.chunks.put(cid, b)
      }
      c += 1
    }
    bm
  }
}

/** Distinct-membership bitmap family — the reference's ewah_bitmap UDAF
  * set (ql/udf/generic/GenericUDAFEWAHBitmap.java and the
  * ewah_bitmap_and/or/empty UDFs ql/udf/UDFEWAHBitmapAnd.java et al.,
  * FunctionRegistry.java ewah_* entries), re-expressed Spark-first:
  * a TypedImperativeAggregate building a compressed `GraftBitmap` over
  * non-negative int keys, and scalar AND/OR/NOT-EMPTY/cardinality ops
  * over the serialized bitmap. Exercises the full UDAF contract the
  * reference demands of extensions: init / iterate / merge / terminate
  * with a serializable intermediate buffer — and like the reference's
  * EWAH encoding, buffer memory scales with cardinality, not key range.
  */
case class BitmapAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[GraftBitmap] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ewah_bitmap requires an integral key, got ${other.catalogString}")
    }
  }
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): GraftBitmap = new GraftBitmap()

  override def update(buf: GraftBitmap, input: InternalRow): GraftBitmap = {
    val v = child.eval(input)
    if (v != null) {
      val l = v.asInstanceOf[Number].longValue()
      require(l >= 0 && l <= Int.MaxValue,
        s"ewah_bitmap requires keys in [0, ${Int.MaxValue}], got $l")
      buf.set(l.toInt)
    }
    buf
  }

  override def merge(buf: GraftBitmap, other: GraftBitmap): GraftBitmap = {
    buf.or(other); buf
  }

  override def eval(buf: GraftBitmap): Any = buf.serialize()

  override def serialize(buf: GraftBitmap): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): GraftBitmap =
    GraftBitmap.valueOf(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

case class BitmapCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    BitmapCount.evalBytes(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BitmapCount.evalBytes($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BitmapCount {
  def evalBytes(b: Array[Byte]): Long = GraftBitmap.valueOf(b).cardinality
}

case class BitmapEmpty(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    BitmapEmpty.evalBytes(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BitmapEmpty.evalBytes($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BitmapEmpty {
  def evalBytes(b: Array[Byte]): Boolean = GraftBitmap.valueOf(b).isEmpty
}

case class BitmapBinaryOp(left: Expression, right: Expression, and: Boolean)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = if (and) "ewah_bitmap_and" else "ewah_bitmap_or"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    BitmapBinaryOp.evalOp(l.asInstanceOf[Array[Byte]],
      r.asInstanceOf[Array[Byte]], and)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.BitmapBinaryOp.evalOp($a, $b, $and)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BitmapBinaryOp {
  def evalOp(l: Array[Byte], r: Array[Byte], and: Boolean): Array[Byte] = {
    val a = GraftBitmap.valueOf(l)
    val b = GraftBitmap.valueOf(r)
    if (and) a.and(b) else a.or(b)
    a.serialize()
  }
}

object BitmapExpressions {
  val registrations: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "ewah_bitmap" -> (args => BitmapAgg(args.head).toAggregateExpression()),
    "bitmap_count" -> (args => BitmapCount(args.head)),
    "ewah_bitmap_empty" -> (args => BitmapEmpty(args.head)),
    "ewah_bitmap_and" -> (args => BitmapBinaryOp(args(0), args(1), and = true)),
    "ewah_bitmap_or" -> (args => BitmapBinaryOp(args(0), args(1), and = false))
  )
}

package graft.functions

import java.util.BitSet

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Distinct-membership bitmap family — the reference's ewah_bitmap UDAF
  * set (ql/udf/generic/GenericUDAFEWAHBitmap.java and the
  * ewah_bitmap_and/or/empty UDFs ql/udf/UDFEWAHBitmapAnd.java et al.,
  * FunctionRegistry.java ewah_* entries), re-expressed Spark-first:
  * a TypedImperativeAggregate building a java.util.BitSet over
  * non-negative int keys (word-aligned bitmap; the reference's EWAH
  * run-length compression is a storage optimization of the same
  * semantics), and scalar AND/OR/NOT-EMPTY/cardinality ops over the
  * serialized bitmap. Exercises the full UDAF contract the reference
  * demands of extensions: init / iterate / merge / terminate with a
  * serializable intermediate buffer.
  */
case class BitmapAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BitSet] {

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

  override def createAggregationBuffer(): BitSet = new BitSet()

  override def update(buf: BitSet, input: InternalRow): BitSet = {
    val v = child.eval(input)
    if (v != null) {
      val l = v.asInstanceOf[Number].longValue()
      require(l >= 0 && l <= Int.MaxValue,
        s"ewah_bitmap requires keys in [0, ${Int.MaxValue}], got $l")
      buf.set(l.toInt)
    }
    buf
  }

  override def merge(buf: BitSet, other: BitSet): BitSet = { buf.or(other); buf }

  override def eval(buf: BitSet): Any = buf.toByteArray

  override def serialize(buf: BitSet): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): BitSet = BitSet.valueOf(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

case class BitmapCount(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    BitSet.valueOf(input.asInstanceOf[Array[Byte]]).cardinality().toLong
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class BitmapEmpty(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    BitSet.valueOf(input.asInstanceOf[Array[Byte]]).isEmpty
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class BitmapBinaryOp(left: Expression, right: Expression, and: Boolean)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = if (and) "ewah_bitmap_and" else "ewah_bitmap_or"
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = BitSet.valueOf(l.asInstanceOf[Array[Byte]])
    val b = BitSet.valueOf(r.asInstanceOf[Array[Byte]])
    if (and) a.and(b) else a.or(b)
    a.toByteArray
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
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

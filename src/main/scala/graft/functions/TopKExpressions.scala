package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** min_k(x, k) → array<bigint>: the k smallest DISTINCT long values, sorted
  * ascending. The bounded building block for capped posting lists /
  * "first k members per key" — `slice(sort_array(collect_list(x)), 1, k)`
  * is semantically the same but its partial-aggregation state is the FULL
  * value list, which for a skewed key (a stop-word term with a billion
  * docs) is an executor OOM at corpus scale. This aggregate's state never
  * exceeds k entries on either the map side or the merge side, so hot keys
  * cost the same memory as cold ones.
  *
  * Exercises the reference's full UDAF contract (init/iterate/merge/
  * terminate with a serialized partial, ql/udf/generic/
  * GenericUDAFEvaluator.java:44) in the Spark shape:
  * TypedImperativeAggregate with map-side combine.
  */
case class MinKAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  require(k > 0, "min_k: k must be positive")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"min_k requires an integral value, got ${other.catalogString}")
    }
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty

  private def add(buf: mutable.TreeSet[Long], v: Long): Unit =
    if (buf.size < k) buf += v
    else if (v < buf.last) { buf += v; if (buf.size > k) buf -= buf.last }

  override def update(buf: mutable.TreeSet[Long], input: InternalRow):
      mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(buf: mutable.TreeSet[Long], other: mutable.TreeSet[Long]):
      mutable.TreeSet[Long] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray[Any]) // TreeSet iterates ascending

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.TreeSet.empty[Long]
    (0 until n).foreach(_ => buf += bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object TopKExpressions {
  import org.apache.spark.sql.catalyst.expressions.Literal

  val registrations: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "min_k" -> { args =>
      require(args.length == 2,
        s"min_k(x, k) takes 2 arguments, got ${args.length}")
      val k = args(1) match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"min_k: k must be an integer literal, got $other")
      }
      MinKAgg(args.head, k).toAggregateExpression()
    })
}

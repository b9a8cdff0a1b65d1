package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** space_saving(item, capacity) → array<struct<item, count_est, err>>:
  * bounded-memory heavy hitters (Metwally et al. space-saving). The
  * 100 TB motivation: an exact `groupBy(item).count` keeps one hash
  * entry per DISTINCT item in the partial aggregate — at billions of
  * distinct URLs/tokens that map spills; this sketch holds exactly
  * `capacity` counters per partition regardless of cardinality.
  *
  * Guarantees: retained `count_est` over-estimates the true count by
  * at most `err` — preserved across the cross-partition merge in the
  * canonical mergeable-summaries way (an item absent from a full
  * sketch is credited that sketch's minimum count, the upper bound on
  * what it could have held there, into both count and err; the merged
  * map is then trimmed to the top `capacity` counters in one sort).
  * Any item with true count > N/capacity survives per sketch; with
  * capacity ≥ distinct-item count nothing is ever evicted and the
  * sketch is exact. Exercises the reference's full UDAF contract
  * (init/iterate/merge/terminate, ql/udf/generic/GenericUDAFEvaluator
  * .java:44) with a serialized intermediate buffer.
  */
case class SpaceSavingAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Array[Long]]] {

  require(capacity > 0, "space_saving capacity must be positive")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"space_saving requires a string item, got ${other.catalogString}")
    }
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count_est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Array[Long]] =
    mutable.HashMap.empty

  // O(capacity) min-scan on eviction; fine for the intended few-thousand
  // capacities (a heap would shave it but complicate serialization)
  private def evictMin(buf: mutable.HashMap[String, Array[Long]]): Array[Long] = {
    var minK: String = null
    var minV: Array[Long] = null
    buf.foreach { case (k, v) =>
      if (minV == null || v(0) < minV(0) || (v(0) == minV(0) && k < minK)) {
        minK = k; minV = v
      }
    }
    buf.remove(minK)
    minV
  }

  override def update(
      buf: mutable.HashMap[String, Array[Long]],
      input: InternalRow): mutable.HashMap[String, Array[Long]] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some(ce) => ce(0) += 1
        case None if buf.size < capacity => buf(item) = Array(1L, 0L)
        case None =>
          val min = evictMin(buf)
          buf(item) = Array(min(0) + 1, min(0))
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Array[Long]],
      other: mutable.HashMap[String, Array[Long]]):
      mutable.HashMap[String, Array[Long]] = {
    // a sketch below capacity never evicted, so absence there means a
    // true count of 0; a full sketch's min count is the upper bound on
    // an absent item's uncounted mass — credit it to keep est >= true
    def minCount(m: mutable.HashMap[String, Array[Long]]): Long =
      if (m.size < capacity) 0L else m.valuesIterator.map(_(0)).min
    val bufMin = minCount(buf)
    val otherMin = minCount(other)
    other.foreach { case (k, ce) =>
      buf.get(k) match {
        case Some(m) => m(0) += ce(0); m(1) += ce(1)
        case None    => buf(k) = Array(ce(0) + bufMin, ce(1) + bufMin)
      }
    }
    buf.keysIterator.toArray.foreach { k =>
      if (!other.contains(k)) {
        val m = buf(k); m(0) += otherMin; m(1) += otherMin
      }
    }
    if (buf.size > capacity) {
      // one sort instead of repeated O(capacity) min-scans
      buf.toSeq.sortBy { case (k, ce) => (ce(0), k) }
        .take(buf.size - capacity)
        .foreach { case (k, _) => buf.remove(k) }
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Array[Long]]): Any = {
    val sorted = buf.toSeq.sortBy { case (k, ce) => (-ce(0), k) }
    new GenericArrayData(sorted.map { case (k, ce) =>
      InternalRow(UTF8String.fromString(k), ce(0), ce(1))
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Array[Long]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, ce) =>
      val b = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b)
      out.writeLong(ce(0)); out.writeLong(ce(1))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Array[Long]] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Array[Long]]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val k = new String(b, java.nio.charset.StandardCharsets.UTF_8)
      buf(k) = Array(in.readLong(), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object HeavyHitterExpressions {
  val registrations: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "space_saving" -> { args =>
      require(args.length == 2,
        s"space_saving(item, capacity) takes 2 arguments, got ${args.length}")
      require(args(1).foldable && args(1).eval() != null,
        "space_saving capacity must be a non-null integer literal")
      val cap = args(1).eval() match {
        case n: Byte => n.toInt
        case n: Short => n.toInt
        case n: Int => n
        case n: Long if n.isValidInt => n.toInt
        case other => throw new IllegalArgumentException(
          s"space_saving capacity must be an integer literal, got $other")
      }
      SpaceSavingAgg(args.head, cap).toAggregateExpression()
    }
  )
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact replica of Hive 1.2's hash() value semantics —
  * ObjectInspectorUtils.hashCode (serde, :526) per argument, combined
  * with the 31-fold of GenericUDFHash/getBucketHashCode.
  *
  * Exists because Spark's catalyst HiveHash diverges from Hive 1.2 on
  * two types (verified against the reference sources and the
  * vector_data_types.q golden):
  *  - DECIMAL: HiveDecimal normalizes (trailing zeros stripped) before
  *    BigDecimal.hashCode; Spark hashes the declared-scale value.
  *  - BINARY: BytesWritable.hashCode is WritableComparator.hashBytes —
  *    a 31-fold SEEDED WITH 1; Spark folds differently.
  *
  * CodegenFallback: hash() appears in qtest fidelity checks and
  * bucket-pruning filters over fixture-sized data, never in the
  * 100 TB hot path (Warehouse bucketed writes use Spark's own layout).
  */
/** Identity marker: tells HiveLegacyHash the wrapped string column is
  * a declared CHAR/VARCHAR (Spark erases both to string, and the
  * read-side padding projection drops the raw-type metadata), so it
  * must take the Text-fold hash path. */
case class HiveCharMark(child: Expression, varchar: Boolean)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

case class HiveLegacyHash(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  // CHAR/VARCHAR survive only as attribute METADATA on the string
  // column (Spark's __CHAR_VARCHAR_TYPE_STRING): Hive hashes them as
  // HiveCharWritable/HiveVarcharWritable — the Hadoop Text fold
  // (seed 1), char on the STRIPPED value — not the string fold (seed 0)
  private val RawTypeKey = "__CHAR_VARCHAR_TYPE_STRING"
  private lazy val charKinds: Seq[Option[String]] = children.map {
    case m: HiveCharMark => Some(if (m.varchar) "varchar" else "char")
    case a: org.apache.spark.sql.catalyst.expressions.Attribute
        if a.metadata.contains(RawTypeKey) =>
      val raw = a.metadata.getString(RawTypeKey).toLowerCase
      if (raw.startsWith("char")) Some("char")
      else if (raw.startsWith("varchar")) Some("varchar") else None
    case _ => None
  }

  override def eval(input: InternalRow): Any = {
    var r = 0
    children.zip(charKinds).foreach { case (c, kind) =>
      val v = c.eval(input)
      val h = (v, kind) match {
        case (null, _) => 0
        case (s: UTF8String, Some("char")) =>
          textFold(s.trimRight().getBytes)
        case (s: UTF8String, Some("varchar")) => textFold(s.getBytes)
        case _ => hashValue(v, c.dataType)
      }
      r = 31 * r + h
    }
    r
  }

  /** Hadoop Text.hashCode = WritableComparator.hashBytes (seed 1). */
  private def textFold(bytes: Array[Byte]): Int = {
    var h = 1
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    h
  }

  private def hashValue(v: Any, dt: DataType): Int = {
    if (v == null) return 0
    dt match {
      case BooleanType => if (v.asInstanceOf[Boolean]) 1 else 0
      case ByteType => v.asInstanceOf[Byte].toInt
      case ShortType => v.asInstanceOf[Short].toInt
      case IntegerType => v.asInstanceOf[Int]
      case LongType =>
        val a = v.asInstanceOf[Long]
        ((a >>> 32) ^ a).toInt
      case FloatType => java.lang.Float.floatToIntBits(v.asInstanceOf[Float])
      case DoubleType =>
        val a = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
        ((a >>> 32) ^ a).toInt
      case StringType =>
        // Text byte fold — equals String.hashCode only for ASCII
        val bytes = v.asInstanceOf[UTF8String].getBytes
        var h = 0
        var i = 0
        while (i < bytes.length) { h = h * 31 + bytes(i); i += 1 }
        h
      case DateType =>
        // DateWritable.hashCode = daysSinceEpoch (stored int)
        v.asInstanceOf[Int]
      case TimestampType =>
        // TimestampWritable.hashCode: seconds<<30 | nanos, folded —
        // Java Timestamp keeps nanos non-negative, so floor math
        val micros = v.asInstanceOf[Long]
        val seconds = Math.floorDiv(micros, 1000000L)
        val nanos = Math.floorMod(micros, 1000000L) * 1000L
        val a = (seconds << 30) | nanos
        ((a >>> 32) ^ a).toInt
      case _: DecimalType =>
        // HiveDecimal.trim before bd.hashCode(): stripTrailingZeros,
        // then NO negative scales — "70.00" strips to 7E+1 (scale -1)
        // in Java but Hive resets to 70 scale 0 (HiveDecimal.java:233)
        val bd0 = v.asInstanceOf[org.apache.spark.sql.types.Decimal]
          .toJavaBigDecimal
        val bd =
          if (bd0.compareTo(java.math.BigDecimal.ZERO) == 0)
            java.math.BigDecimal.ZERO
          else {
            val s = bd0.stripTrailingZeros()
            if (s.scale() < 0) s.setScale(0) else s
          }
        bd.hashCode()
      case BinaryType =>
        // BytesWritable.hashCode = WritableComparator.hashBytes: seed 1
        val bytes = v.asInstanceOf[Array[Byte]]
        var h = 1
        var i = 0
        while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
        h
      case ArrayType(et, _) =>
        val arr = v.asInstanceOf[ArrayData]
        var h = 0
        var i = 0
        while (i < arr.numElements()) {
          h = 31 * h + hashValue(arr.get(i, et), et); i += 1
        }
        h
      case MapType(kt, vt, _) =>
        val m = v.asInstanceOf[MapData]
        var h = 0
        var i = 0
        while (i < m.numElements()) {
          h += hashValue(m.keyArray().get(i, kt), kt) ^
            hashValue(m.valueArray().get(i, vt), vt)
          i += 1
        }
        h
      case StructType(fields) =>
        val row = v.asInstanceOf[InternalRow]
        var h = 0
        var i = 0
        while (i < fields.length) {
          h = 31 * h + hashValue(row.get(i, fields(i).dataType),
            fields(i).dataType)
          i += 1
        }
        h
      case other =>
        throw new UnsupportedOperationException(
          s"hive_hash: unsupported type $other")
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

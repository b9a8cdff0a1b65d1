package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product for dense embedding columns — the hot loop of
  * every similarity operator (brute-force ANN, IVF search, SemDeDup's
  * quadratic intra-cluster stage). The equivalent
  * `aggregate(zip_with(a, b, *), 0.0, +)` composition allocates a zipped
  * array and makes two interpreted lambda calls per element; this is one
  * tight primitive loop per row, and codegen emits a call to the
  * compiled loop through a reference object so the surrounding
  * projection stays inside whole-stage codegen.
  *
  * Result parity with the composition it replaces: identical
  * left-to-right double accumulation (floats widened before multiply),
  * NULL when either array is NULL, when lengths differ, or when any
  * element is NULL — exactly what zip_with's null padding + null
  * arithmetic produced. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  // reject element types comp doesn't read (decimal, string, ...) at
  // analysis time — the typed ArrayData getters would otherwise
  // reinterpret memory silently
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType |
        ShortType | ByteType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product needs numeric arrays, got ${left.dataType.sql} " +
          s"and ${right.dataType.sql}")
  }

  private def comp(dt: DataType, e: ArrayData, i: Int): Double =
    dt match {
      case ArrayType(FloatType, _)   => e.getFloat(i).toDouble
      case ArrayType(IntegerType, _) => e.getInt(i).toDouble
      case ArrayType(LongType, _)    => e.getLong(i).toDouble
      case ArrayType(ShortType, _)   => e.getShort(i).toDouble
      case ArrayType(ByteType, _)    => e.getByte(i).toDouble
      case _                         => e.getDouble(i)
    }

  /** Boxed so the generated code can see the NULL contract; called from
    * both execution paths. */
  def compute(x: ArrayData, y: ArrayData): java.lang.Double = {
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += comp(left.dataType, x, i) * comp(right.dataType, y, i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val r = compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dotProduct", this,
      classOf[DotProduct].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dot")
      s"""
      java.lang.Double $tmp = $ref.compute($a, $b);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp.doubleValue(); }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

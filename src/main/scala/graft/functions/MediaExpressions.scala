package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** jpeg_dims(binary) → struct<width:int, height:int> | null.
  *
  * JPEG dimensions live in a SOF segment at a variable offset, so unlike
  * PNG/GIF/WAV they cannot be read with fixed-position column
  * expressions — this walks the marker chain (SOI, then FF-prefixed
  * segments with big-endian lengths) until a baseline/extended/
  * progressive SOF (C0/C1/C2) and reads height@+5, width@+7. Returns
  * null for non-JPEG or truncated payloads. One bounded pass over the
  * header bytes; entropy-coded data is never touched. */
case class JpegDims(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
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

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

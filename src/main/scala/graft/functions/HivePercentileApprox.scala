package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Clean-room port of Hive's percentile_approx SEMANTICS (ref
  * ql/udf/generic/GenericUDAFPercentileApprox.java +
  * NumericHistogram.java): the Ben-Haim & Tom-Tov streaming histogram
  * with Hive's exact mechanics — capacity `nbins` (default 10000),
  * insert-then-merge-closest-pair trim, tie-break via a
  * fixed-seed PRNG (seed 31183, ref NumericHistogram.java:68 — the
  * goldens pin values that depend on that tie-break sequence), and
  * linear interpolation between bin centroids weighted by counts
  * (quantile(), ref :260-282). Spark's own approx_percentile is a
  * KLL-style sketch with different (and differently-rounded) answers,
  * so percentile_approx goldens can only be met by the Hive
  * algorithm itself (multi_insert_gby2.q). The two
  * udaf_percentile_approx_* scripts stay excluded with cause: their
  * nbins=100 variants pin a PRNG tie-break sequence that depends on
  * the reference box's directory-listing (readdir hash) order of the
  * four bucket files — reproducing a filesystem accident is out of
  * model.
  *
  * Scale shape: one histogram of ≤ nbins (x, count) pairs per
  * partition, merged pairwise (concatenate, sort, trim) — constant
  * memory per group, map-side combinable, the same contract as the
  * reference's map/reduce split.
  */
private[graft] final class NumericHistogramModel(val nbins: Int) {
  import scala.collection.mutable.ArrayBuffer
  val bins: ArrayBuffer[(Double, Double)] = ArrayBuffer.empty
  private val prng = new java.util.Random(31183)

  def add(v: Double): Unit = {
    var l = 0; var r = bins.length; var bin = 0
    var exact = false
    while (l < r && !exact) {
      bin = (l + r) / 2
      if (bins(bin)._1 > v) r = bin
      else if (bins(bin)._1 < v) { bin += 1; l = bin }
      else exact = true
    }
    if (bin < bins.length && bins(bin)._1 == v)
      bins(bin) = (v, bins(bin)._2 + 1)
    else {
      bins.insert(bin, (v, 1.0))
      if (bins.length > nbins) trim()
    }
  }

  private def trim(): Unit = {
    while (bins.length > nbins) {
      var smallestdiff = bins(1)._1 - bins(0)._1
      var loc = 0; var count = 1
      var i = 1
      while (i < bins.length - 1) {
        val diff = bins(i + 1)._1 - bins(i)._1
        if (diff < smallestdiff) { smallestdiff = diff; loc = i; count = 1 }
        else if (diff == smallestdiff) {
          count += 1
          if (prng.nextDouble() <= 1.0 / count) loc = i
        }
        i += 1
      }
      val d = bins(loc)._2 + bins(loc + 1)._2
      val x = bins(loc)._1 * (bins(loc)._2 / d) +
        bins(loc + 1)._1 / d * bins(loc + 1)._2
      bins(loc) = (x, d)
      bins.remove(loc + 1)
    }
  }

  /** Ben-Haim merge: concatenate, sort, trim (ref merge()). */
  def mergeWith(other: NumericHistogramModel): Unit = {
    if (other.bins.isEmpty) return
    if (bins.isEmpty) { bins ++= other.bins; return }
    val all = (bins ++ other.bins).sortBy(_._1)
    bins.clear(); bins ++= all
    trim()
  }

  def quantile(q: Double): Double = {
    var sum = 0.0
    bins.foreach(sum += _._2)
    var csum = 0.0
    var b = 0
    while (b < bins.length) {
      csum += bins(b)._2
      if (csum / sum >= q) {
        if (b == 0) return bins(0)._1
        csum -= bins(b)._2
        return bins(b - 1)._1 +
          (q * sum - csum) * (bins(b)._1 - bins(b - 1)._1) / bins(b)._2
      }
      b += 1
    }
    -1
  }
}

@ExpressionDescription(usage =
  "_FUNC_(expr, pc, [nbins]) - Hive-semantics approximate percentile")
case class HivePercentileApprox(
    child: Expression,
    percentilesExpr: Expression,
    nbinsExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[NumericHistogramModel] {

  private lazy val returnsArray =
    percentilesExpr.dataType.isInstanceOf[ArrayType]

  private def toDoubleLenient(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case s: Short => s.toDouble
    case b: Byte => b.toDouble
    case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
    case bd: java.math.BigDecimal => bd.doubleValue()
    case other => throw new IllegalArgumentException(
      s"percentile_approx: unsupported numeric literal $other")
  }

  // SQL array literals like array(0.5, 0.9) are ArrayType(DecimalType),
  // so extract per-element with the declared element type rather than
  // ArrayData.toDoubleArray() (which casts and throws on Decimal).
  private lazy val percentiles: Seq[Double] = percentilesExpr.eval() match {
    case a: ArrayData =>
      val elemType = percentilesExpr.dataType match {
        case ArrayType(et, _) => et
        case other => other
      }
      a.toObjectArray(elemType).toSeq.map(toDoubleLenient)
    case null => throw new IllegalArgumentException(
      "percentile_approx: percentile argument must be a non-null literal")
    case scalar => Seq(toDoubleLenient(scalar))
  }

  private lazy val nbins: Int = {
    val n = nbinsExpr.eval() match {
      case null => 10000
      case v => toDoubleLenient(v).toInt
    }
    // ref GenericUDAFPercentileApprox.java: nbins must be at least 2
    if (n < 2) throw new IllegalArgumentException(
      s"percentile_approx: the number of histogram bins must be at least 2, got $n")
    n
  }

  override def children: Seq[Expression] =
    Seq(child, percentilesExpr, nbinsExpr)
  override def nullable: Boolean = true
  override def dataType: DataType =
    if (returnsArray) ArrayType(DoubleType) else DoubleType

  override def createAggregationBuffer(): NumericHistogramModel =
    new NumericHistogramModel(nbins)

  override def update(buffer: NumericHistogramModel,
      input: InternalRow): NumericHistogramModel = {
    val v = child.eval(input)
    if (v != null) buffer.add(v match {
      case d: Double => d
      case f: Float => f.toDouble
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case s: Short => s.toDouble
      case b: Byte => b.toDouble
      case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
      case other => other.toString.toDouble
    })
    buffer
  }

  override def merge(buffer: NumericHistogramModel,
      input: NumericHistogramModel): NumericHistogramModel = {
    buffer.mergeWith(input); buffer
  }

  override def eval(buffer: NumericHistogramModel): Any = {
    if (buffer.bins.isEmpty) return null
    val qs = percentiles.map(buffer.quantile)
    if (returnsArray) new GenericArrayData(qs.toArray) else qs.head
  }

  override def serialize(buffer: NumericHistogramModel): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.nbins)
    out.writeInt(buffer.bins.length)
    buffer.bins.foreach { case (x, y) =>
      out.writeDouble(x); out.writeDouble(y)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): NumericHistogramModel = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val h = new NumericHistogramModel(in.readInt())
    val n = in.readInt()
    (0 until n).foreach(_ => h.bins += ((in.readDouble(), in.readDouble())))
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : HivePercentileApprox = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
      : HivePercentileApprox = copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HivePercentileApprox =
    copy(child = newChildren(0), percentilesExpr = newChildren(1),
      nbinsExpr = newChildren(2))
  override def prettyName: String = "percentile_approx"
}

object HivePercentileApprox {
  import org.apache.spark.sql.catalyst.expressions.Literal
  def build(children: Seq[Expression]): Expression = {
    val agg = children match {
      case Seq(c, p) => HivePercentileApprox(c, p, Literal(10000))
      case Seq(c, p, b) => HivePercentileApprox(c, p, b)
      case _ => throw new IllegalArgumentException(
        "percentile_approx requires 2 or 3 arguments")
    }
    agg.toAggregateExpression()
  }
}

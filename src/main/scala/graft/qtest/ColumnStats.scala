package graft.qtest

import org.apache.spark.sql.types._

/** Hive-1.2 column-statistics model for the qtest DESC FORMATTED
  * column renderer: `ANALYZE TABLE … COMPUTE STATISTICS FOR COLUMNS`
  * produces, per column, the min/max/num_nulls/distinct_count/
  * avg_col_len/max_col_len/num_trues/num_falses fields that
  * `DESCRIBE FORMATTED table column` prints (ref
  * ql/metadata/formatting/MetaDataFormatUtils.java:429-499,
  * ql/exec/ColumnStatsTask.java).
  *
  * distinct_count is NOT an exact NDV: Hive estimates it with a bank of
  * Flajolet-Martin sketches whose hash parameters come from fixed-seed
  * java.util.Random draws, so the estimate is fully deterministic and
  * the goldens pin its exact value (69 for a 55-value column, etc.).
  * [[NdvEstimator]] reproduces that estimator's observable behavior
  * clean-room from ql/udf/generic/NumDistinctValueEstimator.java:
  *  - BIT_VECTOR_SIZE = 31 (2^31-1 is prime; the hash family is
  *    a·v + b mod 2^31-1 with a,b odd, drawn from Random(99397) /
  *    Random(9876413), negatives shifted by +2^30 — the reference's
  *    `1 << BIT_VECTOR_SIZE - 1` parses as 1<<30);
  *  - per value, each sketch sets the bit at the index of the lowest
  *    set bit of its hash (index 31 when the hash is 0);
  *  - estimate = 2^(mean lowest-clear-bit + log2(1/phi)), phi=0.77351,
  *    truncated to long; an estimator that never saw a ROW (empty
  *    relation) reports 0, one that saw only NULLs reports 1 — both
  *    pinned by display_colstats_tbllvl / colstats_all_nulls goldens.
  *
  * Values feed the sketch exactly as the reference's type-specific
  * subclasses do (GenericUDAFComputeStats.java:598,661,928,1294,1361):
  * longs directly, doubles via java.lang.Double hashCode, strings via
  * String.hashCode, decimals via the normalized BigDecimal hashCode
  * (HiveDecimal.java:115, trailing zeros stripped), dates via
  * days-since-epoch.
  */
private[qtest] object ColumnStats {

  /** One column's statistics, pre-rendered to the exact strings DESC
    * FORMATTED prints (empty string = field not set for this type). */
  final case class ColStat(
      min: String, max: String, numNulls: String, ndv: String,
      avgColLen: String, maxColLen: String,
      numTrues: String, numFalses: String)

  /** hive.stats.ndv.error → bit-vector count ladder (ref
    * ql/parse/ColumnStatsSemanticAnalyzer.java:233-285; default error
    * 20.0% → 16 vectors, matching the compute_stats(col, 16) calls the
    * reference's explain goldens show). */
  def numBitVectors(percentageError: Double): Int =
    if (percentageError <= 3.4) 1024
    else if (percentageError <= 4.8) 512
    else if (percentageError <= 6.8) 256
    else if (percentageError <= 9.7) 128
    else if (percentageError <= 13.8) 64
    else if (percentageError <= 19.6) 32
    else if (percentageError <= 28.2) 16
    else if (percentageError <= 40.9) 8
    else if (percentageError <= 61.0) 4
    else 2

  final class NdvEstimator(numVectors: Int) {
    private val Bits = 31
    private val Mod = (1 << Bits) - 1 // 2^31-1, prime
    private val bits = new Array[Long](numVectors) // ≤32 bits used each
    private val a = new Array[Int](numVectors)
    private val b = new Array[Int](numVectors)
    locally {
      val aR = new java.util.Random(99397L)
      val bR = new java.util.Random(9876413L)
      var i = 0
      while (i < numVectors) {
        var r = aR.nextInt(); while (r % 2 == 0) r = aR.nextInt()
        a(i) = if (r < 0) r + (1 << (Bits - 1)) else r
        r = bR.nextInt(); while (r % 2 == 0) r = bR.nextInt()
        b(i) = if (r < 0) r + (1 << (Bits - 1)) else r
        i += 1
      }
    }

    def addLong(v: Long): Unit = {
      var i = 0
      while (i < numVectors) {
        val t = (a(i).toLong * v + b(i).toLong) % Mod
        var hash = { val h = t.toInt; if (h < 0) h + Mod else h }
        var index = 0
        while (index < Bits && hash % 2 == 0) { hash = hash >> 1; index += 1 }
        bits(i) |= 1L << index
        i += 1
      }
    }
    def addDouble(d: Double): Unit =
      addLong(java.lang.Double.valueOf(d).hashCode().toLong)
    def addString(s: String): Unit = addLong(s.hashCode.toLong)
    def addDecimal(bd: java.math.BigDecimal): Unit = {
      // HiveDecimal normalizes before hashing: strip trailing zeros,
      // zero compares as plain ZERO, no negative scales
      val n =
        if (bd.compareTo(java.math.BigDecimal.ZERO) == 0)
          java.math.BigDecimal.ZERO
        else {
          val s = bd.stripTrailingZeros()
          if (s.scale < 0) s.setScale(0) else s
        }
      addLong(n.hashCode.toLong)
    }

    def estimate: Long = {
      var sum = 0
      var i = 0
      while (i < numVectors) {
        sum += java.lang.Long.numberOfTrailingZeros(~bits(i))
        i += 1
      }
      val Phi = 0.77351
      val avg = sum / (numVectors * 1.0) - math.log(Phi) / math.log(2.0)
      math.pow(2.0, avg).toLong
    }
  }

  private def dbl(d: Double): String = java.lang.Double.toString(d)

  /** Compute one column's Hive-1.2 stats over the collected slice
    * values (qtest fixtures are tens-to-hundreds of rows — the gate's
    * golden result sets are collected whole anyway). `rowCount` is the
    * slice's TOTAL row count (nulls included): a zero-row relation
    * reports NDV 0 while an all-null column reports NDV 1, and string/
    * binary avg_col_len divides by rows-including-nulls
    * (GenericUDAFComputeStats.java:1007 `sumLength / (1.0 * total)`).
    * Returns None for types Hive 1.2's FOR COLUMNS path does not
    * gather (timestamp, complex) so the caller can refuse to render. */
  def compute(values: Seq[Any], rowCount: Long, dt: DataType,
      nbv: Int): Option[ColStat] = {
    val nonNull = values.filter(_ != null)
    val numNulls = rowCount - nonNull.length
    val est = new NdvEstimator(nbv)
    def ndv: String = if (rowCount == 0) "0" else est.estimate.toString
    dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        val ls = nonNull.map {
          case v: Byte => v.toLong
          case v: Short => v.toLong
          case v: Int => v.toLong
          case v: Long => v
        }
        ls.foreach(est.addLong)
        Some(ColStat(
          if (ls.isEmpty) "0" else ls.min.toString,
          if (ls.isEmpty) "0" else ls.max.toString,
          numNulls.toString, ndv, "", "", "", ""))
      case FloatType | DoubleType =>
        val ds = nonNull.map {
          case v: Float => v.toDouble
          case v: Double => v
        }
        ds.foreach(est.addDouble)
        Some(ColStat(
          if (ds.isEmpty) "0.0" else dbl(ds.min),
          if (ds.isEmpty) "0.0" else dbl(ds.max),
          numNulls.toString, ndv, "", "", "", ""))
      case StringType =>
        val ss = nonNull.map(_.asInstanceOf[String])
        ss.foreach(est.addString)
        val sumLen = ss.map(_.length.toLong).sum
        val avg = if (rowCount == 0) 0.0 else sumLen / (1.0 * rowCount)
        Some(ColStat("", "", numNulls.toString, ndv,
          dbl(avg), ss.map(_.length).foldLeft(0)(math.max).toString,
          "", ""))
      case BinaryType =>
        val bs = nonNull.map(_.asInstanceOf[Array[Byte]])
        val sumLen = bs.map(_.length.toLong).sum
        val avg = if (rowCount == 0) 0.0 else sumLen / (1.0 * rowCount)
        Some(ColStat("", "", numNulls.toString, "",
          dbl(avg), bs.map(_.length).foldLeft(0)(math.max).toString,
          "", ""))
      case BooleanType =>
        val vs = nonNull.map(_.asInstanceOf[Boolean])
        Some(ColStat("", "", numNulls.toString, "", "", "",
          vs.count(identity).toString, vs.count(!_).toString))
      case _: DecimalType =>
        val ds = nonNull.map {
          case v: java.math.BigDecimal => v
          case v: scala.math.BigDecimal => v.bigDecimal
        }
        ds.foreach(est.addDecimal)
        def plain(v: java.math.BigDecimal): String = {
          // HiveDecimal.toString = normalized toPlainString
          val t =
            if (v.compareTo(java.math.BigDecimal.ZERO) == 0)
              java.math.BigDecimal.ZERO
            else {
              val s = v.stripTrailingZeros()
              if (s.scale < 0) s.setScale(0) else s
            }
          t.toPlainString
        }
        Some(ColStat(
          if (ds.isEmpty) "" else plain(ds.min(Ordering.by((x: java.math.BigDecimal) => x))),
          if (ds.isEmpty) "" else plain(ds.max(Ordering.by((x: java.math.BigDecimal) => x))),
          numNulls.toString, ndv, "", "", "", ""))
      case DateType =>
        val days = nonNull.map {
          case v: java.sql.Date => v.toLocalDate.toEpochDay
          case v: java.time.LocalDate => v.toEpochDay
        }
        days.foreach(est.addLong)
        def fmt(d: Long): String = java.time.LocalDate.ofEpochDay(d).toString
        Some(ColStat(
          if (days.isEmpty) "" else fmt(days.min),
          if (days.isEmpty) "" else fmt(days.max),
          numNulls.toString, ndv, "", "", "", ""))
      case _ => None
    }
  }
}

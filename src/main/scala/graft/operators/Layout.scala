package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Morton (Z-order) clustering, the file-
  * skipping strategy for scans that filter on MORE THAN ONE column.
  * Partitioning a 100 TB table by one key leaves range predicates on every
  * other column as full scans; interleaving the key bits gives every file a
  * bounded range in ALL clustered dimensions at once, so min/max (or
  * partition-value) pruning works for each of them.
  *
  * Reference seed: Hive's storage-layout controls stop at single-column
  * partitioning/bucketing + sorted-by (ql/plan/CreateTableDesc.java); the
  * z-curve layout is the standard lakehouse extension of the same idea
  * (public literature: Morton 1966; Delta/Iceberg `ZORDER BY`/sort-order
  * docs). Everything here is composed from codegen'd bit arithmetic — the
  * z-value is ~2·bits·dims shift/mask/or expressions inside whole-stage
  * codegen, no UDF — plus driver-side pure math for bucket cover
  * enumeration (no data movement).
  */
object Layout {

  /** Morton z-value: interleave the low `bits` bits of each column
    * (column j occupies interleaved bit positions i·n + j). Inputs must
    * already be normalized to [0, 2^bits) — e.g. via `% (1 << bits)` or a
    * rank/quantile transform; out-of-range values silently contribute only
    * their low bits, which breaks locality, not correctness. */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(cols.size * bits <= 63,
      s"zValue: ${cols.size} cols × $bits bits exceeds a signed long")
    val n = cols.size
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(
      shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Bucket id = top `bucketBits` bits of a z-value built from `dims`
    * dimensions of `bits` bits each. Consecutive z prefix = one aligned
    * hyper-rectangle of the grid, so a bucket bounds every dimension. */
  def zBucket(z: Column, dims: Int, bits: Int, bucketBits: Int): Column = {
    require(bucketBits >= 1 && bucketBits <= dims * bits,
      "bucketBits out of range")
    shiftright(z, dims * bits - bucketBits)
  }

  /** Cluster a DataFrame for write: adds `z_value` and `z_bucket`, then
    * co-locates each bucket in one task and sorts rows by z within it —
    * `out.write.partitionBy("z_bucket")` (directory-pruned buckets) or a
    * plain parquet write (min/max-pruned row groups) both inherit the
    * locality. One shuffle, no sampling, deterministic layout. */
  def clusterByZOrder(
      df: DataFrame,
      dimCols: Seq[String],
      bits: Int,
      bucketBits: Int): DataFrame = {
    val z = zValue(dimCols.map(col), bits)
    df.withColumn("z_value", z)
      .withColumn("z_bucket", zBucket(col("z_value"), dimCols.size, bits, bucketBits))
      .repartition(col("z_bucket"))
      .sortWithinPartitions("z_value")
  }

  /** Driver-side pure math: the set of z-buckets that can contain any point
    * of the query hyper-rectangle `ranges` (inclusive [lo, hi] per
    * dimension, same order as the clustering columns). Use the result in a
    * `col("z_bucket").isin(...)` predicate to turn multi-column range
    * filters into partition/file pruning. Enumerates 2^bucketBits bucket
    * ids — bucketBits is small by construction (it counts FILES, not rows),
    * so this is micro-work that never touches the cluster. */
  def zBucketsFor(
      ranges: Seq[(Long, Long)],
      bits: Int,
      bucketBits: Int): Seq[Long] = {
    val n = ranges.size
    require(n * bits <= 63 && bucketBits >= 1 && bucketBits <= n * bits)
    (0L until (1L << bucketBits)).filter { b =>
      // bucket b fixes the top bucketBits of z; derive, per dimension, the
      // [lo, hi] interval the fixed prefix allows, and test intersection
      val zLo = b << (n * bits - bucketBits) // prefix with zero tail
      (0 until n).forall { j =>
        var fixed = 0L // the dimension's fixed high bits (from the prefix)
        var freeBits = 0 // how many of its low bits the prefix leaves open
        var i = bits - 1
        var p = i * n + j
        while (i >= 0 && p >= n * bits - bucketBits) {
          fixed = (fixed << 1) | ((zLo >> p) & 1L)
          i -= 1; p = i * n + j
        }
        freeBits = i + 1
        val dimLo = fixed << freeBits
        val dimHi = dimLo | ((1L << freeBits) - 1L)
        val (qLo, qHi) = ranges(j)
        dimLo <= qHi && dimHi >= qLo
      }
    }
  }
}

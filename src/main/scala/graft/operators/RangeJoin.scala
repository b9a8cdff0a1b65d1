package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: fact rows with a numeric point column joined
  * to ranges `[start, end)`. Spark plans the naive non-equi predicate as
  * a BroadcastNestedLoopJoin — quadratic work per partition, and a
  * scale-killer the moment the ranges side outgrows broadcast.
  *
  * Re-expression: quantize both sides into fixed-width buckets — a
  * point falls in exactly one bucket, a range explodes into the buckets
  * it covers (bounded by rangeWidth/bucketWidth rows) — equi-join on
  * the bucket id, then apply the exact range predicate as a residual
  * filter. One hash shuffle, work proportional to true matches plus
  * bucket slack; each (fact, range) pair meets in exactly one bucket so
  * no dedup pass is needed. Pick bucketWidth ≈ typical range width.
  * Negative domains are safe: `div` truncates toward zero on both
  * sides, and truncation is monotonic, so s <= p < e still implies
  * bucket(p) ∈ [bucket(s), bucket(e-1)].
  */
object RangeJoin {

  def pointInRange(
      facts: DataFrame,
      pointCol: String,
      ranges: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val fb = facts.withColumn("__bucket",
      expr(s"`$pointCol` div $bucketWidth"))
    // empty/inverted ranges ([s, e) with e <= s) must cost nothing:
    // unguarded, sequence() would auto-step -1 and fan them across
    // descending junk buckets (correct output, quadratic-ish waste)
    val rb = ranges.withColumn("__bucket",
      explode(when(col(endCol) > col(startCol),
        sequence(
          expr(s"`$startCol` div $bucketWidth"),
          expr(s"(`$endCol` - 1) div $bucketWidth")))
        .otherwise(array().cast("array<long>"))))
    fb.join(rb, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }
}

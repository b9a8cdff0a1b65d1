package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}

/** Bounded-memory frequent items over unbounded cardinality — the
  * training-pipeline "what dominates this corpus" primitive (top
  * domains, top boilerplate lines, top tokens) that works when the
  * distinct-item count dwarfs executor memory. Exact `groupBy.count`
  * is preferable whenever the partial-aggregate hash map fits; this is
  * the path for when it doesn't: `capacity` counters per partition,
  * one merge, no spill. See graft.functions.SpaceSavingAgg for the
  * guarantees (exact when capacity ≥ distinct items).
  */
object HeavyHitters {

  /** space_saving sketch column: array<struct<item, count_est, err>>
    * sorted by descending estimate. */
  def sketch(item: Column, capacity: Int): Column =
    toCol(graft.functions.SpaceSavingAgg(toExpr(item), capacity)
      .toAggregateExpression())

  /** Top-k candidate heavy hitters with estimate and error bound. */
  def topK(df: DataFrame, item: Column, k: Int, capacity: Int): DataFrame =
    df.agg(sketch(item, capacity).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item").as("item"), col("e.count_est").as("count_est"),
        col("e.err").as("err"))
      .orderBy(col("count_est").desc, col("item"))
      .limit(k)

  /** Per-group top-k heavy hitters ("what's trending per source"): ONE
    * bounded sketch per group — per-group state is `capacity` counters
    * no matter how many distinct items the group sees. The final rank
    * window runs over the exploded sketches, whose size is
    * ≤ capacity per group by construction — so the per-group sort that
    * makes naive windowed top-k a hot-group hazard is bounded here by a
    * query constant, not by data volume. */
  def topKPerGroup(
      df: DataFrame, groupCol: String, item: Column,
      k: Int, capacity: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol)
      .orderBy(col("count_est").desc, col("item"))
    df.groupBy(groupCol).agg(sketch(item, capacity).as("sk"))
      .select(col(groupCol), explode(col("sk")).as("e"))
      .select(col(groupCol), col("e.item").as("item"),
        col("e.count_est").as("count_est"), col("e.err").as("err"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}

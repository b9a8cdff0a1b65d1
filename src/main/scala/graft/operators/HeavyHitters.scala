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
}

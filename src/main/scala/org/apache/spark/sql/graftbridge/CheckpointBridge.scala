package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** An eagerly `localCheckpoint()`ed Dataset is backed by persisted blocks
  * (its analyzed plan is a `LogicalRDD` over the checkpointed RDD) that stay
  * resident until the RDD is garbage-collected. Iterative algorithms that
  * checkpoint every round (e.g. label propagation) would otherwise pin
  * ~diameter full copies of the working set; this bridge lets them release
  * a round's blocks as soon as the next round is materialized.
  *
  * Only call this once nothing will read `df` again — the lineage was
  * truncated at the checkpoint, so the data is unrecoverable afterwards. */
object CheckpointBridge {
  def release(df: Dataset[_]): Unit = df.queryExecution.analyzed match {
    case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
    case _ => ()
  }
}

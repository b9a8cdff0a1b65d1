package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge-list DataFrames — the power-method
  * family (PageRank here; label propagation lives in
  * `Dedup.connectedComponents`). Link analysis ranks hosts/domains for
  * crawl prioritization and quality weighting in a training-data
  * pipeline.
  *
  * Scale shape: each iteration is one shuffle-join of the rank table
  * with the (persisted) edge list plus a destination-keyed aggregate —
  * the same per-round cost profile as connectedComponents. Rank mass is
  * summed through exact decimals on rounded per-edge contributions, so
  * ranks are independent of partial-aggregation order (the repo-wide
  * float-determinism contract) and SQL-replayable.
  */
object Graph {

  /** Simplified PageRank (no dangling-mass redistribution — every node
    * in `edges` has out-degree ≥ 1 by construction; nodes never appearing
    * as a source keep receiving only the teleport term). Returns
    * (node, pr) after `iters` rounds, pr rounded to 9 decimals. */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    // decimal-exact teleport constant: 1 - 0.85 in binary doubles is
    // 0.15000000000000002, one ulp ABOVE the double a SQL oracle's
    // literal 0.15 parses to — compute it the way the replaying engine
    // will, or every rank is off by an ulp before rounding
    val teleport = (BigDecimal(1) - BigDecimal(damping)).toDouble
    // pre-partition the edge list on src: every round's rank join then
    // lines up with the checkpoint-preserved hash(node) layout of the
    // rank table, so the only per-round exchange is the mass aggregate
    val e = edges
      .select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .distinct()
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // the rank table carries the static out-degree so each round is
      // ONE edge join + one aggregate, not two joins; node table built
      // once and checkpoint-pinned (it anchors every round's left join)
      val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()
        .join(outdeg.withColumnRenamed("src", "node"), Seq("node"), "left")
        .localCheckpoint(true)
      var pr = nodes.withColumn("pr", lit(1.0))
      var prevCut: DataFrame = null
      for (i <- 1 to iters) {
        val contrib = e
          .join(pr.select(col("node").as("src"), col("outdeg"), col("pr")),
            "src")
          .select(col("dst"),
            round(col("pr") / col("outdeg"), 12)
              .cast("decimal(28,12)").as("w"))
          .groupBy("dst").agg(sum("w").as("mass"))
        pr = nodes
          .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
          .select(col("node"), col("outdeg"),
            round(lit(teleport) +
              lit(damping) * coalesce(col("mass").cast("double"), lit(0.0)),
              9).as("pr"))
          // eager cut per round (the connectedComponents discipline):
          // keeps the plan bounded and each round's shuffle work done
          // exactly once; the previous round's pinned blocks go as soon
          // as the new round is materialized
          .localCheckpoint(true)
        if (prevCut != null)
          org.apache.spark.sql.graftbridge.CheckpointBridge.release(prevCut)
        prevCut = pr
      }
      // the final round's checkpoint backs the returned frame (the one
      // pinned |V|-row copy — the connectedComponents contract); the
      // node anchor is no longer needed
      org.apache.spark.sql.graftbridge.CheckpointBridge.release(nodes)
      pr.select(col("node"), col("pr"))
    } finally e.unpersist(false)
  }
}

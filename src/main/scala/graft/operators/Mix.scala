package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-mix monitoring: distribution statistics over corpus slices.
  * The question a 100 TB pipeline asks after every re-mix: "did source
  * X's language (or domain/length-bucket) profile drift from the corpus
  * profile?" — answered with per-slice KL divergence against the global
  * distribution in two count shuffles + a broadcast.
  */
object Mix {

  /** Per-slice KL divergence KL(p_slice ‖ p_global) over the `keyCol`
    * distribution, plus the slice row count. Zero-probability keys inside
    * a slice contribute 0 (lim x·ln x = 0); keys absent globally cannot
    * occur in a slice. Determinism: each p·ln(p/q) term is rounded to 12
    * decimals and summed EXACTLY as decimal (float merge order can never
    * change the result), then the sum is rounded to 6 — the engine's
    * standard cross-engine float contract. Output: sliceCol, n, kl. */
  def klDrift(df: DataFrame, sliceCol: String, keyCol: String): DataFrame = {
    val cell = df.groupBy(sliceCol, keyCol).agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // feeds slice totals, global totals, and terms
    val slice = cell.groupBy(sliceCol).agg(sum("c").as("ns"))
    val global = cell.groupBy(keyCol).agg(sum("c").as("ck"))
    val total = cell.agg(sum("c").as("n")) // 1-row
    val term = cell
      .join(broadcast(slice), sliceCol)
      .join(broadcast(global), keyCol)
      .crossJoin(broadcast(total))
      .select(col(sliceCol), col("ns"),
        round(
          (col("c").cast("double") / col("ns").cast("double")) *
            log((col("c").cast("double") * col("n").cast("double")) /
              (col("ns").cast("double") * col("ck").cast("double"))),
          12).cast("decimal(28,12)").as("t"))
    term.groupBy(sliceCol)
      .agg(max("ns").cast("long").as("n"),
        round(sum("t").cast("double"), 6).as("kl"))
  }
}

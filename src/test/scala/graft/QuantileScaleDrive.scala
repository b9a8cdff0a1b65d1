package graft

import org.apache.spark.sql.functions._
import graft.operators.Stats

/** Measures the rankQuantiles plan switch on data that actually
  * TRIGGERS it (VERDICT r10 #4: the sf0.1 headline corpus's largest
  * group sits under the 2M default threshold, so the selection path
  * was spec-proven exact but never benchmarked): a skewed
  * 3-group corpus whose largest group is ~6M rows. Runs both plans on
  * identical data — the sort path (threshold forced above the corpus)
  * vs the auto-selected distributed-selection path — warmup + median
  * of 3 each, and prints one JSON line for SCALE.md.
  *
  * Usage: sbt "Test/runMain graft.QuantileScaleDrive [rows]"
  */
object QuantileScaleDrive {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 8000000L
    val s = SparkSpec.session
    // skew: ~75% of rows in one group, heavy ties (1000 distinct
    // values per group) — the boundary-tie logic's worst habitat
    val df = s.range(n).select(
      when(col("id") % 4 < 3, lit("big"))
        .when(col("id") % 4 === 3 && col("id") % 8 === 3, lit("mid"))
        .otherwise(lit("small")).as("grp"),
      (pmod(hash(col("id")), lit(1000)).cast("double") * 0.25).as("v"))
      .persist()
    val total = df.count() // materialize outside the timings
    val ps = Seq(("q05", BigDecimal("0.05")), ("med", BigDecimal("0.5")),
      ("q99", BigDecimal("0.99")))
    def run(): Unit =
      Stats.rankQuantiles(df, "grp", "v", ps)
        .write.format("noop").mode("overwrite").save()
    def timed(label: String, threshold: Long): Double = {
      s.conf.set("spark.graft.stats.rankSortThreshold", threshold.toString)
      try {
        run() // warmup
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
        }.sorted
        println(f"QSCALE $label: median ${runs(1)}%.2fs " +
          f"(min ${runs.head}%.2f max ${runs.last}%.2f)")
        runs(1)
      } finally s.conf.unset("spark.graft.stats.rankSortThreshold")
    }
    // correctness cross-check on THIS corpus before timing
    val a = Stats.rankQuantiles(df, "grp", "v", ps).orderBy("grp")
      .collect().toSeq
    s.conf.set("spark.graft.stats.rankSortThreshold", (2 * n).toString)
    val b = Stats.rankQuantiles(df, "grp", "v", ps).orderBy("grp")
      .collect().toSeq
    s.conf.unset("spark.graft.stats.rankSortThreshold")
    require(a == b, s"paths diverge on the benchmark corpus: $a vs $b")
    val sortSec = timed("sort-path", 2 * n) // every group under threshold
    val selSec = timed("selection-path", 2000000L) // the default switch
    println(f"""{"bench":"quantile_selection","rows":$total,""" +
      f""""largest_group":${(total * 3) / 4},"sort_sec":$sortSec%.2f,""" +
      f""""selection_sec":$selSec%.2f,""" +
      f""""speedup":${sortSec / selSec}%.2f}""")
    s.stop()
  }
}

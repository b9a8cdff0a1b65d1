package graft

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // a -> b, a -> c, b -> a; c is dangling (its mass drops — the
  // documented simplified-PageRank variant)
  private lazy val edges = Seq(
    ("a", "b"), ("a", "c"), ("b", "a")
  ).toDF("src", "dst")

  test("pageRank matches the hand-computed power iteration") {
    // pr0 = 1 everywhere
    // iter1: a <- b/1 = 1.0           -> 0.15 + 0.85*1.0  = 1.0
    //        b <- a/2 = 0.5           -> 0.575
    //        c <- a/2 = 0.5           -> 0.575
    // iter2: a <- 0.575, b/c <- 0.5   -> a 0.63875, b 0.575, c 0.575
    val pr1 = Graph.pageRank(edges, "src", "dst", iters = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr1 == Map("a" -> 1.0, "b" -> 0.575, "c" -> 0.575))
    val pr2 = Graph.pageRank(edges, "src", "dst", iters = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr2 == Map("a" -> 0.63875, "b" -> 0.575, "c" -> 0.575))
  }

  test("pageRank is partitioning-invariant (decimal-exact mass sums)") {
    val big = (0L until 200L).map(i => (s"n$i", s"n${(i * 7) % 200}"))
      .toDF("src", "dst")
    val once = Graph.pageRank(big, "src", "dst", iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val again = Graph.pageRank(big.repartition(13), "src", "dst", iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(once == again)
  }
}

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

  test("pageRank redistributes dangling mass: ranks sum to |V| within tol") {
    // c is dangling; in the simplified mode its mass leaks every round
    // (sum < |V|), in production mode it returns as a uniform share
    val tol = 1e-6
    val leaky = Graph.pageRank(edges, "src", "dst", iters = 8)
      .agg(org.apache.spark.sql.functions.sum("pr")).head().getDouble(0)
    assert(leaky < 2.9, s"simplified mode leaks sink mass, sum = $leaky")
    val conserved = Graph.pageRank(edges, "src", "dst", iters = 50,
        redistributeDangling = true, tol = tol)
      .agg(org.apache.spark.sql.functions.sum("pr")).head().getDouble(0)
    assert(math.abs(conserved - 3.0) < 0.01,
      s"dangling redistribution must conserve total mass, sum = $conserved")
    // hand-check round 1: dangling share = 1/3 per node
    // a <- b/1 = 1.0    -> 0.15 + 0.85*(1.0 + 1/3)  = 1.283333333
    // b <- a/2 = 0.5    -> 0.15 + 0.85*(0.5 + 1/3)  = 0.858333333
    // c <- a/2 = 0.5    ->                            0.858333333
    val r1 = Graph.pageRank(edges, "src", "dst", iters = 1,
        redistributeDangling = true)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(r1("a") - 1.283333333) < 1e-9)
    assert(math.abs(r1("b") - 0.858333333) < 1e-9)
    assert(math.abs(r1("c") - 0.858333333) < 1e-9)
  }

  test("pageRank tol terminates early and matches the run-to-cap ranks") {
    // a 2-cycle converges fast; with a loose tol the 50-round cap must
    // not be reached, and the result equals the fully-iterated one
    val cyc = Seq(("x", "y"), ("y", "x")).toDF("src", "dst")
    val t0 = System.nanoTime()
    val early = Graph.pageRank(cyc, "src", "dst", iters = 50, tol = 1e-12)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // symmetric 2-cycle fixed point: pr = 1 exactly, reached in round 1
    assert(early == Map("x" -> 1.0, "y" -> 1.0))
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(elapsed < 60.0,
      s"50 rounds would take far longer than the converged run ($elapsed s)")
  }

  test("triangleCount: K4 has 4 triangles, 3 per node; path has none") {
    val k4 = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d")).toDF("x", "y")
    val got = Graph.triangleCount(k4, "x", "y")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("x", "y")
    val none = Graph.triangleCount(path, "x", "y")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(none == Map("a" -> 0L, "b" -> 0L, "c" -> 0L, "d" -> 0L))
  }

  test("triangleCount tolerates duplicate, reversed, and self-loop edges") {
    val messy = Seq(("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"),
      ("c", "a"), ("a", "a")).toDF("x", "y")
    val got = Graph.triangleCount(messy, "x", "y")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
  }

  test("triangleCount on a hub graph: star plus one rim edge = 1 triangle") {
    // hub connected to 50 spokes; one rim edge closes exactly one
    // triangle — the degree-orientation case where a naive wedge join
    // at the hub would enumerate 50*49/2 candidate wedges
    val star = (1 to 50).map(i => ("hub", s"v$i")) :+ (("v7", "v8"))
    val got = Graph.triangleCount(star.toDF("x", "y"), "x", "y")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("hub") == 1L && got("v7") == 1L && got("v8") == 1L)
    assert(got.values.sum == 3L)
    assert(got.size == 51)
  }

  test("neighborhoodMean: hand-computed 1 and 2 hop means, isolated drop") {
    val e = Seq(("a", "c"), ("b", "c"), ("c", "a")).toDF("s", "d")
    val feats = Seq(("a", 10.0), ("b", 20.0), ("c", 40.0)).toDF("n", "v")
    // hop1: c <- mean(a,b) = 15, a <- mean(c) = 40; b has no in-edge
    val h1 = Graph.neighborhoodMean(e, "s", "d", feats, "n", "v", hops = 1)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(h1 == Map("c" -> ((2L, 15.0)), "a" -> ((1L, 40.0))))
    // hop2 over h1 values: c <- mean(a=40) (b dropped out after hop 1),
    // a <- mean(c=15)
    val h2 = Graph.neighborhoodMean(e, "s", "d", feats, "n", "v", hops = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(h2 == Map("c" -> ((1L, 40.0)), "a" -> ((1L, 15.0))))
  }

  test("kCoreMembers peels tails: K4 plus a pendant path, k=2") {
    val k4 = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d"))
    // path d-e-f: e has degree 2 at round 1 but loses f in round 2
    val edges = (k4 ++ Seq(("d", "e"), ("e", "f"))).toDF("x", "y")
    val got = Graph.kCoreMembers(edges, "x", "y", k = 2, rounds = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // f (deg 1) peels in round 1, e (deg 1 after f goes) in round 2;
    // the K4 survives with internal degree 3 (d's pendant edge is gone)
    assert(got == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
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

  test("pageRank r15 hints (edges-distinct, all-nodes-are-sources) are " +
    "result-invariant on a symmetric distinct edge list") {
    // symmetrized distinct graph: both hint preconditions hold
    val half = (0L until 60L).map(i => (s"a$i", s"b${(i * 3) % 40}")).distinct
    val edges = (half ++ half.map(_.swap)).distinct.toDF("src", "dst")
    val plain = Graph.pageRank(edges, "src", "dst", iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val hinted = Graph.pageRank(edges, "src", "dst", iters = 3,
        assumeEdgesDistinct = true, assumeAllNodesAreSources = true)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(plain == hinted && plain.nonEmpty)
  }

  test("pageRank: many fixed rounds exercise the periodic lineage cut " +
    "and match a per-round-cut mode on ranks") {
    val edges = (0L until 50L).map(i => (s"n$i", s"n${(i * 11) % 50}"))
      .toDF("src", "dst")
    // 10 rounds crosses the cutEvery=8 boundary; tol=0 keeps lazy rounds
    val lazyRounds = Graph.pageRank(edges, "src", "dst", iters = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // redistributeDangling=false + tiny tol>0 forces the eager per-round
    // path WITHOUT changing the arithmetic (tol never met in 10 rounds
    // on this cyclic graph ⇒ same 10 rounds, eagerly cut)
    val eagerRounds = Graph.pageRank(edges, "src", "dst", iters = 10,
        tol = 1e-300)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(lazyRounds == eagerRounds && lazyRounds.nonEmpty)
  }

  test("triangleCount assumeNormalized is result-invariant on " +
    "normalized distinct edges") {
    val k4 = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d")).toDF("x", "y")
    val plain = Graph.triangleCount(k4, "x", "y")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val hinted = Graph.triangleCount(k4, "x", "y", assumeNormalized = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plain == hinted && plain == Map(
      "a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
  }
}

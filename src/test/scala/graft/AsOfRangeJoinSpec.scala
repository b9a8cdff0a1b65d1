package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, RangeJoin}

class AsOfRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof backward: picks latest state <= ts, inclusive ties, NULL when none") {
    val facts = Seq(
      (1L, "u", 5L), // between states at 3 and 8 → state at 3
      (2L, "u", 8L), // tie with state at 8 → inclusive
      (3L, "u", 2L), // before any state → NULL
      (4L, "v", 9L)  // key with no states at all → NULL
    ).toDF("id", "k", "ts")
    val states = Seq(("u", 3L, "a"), ("u", 8L, "b")).toDF("k", "ts", "s")

    val out = AsOfJoin.backward(facts, states, Seq("k"), "ts", "ts", Seq("s"))
      .select("id", "s").collect().map(r => (r.getLong(0), r.get(1))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a"), (2L, "b"), (3L, null), (4L, null)))
  }

  test("asof backward: a legitimately NULL state value is not skipped") {
    val facts = Seq((1L, "u", 10L)).toDF("id", "k", "ts")
    val states = Seq(("u", 1L, Some("old")), ("u", 5L, None))
      .toDF("k", "ts", "s")
    val out = AsOfJoin.backward(facts, states, Seq("k"), "ts", "ts", Seq("s"))
      .select("s").collect()
    // most recent state (ts=5) is NULL — must not leak "old" forward
    assert(out.head.isNullAt(0))
  }

  test("asof backward plans one key shuffle, never a nested-loop join") {
    val facts = Seq((1L, "u", 5L)).toDF("id", "k", "ts")
    val states = Seq(("u", 3L, "a")).toDF("k", "ts", "s")
    val df = AsOfJoin.backward(facts, states, Seq("k"), "ts", "ts", Seq("s"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("Cartesian"),
      s"as-of must not degrade to a nested-loop join:\n$p")
    assert(p.contains("Window"), "state carry must be a window, not a join")
  }

  test("range join: half-open bounds, cross-bucket ranges, no nested loop") {
    val facts = Seq((1L, 0L), (2L, 10L), (3L, 19L), (4L, 20L), (5L, 35L))
      .toDF("id", "p")
    // [10, 20) spans buckets 1..1 at width 10; [0, 35) spans 0..3
    val ranges = Seq(("a", 10L, 20L), ("b", 0L, 35L)).toDF("r", "s", "e")
    val out = RangeJoin.pointInRange(facts, "p", ranges, "s", "e", 10L)
      .select("id", "r").collect().map(x => (x.getLong(0), x.getString(1)))
      .sortBy(x => (x._1, x._2))
    // p=10 in both; p=19 in both; p=20 excluded from [10,20); p=35 excluded from [0,35)
    assert(out.toSeq == Seq((1L, "b"), (2L, "a"), (2L, "b"), (3L, "a"),
      (3L, "b"), (4L, "b")))

    val df = RangeJoin.pointInRange(facts, "p", ranges, "s", "e", 10L)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("Cartesian"),
      s"range join must be an equi join on buckets:\n$p")
  }

  test("range join: each pair matches exactly once even when range covers many buckets") {
    val facts = Seq((1L, 55L)).toDF("id", "p")
    val ranges = Seq(("wide", 0L, 1000L)).toDF("r", "s", "e")
    val out = RangeJoin.pointInRange(facts, "p", ranges, "s", "e", 10L)
    assert(out.count() == 1L)
  }

  test("asof backward: NULL keys and NULL timestamps never match (SQL semantics)") {
    val facts = Seq(
      (1L, Option("u"), Option(5L)),   // normal
      (2L, None, Option(5L)),          // NULL key → no match possible
      (3L, Option("u"), None)          // NULL ts → `NULL >= x` is never true
    ).toDF("id", "k", "ts")
    val states = Seq(
      (Option("u"), Option(3L), "a"),
      (Option("u"), None, "nullts"),   // unmatched-able: would sort first and leak
      (None, Option(1L), "nullkey")
    ).toDF("k", "ts", "s")
    val out = AsOfJoin.backward(facts, states, Seq("k"), "ts", "ts", Seq("s"))
      .select("id", "s").collect().map(r => (r.getLong(0), r.get(1))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a"), (2L, null), (3L, null)))
  }

  test("asof backward: colliding payload/left column names are rejected") {
    val facts = Seq((1L, "u", 5L, "x")).toDF("id", "k", "ts", "s")
    val states = Seq(("u", 3L, "a")).toDF("k", "ts", "s")
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(facts, states, Seq("k"), "ts", "ts", Seq("s"))
    }
  }

  test("interval overlap: matches the naive theta join, once per pair, " +
    "no nested loop") {
    val l = Seq((1L, 0L, 10L), (2L, 5L, 6L), (3L, 20L, 21L), (4L, 8L, 8L))
      .toDF("lid", "ls", "le") // 4: empty interval
    val r = Seq((10L, 9L, 25L), (11L, 0L, 1L), (12L, 10L, 12L))
      .toDF("rid", "rs", "re")
    val got = RangeJoin.intervalOverlap(l, "ls", "le", r, "rs", "re",
      "lid", "rid", bucketWidth = 3)
    val pairs = got.select("lid", "rid").collect()
      .map(row => (row.getLong(0), row.getLong(1)))
    // naive: [0,10)x[9,25) ✓, [0,10)x[0,1) ✓, [20,21)x[9,25) ✓;
    // [0,10)x[10,12) touch but half-open → no; empty [8,8) → no
    assert(pairs.sorted.toSeq == Seq((1L, 10L), (1L, 11L), (3L, 10L)),
      "exact overlap set, each pair exactly once despite multi-bucket " +
        "intersections")
    val p = got.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("Cartesian"),
      s"interval overlap must bucket-join, not nested-loop:\n$p")
  }

  test("range join: empty or inverted ranges produce no buckets") {
    val facts = Seq((1L, 30L)).toDF("id", "p")
    val ranges = Seq(("empty", 30L, 30L), ("inverted", 1000L, 0L))
      .toDF("r", "s", "e")
    val withBuckets = RangeJoin.pointInRange(facts, "p", ranges, "s", "e", 10L)
    assert(withBuckets.count() == 0L)
  }

  test("domainFilter: unparseable URLs fail closed, hosts match case-insensitively") {
    import graft.operators.Curation
    val docs = Seq(
      (1L, "https://good.example.com/a"),
      (2L, "https://SPAM.example.com/b"), // uppercase variant of blocked host
      (3L, "not a url at all")            // NULL host → dropped, not kept
    ).toDF("doc_id", "url")
    val kept = Curation.domainFilter(docs, "url", Seq("spam.example.com"))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L))
  }
}

package graft

import graft.operators.Funnel

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  test("stageReached enforces strict in-order progression") {
    val events = Seq(
      // u1 completes the funnel in order
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // u2: purchase BEFORE any view — only stage 1 (the later view)
      (2L, 5L, "purchase"), (2L, 10L, "view"),
      // u3: click before view → view only
      (3L, 5L, "click"), (3L, 10L, "view"),
      // u4: no funnel events at all
      (4L, 1L, "error"),
      // u5: click at the SAME ts as view — strictly-after ⇒ not counted
      (5L, 10L, "view"), (5L, 10L, "click"),
      // u6: second view earlier than click; earliest view governs
      (6L, 20L, "view"), (6L, 5L, "view"), (6L, 10L, "click")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.stageReached(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 0, 5L -> 1, 6L -> 2))
  }
}

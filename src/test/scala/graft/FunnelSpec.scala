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

  test("stageReachedWithin cuts conversions outside the window") {
    val events = Seq(
      // u1 converts view→click in 50s, click→purchase in 50s: stage 3
      (1L, 10L, "view"), (1L, 60L, "click"), (1L, 110L, "purchase"),
      // u2: click 200s after view — outside the 100s window → stage 1
      (2L, 10L, "view"), (2L, 210L, "click"),
      // u3: click exactly AT the boundary (inclusive) → stage 2
      (3L, 10L, "view"), (3L, 110L, "click"),
      // u4: purchase within window of a click that itself was too late
      (4L, 10L, "view"), (4L, 500L, "click"), (4L, 510L, "purchase")
    ).map { case (u, t, e) =>
      (u, new java.sql.Timestamp(t * 1000L), e)
    }.toDF("user_id", "ts", "event_type")
    val got = Funnel.stageReachedWithin(events, "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"),
        maxGapSeconds = 100L)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 1))
  }

  test("transitionCounts: deterministic tie order, first events emit nothing") {
    val events = Seq(
      // u1: a→b→b ; same-ts tie between (2,b) and (3,b)? use distinct ids
      (1L, 10L, 100L, "a"), (1L, 20L, 101L, "b"), (1L, 20L, 102L, "b"),
      // u2: single event — no transitions
      (2L, 10L, 200L, "a"),
      // u3: b→a
      (3L, 10L, 300L, "b"), (3L, 15L, 301L, "a")
    ).map { case (u, t, id, e) =>
      (u, new java.sql.Timestamp(t * 1000L), id, e)
    }.toDF("user_id", "ts", "event_id", "event_type")
    val got = Funnel.transitionCounts(events, "user_id", "ts",
        "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(("a", "b") -> 1L, ("b", "b") -> 1L, ("b", "a") -> 1L))
  }

  test("cohortRetention cohorts by first-activity Monday, offsets in weeks") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // u1: first active Tue wk of Jan 1 (Mon), back in wk+1 and wk+3
      (1L, ts("2024-01-02 10:00:00")), (1L, ts("2024-01-09 10:00:00")),
      (1L, ts("2024-01-24 10:00:00")),
      // u2: same cohort week, never returns; two events same week dedup
      (2L, ts("2024-01-03 10:00:00")), (2L, ts("2024-01-05 10:00:00")),
      // u3: cohort wk of Jan 8, back in wk+1
      (3L, ts("2024-01-08 00:00:00")), (3L, ts("2024-01-14 23:59:59")),
      (3L, ts("2024-01-15 00:00:00"))
    ).toDF("user_id", "ts")
    val got = Funnel.cohortRetention(events, "user_id", "ts")
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("2024-01-01", 0) -> 2L, ("2024-01-01", 1) -> 1L,
      ("2024-01-01", 3) -> 1L,
      ("2024-01-08", 0) -> 1L, ("2024-01-08", 1) -> 1L))
  }
}

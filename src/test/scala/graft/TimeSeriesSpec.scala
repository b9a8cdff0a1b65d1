package graft

import java.sql.Timestamp

import graft.operators.{TextAnalysis, TimeSeries}

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gapFill: dense grid, exact bucket sums, forward fill across gaps") {
    val events = Seq(
      // key a: day 1 two events (sum), day 3 one event, days 2/4 gaps
      ("a", ts("2024-01-01 10:00:00"), 1.5),
      ("a", ts("2024-01-01 23:59:59"), 2.0),
      ("a", ts("2024-01-03 00:00:00"), 7.0),
      // key b: appears only on day 4 — leading gaps stay NULL
      ("b", ts("2024-01-04 12:00:00"), 9.0)
    ).toDF("k", "ts", "v")
    val out = TimeSeries.gapFill(events, "k", "ts", "v", 86400L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (Option(r.get(2)), Option(r.get(3)), r.getBoolean(4)))
      .toMap
    val day1 = ts("2024-01-01 00:00:00").getTime / 1000
    def d(n: Int) = day1 + (n - 1) * 86400L
    // grid is global min..max → 4 days × 2 keys = 8 rows
    assert(out.size == 8)
    assert(out(("a", d(1))) == (Some(3.5), Some(3.5), true))
    assert(out(("a", d(2))) == (None, Some(3.5), false)) // gap, filled
    assert(out(("a", d(3))) == (Some(7.0), Some(7.0), true))
    assert(out(("a", d(4))) == (None, Some(7.0), false))
    assert(out(("b", d(1))) == (None, None, false)) // before first obs
    assert(out(("b", d(3))) == (None, None, false))
    assert(out(("b", d(4))) == (Some(9.0), Some(9.0), true))
  }

  test("gapFill drops NULL keys/timestamps; sums are partition-invariant") {
    val events = Seq(
      (Option("a"), Option(ts("2024-01-01 01:00:00")), 1.0),
      (Option.empty[String], Option(ts("2024-01-01 02:00:00")), 5.0),
      (Option("a"), Option.empty[Timestamp], 5.0)
    ).toDF("k", "ts", "v")
    val out = TimeSeries.gapFill(events, "k", "ts", "v", 86400L).collect()
    assert(out.length == 1 && out.head.getString(0) == "a" &&
      out.head.getDouble(2) == 1.0)
    val many = (0 until 1000).map(i =>
      ("k", ts(f"2024-01-01 ${i % 24}%02d:00:17"), 0.1)).toDF("k", "ts", "v")
    val a = TimeSeries.gapFill(many, "k", "ts", "v", 86400L)
      .collect().head.getDouble(2)
    val b = TimeSeries.gapFill(many.repartition(17), "k", "ts", "v", 86400L)
      .collect().head.getDouble(2)
    assert(a == b && a == 100.0, "decimal-exact sum under any partitioning")
  }

  test("tokenEntropy: 0 for one repeated token, ln(k) for uniform") {
    val docs = Seq(
      (1L, "same same same same"),            // H = 0
      (2L, "a b c d"),                        // uniform over 4 → ln 4
      (3L, "x x x y")                         // 0.75/0.25 mix
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got(1L) == ((4L, 1L, 0.0)))
    assert(got(2L)._3 == math.rint(math.log(4.0) * 1e6) / 1e6)
    val mixed = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert(math.abs(got(3L)._3 - mixed) < 1e-6)
  }

  test("oovRate: vocabulary tie-break and exact token accounting") {
    val docs = Seq(
      (1L, "apple apple banana"),      // apple:2 banana:1(+1 below)
      (2L, "banana cherry durian"),    // cherry:1 durian:1
      (3L, "")                         // zero tokens → absent from output
    ).toDF("doc_id", "text")
    // counts: apple 2, banana 2, cherry 1, durian 1 → vocab(3) takes
    // apple, banana (count desc) then cherry (tie broken alphabetically)
    val out = TextAnalysis.oovRate(docs, "doc_id", "text", vocabSize = 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out.size == 2)
    assert(out(1L) == ((3L, 0L, 0.0)))
    assert(out(2L) == ((3L, 1L, 1.0 / 3.0))) // durian is OOV
  }

  test("ewma: sequential recurrence in order, NULL drops, alpha=1") {
    val df = Seq(
      (Some("a"), Some(3L), Some(30.0)), // arrives out of order
      (Some("a"), Some(1L), Some(10.0)),
      (Some("a"), Some(2L), Some(20.0)),
      (Some("b"), Some(1L), Some(5.0)),  // single obs → itself
      (None, Some(9L), Some(1.0)),       // NULL key dropped
      (Some("c"), None, Some(1.0)),      // NULL ord dropped → c vanishes
      (Some("a"), Some(4L), None)        // NULL value dropped
    ).toDF("k", "seq", "v")
    val out = TimeSeries.ewma(df, "k", "seq", "v", alpha = 0.5)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    // a: e1=10, e2=.5*20+.5*10=15, e3=.5*30+.5*15=22.5
    assert(out.size == 2)
    assert(out("a") == ((3L, 3L, 22.5)))
    assert(out("b") == ((1L, 1L, 5.0)))
    val last = TimeSeries.ewma(df, "k", "seq", "v", alpha = 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(last("a") == 30.0, "alpha=1 degenerates to the last value")
  }

  test("ewma is partition-invariant (fold happens inside the aggregate)") {
    val df = (1 to 500).map(i => ("k", i.toLong, (i % 97) * 0.5))
      .toDF("k", "seq", "v")
    val a = TimeSeries.ewma(df, "k", "seq", "v", 0.1)
      .collect().head.getDouble(3)
    val b = TimeSeries.ewma(df.repartition(17), "k", "seq", "v", 0.1)
      .collect().head.getDouble(3)
    assert(a == b, "bit-identical across physical layouts")
  }
}

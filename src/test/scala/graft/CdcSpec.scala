package graft

import graft.operators.Cdc

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "s", "v")

  test("cdc apply: latest change wins, D deletes, I inserts, " +
    "stale and absent-key changes are no-ops") {
    val changes = Seq(
      (1L, "U", 1L, "stale", 11.0),  // superseded by seq 2
      (1L, "U", 2L, "new", 12.0),
      (2L, "D", 1L, "b", 20.0),      // delete
      (4L, "I", 1L, "d", 40.0),      // insert
      (5L, "D", 1L, "x", 0.0)        // delete of absent key: no-op
    ).toDF("k", "op", "seq", "s", "v")
    val out = Cdc.applyCdc(base, changes, Seq("k"), "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    assert(out == Set((1L, "new", 12.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("cdc apply: a delete followed by a later insert resurrects the key") {
    val changes = Seq(
      (2L, "D", 1L, "b", 20.0),
      (2L, "I", 2L, "b2", 21.0)
    ).toDF("k", "op", "seq", "s", "v")
    val out = Cdc.applyCdc(base, changes, Seq("k"), "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    assert(out == Set((1L, "a", 10.0), (2L, "b2", 21.0), (3L, "c", 30.0)))
  }

  test("cdc apply: duplicate sequence numbers resolve deterministically " +
    "(max op/payload struct), independent of partitioning") {
    val changes = Seq(
      (1L, "U", 1L, "p", 1.0),
      (1L, "U", 1L, "q", 2.0)        // same seq: 'q' > 'p' wins, always
    ).toDF("k", "op", "seq", "s", "v")
    (1 to 3).foreach { n =>
      val out = Cdc.applyCdc(base, changes.repartition(n), Seq("k"),
        "seq", "op")
        .filter($"k" === 1L).collect().head
      assert((out.getString(1), out.getDouble(2)) == ("q", 2.0))
    }
  }

  test("cdc apply: missing changelog columns fail fast") {
    val bad = Seq((1L, "U", 1L)).toDF("k", "op", "seq")
    assertThrows[IllegalArgumentException] {
      Cdc.applyCdc(base, bad, Seq("k"), "seq", "op")
    }
  }

  test("snapshot merge ≡ full recompute over any batch split") {
    val rows = (1 to 300).map(i => (s"g${i % 7}", i * 1.01))
      .toDF("grp", "v")
    def full(df: org.apache.spark.sql.DataFrame) =
      Cdc.aggregateSnapshot(df, Seq("grp"), Seq("v"))
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2)))
        .toMap
    val expected = full(rows)
    // three uneven increments, including one introducing no new keys
    val s1 = Cdc.aggregateSnapshot(rows.limit(100), Seq("grp"), Seq("v"))
    val s2 = Cdc.aggregateSnapshot(
      rows.offset(100).limit(50), Seq("grp"), Seq("v"))
    val s3 = Cdc.aggregateSnapshot(rows.offset(150), Seq("grp"), Seq("v"))
    val merged = Cdc.mergeSnapshots(
      Cdc.mergeSnapshots(s1, s2, Seq("grp"), Seq("v")),
      s3, Seq("grp"), Seq("v"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2)))
      .toMap
    assert(merged == expected)
  }

  test("snapshot merge: NULL group key stays ONE group; all-NULL sums stay NULL") {
    val a = Cdc.aggregateSnapshot(
      Seq((Option("x"), Option(1.0)), (Option.empty[String], Option(2.0)))
        .toDF("grp", "v"), Seq("grp"), Seq("v"))
    val b = Cdc.aggregateSnapshot(
      Seq((Option.empty[String], Option(3.0)),
        (Option("y"), Option.empty[Double]))
        .toDF("grp", "v"), Seq("grp"), Seq("v"))
    val m = Cdc.mergeSnapshots(a, b, Seq("grp"), Seq("v"))
      .collect()
      .map(r => Option(r.getString(0)) ->
        (r.getLong(1), Option(r.getDecimal(2)).map(_.doubleValue)))
      .toMap
    assert(m.size == 3, s"NULL key must merge into one row: $m")
    assert(m(None) == ((2L, Some(5.0))), "NULL-key sums combine")
    assert(m(Some("y")) == ((1L, None)),
      "a key whose values are all NULL keeps a NULL sum (SQL semantics)")
    assert(m(Some("x")) == ((1L, Some(1.0))))
  }

  test("snapshot merge: disjoint and empty sides keep identity") {
    val a = Cdc.aggregateSnapshot(
      Seq(("x", 1.0), ("x", 2.0)).toDF("grp", "v"), Seq("grp"), Seq("v"))
    val b = Cdc.aggregateSnapshot(
      Seq(("y", 5.0)).toDF("grp", "v"), Seq("grp"), Seq("v"))
    val empty = Cdc.aggregateSnapshot(
      Seq.empty[(String, Double)].toDF("grp", "v"), Seq("grp"), Seq("v"))
    val ab = Cdc.mergeSnapshots(a, b, Seq("grp"), Seq("v"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2).doubleValue))
      .toMap
    assert(ab == Map("x" -> ((2L, 3.0)), "y" -> ((1L, 5.0))))
    val aEmpty = Cdc.mergeSnapshots(a, empty, Seq("grp"), Seq("v"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2).doubleValue))
      .toMap
    assert(aEmpty == Map("x" -> ((2L, 3.0))))
  }

  test("scd2: consecutive equal attrs collapse, intervals chain, " +
    "last version is current") {
    val log = Seq(
      (1L, 1L, "a"), (1L, 2L, "a"), (1L, 3L, "b"), (1L, 4L, "a"),
      (2L, 1L, "x")
    ).toDF("k", "ts", "attr")
    val out = Cdc.scdType2(log, Seq("k"), Seq("ts"), Seq("attr"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
      .toSet
    assert(out == Set(
      (1L, "a", 1L, Some(3L), false),
      (1L, "b", 3L, Some(4L), false),
      (1L, "a", 4L, None, true),   // a reappears = a NEW version
      (2L, "x", 1L, None, true)))
  }

  test("scd2: NULL attr values are versioned null-safely") {
    val log = Seq(
      (1L, 1L, Option("a")), (1L, 2L, None), (1L, 3L, None),
      (1L, 4L, Option("a"))
    ).toDF("k", "ts", "attr")
    val out = Cdc.scdType2(log, Seq("k"), Seq("ts"), Seq("attr"))
    // a → null → a: three versions (null run collapses to one)
    assert(out.count() == 3)
  }

  test("scd2: result is invariant to input partitioning") {
    val log = (1L to 500L).map(i =>
      (i % 20, i, s"v${(i / 37) % 3}")).toDF("k", "ts", "attr")
    val one = Cdc.scdType2(log.coalesce(1), Seq("k"), Seq("ts"), Seq("attr"))
      .collect().map(_.toSeq).toSet
    val many = Cdc.scdType2(log.repartition(11), Seq("k"), Seq("ts"),
      Seq("attr")).collect().map(_.toSeq).toSet
    assert(one == many && one.nonEmpty)
  }

  test("scd2 incremental apply == full-log rebuild (strictly-later batch)") {
    val full = (1L to 600L).map(i =>
      (i % 25, i, s"v${(i / 29) % 4}")).toDF("k", "ts", "attr")
    val oldLog = full.filter($"ts" <= 400)
    val batch = full.filter($"ts" > 400)
    val incremental = Cdc.scdType2Apply(
      Cdc.scdType2(oldLog, Seq("k"), Seq("ts"), Seq("attr")),
      batch, Seq("k"), Seq("ts"), Seq("attr"))
      .collect().map(_.toSeq).toSet
    val rebuild = Cdc.scdType2(full, Seq("k"), Seq("ts"), Seq("attr"))
      .collect().map(_.toSeq).toSet
    assert(incremental == rebuild && rebuild.nonEmpty)
  }

  test("scd2 incremental apply: untouched keys pass through, late data " +
    "fails loudly") {
    val hist = Cdc.scdType2(
      Seq((1L, 1L, "a"), (1L, 5L, "b"), (2L, 3L, "x")).toDF("k", "ts", "attr"),
      Seq("k"), Seq("ts"), Seq("attr"))
    // batch touches only key 1; key 2's history must come back verbatim
    val out = Cdc.scdType2Apply(hist,
      Seq((1L, 9L, "c")).toDF("k", "ts", "attr"), Seq("k"), Seq("ts"),
      Seq("attr"))
    assert(out.filter($"k" === 2).collect().map(_.toSeq).toSet ==
      hist.filter($"k" === 2).collect().map(_.toSeq).toSet)
    assert(out.filter($"k" === 1 && $"is_current").head.getString(1) == "c")
    // ts=4 is before key 1's last version (ts=5) → reject. The guard
    // is plan-embedded (r15): it raises when the result materializes.
    val late = intercept[Exception] {
      Cdc.scdType2Apply(hist,
        Seq((1L, 4L, "z")).toDF("k", "ts", "attr"), Seq("k"), Seq("ts"),
        Seq("attr")).collect()
    }
    assert(late.getMessage.contains("full-log rebuild") ||
      Option(late.getCause).exists(_.getMessage.contains("full-log rebuild")))
  }

  test("scd2 incremental apply == rebuild under duplicate order values " +
    "(tiebreak column)") {
    // duplicate (k, ts) pairs: the tiebreak id orders them; history
    // replay must preserve the build order of equal-valid_from versions
    val full = Seq(
      (1L, 10L, 1L, "a"), (1L, 10L, 2L, "b"), (1L, 20L, 3L, "b"),
      (1L, 30L, 4L, "c"), (2L, 10L, 5L, "x"), (2L, 30L, 6L, "y"),
      (2L, 30L, 7L, "z")).toDF("k", "ts", "id", "attr")
    val oldLog = full.filter($"ts" <= 20)
    val batch = full.filter($"ts" > 20)
    val incremental = Cdc.scdType2Apply(
      Cdc.scdType2(oldLog, Seq("k"), Seq("ts", "id"), Seq("attr")),
      batch, Seq("k"), Seq("ts", "id"), Seq("attr"))
      .collect().map(_.toSeq).toSet
    val rebuild = Cdc.scdType2(full, Seq("k"), Seq("ts", "id"), Seq("attr"))
      .collect().map(_.toSeq).toSet
    assert(incremental == rebuild && rebuild.nonEmpty)
  }

  test("point-in-time join: colliding fact/history column names fail " +
    "loudly") {
    val hist = Cdc.scdType2(
      Seq((1L, 1L, "a"), (1L, 5L, "b")).toDF("k", "ts", "attr"),
      Seq("k"), Seq("ts"), Seq("attr"))
    val facts = Seq((1L, 3L, "keep")).toDF("k", "ts", "valid_from")
    val e = intercept[IllegalArgumentException] {
      Cdc.pointInTimeJoin(facts, hist, Seq("k"), "ts")
    }
    assert(e.getMessage.contains("collide"))
  }
}

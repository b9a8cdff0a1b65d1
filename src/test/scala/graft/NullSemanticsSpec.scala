package graft

import org.apache.spark.sql.functions._

/** NULL-handling parity with the reference's qtest corpus semantics
  * (join keys never match on NULL, NULL forms its own group, aggregates
  * skip NULLs, IN/NOT IN three-valued logic, null-safe equal `<=>`).
  * Oracle: independently computed Scala-collection results over the same
  * inline fixture — the unit-level analogue of the src/src1 fixtures
  * (data/scripts/q_test_init.sql:7-22, src1 contains empty keys). */
class NullSemanticsSpec extends SparkSpec {
  import spark.implicits._

  // kv fixture with NULL keys, empty-string keys (distinct from NULL!),
  // duplicate keys, and NULL values — the src1 shape
  private val left: Seq[(Option[String], Option[Int])] = Seq(
    Some("a") -> Some(1), Some("a") -> Some(2), Some("b") -> Some(3),
    Some("") -> Some(4), None -> Some(5), None -> None, Some("c") -> None)
  private val right: Seq[(Option[String], Option[Int])] = Seq(
    Some("a") -> Some(10), Some("") -> Some(20), None -> Some(30),
    Some("d") -> Some(40))

  private lazy val l = left.toDF("k", "v")
  private lazy val r = right.toDF("k", "w")

  test("inner join: NULL keys never match (empty string does)") {
    val got = l.join(r, l("k") === r("k")).select(l("k"), $"v", $"w")
      .collect().map(x => (x.getString(0), x.get(1), x.get(2))).toSet
    val expected = (for {
      (lk, lv) <- left; (rk, rv) <- right
      if lk.isDefined && lk == rk
    } yield (lk.get, lv.map(Int.box).orNull, rv.map(Int.box).orNull)).toSet
    assert(got == expected)
    assert(got.exists(_._1 == ""), "empty string must join")
    assert(!got.exists(_._1 == null), "NULL must not join")
  }

  test("null-safe equal <=> matches NULLs to each other") {
    val got = l.join(r, l("k") <=> r("k")).count()
    val expected = (for {
      (lk, _) <- left; (rk, _) <- right if lk == rk
    } yield 1).size
    assert(got == expected)
    assert(got > l.join(r, l("k") === r("k")).count())
  }

  test("GROUP BY: NULL forms its own single group") {
    val got = l.groupBy("k").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .collect().map(x => (Option(x.getString(0)), x.getLong(1),
        Option(x.get(2)))).toSet
    val expected = left.groupBy(_._1).map { case (k, rows) =>
      val vs = rows.flatMap(_._2)
      (k, rows.size.toLong,
        if (vs.isEmpty) None else Some(vs.map(_.toLong).sum))
    }.toSet
    assert(got == expected)
    assert(got.exists(g => g._1.isEmpty && g._2 == 2L),
      "both NULL-key rows land in one group")
  }

  test("aggregates skip NULLs: count(col) < count(*), avg ignores NULLs") {
    val row = l.agg(count(lit(1)), count($"v"), avg($"v"), sum($"v"))
      .collect().head
    val vs = left.flatMap(_._2)
    assert(row.getLong(0) == left.size)
    assert(row.getLong(1) == vs.size)
    assert(math.abs(row.getDouble(2) - vs.sum.toDouble / vs.size) < 1e-12)
    assert(row.getLong(3) == vs.sum)
  }

  test("count(DISTINCT col) ignores NULL; SELECT DISTINCT keeps it") {
    assert(l.agg(countDistinct($"k")).collect().head.getLong(0) ==
      left.flatMap(_._1).distinct.size)
    assert(l.select($"k").distinct().count() ==
      left.map(_._1).distinct.size) // NULL is one distinct row
  }

  test("IN / NOT IN three-valued logic with NULL in the list") {
    // k NOT IN ('a', NULL) is never TRUE (UNKNOWN for non-matches)
    val notIn = l.filter(!$"k".isin("a", null)).count()
    assert(notIn == 0, "NOT IN with NULL list member filters everything")
    val in = l.filter($"k".isin("a", null)).count()
    assert(in == left.count(_._1.contains("a")),
      "IN matches only the non-NULL member")
  }

  test("WHERE NULL-comparison drops rows (no NULL = NULL match)") {
    assert(l.filter($"k" === lit(null)).count() == 0)
    assert(l.filter($"k".isNull).count() == left.count(_._1.isEmpty))
  }

  test("order by puts NULLs first ascending, last descending (Hive default)") {
    val asc = l.orderBy($"k".asc).select("k").collect().map(_.getString(0))
    assert(asc.take(2).forall(_ == null))
    val desc = l.orderBy($"k".desc).select("k").collect().map(_.getString(0))
    assert(desc.takeRight(2).forall(_ == null))
  }

  test("coalesce/nvl/nullif chain") {
    val got = l.select(coalesce($"v", lit(-1)).as("c")).collect()
      .map(_.getInt(0)).sorted.toSeq
    assert(got == left.map(_._2.getOrElse(-1)).sorted)
  }
}

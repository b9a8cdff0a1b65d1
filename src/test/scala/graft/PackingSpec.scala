package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._
import scala.util.Random

/** Corpus-shaping operators: chunking, token-budget sharding (distributed
  * prefix sum), greedy sequence packing. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, nTokens: Int): (Long, String) =
    (id, (1 to nTokens).map(i => s"t$i").mkString(" "))

  test("chunk covers every token with the configured overlap") {
    val df = Seq(doc(1, 100)).toDF("doc_id", "text")
    val rows = Packing.chunk(df, "doc_id", "text", 32, 24)
      .orderBy("chunk_id").collect()
    // starts 0,24,48,72 then 96 would exceed; ceil((100-32)/24)=3 → 4 chunks
    assert(rows.length == 4)
    assert(rows.map(_.getAs[Long]("n_tokens")).toSeq == Seq(32, 32, 32, 28))
    // consecutive chunks share exactly 8 tokens (32 - 24)
    val c0 = rows(0).getAs[String]("chunk_text").split(" ")
    val c1 = rows(1).getAs[String]("chunk_text").split(" ")
    assert(c0.takeRight(8).sameElements(c1.take(8)))
    // full coverage: union of chunk tokens = original token set
    val all = rows.flatMap(_.getAs[String]("chunk_text").split(" ")).toSet
    assert(all == (1 to 100).map(i => s"t$i").toSet)
  }

  test("chunk: short doc yields one chunk; blank or NULL text yields none") {
    val df = Seq(doc(1, 5), (2L, "   "), (3L, ""))
      .toDF("doc_id", "text")
      .union(Seq((4L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val rows = Packing.chunk(df, "doc_id", "text", 32, 24).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("doc_id") == 1L)
    assert(rows.head.getAs[Long]("n_tokens") == 5L)
  }

  test("chunk: stride == chunk gives disjoint exact partitioning") {
    val df = Seq(doc(1, 96)).toDF("doc_id", "text")
    val rows = Packing.chunk(df, "doc_id", "text", 32, 32).collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[Long]("n_tokens") == 32L))
    val total = rows.flatMap(_.getAs[String]("chunk_text").split(" "))
    assert(total.length == 96 && total.toSet.size == 96)
  }

  test("withTokensBefore matches a sequential prefix sum at any partitioning") {
    val rnd = new Random(7)
    val data = (1L to 997L).map(id => (id, rnd.nextInt(50).toLong + 1))
    val expected = data.scanLeft(0L)(_ + _._2).init // exclusive prefix
    for (parts <- Seq(1, 3, 32)) {
      val df = spark.createDataFrame(data).toDF("id", "n")
        .repartition(parts)
      val got = Packing.withTokensBefore(df, "id", "n")
        .orderBy("id").select("tokens_before")
        .collect().map(_.getLong(0)).toSeq
      assert(got == expected, s"parts=$parts")
    }
  }

  test("shardByTokenBudget: shards hold consecutive runs near the budget") {
    val data = (1L to 200L).map(id => (id, 10L))
    val df = spark.createDataFrame(data).toDF("id", "n")
    val rows = Packing.shardByTokenBudget(df, "id", "n", 100)
      .orderBy("id").collect()
    // 10 tokens each, budget 100 → exactly 10 docs per shard
    assert(rows.map(_.getAs[Long]("shard")).toSeq ==
      (0L until 200L).map(_ / 10))
    // shard ids contiguous in id order (monotone non-decreasing)
    val shards = rows.map(_.getAs[Long]("shard"))
    assert(shards.zip(shards.tail).forall { case (a, b) => b >= a })
  }

  test("packGreedy matches the sequential reference on random data") {
    val rnd = new Random(13)
    val data = (1L to 500L).map { id =>
      (s"g${id % 7}", id, rnd.nextInt(120).toLong + 1)
    }
    val budget = 300L
    val df = spark.createDataFrame(data).toDF("g", "id", "n")
    val got = Packing.packGreedy(df, "g", "id", "n", budget)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getAs[Long]("bin"))
      .toMap
    // sequential reference per group
    data.groupBy(_._1).foreach { case (g, rowsG) =>
      var bin = 0L; var fill = 0L; var first = true
      rowsG.sortBy(_._2).foreach { case (_, id, n) =>
        if (first) { first = false; fill = n }
        else if (fill + n <= budget) fill += n
        else { bin += 1; fill = n }
        assert(got((g, id)) == bin, s"doc $g/$id")
      }
    }
  }

  test("packGreedy invariants: fill bound, conservation, oversized isolation") {
    val data = Seq(
      ("a", 1L, 100L), ("a", 2L, 900L), ("a", 3L, 100L), ("a", 4L, 150L),
      ("b", 1L, 50L), ("b", 2L, 50L))
    val budget = 200L
    val out = Packing.packGreedy(
      spark.createDataFrame(data).toDF("g", "id", "n"), "g", "id", "n",
      budget).collect()
    assert(out.length == data.length) // every doc lands exactly once
    // the oversized doc (900 > budget) sits alone in its bin
    val binOf = out.map(r => (r.getString(0), r.getLong(1)) ->
      r.getAs[Long]("bin")).toMap
    val big = binOf(("a", 2L))
    assert(out.count(r => r.getString(0) == "a" &&
      r.getAs[Long]("bin") == big) == 1)
    // every bin without an oversized doc fills to <= budget
    out.groupBy(r => (r.getString(0), r.getAs[Long]("bin"))).foreach {
      case (_, rows) =>
        val tot = rows.map(_.getAs[Long]("n")).sum
        assert(tot <= budget || rows.length == 1)
    }
  }
}

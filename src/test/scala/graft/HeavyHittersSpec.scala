package graft

import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime: capacity >= distinct items reproduces groupBy counts") {
    val items = (Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(10)("c"))
    val df = items.toDF("item").repartition(7)
    val got = HeavyHitters.topK(df, col("item"), k = 3, capacity = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 40L, 0L), ("b", 25L, 0L), ("c", 10L, 0L)))
  }

  test("eviction regime: a dominant item survives tight capacity with est >= true") {
    val rnd = new scala.util.Random(7)
    val cold = Seq.tabulate(500)(i => s"cold${rnd.nextInt(50)}")
    val items = rnd.shuffle(Seq.fill(1000)("hot") ++ cold)
    val df = items.toDF("item").repartition(5)
    val top = HeavyHitters.topK(df, col("item"), k = 1, capacity = 8)
      .collect().head
    assert(top.getString(0) == "hot", s"dominant item must be retained: $top")
    // space-saving estimates over-count: est >= true occurrences
    assert(top.getLong(1) >= 1000L, s"estimate must upper-bound the true count: $top")

    // the min-credit merge preserves est >= true for EVERY retained item
    val trueCounts = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    HeavyHitters.topK(df, col("item"), k = 8, capacity = 8).collect()
      .foreach { r =>
        val (item, est) = (r.getString(0), r.getLong(1))
        assert(est >= trueCounts(item),
          s"$item: est $est < true ${trueCounts(item)}")
      }
  }

  test("space_saving resolves from SQL with a literal capacity") {
    Seq("x", "x", "y").toDF("item").createOrReplaceTempView("hh_in")
    val arr = spark.sql(
      "SELECT space_saving(item, 4) AS sk FROM hh_in").collect().head
      .getSeq[org.apache.spark.sql.Row](0)
    assert(arr.head.getString(0) == "x" && arr.head.getLong(1) == 2L)
    assert(arr(1).getString(0) == "y" && arr(1).getLong(1) == 1L)
  }

  test("serialized buffers merge across partitions without losing mass (exact regime)") {
    val df = (1 to 1000).map(i => s"k${i % 20}").toDF("item").repartition(32)
    val total = HeavyHitters.topK(df, col("item"), k = 20, capacity = 64)
      .agg(sum("count_est")).collect().head.getLong(0)
    assert(total == 1000L, "sum of exact-regime estimates must equal row count")
  }

  test("topKPerGroup ranks within each group independently (exact regime)") {
    // g1: a×3, b×2, c×1; g2: z×4, a×1
    val rows = Seq.fill(3)(("g1", "a")) ++ Seq.fill(2)(("g1", "b")) ++
      Seq(("g1", "c")) ++ Seq.fill(4)(("g2", "z")) :+ (("g2", "a"))
    val got = HeavyHitters.topKPerGroup(rows.toDF("g", "item"), "g",
        col("item"), k = 2, capacity = 16)
      .collect()
      .map(r => (r.getString(0), r.getInt(4)) ->
        (r.getString(1), r.getLong(2)))
      .toMap
    assert(got == Map(
      ("g1", 1) -> (("a", 3L)), ("g1", 2) -> (("b", 2L)),
      ("g2", 1) -> (("z", 4L)), ("g2", 2) -> (("a", 1L))))
  }
}

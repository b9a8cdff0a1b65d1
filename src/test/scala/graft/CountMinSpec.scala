package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}

import graft.functions.{CountMinAgg, CountMinEstimate, CountMinFunctions}

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def cmBuild(c: org.apache.spark.sql.Column, w: Int, d: Int) =
    toCol(CountMinAgg(toExpr(c), w, d).toAggregateExpression())
  private def cmEst(f: org.apache.spark.sql.Column,
      v: org.apache.spark.sql.Column) =
    toCol(CountMinEstimate(toExpr(f), toExpr(v)))

  test("wide sketch with few keys is exact; estimates never underestimate") {
    // zipf-ish: key i occurs i times
    val rows = (1 to 40).flatMap(i => Seq.fill(i)(s"key_$i"))
    val (w, d) = CountMinFunctions.optimalParams(0.001, 0.01)
    val sketch = rows.toDF("v").repartition(16)
      .agg(cmBuild(col("v"), w, d).as("f")).head().getAs[Array[Byte]](0)
    val got = (1 to 40).map(i =>
      i -> CountMinFunctions.estimate(sketch,
        org.apache.spark.unsafe.types.UTF8String.fromString(s"key_$i")))
    // at w=2719 and 40 keys, collisions are overwhelmingly unlikely in
    // EVERY one of the d rows simultaneously — the min is exact
    got.foreach { case (i, e) => assert(e == i.toLong, s"key_$i") }
  }

  test("one-sided error: est >= true, and <= true + eps*N on heavy load") {
    val rnd = new scala.util.Random(7)
    // 20k draws over 500 keys with a skewed distribution -> collisions
    val draws = Seq.fill(20000)(s"k${rnd.nextInt(rnd.nextInt(499) + 1)}")
    val truth = draws.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val eps = 0.01
    val (w, d) = CountMinFunctions.optimalParams(eps, 0.01)
    val sketch = draws.toDF("v").repartition(8)
      .agg(cmBuild(col("v"), w, d).as("f")).head().getAs[Array[Byte]](0)
    val n = draws.size.toLong
    var overBudget = 0
    truth.foreach { case (k, t) =>
      val e = CountMinFunctions.estimate(sketch,
        org.apache.spark.unsafe.types.UTF8String.fromString(k))
      assert(e >= t, s"underestimate at $k: $e < $t")
      if (e > t + (eps * n).toLong) overBudget += 1
    }
    // the eps*N bound holds per-key with prob 1-delta; allow delta
    // slack ×5 for the fixed seed
    assert(overBudget <= math.max(1, (0.05 * truth.size).toInt),
      s"$overBudget of ${truth.size} keys exceed the eps*N budget")
  }

  test("sketch bytes are partition-invariant (merge = element-wise add)") {
    val df = (0 until 5000).map(i => s"v${i % 37}").toDF("v")
    def build(d: org.apache.spark.sql.DataFrame): Seq[Byte] =
      d.agg(cmBuild(col("v"), 271, 5)).head().getAs[Array[Byte]](0).toSeq
    assert(build(df.coalesce(1)) == build(df.repartition(32)))
  }

  test("integral keys normalize to long: int build, bigint probe agree") {
    val sketch = (0 until 100).flatMap(i => Seq.fill(3)(i)).toDF("v")
      .agg(cmBuild(col("v"), 2719, 5)).head().getAs[Array[Byte]](0)
    assert((0L until 100L).forall(i =>
      CountMinFunctions.estimate(sketch, i) == 3L))
  }

  test("SQL surface: cm_build / cm_estimate / cm_merge") {
    Seq("a", "a", "b").toDF("v").createOrReplaceTempView("cm_left")
    Seq("b", "c").toDF("v").createOrReplaceTempView("cm_right")
    val out = spark.sql("""
      WITH l AS (SELECT cm_build(v, 271, 5) AS f FROM cm_left),
           r AS (SELECT cm_build(v, 271, 5) AS f FROM cm_right)
      SELECT probe.v, cm_estimate(cm_merge(l.f, r.f), probe.v) AS est
      FROM l, r,
        (SELECT 'a' AS v UNION ALL SELECT 'b' UNION ALL SELECT 'c'
         UNION ALL SELECT 'zq') probe
      ORDER BY probe.v""")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 2L, "b" -> 2L, "c" -> 1L, "zq" -> 0L))
  }

  test("mismatched sketch shapes refuse to merge") {
    val e = intercept[Exception] {
      CountMinFunctions.merge(
        new graft.functions.GraftCountMin(5, 100).serialize(),
        new graft.functions.GraftCountMin(5, 200).serialize())
    }
    assert(e.getMessage.contains("different shape"))
  }
}

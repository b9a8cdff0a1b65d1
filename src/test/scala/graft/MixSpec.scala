package graft

import org.apache.spark.sql.functions._

import graft.operators.Mix

class MixSpec extends SparkSpec {
  import spark.implicits._

  test("klDrift matches hand-computed KL against the global distribution") {
    // slice A: x×2 y×2 (p = .5/.5); slice B: x×4 (p = 1/0)
    // global: x:6 y:2 of 8 (q = .75/.25)
    val df = (Seq.fill(2)(("A", "x")) ++ Seq.fill(2)(("A", "y")) ++
      Seq.fill(4)(("B", "x"))).toDF("src", "k")
    val out = Mix.klDrift(df, "src", "k").orderBy("src").collect()
    val klA = 0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)
    val klB = 1.0 * math.log(1.0 / 0.75)
    assert(out.map(_.getString(0)).toSeq == Seq("A", "B"))
    assert(out.map(_.getLong(1)).toSeq == Seq(4L, 4L))
    assert(math.abs(out(0).getDouble(2) - klA) < 1e-6)
    assert(math.abs(out(1).getDouble(2) - klB) < 1e-6)
  }

  test("klDrift is zero when every slice matches the global distribution") {
    val df = (Seq.fill(3)(("A", "x")) ++ Seq.fill(1)(("A", "y")) ++
      Seq.fill(6)(("B", "x")) ++ Seq.fill(2)(("B", "y"))).toDF("src", "k")
    val out = Mix.klDrift(df, "src", "k").collect()
    assert(out.forall(_.getDouble(2) == 0.0))
  }

  test("klDrift is repartition-invariant (exact decimal term sum)") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("source"), col("lang"))
    val a = Mix.klDrift(df, "source", "lang").orderBy("source").collect()
    val b = Mix.klDrift(df.repartition(13), "source", "lang")
      .orderBy("source").collect()
    assert(a.map(_.toSeq.toList).toList == b.map(_.toSeq.toList).toList)
    assert(a.nonEmpty)
  }
}

package graft

import graft.operators.Classifier
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // Linearly separable on f1: y = 1 iff f1 > 0.5
  private lazy val train = (0 until 200).map { i =>
    val f1 = (i % 100) / 100.0
    (i.toLong, f1, (i % 7) / 7.0, if (f1 > 0.5) 1 else 0)
  }.toDF("id", "f1", "f2", "y")

  test("logreg: loss decreases and separable data is classified") {
    val model = Classifier.logisticFit(
      train, "y", Seq("f1", "f2"), iters = 50, lr = 2.0)
    val scored = Classifier.logisticScore(train, model)
    val acc = scored.filter(col("label_pred") === col("y")).count() /
      scored.count().toDouble
    assert(acc >= 0.9, s"accuracy $acc")
    assert(model.weights.head > 0.0) // f1 drives the label upward
  }

  test("logreg: fit is invariant to partitioning (decimal-exact gradients)") {
    val a = Classifier.logisticFit(
      train.coalesce(1), "y", Seq("f1", "f2"), iters = 5, lr = 1.0)
    val b = Classifier.logisticFit(
      train.repartition(13), "y", Seq("f1", "f2"), iters = 5, lr = 1.0)
    assert(a.weights == b.weights && a.bias == b.bias)
  }

  test("logreg: zero-init first round moves along the mean residual") {
    // with w = 0, p = 0.5 for every row; gradient_j = mean (0.5 - y) f_j
    val model = Classifier.logisticFit(
      train, "y", Seq("f1", "f2"), iters = 1, lr = 1.0)
    val rows = train.select(
        avg((lit(0.5) - col("y")) * col("f1")),
        avg((lit(0.5) - col("y")) * col("f2")))
      .collect().head
    def r6(d: Double) =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(model.weights == Seq(r6(-rows.getDouble(0)), r6(-rows.getDouble(1))))
  }

  test("logreg: score appends prob in [0,1] and a 0/1 prediction") {
    val model = Classifier.logisticFit(
      train, "y", Seq("f1", "f2"), iters = 2, lr = 0.5)
    val scored = Classifier.logisticScore(train, model)
    assert(scored.filter(col("prob") < 0 || col("prob") > 1).count() == 0)
    assert(scored.filter(!col("label_pred").isin(0, 1)).count() == 0)
  }

  test("logreg: NULL labels/features are excluded from the fit, " +
    "all-NULL training fails loudly") {
    import spark.implicits._
    val clean = Classifier.logisticFit(
      train, "y", Seq("f1", "f2"), iters = 3, lr = 0.5)
    // appending NULL-label and NULL-feature rows must not move the fit
    val extra = Seq[(Long, Option[Double], Option[Double], Option[Int])](
      (900L, Some(1.0), Some(2.0), None),      // NULL label
      (901L, None, Some(3.0), Some(1)))        // NULL feature
      .toDF("id", "f1", "f2", "y")
    val withNulls = Classifier.logisticFit(
      train.unionByName(extra), "y", Seq("f1", "f2"), iters = 3, lr = 0.5)
    assert(clean.weights == withNulls.weights && clean.bias == withNulls.bias)
    val allNull = Seq[(Long, Option[Double], Option[Double], Option[Int])](
      (1L, None, Some(1.0), Some(1)), (2L, None, Some(2.0), Some(0)))
      .toDF("id", "f1", "f2", "y")
    val e = intercept[IllegalArgumentException] {
      Classifier.logisticFit(allNull, "y", Seq("f1", "f2"), iters = 1)
    }
    assert(e.getMessage.contains("no complete"))
  }
}

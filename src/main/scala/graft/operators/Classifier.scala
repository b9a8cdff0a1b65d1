package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed quality-classifier training: full-batch gradient-descent
  * logistic regression over engineered feature columns. The operational
  * shape behind fastText-style document-quality filters in training-data
  * curation — fit a small linear model on labeled examples, then score
  * the full 100 TB corpus with one scan. Reference counterpart: the
  * LLM-pipeline quality-scoring capability (builder brief); the
  * reference engine has no learner, so this is additive surface in the
  * same family as `Clustering`.
  *
  * Engine shape (synchronous full-batch GD, driver-steered like
  * `Clustering.lloyd` / `TextAnalysis.bpeTrain`):
  *  - Each round is ONE aggregate over the data: per-row margin
  *    z = b + w·x (a codegen'd fixed-length dot product — weights ride
  *    the task binary as literals, no join, no broadcast), then the
  *    gradient Σ (p − y)·x_j for every feature plus the bias folds
  *    map-side into d+1 decimal sums. Cost per round = one scan, one
  *    d+1-wide partial-agg shuffle — independent of row count's skew.
  *  - The collected gradient is d+1 doubles (bounded by the feature
  *    count, like bpeTrain's 1-row argmax) — the loop is driver-steered
  *    but never moves data.
  *
  * Determinism contract (repo-wide discipline): probabilities are
  * sigmoid of a double margin rounded to 6 decimals before entering the
  * gradient (cross-engine exp() differences live far below that), the
  * gradient sums are decimal-exact (order-independent under any
  * partitioning), and each weight update re-rounds to 6 decimals — so
  * every round's weight vector is bit-identical across runs, partition
  * counts, and engines, and an external SQL engine can replay the whole
  * fit round by round. */
object Classifier {

  /** Weights aligned with `featureCols`, plus the bias; `iters` rounds
    * of lr-scaled full-batch GD from a zero init. */
  final case class LogisticModel(
      featureCols: Seq[String], weights: Seq[Double], bias: Double,
      lr: Double, iters: Int)

  /** Fit by `iters` rounds of w ← w − lr·∇NLL/n (mean gradient — scale-
    * free in the row count). `labelCol` must be 0/1 (cast to double).
    * Feature values should be pre-rounded/engineered to be identical
    * across engines if the fit is to be SQL-replayable. */
  def logisticFit(
      df: DataFrame, labelCol: String, featureCols: Seq[String],
      iters: Int = 5, lr: Double = 0.5): LogisticModel = {
    require(featureCols.nonEmpty, "need at least one feature column")
    require(iters >= 1 && iters <= 1000, s"iters out of range: $iters")
    // A NULL label or feature would drop out of the decimal gradient sums
    // while still counting toward n, silently shrinking the mean gradient
    // (and an all-NULL column would NPE in the update). Train on complete
    // rows only, explicitly.
    val complete = (labelCol +: featureCols)
      .map(c => col(c).isNotNull).reduce(_ && _)
    val train = df.filter(complete)
    var weights = Seq.fill(featureCols.size)(0.0)
    var bias = 0.0
    for (_ <- 0 until iters) {
      val p = prob(featureCols, weights, bias)
      val resid = p - col(labelCol).cast("double")
      // d+1 decimal-exact sums + one count, all in a single aggregate
      val aggs =
        featureCols.map(c =>
          sum((resid * col(c).cast("double")).cast("decimal(27,12)"))
            .as(s"g_$c")) :+
          sum(resid.cast("decimal(27,12)")).as("g_bias") :+
          count(lit(1)).as("n")
      val row = train.agg(aggs.head, aggs.tail: _*).collect().head
      val n = row.getLong(featureCols.size + 1).toDouble
      require(n > 0, "logisticFit: no complete (non-NULL) training rows")
      def upd(w: Double, g: java.math.BigDecimal): Double =
        BigDecimal(w - lr * g.doubleValue / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      weights = weights.zipWithIndex.map { case (w, i) =>
        upd(w, row.getDecimal(i)) }
      bias = upd(bias, row.getDecimal(featureCols.size))
    }
    LogisticModel(featureCols, weights, bias, lr, iters)
  }

  /** Score: appends `prob` (rounded 6) and `label_pred` (p ≥ 0.5). One
    * narrow projection — the full-corpus pass is scan-speed. */
  def logisticScore(df: DataFrame, model: LogisticModel): DataFrame =
    df.withColumn("prob",
        prob(model.featureCols, model.weights, model.bias))
      .withColumn("label_pred", (col("prob") >= 0.5).cast("int"))

  /** round(sigmoid(b + Σ w_j·x_j), 6) as a literal-folded expression —
    * the left-to-right double fold is IEEE-exact and identical in any
    * engine that evaluates the same textual sum. */
  private def prob(
      featureCols: Seq[String], weights: Seq[Double], bias: Double): Column = {
    val z = featureCols.zip(weights).foldLeft(lit(bias): Column) {
      case (acc, (c, w)) => acc + lit(w) * col(c).cast("double")
    }
    round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
  }
}

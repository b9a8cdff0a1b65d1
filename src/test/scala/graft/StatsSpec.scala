package graft

import graft.operators.Stats
import org.apache.spark.sql.functions.{col, lit}

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("winsorizeByRank clips to exact rank-selected bounds") {
    // group g: values 1..20 → lo = ceil(20*0.1)=2nd smallest = 2,
    //                         hi = ceil(20*0.9)=18th smallest = 18
    val df = (1 to 20).map(v => ("g", v.toDouble)).toDF("grp", "v")
    val got = Stats.winsorizeByRank(df, "grp", "v",
        BigDecimal("0.1"), BigDecimal("0.9"))
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(got(1.0) == 2.0 && got(2.0) == 2.0)
    assert(got(19.0) == 18.0 && got(20.0) == 18.0)
    assert(got(10.0) == 10.0)
  }

  test("winsorizeByRank: decimal rank math, tied values, tiny groups") {
    // n=200, p=0.05: double 200*0.05 rounds ABOVE 10 → ceil would give
    // 11; the decimal path must select rank exactly 10
    val big = (1 to 200).map(v => ("b", v.toDouble)).toDF("grp", "v")
    val bounds = Stats.winsorizeByRank(big, "grp", "v",
        BigDecimal("0.05"), BigDecimal("0.95"))
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(bounds(1.0) == 10.0, "lo bound is the 10th smallest, not 11th")
    assert(bounds(200.0) == 190.0)
    // all-tied group: bounds equal the value, nothing changes
    val tied = Seq.fill(10)(("t", 5.0)).toDF("grp", "v")
    assert(Stats.winsorizeByRank(tied, "grp", "v",
        BigDecimal("0.1"), BigDecimal("0.9"))
      .collect().forall(r => r.getDouble(2) == 5.0))
    // single-row group: lo floored to rank 1 = hi = the value
    val one = Seq(("s", 7.0)).toDF("grp", "v")
    assert(Stats.winsorizeByRank(one, "grp", "v",
        BigDecimal("0.05"), BigDecimal("0.95"))
      .collect().head.getDouble(2) == 7.0)
  }

  test("robustScale: rank-selected median/IQR; zero-IQR group → 0") {
    // values 1..8: q1 = ceil(8*.25)=2nd = 2, med = ceil(8*.5)=4th = 4,
    // q3 = ceil(8*.75)=6th = 6 → IQR 4
    val df = (1 to 8).map(v => ("g", v.toDouble)).toDF("grp", "v")
    val got = Stats.robustScale(df, "grp", "v")
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(got(4.0) == 0.0 && got(8.0) == 1.0 && got(2.0) == -0.5)
    val tied = Seq.fill(6)(("t", 9.0)).toDF("grp", "v")
    assert(Stats.robustScale(tied, "grp", "v")
      .collect().forall(_.getDouble(2) == 0.0))
  }

  test("rankQuantiles: distributed selection path (above the sort " +
      "threshold) is exact — identical to the sort path") {
    // mixed shape: a big skewed group with heavy ties, a small group,
    // and NULLs — the cases where bracket/boundary logic can go wrong
    val rnd = new scala.util.Random(42)
    val rows =
      (1 to 40000).map(i => ("big", Some((rnd.nextInt(500) * 0.25)))) ++
      (1 to 37).map(i => ("small", Some(i * 1.0))) ++
      Seq(("big", None), ("small", None))
    val df = rows.toDF("grp", "v")
    val ps = Seq(
      ("q05", BigDecimal("0.05")), ("med", BigDecimal("0.5")),
      ("q99", BigDecimal("0.99")))
    val sorted = Stats.rankQuantiles(df, "grp", "v", ps)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    spark.conf.set("spark.graft.stats.rankSortThreshold", "100")
    try {
      val selected = Stats.rankQuantiles(df, "grp", "v", ps)
        .collect().map(r => r.getString(0) ->
          (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
      assert(selected == sorted,
        s"selection path diverged: $selected vs $sorted")
      // r15: the rankPath conf forces each path directly (skipping the
      // sizing scan) — both forced paths must equal the dispatched ones
      spark.conf.set("spark.graft.stats.rankPath", "select")
      val forcedSel = Stats.rankQuantiles(df, "grp", "v", ps)
        .collect().map(r => r.getString(0) ->
          (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
      spark.conf.set("spark.graft.stats.rankPath", "sort")
      val forcedSort = Stats.rankQuantiles(df, "grp", "v", ps)
        .collect().map(r => r.getString(0) ->
          (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
      spark.conf.unset("spark.graft.stats.rankPath")
      assert(forcedSel == sorted && forcedSort == sorted,
        s"forced rankPath diverged: sel=$forcedSel sort=$forcedSort")
      // the full winsorize/robustScale/MAD envelope rides the same
      // machinery — spot-check one composite on the selection path
      val w = Stats.robustScale(df.filter(col("v").isNotNull), "grp", "v")
      assert(w.filter(col("scaled").isNull).count() == 0)
    } finally
      spark.conf.unset("spark.graft.stats.rankSortThreshold")
  }

  test("rankQuantiles: selection-path PLAN SHAPE — no single-task " +
      "full-group sort window") {
    // The scale claim, asserted structurally: above the threshold the
    // plan must not funnel each group through one task (a Window
    // partitioned by the bare group column over the UNFILTERED input —
    // the sort path's shape). The selection path's only window ranks
    // the bracket INTERIOR, partitioned by (group, quantile).
    val df = (1 to 5000).map(i => ("g", i * 1.0)).toDF("grp", "v")
    val ps = Seq(("med", BigDecimal("0.5")))
    def finalPlan(threshold: String): String = {
      spark.conf.set("spark.graft.stats.rankSortThreshold", threshold)
      try {
        val out = Stats.rankQuantiles(df, "grp", "v", ps)
        out.collect() // finalize the adaptive plan
        out.queryExecution.executedPlan.toString
      } finally spark.conf.unset("spark.graft.stats.rankSortThreshold")
    }
    val sortPlan = finalPlan("1000000")
    assert("""windowspecdefinition\(grp#""".r.findFirstIn(sortPlan).isDefined,
      "control: the sort path windows over the bare group column")
    val selPlan = finalPlan("100")
    assert("""windowspecdefinition\(grp#""".r.findFirstIn(selPlan).isEmpty,
      "selection path must not contain a full-group sort window:\n" +
        selPlan.take(4000))
    assert("""windowspecdefinition\(__gi#""".r.findFirstIn(selPlan).isDefined,
      "selection path ranks the interior, partitioned (group, quantile)")
    assert(selPlan.contains("percentile_approx"),
      "selection path brackets ranks with the mergeable sketch")
  }

  test("zscore: exact hand-computed standardization; zero variance → 0") {
    // g1: values 2, 4, 6 → mean 4, var = (4+16+36 - 144/3)/3 = 8/3
    val df = Seq(("g1", 2.0), ("g1", 4.0), ("g1", 6.0),
      ("g2", 5.0), ("g2", 5.0)).toDF("grp", "v")
    val got = Stats.zscore(df, "grp", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    val sd = math.sqrt((56.0 - 12.0 * 12.0 / 3.0) / 3.0)
    def r6(d: Double) =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(("g1", 2.0)) == r6((2.0 - 4.0) / sd))
    assert(got(("g1", 4.0)) == 0.0)
    assert(got(("g1", 6.0)) == r6((6.0 - 4.0) / sd))
    assert(got(("g2", 5.0)) == 0.0, "zero-variance group maps to 0")
  }

  test("corrMatrix: perfect +/- correlation, constant column → NULL, " +
    "listwise NULL handling") {
    val df = Seq(
      (1.0, 2.0, -1.0, 5.0),
      (2.0, 4.0, -2.0, 5.0),
      (3.0, 6.0, -3.0, 5.0),
      (4.0, 8.0, -4.0, 5.0)
    ).toDF("a", "b", "negb", "const")
    val got = Stats.corrMatrix(df, Seq("a", "b", "negb", "const"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double]))
      .toMap
    // the one-pass formula carries last-ulp float noise; the CONTRACT is
    // cross-engine bit-equality (q196), not symbolic exactness
    assert(math.abs(got(("a", "b")).get - 1.0) < 1e-12)
    assert(math.abs(got(("a", "negb")).get + 1.0) < 1e-12)
    assert(got(("a", "const")) == None, "zero variance → NULL, not NaN")
    assert(got.size == 6)
    // a row with any NULL is excluded everywhere (listwise)
    val withNull = df.union(Seq((Option(9.0), Option.empty[Double],
      Option(1.0), Option(5.0))).toDF("a", "b", "negb", "const"))
    val got2 = Stats.corrMatrix(withNull, Seq("a", "b", "negb", "const"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double]))
      .toMap
    assert(math.abs(got2(("a", "negb")).get + 1.0) < 1e-12,
      "the NULL row must not perturb unrelated pairs")
  }

  test("paretoFrontier: dominance, ties, NULLs, partition invariance") {
    val pts = Seq(
      (1L, 5.0, 1.0), (2L, 4.0, 4.0), (3L, 1.0, 5.0), // frontier
      (4L, 3.0, 3.0),                                  // dominated by 2
      (5L, 5.0, 1.0),                                  // exact tie of 1
      (6L, 0.0, 0.0)                                   // dominated by all
    ).toDF("id", "x", "y")
    val got = Stats.paretoFrontier(pts, Seq("x", "y"))
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L, 5L), s"got $got")
    val again = Stats.paretoFrontier(pts.repartition(7), Seq("x", "y"))
      .collect().map(_.getLong(0)).toSet
    assert(again == got, "skyline is order/partitioning independent")
    // NULL dim rows are excluded
    val withNull = pts.union(Seq((7L, Option(9.0), Option.empty[Double]))
      .toDF("id", "x", "y"))
    assert(Stats.paretoFrontier(withNull, Seq("x", "y"))
      .collect().map(_.getLong(0)).toSet == got)
    // anti-correlated worst case: every point on the frontier
    val anti = (1 to 50).map(i => (i.toLong, i.toDouble, (51 - i).toDouble))
      .toDF("id", "x", "y")
    assert(Stats.paretoFrontier(anti, Seq("x", "y")).count() == 50)
  }

  test("paretoFrontier merges through a tree, not a single full-data task") {
    // anti-correlated over many partitions: nothing is ever eliminated,
    // the hardest shape for the merge phase
    val n = 20000
    val anti = spark.range(1, n + 1)
      .select($"id", $"id".cast("double").as("x"),
        (lit(n + 1).cast("double") - $"id").as("y"))
      .repartition(32)
    val out = Stats.paretoFrontier(anti, Seq("x", "y"))
    // structural: 32 local partitions fan in 8-ways → ≥ 2 shuffle levels
    // (32→4→1), so no stage coalesced the raw input straight into one
    // task; each level re-ran the local-frontier pass
    val shuffles = out.rdd.toDebugString.linesIterator
      .count(_.contains("ShuffledRDD"))
    assert(shuffles >= 2, s"expected a leveled tree merge, got:\n" +
      out.rdd.toDebugString)
    assert(out.count() == n)
    // and the correlated case still collapses to the single best point
    val corr = spark.range(1, 1001)
      .select($"id", $"id".cast("double").as("x"),
        $"id".cast("double").as("y"))
      .repartition(32)
    val best = Stats.paretoFrontier(corr, Seq("x", "y")).collect()
    assert(best.length == 1 && best.head.getLong(0) == 1000L)
  }

  test("twoSampleZ: hand-computed statistic; empty/degenerate variants → NULL") {
    // A: 2, 4 (mean 3, var 1); B: 6, 6, 6 (mean 6, var 0)
    // z = (3-6)/sqrt(1/2 + 0/3) = -3/sqrt(0.5)
    val df = Seq(("A", 2.0), ("A", 4.0), ("B", 6.0), ("B", 6.0), ("B", 6.0))
      .toDF("g", "v")
    val r = Stats.twoSampleZ(df, "g", "v", "A", "B").collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 3.0 && r.getDouble(3) == 6.0)
    assert(math.abs(r.getDouble(4) - (-3.0 / math.sqrt(0.5))) < 1e-9)
    // missing variant B → NULL z and NULL mean_b, no division error
    val one = Stats.twoSampleZ(df.filter($"g" === "A"), "g", "v", "A", "B")
      .collect().head
    assert(one.getLong(1) == 0L && one.isNullAt(3) && one.isNullAt(4))
    // both variances zero → NULL z (undefined), means still real
    val flat = Stats.twoSampleZ(
      Seq(("A", 1.0), ("B", 2.0)).toDF("g", "v"), "g", "v", "A", "B")
      .collect().head
    assert(flat.isNullAt(4) && flat.getDouble(2) == 1.0)
  }

  test("NULL values: excluded from ranks/counts, pass through as NULL") {
    // 3 NULLs in a 23-row group must not shift the percentile ranks:
    // bounds come from the 20 non-NULL values exactly as without NULLs
    val vals = (1 to 20).map(v => ("g", Option(v.toDouble))) ++
      Seq.fill(3)(("g", Option.empty[Double]))
    val df = vals.toDF("grp", "v")
    val wz = Stats.winsorizeByRank(df, "grp", "v",
        BigDecimal("0.1"), BigDecimal("0.9"))
      .collect().map(r => Option(r.get(1)) -> Option(r.get(2))).toMap
    assert(wz(Some(1.0)) == Some(2.0) && wz(Some(20.0)) == Some(18.0))
    assert(wz(None) == None, "NULL value rows keep a NULL clipped")
    val rs = Stats.robustScale(df, "grp", "v")
      .collect().map(r => Option(r.get(1)) -> Option(r.get(2))).toMap
    assert(rs(Some(10.0)) == Some(0.0) && rs(None) == None)
    // zscore: the NULL must not inflate n — one real value ⇒ var 0 ⇒ 0
    val z1 = Stats.zscore(Seq(("g", Option(10.0)), ("g", Option.empty[Double]))
        .toDF("grp", "v"), "grp", "v")
      .collect().map(r => Option(r.get(1)) -> Option(r.get(2))).toMap
    assert(z1(Some(10.0)) == Some(0.0), "single real value has z = 0")
    assert(z1(None) == None)
    // NULL GROUP key is one group (groupBy semantics): its rows must be
    // clipped against their own bounds, not silently passed through
    val ng = ((1 to 20).map(v => (Option.empty[String], v.toDouble)) ++
      (1 to 5).map(v => (Option("g"), v.toDouble))).toDF("grp", "v")
    val ngw = Stats.winsorizeByRank(ng, "grp", "v",
        BigDecimal("0.1"), BigDecimal("0.9"))
      .collect().filter(r => r.isNullAt(0))
      .map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(ngw(1.0) == 2.0 && ngw(20.0) == 18.0,
      "NULL-group rows clip against the NULL group's own bounds")
    // corrMatrix: near-constant column with float residue → NULL, and a
    // column that is constant only after NULL drop
    val resid = Seq.fill(7)(0.70).zipWithIndex
      .map { case (c, i) => (c, i.toDouble) }.toDF("c", "x")
    val cm = Stats.corrMatrix(resid, Seq("c", "x"))
      .collect().map(r => Option(r.get(2))).head
    assert(cm == None, "constant-column residue must yield NULL, not NaN")
  }

  test("zscore is partition-invariant (decimal-exact sums)") {
    val df = (1 to 997).map(v => ("g", v * 0.01)).toDF("grp", "v")
    val a = Stats.zscore(df, "grp", "v")
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    val b = Stats.zscore(df.repartition(13), "grp", "v")
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(a == b)
  }

  test("linearFit: exact line, noise, constant-x and constant-y groups") {
    val rows =
      (1 to 50).map(i => ("exact", i.toDouble, 3.0 * i + 7)) ++
      Seq(("noisy", 1.0, 1.0), ("noisy", 2.0, 3.0), ("noisy", 3.0, 2.0),
        ("noisy", 4.0, 4.0)) ++
      (1 to 5).map(i => ("constx", 2.0, i.toDouble)) ++
      (1 to 5).map(i => ("consty", i.toDouble, 4.0))
    val out = Stats.linearFit(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), Option(r.get(2)),
        Option(r.get(3)), Option(r.get(4)))).toMap
    assert(out("exact") == ((50L, Some(3.0), Some(7.0), Some(1.0))))
    // noisy x=1..4, y=1,3,2,4: cov=4*29-10*10=16, varX=4*30-100=20,
    // varY=4*30-100=20 → slope .8, intercept (10-8)/4=.5, r2=256/400=.64
    assert(out("noisy") == ((4L, Some(0.8), Some(0.5), Some(0.64))))
    assert(out("constx") == ((5L, None, None, None)))
    // constant y: exact flat fit, r2 undefined (zero variance)
    assert(out("consty") == ((5L, Some(0.0), Some(4.0), None)))
  }

  test("linearFit drops NULL pairs and is partition-invariant") {
    val df = (Seq(("g", Option.empty[Double], Option(1.0)),
        ("g", Option(1.0), Option.empty[Double])) ++
      (1 to 200).map(i => ("g", Option(i * 0.25), Option(i * 0.5 + 3))))
      .toDF("g", "x", "y")
    val a = Stats.linearFit(df, "g", "x", "y").collect().head
    val b = Stats.linearFit(df.repartition(13), "g", "x", "y")
      .collect().head
    assert(a == b)
    assert(a.getLong(1) == 200L && a.getDouble(2) == 2.0 &&
      a.getDouble(3) == 3.0)
  }

  test("madOutliers: hand case, MAD=0 degenerate, NULLs, invariance") {
    val rows = (1 to 10).map(i => ("a", Option(i.toDouble))) ++
      Seq(("a", Option(100.0)),
        ("b", Option(5.0)), ("b", Option(5.0)), ("b", Option(5.0)),
        ("b", Option(7.0)), ("b", None))
    val df = rows.toDF("g", "v")
    val out = Stats.madOutliers(df, "g", "v", k = 3.0)
    // a: 11 values, median = 6th smallest = 6; devs sorted
    // 0,1,1,2,2,3,3,4,4,5,94 -> mad = 6th = 3; outlier iff dev > 9
    val a = out.filter(col("g") === "a").collect()
    assert(a.forall(r => r.getDouble(r.fieldIndex("median")) == 6.0 &&
      r.getDouble(r.fieldIndex("mad")) == 3.0))
    assert(a.filter(_.getBoolean(4)).map(_.getDouble(1)).toSeq == Seq(100.0))
    // b: median 5, devs 0,0,0,2 -> mad 0; any nonzero dev flags
    val b = out.filter(col("g") === "b" && col("v").isNotNull).collect()
    assert(b.forall(r => r.getDouble(r.fieldIndex("mad")) == 0.0))
    assert(b.filter(_.getBoolean(4)).map(_.getDouble(1)).toSeq == Seq(7.0))
    // NULL value keeps its row, carries group stats, NULL flag
    val nul = out.filter(col("g") === "b" && col("v").isNull).collect()
    assert(nul.length == 1 && nul.head.isNullAt(4) &&
      nul.head.getDouble(nul.head.fieldIndex("median")) == 5.0)
    // partition invariance
    val again = Stats.madOutliers(df.repartition(13), "g", "v", 3.0)
      .collect().map(r => (r.getString(0), Option(r.get(1)))).toSet
    assert(again == out.collect()
      .map(r => (r.getString(0), Option(r.get(1)))).toSet)
  }
}

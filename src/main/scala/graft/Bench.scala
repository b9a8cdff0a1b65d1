package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline queries on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Queries are forced
  * through a noop sink so projection pruning can't skip the work that
  * count() would let Catalyst elide.
  */
object Bench {
  /** Representative slice of SURVEY §2: scan+agg, join+topN, 6-table
    * join, multi-distinct, window, grouping sets, time window, explode
    * word count, exact + LSH dedup, ANN, text analysis, ngrams. */
  val headline: Seq[String] = Seq(
    "q01_agg_filter", "q03_join_agg_topn", "q05_multi_join",
    "q12_distinct_agg", "q22_grouping_sets", "q23_window_rank",
    "q31_events_tumble", "q36_explode_words", "q50_dedup_exact",
    "q51_dedup_minhash", "q55_ann_bruteforce", "q57_token_count",
    "q62_ngrams_top", "q83_multi_correlated", "q86_market_share",
    "q89_tfidf", "q95_curation_pipeline", "q106_pii_redact",
    "q107_int8_quant", "q117_decontaminate", "q119_asof_join",
    "q145_chunk_overlap", "q147_pack_greedy", "q150_zorder",
    "q151_inverted_index", "q153_shuffle", "q165_mix_budget",
    "q166_bigram_lm", "q168_shared_spans", "q169_semantic_dedup",
    "q170_cdc_apply", "q171_bpe_train", "q173_pagerank",
    "q176_hashing_tf", "q184_triangles", "q187_containment",
    "q188_gapfill", "q191_zscore", "q195_robust_scale",
    "q196_corr_matrix", "q213_bloom_decontaminate",
    "q224_scd_type2", "q228_scd2_incremental", "q229_point_in_time",
    "q234_quantile_select", "q235_quantile_natural")
  // q226_setsim_exact is deliberately NOT a headline: its OUTPUT is
  // quadratic on this template-cloned corpus (92k pairs at sf0.01 →
  // 8.9M at sf0.1 at t=0.5) — any exact all-pairs-above-threshold
  // operator is output-bound there, so benching it measures the
  // corpus's self-similarity, not the engine. See SCALE.md.

  private def loadavg(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split(" ").take(3).mkString(",")
    catch { case _: Exception => "" }

  def main(args: Array[String]): Unit = {
    val loadBefore = loadavg()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Pin the shuffle/block-manager scratch placement EXPLICITLY so it
    // can never move silently again: round 11's -Djava.io.tmpdir move
    // (an external cleaner purges /tmp mid-run) dragged Spark's local
    // dirs onto a different placement and shifted the shuffle-heavy
    // sf1 queries 2-3× with zero code change (VERDICT r11 #1). Default
    // is the on-disk scratch — the honest cluster-like placement (real
    // executors spill shuffle to local disks); SPARK_GRAFT_LOCAL_DIR
    // overrides for A/B measurement (e.g. /dev/shm). The measured
    // delta between placements is recorded in SCALE.md.
    val localDir = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR",
      new java.io.File("target/jvm-tmp").getAbsolutePath)
    new java.io.File(localDir).mkdirs()
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", localDir)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
    // A/B hook for config experiments (guide §1.2: config LAST, and
    // only measured): SPARK_GRAFT_CONF="k=v;k=v" overlays arbitrary
    // session confs for a measurement leg. Unset (the driver's run) the
    // bench uses exactly the defaults above.
    val spark = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.contains("="))
      .foldLeft(builder) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2)
        b.config(k, v)
      }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Unit =
      Queries.byName(name).run(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    runOnce("q01_agg_filter") // JVM/IO warmup, untimed

    val selected = if (args.nonEmpty) headline.filter(args.contains) else headline
    // One untimed warmup run per query (plan compilation + codegen),
    // then SPARK_GRAFT_BENCH_RUNS (default 3) timed runs: the reported
    // scalar is the MEDIAN, and min/max ride along in "spread" so a
    // 25-75 ms JIT/scheduler wobble is machine-distinguishable from a
    // real regression without reading source (VERDICT r04 item 7).
    // A failed query reports -1, not its time-to-failure — otherwise a
    // fast crash reads as a speedup in round-over-round comparison.
    val runs = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    // Contention self-gating (VERDICT r12 #1): a query whose timed
    // series spreads > 1.5x max/min (with an absolute floor so ms-scale
    // JIT wobble on sub-second queries doesn't trip it) is re-measured
    // up to SPARK_GRAFT_BENCH_RETRIES times, keeping the tightest
    // series. BENCH_r12.json shipped 13x phantom regressions (q191
    // 13.8s committed vs 1.15s judge-measured idle) because a one-shot
    // series under load became the artifact of record.
    val retries = math.max(0,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRIES", "2").toInt)
    def contendedSeries(mn: Double, mx: Double): Boolean =
      mn > 0 && mx / mn > 1.5 && (mx - mn) > 0.3
    def measurePass(): Seq[(String, Double, Double, Double)] = selected.map { name =>
      var ok = true
      def timed(): Double = {
        val t0 = System.nanoTime()
        try runOnce(name)
        catch { case e: Throwable =>
          ok = false
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      def series(): (Double, Double, Double) = {
        val ts = Seq.fill(runs)(timed()).sorted
        (ts((ts.size - 1) / 2), ts.head, ts.last) // lower median
      }
      timed() // warmup, untimed
      var (med, mn, mx) = series()
      var attempt = 0
      while (ok && attempt < retries && contendedSeries(mn, mx)) {
        attempt += 1
        System.err.println(
          f"[bench] $name spread ${mx / mn}%.2fx (${mn}%.2f-${mx}%.2fs) — retry $attempt/$retries")
        val (m2, n2, x2) = series()
        // ADVICE r13: contention only ever INFLATES times, so the lower
        // median is the primary keep-criterion — a retry under uniform
        // steady load (tight spread, uniformly slower) must not replace
        // a faster earlier series. Spread only breaks median ties.
        // ADVICE r14: when adopting a lower-median retry, keep the
        // TIGHTER of the two spreads for the contended flag — a noisy
        // retry that wins the median by a hair must not turn a clean
        // tight first series into a contended-flagged one.
        if (ok && (m2 < med || (m2 == med && x2 / n2 < mx / mn))) {
          med = m2
          if (x2 / n2 < mx / mn) { mn = n2; mx = x2 }
        }
      }
      if (ok) (name, med, mn, mx) else (name, -1.0, -1.0, -1.0)
    }
    def passContended(rs: Seq[(String, Double, Double, Double)]): Boolean =
      rs.exists { case (_, med, mn, mx) => med > 0 && contendedSeries(mn, mx) }
    def passOk(rs: Seq[(String, Double, Double, Double)]): Set[String] =
      rs.collect { case (k, med, _, _) if med >= 0 => k }.toSet
    def passTotalOver(rs: Seq[(String, Double, Double, Double)],
        common: Set[String]): Double =
      rs.collect { case (k, med, _, _) if med >= 0 && common(k) => med }.sum
    var results = measurePass()
    // Converge-to-idle (VERDICT r13 #8): when per-query retries could
    // not clear the spread gate, wait for the box to go idle (1-min
    // loadavg < 2, bounded at 5 min) and re-run the WHOLE suite once;
    // keep the pass with the lower total (contention only inflates).
    // This removes the last way a noisy run becomes the committed
    // record. Disable with SPARK_GRAFT_BENCH_CONVERGE=0.
    var convergeRerun = false
    if (passContended(results) &&
        !sys.env.get("SPARK_GRAFT_BENCH_CONVERGE").contains("0")) {
      def load1: Double =
        try loadavg().split(",")(0).toDouble
        catch { case _: Exception => 0.0 }
      val deadline = System.nanoTime() + 300L * 1000000000L
      while (System.nanoTime() < deadline && load1 >= 2.0)
        Thread.sleep(10000)
      System.err.println(
        f"[bench] pass contended — idle re-run (loadavg ${load1}%.2f)")
      val second = measurePass()
      convergeRerun = true
      // ADVICE r14: compare passes only over queries that succeeded in
      // BOTH, and never adopt a pass that introduces new failures — a
      // second pass in which a query errored has a smaller filtered
      // total and would otherwise silently replace a fully-successful
      // first pass (committing -1 measurements as the bench record).
      val common = passOk(results)
      if (common.subsetOf(passOk(second)) &&
          passTotalOver(second, common) < passTotalOver(results, common))
        results = second
    }
    val qs = results.map { case (k, med, _, _) => "\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    val spread = results.map { case (k, _, mn, mx) =>
      "\"" + k + "\":{\"min\":" + mn + ",\"max\":" + mx + ",\"runs\":" + runs + "}"
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // contention self-identification: machine load around the run and the
    // worst per-query max/min ratio — an idle-box run has spreadMax near
    // 1; a contended one (VERDICT r07: 3-13x) flags itself
    val loadAfter = s"$loadBefore|${loadavg()}"
    val spreadMax = results.collect {
      case (_, med, mn, mx) if med > 0 && mn > 0 => mx / mn
    }.foldLeft(1.0)(math.max)
    // the artifact's own verdict: true when, even after the bounded
    // retries above, some query still fails the spread gate — readers
    // of round-over-round diffs should discount this run
    val contended = results.exists { case (_, med, mn, mx) =>
      med > 0 && contendedSeries(mn, mx)
    }
    // Corpus fingerprint (untimed): per-table row count + an order-
    // independent content hash (bit_xor of xxhash64 over all columns —
    // commutative, overflow-free under ANSI). The driver regenerates
    // testdata between rounds; without this, a per-query delta cannot
    // be attributed between plan change and data change (VERDICT r06
    // "what's wrong" #2).
    // SPARK_GRAFT_BENCH_CORPUS=0 skips the (untimed) fingerprint scan —
    // iteration-loop convenience only; the default (on) is the driver
    // contract, and every committed artifact carries the fingerprint.
    val fpOn = !sys.env.get("SPARK_GRAFT_BENCH_CORPUS").contains("0")
    val corpusEntries = (if (fpOn) Tables.names else Seq.empty[String]).map { t =>
      try {
        val df = Tables.load(spark, sfDir, t)
        val row = df.selectExpr("count(1)",
          s"bit_xor(xxhash64(${df.columns.map(c => s"`$c`").mkString(", ")}))")
          .collect().head
        (t, row.getLong(0), row.getLong(1))
      } catch { case e: Throwable => (t, -1L, 0L) }
    }
    val corpus = corpusEntries.map { case (t, n, h) =>
      s""""$t":{"rows":$n,"hash":"${java.lang.Long.toHexString(h)}"}"""
    }.mkString("{", ",", "}")
    // one order-independent fingerprint over all tables, for the compact
    // stdout line (per-table detail lives in the file artifact)
    val corpusFp = java.lang.Long.toHexString(
      corpusEntries.foldLeft(0L) { case (a, (_, n, h)) => a ^ n ^ h })
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"corpus":$corpus,"corpus_fp":"$corpusFp","load":"$loadAfter","spread_max":$spreadMax,"contended":$contended,"converge_rerun":$convergeRerun,"sf":"$sfDir"}"""
    // full-fidelity artifact on disk — the driver's stdout capture window
    // is finite, so the printed line is a COMPACT summary (3-decimal
    // medians, single corpus fingerprint) guaranteed to fit and parse
    val outFile = new java.io.File("target/bench.json")
    outFile.getParentFile.mkdirs()
    val w = new java.io.PrintWriter(outFile, "UTF-8")
    try w.println(full) finally w.close()
    def r3(x: Double): String = if (x < 0) "-1" else f"$x%.3f"
    val qs3 = results.map { case (k, med, _, _) => "\"" + k + "\":" + r3(med) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs3,"corpus_fp":"$corpusFp","load":"$loadAfter","spread_max":${f"$spreadMax%.2f"},"contended":$contended,"converge_rerun":$convergeRerun,"detail":"target/bench.json","sf":"$sfDir"}""")
    spark.stop()
  }
}

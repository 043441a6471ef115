package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR
 * (default sf0.1) and prints ONE JSON line with per-query seconds.
 *
 * Methodology: results are materialized through the `noop` sink (full row
 * production, no output cost — a bare count() would let Spark prune every
 * column and time only the scan); one untimed warm-up of the whole suite
 * (JIT + parquet footer cache), then TWO full timed passes with the
 * per-query minimum. The passes are interleaved across the suite (pass 1
 * of everything, then pass 2) so a transient stall — GC, another JVM
 * shutting down — cannot hit both samples of the same query, and the
 * SQL cache is cleared between passes so blocks leaked by one query never
 * tax the queries after it.
 *
 * Failures are NOT swallowed: a crashing query is reported in a "failed"
 * list, its name + error go to stderr, and the process exits nonzero — a
 * regression must never masquerade as a speedup by dropping out of the
 * total.
 */
object Bench {

  /**
   * Host-noise sentinels. Two of eight rounds committed BENCH files whose
   * inflation was the shared host, not the code (CPU-bound queries 2.5-12x,
   * scheduling-bound ones 1.1-1.4x — another process competing for cores).
   * These fixed workloads make that contamination self-evident from the
   * artifact itself:
   *
   *  - `cpu`   : single-threaded xorshift64* checksum loop, 1.5e9 steps.
   *              Pure JVM, zero allocation, no Spark — measures raw
   *              cycles-per-second this process actually received.
   *  - `par`   : the same loop run on every core concurrently. A quiet
   *              box finishes in ~the single-thread time; a contended box
   *              inflates proportionally to the stolen cores. This is the
   *              sensitive detector for the observed failure mode.
   *  - `spark` : a fixed synthetic shuffle+agg job (range -> hash -> groupBy)
   *              on generated data — captures Spark scheduling/GC contention
   *              that a tight JIT loop can hide.
   *
   * The cpu/par sentinels run three times — before pass 1, between passes,
   * after pass 2; the cheap spark sentinel ADDITIONALLY runs between every
   * pair of headline queries, bracketing each timed sample (per-query
   * `query_ab` + the `contaminated` flag in the JSON), so contention
   * ARRIVING mid-run is attributed to the exact queries it overlapped.
   * The JSON carries min and max. `baseline_ab` is the same-window analogue of
   * BASELINE.md:88-96's A/B protocol collapsed to a constant workload:
   * max over sentinels of (observed min / quiet-box reference). The
   * references below were calibrated as the min of repeated runs on the
   * measurement box while idle (same box class the 21.3 s gate was
   * measured on). Reading: baseline_ab <= ~1.3 — box comparable to the
   * baseline window, totals are honest; >= ~1.5 — the box is loaded, the
   * per-query times are contaminated and must be adjudicated by a quiet
   * re-run, NOT read as a code regression.
   */
  object Sentinel {
    val CpuRefSec = 3.00    // quiet-box single-thread reference
    val ParRefSec = 3.20    // quiet-box all-cores reference
    val SparkRefSec = 0.50  // quiet-box fixed-job reference

    private def loop(steps: Long, seed: Long): Long = {
      var x = seed | 1L; var i = 0L
      while (i < steps) { // xorshift64* — dependent ops, JIT can't elide
        x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
        i += 1
      }
      x * 0x2545F4914F6CDD1DL
    }

    @volatile private var sink = 0L // defeat dead-code elimination

    def cpuSec(): Double = {
      val t0 = System.nanoTime()
      sink = loop(1500000000L, 0x9E3779B97F4A7C15L)
      (System.nanoTime() - t0) / 1e9
    }

    def parSec(): Double = {
      val n = Runtime.getRuntime.availableProcessors()
      val t0 = System.nanoTime()
      val ts = (1 to n).map { k =>
        val t = new Thread(() => { sink = loop(1500000000L, k.toLong) })
        t.start(); t
      }
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }

    def sparkSec(spark: SparkSession): Double = {
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      spark.range(0L, 20000000L, 1L, 32)
        .select((xxhash64(col("id")) % 997).as("k"))
        .groupBy("k").count()
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
  }

  /** Headline subset: the flagship pipelines + one representative per
    * operator family (agg, window, pivot, normalize, dedup x3, ANN, text,
    * LLM-prep e2e, multimodal, scoring, training x2). The rest of the
    * catalog is correctness-gated in Verify. */
  val headline: Seq[String] = Seq(
    "q_pipeline_e2e", "q1_agg", "q_c1_rank", "q_e1_pivot", "q_h2_normalize",
    "q_dedup_exact", "q_dedup_jaccard", "q_dedup_minhash_fast",
    "q_text_simhash", "q_text_quality", "q_llm_e2e", "q_ann_brute",
    "q_ann_lsh", "q_multimodal_meta", "q_score_embeddings",
    "q_train_transformer", "q_train_lstm_ae",
    // round-12 operator families (no round-4 baseline; per-query entries
    // only — exclude from gate-total comparisons, like q_llm_e2e r10)
    "q_asof_join", "q_sessionize",
    // round-13: ranked retrieval + bounded-window EWMA (per-query only)
    "q_bm25_search", "q_ewma",
    // round-14 families (per-query only): composed curation pipeline,
    // incremental near-dup admission, residual IVF-PQ, CDC merge
    "q_curation_e2e", "q_dedup_minhash_admit", "q_ann_ivfpq_residual",
    "q_cdc_apply",
    // round-15 families (per-query only): binary-quantization two-stage
    // ANN, perceptual-hash banded near-dup, 64-bit simhash near-dup,
    // RM3 two-pass retrieval
    "q_ann_binary_rerank", "q_multimodal_phash_dedup",
    "q_dedup_simhash64", "q_bm25_rm3",
    // round-16 families (per-query only): ICP greedy corpus layout,
    // dictionary phrase tagging
    "q_icp_order", "q_text_keyword_tag",
    // round-17 families (per-query only): winnowing overlap pairs,
    // the composed D4 (SemDeDup -> SSL-prototypes) pipeline, FIM
    "q_winnow_overlap", "q_d4_pipeline", "q_text_fim",
    // round-18 (per-query only): retrieval served from a SAVED inverted
    // index (fit+save paid once on the warm-up pass; timed passes read
    // the term-clustered on-disk postings)
    "q_bm25_prebuilt", "q_bm25_rm3_prebuilt",
    // round-18 batch 2 (per-query only): the one-pass 21-counter
    // repetition gate, paragraph-grain corpus dedup with cut, and the
    // composed web front-end (main-content cut -> repetition gate)
    "q_text_repetition_gopher", "q_para_dedup_cut", "q_web_repetition_e2e",
    // round-19 (per-query only): subword tokenizer expressions (greedy
    // WordPiece walk + integer-Viterbi Unigram, both codegen'd), and the
    // WARC container round-trip (render -> text sink -> splittable
    // lineSep scan -> parse; the write re-runs each pass by design —
    // the round-trip IS the operator)
    "q_text_wordpiece", "q_text_unigram", "q_warc_roundtrip",
    // round-19 batch 2 (per-query only): the composed crawl ingestion
    // front door (WARC on disk -> re-read -> mojibake repair -> strip ->
    // script gate -> normalize; the write re-runs each pass by design)
    "q_web_ingest_e2e",
    // round-20 (per-query only): multi-touch attribution (union+carry
    // journey scan), HITS link analysis
    "q_attribution", "q_hits",
    // content-defined chunking: the GEAR production boundary is the
    // headline; the windowed-md5 ORACLE FIXTURES (q_content_chunks,
    // q_content_chunk_dedup) moved to `spotCheck` in round 14 — they
    // were ~20% of bench wall-clock spent timing a fixture whose only
    // job is anchoring the gear parity specs
    "q_content_chunks_gear",
    // round-21: the gear-fed chunk-DEDUP twin — same stats contract and
    // boilerplate-seeded corpus as q_content_chunk_dedup, production
    // boundary family; the pair prices the whole dedup path, not just
    // the raw chunking
    "q_content_chunk_dedup_gear",
    // round-21 batch 2 (per-query only): eval-set decontamination scan
    // (corpus n-gram explode + broadcast probe join) and Adamic–Adar
    // link prediction (degree-capped wedge self-join)
    "q_decontam", "q_adamic_adar",
    // round-13: experimentation readouts (events-grain conditional
    // aggregates + the cusum-family drift window) and item-item CF
    // (the capped co-occurrence self-join)
    "q_cuped", "q_page_hinkley", "q_item_cf",
    // round-14 (per-query only): incremental CF state merge (the
    // delta-sized maintenance path incl. cap-crossing retraction),
    // permutation-sampling Shapley, the approx-percentile production
    // twins of the two exact-percentile fits, and the xxhash64
    // Poisson-bootstrap draw (the md5 q_bootstrap_ci is a verify-only
    // oracle fixture, 4.8x slower by hash cost alone)
    "q_item_cf_incremental", "q_shapley_sampled",
    "q_winsorize_approx", "q_quantile_normalize_approx",
    "q_bootstrap_ci_fast",
    // round-15 catalog additions (per-query only): doubly-robust replay,
    // Syntetos–Boylan Croston, regression discontinuity, delta-method
    // ratio test (the switchback twin shares the estimator; one entry
    // prices it), EB beta-binomial rate shrinkage. q_item_cf_touched is
    // deliberately NOT priced: its 50/50 fixture re-runs the merge, so
    // its wall-clock is q_item_cf_incremental's (already priced) plus a
    // filter — BenchOne-probed at 4.7 s, serving value is delta << corpus
    "q_dr_replay", "q_croston_sba", "q_rdd", "q_ratio_delta", "q_eb_rate",
    // round-15 batch 2 (per-query only): mixture-SPRT always-valid
    // sequential monitor (the peeking-legal test)
    "q_msprt",
    // round-16 batch (per-query only): sequential SRM guardrail (mSPRT
    // over the assignment indicator, two |arms| window passes over the
    // log). q_eb_rate_corrected and q_dr_replay_e2e are deliberately
    // NOT priced: each re-runs an already-priced plan plus one extra
    // tiny aggregate/split predicate
    "q_srm_sequential",
    // round-16 batch 2 (per-query only): Dirichlet query-likelihood
    // retrieval (inline + served from the saved index), Theta-method
    // forecast (SES + halved OLS drift window folds), one-way ANOVA F
    // (one conditional hash-aggregate pass)
    "q_ql_search", "q_ql_prebuilt", "q_theta_forecast", "q_anova_f",
    // round-16 batch 3 (per-query only): DiD event study (one
    // conditional hash-agg pass + one-row base broadcast), restricted
    // mean survival time (the KM aggregate + a statistic-sized lag pass)
    "q_did_event_study", "q_rmst",
    // round-16 batch 4 (per-query only): CMH stratified 2x2 test and
    // Spiegelhalter's calibration z — both single-aggregate-pass shapes
    "q_cmh", "q_spiegelhalter_z",
    // round-16 batch 5 (per-query only): TextRank keywords — the word
    // co-occurrence graph (shuffle-free sliced-array-zip edge build)
    // through 5 PageRank iterations; filed under graph (the iterations
    // dominate, the q_hits cost class)
    "q_textrank",
    // round-16 continuation batches (per-query only, one representative
    // per shape): k-sample doubled-midrank scan (KW), welchT-shaped IV
    // estimator, two value-grain eval scans (DeLong AUC, energy
    // distance), the per-key lag family (DW), the bin-grain Murphy
    // decomposition, and the two new graph shapes (degree-join
    // assortativity, Katz walk iterations — the family whose
    // edge-checkpoint fix this round is priced BY these entries).
    // The other 14 continuation queries are BenchOne-probed in
    // COVERAGE.md and share these plans' shapes.
    "q_kruskal_wallis", "q_iv_wald", "q_auc_delong", "q_energy_distance",
    "q_durbin_watson", "q_brier_decomp", "q_assortativity", "q_katz")

  /**
   * Contamination self-healing (pure decision logic, spec-covered):
   * given the best-of-two-passes measurement `(oldSec, oldAb)` and an
   * end-of-run quiet-retry `(retrySec, retryAb)`, pick the reported
   * (seconds, bracketAb). Contention only ever INFLATES a wall-clock
   * sample, so:
   *  - retry faster -> the retry is the better sample; report it with
   *    its own bracket;
   *  - retry slower but CLEAN-bracketed -> the original minimum was
   *    real (a quiet box could not beat it), so its time stands and
   *    the clean re-bracket clears the flag;
   *  - retry slower and ALSO hot -> keep the original pair; the query
   *    stays flagged (`contaminated` survives only when the re-run
   *    confirms the box was still loaded).
   */
  def adjudicate(oldSec: Double, oldAb: Double,
      retrySec: Double, retryAb: Double): (Double, Double) =
    if (retrySec < oldSec) (retrySec, retryAb)
    else (oldSec, math.min(oldAb, retryAb))

  /** Bracket threshold above which a query's best sample counts as
    * host-contaminated (both passes inflated). */
  val ContaminatedAb = 1.5

  /** Oracle fixtures priced OUTSIDE the timed headline: one single
    * sample after the timed passes, reported under `spot_check`,
    * excluded from total/gate/family sums. These anchor correctness
    * specs (the gear twins above are the production path); their
    * timings only need to stay sane, not to tax every round's bench. */
  val spotCheck: Seq[String] = Seq("q_content_chunks",
    "q_content_chunk_dedup")

  /** Per-family groupings of the headline set: a regression localizes to
    * a family subtotal instead of a 48-row per-query diff. Families are
    * disjoint and cover every headline entry (asserted at startup);
    * documented in BASELINE.md. */
  val families: Seq[(String, Set[String])] = Seq(
    "core" -> Set("q_pipeline_e2e", "q1_agg", "q_c1_rank", "q_e1_pivot",
      "q_h2_normalize", "q_llm_e2e", "q_icp_order"),
    "dedup" -> Set("q_dedup_exact", "q_dedup_jaccard", "q_dedup_minhash_fast",
      "q_dedup_minhash_admit", "q_dedup_simhash64", "q_text_simhash",
      "q_para_dedup_cut", "q_winnow_overlap", "q_d4_pipeline",
      "q_content_chunks_gear", "q_content_chunk_dedup_gear", "q_decontam"),
    "ann" -> Set("q_ann_brute", "q_ann_lsh", "q_ann_ivfpq_residual",
      "q_ann_binary_rerank"),
    "retrieval" -> Set("q_bm25_search", "q_bm25_rm3", "q_bm25_prebuilt",
      "q_bm25_rm3_prebuilt", "q_ql_search", "q_ql_prebuilt"),
    "temporal" -> Set("q_asof_join", "q_sessionize", "q_ewma", "q_cdc_apply",
      "q_attribution", "q_page_hinkley", "q_croston_sba",
      "q_theta_forecast", "q_rmst", "q_durbin_watson"),
    "experiment" -> Set("q_cuped", "q_shapley_sampled", "q_dr_replay",
      "q_rdd", "q_ratio_delta", "q_msprt", "q_srm_sequential",
      "q_did_event_study", "q_cmh", "q_iv_wald"),
    "mining" -> Set("q_item_cf", "q_item_cf_incremental",
      "q_winsorize_approx", "q_quantile_normalize_approx",
      "q_bootstrap_ci_fast", "q_eb_rate", "q_anova_f",
      "q_spiegelhalter_z", "q_kruskal_wallis", "q_auc_delong",
      "q_energy_distance", "q_brier_decomp"),
    "graph" -> Set("q_hits", "q_adamic_adar", "q_textrank",
      "q_assortativity", "q_katz"),
    "web" -> Set("q_warc_roundtrip", "q_web_ingest_e2e", "q_curation_e2e",
      "q_web_repetition_e2e", "q_text_repetition_gopher", "q_text_quality",
      "q_text_keyword_tag", "q_text_fim", "q_text_wordpiece",
      "q_text_unigram"),
    "ml" -> Set("q_score_embeddings", "q_train_transformer",
      "q_train_lstm_ae", "q_multimodal_meta", "q_multimodal_phash_dedup"))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.SessionTuning(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // `--sentinels-only`: probe box health without running the suite —
    // the tool for same-window adjudication of a suspect BENCH artifact.
    if (args.contains("--sentinels-only")) {
      Sentinel.sparkSec(spark) // warm the fixed job
      for (i <- 1 to 3) {
        val c = Sentinel.cpuSec(); val p = Sentinel.parSec()
        val s = Sentinel.sparkSec(spark)
        val ab = Seq(c / Sentinel.CpuRefSec, p / Sentinel.ParRefSec,
          s / Sentinel.SparkRefSec).max
        println(f"""{"sentinel_run":$i,"cpu":$c%.3f,"par":$p%.3f,"spark":$s%.3f,"baseline_ab":$ab%.3f}""")
      }
      spark.stop(); return
    }

    val qs = headline.filter(SparkEntry.queries.contains)

    // Scale-evidence listener (r16 verdict item: at sf0.1 wall-clock
    // cannot evidence scale-safety, so emit the fan-out itself): for
    // every headline query, record the LARGEST stage (task count)
    // observed across its runs. The listener only observes the
    // scheduler bus — zero extra jobs, no timing-methodology change.
    // Reported as "fanout": {q: maxStageTasks} so the driver can assert
    // that heavy queries fan out across the cores without timing
    // anything (max is pass-count-invariant; plans are identical across
    // passes).
    val fanMax = new java.util.concurrent.ConcurrentHashMap[String, Int]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        // stage -> query via the job description (events are async, so a
        // thread-local "current query" would misattribute boundary stages;
        // the description rides the job properties instead)
        private val stageQ = new java.util.concurrent.ConcurrentHashMap[Int, String]()
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val d = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
          d.filter(SparkEntry.queries.contains).foreach { q =>
            js.stageIds.foreach(sid => stageQ.put(sid, q))
          }
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val q = stageQ.remove(sc.stageInfo.stageId)
          if (q != null)
            fanMax.merge(q, sc.stageInfo.numTasks, (a, b) => math.max(a, b))
        }
      })

    def runOnce(name: String): Double = {
      spark.sparkContext.setJobDescription(name) // guide §1.5 + fan-out key
      try {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } finally spark.sparkContext.setJobDescription(null)
    }

    val failed = scala.collection.mutable.LinkedHashSet[String]()
    qs.foreach { n => // warm-up (failures surface in the timed passes)
      try runOnce(n)
      catch { case e: Throwable =>
        System.err.println(s"[bench] warm-up $n failed: ${e.getMessage}")
      }
    }
    val cpuS = scala.collection.mutable.ArrayBuffer[Double]()
    val parS = scala.collection.mutable.ArrayBuffer[Double]()
    val sparkS = scala.collection.mutable.ArrayBuffer[Double]()
    def sampleSentinels(): Unit = {
      cpuS += Sentinel.cpuSec(); parS += Sentinel.parSec()
      sparkS += Sentinel.sparkSec(spark)
    }

    sampleSentinels() // before pass 1
    // Per-query contamination brackets: the cheap spark sentinel (~0.5 s
    // quiet) runs BETWEEN headline queries, so every timed sample is
    // bracketed by two same-window probes. A query's reported time carries
    // the bracket inflation of the pass that produced its minimum:
    // query_ab[q] = max(sentinel before, sentinel after) / quiet reference.
    // Contention arriving mid-run is thus attributed to the exact queries
    // it overlapped (round-10's artifact needed a judge re-run precisely
    // because suite-level maxima could not say WHICH times were inflated).
    val best = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
    for (pass <- 1 to 2) {
      spark.sqlContext.clearCache()
      var prevSent = Sentinel.sparkSec(spark)
      sparkS += prevSent
      qs.foreach { n =>
        try {
          val t = runOnce(n)
          val nextSent = Sentinel.sparkSec(spark)
          sparkS += nextSent
          val bracketAb = math.max(prevSent, nextSent) / Sentinel.SparkRefSec
          prevSent = nextSent
          if (t < best.getOrElse(n, (Double.MaxValue, 0.0))._1)
            best(n) = (t, bracketAb)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $n FAILED (pass $pass): ${e.getMessage}")
          failed += n
          prevSent = Sentinel.sparkSec(spark); sparkS += prevSent
        }
      }
      sampleSentinels() // between passes / after pass 2
    }
    // Self-healing pass: any query whose BEST sample was bracketed hot
    // (ab >= threshold in both passes) gets ONE quiet retry at end-of-run,
    // re-bracketed by fresh sentinels; `adjudicate` keeps the better
    // measurement and the flag survives only if the retry also brackets
    // hot. r14 shipped 5 flagged queries and r15 one (q_bm25_rm3) that
    // each needed a manual judge re-run — this is that re-run, automated,
    // inside the same artifact.
    val hot = qs.filterNot(failed).filter(n => best(n)._2 >= ContaminatedAb)
    if (hot.nonEmpty) {
      var prevSent = Sentinel.sparkSec(spark); sparkS += prevSent
      hot.foreach { n =>
        try {
          val t = runOnce(n)
          val nextSent = Sentinel.sparkSec(spark); sparkS += nextSent
          val ab = math.max(prevSent, nextSent) / Sentinel.SparkRefSec
          prevSent = nextSent
          best(n) = adjudicate(best(n)._1, best(n)._2, t, ab)
        } catch { case e: Throwable =>
          // the retry is opportunistic: a crash here must not fail a
          // query that already has two good samples
          System.err.println(s"[bench] retry $n failed: ${e.getMessage}")
          prevSent = Sentinel.sparkSec(spark); sparkS += prevSent
        }
      }
    }
    // a query that failed in EITHER pass reports -1.0 and never contributes
    // to the total — a flaky query must not inflate the headline with a
    // single-sample time while also flagging failure
    def r3(d: Double): Double = math.rint(d * 1000) / 1000
    val results = qs.map(n => n -> (if (failed(n)) -1.0 else
      best.get(n).map(t => r3(t._1)).getOrElse(-1.0)))
    val qJson = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val total = r3(results.map(_._2).filter(_ >= 0).sum)
    // like-for-like total over the 16 queries the round-4 21.3 s gate was
    // measured on (later-round additions report per-query only)
    val gate16 = Set("q_pipeline_e2e", "q1_agg", "q_c1_rank", "q_e1_pivot",
      "q_h2_normalize", "q_dedup_exact", "q_dedup_jaccard",
      "q_dedup_minhash_fast", "q_text_simhash", "q_text_quality",
      "q_ann_brute", "q_ann_lsh", "q_multimodal_meta", "q_score_embeddings",
      "q_train_transformer", "q_train_lstm_ae")
    val gate16Total = r3(results.filter(r => gate16(r._1)).map(_._2).filter(_ >= 0).sum)
    // disjoint-and-covering is a startup invariant, not a hope: a new
    // headline entry MUST be filed into exactly one family
    locally {
      val allFam = families.flatMap(_._2)
      require(allFam.size == allFam.distinct.size,
        "bench families overlap: " + allFam.diff(allFam.distinct).mkString(","))
      val unfiled = headline.toSet.diff(allFam.toSet)
      require(unfiled.isEmpty, "headline queries missing a family: " +
        unfiled.mkString(","))
    }
    val famJson = families.map { case (f, qsIn) =>
      s""""$f":${r3(results.filter(r => qsIn(r._1)).map(_._2).filter(_ >= 0).sum)}"""
    }.mkString("{", ",", "}")
    val failedJson = failed.map(n => s""""$n"""").mkString("[", ",", "]")
    // baseline_ab: worst sentinel inflation vs the quiet-box references —
    // the same-window A/B of BASELINE.md:88-96 against a constant workload.
    // <=1.3 box comparable to the baseline window; >=1.5 artifact is
    // host-contaminated, adjudicate by re-run before reading as regression.
    val ab = Seq(cpuS.min / Sentinel.CpuRefSec, parS.min / Sentinel.ParRefSec,
      sparkS.min / Sentinel.SparkRefSec).max
    // Self-adjudication: a query is contaminated when BOTH passes' brackets
    // were inflated AND the end-of-run quiet retry above also bracketed hot
    // — its time must be adjudicated by a manual quiet re-run, never read
    // as a regression. `contaminated` = the artifact contains at least one
    // such query.
    val qAb = qs.filterNot(failed).map(n => n -> r3(best(n)._2))
    // shrink: only report brackets that show inflation (>= 1.2); a clean
    // bracket carries no information and the r11 artifact got truncated by
    // the driver's tail capture precisely because the line had grown
    val qAbJson = qAb.filter(_._2 >= 1.2)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val contaminatedQs = qAb.filter(_._2 >= ContaminatedAb).map(_._1)
    val contamJson = contaminatedQs.map(n => s""""$n"""").mkString("[", ",", "]")
    val sentJson =
      s""""cpu_min":${r3(cpuS.min)},"cpu_max":${r3(cpuS.max)},""" +
      s""""par_min":${r3(parS.min)},"par_max":${r3(parS.max)},""" +
      s""""spark_min":${r3(sparkS.min)},"spark_max":${r3(sparkS.max)}"""
    // oracle-fixture spot checks: ONE untimed-warm-up-free sample each,
    // outside total/gate/family sums (their warm-up happened implicitly
    // if they share scans with headline queries; a single sample is all
    // a sanity floor needs)
    val spotJson = spotCheck.filter(SparkEntry.queries.contains).map { n =>
      val t = try r3(runOnce(n)) catch { case e: Throwable =>
        System.err.println(s"[bench] spot-check $n failed: ${e.getMessage}")
        -1.0
      }
      s""""$n":$t"""
    }.mkString("{", ",", "}")
    // scale evidence: the max stage task count each query reached (see
    // the listener above) — additive field, no existing key touched
    val fanJson = qs.filterNot(failed).flatMap(n => Option(fanMax.get(n))
      .map(v => s""""$n":$v""")).mkString("{", ",", "}")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","gate16_total":$gate16Total,"family_totals":$famJson,"queries":$qJson,"failed":$failedJson,"spot_check":$spotJson,"query_ab":$qAbJson,"contaminated":${contaminatedQs.nonEmpty},"contaminated_queries":$contamJson,"sentinel_sec":{$sentJson},"baseline_ab":${r3(ab)},"fanout":$fanJson,"sf":"$sfDir"}"""
    // belt-and-braces vs the driver's finite tail capture: the artifact
    // also lands in the repo, so the verdict never depends on the capture
    // window catching the whole stdout line
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/BENCH_LOCAL.json"), json + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] BENCH_LOCAL.json write failed: ${e.getMessage}")
    }
    spark.stop()
    // the JSON is the ABSOLUTE last stdout line this process emits (after
    // spark.stop()'s logging) — maximizes survival under tail capture
    println(json)
    if (failed.nonEmpty) sys.exit(1)
  }
}

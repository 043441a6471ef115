package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Online-experimentation / causal-inference operators: CUPED variance
 * reduction, Wald's sequential probability ratio test, the 2×2
 * difference-in-differences estimator, and propensity-stratified
 * treatment-effect estimation. The analytics layer a customer-events
 * engine needs once the pipeline FEEDS an experimentation program — the
 * reference's churn/segment scores (caspr analyze family) exist to be
 * A/B-tested, and these are the standard scale-safe readouts.
 *
 * All four are aggregate-grain: one or two hash-aggregate passes over the
 * assignment/metric table, then arithmetic on rows the size of the number
 * of arms/strata — nothing here grows with event count after the first
 * aggregate, which is exactly the shape that survives 100 TB of raw
 * exposures.
 */
object Experiment {

  /**
   * CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM 2013,
   * "Improving the sensitivity of online controlled experiments by
   * utilizing pre-experiment data"): the industry-standard trick that
   * shrinks metric variance — and therefore experiment runtime — by
   * regressing out each unit's PRE-period activity. With θ =
   * cov(pre, post) / var(pre) fitted on the pooled sample (arm-blind, so
   * it cannot bias the contrast) the adjusted metric
   * `y' = y − θ(x − x̄)` has variance `var(y)(1 − ρ²)`.
   *
   * Input: one row per experiment unit — `armCol` (assignment label),
   * `preCol` x, `postCol` y. Output: one row per arm with n, the raw and
   * CUPED-adjusted means/variances, the pooled θ, and the realized
   * variance-reduction fraction (1 − var'/var, 6 dp).
   *
   * Scale shape: ONE full aggregate for (θ, x̄) — a one-row result
   * broadcast back via crossJoin — one narrow projection, one aggregate
   * by arm. No shuffle carries unit-grain rows twice; nothing is
   * collected. Sample (n−1) moments on both engines; 6-dp rounding
   * absorbs partial-agg float order.
   */
  def cuped(df: DataFrame, armCol: String, preCol: String,
      postCol: String): DataFrame = {
    val x = col(preCol).cast("double")
    val y = col(postCol).cast("double")
    val units = df.filter(x.isNotNull && y.isNotNull)
    val fit = units.agg(
      covar_samp(x, y).as("__cov"), var_samp(x).as("__varx"),
      avg(x).as("__mx"))
    // A constant pre-metric carries no information: theta degrades to 0
    // (no adjustment) instead of a null-propagating 0/0.
    val withTheta = units.crossJoin(broadcast(fit))
      .withColumn("__theta",
        when(col("__varx") > 0, col("__cov") / col("__varx"))
          .otherwise(lit(0.0)))
      .withColumn("__adj", y - col("__theta") * (x - col("__mx")))
    withTheta.groupBy(col(armCol).as("arm"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(y), 6).as("mean_post"),
        round(avg(col("__adj")), 6).as("mean_cuped"),
        round(var_samp(y), 6).as("var_post"),
        round(var_samp(col("__adj")), 6).as("var_cuped"),
        round(first(col("__theta")), 6).as("theta"),
        round(lit(1.0) - var_samp(col("__adj")) / var_samp(y), 6)
          .as("var_reduction"))
  }

  /**
   * Wald's sequential probability ratio test (Wald 1945) over a Bernoulli
   * stream, per key: H₀: p = p0 vs H₁: p = p1, monitoring the cumulative
   * log-likelihood ratio and stopping the FIRST time it leaves
   * (ln(β/(1−α)), ln((1−β)/α)). The always-valid early-stopping readout —
   * a fixed-horizon test peeked at daily inflates α; SPRT's thresholds
   * don't.
   *
   * Determinism across engines: the two per-observation LLR increments
   * are CONSTANTS of (p0, p1); they are computed HERE (one JVM) and the
   * cumulative LLR is `pos·c1 + (i−pos)·c0` — integer counts times shared
   * literals, bit-identical on any engine that receives the same literals
   * (expose them via [[sprtLlrConstants]] so an external oracle can). No
   * float accumulation order is involved at all.
   *
   * Output: one row per key — n_total, n_decision (observation index of
   * the first crossing, n_total if none), llr at that point (6 dp), and
   * decision ('accept_h1' | 'accept_h0' | 'continue').
   *
   * Scale shape: one shuffle on `keys` for the ordered window (running
   * count of successes + row_number), then a per-key min over the
   * crossing flags — no per-row array, unbounded stream length for free.
   */
  def sprt(df: DataFrame, keys: Seq[String], tsCol: String,
      outcomeCol: String, p0: Double, p1: Double,
      alpha: Double = 0.05, beta: Double = 0.05,
      tiebreak: Seq[String] = Nil): DataFrame = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p0 != p1,
      "p0, p1 must be in (0,1) and differ")
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      "alpha, beta in (0,1)")
    val (c1, c0) = sprtLlrConstants(p0, p1)
    val (lo, hi) = sprtBounds(alpha, beta)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((Seq(col(tsCol)) ++ tiebreak.map(col)).map(_.asc): _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val xi = when(col(outcomeCol).cast("boolean"), 1L).otherwise(0L)
    val withLlr = df
      .withColumn("__i", row_number().over(w))
      .withColumn("__pos", sum(xi).over(run))
      .withColumn("__llr",
        col("__pos") * lit(c1) + (col("__i") - col("__pos")) * lit(c0))
      .withColumn("__dec",
        when(col("__llr") >= hi, lit("accept_h1"))
          .when(col("__llr") <= lo, lit("accept_h0")))
    reportFirstCrossing(withLlr, keys, Seq(round(col("__llr"), 6).as("llr")))
  }

  /** Report row per key at the FIRST crossing — or the last
    * observation when the monitor never decides: one key-window pass,
    * no self-join. Shared by the sequential monitors ([[sprt]],
    * [[msprt]]); expects `__i` (step index) and `__dec` (nullable
    * decision label) on the input, emits keys ++ (n_total, n_decision)
    * ++ payload ++ decision (null → 'continue'). */
  private def reportFirstCrossing(df: DataFrame, keys: Seq[String],
      payload: Seq[Column]): DataFrame = {
    val wk = Window.partitionBy(keys.map(col): _*)
    df.withColumn("__n", max(col("__i")).over(wk))
      .withColumn("__hit",
        min(when(col("__dec").isNotNull, col("__i"))).over(wk))
      .filter(col("__i") === coalesce(col("__hit"), col("__n")))
      .select(
        ((keys.map(col) :+
          col("__n").cast("long").as("n_total") :+
          col("__i").cast("long").as("n_decision")) ++
          payload :+
          coalesce(col("__dec"), lit("continue")).as("decision")): _*)
  }

  /**
   * Mixture SPRT / always-valid inference (Robbins 1970, "Statistical
   * methods related to the law of the iterated logarithm"; Johari,
   * Koomen, Pekelis & Walsh, KDD 2017, "Peeking at A/B tests") — the
   * sequential test that makes CONTINUOUS MONITORING legal. [[sprt]]
   * needs a point alternative; the mSPRT mixes the likelihood ratio
   * over a N(0, τ²) prior on the effect, so "any shift at all" is
   * detectable and the induced p-value process is ALWAYS VALID:
   * P(∃n: p_n ≤ α) ≤ α under H0 no matter how often (or when) anyone
   * peeks — the fix for the peeking problem that invalidates
   * fixed-horizon tests under optional stopping. Per key, for
   * observations x_i with DECLARED null mean μ0 and std σ (the
   * declared-nuisance philosophy — fit/choose them upstream), with
   * S_n = Σ(x_i − μ0):
   *
   *   ln Λ_n = ½·ln(σ²/(σ² + n·τ²)) + τ²·S_n² / (2σ²·(σ² + n·τ²))
   *
   * and p_n = min(1, 1/max_{m≤n} Λ_m); reject when the RUNNING MAX of
   * ln Λ crosses ln(1/α). The verdict compares 6-dp-ROUNDED ln Λ
   * against the JVM-literal bound on both engines (the bhFdr
   * round-before-verdict convention). Honest caveat: S_n is a double
   * window fold and ln is libm, so engines can differ in the last
   * ulps — the rounding makes a verdict flip possible only when ln Λ
   * at a crossing row lands exactly ON a 6-dp rounding midpoint
   * adjacent to the bound (the documented bhFdr residual class), not
   * on every last-ulp wobble.
   *
   * Output: one row per key at the FIRST crossing (or the last
   * observation when the test never rejects) — n_total, n_decision,
   * log_lambda (the running max, 6 dp), p_always_valid (6 dp),
   * decision 'reject'/'continue'. Scale shape: [[sprt]]'s — ONE key
   * shuffle, ordered running sums in one window pass, no joins.
   */
  def msprt(df: DataFrame, keys: Seq[String], tsCol: String,
      valueCol: String, mu0: Double, sigma: Double, tau: Double,
      alpha: Double = 0.05, tiebreak: Seq[String] = Nil): DataFrame = {
    require(sigma > 0 && tau > 0, "sigma and tau must be > 0")
    require(alpha > 0 && alpha < 1, "alpha in (0,1)")
    val s2 = sigma * sigma
    val t2 = tau * tau
    val bound = math.log(1.0 / alpha)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((Seq(col(tsCol)) ++ tiebreak.map(col)).map(_.asc): _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val x = col(valueCol).cast("double")
    val denom = lit(s2) + col("__i") * lit(t2)
    val withL = df.filter(x.isNotNull)
      .withColumn("__i", row_number().over(w))
      .withColumn("__s", sum(x - lit(mu0)).over(run))
      .withColumn("__ln", lit(0.5) * log(lit(s2) / denom) +
        (lit(t2) * col("__s") * col("__s")) /
          (lit(2.0) * lit(s2) * denom))
      .withColumn("__mx", max(col("__ln")).over(run))
      .withColumn("__dec",
        when(round(col("__mx"), 6) >= lit(bound), lit("reject")))
    reportFirstCrossing(withL, keys, Seq(
      round(col("__mx"), 6).as("log_lambda"),
      round(least(lit(1.0), exp(-col("__mx"))), 6).as("p_always_valid")))
  }

  /** The two SPRT per-observation LLR increments (success, failure) —
    * shared with any external oracle so both engines multiply identical
    * literals. */
  def sprtLlrConstants(p0: Double, p1: Double): (Double, Double) =
    (math.log(p1 / p0), math.log((1 - p1) / (1 - p0)))

  /** SPRT decision bounds (lower = accept H0, upper = accept H1). */
  def sprtBounds(alpha: Double, beta: Double): (Double, Double) =
    (math.log(beta / (1 - alpha)), math.log((1 - beta) / alpha))

  /**
   * Sample-ratio-mismatch check (Fabijan et al. 2019 call SRM "the most
   * actionable A/B guardrail"): observed arm counts vs the DECLARED
   * allocation, with the goodness-of-fit χ² = Σ(o−e)²/e. A significant
   * SRM means the assignment or logging pipeline is broken and every
   * downstream readout ([[cuped]], [[diffInDiff]], [[sprt]]) is void —
   * run this first. Arms observed outside `expected` are ignored by the
   * χ² but surface via n_total (their rows still count the experiment's
   * traffic only if declared; the standard contract).
   *
   * Output: one row per declared arm — arm, n_obs, expected (6 dp),
   * ratio_obs (6 dp), plus the shared chi2 (6 dp) and dof repeated.
   * A declared arm with ZERO observed rows still emits its row (n_obs =
   * 0) and contributes its full (0−e)²/e term — an arm that logs
   * nothing is the worst SRM, not a no-op; the declared list is a local
   * relation left-joined against the observed counts so absence can't
   * silently drop the term. Scale shape: ONE hash-aggregate to arm
   * grain; everything after is arms-sized window arithmetic.
   */
  def srmCheck(df: DataFrame, armCol: String,
      expected: Seq[(String, Double)]): DataFrame = {
    require(expected.size >= 2, "need >= 2 declared arms")
    require(expected.forall(_._2 > 0), "shares must be positive")
    // a duplicated arm name would left-join the same observed count
    // twice, double-counting n_obs in the window total and its chi2 term
    require(expected.map(_._1).distinct.size == expected.size,
      "arm names must be distinct")
    val total = expected.map(_._2).sum
    val spark = df.sparkSession
    import spark.implicits._
    val declared = expected.map { case (a, w) => (a, w / total) }
      .toDF("arm", "__share")
    val counts = df.filter(col(armCol).isin(expected.map(_._1): _*))
      .groupBy(col(armCol).as("__obs"))
      .agg(count(lit(1)).as("__n_obs"))
    val all = Window.partitionBy()
    declared.join(counts, col("arm") === col("__obs"), "left")
      .withColumn("n_obs", coalesce(col("__n_obs"), lit(0L)))
      .withColumn("__n", sum(col("n_obs")).over(all))
      // ZERO observed rows total (mismatched arm labels, an empty
      // slice) must read as null, never as 0/0 = NaN — a NaN chi2
      // silently passes every `chi2 > critical` guardrail, hiding the
      // worst possible SRM (nothing logged at all)
      .withColumn("__e", when(col("__n") > 0, col("__n") * col("__share")))
      .withColumn("__chi", (col("n_obs") - col("__e")) *
        (col("n_obs") - col("__e")) / col("__e"))
      .select(col("arm"), col("n_obs"),
        round(col("__e"), 6).as("expected"),
        round(when(col("__n") > 0,
          col("n_obs") / col("__n").cast("double")), 6).as("ratio_obs"),
        round(sum(col("__chi")).over(all), 6).as("chi2"),
        lit(expected.size - 1).cast("long").as("dof"))
  }

  /**
   * SEQUENTIAL sample-ratio-mismatch guardrail — [[msprt]] composed
   * over the arm-assignment indicator, so a broken ramp is caught
   * MID-FLIGHT instead of at [[srmCheck]]'s fixed-horizon readout (and
   * peeking at every micro-batch stays legal: the mixture construction
   * keeps P(any false alarm) ≤ α). For each DECLARED arm a with
   * normalized share q_a, the indicator xᵢ = 1{armᵢ = a} is
   * Bernoulli(q_a) under "the ramp is what we declared", so the
   * per-arm monitor runs the mSPRT with μ0 = q_a, σ² = q_a(1 − q_a):
   * S_n = pos_n − n·q_a is an integer count minus a count-times-literal
   * product (bit-exact on any engine), and ln Λ_n is the [[msprt]]
   * formula with the per-arm σ² joined in from the declared table. A
   * rejection on ANY arm's row is the alarm; drift in either direction
   * (over- or under-assignment) is caught by the squared S_n.
   *
   * Output: one row per declared arm at its FIRST crossing (or the
   * last observation) — arm, share (the declared fraction, 6 dp),
   * n_total, n_decision, log_lambda (running max, 6 dp),
   * p_always_valid (6 dp), decision 'reject'/'continue'. Scale shape:
   * the |arms|-row declared table broadcasts onto one assignment-log
   * scan; each arm's monitor is one ordered window pass over the log
   * (the sequence IS the statistic — the [[sprt]]/[[msprt]] inherent
   * shape; |arms| parallel window partitions, no joins after the
   * broadcast).
   */
  def srmSequential(df: DataFrame, armCol: String, tsCol: String,
      expected: Seq[(String, Double)], tau: Double,
      alpha: Double = 0.05, tiebreak: Seq[String] = Nil): DataFrame = {
    require(expected.size >= 2, "need >= 2 declared arms")
    require(expected.forall(_._2 > 0), "shares must be positive")
    require(expected.map(_._1).distinct.size == expected.size,
      "arm names must be distinct")
    require(tau > 0, "tau must be > 0")
    require(alpha > 0 && alpha < 1, "alpha in (0,1)")
    val total = expected.map(_._2).sum
    val spark = df.sparkSession
    import spark.implicits._
    // shares and σ² computed ONCE in the JVM — both engines join the
    // same double literals, no per-row float derivation can drift
    val declared = expected.map { case (a, w) =>
      val q = w / total; (a, q, q * (1.0 - q))
    }.toDF("__arm", "__share", "__s2")
    val t2 = tau * tau
    val bound = math.log(1.0 / alpha)
    val w = Window.partitionBy(col("__arm"))
      .orderBy((Seq(col(tsCol)) ++ tiebreak.map(col)).map(_.asc): _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val denom = col("__s2") + col("__i") * lit(t2)
    val withL = df
      .filter(col(armCol).isin(expected.map(_._1): _*))
      .crossJoin(broadcast(declared))
      .withColumn("__i", row_number().over(w))
      .withColumn("__pos",
        sum(when(col(armCol) === col("__arm"), 1L).otherwise(0L)).over(run))
      .withColumn("__s", col("__pos") - col("__i") * col("__share"))
      .withColumn("__ln", lit(0.5) * log(col("__s2") / denom) +
        (lit(t2) * col("__s") * col("__s")) /
          (lit(2.0) * col("__s2") * denom))
      .withColumn("__mx", max(col("__ln")).over(run))
      .withColumn("__dec",
        when(round(col("__mx"), 6) >= lit(bound), lit("reject")))
      .withColumn("arm", col("__arm"))
      .withColumn("share", round(col("__share"), 6))
    reportFirstCrossing(withL, Seq("arm", "share"), Seq(
      round(col("__mx"), 6).as("log_lambda"),
      round(least(lit(1.0), exp(-col("__mx"))), 6).as("p_always_valid")))
  }

  /**
   * Uplift / Qini curve (Radcliffe 2007): rank units by a targeting
   * score (best-first), cut into `buckets` equal-count bins, and report
   * the CUMULATIVE treated-vs-control response contrast at each depth —
   * uplift@k = S_t/N_t − S_c/N_c and the Qini statistic
   * S_t − S_c·N_t/N_c (incremental responses vs a control scaled to the
   * treated count). THE model-quality readout for "whom should we
   * treat": a useful score front-loads uplift; a useless one gives a
   * flat diagonal.
   *
   * Determinism: the ntile order is (score DESC, tiebreak) — pass an
   * exact-typed score (the [[attStrata]] contract); cumulative sums of
   * integer outcomes stay exact.
   *
   * Output: one row per bucket — bucket, the four cumulative counts/
   * sums, uplift (6 dp), qini (6 dp). Scale shape: one global-order
   * ntile (same caveat as [[attStrata]]: swap in approx-quantile bucket
   * bounds at 100 TB), one aggregate to bucket grain, windows over
   * ≤ `buckets` rows.
   */
  def upliftCurve(df: DataFrame, scoreCol: String, treatedCol: String,
      outcomeCol: String, buckets: Int = 10,
      tiebreak: Seq[String] = Nil): DataFrame = {
    require(buckets >= 2, "need >= 2 buckets")
    val y = col(outcomeCol).cast("double")
    val t = col(treatedCol).cast("boolean")
    val order = Window.orderBy(
      (Seq(col(scoreCol).desc) ++ tiebreak.map(col(_).asc)): _*)
    val binned = df.filter(y.isNotNull && col(scoreCol).isNotNull)
      .withColumn("bucket", ntile(buckets).over(order).cast("long"))
    val byBucket = binned.groupBy("bucket").agg(
      sum(when(t, 1L).otherwise(0L)).as("__nt"),
      sum(when(!t, 1L).otherwise(0L)).as("__nc"),
      // otherwise(0): a bucket (or prefix) with no treated/control units
      // must cumulate to 0, not null — the oracle's SUM(CASE…ELSE 0 END).
      sum(when(t, y).otherwise(lit(0.0))).as("__st"),
      sum(when(!t, y).otherwise(lit(0.0))).as("__sc"))
    val run = Window.orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byBucket
      .withColumn("n_treat_cum", sum(col("__nt")).over(run))
      .withColumn("n_ctrl_cum", sum(col("__nc")).over(run))
      .withColumn("resp_treat_cum", sum(col("__st")).over(run))
      .withColumn("resp_ctrl_cum", sum(col("__sc")).over(run))
      .select(col("bucket"), col("n_treat_cum"), col("n_ctrl_cum"),
        round(col("resp_treat_cum"), 6).as("resp_treat_cum"),
        round(col("resp_ctrl_cum"), 6).as("resp_ctrl_cum"),
        round(when(col("n_treat_cum") > 0 && col("n_ctrl_cum") > 0,
          col("resp_treat_cum") / col("n_treat_cum") -
            col("resp_ctrl_cum") / col("n_ctrl_cum")), 6).as("uplift"),
        round(when(col("n_ctrl_cum") > 0,
          col("resp_treat_cum") - col("resp_ctrl_cum") *
            (col("n_treat_cum").cast("double") / col("n_ctrl_cum"))), 6)
          .as("qini"))
  }

  /**
   * 2×2 difference-in-differences (Card & Krueger 1994 is the canonical
   * applied reference): with a treated flag and a pre/post flag,
   * DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre) — the
   * parallel-trends estimate of the treatment effect when assignment
   * wasn't randomized (rollouts, holdouts, natural experiments).
   *
   * Output: ONE row — the four cell means and counts, the DiD estimate,
   * its large-sample standard error `sqrt(Σ s²ᵢ/nᵢ)` over the four cells,
   * and the t statistic. Scale shape: a single hash-aggregate pass
   * (conditional aggregates, no join), then one-row arithmetic.
   */
  def diffInDiff(df: DataFrame, treatedCol: String, postCol: String,
      valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val t = col(treatedCol).cast("boolean")
    val p = col(postCol).cast("boolean")
    def cell(ct: Column, name: String): Seq[(String, Column)] = Seq(
      s"n_$name" -> sum(when(ct, 1L).otherwise(0L)),
      s"__m_$name" -> avg(when(ct, v)),
      s"__v_$name" -> var_samp(when(ct, v)))
    val cells =
      cell(t && !p, "treat_pre") ++ cell(t && p, "treat_post") ++
        cell(!t && !p, "ctrl_pre") ++ cell(!t && p, "ctrl_post")
    val g = df.filter(v.isNotNull)
      .agg(cells.head._2.as(cells.head._1),
        cells.tail.map { case (n, c) => c.as(n) }: _*)
    val did = (col("__m_treat_post") - col("__m_treat_pre")) -
      (col("__m_ctrl_post") - col("__m_ctrl_pre"))
    val se = sqrt(
      col("__v_treat_post") / col("n_treat_post") +
        col("__v_treat_pre") / col("n_treat_pre") +
        col("__v_ctrl_post") / col("n_ctrl_post") +
        col("__v_ctrl_pre") / col("n_ctrl_pre"))
    g.select(
      col("n_treat_pre"), col("n_treat_post"),
      col("n_ctrl_pre"), col("n_ctrl_post"),
      round(col("__m_treat_pre"), 6).as("mean_treat_pre"),
      round(col("__m_treat_post"), 6).as("mean_treat_post"),
      round(col("__m_ctrl_pre"), 6).as("mean_ctrl_pre"),
      round(col("__m_ctrl_post"), 6).as("mean_ctrl_post"),
      round(did, 6).as("did"),
      round(se, 6).as("se"),
      round(did / se, 6).as("t_stat"))
  }

  /**
   * Cochran–Mantel–Haenszel test (Cochran 1954; Mantel & Haenszel 1959)
   * over stratified 2×2 tables — "does treatment shift a BINARY outcome
   * after controlling for a stratifier": the categorical-outcome
   * companion of [[attStrata]] (which contrasts MEANS within strata)
   * and the stratified upgrade of a single 2×2 χ². Per stratum i with
   * cells (a,b;c,d), margins n1/n0/m1/m0 and total T:
   * E_i = n1·m1/T, V_i = n1·n0·m1·m0/(T²(T−1)), and
   * χ²_CMH = (Σa − ΣE)²/ΣV (1 dof; no continuity correction — the
   * large-stratum convention, documented). Also the Mantel–Haenszel
   * common odds ratio OR_MH = Σ(aᵢdᵢ/Tᵢ)/Σ(bᵢcᵢ/Tᵢ) — valid even when
   * per-stratum cells are too thin for their own OR.
   *
   * Single-subject strata contribute a − E = 0 identically and a null
   * V (skipped by the sum) — included, harmless, the textbook
   * treatment. Output: ONE row — n_strata, sum_a, sum_e, variance,
   * chi2, or_mh (6 dp; chi2 null when ΣV = 0, or_mh null when the
   * denominator is 0). Scale shape: ONE hash aggregate to stratum
   * grain (four conditional cells), then strata-sized arithmetic —
   * the [[srmCheck]] shape with a stratifier.
   */
  def cmhTest(df: DataFrame, stratumCol: String, treatedCol: String,
      outcomeCol: String): DataFrame = {
    val t = col(treatedCol).cast("boolean")
    val y = col(outcomeCol).cast("boolean")
    val cells = df
      .filter(col(stratumCol).isNotNull && t.isNotNull && y.isNotNull)
      .groupBy(col(stratumCol))
      .agg(sum(when(t && y, 1L).otherwise(0L)).as("a"),
        sum(when(t && !y, 1L).otherwise(0L)).as("b"),
        sum(when(!t && y, 1L).otherwise(0L)).as("c"),
        sum(when(!t && !y, 1L).otherwise(0L)).as("d"))
      .withColumn("n1", col("a") + col("b"))
      .withColumn("n0", col("c") + col("d"))
      .withColumn("m1", col("a") + col("c"))
      .withColumn("m0", col("b") + col("d"))
      .withColumn("tt", col("n1") + col("n0"))
    val ee = col("n1").cast("double") * col("m1") / col("tt")
    val v = when(col("tt") >= 2,
      col("n1").cast("double") * col("n0") * col("m1") * col("m0") /
        (col("tt").cast("double") * col("tt") * (col("tt") - 1)))
    val g = cells.agg(count(lit(1)).as("n_strata"),
      coalesce(sum(col("a")), lit(0L)).as("sum_a"),
      sum(ee).as("__se"), sum(v).as("__sv"),
      sum(col("a").cast("double") * col("d") / col("tt")).as("__on"),
      sum(col("b").cast("double") * col("c") / col("tt")).as("__od"))
    g.select(col("n_strata"), col("sum_a"),
      round(col("__se"), 6).as("sum_e"),
      round(col("__sv"), 6).as("variance"),
      round(when(col("__sv") > 0,
        (col("sum_a") - col("__se")) * (col("sum_a") - col("__se")) /
          col("__sv")), 6).as("chi2"),
      round(when(col("__od") > 0, col("__on") / col("__od")), 6)
        .as("or_mh"))
  }

  /**
   * Difference-in-differences EVENT STUDY (the dynamic DiD of Angrist &
   * Pischke's "leads and lags" regression, computed as per-period cell
   * contrasts): one effect per period, each normalized against the
   * declared `basePeriod` —
   *
   *   effect_p = (ȳ_T,p − ȳ_C,p) − (ȳ_T,base − ȳ_C,base)
   *
   * with the large-sample se over the four contributing cells. THE
   * diagnostic a single [[diffInDiff]] number hides: pre-treatment
   * periods should show effects ≈ 0 (the parallel-trends check made
   * visible), and post-treatment periods trace the effect's dynamics
   * (ramp, decay, novelty). The base period emits effect = 0 with null
   * se/t — normalized by construction, not estimated.
   *
   * Output: one row per period — period, n_treat, n_ctrl, mean_treat,
   * mean_ctrl, effect, se, t_stat (6 dp). A `basePeriod` ABSENT from
   * the data yields an EMPTY result (there is nothing to normalize
   * against — surface the misconfiguration, don't invent a baseline).
   * Scale shape: ONE hash aggregate to period grain (conditional
   * cells), the one-row base period broadcast back — the
   * [[diffInDiff]] shape fanned across periods.
   */
  def didEventStudy(df: DataFrame, treatedCol: String, periodCol: String,
      valueCol: String, basePeriod: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val t = col(treatedCol).cast("boolean")
    val byPeriod = df.filter(v.isNotNull && col(periodCol).isNotNull)
      .groupBy(col(periodCol).cast("string").as("period"))
      .agg(
        sum(when(t, 1L).otherwise(0L)).as("n_treat"),
        sum(when(!t, 1L).otherwise(0L)).as("n_ctrl"),
        avg(when(t, v)).as("__mt"), avg(when(!t, v)).as("__mc"),
        var_samp(when(t, v)).as("__vt"), var_samp(when(!t, v)).as("__vc"))
    val base = byPeriod.filter(col("period") === basePeriod)
      .select(col("__mt").as("__bmt"), col("__mc").as("__bmc"),
        col("__vt").as("__bvt"), col("__vc").as("__bvc"),
        col("n_treat").as("__bnt"), col("n_ctrl").as("__bnc"))
    val isBase = col("period") === basePeriod
    val eff = (col("__mt") - col("__mc")) - (col("__bmt") - col("__bmc"))
    val se = sqrt(col("__vt") / col("n_treat") + col("__vc") / col("n_ctrl") +
      col("__bvt") / col("__bnt") + col("__bvc") / col("__bnc"))
    byPeriod.crossJoin(broadcast(base))
      .select(col("period"), col("n_treat"), col("n_ctrl"),
        round(col("__mt"), 6).as("mean_treat"),
        round(col("__mc"), 6).as("mean_ctrl"),
        when(isBase, lit(0.0)).otherwise(round(eff, 6)).as("effect"),
        round(when(!isBase, se), 6).as("se"),
        round(when(!isBase && se > 0, eff / se), 6).as("t_stat"))
  }

  /**
   * Propensity-stratified treatment-effect estimate (Rosenbaum & Rubin
   * 1983 subclassification; Cochran 1968 showed 5 strata remove ~90% of
   * the bias a scalar confounder carries): bucket units into `strata`
   * equal-count bins of `scoreCol` (any scalar confounder proxy — a
   * fitted propensity, a pre-period activity score), compare treated vs
   * control WITHIN each bin, and weight the per-bin contrasts by treated
   * count for the ATT.
   *
   * Determinism: ntile over (score, tiebreak) — callers MUST pass a
   * tiebreak that makes the order total (e.g. the unit id); with a total
   * order the Spark and DuckDB/ANSI ntile definitions coincide (earlier
   * buckets take the remainder).
   *
   * Output: one row per stratum — n_treat, n_ctrl, mean_treat, mean_ctrl,
   * diff — plus the overall `att` repeated on every row (= Σ n_t·diff /
   * Σ n_t over strata with both arms present; 6 dp).
   *
   * Scale shape: ntile is one shuffle on the global score order (a
   * single-column sort of unit-grain rows — at 100 TB swap in
   * percentile-bucket assignment from an approx-quantile fit to avoid
   * the global sort; semantics identical up to boundary ties), then one
   * aggregate to strata grain and one window over ≤ `strata` rows.
   */
  def attStrata(df: DataFrame, scoreCol: String, treatedCol: String,
      outcomeCol: String, strata: Int,
      tiebreak: Seq[String] = Nil): DataFrame = {
    require(strata >= 2, "need >= 2 strata")
    val y = col(outcomeCol).cast("double")
    val t = col(treatedCol).cast("boolean")
    val order = Window.orderBy(
      (Seq(col(scoreCol)) ++ tiebreak.map(col)).map(_.asc): _*)
    val binned = df.filter(y.isNotNull && col(scoreCol).isNotNull)
      .withColumn("stratum", ntile(strata).over(order).cast("long"))
    val byStratum = binned.groupBy("stratum").agg(
      sum(when(t, 1L).otherwise(0L)).as("n_treat"),
      sum(when(!t, 1L).otherwise(0L)).as("n_ctrl"),
      avg(when(t, y)).as("__mt"),
      avg(when(!t, y)).as("__mc"))
    val both = col("n_treat") > 0 && col("n_ctrl") > 0
    val all = Window.partitionBy()
    byStratum
      .withColumn("__diff", col("__mt") - col("__mc"))
      .withColumn("__att",
        sum(when(both, col("__diff") * col("n_treat"))).over(all) /
          sum(when(both, col("n_treat"))).over(all))
      .select(col("stratum"), col("n_treat"), col("n_ctrl"),
        round(col("__mt"), 6).as("mean_treat"),
        round(col("__mc"), 6).as("mean_ctrl"),
        round(col("__diff"), 6).as("diff"),
        round(col("__att"), 6).as("att"))
  }

  /**
   * Standard-normal quantile Φ⁻¹(p) — Acklam's rational approximation
   * (peter.acklam 2003, |relative error| < 1.15e-9; the public-domain
   * algorithm every stats library without erfinv ships). Computed in
   * the JVM and injected into plans/oracles as a literal — the
   * [[sprtLlrConstants]] contract: no libm in the data path.
   */
  def zQuantile(p: Double): Double = {
    require(p > 0 && p < 1, "p in (0,1)")
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01,
      -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val d = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val pl = 0.02425
    if (p < pl) {
      val q = math.sqrt(-2 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    } else if (p <= 1 - pl) {
      val q = p - 0.5; val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
    } else {
      val q = math.sqrt(-2 * math.log(1 - p))
      -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    }
  }

  /**
   * Minimum-detectable-effect / required-sample-size readout — the
   * experiment-PLANNING complement of [[cuped]]/[[sprt]]/[[diffInDiff]]
   * (those read out a finished test; this answers "is the test worth
   * running, and for how long" BEFORE assignment). Two-sample
   * normal-approximation power algebra:
   *
   *   MDE = (z₁₋α/₂ + z_power) · √(s²_t/n_t + s²_c/n_c)
   *   n_req/arm = (z₁₋α/₂ + z_power)² · (s²_t + s²_c) / Δ²
   *
   * with Δ = `targetRelEffect` × the control mean, and per-arm sample
   * variances from the historical metric (the standard pre-experiment
   * sizing from logged data). The z quantiles are [[zQuantile]] JVM
   * literals — oracle-injectable, no libm in the plan.
   *
   * Output: ONE row — per-arm n/mean/variance (6 dp), `mde_abs` /
   * `mde_rel` (6 dp; null when a variance or the control mean is
   * degenerate), `n_required_per_arm` (ceil, null when Δ = 0). Scale
   * shape: one conditional hash-aggregate pass, then one-row
   * arithmetic — the [[diffInDiff]] shape.
   */
  def mdeReadout(df: DataFrame, armCol: String, valueCol: String,
      treatArm: String, ctrlArm: String, alpha: Double = 0.05,
      power: Double = 0.8, targetRelEffect: Double = 0.02): DataFrame = {
    require(alpha > 0 && alpha < 1 && power > 0 && power < 1,
      "alpha and power in (0,1)")
    require(targetRelEffect > 0, "targetRelEffect must be > 0")
    val zSum = zQuantile(1 - alpha / 2) + zQuantile(power)
    val v = col(valueCol).cast("double")
    val t = col(armCol) === treatArm
    val c = col(armCol) === ctrlArm
    val g = df.filter(v.isNotNull && (t || c)).agg(
      sum(when(t, 1L).otherwise(0L)).as("n_treat"),
      sum(when(c, 1L).otherwise(0L)).as("n_ctrl"),
      avg(when(t, v)).as("__mt"), avg(when(c, v)).as("__mc"),
      var_samp(when(t, v)).as("__vt"), var_samp(when(c, v)).as("__vc"))
    val mde = lit(zSum) * sqrt(col("__vt") / col("n_treat") +
      col("__vc") / col("n_ctrl"))
    val delta = lit(targetRelEffect) * col("__mc")
    g.select(col("n_treat"), col("n_ctrl"),
      round(col("__mt"), 6).as("mean_treat"),
      round(col("__mc"), 6).as("mean_ctrl"),
      round(col("__vt"), 6).as("var_treat"),
      round(col("__vc"), 6).as("var_ctrl"),
      round(when(col("n_treat") > 1 && col("n_ctrl") > 1, mde), 6)
        .as("mde_abs"),
      round(when(col("n_treat") > 1 && col("n_ctrl") > 1 &&
        col("__mc") =!= 0, mde / col("__mc")), 6).as("mde_rel"),
      when(col("__mc") =!= 0 && col("n_treat") > 1 && col("n_ctrl") > 1,
        ceil(lit(zSum * zSum) * (col("__vt") + col("__vc")) /
          (delta * delta)).cast("long")).as("n_required_per_arm"))
  }

  /**
   * Inverse-propensity-weighted ATE (Horvitz–Thompson 1952 weighting,
   * Hájek-normalized — the ratio form every production causal library
   * defaults to because it tolerates weight noise): with a DECLARED
   * propensity e(x) per unit, μ̂₁ = Σ t·y/e ÷ Σ t/e,
   * μ̂₀ = Σ (1−t)·y/(1−e) ÷ Σ (1−t)/(1−e), ATE = μ̂₁ − μ̂₀. The
   * observational complement of [[attStrata]]: stratification buckets
   * the score, IPW uses it at full resolution. Deliberately the
   * declared-propensity form (fit upstream — logistic, gradient
   * boosting, whatever); estimation stays deterministic and
   * oracle-checkable.
   *
   * `clipLo`/`clipHi` clip the propensity before weighting (the
   * standard positivity guard — a unit with e ≈ 0 otherwise dominates
   * the whole estimate), and the output carries the Kish effective
   * sample sizes (Σw)²/Σw² per arm — THE overlap diagnostic: ESS far
   * below n means the weights concentrated and the estimate is
   * fragile.
   *
   * Output: ONE row — n, n_treat, n_ctrl, mu_treat, mu_ctrl, ate,
   * ess_treat, ess_ctrl (6 dp). Scale shape: one conditional
   * hash-aggregate pass, then one-row arithmetic (the [[diffInDiff]]
   * shape).
   */
  def ipwAte(df: DataFrame, treatedCol: String, outcomeCol: String,
      propensityCol: String, clipLo: Double = 0.05,
      clipHi: Double = 0.95): DataFrame = {
    require(clipLo > 0 && clipLo < clipHi && clipHi < 1,
      "need 0 < clipLo < clipHi < 1")
    val t = col(treatedCol).cast("boolean")
    val y = col(outcomeCol).cast("double")
    val e = least(greatest(col(propensityCol).cast("double"),
      lit(clipLo)), lit(clipHi))
    val wt = when(t, lit(1.0) / e)
    val wc = when(!t, lit(1.0) / (lit(1.0) - e))
    df.filter(y.isNotNull && t.isNotNull &&
        col(propensityCol).isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(when(t, 1L).otherwise(0L)).as("n_treat"),
        sum(when(!t, 1L).otherwise(0L)).as("n_ctrl"),
        sum(wt).as("__swt"), sum(wt * y).as("__swty"),
        sum(wt * wt).as("__swt2"),
        sum(wc).as("__swc"), sum(wc * y).as("__swcy"),
        sum(wc * wc).as("__swc2"))
      .select(col("n"), col("n_treat"), col("n_ctrl"),
        round(col("__swty") / col("__swt"), 6).as("mu_treat"),
        round(col("__swcy") / col("__swc"), 6).as("mu_ctrl"),
        round(col("__swty") / col("__swt") -
          col("__swcy") / col("__swc"), 6).as("ate"),
        round(col("__swt") * col("__swt") / col("__swt2"), 6)
          .as("ess_treat"),
        round(col("__swc") * col("__swc") / col("__swc2"), 6)
          .as("ess_ctrl"))
  }

  /**
   * Doubly-robust / AIPW ATE (Robins, Rotnitzky & Zhao 1994; the
   * augmented inverse-propensity estimator): with DECLARED propensity
   * e(x) AND declared outcome-model predictions μ̂₁(x), μ̂₀(x), the
   * per-unit influence contribution is
   *
   *   ψ = [ t·(y − μ̂₁)/e + μ̂₁ ] − [ (1−t)·(y − μ̂₀)/(1−e) + μ̂₀ ]
   *
   * and ATE = mean(ψ). Consistent if EITHER model is right (the
   * "double robustness") — the estimator the causal-ML stack
   * (TMLE/DML) reduces to once nuisance models are fitted upstream.
   * Completes the observational family: [[attStrata]] (bucketed
   * score) → [[ipwAte]] (weights only) → this (weights + outcome
   * model). Same positivity clipping; same declared-nuisance
   * philosophy — fitting stays upstream, estimation stays
   * deterministic and oracle-checkable.
   *
   * Output: ONE row — n, mu_treat, mu_ctrl, ate, se (influence-curve
   * standard error sd(ψ)/√n), t_stat (6 dp). Scale shape: one
   * aggregate pass, one-row arithmetic (the [[diffInDiff]] shape).
   */
  def aipwAte(df: DataFrame, treatedCol: String, outcomeCol: String,
      propensityCol: String, mu1Col: String, mu0Col: String,
      clipLo: Double = 0.05, clipHi: Double = 0.95): DataFrame = {
    require(clipLo > 0 && clipLo < clipHi && clipHi < 1,
      "need 0 < clipLo < clipHi < 1")
    val t = col(treatedCol).cast("boolean")
    val y = col(outcomeCol).cast("double")
    val m1 = col(mu1Col).cast("double")
    val m0 = col(mu0Col).cast("double")
    val e = least(greatest(col(propensityCol).cast("double"),
      lit(clipLo)), lit(clipHi))
    val termT = when(t, (y - m1) / e).otherwise(lit(0.0)) + m1
    val termC = when(!t, (y - m0) / (lit(1.0) - e)).otherwise(lit(0.0)) + m0
    val psi = termT - termC
    df.filter(y.isNotNull && t.isNotNull && col(propensityCol).isNotNull &&
        m1.isNotNull && m0.isNotNull)
      .agg(count(lit(1)).as("n"),
        avg(termT).as("__mt"), avg(termC).as("__mc"),
        avg(psi).as("__ate"), stddev_samp(psi).as("__sd"))
      .select(col("n"),
        round(col("__mt"), 6).as("mu_treat"),
        round(col("__mc"), 6).as("mu_ctrl"),
        round(col("__ate"), 6).as("ate"),
        round(col("__sd") / sqrt(col("n")), 6).as("se"),
        round(when(col("__sd") > 0,
          col("__ate") / (col("__sd") / sqrt(col("n")))), 6).as("t_stat"))
  }

  /**
   * Off-policy REPLAY evaluation (Li, Chu, Langford & Wang, WSDM 2011,
   * "Unbiased offline evaluation of contextual-bandit-based news
   * article recommendation algorithms"): score a target policy from
   * LOGGED (context, arm, reward) data by keeping exactly the rows
   * where the logged arm equals the policy's arm — under uniform
   * logging the matched rows' mean reward is an unbiased estimate of
   * the policy's online reward. THE standard "would this targeting
   * rule beat what we shipped" readout before an A/B slot is spent.
   *
   * `policy` is a (ctx, arm) mapping table — deterministic, e.g.
   * [[greedyPolicy]] fitted on an earlier slice. Output: ONE row —
   * `n_logged`, `n_matched`, `match_rate` (6 dp), `reward_policy`
   * (matched-rows mean, 6 dp; null when nothing matched),
   * `reward_logged` (all-rows mean, the shipped baseline, 6 dp).
   * Scale shape: one broadcast join of the ctx-grain policy onto the
   * log scan, one conditional aggregate — nothing log-grain survives.
   */
  def replayEval(logs: DataFrame, ctxCol: String, armCol: String,
      rewardCol: String, policy: DataFrame): DataFrame = {
    val r = col(rewardCol).cast("double")
    val pol = policy.select(col("ctx").as("__ctx"), col("arm").as("__parm"))
    // All three emitted ratios are integer-grid sums over a row count —
    // exactly the midpoint-rounding trap (a double ROUND lands ON the
    // half-micro boundary with probability ~1/n, where engines
    // disagree) — so each quantizes half-AWAY-FROM-ZERO in EXACT
    // integer arithmetic: |s| through (2|s| + n) div 2n, sign restored
    // (the plain (2s+n) div 2n form is truncation-vs-floor divergent
    // across engines for NEGATIVE sums — rewards are allowed to be
    // costs). Values expected at <= 6-dp grain (the micro-unit regime).
    logs.filter(r.isNotNull && col(ctxCol).isNotNull && col(armCol).isNotNull)
      .join(broadcast(pol), col(ctxCol) === col("__ctx"), "left")
      .withColumn("__hit", col("__parm").isNotNull &&
        col(armCol) === col("__parm"))
      .withColumn("__ru", round(r * 1e6).cast("long"))
      .agg(count(lit(1)).as("n_logged"),
        // empty log slice: 0 matched, not NULL-as-unknown
        coalesce(sum(when(col("__hit"), 1L).otherwise(0L)), lit(0L))
          .as("n_matched"),
        sum(when(col("__hit"), col("__ru"))).as("__sp"),
        sum(col("__ru")).as("__sl"))
      .select(col("n_logged"), col("n_matched"),
        (expr("(n_matched * 2000000 + n_logged) div (2 * n_logged)")
          .cast("double") / 1e6).as("match_rate"),
        when(col("n_matched") > 0,
          expr("""CASE WHEN __sp >= 0
                  THEN (__sp * 2 + n_matched) div (2 * n_matched)
                  ELSE -(((-__sp) * 2 + n_matched) div (2 * n_matched))
                  END""").cast("double") / 1e6).as("reward_policy"),
        (expr("""CASE WHEN __sl >= 0
                 THEN (__sl * 2 + n_logged) div (2 * n_logged)
                 ELSE -(((-__sl) * 2 + n_logged) div (2 * n_logged))
                 END""").cast("double") / 1e6).as("reward_logged"))
  }

  /**
   * Greedy policy fit for [[replayEval]]: per context, the arm with the
   * best historical mean reward — the argmax orders on EXACT integer
   * micro-unit sums cross-multiplied (sum_a·n_b vs sum_b·n_a, no
   * division) with a min-arm tiebreak, so the fitted table is
   * engine-stable. One hash-aggregate to (ctx, arm) grain, one window
   * over arms per ctx.
   */
  def greedyPolicy(fit: DataFrame, ctxCol: String, armCol: String,
      rewardCol: String): DataFrame = {
    val r = col(rewardCol).cast("double")
    val g = fit
      .filter(r.isNotNull && col(ctxCol).isNotNull && col(armCol).isNotNull)
      .groupBy(col(ctxCol).as("ctx"), col(armCol).as("arm"))
      .agg(sum(round(r * 1e6).cast("long")).as("__s"),
        count(lit(1)).as("__n"))
    // the argmax key is a DOUBLE DIVISION OF EXACT INTEGERS — IEEE
    // division is bit-identical across engines, so the order (and the
    // min-arm tiebreak after it) replays exactly in the oracle
    val w = Window.partitionBy(col("ctx")).orderBy(
      (col("__s").cast("double") / col("__n")).desc,
      col("__s").desc, col("arm").asc)
    g.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("ctx"), col("arm"),
        round(col("__s").cast("double") / 1e6 / col("__n"), 6)
          .as("mean_reward"), col("__n").as("n_fit"))
  }

  /**
   * Delta-method ratio-metric test (Deng, Knoblich & Lu, KDD 2018,
   * "Applying the Delta Method in Metric Analytics") — the correct
   * variance for EVENT-grain ratio metrics under CLUSTER-grain
   * randomization, the single most common analysis bug in
   * experimentation: revenue-per-event, CTR, items-per-session are
   * ratios of sums whose terms are correlated WITHIN a user, so the
   * naive event-grain t-test understates variance (users are the
   * i.i.d. units, not events). Per arm, with per-cluster sums
   * (x_i, y_i) over n clusters and R = Σx/Σy:
   *
   *   Var(R) ≈ (s_xx − 2·R·s_xy + R²·s_yy) / (n · ȳ²)
   *
   * (sample (co)variances of the cluster sums; ȳ = Σy/n), and the
   * two-arm z is (R_t − R_c)/√(Var_t + Var_c). Also the SWITCHBACK
   * analysis: randomize time buckets instead of users and pass the
   * bucket as the cluster — same estimator, clusters = time units.
   *
   * Output: ONE row — n_treat / n_ctrl (clusters), r_treat, r_ctrl,
   * diff, se, z_stat (6 dp; null se/z when a side has < 2 clusters or
   * zero denominator). Scale shape: one hash aggregate to cluster
   * grain, one to arm grain, one-row arithmetic — the [[diffInDiff]]
   * shape. Feed exact integer units (cents/micros) as `numCol` so the
   * cluster sums are engine-identical.
   */
  def deltaMethodRatio(df: DataFrame, armCol: String,
      clusterCols: Seq[String], numCol: String, denCol: String,
      treatArm: String, ctrlArm: String): DataFrame = {
    require(treatArm != ctrlArm, "arms must differ")
    val arm = col(armCol).cast("string")
    val byCluster = df
      .filter(col(numCol).isNotNull && col(denCol).isNotNull &&
        arm.isin(treatArm, ctrlArm))
      .groupBy(clusterCols.map(col) :+ arm.as("__arm"): _*)
      .agg(sum(col(numCol).cast("double")).as("__x"),
        sum(col(denCol).cast("double")).as("__y"))
    val t = col("__arm") === treatArm
    def s(p: Column, c: Column) = sum(when(p, c))
    // coalesce the cluster counts: a sum over an EMPTY relation (zero
    // rows surviving the arm/null filter) is NULL, which would read as
    // "unknown" where the natural answer is 0 clusters
    val g = byCluster.agg(
      coalesce(sum(when(t, 1L).otherwise(0L)), lit(0L)).as("n_treat"),
      coalesce(sum(when(!t, 1L).otherwise(0L)), lit(0L)).as("n_ctrl"),
      s(t, col("__x")).as("sxt"), s(t, col("__y")).as("syt"),
      s(t, col("__x") * col("__x")).as("sxxt"),
      s(t, col("__x") * col("__y")).as("sxyt"),
      s(t, col("__y") * col("__y")).as("syyt"),
      s(!t, col("__x")).as("sxc"), s(!t, col("__y")).as("syc"),
      s(!t, col("__x") * col("__x")).as("sxxc"),
      s(!t, col("__x") * col("__y")).as("sxyc"),
      s(!t, col("__y") * col("__y")).as("syyc"))
    def side(n: Column, sx: Column, sy: Column, sxx: Column, sxy: Column,
        syy: Column): (Column, Column) = {
      val nd = n.cast("double")
      val r = when(sy =!= 0.0, sx / sy)
      val sXX = (sxx - sx * sx / nd) / (nd - lit(1.0))
      val sXY = (sxy - sx * sy / nd) / (nd - lit(1.0))
      val sYY = (syy - sy * sy / nd) / (nd - lit(1.0))
      val yBar = sy / nd
      // the quadratic form is >= 0 analytically but catastrophic
      // cancellation can land it an ulp below zero when x/y is
      // (near-)constant per cluster (true Var = 0) — clamp, or Spark
      // emits se = NaN and other engines' sqrt throws (mirrored in the
      // oracle; the regressionDiscontinuity rss clamp convention)
      val v = when(n >= 2 && sy =!= 0.0,
        greatest(sXX - lit(2.0) * r * sXY + r * r * sYY, lit(0.0)) /
          (nd * (yBar * yBar)))
      (r, v)
    }
    val (rt, vt) = side(col("n_treat"), col("sxt"), col("syt"),
      col("sxxt"), col("sxyt"), col("syyt"))
    val (rc, vc) = side(col("n_ctrl"), col("sxc"), col("syc"),
      col("sxxc"), col("sxyc"), col("syyc"))
    val se = sqrt(vt + vc)
    g.select(col("n_treat"), col("n_ctrl"),
      round(rt, 6).as("r_treat"), round(rc, 6).as("r_ctrl"),
      round(rt - rc, 6).as("diff"),
      round(se, 6).as("se"),
      round(when(se > 0, (rt - rc) / se), 6).as("z_stat"))
  }

  /**
   * Sharp regression-discontinuity effect (Thistlethwaite & Campbell
   * 1960; Imbens & Lemieux 2008 practitioner form): units just below
   * and just above an assignment `cutoff` on a running variable are
   * locally comparable, so the treatment effect at the threshold is
   * the JUMP between two local linear fits — OLS of outcome on
   * (running − cutoff), fitted separately within `bandwidth` on each
   * side, effect = intercept_right − intercept_left. Completes the
   * observational family ([[diffInDiff]] parallel trends, [[attStrata]]
   * / [[ipwAte]] / [[aipwAte]] unconfoundedness, this one exploits the
   * assignment RULE itself — the design behind every score-threshold
   * rollout readout).
   *
   * Deliberately the closed-form uniform-kernel OLS (slopes and
   * intercepts from the five sufficient sums per side): deterministic,
   * one aggregate pass, SQL-replayable — triangular kernels and
   * data-driven bandwidths are a modeling layer the caller owns.
   * Intercept standard errors use the textbook homoskedastic form
   * s²(1/n + x̄²/Sxx); se(effect) = √(se_L² + se_R²). Sides with < 3
   * units or zero x-variance emit null fit columns (and a null
   * effect): a vertical or underdetermined fit must not read as a
   * finding.
   *
   * Output: ONE row — n_left, n_right, int_left, slope_left,
   * int_right, slope_right, effect, se, t_stat (6 dp). Scale shape:
   * ONE conditional hash-aggregate pass over the bandwidth window
   * (filter pushed to the scan), then one-row arithmetic — the
   * [[diffInDiff]] shape.
   */
  def regressionDiscontinuity(df: DataFrame, runningCol: String,
      outcomeCol: String, cutoff: Double, bandwidth: Double): DataFrame = {
    require(bandwidth > 0, "bandwidth must be > 0")
    val xr = col(runningCol).cast("double") - lit(cutoff)
    val y = col(outcomeCol).cast("double")
    val in = df.filter(y.isNotNull && col(runningCol).isNotNull &&
      abs(col(runningCol).cast("double") - lit(cutoff)) <= lit(bandwidth))
    val right = xr >= 0
    def s(p: Column, c: Column) = sum(when(p, c))
    val g = in.agg(
      sum(when(right, 1L).otherwise(0L)).as("n_right"),
      sum(when(!right, 1L).otherwise(0L)).as("n_left"),
      s(right, xr).as("sxr"), s(right, y).as("syr"),
      s(right, xr * xr).as("sxxr"), s(right, xr * y).as("sxyr"),
      s(right, y * y).as("syyr"),
      s(!right, xr).as("sxl"), s(!right, y).as("syl"),
      s(!right, xr * xr).as("sxxl"), s(!right, xr * y).as("sxyl"),
      s(!right, y * y).as("syyl"))
    def fit(n: Column, sx: Column, sy: Column, sxx: Column, sxy: Column,
        syy: Column): (Column, Column, Column) = {
      val nd = n.cast("double")
      val den = nd * sxx - sx * sx
      val ok = n >= 3 && den > 0
      val slope = when(ok, (nd * sxy - sx * sy) / den)
      val icept = when(ok, (sy - slope * sx) / nd)
      // computational-form residual SS can land an ulp below zero on a
      // perfect fit — clamp (mirrored in the oracle)
      val rss = greatest(syy - icept * sy - slope * sxy, lit(0.0))
      val s2 = rss / (nd - lit(2.0))
      val sxxC = sxx - sx * sx / nd
      // sxxC is a differently-rounded den/nd: with razor-thin x-variance
      // it can land at 0 or an ulp below while den > 0 still passes —
      // guard it, or the se term divides by <= 0 (Inf/NaN instead of the
      // documented null-on-underdetermined contract)
      val seI = when(ok && sxxC > 0,
        sqrt(s2 * (lit(1.0) / nd + (sx / nd) * (sx / nd) / sxxC)))
      (icept, slope, seI)
    }
    val (il, sl, seL) = fit(col("n_left"), col("sxl"), col("syl"),
      col("sxxl"), col("sxyl"), col("syyl"))
    val (ir, sr, seR) = fit(col("n_right"), col("sxr"), col("syr"),
      col("sxxr"), col("sxyr"), col("syyr"))
    val eff = ir - il
    val se = sqrt(seL * seL + seR * seR)
    g.select(col("n_left"), col("n_right"),
      round(il, 6).as("int_left"), round(sl, 6).as("slope_left"),
      round(ir, 6).as("int_right"), round(sr, 6).as("slope_right"),
      round(eff, 6).as("effect"), round(se, 6).as("se"),
      round(when(se > 0, eff / se), 6).as("t_stat"))
  }

  /**
   * DOUBLY-ROBUST off-policy evaluation (Dudík, Langford & Li, ICML
   * 2011, "Doubly Robust Policy Evaluation and Learning") — the
   * estimator [[replayEval]] graduates to the moment logging isn't
   * uniform: per logged row,
   *
   *   ψ = μ̂(x, π(x)) + 1{a = π(x)} · (r − μ̂(x, a)) / p(a|x)
   *
   * and V̂_DR = mean(ψ), where π is the deterministic target `policy`
   * (ctx → arm), p is the DECLARED logging propensity of the row's OWN
   * logged arm, and μ̂ is a DECLARED reward model at (ctx, arm) grain —
   * the [[aipwAte]] declared-nuisance philosophy (fit upstream, keep
   * the estimation deterministic and oracle-checkable). Unbiased if
   * EITHER the propensities or the reward model is right; the model
   * term kills the IPS variance on unmatched rows.
   *
   * Coverage contracts: rows whose ctx the policy does not cover are
   * DROPPED (DR needs μ̂ at the policy's arm, so the estimand is the
   * policy's value over covered contexts — [[replayEval]] instead
   * counts them as unmatched because its estimand never consults a
   * model); a MISSING model cell contributes μ̂ = 0, degrading that row
   * to pure IPS (the paper's μ̂ ≡ 0 special case), so an EMPTY model
   * table turns the whole estimator into clipped IPS. `clipLo` floors
   * the propensity (positivity guard, the [[ipwAte]] convention).
   *
   * Output: ONE row — n_logged (covered rows), n_matched, match_rate
   * (exact integer half-up quantization, the [[replayEval]] contract),
   * value_model (mean μ̂ at the policy arm), value_dr, se
   * (influence-curve sd(ψ)/√n, 6 dp). Scale shape: the ctx-grain
   * policy and the (ctx × arms)-grain model both broadcast onto ONE
   * log scan; one aggregate — nothing log-grain survives.
   */
  def drReplay(logs: DataFrame, ctxCol: String, armCol: String,
      rewardCol: String, propensityCol: String, policy: DataFrame,
      model: DataFrame, clipLo: Double = 0.01): DataFrame = {
    require(clipLo > 0 && clipLo < 1, "need 0 < clipLo < 1")
    val r = col(rewardCol).cast("double")
    val pol = policy.select(col("ctx").as("__ctx"), col("arm").as("__parm"))
    val mPi = model.select(col("ctx").as("__mc1"), col("arm").as("__ma1"),
      col("mu").cast("double").as("__mu_pi"))
    val mA = model.select(col("ctx").as("__mc2"), col("arm").as("__ma2"),
      col("mu").cast("double").as("__mu_a"))
    val p = greatest(col(propensityCol).cast("double"), lit(clipLo))
    logs.filter(r.isNotNull && col(ctxCol).isNotNull &&
        col(armCol).isNotNull && col(propensityCol).isNotNull)
      .join(broadcast(pol), col(ctxCol) === col("__ctx"))
      .join(broadcast(mPi), col(ctxCol) === col("__mc1") &&
        col("__parm") === col("__ma1"), "left")
      .join(broadcast(mA), col(ctxCol) === col("__mc2") &&
        col(armCol) === col("__ma2"), "left")
      .withColumn("__hit", col(armCol) === col("__parm"))
      .withColumn("__mp", coalesce(col("__mu_pi"), lit(0.0)))
      .withColumn("__psi", col("__mp") + when(col("__hit"),
        (r - coalesce(col("__mu_a"), lit(0.0))) / p).otherwise(lit(0.0)))
      .agg(count(lit(1)).as("n_logged"),
        // empty covered slice: 0 matched, not NULL-as-unknown
        coalesce(sum(when(col("__hit"), 1L).otherwise(0L)), lit(0L))
          .as("n_matched"),
        avg(col("__mp")).as("__vm"), avg(col("__psi")).as("__vd"),
        stddev_samp(col("__psi")).as("__sd"))
      .select(col("n_logged"), col("n_matched"),
        (expr("(n_matched * 2000000 + n_logged) div (2 * n_logged)")
          .cast("double") / 1e6).as("match_rate"),
        round(col("__vm"), 6).as("value_model"),
        round(col("__vd"), 6).as("value_dr"),
        round(col("__sd") / sqrt(col("n_logged")), 6).as("se"))
  }

  /**
   * Instrumental-variable (Wald / just-identified 2SLS) estimator with
   * a BINARY instrument (Angrist, Imbens & Rubin 1996) — the causal
   * answer when treatment is self-selected but an ENCOURAGEMENT was
   * randomized (the feature was offered, not forced): LATE =
   * ITT_y / ITT_x, the outcome intent-to-treat effect scaled by the
   * compliance lift. Complements [[ipwAte]]/[[aipwAte]] (which assume
   * all confounders observed): IV needs only instrument validity.
   *
   * SE via the delta method on the ratio of mean differences:
   *   var(LATE) = (varA + LATE²·varB − 2·LATE·covAB) / ITT_x²
   * where varA/varB/covAB are the sampling (co)variances of the two
   * ITTs (per-arm var_samp/covar_samp over n). The quadratic form is
   * clamped at 0 before the sqrt (the [[deltaMethodRatio]] convention —
   * perfect-correlation fixtures cancel an ulp negative).
   *
   * Output: one row `(n1, n0, itt_y, itt_x, late, se, z)`, 6 dp —
   * n1/n0 encouraged/control counts (coalesced to 0 on empty input);
   * late/se/z null when an arm is empty, compliance is zero (no first
   * stage — the instrument moved nobody), or the variance degenerates.
   *
   * Scale shape: ONE hash-aggregate pass producing per-arm
   * (n, mean, var, cov) — map-side combined, no window, no join (the
   * [[graft.stats.Planners.welchT]] shape).
   */
  def ivWald(df: DataFrame, instrumentCol: String, treatCol: String,
      outcomeCol: String): DataFrame = {
    val z1 = col(instrumentCol).cast("boolean") === true
    val x = col(treatCol).cast("double")
    val y = col(outcomeCol).cast("double")
    val a = df.filter(col(instrumentCol).isNotNull && x.isNotNull &&
        y.isNotNull)
      .agg(
        coalesce(sum(when(z1, 1L).otherwise(0L)), lit(0L)).as("n1"),
        coalesce(sum(when(!z1, 1L).otherwise(0L)), lit(0L)).as("n0"),
        avg(when(z1, y)).as("__my1"), avg(when(!z1, y)).as("__my0"),
        avg(when(z1, x)).as("__mx1"), avg(when(!z1, x)).as("__mx0"),
        var_samp(when(z1, y)).as("__vy1"), var_samp(when(!z1, y)).as("__vy0"),
        var_samp(when(z1, x)).as("__vx1"), var_samp(when(!z1, x)).as("__vx0"),
        covar_samp(when(z1, y), when(z1, x)).as("__c1"),
        covar_samp(when(!z1, y), when(!z1, x)).as("__c0"))
    val itty = col("__my1") - col("__my0")
    val ittx = col("__mx1") - col("__mx0")
    // null-safe denominators, NOT when-guarded divisions: ANSI mode +
    // codegen subexpression elimination can hoist a shared division out
    // of its CASE branch, so a zero divisor must become NULL before the
    // divide (x / NULL is NULL, never an error)
    val ittxSafe = when(ittx =!= 0, ittx)
    val n1S = when(col("n1") > 0, col("n1"))
    val n0S = when(col("n0") > 0, col("n0"))
    val late = itty / ittxSafe
    val varA = col("__vy1") / n1S + col("__vy0") / n0S
    val varB = col("__vx1") / n1S + col("__vx0") / n0S
    val covAB = col("__c1") / n1S + col("__c0") / n0S
    val ok = col("n1") > 1 && col("n0") > 1
    val se = sqrt(greatest(varA + late * late * varB
      - lit(2.0) * late * covAB, lit(0.0))) / abs(ittxSafe)
    val seSafe = when(se > 0, se)
    a.select(col("n1"), col("n0"),
      round(itty, 6).as("itt_y"), round(ittx, 6).as("itt_x"),
      round(when(ok, late), 6).as("late"),
      round(when(ok, se), 6).as("se"),
      round(when(ok, late / seSafe), 6).as("z"))
  }
}

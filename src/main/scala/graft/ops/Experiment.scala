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
    val wk = Window.partitionBy(keys.map(col): _*)
    val withLlr = df
      .withColumn("__i", row_number().over(w))
      .withColumn("__pos", sum(xi).over(run))
      .withColumn("__llr",
        col("__pos") * lit(c1) + (col("__i") - col("__pos")) * lit(c0))
      .withColumn("__dec",
        when(col("__llr") >= hi, lit("accept_h1"))
          .when(col("__llr") <= lo, lit("accept_h0")))
    // The report row per key is the FIRST crossing, or the last
    // observation if the test never decides — one unpartitioned-free
    // window pass, no self-join.
    withLlr
      .withColumn("__n", max(col("__i")).over(wk))
      .withColumn("__hit",
        min(when(col("__dec").isNotNull, col("__i"))).over(wk))
      .filter(col("__i") === coalesce(col("__hit"), col("__n")))
      .select(
        (keys.map(col) :+
          col("__n").cast("long").as("n_total") :+
          col("__i").cast("long").as("n_decision") :+
          round(col("__llr"), 6).as("llr") :+
          coalesce(col("__dec"), lit("continue")).as("decision")): _*)
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
      .withColumn("__e", col("__n") * col("__share"))
      .withColumn("__chi", (col("n_obs") - col("__e")) *
        (col("n_obs") - col("__e")) / col("__e"))
      .select(col("arm"), col("n_obs"),
        round(col("__e"), 6).as("expected"),
        round(col("n_obs") / col("__n").cast("double"), 6).as("ratio_obs"),
        round(sum(col("__chi")).over(all), 6).as("chi2"),
        lit(expected.size - 1).cast("long").as("dof"))
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
}

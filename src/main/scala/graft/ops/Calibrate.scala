package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Score calibration: turn a ranking score into a probability. The
 * calibration REPORT (ECE/Brier, `queries/MlOps`) measures miscalibration;
 * this is the standard fix — isotonic regression (Zadrozny & Elkan 2002),
 * the non-parametric recalibrator that only assumes "higher score ⇒ no
 * lower probability".
 */
object Calibrate {

  /**
   * Isotonic calibration curve over score bins, computed by the MINIMAX
   * characterization of the pool-adjacent-violators solution
   * (Robertson/Wright/Dykstra 1988, §1.2):
   *   iso_i = max_{a ≤ i} min_{b ≥ i} (Σ_{k∈[a,b]} pos_k) / (Σ_{k∈[a,b]} n_k)
   * — a closed FORM, not an iterative pooling loop, which is what makes
   * the fit replayable in SQL (the DuckDB oracle enumerates the same
   * segments) and shuffle-free at scale: rows bin once (one ntile over
   * the corpus), and everything after is B-grain — segment sums over the
   * B-row cumulative table, a B³ enumeration (B=10 ⇒ 1000 rows) that
   * never touches the corpus again. Weighted by construction (bins carry
   * their counts), exact by construction (every segment average is one
   * integer/integer division — both engines produce identical doubles).
   *
   * Output: one row per score bin — `(bin, n, pos, raw_prob, iso_prob)`,
   * probs 6 dp; `iso_prob` is nondecreasing in `bin` (spec-enforced) and
   * equals classic PAV output exactly.
   */
  def isotonicBins(df: DataFrame, scoreCol: String, labelCol: String,
      idCol: String, buckets: Int = 10): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val binW = Window.partitionBy(lit(1))
      .orderBy(col(scoreCol).asc, col(idCol).asc)
    val g = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(ntile(buckets).over(binW).cast("long").as("bin"),
        col(labelCol).cast("boolean").as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("pos"))
    val ord = Window.partitionBy(lit(1)).orderBy(col("bin").asc)
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = g
      .withColumn("cn", sum(col("n")).over(run))
      .withColumn("cp", sum(col("pos")).over(run))
    // segment [a, b] averages from the cumulative table
    val segs = cum.select(col("bin").as("b"), col("cn").as("cnb"),
        col("cp").as("cpb"))
      .join(cum.select(col("bin").as("a"),
        (col("cn") - col("n")).as("cna"), (col("cp") - col("pos")).as("cpa")),
        col("a") <= col("b"))
      .select(col("a"), col("b"),
        ((col("cpb") - col("cpa")).cast("double") /
          (col("cnb") - col("cna"))).as("seg_avg"))
    val bins = g.select(col("bin").as("i"))
    val inner = bins.join(segs, col("a") <= col("i") && col("i") <= col("b"))
      .groupBy(col("i"), col("a")).agg(min(col("seg_avg")).as("m"))
      .groupBy(col("i")).agg(max(col("m")).as("iso"))
    g.join(inner, col("bin") === col("i"))
      .select(col("bin"), col("n"), col("pos"),
        round(col("pos").cast("double") / col("n"), 6).as("raw_prob"),
        round(col("iso"), 6).as("iso_prob"))
  }

  /**
   * Spiegelhalter's calibration z-test (Spiegelhalter 1986, "Probabilistic
   * prediction in patient management and clinical trials") — the
   * SIGNIFICANCE test behind a calibration report: ECE/reliability bins
   * say HOW miscalibrated a probability column looks; this says whether
   * the miscalibration exceeds chance. Decomposes the Brier score's
   * deviation from its perfect-calibration expectation:
   *
   *   z = Σ (yᵢ − pᵢ)(1 − 2pᵢ) / √( Σ (1 − 2pᵢ)²·pᵢ·(1 − pᵢ) )
   *
   * ~N(0,1) when the pᵢ are honest. |z| > 1.96 at 5% — the usual
   * no-p-value-table reporting convention ([[graft.stats.Planners.welchT]]).
   * Note p = 0.5 predictions carry zero weight (1 − 2p = 0): the test
   * has no power exactly where miscalibration is invisible to Brier.
   *
   * Output: one row (n, z) — z null when the variance term is 0 (all
   * predictions at 0, 0.5, or 1). Scale shape: ONE aggregate pass, two
   * sums — no window, no join.
   */
  def spiegelhalterZ(df: DataFrame, probCol: String,
      labelCol: String): DataFrame = {
    val p = col(probCol).cast("double")
    val y = col(labelCol).cast("double")
    val w = lit(1.0) - lit(2.0) * p
    df.filter(p.isNotNull && y.isNotNull && p >= 0 && p <= 1)
      .agg(count(lit(1)).as("n"),
        sum((y - p) * w).as("__num"),
        sum(w * w * p * (lit(1.0) - p)).as("__den"))
      .select(col("n"),
        round(when(col("__den") > 0, col("__num") / sqrt(col("__den"))), 6)
          .as("z"))
  }

  /**
   * Murphy decomposition of the Brier score (Murphy 1973) over
   * fixed-width probability bins — the WHY behind [[spiegelhalterZ]]'s
   * whether: Brier = reliability − resolution + uncertainty (+ the
   * within-bin forecast-variance residual the binning introduces).
   *   reliability = Σ nₖ(p̄ₖ − ōₖ)²/N   (miscalibration — lower better)
   *   resolution  = Σ nₖ(ōₖ − ō)²/N    (sharpness that pays — higher)
   *   uncertainty = ō(1 − ō)           (the no-skill floor)
   *   within_var  = Σ (pᵢ − p̄ₖ)²/N    (within-bin forecast spread)
   *   within_cov  = Σ (pᵢ − p̄ₖ)(yᵢ − ōₖ)/N  (within-bin association)
   * With CONTINUOUS forecasts binned, the exact identity carries both
   * within-bin terms (Stephenson, Coelho & Jolliffe 2008):
   *   brier = reliability − resolution + uncertainty
   *         + within_var − 2·within_cov
   * (the textbook 3-term Murphy form is the p-constant-per-bin special
   * case, where both extras vanish). A forecaster beats the
   * climatology baseline iff resolution > reliability.
   *
   * Output: one row `(n, brier, reliability, resolution, uncertainty,
   * within_var, within_cov)`, 6 dp — n = 0 with null terms on
   * empty/all-invalid input.
   *
   * Scale shape: ONE hash aggregate to the ≤nBins bin grain (map-side
   * combined), then one plain aggregate over the BIN table
   * (statistic-sized) — no window, no sort, no join. Bins are
   * fixed-width `floor(p·nBins)` (edge-clamped), NOT ntile — no global
   * sort, and the decomposition is standard on equal-width bins.
   * Resolution uses the expanded form Σnₖōₖ²/N − ō² (clamped at 0: an
   * exact-grid fixture cancels to an ulp negative) so everything after
   * the bin aggregate is bin-grain arithmetic.
   */
  def brierDecomposition(df: DataFrame, probCol: String, labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 1, "nBins must be >= 1")
    val p = col(probCol).cast("double")
    val y = col(labelCol).cast("double")
    val g = df.filter(p.isNotNull && y.isNotNull && p >= 0 && p <= 1)
      .select(least(floor(p * nBins).cast("long"), lit(nBins - 1L))
          .as("__bin"), p.as("__p"), y.as("__y"))
      .groupBy(col("__bin"))
      .agg(count(lit(1)).as("__nk"),
        sum(col("__p")).as("__sp"), sum(col("__y")).as("__sy"),
        sum((col("__p") - col("__y")) * (col("__p") - col("__y")))
          .as("__ssq"),
        sum(col("__p") * col("__p")).as("__spp"),
        sum(col("__p") * col("__y")).as("__spy"))
    val pk = col("__sp") / col("__nk")
    val ok = col("__sy") / col("__nk")
    val a = g.agg(
      coalesce(sum(col("__nk")), lit(0L)).as("n"),
      sum(col("__sy")).as("__ty"),
      sum(col("__ssq")).as("__tsq"),
      sum(col("__nk") * (pk - ok) * (pk - ok)).as("__reln"),
      sum(col("__nk") * ok * ok).as("__nko2"),
      // Σ(p − p̄ₖ)² = Σp² − Σ nₖ·p̄ₖ² per bin, clamped after the sum
      sum(col("__spp") - pk * col("__sp")).as("__wvn"),
      // Σ(p − p̄ₖ)(y − ōₖ) = Σpy − nₖ·p̄ₖ·ōₖ per bin (any sign)
      sum(col("__spy") - col("__sp") * col("__sy") / col("__nk"))
        .as("__wcn"))
    // null-safe N (the ivWald ANSI convention: obar is a subexpression
    // of several branches and may be hoisted out of its CASE guard)
    val nD = when(col("n") > 0, col("n").cast("double"))
    val obar = col("__ty") / nD
    val some = col("n") > 0
    a.select(col("n"),
      round(when(some, col("__tsq") / nD), 6).as("brier"),
      round(when(some, col("__reln") / nD), 6).as("reliability"),
      round(when(some,
        greatest(col("__nko2") / nD - obar * obar, lit(0.0))), 6)
        .as("resolution"),
      round(when(some, obar * (lit(1.0) - obar)), 6).as("uncertainty"),
      round(when(some, greatest(col("__wvn"), lit(0.0)) / nD), 6)
        .as("within_var"),
      round(when(some, col("__wcn") / nD), 6).as("within_cov"))
  }

  /**
   * Hosmer–Lemeshow goodness-of-fit test (Hosmer & Lemeshow 1980) over
   * fixed-width probability bins — the SIGNIFICANCE companion of the
   * calibration report and [[brierDecomposition]]:
   *   HL = Σ_k (O_k − E_k)² / (n_k·p̄_k·(1 − p̄_k))
   * with O_k the observed positives, E_k = Σ pᵢ the expected, and
   * p̄_k = E_k/n_k — ≈ χ²(g − 2) under a well-calibrated model. Bins
   * are fixed-width `floor(p·nBins)` edge-clamped (the
   * [[brierDecomposition]] choice; the textbook uses equal-COUNT
   * deciles, which would need a global sort — at corpus scale the
   * fixed grid is the honest scalable variant and the statistic's
   * χ² approximation holds the same way).
   *
   * HL is null when ANY populated bin is degenerate (p̄_k ∈ {0, 1} —
   * its variance term is 0 and the statistic is undefined; merge bins
   * upstream if that fires). Output: one row (n, g, dof, hl), 6 dp —
   * g = populated bins, dof = g − 2 (null when g < 3).
   *
   * Scale shape: one hash aggregate to the ≤nBins grain + one bin-table
   * aggregate — no window, no sort, no join.
   */
  def hosmerLemeshow(df: DataFrame, probCol: String, labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 1, "nBins must be >= 1")
    val p = col(probCol).cast("double")
    val y = col(labelCol).cast("double")
    val g = df.filter(p.isNotNull && y.isNotNull && p >= 0 && p <= 1)
      .select(least(floor(p * nBins).cast("long"), lit(nBins - 1L))
          .as("__bin"), p.as("__p"), y.as("__y"))
      .groupBy(col("__bin"))
      .agg(count(lit(1)).as("__nk"), sum(col("__y")).as("__o"),
        sum(col("__p")).as("__e"))
    val pbar = col("__e") / col("__nk")
    val den = col("__nk") * pbar * (lit(1.0) - pbar)
    val term = (col("__o") - col("__e")) * (col("__o") - col("__e")) /
      when(den > 0, den)
    val a = g.agg(
      coalesce(sum(col("__nk")), lit(0L)).as("n"),
      count(lit(1)).as("g"),
      sum(term).as("__hl"),
      // SUM skips nulls, so a degenerate bin must be counted
      // explicitly to null the statistic (honest "undefined", not a
      // silently-shortened sum)
      coalesce(sum(when(den > 0, 0L).otherwise(1L)), lit(0L)).as("__bad"))
    a.select(col("n"), col("g"),
      when(col("g") >= 3, col("g") - 2L).as("dof"),
      round(when(col("__bad") === 0, col("__hl")), 6).as("hl"))
  }

  /**
   * Split-conformal prediction interval (Vovk et al. 2005; the split
   * form of Lei et al. 2018): from a CALIBRATION slice's absolute
   * residuals |y − ŷ|, the q̂ = ⌈(n+1)(1−α)⌉-th smallest residual is a
   * radius such that ŷ ± q̂ covers the true value with probability
   * ≥ 1−α on exchangeable data — a DISTRIBUTION-FREE guarantee, no
   * matter how bad the forecaster. Reports the radius and the realized
   * coverage on the held-out test slice (should sit at or above the
   * target; systematically below means the exchangeability assumption
   * broke). `calibCol` marks calibration rows — split deterministically
   * (an id-parity or hash split), never randomly.
   *
   * q̂ is null when ⌈(n+1)(1−α)⌉ > n_calib (too few calibration points
   * for the requested level — the honest answer is "no finite radius").
   *
   * Scale shape: one filtered pass; the rank runs over the CALIBRATION
   * slice only (the mannWhitneyU global-window convention — swap in
   * approxQuantile at corpus scale); coverage is one aggregate.
   * Output: one row
   * `(n_calib, n_test, target_coverage, qhat, coverage)` (6 dp).
   */
  def splitConformal(df: DataFrame, predCol: String, actualCol: String,
      calibCol: String, alpha: Double = 0.1): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha must be in (0, 1)")
    val base = df
      .filter(col(predCol).isNotNull && col(actualCol).isNotNull)
      .select(abs(col(actualCol).cast("double") -
        col(predCol).cast("double")).as("nc"),
        col(calibCol).cast("boolean").as("cal"))
    val ord = Window.partitionBy(lit(1)).orderBy(col("nc").asc)
    val counts = base.agg(
      sum(when(col("cal"), 1L).otherwise(0L)).as("n_calib"),
      sum(when(!col("cal"), 1L).otherwise(0L)).as("n_test"))
    val kCol = ceil((col("n_calib") + 1) * lit(1.0 - alpha)).cast("long")
    // the k-th smallest calibration residual; empty (-> null agg) when
    // k exceeds the calibration size
    val qAgg = base.filter(col("cal"))
      .withColumn("rn", row_number().over(ord))
      .crossJoin(broadcast(counts))
      .filter(col("rn") === kCol)
      .agg(max(col("nc")).as("__qhat"))
    val covAgg = base.filter(!col("cal"))
      .crossJoin(broadcast(qAgg))
      .agg(sum(when(col("nc") <= col("__qhat"), 1L).otherwise(0L))
        .as("__covered"))
    counts.crossJoin(broadcast(qAgg)).crossJoin(broadcast(covAgg))
      .select(col("n_calib"), col("n_test"),
        lit(1.0 - alpha).as("target_coverage"),
        round(col("__qhat"), 6).as("qhat"),
        when(col("n_test") > 0 && col("__qhat").isNotNull,
          round(coalesce(col("__covered"), lit(0L)).cast("double") /
            col("n_test"), 6)).as("coverage"))
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Inter-rater agreement statistics — the label-QA layer of a training
 * corpus: when two annotators (or two quality classifiers, or a human
 * pass vs a model pass) label the same items, raw percent agreement
 * overstates consistency on skewed label distributions; chance-corrected
 * agreement is the audit number.
 */
object Agreement {

  /**
   * Cohen's kappa (Cohen 1960) between two categorical rater columns:
   * κ = (p₀ − pₑ)/(1 − pₑ) with p₀ the observed agreement rate and
   * pₑ = Σₖ pₐ(k)·p_b(k) the chance agreement implied by the two
   * rating marginals. Rows where either rating is null are excluded
   * (unrated items carry no agreement signal). κ is null when pₑ = 1
   * (both raters constant — agreement is undefined, not perfect).
   *
   * The curation use: do two quality gates agree beyond what their
   * acceptance rates force? Two filters that each pass 90% of docs
   * agree ≥ 81% by chance alone — κ separates real consensus from that
   * floor before you treat "both gates passed" as a stronger signal.
   *
   * Scale shape: one filtered pass aggregates to (n, agree) plus two
   * category-grain marginal counts; pₑ is a join of the two marginal
   * tables on category (each |categories| rows) — everything after the
   * first aggregate is statistic-sized, the item table never shuffles.
   *
   * Output: one row `(n_items, po, pe, kappa)` — rates 6-dp rounded.
   */
  def cohenKappa(df: DataFrame, raterA: String, raterB: String): DataFrame = {
    val f = df
      .select(col(raterA).cast("string").as("a"),
        col(raterB).cast("string").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
    val tot = f.agg(count(lit(1)).as("n"),
      sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("agree"))
    val ma = f.groupBy(col("a").as("cat")).agg(count(lit(1)).as("na"))
    val mb = f.groupBy(col("b").as("cat")).agg(count(lit(1)).as("nb"))
    val peSum = ma.join(mb, Seq("cat"))
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("pe_num"))
    tot.crossJoin(broadcast(peSum))
      .select(col("n").as("n_items"),
        round(col("agree") / col("n"), 6).as("po"),
        round(col("pe_num") / (col("n") * col("n")), 6).as("pe"))
      .withColumn("kappa",
        when(col("pe") < 1.0,
          round((col("po") - col("pe")) / (lit(1.0) - col("pe")), 6)))
  }

  /**
   * Krippendorff's alpha, nominal metric (Krippendorff 2004, "Content
   * Analysis" §11) — the agreement coefficient that handles ANY number
   * of raters and MISSING ratings, which is what real annotation tables
   * look like (each item labeled by whichever 2-of-N annotators drew
   * it). Input is the long reliability table `(item, rater, label)`;
   * the rater identity only establishes one-rating-per-slot — alpha
   * itself is computed from the per-item label multiset:
   *
   *   A₀ = Σ_u Σ_c n_uc(n_uc−1)/(m_u−1) / n   (observed agreement)
   *   Aₑ = Σ_c n_c(n_c−1) / (n(n−1))           (expected)
   *   α  = (A₀ − Aₑ)/(1 − Aₑ)
   *
   * with n_uc the count of label c on item u, m_u the item's rating
   * count, n_c / n the kept-item column totals. Items with a single
   * rating carry no agreement signal and drop (the missing-data rule).
   * α is null when Aₑ = 1 (one label universe) or n < 2.
   *
   * Scale shape: (item, label)-grain counts → item-grain sums → three
   * one-row aggregates; the ratings table is touched once, everything
   * downstream is statistic-sized.
   *
   * Output: one row `(n_items, n_ratings, ao, ae, alpha)` — rates 6-dp
   * rounded, alpha computed from the rounded rates (cross-engine
   * determinism, same convention as [[cohenKappa]]).
   */
  def krippendorffAlpha(df: DataFrame, itemCol: String, raterCol: String,
      labelCol: String): DataFrame = {
    val r = df
      .select(col(itemCol).cast("string").as("item"),
        col(raterCol).cast("string").as("rater"),
        col(labelCol).cast("string").as("lab"))
      .filter(col("item").isNotNull && col("rater").isNotNull &&
        col("lab").isNotNull)
      // ONE rating per (item, rater) slot — the reliability-matrix
      // contract. Duplicate slot rows would silently inflate every
      // count; resolve them deterministically to the MIN label (callers
      // wanting a different rule — latest wins, majority — dedupe
      // upstream, as q_krippendorff's first-event rule does).
      .groupBy(col("item"), col("rater")).agg(min(col("lab")).as("lab"))
    val cell = r.groupBy(col("item"), col("lab"))
      .agg(count(lit(1)).as("n_uc"))
    val mu = cell.groupBy(col("item")).agg(sum(col("n_uc")).as("m"))
      .filter(col("m") >= 2)
    val kept = cell.join(mu, Seq("item"))
    val obs = kept.agg(
      coalesce(sum(col("n_uc") * (col("n_uc") - 1) / (col("m") - 1)), lit(0.0))
        .as("occ"),
      countDistinct(col("item")).as("n_items"))
    val colTot = kept.groupBy(col("lab")).agg(sum(col("n_uc")).as("nc"))
      .agg(coalesce(sum(col("nc")), lit(0L)).as("n"),
        coalesce(sum(col("nc") * (col("nc") - 1)), lit(0L)).as("pair_num"))
    obs.crossJoin(broadcast(colTot))
      .select(col("n_items"), col("n").as("n_ratings"),
        round(col("occ") / col("n"), 6).as("ao"),
        round(col("pair_num") / (col("n") * (col("n") - 1)), 6).as("ae"))
      .withColumn("alpha",
        when(col("n_ratings") >= 2 && col("ae") < 1.0,
          round((col("ao") - col("ae")) / (lit(1.0) - col("ae")), 6)))
  }

  /**
   * McNemar's test (McNemar 1947) between two BINARY raters/gates on the
   * same items — the difference test that completes [[cohenKappa]]'s
   * agreement view: kappa asks "do they agree beyond chance", McNemar
   * asks "when they disagree, is one SYSTEMATICALLY stricter". Only the
   * discordant cells matter: b = A-pass/B-fail, c = A-fail/B-pass;
   * χ²₁ = (b−c)²/(b+c), plus the continuity-corrected
   * (|b−c|−1)²/(b+c) for small counts (Edwards 1948). Null when
   * b + c = 0 (no disagreements — nothing to test). Same reporting
   * convention as [[graft.stats.Planners.welchT]]: the statistic is the
   * portable result (χ²₁ critical values 3.841 / 6.635).
   *
   * The curation use: after swapping a quality gate, run old vs new on
   * the same corpus slice — McNemar on the keep verdicts says whether
   * the new gate's extra drops are signal or symmetric churn.
   *
   * One aggregate pass. Output: one row
   * `(n_items, both_pass, a_only, b_only, both_fail, chi2, chi2_cc)`.
   */
  def mcnemar(df: DataFrame, raterA: String, raterB: String): DataFrame = {
    val a = col(raterA).cast("boolean")
    val b = col(raterB).cast("boolean")
    df.filter(a.isNotNull && b.isNotNull)
      .agg(count(lit(1)).as("n_items"),
        sum(when(a && b, 1L).otherwise(0L)).as("both_pass"),
        sum(when(a && !b, 1L).otherwise(0L)).as("a_only"),
        sum(when(!a && b, 1L).otherwise(0L)).as("b_only"),
        sum(when(!a && !b, 1L).otherwise(0L)).as("both_fail"))
      .withColumn("chi2",
        when(col("a_only") + col("b_only") > 0,
          round((col("a_only") - col("b_only")) *
            (col("a_only") - col("b_only")) /
            (col("a_only") + col("b_only")).cast("double"), 6)))
      .withColumn("chi2_cc",
        when(col("a_only") + col("b_only") > 0,
          round(pow(greatest(abs(col("a_only") - col("b_only")) - 1, lit(0L))
            .cast("double"), 2) /
            (col("a_only") + col("b_only")), 6)))
  }
}

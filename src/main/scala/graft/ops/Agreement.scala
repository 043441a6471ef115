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
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Re-identification-risk operators (Sweeney's k-anonymity, Machanavajjhala
 * et al.'s l-diversity): the COMPLIANCE half of the privacy story next to
 * [[Text.scrubPii]]'s content half. Scrubbing removes literal
 * identifiers; these measure and enforce the weaker leak — a combination
 * of quasi-identifier columns (region × segment × age bucket …) so rare
 * it singles a record out even with every name gone. Training-data
 * releases and eval-set publications gate on exactly this audit.
 *
 * All three operators are ONE hash aggregate (or one window pass) keyed
 * on the quasi-identifier columns — at 100 TB the same shuffle any
 * per-group statistic needs, map-side combined, no skew surface beyond
 * the group key itself (a hot equivalence class is by definition a LARGE
 * class — the safe kind).
 */
object Privacy {

  private def qi(quasiCols: Seq[String]): Seq[Column] = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    quasiCols.map(col)
  }

  /**
   * k-anonymity audit: one row summarizing the equivalence-class
   * structure over the quasi-identifiers — `anonymity_k` (the smallest
   * class size; the dataset IS k-anonymous for k ≤ this), class and row
   * counts, and how many classes/rows fall below the requested `k`.
   * NULL quasi-identifier values form their own class (standard
   * groupBy semantics — engines agree). On an EMPTY input `anonymity_k`
   * is null, not 0: an empty dataset is vacuously k-anonymous for every
   * k, and a 0 would wrongly fail a `anonymity_k >= k` release gate.
   */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    df.groupBy(qi(quasiCols): _*).agg(count(lit(1)).as("__n"))
      .agg(
        coalesce(sum(col("__n")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_classes"),
        min(col("__n")).as("anonymity_k"),
        coalesce(sum(when(col("__n") < k, lit(1L)).otherwise(lit(0L))), lit(0L))
          .as("n_violating_classes"),
        coalesce(sum(when(col("__n") < k, col("__n")).otherwise(lit(0L))), lit(0L))
          .as("n_violating_rows"))
  }

  /**
   * k-anonymity enforcement by suppression: keep only rows whose
   * quasi-identifier equivalence class has at least `k` members — the
   * release-gate complement of [[kAnonymityReport]] (generalization,
   * the other classic mechanism, is a modeling choice left to the
   * caller: bucket the columns first, then suppress). Rows pass through
   * unchanged.
   *
   * The under-k class list is counted with a groupBy (partial hash-agg
   * below the exchange — the MOST COMMON class is by definition the
   * hottest key, and it pre-combines to one row per input partition)
   * and removed via an anti-join: the r11-hardened shingle-df-cap
   * shape. A window count would funnel the biggest class's entire row
   * set into one task before the filter. Unlike the other hardened cap
   * sites, the drop list here is NOT small by construction — under-k
   * classes can approach row count when the quasi-identifiers are
   * unbucketed (exactly the release this gate exists to catch) — so
   * the join strategy is deliberately LEFT TO THE PLANNER: AQE
   * broadcasts a small list at runtime, falls back to a shuffle join
   * for a huge one (where its skew-split handles the hot class — the
   * split a window partition can never get), and a forced broadcast
   * would OOM the driver on precisely the worst-case input. Join keys
   * use null-safe equality because a NULL quasi-identifier value forms
   * its own class (groupBy semantics), which a null-unsafe join would
   * silently always keep.
   */
  def suppressRare(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val rare = df.groupBy(qi(quasiCols): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") < k)
      .select(quasiCols.map(c => col(c).as(s"__rare_$c")): _*)
    val cond = quasiCols.map(c => col(c) <=> col(s"__rare_$c"))
      .reduce(_ && _)
    df.join(rare, cond, "left_anti")
  }

  /**
   * Distinct l-diversity audit: per quasi-identifier class, the number
   * of DISTINCT values of the sensitive column — a k-anonymous class
   * where everyone shares the same sensitive value still leaks it
   * (the homogeneity attack l-diversity exists to name). One row:
   * `diversity_l` (the smallest per-class distinct count; the dataset
   * is distinct-l-diverse for l ≤ this — null on an empty input, the
   * [[kAnonymityReport]] vacuous-truth convention) plus how many
   * classes fall below the requested `l`.
   */
  def lDiversityReport(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Int): DataFrame = {
    require(l >= 1, "l must be >= 1")
    df.groupBy(qi(quasiCols): _*)
      .agg(count_distinct(col(sensitiveCol)).as("__d"))
      .agg(
        count(lit(1)).as("n_classes"),
        min(col("__d")).as("diversity_l"),
        coalesce(sum(when(col("__d") < l, lit(1L)).otherwise(lit(0L))), lit(0L))
          .as("n_low_diversity_classes"))
  }

  /**
   * t-closeness audit (Li, Li & Venkatasubramanian 2007) for a
   * CATEGORICAL sensitive column: per quasi-identifier class, the
   * distance between the class's sensitive-value distribution and the
   * GLOBAL one — an l-diverse class still leaks when its mix differs
   * wildly from the table's (the skewness attack t-closeness names).
   * With the 0/1 ground distance the earth-mover distance reduces to
   * total variation, `½ Σ_v |p_class(v) − p_global(v)|` — exact, no
   * metric modeling needed. One summary row: `closeness_t` (the LARGEST
   * class distance; the dataset is t-close for t ≥ this — null on empty
   * input, the [[kAnonymityReport]] vacuous-truth convention), class
   * count, and how many classes exceed the requested `t`. 6-dp rounding
   * so external engines replay the verdict on the rounded value.
   *
   * Shape: one (class × value) hash aggregate, a window total per class,
   * and a broadcast join against the |values|-row global distribution —
   * the corpus is touched once; everything after the first aggregate is
   * statistic-sized.
   */
  def tClosenessReport(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, t: Double): DataFrame = {
    require(t > 0 && t <= 1, "t must be in (0, 1]")
    val cls = qi(quasiCols)
    val cells = df.groupBy(cls :+ col(sensitiveCol): _*)
      .agg(count(lit(1)).as("__n"))
    val byClass = Window.partitionBy(cls: _*)
    val global = df.groupBy(col(sensitiveCol))
      .agg(count(lit(1)).as("__gn"))
      .withColumn("__gtot", sum(col("__gn")).over(Window.partitionBy()))
    // Per class, Σ_v |p_c − p_g| over the values PRESENT in the class,
    // plus the global mass of values ABSENT from the class (for those
    // |0 − p_g| = p_g, i.e. 1 − Σ_present p_g).
    val joined = cells
      .withColumn("__ctot", sum(col("__n")).over(byClass))
      .join(org.apache.spark.sql.functions.broadcast(global), Seq(sensitiveCol))
    val perClass = joined.groupBy(cls: _*)
      .agg(
        sum(abs(col("__n").cast("double") / col("__ctot") -
          col("__gn").cast("double") / col("__gtot"))).as("__present"),
        (lit(1.0) - sum(col("__gn").cast("double") / col("__gtot")))
          .as("__absent"))
      .select(round((col("__present") + col("__absent")) / 2, 6).as("__tv"))
    perClass.agg(
      count(lit(1)).as("n_classes"),
      max(col("__tv")).as("closeness_t"),
      coalesce(sum(when(col("__tv") > t, lit(1L)).otherwise(lit(0L))), lit(0L))
        .as("n_violating_classes"))
  }

  /**
   * ε-differentially-private count release (Dwork et al. 2006, the
   * Laplace mechanism): per group, `count + Laplace(Δf/ε)` with
   * sensitivity Δf = 1 — the mechanism behind every published DP
   * statistics release, and the ACTIVE privacy complement of the audit
   * family above (k-anonymity measures a table you release as-is; DP
   * noise lets you release the aggregate itself).
   *
   * The noise is SEEDED: u ∈ (−½, ½) derives from a 16-bit md5 of
   * (group key, seed) and maps through the inverse Laplace CDF
   * `−(Δ/ε)·sgn(u)·ln(1 − 2|u|)` — the reproducible-release practice
   * (pin the seed so a rerun publishes the SAME numbers; re-releasing
   * under fresh seeds would compose ε). Rotate `seed` only when you
   * intend to spend more budget.
   *
   * SECURITY CONTRACT — the ε guarantee holds ONLY if `seed` is a
   * SECRET, high-entropy value: the noise is a deterministic function
   * of (group key, seed), so anyone who learns the seed recomputes the
   * noise exactly and recovers the true counts — a disclosed seed
   * (committed to a repo, logged, reused from an example) voids the
   * guarantee ENTIRELY. There is deliberately NO default seed for this
   * reason; callers must supply their own. Two further caveats of the
   * replayable formulation: the draw is DISCRETIZED to a 16-bit grid
   * (u has 65536 values, so the release is (ε, δ)-like with a small
   * granularity defect rather than textbook pure-DP — a discrete
   * Laplace/geometric mechanism is the formal fix), and the noise is
   * BOUNDED at ±(Δ/ε)·ln(65536) ≈ ±11.09/ε because |u| never reaches
   * ½ on the half-offset grid — true Laplace tails are unbounded, so
   * extreme-tail plausible deniability is truncated. Both defects are
   * inherent to hash-replayable noise; a production release wanting
   * textbook pure-DP should draw real Laplace noise and archive it
   * instead of re-deriving it.
   *
   * Output: groupCols, `n_noisy` (6 dp, can be negative — clamping
   * would bias the release), `epsilon`. True counts are deliberately
   * NOT emitted. Scale shape: ONE hash aggregate to group grain; the
   * noise is a narrow projection on group-sized rows.
   */
  def dpCounts(df: DataFrame, groupCols: Seq[String], epsilon: Double,
      seed: Long): DataFrame = {
    require(epsilon > 0, "epsilon must be > 0")
    val g = df.groupBy(qi(groupCols): _*).agg(count(lit(1)).as("__n"))
    // NULL group values must stay distinguishable: concat_ws SKIPS
    // nulls, which would give (NULL,'X') and ('X',NULL) the SAME noise
    // draw -- correlated noise across released classes breaks the
    // per-class independence a DP release assumes. Coalesce each part
    // to an explicit sentinel instead.
    val keyStr = concat_ws("\u0001",
      groupCols.map(c => coalesce(col(c).cast("string"),
        lit("\u0000null"))) :+ lit(seed.toString): _*)
    val v = conv(substring(md5(keyStr), 1, 4), 16, 10).cast("long")
    val u = (v.cast("double") + 0.5) / 65536.0 - 0.5
    val lap = -signum(u) * lit(1.0 / epsilon) *
      log(lit(1.0) - lit(2.0) * abs(u))
    g.select(groupCols.map(col) :+
      round(col("__n") + lap, 6).as("n_noisy") :+
      lit(epsilon).as("epsilon"): _*)
  }
}

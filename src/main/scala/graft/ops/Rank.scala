package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Preference aggregation: fit strengths to pairwise outcomes. The
 * analysis side of [[Chat.preferencePairs]] — an RLHF/DPO corpus is a
 * bag of (chosen, rejected) comparisons, and the first QA question is
 * "what global ordering do these comparisons imply, and how consistent
 * is it?" (annotator drift shows up as incoherent strengths).
 */
object Rank {

  /**
   * Bradley–Terry strengths by minorization–maximization (Hunter 2004,
   * "MM algorithms for generalized Bradley-Terry models") with a FIXED
   * iteration count: P(i beats j) = θᵢ/(θᵢ+θⱼ);
   * θᵢ ← Wᵢ / Σⱼ nᵢⱼ/(θᵢ+θⱼ), then rescaled to mean 1 (the likelihood
   * is scale-invariant; the rescale pins it so runs are comparable).
   * θ₀ = 1; zero-win entities go (and stay) at 0 — MM's fixed point for
   * them. Deterministic: no randomness, fixed iterations, so the DuckDB
   * oracle unrolls the same updates as chained CTEs.
   *
   * Scale shape: outcomes aggregate ONCE to (i, j, n) pair-count grain —
   * at 100 TB of comparisons the iteration state is |entities| +
   * |distinct pairs| rows, NOT the raw comparison count. Each iteration
   * is two equi-joins of the pair table to the θ vector plus one
   * entity-keyed sum (map-side combined) and a broadcast one-row
   * rescale — the PageRank shuffle pattern on a far smaller table.
   *
   * Output: `(entity, strength, wins, games)` — strength 6-dp rounded,
   * wins/games as BIGINT.
   */
  def bradleyTerry(outcomes: DataFrame, winnerCol: String,
      loserCol: String, iterations: Int): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = outcomes
      .select(col(winnerCol).cast("string").as("w"),
        col(loserCol).cast("string").as("l"))
      .filter(col("w").isNotNull && col("l").isNotNull &&
        col("w") =!= col("l"))
    val ents = e.select(col("w").as("id"))
      .union(e.select(col("l").as("id"))).distinct()
    val wins = ents
      .join(e.groupBy(col("w").as("id")).agg(count(lit(1)).as("wins")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("wins"), lit(0L)).as("wins"))
    // comparisons collapse to canonical pair counts once, up front
    val pairs = e
      .select(least(col("w"), col("l")).as("a"),
        greatest(col("w"), col("l")).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
    // both directions via ONE explode, not a self-union (the
    // Graph.symEdges finding: union branches execute the pair-count
    // aggregate twice) — sym is referenced by `games` AND every
    // iteration's denominator, so the saving compounds per iteration
    val sym = pairs.select(explode(array(
        struct(col("a").as("i"), col("b").as("j"), col("n")),
        struct(col("b").as("i"), col("a").as("j"), col("n")))).as("__s"))
      .select(col("__s.i").as("i"), col("__s.j").as("j"), col("__s.n").as("n"))
    val games = sym.groupBy(col("i").as("id")).agg(sum(col("n")).as("games"))

    var th = ents.select(col("id"), lit(1.0).as("theta"))
    for (_ <- 1 to iterations) {
      val denom = sym
        .join(th.select(col("id").as("i"), col("theta").as("ti")), Seq("i"))
        .join(th.select(col("id").as("j"), col("theta").as("tj")), Seq("j"))
        .groupBy(col("i").as("id"))
        .agg(sum(col("n") / (col("ti") + col("tj"))).as("d"))
      val raw = wins.join(denom, Seq("id"), "left")
        .select(col("id"),
          when(col("wins") === 0 || col("d").isNull, lit(0.0))
            .otherwise(col("wins") / col("d")).as("theta"))
      val norm = raw.agg((count(lit(1)) / sum(col("theta"))).as("k"))
      th = raw.crossJoin(broadcast(norm))
        .select(col("id"), (col("theta") * col("k")).as("theta"))
    }
    th.join(wins, Seq("id")).join(games, Seq("id"))
      .select(col("id").as("entity"), round(col("theta"), 6).as("strength"),
        col("wins"), col("games"))
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Graph analytics over edge-list DataFrames. Near-duplicate detection
 * already builds a document graph ([[Dedup.dedupGroups]] runs connected
 * components on it); PageRank adds the standard importance measure over
 * the same shape — e.g. ranking documents inside a near-dup cluster by
 * link centrality, or user-interaction graphs from the event log.
 *
 * Design: pure DataFrame iteration (no GraphX/RDDs). Each iteration is
 * one equi-join on the edge source + one vertex-keyed aggregate — the
 * exact shuffle pattern Pregel-style systems run, expressed declaratively
 * so AQE can handle skewed hubs. Rank mass of dangling vertices (no
 * out-edges) is dropped, matching the classic simplified formulation
 * (symmetrize the edge list if you need dangling-free semantics).
 *
 * At scale: the edge list shuffles once per iteration keyed on `src`
 * (re-used sort order would need bucketing — persist edges bucketed by
 * src for repeated runs); `checkpointEvery` truncates the growing lineage
 * so 30-iteration runs don't replan a 30-deep join tree.
 */
object Graph {

  /**
   * PageRank with a fixed iteration count: rank₀ = 1/N,
   * rankᵢ₊₁(v) = (1-d)/N + d · Σ_{u→v} rankᵢ(u)/outdeg(u).
   * Returns (v, rank) with rank rounded to 1e-6.
   */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, damping: Double = 0.85,
      checkpointEvery: Int = 0): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val verts = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct()
    val nDf = verts.agg(count(lit(1)).as("n"))
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("odeg"))

    var ranks = verts.crossJoin(broadcast(nDf))
      .select(col("v"), (lit(1.0) / col("n")).as("rank"))
    for (i <- 1 to iterations) {
      val contribs = e
        .join(ranks.withColumnRenamed("v", "src"), "src")
        .join(outDeg, "src")
        .select(col("dst").as("v"), (col("rank") / col("odeg")).as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("contrib"))
      ranks = verts.join(contribs, Seq("v"), "left")
        .crossJoin(broadcast(nDf))
        .select(col("v"),
          (lit(1.0 - damping) / col("n") +
            lit(damping) * coalesce(col("contrib"), lit(0.0))).as("rank"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0)
        ranks = ranks.localCheckpoint()
    }
    ranks.select(col("v"), round(col("rank"), 6).as("rank"))
  }
}

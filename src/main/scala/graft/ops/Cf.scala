package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Item-item collaborative filtering on implicit feedback (Sarwar et al.
 * WWW 2001; the Amazon item-to-item family, Linden et al. 2003) — the
 * recommendation readout a customer-events engine owes its events table:
 * "users who touched X also touched Y", from nothing but (user, item)
 * interactions.
 *
 * Deliberately NOT matrix factorization: co-occurrence cosine is exact,
 * deterministic (oracle-checkable), incrementally refreshable, and at
 * 100 TB the candidate generator is the same capped equi-self-join the
 * dedup family runs — whereas ALS would be a trained-numerics rows-only
 * operator. MF lives in the autoencoder embedding path (`graft.ml`).
 */
object Cf {

  /**
   * Top-k nearest items by co-occurrence cosine: binarize to distinct
   * (user, item), self-join on user for pair counts c_ab, score
   * cos = c_ab / √(n_a·n_b), keep each item's k best neighbors.
   *
   * `maxUserItems` is the skew cap (the shingle-df-cap family): a user
   * touching m items emits m(m−1)/2 pairs, so a 10⁵-item bot user would
   * emit 5·10⁹ rows into one join key — and near-exhaustive users carry
   * ~zero signal for "these two items go together" (their rows vote for
   * EVERY pair). Dropped users are counted out of n_i too, so cosine
   * stays ≤ 1 and consistent with the pair counts.
   *
   * Output: item, neighbor, n_common, cos (6 dp), rank (1..k, ties by
   * neighbor asc — cos is a ratio of exact integers, so the order is
   * engine-stable). Scale shape: distinct + two hash-aggregates + ONE
   * equi-join on user_id with per-key width ≤ `maxUserItems`, then a
   * per-item window over ≤ the item-pair fanout. Nothing user-grain is
   * ever collected or crossed unkeyed.
   */
  def itemCosineNeighbors(df: DataFrame, userCol: String, itemCol: String,
      k: Int, maxUserItems: Int = 1000): DataFrame =
    // DEFINED AS the incremental pipeline's from-scratch case, not a
    // parallel implementation: cfTopK's "identical values to the
    // from-scratch operator" contract (and q_item_cf_incremental's
    // full-recompute oracle) must hold structurally, not by keeping two
    // copies of the distinct/cap/self-join/cosine/rank chain in sync.
    cfTopK(cfFit(df, userCol, itemCol, maxUserItems), k)

  /**
   * Score candidate items for each user by summed neighbor similarity:
   * score(u, i) = Σ_{j ∈ items(u), j ≠ i} cos(i, j) over a prebuilt
   * [[itemCosineNeighbors]] table — the classic "recommend from your
   * history through the item graph" serving join, with already-seen
   * items excluded. Top-n per user by (score desc, item asc).
   *
   * Scale shape: the neighbor table is items×k (broadcastable for real
   * catalogs); one equi-join from the user's items through it, one
   * aggregate to (user, candidate), one per-user window. The user's
   * history never self-joins.
   */
  def recommendForUsers(ratings: DataFrame, neighbors: DataFrame,
      userCol: String, itemCol: String, n: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val hist = ratings
      .filter(col(userCol).isNotNull && col(itemCol).isNotNull)
      .select(col(userCol).as("user"), col(itemCol).as("__i"))
      .distinct()
    val cand = hist
      .join(broadcast(neighbors.select(col("item").as("__i"),
        col("neighbor").as("candidate"), col("cos"))), "__i")
      // `cos` arrives 6-dp rounded: summing it in exact MICRO-unit longs
      // makes the score - and therefore the rank order - engine-stable
      // (a double sum can differ by an ulp across fold orders and flip a
      // tie-break)
      .groupBy(col("user"), col("candidate"))
      .agg(sum(round(col("cos") * 1e6).cast("long")).as("__su"),
        count(lit(1)).as("n_paths"))
      // exclude items the user already has
      .join(hist.select(col("user"), col("__i").as("candidate"),
        lit(true).as("__seen")), Seq("user", "candidate"), "left")
      .filter(col("__seen").isNull)
    val w = Window.partitionBy(col("user"))
      .orderBy(col("__su").desc, col("candidate").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .select(col("user"), col("candidate"), col("n_paths"),
        (col("__su").cast("double") / 1e6).as("score"),
        col("rank").cast("long").as("rank"))
  }

  /**
   * Persisted incremental-CF state (the [[graft.ops.Dedup.hashIndex]] /
   * `contentChunkHashIndex` maintenance pattern applied to
   * co-occurrence): `ratings` = every distinct (u, i) ever seen (the
   * dedup + cross-batch pairing base), `pairs` = (ia < ib, n_common)
   * and `items` = (i, n) restricted to users at-or-under the cap.
   * All three are plain DataFrames — persist them as parquet and feed
   * the next delta through [[Cf.cfMerge]]; co-occurrence counts are
   * ADDITIVE, so a 100 TB events table never re-runs the full
   * self-join (the anti-pattern at that scale is exactly the nightly
   * full recompute this replaces).
   */
  final case class CfState(ratings: DataFrame, pairs: DataFrame,
      items: DataFrame)

  /** Persist a [[CfState]] as parquet — the production maintenance shape
    * this operator family exists for: co-occurrence counts are ADDITIVE,
    * so the state lives in storage between deltas and the full self-join
    * never re-runs. A merge planned from the saved tables also plans
    * better than one composed over the in-plan fit lineage: the scans
    * carry real size statistics (r16 measured the in-plan alternatives
    * on q_item_cf_incremental — localCheckpoint +50%, SQL-cache 4x — both
    * because they sever/replace AQE's runtime stats; parquet-backed state
    * is the shape that keeps them). */
  def saveState(state: CfState, dir: String): Unit = {
    state.ratings.write.mode("overwrite").parquet(s"$dir/ratings")
    state.pairs.write.mode("overwrite").parquet(s"$dir/pairs")
    state.items.write.mode("overwrite").parquet(s"$dir/items")
  }

  def loadState(spark: org.apache.spark.sql.SparkSession,
      dir: String): CfState =
    CfState(spark.read.parquet(s"$dir/ratings"),
      spark.read.parquet(s"$dir/pairs"),
      spark.read.parquet(s"$dir/items"))

  private def distinctRatings(df: DataFrame, userCol: String,
      itemCol: String): DataFrame = df
    .filter(col(userCol).isNotNull && col(itemCol).isNotNull)
    .select(col(userCol).as("__u"), col(itemCol).as("__i"))
    .distinct()

  /** (u-keyed self-join) → canonical (ia < ib) pair counts. Both sides
    * carry ≤ cap items per user by construction at every call site, so
    * the per-key fanout is bounded — the [[itemCosineNeighbors]] skew
    * contract. */
  private def pairDeltas(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("__u"), col("__i").as("__x"))
      .join(b.select(col("__u"), col("__i").as("__y")), Seq("__u"))
      .filter(col("__x") =!= col("__y"))
      .select(least(col("__x"), col("__y")).as("__ia"),
        greatest(col("__x"), col("__y")).as("__ib"))

  /**
   * Build the initial [[CfState]] from scratch — same capped-user
   * semantics as [[itemCosineNeighbors]] (a user over `maxUserItems`
   * contributes to NEITHER pair nor item counts, but their ratings are
   * kept: the cap must keep holding as deltas arrive).
   *
   * The cap counts with a groupBy (partial hash-agg below the exchange:
   * a 10⁸-row bot user pre-combines to one row per input partition) and
   * removes the over-cap user list via an anti-join whose strategy is
   * left to the planner/AQE — the list is bounded by totalRatings/cap
   * entries, which at a small cap over a 10⁹-row corpus is MILLIONS of
   * user ids, too large to force onto the driver (the
   * [[graft.ops.Privacy]] suppressRare convention: broadcast when small
   * at runtime, skew-split shuffle join when not). A window count would
   * funnel a bot user's ENTIRE row set into one task before the filter.
   * Exchange reuse dedupes the shared distinct subtree at runtime, so
   * the count branch costs no second shuffle of the corpus.
   */
  def cfFit(df: DataFrame, userCol: String, itemCol: String,
      maxUserItems: Int = 1000): CfState = {
    require(maxUserItems >= 2, "maxUserItems must be >= 2 (pairs need 2)")
    val ratings = distinctRatings(df, userCol, itemCol)
    val overCap = ratings.groupBy(col("__u"))
      .agg(count(lit(1)).as("__ui"))
      .filter(col("__ui") > maxUserItems)
      .select(col("__u"))
    val capped = ratings.join(overCap, Seq("__u"), "left_anti")
    val items = capped.groupBy(col("__i")).agg(count(lit(1)).as("__n"))
    val pairs = capped.select(col("__u"), col("__i").as("__ia"))
      .join(capped.select(col("__u"), col("__i").as("__ib")), Seq("__u"))
      .filter(col("__ia") < col("__ib"))
      .groupBy(col("__ia"), col("__ib"))
      .agg(count(lit(1)).as("n_common"))
    CfState(ratings, pairs, items)
  }

  /**
   * Fold a delta batch of interactions into a [[CfState]] — the
   * incremental maintenance step. Exactly equivalent to refitting on
   * the union (spec-checked, and `q_item_cf_incremental`'s oracle IS
   * the full recompute), but the work is delta-sized:
   *
   *   1. new distinct (u, i) rows = delta ANTI-JOIN known ratings;
   *   2. users still at-or-under the cap ADD within-delta pairs plus
   *      delta×known cross pairs (the cross-batch term a naive
   *      "pair counts are additive" union would miss);
   *   3. users the delta pushes OVER the cap RETRACT their previously
   *      counted pairs/items (the batch cap drops such users entirely,
   *      so equivalence demands the negative delta — their old item
   *      set is ≤ cap rows, so the retraction self-join is bounded);
   *   4. users already over the cap contribute nothing (they were
   *      retracted when they crossed), but their rows still land in
   *      `ratings` so re-sends stay deduplicated.
   *
   * Every join is keyed on user with per-key width ≤ `maxUserItems`;
   * the merge aggregates are pair-grain sums. Re-derive serving lists
   * with [[cfTopK]] — only for TOUCHED items if you track them (an
   * item's list changes only when one of its pair or item counts did).
   */
  def cfMerge(state: CfState, delta: DataFrame, userCol: String,
      itemCol: String, maxUserItems: Int = 1000): CfState = {
    require(maxUserItems >= 2, "maxUserItems must be >= 2 (pairs need 2)")
    val dR = distinctRatings(delta, userCol, itemCol)
      .join(state.ratings, Seq("__u", "__i"), "left_anti")
    val oldCnt = state.ratings.groupBy(col("__u"))
      .agg(count(lit(1)).as("__co"))
    val cats = dR.groupBy(col("__u")).agg(count(lit(1)).as("__cd"))
      .join(oldCnt, Seq("__u"), "left")
      .withColumn("__co", coalesce(col("__co"), lit(0L)))
      .withColumn("__cn", col("__co") + col("__cd"))
    val under = cats.filter(col("__cn") <= maxUserItems).select("__u")
    val newlyOver = cats.filter(col("__co") <= maxUserItems &&
      col("__cn") > maxUserItems).select("__u")
    val dAdd = dR.join(under, Seq("__u"))
    val oldOfAdd = state.ratings.join(under, Seq("__u"))
    val oldOfOver = state.ratings.join(newlyOver, Seq("__u"))
    // within-delta: ordered self-join counts each unordered pair once;
    // delta×known: the sets are disjoint (anti-join above), so the
    // canonicalized cross join emits each unordered pair exactly once
    val withinPairs = dAdd.select(col("__u"), col("__i").as("__ia"))
      .join(dAdd.select(col("__u"), col("__i").as("__ib")), Seq("__u"))
      .filter(col("__ia") < col("__ib"))
      .select(col("__ia"), col("__ib"))
    val posPairs = withinPairs
      .unionByName(pairDeltas(dAdd, oldOfAdd))
      .select(col("__ia"), col("__ib"), lit(1L).as("__d"))
    val negPairs = oldOfOver.select(col("__u"), col("__i").as("__ia"))
      .join(oldOfOver.select(col("__u"), col("__i").as("__ib")), Seq("__u"))
      .filter(col("__ia") < col("__ib"))
      .select(col("__ia"), col("__ib"), lit(-1L).as("__d"))
    val pairs = state.pairs
      .select(col("__ia"), col("__ib"), col("n_common").as("__d"))
      .unionByName(posPairs).unionByName(negPairs)
      .groupBy(col("__ia"), col("__ib"))
      .agg(sum(col("__d")).as("n_common"))
      .filter(col("n_common") > 0)
    val items = state.items.select(col("__i"), col("__n").as("__d"))
      .unionByName(dAdd.select(col("__i"), lit(1L).as("__d")))
      .unionByName(oldOfOver.select(col("__i"), lit(-1L).as("__d")))
      .groupBy(col("__i")).agg(sum(col("__d")).as("__n"))
      .filter(col("__n") > 0)
    CfState(state.ratings.unionByName(dR), pairs, items)
  }

  /**
   * Derive the [[itemCosineNeighbors]] serving table from a
   * [[CfState]] — identical schema and values to the from-scratch
   * operator on the same cumulative data (cos is a ratio of the SAME
   * exact integers, so even tie-breaks agree). Pass `onlyItems` (a
   * one-column `item` DataFrame) to re-rank just the lists a merge
   * touched: an item's list changes only if one of its pair counts or
   * either endpoint's item count moved, so the touched set is the
   * delta's items plus their pair partners.
   */
  def cfTopK(state: CfState, k: Int,
      onlyItems: Option[DataFrame] = None): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val scored = state.pairs
      .join(state.items.select(col("__i").as("__ia"),
        col("__n").as("__na")), "__ia")
      .join(state.items.select(col("__i").as("__ib"),
        col("__n").as("__nb")), "__ib")
      .withColumn("__cos", col("n_common") / sqrt(col("__na") * col("__nb")))
    // both directions via ONE explode, not a self-union: the union's two
    // branches inline the whole scored subtree — for the incremental
    // queries that is the entire merge lineage — twice, and the swapped
    // projections defeat exchange reuse, so it EXECUTED twice (the
    // Graph.symEdges finding; q_item_cf ran the capped self-join twice)
    val sym = scored.select(explode(array(
        struct(col("__ia").as("item"), col("__ib").as("neighbor"),
          col("n_common"), col("__cos")),
        struct(col("__ib").as("item"), col("__ia").as("neighbor"),
          col("n_common"), col("__cos")))).as("__s"))
      .select(col("__s.item").as("item"), col("__s.neighbor").as("neighbor"),
        col("__s.n_common").as("n_common"), col("__s.__cos").as("__cos"))
    val focused = onlyItems match {
      case Some(keep) => sym.join(
        broadcast(keep.select(col("item")).distinct()), Seq("item"))
      case None => sym
    }
    val w = Window.partitionBy(col("item"))
      .orderBy(col("__cos").desc, col("neighbor").asc)
    focused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("item"), col("neighbor"), col("n_common"),
        round(col("__cos"), 6).as("cos"), col("rank").cast("long").as("rank"))
  }
}

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
      k: Int, maxUserItems: Int = 1000): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(maxUserItems >= 2, "maxUserItems must be >= 2 (pairs need 2)")
    val ratings = df
      .filter(col(userCol).isNotNull && col(itemCol).isNotNull)
      .select(col(userCol).as("__u"), col(itemCol).as("__i"))
      .distinct()
    val capped = ratings
      .withColumn("__ui", count(lit(1)).over(Window.partitionBy(col("__u"))))
      .filter(col("__ui") <= maxUserItems)
      .select(col("__u"), col("__i"))
    val itemN = capped.groupBy(col("__i")).agg(count(lit(1)).as("__n"))
    val a = capped.select(col("__u"), col("__i").as("__ia"))
    val b = capped.select(col("__u"), col("__i").as("__ib"))
    val pairs = a.join(b, Seq("__u"))
      .filter(col("__ia") < col("__ib"))
      .groupBy(col("__ia"), col("__ib"))
      .agg(count(lit(1)).as("n_common"))
      .join(itemN.select(col("__i").as("__ia"), col("__n").as("__na")), "__ia")
      .join(itemN.select(col("__i").as("__ib"), col("__n").as("__nb")), "__ib")
      .withColumn("__cos",
        col("n_common") / sqrt(col("__na") * col("__nb")))
    val sym = pairs.select(col("__ia").as("item"), col("__ib").as("neighbor"),
        col("n_common"), col("__cos"))
      .unionByName(pairs.select(col("__ib").as("item"),
        col("__ia").as("neighbor"), col("n_common"), col("__cos")))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("__cos").desc, col("neighbor").asc)
    sym.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("item"), col("neighbor"), col("n_common"),
        round(col("__cos"), 6).as("cos"), col("rank").cast("long").as("rank"))
  }

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
}

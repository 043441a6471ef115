package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Market-basket mining over (basket, item) co-occurrence rows: frequent
 * items, frequent pairs, and association rules (support / confidence /
 * lift) — the SON/Apriori pair core, the workhorse of co-purchase,
 * co-click and co-citation analytics. (MLlib's FPGrowth mines arbitrary
 * itemset sizes but its results aren't SQL-replayable; the pair grain
 * is where virtually all production rules live, and it stays exact and
 * oracle-checkable.)
 *
 * Scale shape: baskets dedupe to distinct (basket, item) FIRST (hash
 * agg), items below `minSupport` are pruned via the Apriori property
 * BEFORE any pair is generated (a pair can't be frequent if either
 * member isn't), and pair generation is a self equi-join on the basket
 * key — both sides are the same pruned projection, so the exchange is
 * computed once and reused, and the per-basket fan-out is C(b, 2) with
 * b already capped by `maxBasket` (a degenerate 10⁵-item basket would
 * otherwise emit 5·10⁹ pairs from one task; such baskets are dropped,
 * and at 100 TB the cap is the difference between a skew straggler and
 * a linear pass).
 */
object Basket {

  /** Distinct (basket, item) pairs from possibly-repeated rows; null
    * baskets/items dropped. */
  private def distinctPairs(df: DataFrame, basketCol: String,
      itemCol: String): DataFrame =
    df.filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"), col(itemCol).as("__i")).distinct()

  /** Items appearing in at least `minSupport` distinct baskets.
    * Output: `item`, `support`. */
  def frequentItems(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1, "minSupport must be >= 1")
    distinctPairs(df, basketCol, itemCol)
      .groupBy(col("__i").as("item")).agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }

  /**
   * Unordered item pairs co-occurring in at least `minSupport` distinct
   * baskets (`item_a < item_b`). Baskets larger than `maxBasket`
   * distinct items are dropped before pair generation (skew guard —
   * see the object doc).
   */
  def frequentPairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, maxBasket: Int = 1000): DataFrame = {
    require(minSupport >= 1, "minSupport must be >= 1")
    require(maxBasket >= 2, "maxBasket must be >= 2")
    val pairs = distinctPairs(df, basketCol, itemCol)
    // Apriori prune: only items that can still appear in a frequent pair
    val freq = pairs.groupBy("__i").agg(count(lit(1)).as("__s"))
      .filter(col("__s") >= minSupport).select("__i")
    val pruned = pairs.join(freq, Seq("__i"), "left_semi")
    val sized = pruned.groupBy("__b").agg(count(lit(1)).as("__bs"))
      .filter(col("__bs") <= maxBasket).select("__b")
    val kept = pruned.join(sized, Seq("__b"), "left_semi")
    kept.alias("l")
      .join(kept.alias("r"), col("l.__b") === col("r.__b") &&
        col("l.__i") < col("r.__i"))
      .groupBy(col("l.__i").as("item_a"), col("r.__i").as("item_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }

  /**
   * Association rules from the frequent pairs, both directions:
   * `antecedent -> consequent` with pair support, confidence
   * (support / antecedent support) and lift (confidence / consequent
   * base rate over ALL baskets), 6 dp. `minConfidence` filters after
   * the stats are joined on. The item-support join broadcasts when the
   * frequent-item set is small; the basket total rides along as a
   * broadcast scalar.
   */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, minConfidence: Double = 0.0,
      maxBasket: Int = 1000): DataFrame = {
    val pairs = frequentPairs(df, basketCol, itemCol, minSupport, maxBasket)
    val items = distinctPairs(df, basketCol, itemCol)
      .groupBy(col("__i").as("item")).agg(count(lit(1)).as("__s"))
    val nBaskets = distinctPairs(df, basketCol, itemCol)
      .agg(countDistinct(col("__b")).as("__n"))
    // both rule directions via ONE explode, not a self-union: the union's
    // branches would inline (and execute — swapped projections defeat
    // exchange reuse, the Graph.symEdges finding) the whole frequent-pair
    // derivation twice
    val both = pairs.select(explode(array(
        struct(col("item_a").as("antecedent"), col("item_b").as("consequent"),
          col("support")),
        struct(col("item_b").as("antecedent"), col("item_a").as("consequent"),
          col("support")))).as("__r"))
      .select(col("__r.antecedent").as("antecedent"),
        col("__r.consequent").as("consequent"), col("__r.support").as("support"))
    both
      .join(items.select(col("item").as("antecedent"), col("__s").as("__sa")),
        Seq("antecedent"))
      .join(items.select(col("item").as("consequent"), col("__s").as("__sc")),
        Seq("consequent"))
      .crossJoin(broadcast(nBaskets))
      .withColumn("confidence",
        round(col("support").cast("double") / col("__sa"), 6))
      .withColumn("lift", round(col("support").cast("double") * col("__n") /
        (col("__sa") * col("__sc")), 6))
      .filter(col("confidence") >= minConfidence)
      .select("antecedent", "consequent", "support", "confidence", "lift")
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Count-based bigram language model with stupid backoff (Brants et al.
 * 2007, "Large Language Models in Machine Translation") — the cheap
 * corpus-fluency scorer that CCNet-style pipelines run before training
 * (a KenLM stand-in with the same data flow: fit counts on a trusted
 * slice, score every doc, filter/bucket on the per-token log-prob).
 *
 * Model: P(w2|w1) = c(w1 w2) / c(w1) when the bigram was seen in
 * training, else alpha * P_uni(w2), with the Laplace-smoothed unigram
 * P_uni(w) = (c(w) + 1) / (N + V) so out-of-vocabulary tokens score a
 * finite floor. All arithmetic is count ratios + ln — deterministic
 * given the training slice, hence oracle-checkable.
 *
 * Scale shape: fit = two hash aggregations (map-side partial combine)
 * over the training slice; score = explode the corpus into (w1, w2)
 * bigram rows, three equi-joins against the count tables, one per-doc
 * hash aggregation. Spark auto-broadcasts a model under the broadcast
 * threshold (the common case — a pruned vocab is MBs); a giant model
 * degrades to sort-merge joins keyed on the gram. At 100 TB the standard
 * trick is to prune the model to a top-V vocabulary before scoring so
 * the broadcast path always applies — [[NgramLmModel.pruned]].
 */
final case class NgramLmModel(
    unigrams: DataFrame,  // (w, c1)
    bigrams: DataFrame,   // (w1, w2, c12)
    totalTokens: Long,    // N = sum of unigram counts
    vocabSize: Long,      // V = distinct unigrams
    alpha: Double) {

  /** The model with only bigrams whose left context is a top-`v` unigram
    * — bounds model size so the scoring joins stay broadcastable. */
  def pruned(v: Int): NgramLmModel = {
    val top = unigrams.orderBy(col("c1").desc, col("w").asc).limit(v)
    copy(unigrams = top,
      bigrams = bigrams.join(top.select(col("w").as("w1")), Seq("w1")))
  }

  /**
   * Per-document fluency: (id, n_bigrams, avg_logp) where avg_logp is
   * the mean ln P(w_i | w_{i-1}) over the doc's bigrams, rounded to 6 dp
   * (cross-engine double tolerance). Docs with fewer than two tokens
   * have no bigrams and are not emitted.
   */
  def score(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val ts = Text.tokens(col(textCol))
    val pairs = arrays_zip(
      slice(ts, lit(1), size(ts) - 1).as("w1"),
      slice(ts, lit(2), size(ts) - 1).as("w2"))
    val exploded = df.select(col(idCol), explode(pairs).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val uniFloor = (coalesce(col("c2"), lit(0L)).cast("double") + 1.0) /
      (totalTokens + vocabSize).toDouble
    val logp = when(col("c12").isNotNull,
        log(col("c12").cast("double") / col("c1").cast("double")))
      .otherwise(log(lit(alpha) * uniFloor))
    exploded
      .join(bigrams, Seq("w1", "w2"), "left")
      .join(unigrams.select(col("w").as("w1"), col("c1")), Seq("w1"), "left")
      .join(unigrams.select(col("w").as("w2"), col("c1").as("c2")),
        Seq("w2"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(logp), 6).as("avg_logp"))
  }
}

object NgramLm {

  /** Fit unigram + bigram counts on `df`'s `textCol` (whitespace tokens,
    * lowercased — [[Text.tokens]]). Runs two aggregation jobs eagerly to
    * pin N and V. */
  def fit(df: DataFrame, textCol: String, alpha: Double = 0.4): NgramLmModel = {
    val ts = Text.tokens(col(textCol))
    val uni = df.select(explode(ts).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val pairs = arrays_zip(
      slice(ts, lit(1), size(ts) - 1).as("w1"),
      slice(ts, lit(2), size(ts) - 1).as("w2"))
    val bi = df.select(explode(pairs).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val nRow = uni.agg(sum(col("c1")).as("n"), count(lit(1)).as("v"))
      .collect()(0)
    NgramLmModel(uni, bi, nRow.getLong(0), nRow.getLong(1), alpha)
  }
}

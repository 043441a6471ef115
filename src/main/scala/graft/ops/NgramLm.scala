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
  def score(df: DataFrame, textCol: String, idCol: String): DataFrame =
    scoredBigrams(df, textCol, idCol)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("lp")), 6).as("avg_logp"))

  /** (id, w1, w2, lp) per corpus bigram — the shared scoring stream of
    * [[score]] and [[minKProb]]. */
  private def scoredBigrams(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
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
      .select(col(idCol), col("w1"), col("w2"), logp.as("lp"))
  }

  /**
   * Min-K% Prob membership signal (Shi et al. 2024, "Detecting
   * Pretraining Data from Large Language Models"): per document, the
   * mean log-probability of its `kFrac` LEAST-likely bigrams. A text the
   * model has effectively seen has no surprising spans, so even its
   * tail log-probs sit high; novel text's tail dips. The contamination /
   * memorization screen to run with [[graft.ops.Dedup]]'s
   * decontamination — n-gram overlap catches verbatim leaks, min-k
   * catches near-verbatim ones the tokenizer perturbed.
   *
   * Determinism across engines: per-bigram log-probs round to integer
   * MICRO-nats before ranking (summation-order jitter at ~1e-15 must
   * not reorder near-ties), the rank carries a (lp, w1, w2) tiebreak —
   * rows tied at the cutoff have EQUAL quantized lp, so which of them
   * lands inside the tail cannot change the sum — and the tail mean is
   * an EXACT integer sum divided once, so no engine can land on the
   * other side of a rounding boundary (an average of 6-dp doubles can:
   * measured, 2 of 500 sf0.01 docs flip the 6th decimal).
   *
   * Scale shape: [[score]]'s exploded join stream plus one per-doc
   * window (rank over the doc's own bigrams — bounded by doc length).
   * Output: `(id, n_bigrams, n_tail, min_k_logp)`.
   */
  def minKProb(df: DataFrame, textCol: String, idCol: String,
      kFrac: Double): DataFrame = {
    require(kFrac > 0 && kFrac <= 1, "kFrac must be in (0, 1]")
    val rows = scoredBigrams(df, textCol, idCol)
      .select(col(idCol), col("w1"), col("w2"),
        round(col("lp") * 1e6).cast("long").as("lpm"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("lpm").asc, col("w1").asc, col("w2").asc)
    rows
      .withColumn("n", count(lit(1)).over(byDoc))
      .withColumn("rk", row_number().over(ord))
      .filter(col("rk") <= greatest(ceil(lit(kFrac) * col("n")), lit(1L)))
      .groupBy(col(idCol))
      .agg(max(col("n")).as("n_bigrams"),
        count(lit(1)).as("n_tail"),
        round(sum(col("lpm")).cast("double") / count(lit(1)) / lit(1e6), 6)
          .as("min_k_logp"))
  }
}

/**
 * DSIR-style data selection (Xie et al. 2023, "Data Selection for
 * Language Models via Importance Resampling"): rank raw-corpus docs by
 * the importance log-ratio llr(x) = log p_target(x) - log p_raw(x)
 * under two cheap n-gram LMs, then draw k docs without replacement with
 * probability ∝ exp(llr) via the Gumbel top-k trick. The Gumbel uniform
 * is content-derived (salted md5 of the doc id, the [[Text.hashSplit]]
 * family) instead of an RNG, so the selection is deterministic,
 * partitioning-invariant and engine-replayable — a rerun over a
 * reprocessed corpus picks the same documents.
 *
 * Scale shape: ONE pass over the corpus — the bigram stream is exploded
 * once and joined against BOTH models' count tables (broadcast-able
 * after [[NgramLmModel.pruned]]), then a single per-doc aggregation
 * computes both mean log-probs; top-k compiles to
 * TakeOrderedAndProject (per-partition k-heap + driver merge of k rows,
 * no global sort shuffle).
 */
object Dsir {

  def select(docs: DataFrame, textCol: String, idCol: String,
      target: NgramLmModel, raw: NgramLmModel, k: Int): DataFrame = {
    val ts = Text.tokens(col(textCol))
    val pairs = arrays_zip(
      slice(ts, lit(1), size(ts) - 1).as("w1"),
      slice(ts, lit(2), size(ts) - 1).as("w2"))
    val exploded = docs.select(col(idCol), explode(pairs).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

    def side(m: NgramLmModel, sfx: String)(df: DataFrame): DataFrame = df
      .join(m.bigrams.select(col("w1"), col("w2"), col("c12").as(s"c12$sfx")),
        Seq("w1", "w2"), "left")
      .join(m.unigrams.select(col("w").as("w1"), col("c1").as(s"c1$sfx")),
        Seq("w1"), "left")
      .join(m.unigrams.select(col("w").as("w2"), col("c1").as(s"c2$sfx")),
        Seq("w2"), "left")
    def logp(m: NgramLmModel, sfx: String): Column = {
      val uniFloor = (coalesce(col(s"c2$sfx"), lit(0L)).cast("double") + 1.0) /
        (m.totalTokens + m.vocabSize).toDouble
      when(col(s"c12$sfx").isNotNull,
          log(col(s"c12$sfx").cast("double") / col(s"c1$sfx").cast("double")))
        .otherwise(log(lit(m.alpha) * uniFloor))
    }

    val scored = side(raw, "_r")(side(target, "_t")(exploded))
      .groupBy(col(idCol))
      .agg(round(avg(logp(target, "_t")), 6).as("lp_t"),
        round(avg(logp(raw, "_r")), 6).as("lp_r"))
    // Gumbel key: llr + (-ln(-ln u)) with u uniform in (0,1) from the
    // first 16 md5 bits of the salted id — argmax-k of this key IS a
    // weighted draw without replacement (Gumbel top-k)
    val h = conv(substring(md5(concat(col(idCol).cast("string"), lit("#dsir"))),
      1, 4), 16, 10).cast("long").cast("double")
    val u = (h + lit(0.5d)) / lit(65536.0d)
    scored
      .select(col(idCol), round(col("lp_t") - col("lp_r"), 6).as("llr"),
        round(col("lp_t") - col("lp_r") - log(-log(u)), 6).as("sel_key"))
      .orderBy(col("sel_key").desc, col(idCol).asc)
      .limit(k)
  }
}

/**
 * Interpolated Kneser-Ney bigram model (Kneser & Ney 1995; the formulation
 * of Chen & Goodman 1998) — the smoothing KenLM actually ships, upgraded
 * from [[NgramLmModel]]'s stupid backoff. The lower-order distribution is
 * the CONTINUATION probability (how many distinct contexts a word follows)
 * rather than raw frequency, which is what makes "francisco" unlikely
 * outside "san francisco" even though it is frequent:
 *
 *   P(w2|w1) = max(c12 - D, 0)/c1 + D·fan(w1)/c1 · Pc(w2)     (w1 seen)
 *   Pc(w2)   = (cont(w2) + 1) / (B + V + 1)                    (+1 floor)
 *
 * with c1 = Σ_w2 c12 (context occurrences), fan(w1) = |{w2 : c12 > 0}|,
 * cont(w2) = |{w1 : c12 > 0}|, B = distinct bigram types, V = vocabulary.
 * An unseen context backs off to Pc alone. The +1 continuation floor
 * keeps every score finite (an OOV continuation otherwise has Pc = 0),
 * the same role Laplace plays in the stupid-backoff floor. All terms are
 * count ratios — deterministic and oracle-replayable (`q_text_lm_kn`).
 *
 * Scale shape identical to [[NgramLmModel.score]]: three count tables
 * joined against the exploded bigram stream (broadcast-able once pruned
 * to a top vocabulary), one per-doc aggregation.
 */
final case class KneserNeyModel(
    contexts: DataFrame,      // (w1, c1, fan)
    bigrams: DataFrame,       // (w1, w2, c12)
    continuations: DataFrame, // (w2, cont)
    nBigramTypes: Long,       // B
    vocabSize: Long,          // V
    discount: Double) {

  /** Per-document fluency: (id, n_bigrams, avg_logp), same contract as
    * [[NgramLmModel.score]] so the two models are drop-in comparable. */
  def score(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val ts = Text.tokens(col(textCol))
    val pairs = arrays_zip(
      slice(ts, lit(1), size(ts) - 1).as("w1"),
      slice(ts, lit(2), size(ts) - 1).as("w2"))
    val exploded = df.select(col(idCol), explode(pairs).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val pc = (coalesce(col("cont"), lit(0L)).cast("double") + 1.0) /
      lit((nBigramTypes + vocabSize + 1).toDouble)
    val term1 = greatest(
      coalesce(col("c12"), lit(0L)).cast("double") - lit(discount), lit(0.0)) /
      col("c1").cast("double")
    val term2 = lit(discount) * col("fan").cast("double") /
      col("c1").cast("double") * pc
    val logp = when(col("c1").isNotNull, log(term1 + term2)).otherwise(log(pc))
    exploded
      .join(bigrams, Seq("w1", "w2"), "left")
      .join(contexts, Seq("w1"), "left")
      .join(continuations, Seq("w2"), "left")
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

  /** Fit the Kneser-Ney count structure: everything derives from the
    * bigram type/count table in one aggregation pass each (context sums
    * + fan-outs, continuation fan-ins, type count), plus one distinct
    * count for V. */
  def fitKneserNey(df: DataFrame, textCol: String,
      discount: Double = 0.75): KneserNeyModel = {
    require(discount > 0 && discount < 1, "discount must be in (0, 1)")
    val ts = Text.tokens(col(textCol))
    val pairs = arrays_zip(
      slice(ts, lit(1), size(ts) - 1).as("w1"),
      slice(ts, lit(2), size(ts) - 1).as("w2"))
    val bi = df.select(explode(pairs).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val ctx = bi.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("fan"))
    val cont = bi.groupBy(col("w2")).agg(count(lit(1)).as("cont"))
    val bTypes = bi.count()
    val v = df.select(explode(ts).as("w")).agg(countDistinct(col("w")))
      .collect()(0).getLong(0)
    KneserNeyModel(ctx, bi, cont, bTypes, v, discount)
  }

  /** Persist a fitted [[NgramLmModel]]: the count TABLES as parquet (the
    * model at scale IS tables — they reload as lazy DataFrames, never a
    * driver-side collect) plus a one-row scalar meta table. */
  def save(m: NgramLmModel, dir: String): Unit = {
    val spark = m.unigrams.sparkSession
    import spark.implicits._
    m.unigrams.write.mode("overwrite").parquet(s"$dir/unigrams")
    m.bigrams.write.mode("overwrite").parquet(s"$dir/bigrams")
    Seq((m.totalTokens, m.vocabSize, m.alpha)).toDF("n", "v", "alpha")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Load a [[save]]d bigram LM; count tables come back lazy. */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String): NgramLmModel = {
    val meta = spark.read.parquet(s"$dir/meta").collect()(0)
    NgramLmModel(spark.read.parquet(s"$dir/unigrams"),
      spark.read.parquet(s"$dir/bigrams"),
      meta.getLong(0), meta.getLong(1), meta.getDouble(2))
  }

  /** Persist a fitted [[KneserNeyModel]] — same table + scalar layout. */
  def saveKneserNey(m: KneserNeyModel, dir: String): Unit = {
    val spark = m.contexts.sparkSession
    import spark.implicits._
    m.contexts.write.mode("overwrite").parquet(s"$dir/contexts")
    m.bigrams.write.mode("overwrite").parquet(s"$dir/bigrams")
    m.continuations.write.mode("overwrite").parquet(s"$dir/continuations")
    Seq((m.nBigramTypes, m.vocabSize, m.discount)).toDF("b", "v", "d")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Load a [[saveKneserNey]]-persisted model. */
  def loadKneserNey(spark: org.apache.spark.sql.SparkSession,
      dir: String): KneserNeyModel = {
    val meta = spark.read.parquet(s"$dir/meta").collect()(0)
    KneserNeyModel(spark.read.parquet(s"$dir/contexts"),
      spark.read.parquet(s"$dir/bigrams"),
      spark.read.parquet(s"$dir/continuations"),
      meta.getLong(0), meta.getLong(1), meta.getDouble(2))
  }
}

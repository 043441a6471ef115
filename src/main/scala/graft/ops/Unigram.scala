package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.UnigramEncode

/**
 * Unigram-LM subword tokenizer (Kudo 2018, the SentencePiece `unigram`
 * model; SURVEY.md §7.5 tokenizer family): each word is segmented by the
 * Viterbi split maximizing the sum of piece log-probabilities under a
 * fitted unigram piece model — the probabilistic counterpart of BPE's
 * merge chain and WordPiece's greedy walk, and the third of the three
 * subword families production pipelines tokenize with.
 *
 * Scores are INTEGER micro-nats (`round(1e6 · ln p)`): the Viterbi DP
 * compares integer sums, so segmentation is exact, deterministic, and
 * engine-independent — the property that makes `q_text_unigram`'s
 * DuckDB recursive-CTE Viterbi replay hash-match bit-for-bit (float
 * log-prob sums could flip ties between engines depending on addition
 * order).
 *
 * Training ([[fit]]) is hard-EM (Viterbi-EM) over the bounded corpus
 * word-frequency table — the [[Bpe.fit]] fit-statistics pattern:
 * seed the vocabulary with the most frequent substrings (single chars
 * always kept for coverage), then alternate (E) Viterbi-segment every
 * word under current scores and (M) re-estimate scores from piece usage,
 * pruning unused pieces; finish by cutting to `vocabSize` on usage.
 * Kudo's full algorithm uses soft EM (forward-backward) and a
 * loss-delta prune — hard-EM is its standard deterministic
 * simplification and keeps fit and apply on the identical integer DP.
 *
 * Apply ([[tokensCol]]) is [[graft.functions.UnigramEncode]]: one
 * codegen'd DP pass per document, vocabulary shipped as a plan
 * reference object, cost O(doc length × max piece length) independent
 * of vocabulary size. No shuffle, no UDF — at 100 TB tokenization fuses
 * into the scan that already reads the text column.
 */
object Unigram {

  /** Fitted piece model: (piece, score) with integer micro-nat scores;
    * `unk` replaces any word the pieces cannot tile. */
  final case class Pieces(entries: Seq[(String, Long)], unk: String = "<unk>")
      extends Serializable {
    def size: Int = entries.size
    def pieces: Seq[String] = entries.map(_._1)
    def scores: Seq[Long] = entries.map(_._2)
  }

  /** A FIXED piece model for the oracle queries ([[Bpe.FixedEnglishMerges]]
    * pattern): full single-letter coverage at distinct low scores (rank-
    * spread so no two chars tie) plus multi-char pieces priced under
    * ~-3.1 micro-nats/char so the DP prefers them over char tilings —
    * "table" → `ta ble`, "value" → `val ue`, "query" → `qu ery`. */
  val FixedEnglishPieces: Pieces = Pieces(
    ('a' to 'z').zipWithIndex.map { case (c, i) =>
      (c.toString, -13000000L - 1000L * i)
    } ++ Seq(
      ("the", -5800000L), ("scan", -6100000L), ("row", -6200000L),
      ("key", -6300000L), ("fast", -6400000L), ("val", -6500000L),
      ("ue", -6600000L), ("ta", -6700000L), ("ble", -6800000L),
      ("qu", -6900000L), ("ery", -7000000L), ("ort", -7100000L),
      ("ata", -7200000L), ("ine", -7300000L), ("umn", -7400000L),
      ("ast", -7500000L), ("ream", -7600000L), ("indow", -7700000L)))

  /** Reference single-word Viterbi under a piece map — the in-memory twin
    * of the expression's DP (same strict-> / smallest-j tie rule), used by
    * [[fit]]'s E-step so fit and apply agree exactly. Returns null when
    * the word is not tileable. */
  private[ops] def viterbi(w: String, m: java.util.HashMap[String, java.lang.Long],
      maxLen: Int): Array[String] = {
    val n = w.length
    val dp = new Array[Long](n + 1)
    val bp = new Array[Int](n + 1)
    java.util.Arrays.fill(dp, Long.MinValue)
    dp(0) = 0L
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (dp(j) != Long.MinValue) {
          val sc = m.get(w.substring(j, i))
          if (sc != null && dp(j) + sc.longValue() > dp(i)) {
            dp(i) = dp(j) + sc.longValue(); bp(i) = j
          }
        }
        j += 1
      }
      i += 1
    }
    if (dp(n) == Long.MinValue) return null
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var p = n
    while (p > 0) { out += w.substring(bp(p), p); p = bp(p) }
    out.reverseIterator.toArray
  }

  private def toMicroNats(p: Double): Long = math.round(1e6 * math.log(p))

  /**
   * Hard-EM fit: seed with the top-`seedSize` most frequent substrings
   * (length ≤ `maxPieceLen`; all single chars kept), run `iters`
   * Viterbi-E / usage-M rounds, cut to `vocabSize` by final usage
   * (usage desc, piece asc; single chars always survive). Deterministic.
   */
  def fit(df: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 6, iters: Int = 3, seedSize: Int = 2000,
      maxWords: Int = 50000, unk: String = "<unk>"): Pieces = {
    require(vocabSize >= 1 && maxPieceLen >= 1 && iters >= 1 && seedSize >= 1)
    val wc = df.select(explode(Text.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    // seed: substring occurrence counts, single chars always in. Piece
    // boundaries walk CODE POINTS so a supplementary-plane char never
    // yields half-surrogate pieces (invalid strings that would mangle
    // through the parquet artifact round trip); piece LENGTH stays
    // UTF-16 units to match the apply DP's maxLen window.
    val sub = scala.collection.mutable.HashMap[String, Long]()
    wc.foreach { case (w, c) =>
      val bounds = (0 to w.length).filter(i =>
        i == 0 || i == w.length || !Character.isLowSurrogate(w.charAt(i)))
      // the inner scan is BOUNDED by maxPieceLen boundary steps (each
      // step is >= 1 UTF-16 unit, so the unit-length guard still cuts
      // exactly) — an unbounded boundary-pair enumeration would be
      // O(len^2) per word and a single long URL/base64 token in the
      // word table would stall the driver
      for {
        bi <- bounds.indices
        bj <- (bi + 1) to math.min(bi + maxPieceLen, bounds.length - 1)
        if bounds(bj) - bounds(bi) <= maxPieceLen
      } {
        val p = w.substring(bounds(bi), bounds(bj))
        sub.update(p, sub.getOrElse(p, 0L) + c)
      }
    }
    val chars = sub.keysIterator.filter(_.length == 1).toSeq.sorted
    val multi = sub.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, seedSize - chars.size)).map(_._1)
    var vocab: Seq[String] = chars ++ multi
    var counts: Map[String, Long] = vocab.map(p => p -> sub(p)).toMap

    def scoresOf(cnt: Map[String, Long]): java.util.HashMap[String, java.lang.Long] = {
      val total = math.max(1L, cnt.valuesIterator.sum)
      val m = new java.util.HashMap[String, java.lang.Long](cnt.size * 2)
      cnt.foreach { case (p, c) =>
        m.put(p, java.lang.Long.valueOf(toMicroNats(c.toDouble / total)))
      }
      m
    }

    var it = 0
    while (it < iters) {
      val m = scoresOf(counts)
      val usage = scala.collection.mutable.HashMap[String, Long]()
      wc.foreach { case (w, c) =>
        val segs = viterbi(w, m, maxPieceLen)
        if (segs != null) segs.foreach(p =>
          usage.update(p, usage.getOrElse(p, 0L) + c))
      }
      // M-step: unused multi-char pieces drop; chars keep a floor count
      // of 1 so coverage never regresses
      counts = vocab.flatMap { p =>
        val u = usage.getOrElse(p, 0L)
        if (u > 0) Some(p -> u)
        else if (p.length == 1) Some(p -> 1L)
        else None
      }.toMap
      vocab = counts.keysIterator.toSeq.sorted
      it += 1
    }
    // final cut: usage desc (piece asc tie), chars always kept
    val keptMulti = counts.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, vocabSize - chars.size)).map(_._1).toSet
    val finalCounts = counts.filter { case (p, _) =>
      p.length == 1 || keptMulti(p) }
    val m = scoresOf(finalCounts)
    Pieces(finalCounts.keysIterator.toSeq.sorted
      .map(p => (p, m.get(p).longValue())), unk)
  }

  /** Corpus negative log-likelihood (micro-nats, best-path) of the piece
    * model over the word table — the fit diagnostic (spec asserts the
    * fitted model beats the seed on its own corpus). Untileable words
    * cost `unkCost` each. */
  def corpusNll(df: DataFrame, textCol: String, pieces: Pieces,
      maxWords: Int = 50000, unkCost: Long = 30000000L): Long = {
    val wc = df.select(explode(Text.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val m = new java.util.HashMap[String, java.lang.Long]()
    pieces.entries.foreach { case (p, s) => m.put(p, s) }
    val maxLen = if (pieces.entries.isEmpty) 1 else pieces.pieces.map(_.length).max
    // ONE Viterbi implementation on the JVM side: the best-path score is
    // the sum of the winning segmentation's piece scores, so reuse
    // [[viterbi]] rather than hand-rolling the DP a second time (the tie
    // rule and unreachable handling must stay bit-identical everywhere)
    var nll = 0L
    wc.foreach { case (w, c) =>
      val segs = viterbi(w, m, maxLen)
      nll += c * (if (segs == null) unkCost
        else -segs.map(m.get(_).longValue()).sum)
    }
    nll
  }

  /** Column-level Unigram-LM tokenization — codegen'd Viterbi pass
    * ([[graft.functions.UnigramEncode]]). */
  def tokensCol(text: Column, pieces: Pieces): Column =
    UnigramEncode.unigramEncode(coalesce(text.cast("string"), lit("")),
      pieces.pieces, pieces.scores, pieces.unk)

  /** Subword count per row, for the chunk/pack family's hooks. */
  def tokenCountCol(text: Column, pieces: Pieces): Column =
    size(tokensCol(text, pieces)).cast("long")

  /** Tokenize the corpus: (id, ulm_tokens, n_ulm_tokens, ulm_text) —
    * the [[Bpe.tokenize]] output shape with the ulm_ prefix. */
  def tokenize(df: DataFrame, textCol: String, idCol: String,
      pieces: Pieces): DataFrame = {
    val t = tokensCol(col(textCol), pieces)
    df.select(col(idCol),
      t.as("ulm_tokens"),
      size(t).cast("long").as("n_ulm_tokens"),
      array_join(t, " ").as("ulm_text"))
  }

  /** Persist a fitted piece model as (rank, piece, score, unk) parquet —
    * the [[Bpe.save]] artifact pattern. */
  def save(p: Pieces, spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    p.entries.zipWithIndex.map { case ((piece, s), r) => (r.toLong, piece, s, p.unk) }
      .toDF("rank", "piece", "score", "unk")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Load a [[save]]d piece model; order restored exactly. */
  def load(spark: SparkSession, dir: String): Pieces = {
    val rows = spark.read.parquet(dir).orderBy("rank").collect()
    Pieces(rows.map(r => (r.getString(1), r.getLong(2))).toSeq,
      if (rows.isEmpty) "<unk>" else rows.head.getString(3))
  }
}

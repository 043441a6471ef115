package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.WordPieceEncode

/**
 * WordPiece subword tokenizer (Wu et al. 2016, the BERT tokenizer;
 * SURVEY.md §7.5 tokenizer family): greedy longest-match-first
 * segmentation against a fitted vocabulary, word-initial pieces plain
 * and continuations `##`-prefixed.
 *
 * Training ([[fit]]) is the likelihood-scored merge loop (the criterion
 * that distinguishes WordPiece from BPE): at each step merge the adjacent
 * symbol pair maximizing `count(ab) / (count(a) * count(b))` — the pair
 * whose merge most increases a unigram LM's corpus likelihood — instead
 * of raw `count(ab)`. Same distributed word-count aggregation and
 * bounded driver merge loop as [[Bpe.fit]] (the fit-statistics pattern:
 * the collected table is capped at `maxWords` rows, never per-row data).
 *
 * Application ([[tokensCol]]) is [[graft.functions.WordPieceEncode]] —
 * one imperative greedy pass per document inside whole-stage codegen,
 * vocabulary shipped as a plan reference object. Unlike BPE's replace
 * chain the apply cost is O(doc length × max piece length) INDEPENDENT
 * of vocabulary size, so a production-sized vocab tokenizes at the same
 * per-byte cost as the oracle fixture's.
 *
 * Scale shape: fit = one explode + map-side-combining hash aggregate +
 * top-`maxWords` TakeOrdered; apply = one narrow codegen'd projection,
 * no shuffle, no UDF. At 100 TB the apply fuses into whatever scan
 * already reads the text column.
 */
object WordPiece {

  /** Fitted vocabulary: word-initial pieces plain, continuations with
    * the `##` prefix; `unk` replaces any word the vocabulary cannot
    * cover from its first character. */
  final case class Vocab(pieces: Seq[String], unk: String = "[UNK]")
      extends Serializable {
    def size: Int = pieces.size
  }

  /** A small FIXED vocabulary for the oracle queries (the fitted path is
    * spec-checked; oracles need a vocabulary both engines know at
    * query-build time — the [[Bpe.FixedEnglishMerges]] pattern). Full
    * single-letter coverage plus multi-char pieces that segment the
    * fixture's query-engine vocabulary interestingly ("table" →
    * `ta ##ble`, "scan" → `scan`, "value" → `val ##ue`). */
  val FixedEnglishVocab: Vocab = Vocab(
    ('a' to 'z').map(_.toString) ++
    ('a' to 'z').map(c => s"##$c") ++
    Seq("the", "scan", "key", "row", "fast", "val", "ta", "co", "st", "qu",
        "##ble", "##ue", "##st", "##er", "##an", "##in", "##ow", "##umn",
        "##ery", "##ort", "##ata", "##ine"))

  /**
   * Train a WordPiece vocabulary with `nMerges` likelihood-scored merges
   * over the corpus word-frequency table. Deterministic: the pair score
   * is compared as exact cross-multiplied longs via BigInt (no float
   * ties), ties break on the lexicographically smallest (a, b). Returns
   * the alphabet (both forms, sorted) followed by merged pieces in
   * creation order.
   */
  def fit(df: DataFrame, textCol: String, nMerges: Int,
      maxWords: Int = 50000, unk: String = "[UNK]"): Vocab = {
    require(nMerges >= 0 && maxWords >= 1)
    val wc = df.select(explode(Text.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // symbol form: first char plain, rest ##-prefixed. Split on CODE
    // POINTS, not UTF-16 units — String.split("") halves surrogate pairs
    // and the alphabet would gain unpaired-surrogate "pieces" (invalid
    // strings that mangle through the parquet save/load round trip).
    var words: Array[(Array[String], Long)] = wc.map { case (w, c) =>
      (w.codePoints().toArray
        .map(cp => new String(Character.toChars(cp))).zipWithIndex
        .map { case (ch, i) => if (i == 0) ch else s"##$ch" }, c)
    }
    val alphabet = words.iterator.flatMap(_._1).toSet.toSeq.sorted
    val merges = Seq.newBuilder[String]
    var m = 0
    var done = false
    while (m < nMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap[(String, String), Long]()
      val symCounts = scala.collection.mutable.HashMap[String, Long]()
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length) {
          symCounts.update(syms(i), symCounts.getOrElse(syms(i), 0L) + c)
          if (i + 1 < syms.length) {
            val k = (syms(i), syms(i + 1))
            pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          }
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        // maximize c_ab / (c_a * c_b): compare a/b vs c/d as BigInt
        // cross-products a*d vs c*b — exact, no float tie ambiguity
        val best = pairCounts.toSeq.reduceLeft { (x, y) =>
          val lx = BigInt(x._2) * BigInt(symCounts(y._1._1)) * BigInt(symCounts(y._1._2))
          val ly = BigInt(y._2) * BigInt(symCounts(x._1._1)) * BigInt(symCounts(x._1._2))
          if (lx > ly) x
          else if (ly > lx) y
          else if (Ordering[(String, String)].lteq(x._1, y._1)) x else y
        }._1
        val mergedSym =
          best._1 + (if (best._2.startsWith("##")) best._2.substring(2) else best._2)
        merges += mergedSym
        words = words.map { case (syms, c) =>
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += mergedSym; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, c)
        }
        m += 1
      }
    }
    Vocab(alphabet ++ merges.result(), unk)
  }

  /** Column-level WordPiece: the flat subword array per document —
    * codegen'd greedy pass ([[graft.functions.WordPieceEncode]]). */
  def tokensCol(text: Column, vocab: Vocab): Column =
    WordPieceEncode.wordpieceEncode(coalesce(text.cast("string"), lit("")),
      vocab.pieces, vocab.unk)

  /** Subword count per row — [[tokensCol]] collapsed to its length, for
    * the chunk/pack family's `tokenCount` hooks. */
  def tokenCountCol(text: Column, vocab: Vocab): Column =
    size(tokensCol(text, vocab)).cast("long")

  /** Tokenize the corpus: (id, wp_tokens, n_wp_tokens, wp_text) — one
    * narrow codegen'd projection ([[Bpe.tokenize]]'s output shape with
    * the wp_ prefix, so both tokenizers feed [[Text.chunk]] the same
    * way). */
  def tokenize(df: DataFrame, textCol: String, idCol: String,
      vocab: Vocab): DataFrame = {
    val t = tokensCol(col(textCol), vocab)
    df.select(col(idCol),
      t.as("wp_tokens"),
      size(t).cast("long").as("n_wp_tokens"),
      array_join(t, " ").as("wp_text"))
  }

  /** Persist a fitted vocabulary as (rank, piece, unk) parquet — the
    * [[Bpe.save]] artifact pattern. */
  def save(v: Vocab, spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    v.pieces.zipWithIndex.map { case (p, r) => (r.toLong, p, v.unk) }
      .toDF("rank", "piece", "unk")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Load a [[save]]d vocabulary; piece order restored exactly. */
  def load(spark: SparkSession, dir: String): Vocab = {
    val rows = spark.read.parquet(dir).orderBy("rank").collect()
    Vocab(rows.map(_.getString(1)).toSeq,
      if (rows.isEmpty) "[UNK]" else rows.head.getString(2))
  }
}

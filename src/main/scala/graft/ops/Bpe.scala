package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}

/**
 * Byte-pair-encoding subword tokenizer (SURVEY.md §7.5): the trained
 * tokenizer that feeds [[Text.chunk]]'s `tokensCol` and
 * [[Text.packChunks]]'s `tokenCountCol`, so chunk windows and pack
 * budgets follow REAL subword counts instead of whitespace words.
 *
 * Training ([[fit]]) is the classic Sennrich BPE loop over the corpus
 * word-frequency table: start from characters, repeatedly merge the most
 * frequent adjacent symbol pair. The word-count aggregation is
 * distributed (one explode + hash-agg); the merge loop itself runs on
 * the driver over the collected (word, count) table — the standard
 * fit-statistics pattern (the table is bounded by `maxWords`, like the
 * encoding maps), NOT a per-row collect.
 *
 * Application ([[tokenize]]) semantics are deliberately defined as a
 * SEQUENTIAL replace chain: merges are applied in rank order, each
 * replacing all of its adjacent occurrences left-to-right across the
 * document before the next merge runs. On text whose symbol statistics
 * resemble the training corpus this equals the lowest-rank-first greedy
 * loop (training creates merge k's parts before merge k); on arbitrary
 * text it is a deterministic, well-defined variant — and crucially it is
 * expressible as a chain of plain string `replace` calls over a marker
 * representation, which Java and DuckDB execute with identical
 * left-to-right non-overlap semantics, making the tokenizer fully
 * ORACLE-CHECKABLE (q_text_bpe / q_text_chunk_bpe / q_text_pack_bpe).
 *
 * Representation: the document is lowercased and whitespace-split; each
 * character becomes `c@` (one trailing marker per symbol), symbols are
 * joined by one space, words by TWO spaces, and the string gets a
 * leading space. A merge (a, b) is then the literal replace
 * `" a@ b@" -> " ab@"`: the leading space anchors matches at symbol
 * starts (no mid-symbol false matches), the double word separator stops
 * merges from crossing word boundaries, and consecutive pairs merge
 * pairwise left-to-right exactly like the training fold.
 *
 * Scale shape: tokenize is one narrow mapPartitions pass (merge list
 * broadcast with the closure; no shuffle, no UDF registry); cost is
 * O(nMerges x doc length) scans per document — a merge-trie single-pass
 * encoder is the standard production optimization and changes only the
 * constant, not the shape.
 */
object Bpe {

  /** Ordered merge list (rank = position). */
  final case class Merges(pairs: Seq[(String, String)]) extends Serializable {
    def size: Int = pairs.size
  }

  /** A small FIXED English-bigram merge list for the oracle queries
    * (the fitted-merge path is spec-checked; oracles need a merge list
    * both engines know at query-build time — the planePairs pattern).
    * Later merges consume earlier outputs ("th"+"e"), exercising the
    * rank-order chain. */
  val FixedEnglishMerges: Merges = Merges(Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "in" -> "g", "a" -> "n",
    "an" -> "d", "e" -> "r", "o" -> "n", "r" -> "e", "o" -> "f",
    "t" -> "o", "s" -> "t", "e" -> "n", "e" -> "d", "i" -> "s",
    "o" -> "r", "a" -> "t", "a" -> "l", "o" -> "u", "s" -> "e"))

  /** Marker representation of one document (see scaladoc):
    * leading space, `c@` per char, single space between symbols,
    * double space between words. */
  private def repr(text: String): String = {
    val words = text.toLowerCase.split("\\s+", -1)
    val sb = new java.lang.StringBuilder(text.length * 3 + 8)
    sb.append(' ')
    var wi = 0
    while (wi < words.length) {
      if (wi > 0) sb.append("  ") // DOUBLE separator: merges never cross words
      val w = words(wi)
      var ci = 0
      while (ci < w.length) {
        if (ci > 0) sb.append(' ')
        sb.append(w.charAt(ci)).append('@')
        ci += 1
      }
      wi += 1
    }
    sb.toString
  }

  /** Apply the merge chain to one document; returns the subword tokens. */
  def encode(text: String, merges: Merges): Array[String] = {
    var s = repr(text)
    merges.pairs.foreach { case (a, b) =>
      s = s.replace(s" $a@ $b@", s" $a$b@")
    }
    s.split(" ").iterator.filter(_.nonEmpty)
      .map(t => t.substring(0, t.length - 1)).toArray
  }

  /** Left-to-right pairwise merge of (a, b) in a symbol sequence — the
    * in-memory twin of the replace-chain step, used by the training fold
    * so fit and apply agree exactly. */
  private def mergePair(syms: Array[String], a: String, b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /**
   * Train `nMerges` BPE merges on the corpus. Distributed word-count
   * aggregation; driver-side merge loop over the bounded (word, count)
   * table (top `maxWords` by count — rare-word truncation is the
   * standard vocabulary-budget cut). Deterministic: ties break on the
   * lexicographically smallest (a, b).
   */
  def fit(df: DataFrame, textCol: String, nMerges: Int,
      maxWords: Int = 50000): Merges = {
    require(nMerges >= 0 && maxWords >= 1)
    val wc = df.select(explode(Text.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var words: Array[(Array[String], Long)] =
      wc.map { case (w, c) => (w.split("").filter(_.nonEmpty), c) }
    val merges = Seq.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < nMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val best = pairCounts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) =>
          (mergePair(syms, best._1, best._2), c)
        }
        m += 1
      }
    }
    Merges(merges.result())
  }

  /**
   * The marker representation as a pure Catalyst column — the exact
   * [[repr]] arithmetic expressed with `split`/`transform`/`regexp_replace`
   * so the whole tokenizer can run INSIDE whole-stage codegen (no
   * mapPartitions Row boundary). `split(.., -1)` keeps trailing empties,
   * matching `String.split("\\s+", -1)`.
   */
  private def reprCol(text: Column): Column = {
    val words = split(lower(coalesce(text.cast("string"), lit(""))), "\\s+", -1)
    val marked = transform(words, w => rtrim(regexp_replace(w, "(.)", "$1@ ")))
    concat(lit(" "), array_join(marked, "  "))
  }

  /**
   * Column-level BPE: the identical sequential replace chain as
   * [[encode]], but as Catalyst `StringReplace` expressions — Java's
   * `String.replace` and the expression both substitute left-to-right
   * non-overlapping, so this is bit-identical to [[tokenize]]'s output
   * (spec-pinned) while staying inside codegen. Lets BPE counts feed
   * aggregations ([[fertilityStats]]) and per-segment arithmetic
   * ([[Chat.sftTokenSpans]]) without a mapPartitions hop.
   *
   * Cost is one full-string scan per merge (O(nMerges × doc length),
   * same as [[encode]]); for large merge lists prefer [[tokenize]] whose
   * single-pass loop amortizes better, or pre-materialize `bpe_tokens`.
   */
  def tokensCol(text: Column, merges: Merges): Column = {
    val chained = merges.pairs.foldLeft(reprCol(text)) { case (e, (a, b)) =>
      replace(e, lit(s" $a@ $b@"), lit(s" $a$b@"))
    }
    transform(
      filter(split(chained, " ", -1), t => length(t) > 0),
      t => t.substr(lit(1), length(t) - 1))
  }

  /** Subword count per row — [[tokensCol]] collapsed to its length. */
  def tokenCountCol(text: Column, merges: Merges): Column =
    size(tokensCol(text, merges)).cast("long")

  /**
   * Tokenizer fertility report per group (typically the source): subword
   * tokens per word and (non-whitespace) chars per subword — the standard
   * diagnostic for how well a vocabulary fits each slice of a multi-source
   * corpus (a high-fertility source burns training budget; CC-style
   * pipelines gate on it before mixing). One narrow codegen'd projection
   * ([[tokenCountCol]]) + one map-side-combining aggregate — no shuffle
   * beyond the G-row group exchange.
   *
   * Output: (group, n_docs, n_words, n_bpe_tokens, n_chars, fertility,
   * chars_per_token), ratios rounded to 6 dp.
   */
  def fertilityStats(df: DataFrame, textCol: String, groupCol: String,
      merges: Merges): DataFrame = {
    val t = lower(col(textCol))
    val nWords = size(filter(split(t, "\\s+", -1), w => length(w) > 0)).cast("long")
    val nChars = length(regexp_replace(t, "\\s+", "")).cast("long")
    df.select(col(groupCol), nWords.as("__w"), nChars.as("__c"),
        tokenCountCol(col(textCol), merges).as("__t"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__w")).as("n_words"),
        sum(col("__t")).as("n_bpe_tokens"),
        sum(col("__c")).as("n_chars"),
        round(sum(col("__t")).cast("double") / sum(col("__w")), 6).as("fertility"),
        round(sum(col("__c")).cast("double") / sum(col("__t")), 6).as("chars_per_token"))
  }

  /**
   * Tokenize the corpus: (id, bpe_tokens, n_bpe_tokens, bpe_text).
   * Id-type generic (native passthrough, like the pack operators);
   * `bpe_text` is the space-joined token stream — feed it (or
   * `bpe_tokens` via `tokensCol`) into [[Text.chunk]] and the chunk/pack
   * family budgets by subwords.
   */
  def tokenize(df: DataFrame, textCol: String, idCol: String,
      merges: Merges): DataFrame = {
    val idField = df.schema(idCol)
    val outSchema = StructType(Seq(
      StructField(idCol, idField.dataType, idField.nullable),
      StructField("bpe_tokens", ArrayType(StringType, containsNull = false),
        nullable = false),
      StructField("n_bpe_tokens", LongType, nullable = false),
      StructField("bpe_text", StringType, nullable = false)))
    val mergesLocal = merges
    df.select(col(idCol).as("__id"), col(textCol).cast("string").as("__text"))
      .mapPartitions { it =>
        it.map { row =>
          val toks = encode(if (row.isNullAt(1)) "" else row.getString(1), mergesLocal)
          Row(row.get(0), toks.toSeq, toks.length.toLong, toks.mkString(" "))
        }
      }(Encoders.row(outSchema))
  }

  /** Persist a fitted merge list as (rank, a, b) parquet — the tokenizer
    * artifact a training pipeline fits once and ships everywhere (the
    * [[IvfIndex]] save/load pattern: fit-statistics persist next to the
    * data they were fit on). */
  def save(m: Merges, spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    import spark.implicits._
    m.pairs.zipWithIndex.map { case ((a, b), r) => (r.toLong, a, b) }
      .toDF("rank", "a", "b")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Load a [[save]]d merge list; rank order restored exactly. */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String): Merges =
    Merges(spark.read.parquet(dir).orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq)
}

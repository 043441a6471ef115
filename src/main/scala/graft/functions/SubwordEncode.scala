package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Subword tokenizer apply-expressions: WordPiece greedy longest-match and
 * Unigram-LM Viterbi, each as ONE imperative pass per document inside
 * whole-stage codegen. Together with [[graft.ops.Bpe]]'s replace-chain
 * these cover the three subword families every LLM pipeline tokenizes
 * with (BPE / WordPiece / SentencePiece-Unigram).
 *
 * Why custom Catalyst expressions (the [[WordShingles]] rationale): both
 * algorithms are per-string dynamic programs / greedy scans — a HOF
 * formulation would interpret a lambda per (position × piece-length)
 * step, and a UDF would break codegen and the zero-UDF audit. The
 * fitted vocabulary rides along as a plan-serialized reference object
 * (`ctx.addReferenceObj`), NOT as generated literals, so a 100k-piece
 * production vocab neither bloats the plan nor recompiles codegen.
 *
 * Both expressions lowercase and whitespace-split internally (matching
 * `Text.tokens`); tokenization is per-word, so the scan stays narrow
 * (no explode) and the output is the flat subword array per document.
 *
 * Unicode contract: segmentation walks UTF-16 code units, the oracle
 * replay walks code points — identical for BMP vocabularies (every
 * shipped vocab). A supplementary-plane character (emoji) can never
 * match a BMP piece on either side, so a word containing one collapses
 * to the unk token under BOTH walks (spec-pinned); only a vocabulary
 * that itself contained supplementary-plane pieces would diverge.
 */
object SubwordEncode {
  private[functions] val Ws: Pattern = Pattern.compile("\\s+")
}

/**
 * Serialized WordPiece vocabulary: `pieces` hold word-initial forms plain
 * and continuations with the `##` prefix (the BERT convention). The
 * derived lookup set / max piece length are transient and rebuilt lazily
 * on each executor after deserialization.
 */
final class WpVocabHolder(val pieces: Array[String], val unk: String)
    extends Serializable {
  @transient lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](pieces.length * 2)
    pieces.foreach(s.add)
    s
  }
  /** Longest RAW substring any piece can consume (## prefix excluded). */
  @transient lazy val maxLen: Int =
    if (pieces.isEmpty) 1
    else pieces.iterator
      .map(p => if (p.startsWith("##")) p.length - 2 else p.length).max.max(1)
  @transient lazy val unkUtf8: UTF8String = UTF8String.fromString(unk)
}

/**
 * `wordpiece_encode(text)`: BERT WordPiece greedy longest-match-first
 * segmentation of every whitespace word — at each position take the
 * LONGEST vocabulary piece (word-initial plain, continuation `##`-prefixed)
 * matching the remaining characters; a position with no match turns the
 * ENTIRE word into the single `unk` token (partial pieces are discarded —
 * the reference WordPiece semantics). Deterministic given the vocabulary,
 * hence oracle-checkable: `q_text_wordpiece` replays the identical greedy
 * walk as a DuckDB recursive CTE over a shared fixed vocabulary.
 */
case class WordPieceEncode(child: Expression, pieces: Seq[String], unk: String)
    extends UnaryExpression {

  @transient private lazy val holder = new WpVocabHolder(pieces.toArray, unk)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_encode"

  override def nullSafeEval(input: Any): Any =
    WordPieceEncode.encode(input.asInstanceOf[UTF8String], holder)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpVocab", holder,
      classOf[WpVocabHolder].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordPieceEncode.encode($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceEncode =
    copy(child = newChild)
}

object WordPieceEncode {

  /** One greedy pass over the document; called from interpreted eval and
    * codegen alike. */
  def encode(text: UTF8String, v: WpVocabHolder): ArrayData = {
    val words = SubwordEncode.Ws.split(
      text.toString.toLowerCase(java.util.Locale.ROOT))
    val out = new java.util.ArrayList[Any]()
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        val mark = out.size()
        var pos = 0
        var bad = false
        while (pos < w.length && !bad) {
          var len = math.min(v.maxLen, w.length - pos)
          var hit = 0
          while (len >= 1 && hit == 0) {
            val raw = w.substring(pos, pos + len)
            val cand = if (pos == 0) raw else "##" + raw
            if (v.set.contains(cand)) hit = len else len -= 1
          }
          if (hit == 0) bad = true
          else {
            val raw = w.substring(pos, pos + hit)
            out.add(UTF8String.fromString(if (pos == 0) raw else "##" + raw))
            pos += hit
          }
        }
        if (bad) { // whole word becomes UNK; drop partial pieces
          while (out.size() > mark) out.remove(out.size() - 1)
          out.add(v.unkUtf8)
        }
      }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column API. */
  def wordpieceEncode(text: Column, pieces: Seq[String], unk: String): Column =
    CatalystBridge.column(
      WordPieceEncode(CatalystBridge.expression(text), pieces, unk))
}

/**
 * Serialized Unigram-LM vocabulary: pieces with INTEGER scores in
 * micro-nats (`round(1e6 * ln p)`). Integer scores make the Viterbi
 * comparisons exact and engine-independent — summing doubles in a
 * different order could flip ties between Spark and the DuckDB oracle;
 * summing longs cannot.
 */
final class UlmVocabHolder(val pieces: Array[String], val scores: Array[Long],
    val unk: String) extends Serializable {
  require(pieces.length == scores.length, "pieces/scores length mismatch")
  @transient lazy val map: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), scores(i)); i += 1 }
    m
  }
  @transient lazy val maxLen: Int =
    if (pieces.isEmpty) 1 else pieces.iterator.map(_.length).max.max(1)
  @transient lazy val unkUtf8: UTF8String = UTF8String.fromString(unk)
}

/**
 * `unigram_encode(text)`: SentencePiece-style Unigram-LM segmentation —
 * per whitespace word, the Viterbi split maximizing the sum of piece
 * scores (micro-nat log-probabilities, integer-exact). Tie rule: when
 * two splits score equally, the LAST piece is the longer one (the DP
 * keeps the smallest back-pointer), applied recursively — mirrored
 * bit-for-bit by the oracle's `list_min`-over-argmax recursive CTE. A
 * word not coverable by the vocabulary becomes the single `unk` token.
 */
case class UnigramEncode(child: Expression, pieces: Seq[String],
    scores: Seq[Long], unk: String) extends UnaryExpression {

  @transient private lazy val holder =
    new UlmVocabHolder(pieces.toArray, scores.toArray, unk)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_encode"

  override def nullSafeEval(input: Any): Any =
    UnigramEncode.encode(input.asInstanceOf[UTF8String], holder)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ulmVocab", holder,
      classOf[UlmVocabHolder].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramEncode.encode($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
    copy(child = newChild)
}

object UnigramEncode {

  private val Unreachable = java.lang.Long.MIN_VALUE

  /** Viterbi DP per word, one pass per document. */
  def encode(text: UTF8String, v: UlmVocabHolder): ArrayData = {
    val words = SubwordEncode.Ws.split(
      text.toString.toLowerCase(java.util.Locale.ROOT))
    val out = new java.util.ArrayList[Any]()
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        val n = w.length
        val dp = new Array[Long](n + 1)
        val bp = new Array[Int](n + 1)
        java.util.Arrays.fill(dp, Unreachable)
        dp(0) = 0L
        var i = 1
        while (i <= n) {
          var j = math.max(0, i - v.maxLen)
          while (j < i) {
            if (dp(j) != Unreachable) {
              val sc = v.map.get(w.substring(j, i))
              // strict > with j ascending keeps the SMALLEST winning j —
              // the longest-last-piece tie rule the oracle replays
              if (sc != null && dp(j) + sc.longValue() > dp(i)) {
                dp(i) = dp(j) + sc.longValue(); bp(i) = j
              }
            }
            j += 1
          }
          i += 1
        }
        if (dp(n) == Unreachable) out.add(v.unkUtf8)
        else {
          // walk back, then reverse in place
          val mark = out.size()
          var p = n
          while (p > 0) {
            out.add(UTF8String.fromString(w.substring(bp(p), p)))
            p = bp(p)
          }
          var lo = mark
          var hi = out.size() - 1
          while (lo < hi) {
            val t = out.get(lo); out.set(lo, out.get(hi)); out.set(hi, t)
            lo += 1; hi -= 1
          }
        }
      }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column API. */
  def unigramEncode(text: Column, pieces: Seq[String], scores: Seq[Long],
      unk: String): Column =
    CatalystBridge.column(
      UnigramEncode(CatalystBridge.expression(text), pieces, scores, unk))
}

package graft.functions

import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `repetition_stats(text)`: every integer count behind the Gopher
 * repetition-removal rules (Rae et al. 2021, appendix A1.2) in ONE
 * imperative pass per document, emitted as a struct of longs; the
 * fractions and the keep verdict are plain column arithmetic on top
 * ([[graft.ops.Text.gopherRepetition]]).
 *
 * Definitions (replayed bit-identically by the DuckDB oracle):
 *  - lines  = text split on `\n`, each trimmed of ` \t\n\r\f`,
 *    empties dropped; paragraphs = the same over a `\n{2,}` split.
 *    `dup_*` counts occurrences BEYOND THE FIRST of each repeated
 *    element; `dup_*_chars` sums their character lengths (the
 *    "duplicate line/paragraph fraction" and "... character fraction"
 *    signals, datatrove-compatible).
 *  - words = lowercased text split on `\s+`, empties dropped; an n-gram
 *    is n consecutive words joined by one space, its length counted in
 *    Unicode code points (spaces included).
 *  - `top{2,3,4}_chars` = count * length of the MOST FREQUENT n-gram
 *    (ties: lexicographically smallest gram), 0 when the top count < 2
 *    or no grams exist — the "top n-gram character fraction" numerator.
 *  - `dup{5..10}_chars` = sum over duplicated n-grams (count >= 2) of
 *    count * length — ALL occurrences, the NeMo-Curator convention
 *    rather than the paper's sequential skip-ahead scan, which is not
 *    replayable by a declarative engine (documented deviation);
 *    `gram{5..10}_chars` = the same sum over EVERY n-gram — the
 *    NeMo denominator that keeps the duplicated-n-gram fraction
 *    in [0, 1] despite overlapping grams double-counting characters.
 *
 * Why a custom Catalyst expression: the HOF formulation needs a per-doc
 * histogram over 9 gram sizes — O(distinct * total) interpreted
 * `filter` lambdas per document; here each histogram is one hash-map
 * pass, O(total grams), inside whole-stage codegen via a static-helper
 * call. Per-doc memory is O(total gram chars) — bounded by the word
 * count gate every curation pipeline runs first (Gopher caps docs at
 * 100k words).
 *
 * Gram tie-breaks compare Java strings (UTF-16 code-unit order) while
 * DuckDB's `list_min` compares UTF-8 bytes — identical for ASCII and
 * for any text where ties only occur between equal-script grams; the
 * orders diverge only across surrogate-pair boundaries (U+10000+ vs
 * U+E000..U+FFFF), which no quality-gated corpus hits in practice.
 */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = RepetitionStats.schema

  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {

  val schema: StructType = StructType(Seq(
    "n_lines", "dup_lines", "dup_line_chars",
    "n_paras", "dup_paras", "dup_para_chars",
    "top2_chars", "top3_chars", "top4_chars",
    "dup5_chars", "dup6_chars", "dup7_chars",
    "dup8_chars", "dup9_chars", "dup10_chars",
    "gram5_chars", "gram6_chars", "gram7_chars",
    "gram8_chars", "gram9_chars", "gram10_chars")
    .map(StructField(_, LongType, nullable = false)))

  /** Column-API entry point. */
  def stats(text: Column): Column =
    CatalystBridge.column(RepetitionStats(CatalystBridge.expression(text)))

  private val TrimChars = " \t\n\r\f"

  private def trimWs(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && TrimChars.indexOf(s.charAt(a)) >= 0) a += 1
    while (b > a && TrimChars.indexOf(s.charAt(b - 1)) >= 0) b -= 1
    s.substring(a, b)
  }

  private def cp(s: String): Long = s.codePointCount(0, s.length).toLong

  /** (count, dupBeyondFirst, dupBeyondFirstChars) over a multiset. */
  private def dupStats(elems: Array[String]): (Long, Long, Long) = {
    val cnt = new java.util.HashMap[String, Int](elems.length * 2)
    var i = 0
    while (i < elems.length) { cnt.merge(elems(i), 1, Integer.sum); i += 1 }
    var dup = 0L
    var chars = 0L
    cnt.forEach { (e, c) =>
      if (c > 1) { dup += c - 1; chars += (c - 1).toLong * cp(e) }
    }
    (elems.length.toLong, dup, chars)
  }

  private def splitNonEmptyTrimmed(s: String, re: String): Array[String] =
    s.split(re).iterator.map(trimWs).filter(_.nonEmpty).toArray

  /** One pass per doc; called from both interpreted eval and codegen. */
  def compute(t: UTF8String): InternalRow = {
    val text = t.toString
    val (nLines, dupLines, dupLineChars) =
      dupStats(splitNonEmptyTrimmed(text, "\n"))
    val (nParas, dupParas, dupParaChars) =
      dupStats(splitNonEmptyTrimmed(text, "\n{2,}"))
    val words = text.toLowerCase(Locale.ROOT).split("\\s+").filter(_.nonEmpty)

    def gramCounts(n: Int): java.util.HashMap[String, Int] = {
      val m = new java.util.HashMap[String, Int]()
      val g = words.length - n + 1
      var i = 0
      val sb = new java.lang.StringBuilder
      while (i < g) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        m.merge(sb.toString, 1, Integer.sum)
        i += 1
      }
      m
    }

    def topChars(n: Int): Long = {
      val m = gramCounts(n)
      var bestG: String = null
      var bestC = 0
      m.forEach { (g, c) =>
        if (c > bestC || (c == bestC && bestG != null && g.compareTo(bestG) < 0)) {
          bestG = g; bestC = c
        }
      }
      if (bestC >= 2) bestC.toLong * cp(bestG) else 0L
    }

    // (duplicated-gram chars, all-gram chars) — both over ALL occurrences
    def dupAndTotalChars(n: Int): (Long, Long) = {
      var dup = 0L
      var tot = 0L
      gramCounts(n).forEach { (g, c) =>
        val chars = c.toLong * cp(g)
        tot += chars
        if (c > 1) dup += chars
      }
      (dup, tot)
    }

    val dt = (5 to 10).map(dupAndTotalChars)
    new GenericInternalRow((Array[Any](
      nLines, dupLines, dupLineChars,
      nParas, dupParas, dupParaChars,
      topChars(2), topChars(3), topChars(4)) ++
      dt.map(_._1) ++ dt.map(_._2)).toArray[Any])
  }
}

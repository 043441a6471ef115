package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `deflate_ratio(text)`: compressed size / raw size of the document's
 * UTF-8 bytes under DEFLATE (zlib level 6, raw mode) — the classic
 * compressibility quality signal (RedPajama-v2 ships it per document;
 * highly repetitive/templated text compresses far below prose, random
 * or binary-ish text barely compresses). Complements the exact
 * repetition counters ([[RepetitionStats]]): DEFLATE's LZ77 window
 * catches fuzzy and long-range repetition the n-gram counters miss.
 *
 * One imperative pass per document inside whole-stage codegen (a
 * Deflater instance per call — allocation is dwarfed by the compression
 * work itself). zlib output is deterministic for a fixed level/strategy,
 * so the signal is stable across runs and partitionings — but NOT
 * SQL-replayable (DuckDB has no deflate), so the catalog query is
 * rows-only and the spec pins hand-constructed orderings instead.
 *
 * Empty documents return 1.0 (incompressible by convention — gates read
 * LOW ratios as the repetition signal, and an empty doc must not trip
 * them).
 */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  override def nullSafeEval(input: Any): Any =
    DeflateRatio.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateRatio.ratio($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

object DeflateRatio {

  def ratio(text: UTF8String): Double = {
    val bytes = text.getBytes
    if (bytes.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(6, true) // raw deflate, no zlib header
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var compressed = 0L
    while (!d.finished()) compressed += d.deflate(buf)
    d.end()
    compressed.toDouble / bytes.length
  }

  /** Column API. */
  def deflateRatio(text: Column): Column =
    CatalystBridge.column(DeflateRatio(CatalystBridge.expression(text)))
}

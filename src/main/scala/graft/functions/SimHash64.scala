package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types._

/**
 * `simhash64(tokens)`: the 64-bit SimHash signature packed as 4 × 16-bit
 * words ([[graft.ops.Vectors.binaryCode]] word layout) computed in ONE
 * imperative pass over the row's token array — per token the first 8 md5
 * digest bytes vote ±1 on 64 bit positions (MSB-first, identical to the
 * per-nibble arithmetic of the SQL replay), positive sums set the bit,
 * word w carries vote bits w·16+j at bit j.
 *
 * Why a custom Catalyst expression: the aggregate formulation exploded
 * every token into a row and shuffled 64 partial vote sums per document
 * — corpus-tokens × 64 codegen'd branches plus a 64-column exchange.
 * Here the whole signature is a shuffle-free narrow projection; the
 * banding join downstream is unchanged. Bit-identical to the exploded
 * aggregate: same md5 nibbles, same ±1 votes (including empty-string
 * tokens — `split` never yields an empty array, so per-doc row counts
 * match too).
 */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash64"

  override def nullSafeEval(v: Any): Any =
    SimHash64.hash(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** One-pass signature; called from both interpreted eval and codegen. */
  def hash(toks: ArrayData): ArrayData = {
    val votes = new Array[Int](64)
    val md = MessageDigest.getInstance("MD5")
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      md.reset()
      md.update(toks.getUTF8String(i).getBytes)
      val d = md.digest()
      var g = 0
      while (g < 64) {
        val bit = (d(g >> 3) >> (7 - (g & 7))) & 1
        votes(g) += (if (bit == 1) 1 else -1)
        g += 1
      }
      i += 1
    }
    val words = new Array[Any](4)
    var w = 0
    while (w < 4) {
      var acc = 0L
      var j = 15
      while (j >= 0) {
        acc = acc * 2 + (if (votes(w * 16 + j) > 0) 1L else 0L)
        j -= 1
      }
      words(w) = acc
      w += 1
    }
    new GenericArrayData(words)
  }

  /** Column API: the packed 4-word signature as a codegen'd expression. */
  def simhash64(tokens: Column): Column =
    CatalystBridge.column(SimHash64(CatalystBridge.expression(tokens)))
}

/** `simhash16(tokens)`: the 16-bit scalar signature — the coarse oracle
  * fixture of the family ([[SimHash64]] is the production width). Same
  * one-pass ±1 voting over the first 2 md5 digest bytes, MSB-first;
  * bit-identical to the exploded 16-vote aggregate it replaces. */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash16"

  override def nullSafeEval(v: Any): Any =
    SimHash16.hash(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash16.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

object SimHash16 {

  def hash(toks: ArrayData): Long = {
    val votes = new Array[Int](16)
    val md = MessageDigest.getInstance("MD5")
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      md.reset()
      md.update(toks.getUTF8String(i).getBytes)
      val d = md.digest()
      var g = 0
      while (g < 16) {
        val bit = (d(g >> 3) >> (7 - (g & 7))) & 1
        votes(g) += (if (bit == 1) 1 else -1)
        g += 1
      }
      i += 1
    }
    var sig = 0L
    var g = 0
    while (g < 16) {
      sig = sig * 2 + (if (votes(g) > 0) 1L else 0L)
      g += 1
    }
    sig
  }

  def simhash16(tokens: Column): Column =
    CatalystBridge.column(SimHash16(CatalystBridge.expression(tokens)))
}

package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `nfc_normalize(str)`: Unicode canonical composition (NFC) as a
 * codegen'd Catalyst expression — the first step of corpus text
 * normalization (the same string can arrive as `e` + U+0301 combining
 * acute from one crawler and precomposed U+00E9 from another; every
 * downstream hash/dedup/tokenize operator sees them as different
 * documents unless the corpus is canonicalized first).
 *
 * Spark has no NFC built-in, so this wraps `java.text.Normalizer`
 * (ICU-equivalent for canonical forms — NFC is pinned by the Unicode
 * standard, so utf8proc-based engines like DuckDB's `nfc_normalize`
 * produce byte-identical output, which is what makes the operator
 * oracle-checkable). The fast path: `Normalizer.isNormalized` is a
 * cheap scan that is true for virtually all real-world text (ASCII is
 * trivially NFC), so the common case allocates nothing and returns the
 * input UTF8String as-is.
 *
 * Stays inside whole-stage codegen via [[doGenCode]] — no UDF
 * serialization boundary, scales as a narrow projection pass.
 */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${dt.catalogString}")
  }

  override def dataType: DataType = child.dataType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** NFC with an allocation-free fast path for already-normalized text;
    * called from interpreted eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column API: NFC normalization as a codegen'd expression. */
  def nfcNormalize(c: Column): Column =
    CatalystBridge.column(NfcNormalize(CatalystBridge.expression(c)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * `vec_cosine(a, b)`: double-precision cosine similarity between two
 * float/double array columns, computed in ONE imperative pass (dot, |a|²,
 * |b|² accumulated together) inside whole-stage codegen.
 *
 * Why a custom Catalyst expression: the higher-order-function formulation
 * (`aggregate(zip_with(a, b, *), ...)` three times per pair) interprets
 * its lambda per element — the same per-element interpretation overhead
 * that made HOF shingling ~100× slower than [[WordShingles]]. ANN scoring
 * evaluates cosine once per (query, candidate) pair, so at corpus scale
 * this sits squarely on the hot path of `bruteForceTopK`/`lshTopK`/
 * `cosineDupPairs`. Accumulation order is the same left-to-right
 * sequential fold as the HOF version (and DuckDB's `list_inner_product`),
 * keeping results bit-identical for the oracle hash compare.
 *
 * Null/length semantics: null if either side is null; arrays are read up
 * to the SHORTER length (the fixtures are fixed-dim); zero-norm inputs
 * yield NaN exactly like the divide in the HOF formulation.
 */
case class VecCosine(left: Expression, right: Expression) extends BinaryExpression {

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    VecCosine.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecCosine.cosine($a, $b, ${isFloat(left)}, ${isFloat(right)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)
}

object VecCosine {

  /** One-pass cosine; called from both interpreted eval and codegen. */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Column API: cosine(a, b) as a codegen'd expression. */
  def vecCosine(a: Column, b: Column): Column =
    CatalystBridge.column(
      VecCosine(CatalystBridge.expression(a), CatalystBridge.expression(b)))
}

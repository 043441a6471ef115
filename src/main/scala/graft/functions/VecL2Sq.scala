package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * `vec_l2sq(a, b)`: squared L2 distance between two float/double array
 * columns in one imperative pass inside whole-stage codegen — the
 * [[VecCosine]] treatment applied to the PQ hot path. `Pq.encode`
 * evaluates a subvector-vs-centroid distance m×k times PER ROW (2048 at
 * the production m=8, k=256), where the higher-order-function
 * formulation pays per-element lambda interpretation every time.
 *
 * Accumulation is the same left-to-right `(a_i - b_i)²` running sum as
 * the HOF fold and the DuckDB oracle replay, so swapping it under
 * `Pq.subDist2` changes no result bit (spec-pinned; q_ann_pq_adc's hash
 * is unchanged). Arrays are read up to the shorter length; null if
 * either side is null.
 */
case class VecL2Sq(left: Expression, right: Expression) extends BinaryExpression {

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
  override def prettyName: String = "vec_l2sq"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    VecL2Sq.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecL2Sq.l2sq($a, $b, ${isFloat(left)}, ${isFloat(right)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2Sq =
    copy(left = newLeft, right = newRight)
}

object VecL2Sq {

  /** One-pass squared L2; called from interpreted eval and codegen. */
  def l2sq(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }

  /** Column API: squared L2 as a codegen'd expression. */
  def vecL2Sq(a: Column, b: Column): Column =
    CatalystBridge.column(
      VecL2Sq(CatalystBridge.expression(a), CatalystBridge.expression(b)))
}

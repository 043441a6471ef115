package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `gear_boundaries(text, window, maskBits)`: content-defined chunk
 * boundary positions by a GEAR rolling hash (the FastCDC hash family,
 * Xia et al. 2016) — ONE imperative pass, O(1) work per character:
 * `h = (h << 1) + GEAR[c]`, boundary where `(h & mask) == 0`. The shift
 * ages old characters out of the hash (64 chars of influence), so cut
 * points derive from local content and re-synchronize after edits —
 * the same property as [[graft.ops.Dedup.contentChunks]]' windowed-hash
 * rule at a fraction of the cost.
 *
 * Why a custom Catalyst expression: the windowed formulation evaluates a
 * full md5/xxhash64 of `window` characters AT EVERY POSITION — O(len ·
 * window) digest work per document. This is the production path for the
 * 100 TB ingest scan; the windowed variants remain the SQL-replayable
 * oracle fixtures (a gear boundary rule is not expressible to an
 * external engine without shipping the 256-entry table).
 *
 * Contract mirrors the windowed rule: candidate positions are
 * `window .. len-1` (1-based; never cuts the first `window` chars or at
 * the final char — no empty tail), emitted ascending. maskBits = 6
 * gives expected 64-char chunks. Positions are CHARACTER offsets
 * (matching `substr`), so the operator family composes identically.
 */
case class GearBoundaries(child: Expression, window: Int, maskBits: Int)
    extends UnaryExpression {
  require(window >= 2, "window must be >= 2")
  require(maskBits >= 1 && maskBits <= 30, "maskBits must be in 1..30")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "gear_boundaries"

  override def nullSafeEval(v: Any): Any =
    GearBoundaries.boundaries(v.asInstanceOf[UTF8String], window, maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GearBoundaries.boundaries($c, $window, $maskBits)")

  override protected def withNewChildInternal(newChild: Expression): GearBoundaries =
    copy(child = newChild)
}

object GearBoundaries {

  /** 256 fixed random longs (splitmix64 of the index) — the gear table.
    * Deterministic across JVMs and releases: chunk identities persist. */
  private val Gear: Array[Long] = Array.tabulate(256) { i =>
    var z = (i + 1) * 0x9E3779B97F4A7C15L
    z ^= (z >>> 30); z *= 0xBF58476D1CE4E5B9L
    z ^= (z >>> 27); z *= 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** One rolling pass; called from both interpreted eval and codegen. */
  def boundaries(text: UTF8String, window: Int, maskBits: Int): ArrayData = {
    val s = text.toString
    val n = s.length
    if (n - 1 < window) return new GenericArrayData(Array.empty[Any])
    val mask = (1L << maskBits) - 1L
    val out = new java.util.ArrayList[Any]()
    var h = 0L
    var i = 0
    while (i < n - 1) { // a cut at the final char would be a no-op tail
      h = (h << 1) + Gear(s.charAt(i) & 0xff)
      // i is 0-based; position i+1 (1-based) ends the candidate chunk
      if (i + 1 >= window && (h & mask) == 0L) out.add(i + 1)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column API: ascending 1-based boundary positions. */
  def gearBoundaries(text: Column, window: Int, maskBits: Int): Column =
    CatalystBridge.column(
      GearBoundaries(CatalystBridge.expression(text), window, maskBits))
}

package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types._

/**
 * `winnow_select(tokens, k, w)`: the complete winnowing fingerprint
 * selection (Schleimer et al. 2003) in ONE imperative pass — k-gram md5
 * hashing, rightmost-min sliding-window selection via a monotonic deque
 * (O(grams), not O(grams·w)), and first-occurrence distinct — emitted as
 * `array<struct<pos:long, fp:long>>` (pos 1-based over grams).
 *
 * Why a custom Catalyst expression: the HOF formulation evaluated
 * O(grams·(k+w)) interpreted lambdas per document (a `slice`+`array_min`+
 * `reverse`+`array_position` per window) — the same per-element
 * interpretation overhead that motivated [[WordShingles]]. This is the
 * identical computation:
 *  - fp = first 8 hex nibbles of md5(gram joined by single spaces),
 *    i.e. the digest's first 4 bytes big-endian unsigned — bit-identical
 *    to `conv(substring(md5(array_join(...)), 1, 8), 16, 10)`;
 *  - per window the RIGHTMOST occurrence of the minimum is selected
 *    (the deque pops `>=` on push, so a later equal value replaces an
 *    earlier one — exactly the `array_position(reverse(win), min)` rule);
 *  - windows shorter than w shrink to the gram count (every hashable doc
 *    emits at least one fingerprint); fewer than k tokens emit an empty
 *    array (callers explode, dropping the row).
 *
 * Input tokens must be non-null (the callers pre-filter empty/null
 * tokens). Stays inside whole-stage codegen via a static-helper call.
 */
case class WinnowSelect(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, "k and w must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("fp", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "winnow_select"

  override def nullSafeEval(v: Any): Any =
    WinnowSelect.select(v.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowSelect.select($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
}

object WinnowSelect {

  /** One-pass selection; called from both interpreted eval and codegen. */
  def select(toks: ArrayData, k: Int, w: Int): ArrayData = {
    val n = toks.numElements()
    val g = n - (k - 1)
    if (g < 1) return new GenericArrayData(Array.empty[Any])
    val we = math.min(w, g)
    // gram hashes: first 4 md5 bytes of the space-joined k-gram, unsigned
    val md = MessageDigest.getInstance("MD5")
    val hs = new Array[Long](g)
    var i = 0
    while (i < g) {
      md.reset()
      var j = 0
      while (j < k) {
        if (j > 0) md.update(' '.toByte)
        md.update(toks.getUTF8String(i + j).getBytes)
        j += 1
      }
      val d = md.digest()
      hs(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    // monotonic deque of gram indices; >= pop on push keeps the RIGHTMOST
    // occurrence of the window minimum at the front
    val idx = new Array[Int](g)
    var head = 0
    var tail = 0
    // fp < 2^32 and pos <= g, so (pos << 32 | fp) is a unique pair key;
    // LinkedHashSet preserves the first-occurrence emission order
    val sel = new java.util.LinkedHashSet[java.lang.Long]()
    var q = 0
    while (q < we) { // initial window
      while (tail > head && hs(idx(tail - 1)) >= hs(q)) tail -= 1
      idx(tail) = q; tail += 1
      q += 1
    }
    var p = 0 // 0-based window start
    while (p <= g - we) {
      if (p > 0) {
        val nq = p + we - 1
        while (tail > head && hs(idx(tail - 1)) >= hs(nq)) tail -= 1
        idx(tail) = nq; tail += 1
        if (idx(head) < p) head += 1
      }
      val m = idx(head)
      sel.add(java.lang.Long.valueOf(((m + 1).toLong << 32) | hs(m)))
      p += 1
    }
    val res = new Array[Any](sel.size())
    val it = sel.iterator()
    var r = 0
    while (it.hasNext) {
      val key = it.next().longValue()
      res(r) = InternalRow(key >>> 32, key & 0xffffffffL)
      r += 1
    }
    new GenericArrayData(res)
  }

  /** Column API: the selected (pos, fp) pairs as a codegen'd expression. */
  def winnowSelect(tokens: Column, k: Int, w: Int): Column =
    CatalystBridge.column(
      WinnowSelect(CatalystBridge.expression(tokens), k, w))
}

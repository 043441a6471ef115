package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `minhash_xx(text, n, k)`: the k-component MinHash signature of `text`'s
 * distinct word n-gram shingle set, computed in ONE imperative pass per
 * document — component i is `min over shingles s of xxhash64(i, s)`,
 * bit-identical to the aggregate formulation
 * `min(xxhash64(lit(i), shingle))` over the exploded shingle table
 * (seed chain: `XXH64.hashInt(i, 42)` then `hashUTF8String(s, ·)`,
 * exactly Spark's `XxHash64` two-child fold). Empty shingle set (fewer
 * than n tokens) returns an EMPTY array — the row the exploded aggregate
 * would simply not emit; callers filter on `size(...) = k`.
 *
 * Why a custom Catalyst expression: the aggregate formulation explodes
 * corpus-shingles into rows and runs a k-wide min hash-aggregate — the
 * k hash calls per shingle happen inside the aggregate update path and
 * the per-doc signature costs a full exchange. Here the signature is a
 * shuffle-free narrow projection (the doc row count never changes), the
 * k·|shingles| hash calls run in a tight register loop, and the shingle
 * strings are never materialized into rows. Downstream banding is
 * unchanged.
 */
case class MinHashXx(child: Expression, n: Int, k: Int)
    extends UnaryExpression {

  require(n >= 1 && k >= 1, "shingle size and signature width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_xx"

  override def nullSafeEval(input: Any): Any =
    MinHash.xx(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash.xx($c, $n, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashXx =
    copy(child = newChild)
}

/**
 * `minhash_md5(text, n, k)`: the engine-portable md5 MinHash family as one
 * narrow pass — component i is `min(md5(i || ':' || shingle))` over the
 * distinct word n-gram shingles, the lexicographic minimum over lowercase
 * hex digests, bit-identical to the exploded-aggregate formulation and to
 * the DuckDB oracle's `MIN(md5(CAST(hi AS VARCHAR) || ':' || shingle))`.
 * Unsigned byte-wise digest comparison IS hex-lexicographic order (each
 * byte maps to two hex chars whose ASCII order follows the nibble order),
 * so the digests are compared raw and hex-encoded once at the end.
 */
case class MinHashMd5(child: Expression, n: Int, k: Int)
    extends UnaryExpression {

  require(n >= 1 && k >= 1, "shingle size and signature width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_md5"

  override def nullSafeEval(input: Any): Any =
    MinHash.md5min(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash.md5min($c, $n, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashMd5 =
    copy(child = newChild)
}

object MinHash {

  private val Empty = new GenericArrayData(Array.empty[Any])

  // per-k caches of the loop-invariant constants (k is a plan literal, so
  // the maps hold one entry per distinct signature width in the session)
  private val xxSeeds =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]
  private val md5Prefixes =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]

  private def seedsFor(k: Int): Array[Long] =
    xxSeeds.computeIfAbsent(k, k => {
      // xxhash64(lit(i), s) folds children left-to-right from seed 42
      val a = new Array[Long](k)
      var i = 0
      while (i < k) { a(i) = XXH64.hashInt(i + 1, 42L); i += 1 }
      a
    })

  private def prefixesFor(k: Int): Array[Array[Byte]] =
    md5Prefixes.computeIfAbsent(k, k => {
      val a = new Array[Array[Byte]](k)
      var i = 0
      while (i < k) {
        a(i) = s"${i + 1}:".getBytes(java.nio.charset.StandardCharsets.UTF_8)
        i += 1
      }
      a
    })

  /** One-pass xxhash64 signature; called from interpreted eval and codegen. */
  def xx(text: UTF8String, n: Int, k: Int): ArrayData = {
    val sh = WordShingles.shingles(text, n)
    val m = sh.numElements()
    if (m == 0) return Empty
    val seeds = seedsFor(k)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var s = 0
    while (s < m) {
      val u = sh.getUTF8String(s)
      var i = 0
      while (i < k) {
        val h = XXH64.hashUTF8String(u, seeds(i))
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      s += 1
    }
    val out = new Array[Any](k)
    var i = 0
    while (i < k) { out(i) = mins(i); i += 1 }
    new GenericArrayData(out)
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** One-pass md5 signature; called from interpreted eval and codegen. */
  def md5min(text: UTF8String, n: Int, k: Int): ArrayData = {
    val sh = WordShingles.shingles(text, n)
    val m = sh.numElements()
    if (m == 0) return Empty
    val prefixes = prefixesFor(k)
    val md = MessageDigest.getInstance("MD5")
    val mins = new Array[Array[Byte]](k)
    var s = 0
    while (s < m) {
      val bytes = sh.getUTF8String(s).getBytes
      var i = 0
      while (i < k) {
        md.reset()
        md.update(prefixes(i))
        md.update(bytes)
        val d = md.digest()
        if (mins(i) == null ||
            java.util.Arrays.compareUnsigned(d, mins(i)) < 0) mins(i) = d
        i += 1
      }
      s += 1
    }
    val out = new Array[Any](k)
    var i = 0
    while (i < k) {
      val d = mins(i)
      val hex = new Array[Char](32)
      var j = 0
      while (j < 16) {
        hex(j * 2) = HexDigits((d(j) >> 4) & 0xf)
        hex(j * 2 + 1) = HexDigits(d(j) & 0xf)
        j += 1
      }
      out(i) = UTF8String.fromString(new String(hex))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: k-component xxhash64 MinHash signature (production). */
  def minhashXx(text: Column, n: Int, k: Int): Column =
    CatalystBridge.column(MinHashXx(CatalystBridge.expression(text), n, k))

  /** Column API: k-component md5 MinHash signature (oracle-portable). */
  def minhashMd5(text: Column, n: Int, k: Int): Column =
    CatalystBridge.column(MinHashMd5(CatalystBridge.expression(text), n, k))
}

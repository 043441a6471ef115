package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.functions.{DeflateRatio, GearBoundaries, MinHashMd5, MinHashXx,
  NfcNormalize, RepetitionStats, SimHash16, SimHash64, UnigramEncode,
  VecCosine, VecL2Sq, WinnowSelect, WordPieceEncode, WordShingles,
  WordShinglesAll}

/**
 * SQL surface for the library's custom Catalyst expressions — the
 * [[org.apache.spark.sql.SparkSessionExtensions]] registration the
 * Spark-native packaging story calls for, so `spark.sql("...")` users get
 * the same codegen'd hot-path functions as the Column API:
 *
 *   - `vec_cosine(a, b)`       — [[graft.functions.VecCosine]]
 *   - `vec_l2sq(a, b)`         — [[graft.functions.VecL2Sq]]
 *   - `nfc_normalize(s)`       — [[graft.functions.NfcNormalize]]
 *   - `word_shingles(s, n)`    — [[graft.functions.WordShingles]] (distinct)
 *   - `word_shingles_all(s, n)`— [[graft.functions.WordShinglesAll]] (positional)
 *   - `minhash_xx(s, n, k)`    — [[graft.functions.MinHashXx]] (production)
 *   - `minhash_md5(s, n, k)`   — [[graft.functions.MinHashMd5]] (oracle family)
 *   - `simhash64(toks)`        — [[graft.functions.SimHash64]]
 *   - `simhash16(toks)`        — [[graft.functions.SimHash16]]
 *   - `winnow_select(hs, k, w)`— [[graft.functions.WinnowSelect]]
 *   - `repetition_stats(s)`    — [[graft.functions.RepetitionStats]]
 *   - `wordpiece_encode(s, pieces, unk)` — [[graft.functions.WordPieceEncode]]
 *   - `unigram_encode(s, pieces, scores, unk)` — [[graft.functions.UnigramEncode]]
 *   - `deflate_ratio(s)`       — [[graft.functions.DeflateRatio]]
 *
 * Two activation paths:
 *   - at session build: `--conf spark.sql.extensions=graft.GraftExtensions`
 *     (the standard extension-jar deployment — no code changes needed);
 *   - on a LIVE session: `GraftExtensions.register(spark)` (notebooks,
 *     tests — extension classes only apply at build time).
 *
 * The `n` of the shingle functions must be a foldable INT literal (it
 * parameterizes codegen); a non-literal raises an analysis-time error,
 * never a runtime one.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def litInt(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: the shingle width must be an INT literal, got $other")
  }

  private def arity(fn: String, n: Int, args: Seq[Expression]): Unit =
    require(args.length == n, s"$fn expects $n arguments, got ${args.length}")

  /** Foldable array argument → its elements (vocabularies parameterize
    * the expression, so they must be literal at analysis time — the same
    * rule as the shingle widths). */
  private def litArray(e: Expression, fn: String): Seq[Any] = {
    require(e.foldable && e.dataType.isInstanceOf[
      org.apache.spark.sql.types.ArrayType],
      s"$fn: the vocabulary must be a literal array, got $e")
    e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        a.toObjectArray(
          e.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
            .elementType).toSeq
      case other => throw new IllegalArgumentException(
        s"$fn: expected a literal array, got $other")
    }
  }

  private def litStrArray(e: Expression, fn: String): Seq[String] =
    litArray(e, fn).map(_.toString)

  private def litLongArray(e: Expression, fn: String): Seq[Long] =
    litArray(e, fn).map {
      case l: Long => l
      case i: Int => i.toLong
      case other => throw new IllegalArgumentException(
        s"$fn: scores must be integer literals, got $other")
    }

  private def litStr(e: Expression, fn: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: expected a string literal, got $other")
  }

  /** (identifier, info, builder) triples in SparkSessionExtensions'
    * FunctionDescription shape. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VecCosine].getName, "vec_cosine"),
      args => { arity("vec_cosine", 2, args); VecCosine(args(0), args(1)) }),
    (FunctionIdentifier("vec_l2sq"),
      new ExpressionInfo(classOf[VecL2Sq].getName, "vec_l2sq"),
      args => { arity("vec_l2sq", 2, args); VecL2Sq(args(0), args(1)) }),
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      args => { arity("nfc_normalize", 1, args); NfcNormalize(args(0)) }),
    (FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      args => { arity("word_shingles", 2, args)
        WordShingles(args(0), litInt(args(1), "word_shingles")) }),
    (FunctionIdentifier("word_shingles_all"),
      new ExpressionInfo(classOf[WordShinglesAll].getName, "word_shingles_all"),
      args => { arity("word_shingles_all", 2, args)
        WordShinglesAll(args(0), litInt(args(1), "word_shingles_all")) }),
    (FunctionIdentifier("minhash_xx"),
      new ExpressionInfo(classOf[MinHashXx].getName, "minhash_xx"),
      args => { arity("minhash_xx", 3, args)
        MinHashXx(args(0), litInt(args(1), "minhash_xx"),
          litInt(args(2), "minhash_xx")) }),
    (FunctionIdentifier("minhash_md5"),
      new ExpressionInfo(classOf[MinHashMd5].getName, "minhash_md5"),
      args => { arity("minhash_md5", 3, args)
        MinHashMd5(args(0), litInt(args(1), "minhash_md5"),
          litInt(args(2), "minhash_md5")) }),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      args => { arity("simhash64", 1, args); SimHash64(args(0)) }),
    (FunctionIdentifier("simhash16"),
      new ExpressionInfo(classOf[SimHash16].getName, "simhash16"),
      args => { arity("simhash16", 1, args); SimHash16(args(0)) }),
    (FunctionIdentifier("winnow_select"),
      new ExpressionInfo(classOf[WinnowSelect].getName, "winnow_select"),
      args => { arity("winnow_select", 3, args)
        WinnowSelect(args(0), litInt(args(1), "winnow_select"),
          litInt(args(2), "winnow_select")) }),
    (FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStats].getName, "repetition_stats"),
      args => { arity("repetition_stats", 1, args)
        RepetitionStats(args(0)) }),
    (FunctionIdentifier("gear_boundaries"),
      new ExpressionInfo(classOf[GearBoundaries].getName, "gear_boundaries"),
      args => { arity("gear_boundaries", 3, args)
        GearBoundaries(args(0), litInt(args(1), "gear_boundaries"),
          litInt(args(2), "gear_boundaries")) }),
    (FunctionIdentifier("wordpiece_encode"),
      new ExpressionInfo(classOf[WordPieceEncode].getName, "wordpiece_encode"),
      args => { arity("wordpiece_encode", 3, args)
        WordPieceEncode(args(0), litStrArray(args(1), "wordpiece_encode"),
          litStr(args(2), "wordpiece_encode")) }),
    (FunctionIdentifier("unigram_encode"),
      new ExpressionInfo(classOf[UnigramEncode].getName, "unigram_encode"),
      args => { arity("unigram_encode", 4, args)
        UnigramEncode(args(0), litStrArray(args(1), "unigram_encode"),
          litLongArray(args(2), "unigram_encode"),
          litStr(args(3), "unigram_encode")) }),
    (FunctionIdentifier("deflate_ratio"),
      new ExpressionInfo(classOf[DeflateRatio].getName, "deflate_ratio"),
      args => { arity("deflate_ratio", 1, args); DeflateRatio(args(0)) }))

  /** Register onto a LIVE session (extension classes only apply at session
    * build). Idempotent: re-registering replaces the same definitions. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
}

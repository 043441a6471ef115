package graft

import org.apache.spark.sql.functions._
import graft.functions.{VecCosine, WinnowSelect}

/** SQL registration of the custom codegen'd expressions: the
  * SparkSessionExtensions surface (`GraftExtensions`) and its live-session
  * twin (`GraftExtensions.register`). */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions equal their Column-API twins") {
    GraftExtensions.register(spark)
    // vec_cosine: SQL vs Column API, bit-identical
    val pairs = Seq(
      (Array(1.0f, 0.0f, 2.0f), Array(0.5f, 1.0f, -1.0f)),
      (Array(3.0f, 4.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    pairs.createOrReplaceTempView("vec_pairs")
    val viaSql = spark.sql("SELECT vec_cosine(a, b) AS c FROM vec_pairs")
      .collect().map(_.getDouble(0)).toSeq
    val viaCol = pairs.select(VecCosine.vecCosine(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0)).toSeq
    assert(viaSql == viaCol)
    assert(viaSql(1) == 1.0)
    // word_shingles: distinct n-grams from SQL
    val sh = spark.sql("SELECT word_shingles('the cat the cat sat', 2) AS s")
      .head().getSeq[String](0).toSet
    assert(sh == Set("the cat", "cat the", "cat sat"))
    // nfc_normalize composes combining marks from SQL
    val n = spark.sql("SELECT nfc_normalize('café') AS s").head().getString(0)
    assert(n == "café")
    // vec_l2sq from SQL
    val d = spark.sql("SELECT vec_l2sq(array(CAST(1.0 AS DOUBLE), 2.0)," +
      " array(CAST(4.0 AS DOUBLE), 6.0)) AS d").head().getDouble(0)
    assert(d == 25.0)
  }

  test("hashing SQL functions equal their Column-API twins") {
    GraftExtensions.register(spark)
    val docs = Seq((1L, "alpha beta gamma delta epsilon")).toDF("id", "text")
    docs.createOrReplaceTempView("mh_docs")
    // minhash_xx / minhash_md5 vs the Column API, bit-identical
    val sqlXx = spark.sql("SELECT minhash_xx(text, 3, 8) AS mh FROM mh_docs")
      .head().getSeq[Long](0)
    val colXx = docs.select(
        graft.functions.MinHash.minhashXx(col("text"), 3, 8).as("mh"))
      .head().getSeq[Long](0)
    assert(sqlXx == colXx && sqlXx.length == 8)
    val sqlMd5 = spark.sql("SELECT minhash_md5(text, 3, 8) AS mh FROM mh_docs")
      .head().getSeq[String](0)
    val colMd5 = docs.select(
        graft.functions.MinHash.minhashMd5(col("text"), 3, 8).as("mh"))
      .head().getSeq[String](0)
    assert(sqlMd5 == colMd5 && sqlMd5.forall(_.matches("[0-9a-f]{32}")))
    // simhash64 / simhash16 over a token array from SQL
    val s64 = spark.sql(
      "SELECT simhash64(split('a b c d', ' ')) AS h").head().getSeq[Long](0)
    val c64 = docs.select(graft.functions.SimHash64.simhash64(
        split(lit("a b c d"), " ")).as("h")).head().getSeq[Long](0)
    assert(s64 == c64 && s64.length == 4)
    val s16 = spark.sql(
      "SELECT simhash16(split('a b c d', ' ')) AS h").head().getLong(0)
    assert(s16 >= 0L && s16 < 65536L)
    // winnow_select emits (pos, fp) structs from SQL, bit-identical to
    // the Column API
    val w = spark.sql(
        "SELECT winnow_select(split('a b c d e f g', ' '), 2, 3) AS p")
      .select(explode(col("p")).as("s")).select("s.pos", "s.fp")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val wc = Seq(("a b c d e f g")).toDF("text")
      .select(WinnowSelect.winnowSelect(split(col("text"), " "), 2, 3).as("p"))
      .select(explode(col("p")).as("s")).select("s.pos", "s.fp")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(w.nonEmpty && w == wc)
    // repetition_stats: struct fields reachable from SQL, same values as
    // the Column API
    val rs = spark.sql(
      "SELECT repetition_stats('aa bb\naa bb\ncc') AS rs")
      .select(col("rs.dup_lines"), col("rs.top2_chars")).head()
    assert(rs.getLong(0) == 1L && rs.getLong(1) == 10L)
  }

  test("tokenizer SQL functions equal their Column-API twins") {
    GraftExtensions.register(spark)
    val wpv = graft.ops.WordPiece.FixedEnglishVocab
    val ulm = graft.ops.Unigram.FixedEnglishPieces
    val docs = Seq((1L, "the fast table scans a value")).toDF("id", "text")
    docs.createOrReplaceTempView("tok_docs")
    def sqlArr(xs: Seq[String]) = xs.map(p => s"'$p'").mkString("array(", ",", ")")
    val wpSql = spark.sql(
        s"SELECT wordpiece_encode(lower(text), ${sqlArr(wpv.pieces)}, '${wpv.unk}') AS t FROM tok_docs")
      .head().getSeq[String](0)
    val wpCol = docs.select(
        graft.ops.WordPiece.tokensCol(col("text"), wpv).as("t"))
      .head().getSeq[String](0)
    assert(wpSql == wpCol && wpSql.contains("##ble"))
    val scoresSql = ulm.scores.map(s => s"${s}L").mkString("array(", ",", ")")
    val ulmSql = spark.sql(
        s"SELECT unigram_encode(lower(text), ${sqlArr(ulm.pieces)}, $scoresSql, '${ulm.unk}') AS t FROM tok_docs")
      .head().getSeq[String](0)
    val ulmCol = docs.select(
        graft.ops.Unigram.tokensCol(col("text"), ulm).as("t"))
      .head().getSeq[String](0)
    assert(ulmSql == ulmCol && ulmSql.contains("ta"))
    // non-literal vocabulary fails at analysis, never at runtime
    intercept[Exception] {
      spark.sql("SELECT wordpiece_encode(text, split(text, ' '), 'U') FROM tok_docs")
        .collect()
    }
    // deflate_ratio from SQL equals the Column API
    val drSql = spark.sql("SELECT deflate_ratio(text) AS r FROM tok_docs")
      .head().getDouble(0)
    val drCol = docs.select(
        graft.functions.DeflateRatio.deflateRatio(col("text")).as("r"))
      .head().getDouble(0)
    assert(drSql == drCol && drSql > 0.0)
  }

  test("shingle width must be a literal; wrong arity fails at analysis") {
    GraftExtensions.register(spark)
    intercept[Exception] {
      spark.sql("SELECT word_shingles('a b c', 1 + length('x')) AS s")
        .collect() // non-foldable width
    }
    intercept[Exception] {
      spark.sql("SELECT vec_cosine(array(1.0)) AS c").collect()
    }
  }

  test("extension class injects the same registry entries at session build time") {
    // the extension object IS the registration list — applying it to a
    // fresh SparkSessionExtensions must accept every entry without error
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext)
    // and the live-session path is idempotent
    GraftExtensions.register(spark)
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT vec_l2sq(array(CAST(0.0 AS DOUBLE)), array(CAST(3.0 AS DOUBLE)))")
      .head().getDouble(0) == 9.0)
  }
}

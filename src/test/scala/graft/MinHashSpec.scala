package graft

import org.apache.spark.sql.functions._
import graft.functions.MinHash
import graft.ops.Dedup

/** Ties the one-pass [[graft.functions.MinHash]] expressions bit-for-bit
  * to the exploded-aggregate formulations they replace on the hot path. */
class MinHashSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"),
    (4L, "The   Quick\tBrown fox Jumps over the lazy dog"),
    (5L, "one two"),                 // < n tokens: empty shingle set
    (6L, "alpha beta gamma"),        // exactly one 3-shingle
    (7L, "")                         // split("") = [""] -> < n tokens
  ).toDF("doc_id", "text")

  private val n = 3
  private val k = 16

  test("minhash_xx equals min(xxhash64(lit(i), shingle)) per component") {
    val agg = Dedup.minhashSigsFast(
      Dedup.shingles(docs, "text", "doc_id", n), "doc_id", k)
      .orderBy("doc_id").collect()
    val narrow = Dedup.minhashSigsNarrow(docs, "text", "doc_id", n, k,
      fastHash = true).orderBy("doc_id").collect()
    assert(narrow.map(_.getLong(0)).toSeq == agg.map(_.getLong(0)).toSeq,
      "row sets differ (empty-shingle docs must be filtered)")
    narrow.zip(agg).foreach { case (nr, ar) =>
      (1 to k).foreach(i => assert(nr.getLong(i) == ar.getLong(i),
        s"doc ${nr.getLong(0)} component $i: ${nr.getLong(i)} != ${ar.getLong(i)}"))
    }
  }

  test("minhash_md5 equals min(md5(i || ':' || shingle)) per component") {
    val agg = Dedup.minhashSigs(
      Dedup.shingles(docs, "text", "doc_id", n), "doc_id", k)
      .orderBy("doc_id").collect()
    val narrow = Dedup.minhashSigsNarrow(docs, "text", "doc_id", n, k,
      fastHash = false).orderBy("doc_id").collect()
    assert(narrow.map(_.getLong(0)).toSeq == agg.map(_.getLong(0)).toSeq)
    narrow.zip(agg).foreach { case (nr, ar) =>
      (1 to k).foreach(i => assert(nr.getString(i) == ar.getString(i),
        s"doc ${nr.getLong(0)} component $i: ${nr.getString(i)} != ${ar.getString(i)}"))
    }
  }

  test("docs with fewer than n tokens yield an empty signature array") {
    val out = docs.select($"doc_id",
        MinHash.minhashXx($"text", n, k).as("mh"))
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).length).toMap
    assert(out(5L) == 0 && out(7L) == 0 && out(6L) == k && out(1L) == k)
  }

  test("null text propagates to a null signature") {
    val withNull = Seq((1L, "a b c d"), (2L, null)).toDF("doc_id", "text")
    val out = withNull.select($"doc_id",
        MinHash.minhashXx($"text", n, k).as("mh"))
      .orderBy("doc_id").collect()
    assert(!out(0).isNullAt(1) && out(1).isNullAt(1))
  }

  test("minhashLshPairs output is unchanged by the narrow rewrite (md5 + fast)") {
    // the LSH pipeline end-to-end on a corpus with known near-dups: the
    // result must equal the round-11 aggregate-formulation output, which
    // the DuckDB oracle (q_dedup_minhash_lsh) still replays
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (11L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (12L, "completely different words appear in this one document here"),
      (13L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    ).toDF("doc_id", "text")
    for (fast <- Seq(false, true)) {
      val pairs = Dedup.minhashLshPairs(corpus, "text", "doc_id",
          n = 3, k = 16, bands = 4, tau = 0.4, fastHash = fast)
        .orderBy("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(pairs.map(p => (p._1, p._2)).contains((10L, 13L)),
        s"exact dup pair missing (fast=$fast): $pairs")
      assert(pairs.exists(p => p._1 == 10L && p._2 == 11L && p._3 >= 0.4),
        s"near-dup pair missing (fast=$fast): $pairs")
      assert(!pairs.exists(p => p._1 == 12L || p._2 == 12L),
        s"unrelated doc paired (fast=$fast): $pairs")
      pairs.filter(p => (p._1, p._2) == ((10L, 13L))).foreach(p =>
        assert(p._3 == 1.0))
    }
  }
}

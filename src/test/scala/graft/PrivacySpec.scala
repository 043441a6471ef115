package graft

import org.apache.spark.sql.functions._
import graft.ops.{Privacy, Text}

/** Invariants for the re-identification-risk operators and the Flesch
  * readability score (hand-computed fixtures; the fixture-scale behavior
  * is oracle-pinned by q_privacy_* / q_text_readability). */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private val people = Seq(
    // (id, region, segment, balance-bucket)
    (1L, "eu", "retail", 1L), (2L, "eu", "retail", 2L),
    (3L, "eu", "retail", 1L), (4L, "eu", "corp", 5L),
    (5L, "us", "retail", 1L), (6L, "us", "retail", 1L),
    (7L, "us", "corp", 3L)
  ).toDF("id", "region", "segment", "bucket")

  test("dpCounts: seeded Laplace noise is reproducible, unbiased-shaped, and hides true counts") {
    val out = Privacy.dpCounts(people, Seq("region", "segment"),
      epsilon = 0.5, seed = 7L).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("n_noisy")).toMap
    assert(out.size == 4) // one release row per class
    // reproducible: the same seed publishes the same numbers
    val again = Privacy.dpCounts(people, Seq("region", "segment"),
      epsilon = 0.5, seed = 7L).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("n_noisy")).toMap
    assert(out == again)
    // a different seed is a different release
    val other = Privacy.dpCounts(people, Seq("region", "segment"),
      epsilon = 0.5, seed = 8L).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("n_noisy")).toMap
    assert(out != other)
    // noise magnitude is Laplace(1/eps)-scale: |noise| < 2/eps ln(65536)
    // hard bound from the 16-bit grain; and at least one class is
    // actually perturbed away from its integer count
    val trueCounts = Map(("eu", "retail") -> 3.0, ("eu", "corp") -> 1.0,
      ("us", "retail") -> 2.0, ("us", "corp") -> 1.0)
    out.foreach { case (k, noisy) =>
      assert(math.abs(noisy - trueCounts(k)) <
        2.0 / 0.5 * math.log(65536.0), s"$k")
    }
    assert(out.exists { case (k, noisy) => noisy != trueCounts(k) })
    // tighter eps (more privacy) means wider noise on the same seed
    val loose = Privacy.dpCounts(people, Seq("region", "segment"),
      epsilon = 5.0, seed = 7L).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("n_noisy")).toMap
    out.foreach { case (k, noisy) =>
      assert(math.abs(noisy - trueCounts(k)) >=
        math.abs(loose(k) - trueCounts(k)) - 1e-5, s"$k scale")
    }
  }

  test("kAnonymityReport: class structure and violation counts, hand-computed") {
    // classes: (eu,retail)=3, (eu,corp)=1, (us,retail)=2, (us,corp)=1
    val r = Privacy.kAnonymityReport(people, Seq("region", "segment"), k = 2).head()
    assert(r.getLong(0) == 7L)  // n_rows
    assert(r.getLong(1) == 4L)  // n_classes
    assert(r.getLong(2) == 1L)  // anonymity_k = min class size
    assert(r.getLong(3) == 2L)  // violating classes (the two singletons)
    assert(r.getLong(4) == 2L)  // violating rows
  }

  test("suppressRare keeps exactly the rows of >= k classes; k=1 keeps all") {
    val kept = Privacy.suppressRare(people, Seq("region", "segment"), k = 2)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L, 3L, 5L, 6L)) // singletons 4 and 7 suppressed
    assert(Privacy.suppressRare(people, Seq("region", "segment"), k = 1)
      .count() == 7L)
    // after suppression at k, the result IS k-anonymous
    val again = Privacy.kAnonymityReport(
      Privacy.suppressRare(people, Seq("region", "segment"), k = 2),
      Seq("region", "segment"), k = 2).head()
    assert(again.getLong(2) >= 2L && again.getLong(3) == 0L)
    // NULL quasi-identifiers form their own class (groupBy semantics):
    // the anti-join must match them null-safely — an under-k null class
    // is DROPPED, an at-k one is KEPT
    val withNulls = Seq((1L, null, "a"), (2L, null, "a"), (3L, null, "b"),
      (4L, "x", "a"), (5L, "x", "a")).toDF("id", "region", "segment")
    val keptN = Privacy.suppressRare(withNulls, Seq("region", "segment"),
      k = 2).select("id").as[Long].collect().sorted.toSeq
    assert(keptN == Seq(1L, 2L, 4L, 5L),
      s"null class of 2 kept, null singleton dropped, got $keptN")
  }

  test("lDiversityReport: distinct sensitive values per class, hand-computed") {
    // distinct buckets: (eu,retail)={1,2}=2, (eu,corp)={5}=1,
    // (us,retail)={1}=1, (us,corp)={3}=1
    val r = Privacy.lDiversityReport(people, Seq("region", "segment"),
      "bucket", l = 2).head()
    assert(r.getLong(0) == 4L)  // n_classes
    assert(r.getLong(1) == 1L)  // diversity_l
    assert(r.getLong(2) == 3L)  // classes below l=2
    // the homogeneity case l-diversity exists for: k-anonymous but l=1
    val homog = Seq((1L, "eu", 9L), (2L, "eu", 9L), (3L, "eu", 9L))
      .toDF("id", "region", "bucket")
    assert(Privacy.kAnonymityReport(homog, Seq("region"), 3).head().getLong(2) == 3L)
    assert(Privacy.lDiversityReport(homog, Seq("region"), "bucket", 2)
      .head().getLong(1) == 1L)
  }

  test("tClosenessReport: hand-computed TV distance; uniform class has t=0") {
    // global segment mix: retail 5/7, corp 2/7
    // eu class (4 rows): retail 3/4, corp 1/4 ->
    //   TV = (|3/4-5/7| + |1/4-2/7|) / 2 = (1/28 + 1/28) / 2 = 1/28
    // us class (3 rows): retail 2/3, corp 1/3 ->
    //   TV = (|2/3-5/7| + |1/3-2/7|) / 2 = (1/21 + 1/21) / 2 = 1/21
    val r = Privacy.tClosenessReport(people, Seq("region"), "segment",
      t = 0.04).head()
    assert(r.getLong(0) == 2L) // n_classes
    assert(math.abs(r.getDouble(1) - 1.0 / 21) < 1e-6) // closeness_t = max
    assert(r.getLong(2) == 1L) // only the us class exceeds 0.04
    // a table where every class mirrors the global mix is 0-close;
    // missing-value mass counts (class {a} vs global {a,b} has TV > 0)
    val mirrored = Seq((1L, "x", "a"), (2L, "x", "b"),
      (3L, "y", "a"), (4L, "y", "b")).toDF("id", "cls", "s")
    assert(Privacy.tClosenessReport(mirrored, Seq("cls"), "s", 0.5)
      .head().getDouble(1) == 0.0)
    val skewed = Seq((1L, "x", "a"), (2L, "y", "a"), (3L, "y", "b"))
      .toDF("id", "cls", "s")
    // class x = {a:1}: TV = (|1-2/3| + 1/3)/2 = 1/3 (absent-b mass counted)
    val sk = Privacy.tClosenessReport(skewed, Seq("cls"), "s", 0.9).head()
    assert(math.abs(sk.getDouble(1) - 1.0 / 3) < 1e-6)
  }

  test("compressionSignal: repetition compresses below prose, random stays near 1, gates fire") {
    val repetitive = Seq.fill(60)("the same boilerplate line again").mkString(" ")
    val prose = "the quick brown fox jumps over the lazy dog while a curious " +
      "crowd of onlookers gathered near the old stone bridge to watch the " +
      "morning light spread across the quiet river valley below them"
    // hash-derived pseudo-random chars over the full printable range
    // (94 symbols, near-uniform): effectively incompressible — a hex
    // string would NOT do (16 symbols Huffman-code to ~4 bits/char,
    // BELOW English prose)
    val random = (1 to 400).map { i =>
      // splitmix-style mixing: (i * c) mod 94 alone is PERIODIC in 94
      // chars and LZ77 would compress the repetition right back out
      var z = i * 0x9E3779B97F4A7C15L
      z ^= (z >>> 31); z *= 0xBF58476D1CE4E5B9L; z ^= (z >>> 27)
      ((java.lang.Long.remainderUnsigned(z, 94)) + 33).toChar
    }.mkString
    val df = Seq((1L, repetitive), (2L, prose), (3L, random), (4L, ""))
      .toDF("doc_id", "text")
    val got = Text.compressionSignal(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getBoolean(3)))).toMap
    val (rRep, keepRep) = got(1L)
    val (rProse, keepProse) = got(2L)
    val (rRand, _) = got(3L)
    assert(rRep < rProse && rProse < rRand, s"$rRep < $rProse < $rRand expected")
    assert(rRep < 0.2 && !keepRep) // heavy repetition gated
    assert(keepProse)
    assert(got(4L) == ((1.0, false))) // empty: incompressible by convention
    // deterministic across evaluations
    val again = Text.compressionSignal(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(again(1L) == rRep && again(3L) == rRand)
  }

  test("readability: hand-computed Flesch on known sentences; wordless docs null") {
    val df = Seq(
      (1L, "the cat sat. the dog ran!"),
      // 6 words, 2 sentences, syllables: the=1 cat=1 sat.=1 the=1 dog=1
      // ran!=1 -> 6. FRE = 206.835 - 1.015*3 - 84.6*1 = 119.19
      (2L, "unbelievable bureaucracy"),
      // 2 words, 1 sentence (floor), syllables: u-n-b... vowel groups:
      // "unbelievable" -> u,e,ie,a,e = 5; "bureaucracy" -> u,eau,a,y = 4
      // -> 9. FRE = 206.835 - 1.015*2 - 84.6*4.5 = -175.895
      (3L, "   "),
      (4L, "zzz") // no vowels -> syllable floor 1 per word
    ).toDF("doc_id", "text")
    val got = Text.readability(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(1) == 6L && got(1L).getLong(2) == 2L &&
      got(1L).getLong(3) == 6L)
    assert(math.abs(got(1L).getDouble(4) - 119.19) < 1e-6)
    assert(got(2L).getLong(3) == 9L)
    assert(math.abs(got(2L).getDouble(4) - (-175.895)) < 1e-6)
    assert(got(3L).getLong(1) == 0L && got(3L).isNullAt(4))
    assert(got(4L).getLong(3) == 1L)
  }
}

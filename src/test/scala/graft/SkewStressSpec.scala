package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.CatalystBridge
import graft.ops.Dedup

/**
 * Degenerate-corpus stress for the dedup skew caps: tens of thousands of
 * byte-identical copies of one document (so every one of its shingles /
 * band signatures / fingerprints sits at df ≈ n) mixed with a small clean
 * subset. PlanShapeSpec freezes the capped plan SHAPES; this suite
 * exercises the capped BEHAVIOR:
 *
 *  - the capped operators complete, and no single task reads a
 *    quadratic-blowup shuffle (an uncapped hot key funnels ~n² candidate
 *    rows through ONE task — the straggler the caps exist to kill);
 *  - verdicts on the clean subset are IDENTICAL to running on the clean
 *    subset alone — the cap only suppresses the degenerate key.
 *
 * The per-task bound is measured with a SparkListener over
 * shuffle-read record counts (drained via the graftbridge before
 * asserting). With nClones = 20,000 an uncapped candidate join would
 * move ~2·10⁸ pair rows; the asserted ceiling of 2·10⁶ is 1% of that —
 * far above normal traffic, far below the blowup.
 */
class SkewStressSpec extends SparkSpec {
  import spark.implicits._

  private val nClones = 20000
  private val boiler =
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod"

  // clean subset: vocabulary disjoint from the boilerplate; docs 1 and 2
  // are identical (the planted pair — surfaces under every family and is
  // immune to banding luck), 3..6 pairwise unrelated
  private val cleanDocs = Seq(
    (1L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
    (2L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
    (3L, "kilo lima mike november oscar papa quebec romeo sierra tango"),
    (4L, "uniform victor whiskey xray yankee zulu one two three four"),
    (5L, "red orange yellow green blue indigo violet pink brown black"),
    (6L, "cat dog bird fish horse sheep goat cow duck hen"))

  private lazy val clean = cleanDocs.toDF("doc_id", "text")
  private lazy val stress = clean.unionByName(
    spark.range(nClones.toLong)
      .select((col("id") + 100000L).as("doc_id"), lit(boiler).as("text")))

  private class MaxShuffleTask extends SparkListener {
    @volatile var mx = 0L
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null)
        mx = math.max(mx, m.shuffleReadMetrics.recordsRead)
    }
  }

  /** Run `body`, returning (result, max shuffle-read records of any task). */
  private def withTaskBound[A](body: => A): (A, Long) = {
    val l = new MaxShuffleTask
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      CatalystBridge.drainListenerBus(spark.sparkContext)
      (r, l.mx)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  private val TaskCeiling = 2000000L

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("jaccard df cap: boilerplate clones suppressed, clean verdicts unchanged, no straggler task") {
    def run(d: DataFrame) =
      Dedup.ngramJaccardPairs(d, "text", "doc_id", n = 3, tau = 0.5,
        maxShingleDf = 100)
    val (got, mx) = withTaskBound(pairSet(run(stress)))
    assert(got == Set((1L, 2L)), s"clone pairs must be capped away, got $got")
    assert(got == pairSet(run(clean)), "clean verdicts must match clean-only run")
    assert(mx < TaskCeiling, s"straggler task read $mx shuffle records")
  }

  test("minhash maxBucket: degenerate band bucket dropped, clean verdicts unchanged, no straggler task") {
    def run(d: DataFrame) =
      Dedup.minhashLshPairs(d, "text", "doc_id", n = 3, k = 8, bands = 4,
        tau = 0.5, maxBucket = 100, fastHash = true)
    val (got, mx) = withTaskBound(pairSet(run(stress)))
    assert(got == Set((1L, 2L)), s"clone pairs must be capped away, got $got")
    assert(got == pairSet(run(clean)), "clean verdicts must match clean-only run")
    assert(mx < TaskCeiling, s"straggler task read $mx shuffle records")
  }

  test("winnow maxDf: hot fingerprint dropped, clean verdicts unchanged, no straggler task") {
    def run(d: DataFrame) =
      Dedup.winnowOverlapPairs(d, "text", "doc_id", k = 4, w = 4,
        minShared = 1, maxDf = 100)
    val (got, mx) = withTaskBound(pairSet(run(stress)))
    assert(got == Set((1L, 2L)), s"clone pairs must be capped away, got $got")
    assert(got == pairSet(run(clean)), "clean verdicts must match clean-only run")
    assert(mx < TaskCeiling, s"straggler task read $mx shuffle records")
  }

  test("simhash bands: identical-clone corpus completes; pair output is the (required) clique") {
    // simhashNearDup has no df cap BY DESIGN: identical documents ARE
    // near-duplicates, so the pair semantics REQUIRE the full clique —
    // quadratic in the clone count. The documented pipeline order is
    // exact dedup FIRST (which collapses byte-identical clones in one
    // hash-groupBy); the band structure's own bound (2^16 buckets) is
    // about DISTINCT signatures. A moderate clone count exercises the
    // clique path end to end.
    val n = 500
    val small = clean.unionByName(
      spark.range(n.toLong)
        .select((col("id") + 100000L).as("doc_id"), lit(boiler).as("text")))
    val (cnts, mx) = withTaskBound {
      val pairs = Dedup.simhashNearDup(small, "text", "doc_id", maxDist = 1)
      val cloneClique = pairs
        .filter(col("doc_a") >= 100000L && col("doc_b") >= 100000L).count()
      val planted = pairs
        .filter(col("doc_a") === 1L && col("doc_b") === 2L).count()
      (cloneClique, planted)
    }
    assert(cnts._1 == n.toLong * (n - 1) / 2,
      s"identical clones must form the full clique, got ${cnts._1}")
    assert(cnts._2 == 1L, "planted identical pair must surface")
    // the shuffle moves candidate/verify rows proportional to the clique,
    // never a second corpus-order blowup on top of it
    assert(mx < 4L * n * n, s"straggler task read $mx shuffle records")
  }

  test("paragraph dedup: 20k-clone boilerplate paragraph partial-aggregates; verdicts exact") {
    // every clone carries the SAME boilerplate paragraph plus a unique
    // one: the hot hash has df = nClones + cleanDocs with it, and the
    // groupBy-min canonical pick must map-side combine instead of
    // funneling every occurrence through one task. Verdict check: the
    // canonical is the min (doc, idx) occurrence; every clone copy and
    // every later unique-paragraph copy is a dup.
    val withBoiler = clean.withColumn("text",
        concat(col("text"), lit("\n\n"), lit(boiler)))
      .unionByName(spark.range(nClones.toLong)
        .select((col("id") + 100000L).as("doc_id"),
          concat(lit(boiler), lit("\n\nunique tail "), col("id").cast("string"))
            .as("text")))
    val ((dupCount, canon), mx) = withTaskBound {
      val v = Dedup.paragraphDups(withBoiler, "text", "doc_id")
      val hot = v.filter(col("is_dup") === false)
        .filter(col("canon_doc") === 1L && col("canon_idx") === 2L).count()
      (v.filter(col("is_dup")).count(), hot)
    }
    // boilerplate occurrences: 6 clean (idx 2) + 20k clones (idx 1) with
    // canonical (doc 1, idx 2) -> 20,005 dups; plus docs 1/2 share their
    // first paragraph (the planted identical pair) -> one more
    assert(dupCount == (6L + nClones) - 1L + 1L,
      s"expected every non-canonical copy flagged, got $dupCount")
    assert(canon == 1L, "canonical must be the (min doc, min idx) occurrence")
    // the canonical pick is an aggregate: per-task shuffle reads stay at
    // combiner grain (one row per hash per map task), never corpus grain
    assert(mx < TaskCeiling, s"straggler task read $mx shuffle records")
  }
}

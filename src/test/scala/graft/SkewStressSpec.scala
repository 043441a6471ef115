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

  test("graph family hub skew: 100k-edge star + duplicate-heavy edge list complete bounded; closed-form semantics hold") {
    // one celebrity vertex on 10^5 edges, every edge listed 3x (the
    // duplicate-heavy crawl shape — distinct() must canonicalize, the
    // score aggregates must map-side combine instead of funneling the
    // hub's whole neighborhood through one reducer row stream)
    val n = 100000L
    val star = spark.range(1L, n + 1)
      .select(lit(0L).as("src"), col("id").as("dst"))
    val dupStar = star.unionByName(star).unionByName(star)

    // hits: the hub is the ONLY source, so after normalization hub(0)=1
    // and every leaf holds auth 1/sqrt(n) — exact closed form
    val (hitsRows, mxH) = withTaskBound {
      graft.ops.Graph.hits(dupStar, "src", "dst", iterations = 2).collect()
    }
    assert(hitsRows.length == n + 1)
    val hubRow = hitsRows.find(_.getLong(0) == 0L).get
    assert(hubRow.getDouble(1) == 1.0 && hubRow.getDouble(2) == 0.0)
    val leafAuth = math.rint(1.0 / math.sqrt(n.toDouble) * 1e6) / 1e6
    assert(hitsRows.filter(_.getLong(0) != 0L).forall(r =>
      r.getDouble(1) == 0.0 && r.getDouble(2) == leafAuth),
      "every leaf: hub 0, auth 1/sqrt(n)")
    assert(mxH < TaskCeiling, s"hits straggler read $mxH shuffle records")

    // pageRank: nothing points at the hub -> rank(hub) = (1-d)/N; all
    // leaves identical by symmetry
    val (prRows, mxP) = withTaskBound {
      graft.ops.Graph.pageRank(dupStar, "src", "dst", iterations = 2).collect()
    }
    assert(prRows.length == n + 1)
    val pr = prRows.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val hubRank = math.rint(0.15 / (n + 1).toDouble * 1e6) / 1e6
    assert(pr(0L) == hubRank, s"hub rank ${pr(0L)} != closed form $hubRank")
    assert(prRows.filter(_.getLong(0) != 0L).map(_.getDouble(1)).distinct.length == 1,
      "all leaves must hold the same rank")
    assert(mxP < TaskCeiling, s"pageRank straggler read $mxP shuffle records")

    // kCore: every leaf has degree 1 -> the 2-core is empty
    val (kc, mxK) = withTaskBound {
      graft.ops.Graph.kCore(dupStar, "src", "dst", k = 2, rounds = 2).count()
    }
    assert(kc == 0L, "a star graph has no 2-core")
    assert(mxK < TaskCeiling, s"kCore straggler read $mxK shuffle records")

    // labelPropagation, 2 synchronous iterations: iter1 leaves adopt 0,
    // hub adopts min leaf label 1; iter2 leaves adopt the hub's NEW
    // label 1, hub adopts the leaves' iter1 label 0 — the classic
    // bipartite oscillation, deterministic under the min tie rule
    val (lpRows, mxL) = withTaskBound {
      graft.ops.Graph.labelPropagation(dupStar, "src", "dst",
        iterations = 2).collect()
    }
    val lp = lpRows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lp(0L) == 0L && (1L to n).forall(v => lp(v) == 1L),
      "synchronous LPA oscillation state after 2 iterations")
    assert(mxL < TaskCeiling, s"labelProp straggler read $mxL shuffle records")

    // personalizedPageRank seeded on the hub: the hub holds exactly its
    // teleport share (1-d)/|S| = 0.15 (nothing points at it), leaves all
    // equal; and an empty seed set fails fast instead of null ranks
    val seeds = Seq(0L).toDF("v")
    val (pprRows, mxS) = withTaskBound {
      graft.ops.Graph.personalizedPageRank(dupStar, "src", "dst", seeds,
        iterations = 2).collect()
    }
    val ppr = pprRows.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ppr(0L) == 0.15, s"seed teleport share, got ${ppr(0L)}")
    assert(pprRows.filter(_.getLong(0) != 0L).map(_.getDouble(1)).distinct.length == 1)
    assert(mxS < TaskCeiling, s"PPR straggler read $mxS shuffle records")
    intercept[IllegalArgumentException] {
      graft.ops.Graph.personalizedPageRank(dupStar, "src", "dst",
        seeds.limit(0), iterations = 1)
    }
  }

  test("fuzzyPairsDeletes shared-prefix flood: hot front-window keys capped; back-window pair survives; no straggler") {
    import graft.ops.Fuzzy
    // 20k DISTINCT values sharing one 24-char prefix (the prefixLen
    // window): every front-window deletion key has df = 20k — an
    // uncapped blocking join would emit ~2·10⁸ candidate rows through
    // those keys. Suffixes are doubled-digit codes ("004411…"), so
    // distinct clones sit at pairwise edit distance >= 2 and admit NO
    // true pairs at maxDist 1. The planted pair differs by ONE char in
    // the suffix — only its BACK-window keys can carry it once the
    // front buckets drop.
    val prefix = "shared-prefix-0123456789" // 24 chars
    assert(prefix.length == 24)
    val clones = spark.range(nClones.toLong).select(
      concat(lit(prefix), regexp_replace(
        format_string("%06d", col("id")), "(.)", "$1$1")).as("v"))
    val planted = Seq(prefix + "zzqqkkzzqqkx", prefix + "zzqqkkzzqqky")
      .toDF("v")
    val all = clones.unionByName(planted)
    val (got, mx) = withTaskBound {
      Fuzzy.fuzzyPairsDeletes(all, "v", maxDist = 1,
          maxBucket = 100, prefixLen = 24)
        .select("name_a", "name_b").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    }
    assert(got == Set((prefix + "zzqqkkzzqqkx", prefix + "zzqqkkzzqqky")),
      s"only the planted suffix pair may survive, got ${got.size} pairs")
    assert(mx < TaskCeiling, s"straggler task read $mx shuffle records")
  }

  test("cosineDupPairs degenerate bucket: 20k identical vectors capped away; opposite-direction planted pair survives; no straggler") {
    import graft.ops.Vectors
    // 20k byte-identical embeddings land in the SAME (band, bucket) for
    // all 20 bands — the zero-entropy corpus that would funnel ~2·10⁸
    // candidate rows without the cap (the documented pipeline order is
    // exact dedup first; the cap makes the degenerate corpus survivable,
    // not correct). The planted near-dup pair points the OTHER way, so
    // its sign pattern differs from the clone bucket in (deterministic
    // plane family) enough bands to collide with each other only.
    val cloneVec = array((0 until 16).map(i =>
      lit(if (i == 0) 1.0f else 0.1f)): _*)
    val clones = spark.range(nClones.toLong)
      .select((col("id") + 100000L).as("id"), cloneVec.as("embedding"))
    val plantedBase = Array(-1.0f, -0.2f, 0.3f, -0.4f, 0.5f, -0.6f,
      0.7f, -0.8f, -0.9f, 0.2f, -0.3f, 0.4f, -0.5f, 0.6f, -0.7f, 0.8f)
    val planted = Seq(
      (1L, plantedBase),
      (2L, plantedBase.updated(15, 0.79f)))
      .toDF("id", "embedding")
    val all = clones.unionByName(planted)
    val (got, mx) = withTaskBound {
      Vectors.cosineDupPairs(all, "id", "embedding", tau = 0.9,
          bucketed = true, nBands = 20, nPlanes = 4, maxBucket = 100,
          dim = 16)
        .select(col("id_a").cast("long"), col("id_b").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(got == Set((1L, 2L)),
      s"clone clique must be capped away, got ${got.size} pairs")
    assert(mx < TaskCeiling, s"straggler task read $mx shuffle records")
  }

  test("suppressRare hot class: 200k-row majority class partial-aggregates; verdicts exact; no straggler") {
    import graft.ops.Privacy
    // the most common class is BY DEFINITION the hottest key: 200k rows
    // in one (qi1, qi2) class (kept), plus 50 singleton classes
    // (suppressed) and one null-QI pair class of 2 (kept at k=2 —
    // null-safe join must treat NULL as its own class, groupBy
    // semantics). The old window shape funneled all 200k rows of the
    // majority class through ONE task before the filter; the groupBy
    // count pre-combines map-side, so no task reads class-grain rows.
    val nHot = 200000L
    val hot = spark.range(nHot)
      .select(col("id"), lit("adult").as("qi1"), lit("metro").as("qi2"))
    val rare = spark.range(50L)
      .select((col("id") + nHot).as("id"),
        concat(lit("age"), col("id")).as("qi1"), lit("rural").as("qi2"))
    val nulls = spark.range(2L)
      .select((col("id") + nHot + 100L).as("id"),
        lit(null).cast("string").as("qi1"), lit("metro").as("qi2"))
    val df = hot.unionByName(rare).unionByName(nulls)
    val (res, mx) = withTaskBound {
      val kept = Privacy.suppressRare(df, Seq("qi1", "qi2"), k = 2)
      (kept.count(), kept.filter(col("qi1").isNull).count())
    }
    assert(res._1 == nHot + 2L,
      s"exactly the hot class + the null pair survive, got ${res._1}")
    assert(res._2 == 2L, "the null-QI class of 2 must be KEPT at k=2")
    // combiner-grain ceiling: way below the 200k the window would funnel
    assert(mx < 100000L, s"straggler task read $mx shuffle records")
  }

  test("cfMerge bot-user skew: over-cap users never pair; merge equals clean recompute; no straggler") {
    import graft.ops.Cf
    // a 15k-item bot user in the base (over cap 100 -> contributes
    // NOTHING to pair/item counts, but its ratings persist for dedup),
    // plus a 5k-item delta for the same bot (already-over: absorbed
    // into state, never joined). An uncapped self-join would funnel
    // ~15k^2/2 = 1.1e8 pair rows through the bot's key.
    val cleanR = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 3L)).toDF("u", "i")
    val botBase = spark.range(15000L)
      .select(lit(99L).as("u"), (col("id") + 1000L).as("i"))
    val base = cleanR.filter(col("u") <= 2).unionByName(botBase)
    val delta = cleanR.filter(col("u") === 3).unionByName(
      spark.range(5000L)
        .select(lit(99L).as("u"), (col("id") + 100000L).as("i")))
    def topSet(df: DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getAs[Double]("cos"))).toSet
    val (got, mx) = withTaskBound {
      val st = Cf.cfMerge(
        Cf.cfFit(base, "u", "i", maxUserItems = 100),
        delta, "u", "i", maxUserItems = 100)
      topSet(Cf.cfTopK(st, 5))
    }
    // cap semantics: merged state = from-scratch on the union = the
    // clean corpus alone (the bot contributes nothing anywhere)
    assert(got == topSet(Cf.itemCosineNeighbors(cleanR, "u", "i",
      k = 5, maxUserItems = 100)), s"got $got")
    assert(got.nonEmpty)
    assert(mx < TaskCeiling, s"cfMerge straggler read $mx shuffle records")
  }

  test("gini value-grain: 500k rows through a 100-value table, no row-grain window funnel; closed form exact") {
    // two-value distribution: p rows of a, q rows of b (a < b) gives
    // num = Σ(2i−n−1)x = p·q·(b−a) and gini = pq(b−a)/(n(pa+qb)) —
    // exact integers end to end. The r15 row-grain rank would funnel
    // all 500k rows through ONE window task (shuffle-read = n); the
    // value-grain shape's widest shuffle is the 100-value table.
    val p = 400000L; val q = 100000L; val a = 100L; val b = 5000L
    val rows = spark.range(p).select(lit(a).as("x"), col("id"))
      .unionByName(spark.range(q).select(lit(b).as("x"),
        (col("id") + p).as("id")))
      // spread across 98 more distinct values to make the value table
      // real (they carry zero mass, so the closed form is unchanged)
      .unionByName(spark.range(98L).select(lit(0L).as("x"),
        (col("id") + 900000L).as("id")))
    val n = p + q + 98L
    val tot = p * a + q * b
    // zero-mass values contribute nothing to num: x = 0 terms vanish,
    // and a/b runs shift by the 98 zero ranks — recompute directly:
    // num = a·p·(2·98 + p − n) + b·q·(2·(98+p) + q − n)
    val num = a * p * (2 * 98 + p - n) + b * q * (2 * (98 + p) + q - n)
    val expect = BigDecimal(num.toDouble / (n.toDouble * tot.toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (row, mx) = withTaskBound(
      graft.ops.Profile.gini(rows, "x", "id").head())
    assert(row.getLong(0) == n && row.getLong(1) == tot)
    assert(row.getDouble(2) == expect,
      s"gini ${row.getDouble(2)} vs closed form $expect")
    assert(mx < 100000L,
      s"value-grain gini must never shuffle row grain; task read $mx")
  }

  test("spearman value-grain: 500k tied rows, midranks from the count table, no row-grain window funnel") {
    // b = 99 − a value-for-value: a perfect monotone DECREASE at value
    // grain with massive ties — spearman is exactly −1 whatever the
    // tie pattern, and the only window input is the 100-value table
    val rows = spark.range(500000L)
      .select((col("id") % 100).as("a"), (lit(99L) - col("id") % 100).as("b"))
    val (res, mx) = withTaskBound(
      graft.stats.Planners.spearman(rows, "a", "b").head())
    assert(res.getLong(0) == 500000L && res.getDouble(1) == -1.0,
      s"expected perfect reversal, got $res")
    assert(mx < 100000L,
      s"value-grain spearman must never shuffle row grain; task read $mx")
  }
}

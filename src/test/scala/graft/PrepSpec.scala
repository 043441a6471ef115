package graft

import org.apache.spark.sql.functions._
import graft.prep.{Encoding, Normalize, Windows}

/** Unit specs for the prep operators: rank identities, pad-shift algebra
  * (the comment-spec at reference spark/preprocess.py:414-424), encoding
  * UNK-closure, normalization round trips, no-variance guard. */
class PrepSpec extends SparkSpec {
  import spark.implicits._

  private def eventsOf(counts: Map[Int, Int]) = {
    val rows = for {
      (u, n) <- counts.toSeq; i <- 1 to n
    } yield (u, i.toLong, java.sql.Timestamp.valueOf(f"2024-01-${i}%02d 00:00:00"))
    rows.toDF("user_id", "event_id", "ts")
  }

  test("C1 rank identity: rank_asc + rank_desc == seq_len + 1") {
    val df = Windows.ranks(eventsOf(Map(1 -> 5, 2 -> 1, 3 -> 8)),
      Seq("user_id"), "ts", Seq("event_id"))
    assert(df.filter(col("rank_asc") + col("rank_desc") =!= col("seq_len") + 1).count() == 0)
  }

  test("C2 pad-shift algebra over seq_len x leftPad grid") {
    val n = 5
    for (s <- 1 to 8; leftPad <- Seq(true, false)) {
      val ranked = Windows.padShift(
        Windows.latestN(Windows.ranks(eventsOf(Map(1 -> s)), Seq("user_id"), "ts",
          Seq("event_id")), n), n, leftPad)
      val ranks = ranked.select(col("rank").cast("int")).as[Int].collect().sorted
      val kept = math.min(s, n)
      // kept rows occupy a contiguous rank block; right-aligned iff
      // left-padding or truncated, else starting at 1
      val expectStart = if (leftPad || s >= n) n - kept + 1 else 1
      assert(ranks.toSeq == (expectStart until expectStart + kept),
        s"s=$s leftPad=$leftPad got ${ranks.toSeq}")
    }
  }

  test("encoding: frequency order, determinism, UNK closure, cap") {
    val df = Seq.fill(5)("b").map(Tuple1(_)) ++ Seq.fill(3)("a").map(Tuple1(_)) ++
      Seq.fill(3)("c").map(Tuple1(_)) ++ Seq(Tuple1(null: String))
    val data = df.toDF("v")
    val enc = Encoding.fit(data, "v")
    val m = enc.mapping.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(m == Map("b" -> 1, "a" -> 2, "c" -> 3)) // freq desc, value tiebreak, null dropped
    // unseen value -> 0 at apply
    val applied = Encoding.apply(Seq("b", "zz", null).toDF("v"), enc, "code")
      .select("code").as[Int].collect().toSeq
    assert(applied.sorted == Seq(0, 0, 1))
    // cap prunes beyond top-k
    val capped = Encoding.fit(data, "v", maxCardinality = 2)
    assert(capped.mapping.count() == 2)
    // decode: 0 and unknown codes -> UNK
    val dec = Encoding.decode(Seq(1, 0, 99).toDF("code"), enc, "code", "v")
      .orderBy("code").select("v").as[String].collect().toSeq
    assert(dec == Seq("UNK", "b", "UNK"))
  }

  test("normalization: minmax/zscore round trips; no-variance guard") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).map(x => (x, 7.0)).toDF("x", "flat")
    val s = Normalize.fit(df, Seq("x", "flat"))
    val mm = df.select(s.minMax("x").as("v")).as[Double].collect().sorted
    assert(mm.head == 0.0 && mm.last == 1.0)
    // round trip
    val rt = df.select(abs(col("x") -
      (s.minMax("x") * lit(s.stats("x").max - s.stats("x").min) + lit(s.stats("x").min)))
      .as("d")).as[Double].collect()
    assert(rt.forall(_ < 1e-12))
    // no-variance column passes through unchanged
    val flat = df.select(s.minMax("flat").as("v")).as[Double].collect()
    assert(flat.forall(_ == 7.0))
  }

  test("sketch-mode fit statistics: identical gate decisions vs exact (SCALE.md)") {
    val ev = graft.core.Tables.load(spark, sf, "events")
    // D1 cardinality gate (encoding-strategy choice): HLL vs exact agree
    // on the <= maxCardinality decision, and here on the value itself
    // (low-cardinality column, rsd 2%)
    val exact = Encoding.cardinality(ev, "event_type")
    val approx = Encoding.cardinality(ev, "event_type", approximate = true)
    assert(exact == approx, s"event_type cardinality: exact=$exact hll=$approx")
    assert((exact <= 30000) == (approx <= 30000))
    // D6 seq-len planner: approx_percentile picks the same ceil'd length
    val exactLen = graft.stats.Planners.sequenceLength(ev, Seq("user_id"), 0.5)
    val approxLen = graft.stats.Planners.sequenceLength(ev, Seq("user_id"), 0.5,
      approximate = true)
    assert(exactLen == approxLen, s"seq_len: exact=$exactLen approx=$approxLen")
    // D7 lookback buckets: sketch n_entities within HLL rsd of exact in
    // every bucket — the per-bucket RATIO that drives the lookback choice
    val pred = to_timestamp(lit("2024-02-01 00:00:00"))
    def byBucket(approximate: Boolean) =
      graft.stats.Planners.lookbackBuckets(ev, "user_id", "ts", pred, 7,
          approximate = approximate)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val eB = byBucket(false); val aB = byBucket(true)
    assert(eB.keySet == aB.keySet)
    eB.foreach { case (b, (n, events)) =>
      val (na, eventsA) = aB(b)
      assert(eventsA == events) // plain counts are unaffected
      assert(math.abs(na - n).toDouble / n <= 0.05,
        s"bucket $b: exact $n vs sketch $na beyond 5%")
    }
  }

  test("targetEncode: out-of-fold means, prior fallback, no self-leakage") {
    import graft.prep.Encoding
    // category "a": rows with labels 1, 1, 0; category "b": one row
    val df = Seq((1L, "a", 1.0), (2L, "a", 1.0), (3L, "a", 0.0), (4L, "b", 1.0))
      .toDF("id", "cat", "label")
    val m = 2.0
    val prior = 0.75 // 3 positives / 4 rows
    val got = Encoding.targetEncode(df, "cat", "label", "id",
        folds = 2, smoothing = m)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // recompute each row's expectation from ITS actual md5 fold
    val folds = df.select(col("id"),
        pmod(conv(substring(md5(concat(col("id").cast("string"), lit("#tefold"))),
          1, 4), 16, 10).cast("long"), lit(2L)).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Seq((1L, "a", 1.0), (2L, "a", 1.0), (3L, "a", 0.0), (4L, "b", 1.0))
    val r6 = (x: Double) => math.round(x * 1e6) / 1e6
    for ((id, cat, _) <- rows) {
      val others = rows.filter(t => t._2 == cat && folds(t._1) != folds(id))
      val want = r6((others.map(_._3).sum + m * prior) / (others.size + m))
      assert(got(id) == ((folds(id), want)), s"row $id: ${got(id)} vs $want")
    }
    // the singleton category's encoding is EXACTLY the smoothed prior
    assert(got(4L)._2 == r6(m * prior / m))
  }

  test("ksTest: hand-computed sup gap; identical samples give D = 0") {
    import graft.stats.Planners
    // A = {1, 2}, B = {2, 3}: F_A - F_B = 0.5 at v=1 and v=2, 0 at v=3
    val df = Seq((1.0, "a"), (2.0, "a"), (2.0, "b"), (3.0, "b"))
      .toDF("value", "grp")
    val r = Planners.ksTest(df, "value", "grp", "a", "b").head()
    assert(r.getDouble(0) == 0.5 && r.getLong(1) == 2L && r.getLong(2) == 2L)
    // identical distributions: D = 0 (ties collapse before the scan)
    val same = Seq((1.0, "a"), (2.0, "a"), (1.0, "b"), (2.0, "b"))
      .toDF("value", "grp")
    assert(Planners.ksTest(same, "value", "grp", "a", "b").head().getDouble(0) == 0.0)
    // disjoint supports: D = 1
    val dis = Seq((1.0, "a"), (2.0, "a"), (10.0, "b"), (11.0, "b"))
      .toDF("value", "grp")
    assert(Planners.ksTest(dis, "value", "grp", "a", "b").head().getDouble(0) == 1.0)
  }

  test("welchT: hand-computed t and Welch-Satterthwaite dof; equal samples give t = 0") {
    import graft.stats.Planners
    // A = {1,2,3}: n=3 mean=2 var=1; B = {4,6}: n=2 mean=5 var=2
    // t = (2-5)/sqrt(1/3 + 1) = -3/sqrt(4/3); dof = (4/3)^2/((1/3)^2/2 + 1^2/1)
    val df = Seq((1.0, "a"), (2.0, "a"), (3.0, "a"), (4.0, "b"), (6.0, "b"))
      .toDF("value", "grp")
    val r = Planners.welchT(df, "value", "grp", "a", "b").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 5.0)
    val r6 = (x: Double) => math.round(x * 1e6) / 1e6
    assert(r.getDouble(4) == r6(-3.0 / math.sqrt(4.0 / 3)))
    assert(r.getDouble(5) == r6(math.pow(4.0 / 3, 2) /
      (math.pow(1.0 / 3, 2) / 2 + 1.0)))
    // identical groups: t exactly 0
    val same = Seq((1.0, "a"), (3.0, "a"), (1.0, "b"), (3.0, "b"))
      .toDF("value", "grp")
    assert(Planners.welchT(same, "value", "grp", "a", "b").head().getDouble(4) == 0.0)
  }

  test("proportionZTest: hand-computed z and lifts; degenerate rates null out") {
    import graft.stats.Planners
    // A: 6/10, B: 4/10 -> pooled 0.5, se = sqrt(0.25 * 0.2), z = 0.2/se
    val rows = (1 to 10).map(i => (i <= 6, "a")) ++
      (1 to 10).map(i => (i <= 4, "b")) ++
      Seq((true, "c")) // third group must be ignored
    val df = rows.toDF("ok", "grp")
    val r = Planners.proportionZTest(df, "ok", "grp", "a", "b").head()
    assert(r.getLong(0) == 10L && r.getLong(1) == 10L)
    assert(r.getDouble(2) == 0.6 && r.getDouble(3) == 0.4)
    assert(r.getDouble(4) == 0.2 && r.getDouble(5) == 0.5)
    val r6 = (x: Double) => math.round(x * 1e6) / 1e6
    assert(r.getDouble(6) == r6(0.2 / math.sqrt(0.25 * 0.2)))
    // all-failure pooled rate: z null, rates still reported
    val flat = Seq((false, "a"), (false, "b")).toDF("ok", "grp")
    val f = Planners.proportionZTest(flat, "ok", "grp", "a", "b").head()
    assert(f.getDouble(2) == 0.0 && f.get(6) == null)
    // empty group B: no crash, null rate and z
    val one = Seq((true, "a")).toDF("ok", "grp")
    val o = Planners.proportionZTest(one, "ok", "grp", "a", "b").head()
    assert(o.getLong(1) == 0L && o.get(3) == null && o.get(6) == null)
    // numeric success column grades nonzero as success
    val num = Seq((1L, "a"), (0L, "a"), (1L, "b"), (1L, "b"))
      .toDF("ok", "grp")
    val n = Planners.proportionZTest(num, "ok", "grp", "a", "b").head()
    assert(n.getDouble(2) == 0.5 && n.getDouble(3) == 1.0)
  }

  test("mannWhitneyU: midrank ties, U_A + U_B = nA*nB, symmetric z, known example") {
    import graft.stats.Planners
    // A = {1, 2}, B = {2, 3}: pooled ranks 1, (2.5, 2.5), 4
    // rank-sum A = 1 + 2.5 = 3.5; U_A = 3.5 - 3 = 0.5; U_B = 4 - 0.5 = 3.5
    val df = Seq((1.0, "a"), (2.0, "a"), (2.0, "b"), (3.0, "b"))
      .toDF("value", "grp")
    val r = Planners.mannWhitneyU(df, "value", "grp", "a", "b").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.5 && r.getDouble(3) == 3.5)
    // rank-biserial r = 2U/(nAnB) - 1 = 2*0.5/4 - 1 = -0.75
    assert(r.getDouble(5) == -0.75)
    // swapping the groups flips U and z signs
    val s = Planners.mannWhitneyU(df, "value", "grp", "b", "a").head()
    assert(s.getDouble(2) == 3.5 && s.getDouble(3) == 0.5)
    assert(math.abs(s.getDouble(4) + r.getDouble(4)) < 1e-9)
    // total-tie input: U_A = nAnB/2 exactly; z is undefined there
    // (sigma2 = 0 — no cross-group variability to normalize by)
    val tied = Seq((5.0, "a"), (5.0, "a"), (5.0, "b")).toDF("value", "grp")
    val t = Planners.mannWhitneyU(tied, "value", "grp", "a", "b").head()
    assert(t.getDouble(2) == 1.0 && t.getDouble(3) == 1.0)
  }

  test("calibrationReport: hand-computed bins, ECE, Brier, edge clamp") {
    import graft.stats.Planners
    // bins at nBins=2: {0.05, 0.15} -> bin 0; {0.95, 0.85, 1.0} -> bin 1
    // (p = 1.0 clamps into the top bin)
    val df = Seq((0.95, 1L), (0.85, 1L), (0.05, 0L), (0.15, 1L), (1.0, 1L))
      .toDF("prob", "label")
    val rows = Planners.calibrationReport(df, "prob", "label", nBins = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    // bin 0: conf 0.1, acc 0.5, gap 0.4; bin 1: conf 2.8/3, acc 1
    // ECE = 2/5*0.4 + 3/5*(1 - 2.8/3); Brier = 0.75/5 = 0.15
    val conf1 = (0.95 + 0.85 + 1.0) / 3
    val r6 = (x: Double) => math.round(x * 1e6) / 1e6
    val ece = r6(2.0 / 5 * 0.4 + 3.0 / 5 * (1.0 - conf1))
    assert(rows(0L) == ((2L, 0.1, 0.5, 0.4, ece, 0.15)))
    assert(rows(1L) == ((3L, r6(conf1), 1.0, r6(1.0 - conf1), ece, 0.15)))
  }

  test("quantileNormalizeApprox: ranks bit-equal to exact, normalized within the grid's own max gap") {
    val ev = graft.core.Tables.load(spark, sf, "events")
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Double]("src_rank"), r.getAs[Double]("normalized")))).toMap
    val exact = keyed(Normalize.quantileNormalize(ev, "event_type", "value",
      q = 101, idCols = Seq("event_id")))
    val approx = keyed(Normalize.quantileNormalizeApprox(ev, "event_type",
      "value", q = 101, idCols = Seq("event_id"), accuracy = 10000))
    assert(approx.keySet == exact.keySet && approx.size > 100)
    // the exact grid's max adjacent gap bounds how far a sketch grid
    // point (rank error 1e-4) can displace an interpolated score
    val grid = ev.filter(col("value").isNotNull)
      .agg(percentile(col("value").cast("double"),
        array((0 until 101).map(j => lit(j / 100.0)): _*)))
      .head().getSeq[Double](0)
    val maxGap = grid.sliding(2).map(p => p(1) - p(0)).max
    approx.foreach { case (k, (r, nv)) =>
      val (er, env) = exact(k)
      assert(r == er, s"$k: rank $r vs $er") // rank side is untouched
      assert(math.abs(nv - env) <= 2 * maxGap + 1e-6,
        s"$k: $nv vs $env (maxGap $maxGap)")
    }
  }

  test("quantileNormalize: hand grid, cross-source median alignment, ties, singleton, nulls") {
    // global sorted values: [1,2,3,4,5,7,7,10,20,30,100] (n=11); grid q=5
    // at positions p*(11-1): g = [1, 3+0.5=3.5, 7, 10+0.5*10=15, 100]
    val df = Seq(
      ("A", 1L, Some(1.0)), ("A", 2L, Some(2.0)), ("A", 3L, Some(3.0)),
      ("A", 4L, Some(4.0)), ("A", 5L, Some(5.0)),
      ("B", 6L, Some(10.0)), ("B", 7L, Some(20.0)), ("B", 8L, Some(30.0)),
      ("C", 9L, Some(7.0)), ("C", 10L, Some(7.0)),
      ("D", 11L, Some(100.0)),
      ("A", 12L, None)
    ).toDF("src", "id", "value")
    val out = Normalize.quantileNormalize(df, "src", "value", q = 5,
        idCols = Seq("id")).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getDouble(4)))).toMap
    assert(!out.contains(12L), "null value rows drop")
    // A (n=5): ranks 0,.25,.5,.75,1 -> idx 0..4 over g
    assert(out(1L) == ((0.0, 1.0)))
    assert(out(2L) == ((0.25, 3.5)))
    assert(out(3L) == ((0.5, 7.0)))
    assert(out(4L) == ((0.75, 15.0)))
    assert(out(5L) == ((1.0, 100.0)))
    // B (n=3): the source median lands on the global median, like A's
    assert(out(7L) == ((0.5, 7.0)), "medians align across sources")
    assert(out(6L) == ((0.0, 1.0)) && out(8L) == ((1.0, 100.0)))
    // ties share the strict-less rank; singleton source defines r = 0
    assert(out(9L) == ((0.0, 1.0)) && out(10L) == ((0.0, 1.0)))
    assert(out(11L) == ((0.0, 1.0)))
  }

  test("kruskalWallis: hand-computed tie-corrected H; degenerate inputs null") {
    import graft.stats.Planners
    import spark.implicits._
    val r6 = (x: Double) => math.round(x * 1e6) / 1e6
    // a={1,2} b={2,3} c={5}: ranks 1,(2.5,2.5),4,5
    // R_a=3.5 R_b=6.5 R_c=5; H = 0.4*(6.125+21.125+25) - 18 = 2.9
    // ties: one block t=2 -> C = 1 - 6/120 = 0.95; h = 2.9/0.95
    val df = Seq((1.0, "a"), (2.0, "a"), (2.0, "b"), (3.0, "b"), (5.0, "c"))
      .toDF("value", "grp")
    val r = Planners.kruskalWallis(df, "value", "grp").head()
    assert(r.getLong(0) == 5L && r.getLong(1) == 3L && r.getLong(2) == 2L)
    val h = 2.9 / 0.95
    assert(r.getDouble(3) == r6(h))
    assert(r.getDouble(4) == r6((h - 3 + 1) / (5 - 3)))
    // every value tied: C = 0, no rank variability -> h null
    val tied = Seq((5.0, "a"), (5.0, "a"), (5.0, "b")).toDF("value", "grp")
    assert(Planners.kruskalWallis(tied, "value", "grp").head().get(3) == null)
    // single group: k < 2 -> null
    val one = Seq((1.0, "a"), (2.0, "a")).toDF("value", "grp")
    assert(Planners.kruskalWallis(one, "value", "grp").head().get(3) == null)
  }

  test("dunnPairwise: hand-computed tie-corrected z per pair, ordered pairs") {
    import graft.stats.Planners
    import spark.implicits._
    val r6 = (x: Double) => math.round(x * 1e6) / 1e6
    val df = Seq((1.0, "a"), (2.0, "a"), (2.0, "b"), (3.0, "b"), (5.0, "c"))
      .toDF("value", "grp")
    val rows = Planners.dunnPairwise(df, "value", "grp").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    assert(rows.size == 3 && rows.keySet ==
      Set(("a", "b"), ("a", "c"), ("b", "c")))
    // mean ranks 1.75, 3.25, 5; V = (30 - 6/4)/12 = 2.375
    val v = 2.375
    val (na, nb, mra, mrb, zab) = rows(("a", "b"))
    assert(na == 2L && nb == 2L && mra == 1.75 && mrb == 3.25)
    assert(zab == r6((1.75 - 3.25) / math.sqrt(v * (0.5 + 0.5))))
    assert(rows(("a", "c"))._5 ==
      r6((1.75 - 5.0) / math.sqrt(v * (0.5 + 1.0))))
    assert(rows(("b", "c"))._5 ==
      r6((3.25 - 5.0) / math.sqrt(v * (0.5 + 1.0))))
    // all-tied input: V = 0 -> z null, mean ranks still reported
    val tied = Seq((5.0, "a"), (5.0, "a"), (5.0, "b")).toDF("value", "grp")
    val t = Planners.dunnPairwise(tied, "value", "grp").head()
    assert(t.get(6) == null && t.getDouble(4) == 2.0)
  }

  test("brownForsythe: hand-computed F on |2x - 2 med|; identical spreads give F = 0") {
    import graft.stats.Planners
    import spark.implicits._
    val r6 = (x: Double) => math.round(x * 1e6) / 1e6
    // a={0,2,10} med 2 -> dev2 {4,0,16}; b={1,1,9} med 1 -> dev2 {0,0,16}
    // SSB = 8/3, SSW = 928/3; F = (8/3)/((928/3)/4) = 8/232
    val df = Seq((0L, "a"), (2L, "a"), (10L, "a"),
      (1L, "b"), (1L, "b"), (9L, "b")).toDF("x", "grp")
    val r = Planners.brownForsythe(df, "x", "grp").head()
    assert(r.getLong(0) == 6L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 1L && r.getLong(3) == 4L)
    val ssb = 8.0 / 3
    val ssw = 928.0 / 3
    assert(r.getDouble(4) == r6((ssb / 1) / (ssw / 4)))
    assert(r.getDouble(5) == r6(ssb / (ssb + ssw)))
    // identical deviation patterns across groups -> SSB = 0 -> F = 0
    val same = Seq((0L, "a"), (4L, "a"), (4L, "a"),
      (10L, "b"), (14L, "b"), (14L, "b")).toDF("x", "grp")
    assert(Planners.brownForsythe(same, "x", "grp").head().getDouble(4) == 0.0)
    // zero within-spread everywhere (SSW = 0): F null, not a div-by-0
    val flat = Seq((0L, "a"), (4L, "a"), (10L, "b"), (14L, "b"))
      .toDF("x", "grp")
    assert(Planners.brownForsythe(flat, "x", "grp").head().get(4) == null)
  }

  test("cochranQ: textbook 4x3 example gives Q = 3; degenerate patterns null; max collapses duplicates") {
    import graft.stats.Planners
    import spark.implicits._
    // G = (3,2,1), S = 6, sumL2 = 14, sumG2 = 14
    // Q = 2*(3*14 - 36)/(3*6 - 14) = 12/4 = 3
    val rows = Seq(
      (1L, "a", true), (1L, "b", true), (1L, "c", false),
      (2L, "a", true), (2L, "b", false), (2L, "c", false),
      (3L, "a", true), (3L, "b", true), (3L, "c", true),
      (4L, "a", false), (4L, "b", false), (4L, "c", false))
    val r = Planners.cochranQ(rows.toDF("subj", "cond", "ok"),
      "subj", "cond", "ok").head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 3.0)
    // duplicate observations collapse with MAX (any success counts)
    val dup = rows ++ Seq((1L, "a", false), (2L, "c", false))
    val d = Planners.cochranQ(dup.toDF("subj", "cond", "ok"),
      "subj", "cond", "ok").head()
    assert(d.getDouble(3) == 3.0)
    // a subject MISSING a condition is a failure there: dropping
    // s2's explicit (c, false) row changes nothing
    val miss = rows.filterNot(t => t._1 == 2L && t._2 == "c")
    assert(Planners.cochranQ(miss.toDF("subj", "cond", "ok"),
      "subj", "cond", "ok").head().getDouble(3) == 3.0)
    // every subject all-success or all-failure: no discrimination -> null
    val flat2 = Seq((1L, "a", true), (1L, "b", true),
      (2L, "a", false), (2L, "b", false))
    assert(Planners.cochranQ(flat2.toDF("subj", "cond", "ok"),
      "subj", "cond", "ok").head().get(3) == null)
  }

  test("partialCorrelation: hand-computed first-order partial; confounder collapse") {
    import graft.stats.Planners
    import spark.implicits._
    val r6 = (x: Double) => math.round(x * 1e6) / 1e6
    // x = 1..4, z = (0,1,0,1), y = x + 2z with one perturbed point
    val df = Seq((1L, 1L, 0L), (2L, 4L, 1L), (3L, 3L, 0L), (4L, 5L, 1L))
      .toDF("x", "y", "z")
    val r = Planners.partialCorrelation(df, "x", "y", "z").head()
    assert(r.getLong(0) == 4L)
    // mirror the op's exact arithmetic
    val (nxy, vx, vy) = (22.0, 20.0, 35.0)
    val (nxz, vz, nyz) = (4.0, 4.0, 10.0)
    val rxy = nxy / math.sqrt(vx * vy)
    val rxz = nxz / math.sqrt(vx * vz)
    val ryz = nyz / math.sqrt(vy * vz)
    assert(r.getDouble(1) == r6(rxy))
    assert(r.getDouble(2) == r6(rxz))
    assert(r.getDouble(3) == r6(ryz))
    assert(r.getDouble(4) == r6((rxy - rxz * ryz) /
      math.sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz))))
    // y perfectly determined by z: r_yz = 1 -> partial undefined (null)
    val det = Seq((1L, 0L, 0L), (2L, 2L, 1L), (3L, 0L, 0L), (4L, 2L, 1L))
      .toDF("x", "y", "z")
    val dr = Planners.partialCorrelation(det, "x", "y", "z").head()
    assert(dr.getDouble(3) == 1.0 && dr.get(4) == null)
    // constant column: its raw correlations null, partial null
    val const = Seq((1L, 1L, 5L), (2L, 2L, 5L), (3L, 3L, 5L))
      .toDF("x", "y", "z")
    val cr = Planners.partialCorrelation(const, "x", "y", "z").head()
    assert(cr.get(2) == null && cr.get(4) == null)
  }

  test("cramerVonMises: hand-computed discrete T; identical samples 0; empty group null") {
    import graft.stats.Planners
    import spark.implicits._
    // A={1,2} B={2,3}: gaps 0.5, 0.5, 0 with t = 1,2,1
    // T = (4/16)*(0.25 + 0.5 + 0) = 0.1875
    val df = Seq((1.0, "a"), (2.0, "a"), (2.0, "b"), (3.0, "b"))
      .toDF("value", "grp")
    val r = Planners.cramerVonMises(df, "value", "grp", "a", "b").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.1875)
    // identical samples: every gap 0
    val same = Seq((1.0, "a"), (2.0, "a"), (1.0, "b"), (2.0, "b"))
      .toDF("value", "grp")
    assert(Planners.cramerVonMises(same, "value", "grp", "a", "b")
      .head().getDouble(2) == 0.0)
    // empty B: statistic undefined
    val one = Seq((1.0, "a")).toDF("value", "grp")
    assert(Planners.cramerVonMises(one, "value", "grp", "a", "b")
      .head().get(2) == null)
  }

  test("aucDeLong: hand-computed placements, tie credit, degenerate cases") {
    import graft.stats.Planners
    import spark.implicits._
    val r6 = (x: Double) => math.round(x * 1e6) / 1e6
    // pos {3,5}, neg {1,3}: AUC = (1 + 0.5 + 1 + 1)/4 = 0.875
    val df = Seq((3.0, true), (5.0, true), (1.0, false), (3.0, false))
      .toDF("score", "y")
    val r = Planners.aucDeLong(df, "score", "y").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.875)
    // S10 = S01 = 2*(0.125)^2 = 0.03125; var = S10/2 + S01/2
    val se = math.sqrt(0.03125)
    assert(r.getDouble(3) == r6(se))
    assert(r.getDouble(4) == r6((0.875 - 0.5) / se))
    // perfect separation: AUC 1, zero placement variance -> se 0, z null
    val perf = Seq((10.0, true), (11.0, true), (1.0, false), (2.0, false))
      .toDF("score", "y")
    val p = Planners.aucDeLong(perf, "score", "y").head()
    assert(p.getDouble(2) == 1.0 && p.getDouble(3) == 0.0 && p.get(4) == null)
    // single-class input: AUC undefined
    val pos = Seq((1.0, true), (2.0, true)).toDF("score", "y")
    val o = Planners.aucDeLong(pos, "score", "y").head()
    assert(o.getLong(1) == 0L && o.get(2) == null)
  }

  test("friedmanTest: textbook 3x3 ranks; incomplete blocks drop; all-tied null") {
    import graft.stats.Planners
    import spark.implicits._
    val r6 = (x: Double) => math.round(x * 1e6) / 1e6
    // ranks per subject: (1,2,3), (1,3,2), (2,1,3) -> R = 4,6,8
    // chi2 = 12/(3*3*4)*116 - 36 = 8/3; W = (8/3)/(3*2) = 4/9
    val rows = Seq(
      (1L, "a", 10L), (1L, "b", 20L), (1L, "c", 30L),
      (2L, "a", 10L), (2L, "b", 30L), (2L, "c", 20L),
      (3L, "a", 20L), (3L, "b", 10L), (3L, "c", 30L))
    val r = Planners.friedmanTest(rows.toDF("subj", "cond", "x"),
      "subj", "cond", "x").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == r6(8.0 / 3))
    assert(r.getDouble(4) == r6(4.0 / 9))
    // a subject missing a condition is excluded entirely
    val withIncomplete = rows ++ Seq((4L, "a", 99L), (4L, "b", 1L))
    val ri = Planners.friedmanTest(withIncomplete.toDF("subj", "cond", "x"),
      "subj", "cond", "x").head()
    assert(ri.getLong(0) == 3L && ri.getDouble(3) == r6(8.0 / 3))
    // every subject ties all conditions: C = 0 -> null
    val tied = Seq((1L, "a", 5L), (1L, "b", 5L), (1L, "c", 5L),
      (2L, "a", 7L), (2L, "b", 7L), (2L, "c", 7L))
    assert(Planners.friedmanTest(tied.toDF("subj", "cond", "x"),
      "subj", "cond", "x").head().get(3) == null)
  }

  test("kendallTauB: hand-computed concordance, tie correction, constant column null") {
    import graft.stats.Planners
    import spark.implicits._
    val r6 = (x: Double) => math.round(x * 1e6) / 1e6
    // x=1..4, y=(1,3,2,4): C=5, D=1, no ties -> tau = 4/6
    val df = Seq((1L, 1L), (2L, 3L), (3L, 2L), (4L, 4L)).toDF("x", "y")
    val r = Planners.kendallTauB(df, "x", "y").head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == r6(4.0 / 6))
    // 2x2 grid of singletons: C = D = 1 -> tau exactly 0 (tie-adjusted)
    val grid = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)).toDF("x", "y")
    assert(Planners.kendallTauB(grid, "x", "y").head().getDouble(2) == 0.0)
    // constant x: no orderable pairs -> null
    val const = Seq((5L, 1L), (5L, 2L), (5L, 3L)).toDF("x", "y")
    assert(Planners.kendallTauB(const, "x", "y").head().get(2) == null)
    // perfect monotone with duplicates: tau-b = 1 exactly
    val mono = Seq((1L, 10L), (1L, 10L), (2L, 20L), (3L, 30L)).toDF("x", "y")
    assert(Planners.kendallTauB(mono, "x", "y").head().getDouble(2) == 1.0)
  }

  test("pageTrend: perfect order hits max L with z = 2; reversal flips the sign") {
    import graft.stats.Planners
    import spark.implicits._
    // two subjects, both ranking a < b < c: L = 28 (the max),
    // E = 24, Var = 4 -> z = 2
    val up = Seq((1L, "a", 10L), (1L, "b", 20L), (1L, "c", 30L),
      (2L, "a", 1L), (2L, "b", 2L), (2L, "c", 3L))
    val r = Planners.pageTrend(up.toDF("subj", "cond", "x"),
      "subj", "cond", "x").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 28.0 && r.getDouble(3) == 2.0)
    // reversed: L = 20 -> z = -2
    val down = up.map { case (s, c, v) => (s, c, -v) }
    val d = Planners.pageTrend(down.toDF("subj", "cond", "x"),
      "subj", "cond", "x").head()
    assert(d.getDouble(2) == 20.0 && d.getDouble(3) == -2.0)
    // single condition: no ordering to test
    val one = Seq((1L, "a", 1L), (2L, "a", 2L)).toDF("subj", "cond", "x")
    assert(Planners.pageTrend(one, "subj", "cond", "x").head().get(3) == null)
  }

  test("iccTwoWay: hand-computed two-way decomposition; additive table has F null") {
    import graft.stats.Planners
    import spark.implicits._
    // s3 rater B perturbed: SSR=61/3 SSC=8/3 SSE=1/3
    // -> MSR=61/6 MSE=1/6 den=12, icc = 10/12, F = 61
    val rows = Seq((1L, "A", 1L), (1L, "B", 2L), (2L, "A", 3L),
      (2L, "B", 4L), (3L, "A", 5L), (3L, "B", 7L))
    val r = Planners.iccTwoWay(rows.toDF("subj", "rater", "x"),
      "subj", "rater", "x").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(math.abs(r.getDouble(2) - 5.0 / 6) < 1e-6)
    assert(math.abs(r.getDouble(3) - 61.0) < 1e-4)
    // perfectly additive (constant rater offset): MSE = 0 -> F null,
    // ICC still defined (8/9)
    val add = Seq((1L, "A", 1L), (1L, "B", 2L), (2L, "A", 3L),
      (2L, "B", 4L), (3L, "A", 5L), (3L, "B", 6L))
    val a = Planners.iccTwoWay(add.toDF("subj", "rater", "x"),
      "subj", "rater", "x").head()
    assert(a.get(3) == null)
    assert(math.abs(a.getDouble(2) - 8.0 / 9) < 1e-6)
    // incomplete subject drops: adding a half-rated subject 4 changes
    // nothing
    val inc = rows ++ Seq((4L, "A", 99L))
    val i = Planners.iccTwoWay(inc.toDF("subj", "rater", "x"),
      "subj", "rater", "x").head()
    assert(i.getLong(0) == 3L && math.abs(i.getDouble(2) - 5.0 / 6) < 1e-6)
  }

  test("averagePrecision: right-step blocks, tie handling, no-positive null") {
    import graft.stats.Planners
    import spark.implicits._
    val r6 = (x: Double) => math.round(x * 1e6) / 1e6
    // desc blocks: pos@5 (P=1), neg@4, pos@3 (P=2/3) -> AP = 5/6
    val df = Seq((5.0, true), (4.0, false), (3.0, true)).toDF("s", "y")
    val r = Planners.averagePrecision(df, "s", "y").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L)
    assert(r.getDouble(2) == r6(5.0 / 6))
    // tied block: two positives and a negative at one score -> the
    // block's inclusive precision 2/3 applies to both positives
    val tied = Seq((2.0, true), (2.0, true), (2.0, false)).toDF("s", "y")
    assert(Planners.averagePrecision(tied, "s", "y").head().getDouble(2) ==
      r6(2.0 / 3))
    // no positives: AP undefined
    val neg = Seq((1.0, false), (2.0, false)).toDF("s", "y")
    assert(Planners.averagePrecision(neg, "s", "y").head().get(2) == null)
  }

  test("blandAltman: hand bias/limits, full coverage, small-n nulls") {
    import graft.stats.Planners
    import spark.implicits._
    val r6 = (x: Double) => math.round(x * 1e6) / 1e6
    // d = (-2, 2, -2, 2): bias 0, var 16/3
    val df = Seq((10L, 12L), (20L, 18L), (30L, 32L), (40L, 38L))
      .toDF("m1", "m2")
    val r = Planners.blandAltman(df, "m1", "m2").head()
    assert(r.getLong(0) == 4L && r.getDouble(1) == 0.0)
    val sd = math.sqrt(16.0 / 3)
    assert(r.getDouble(2) == r6(sd))
    assert(r.getDouble(3) == r6(0.0 - 1.96 * sd))
    assert(r.getDouble(4) == r6(0.0 + 1.96 * sd))
    assert(r.getDouble(5) == 1.0)
    // an outlier difference falls outside the limits
    val out = Seq.fill(20)((100L, 99L)) ++ Seq.fill(20)((100L, 101L)) ++
      Seq((100L, 150L))
    val o = Planners.blandAltman(out.toDF("m1", "m2"), "m1", "m2").head()
    assert(o.getDouble(5) < 1.0)
    // single pair: no spread to estimate
    val one = Seq((10L, 12L)).toDF("m1", "m2")
    val s1 = Planners.blandAltman(one, "m1", "m2").head()
    assert(s1.getDouble(1) == -2.0 && s1.get(2) == null && s1.get(5) == null)
  }

  test("moodMedianTest: perfect separation gives chi2 = n; identical groups 0; k < 2 null") {
    import graft.stats.Planners
    import spark.implicits._
    // a strictly below the grand median, b strictly above -> chi2 = n
    val sep = Seq((1L, "a"), (2L, "a"), (3L, "a"),
      (7L, "b"), (8L, "b"), (9L, "b")).toDF("x", "grp")
    val r = Planners.moodMedianTest(sep, "x", "grp").head()
    assert(r.getLong(0) == 6L && r.getLong(1) == 2L && r.getLong(2) == 1L)
    assert(r.getDouble(3) == 6.0)
    // identical groups: every expected cell met exactly
    val same = Seq((1L, "a"), (9L, "a"), (1L, "b"), (9L, "b"))
      .toDF("x", "grp")
    assert(Planners.moodMedianTest(same, "x", "grp").head().getDouble(3) == 0.0)
    // one group: nothing to contrast
    val one = Seq((1L, "a"), (2L, "a"), (9L, "a")).toDF("x", "grp")
    assert(Planners.moodMedianTest(one, "x", "grp").head().get(3) == null)
  }

  test("energyDistance: hand pair-sums; identical samples 0; empty side null") {
    import graft.stats.Planners
    import spark.implicits._
    // X = {0,2}, Y = {1,3}: E|XY| = 1.5, E|XX| = E|YY| = 1 -> D = 1
    val df = Seq((0L, "a"), (2L, "a"), (1L, "b"), (3L, "b"))
      .toDF("x", "grp")
    val r = Planners.energyDistance(df, "x", "grp", "a", "b").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 1.5 && r.getDouble(3) == 1.0 &&
      r.getDouble(4) == 1.0)
    assert(r.getDouble(5) == 1.0 && r.getDouble(6) == 1.0)
    // same distribution (with ties): D exactly 0
    val same = Seq((1L, "a"), (2L, "a"), (1L, "b"), (2L, "b"))
      .toDF("x", "grp")
    assert(Planners.energyDistance(same, "x", "grp", "a", "b")
      .head().getDouble(5) == 0.0)
    // empty B: undefined
    val one = Seq((1L, "a")).toDF("x", "grp")
    assert(Planners.energyDistance(one, "x", "grp", "a", "b")
      .head().get(5) == null)
  }

  test("grubbs: max-deviation side, hand G, short input null") {
    import graft.stats.Planners
    import spark.implicits._
    val r6 = (x: Double) => math.round(x * 1e6) / 1e6
    // {10,12,14,30}: mean 16.5, var 251/3, extreme = 30 (13.5 above)
    val df = Seq(10L, 12L, 14L, 30L).map(Tuple1(_)).toDF("x")
    val r = Planners.grubbs(df, "x").head()
    assert(r.getLong(0) == 4L && r.getDouble(1) == 16.5)
    val sd = math.sqrt(251.0 / 3)
    assert(r.getDouble(2) == r6(sd))
    assert(r.getDouble(3) == r6(13.5 / sd))
    assert(r.getLong(4) == 30L)
    // low-side extreme wins when it deviates more
    val lo = Planners.grubbs(Seq(1L, 20L, 21L, 22L).map(Tuple1(_)).toDF("x"),
      "x").head()
    assert(lo.getLong(4) == 1L)
    // n < 3: statistic undefined
    assert(Planners.grubbs(Seq(1L, 2L).map(Tuple1(_)).toDF("x"), "x")
      .head().get(3) == null)
  }

  test("poissonRateTest: hand rate ratio and log-linear z; zero count nulls") {
    import graft.stats.Planners
    import spark.implicits._
    val r6 = (x: Double) => math.round(x * 1e6) / 1e6
    // a: 10 events / 100 exposure; b: 5 / 100 -> ratio 2
    val df = Seq((10L, 100L, "a"), (5L, 100L, "b")).toDF("ev", "ex", "grp")
    val r = Planners.poissonRateTest(df, "ev", "ex", "grp", "a", "b").head()
    assert(r.getLong(0) == 10L && r.getLong(1) == 5L)
    assert(r.getDouble(4) == 0.1 && r.getDouble(5) == 0.05)
    assert(r.getDouble(6) == 2.0)
    assert(r.getDouble(7) == r6(math.log(2.0) / math.sqrt(0.1 + 0.2)))
    // zero events on one side: the log form degenerates
    val z = Seq((0L, 100L, "a"), (5L, 100L, "b")).toDF("ev", "ex", "grp")
    val rz = Planners.poissonRateTest(z, "ev", "ex", "grp", "a", "b").head()
    assert(rz.getDouble(4) == 0.0 && rz.get(6) == null && rz.get(7) == null)
  }

  test("fleissKappa: perfect agreement 1, perfect disagreement -1, partial subjects drop") {
    import graft.stats.Planners
    import spark.implicits._
    // 3 subjects x 2 raters, unanimous per subject -> kappa = 1
    val perfect = Seq((1L, "A"), (1L, "A"), (2L, "B"), (2L, "B"),
      (3L, "A"), (3L, "A"))
    val p = Planners.fleissKappa(perfect.toDF("subj", "cat"),
      "subj", "cat", ratersPerSubject = 2).head()
    assert(p.getLong(0) == 3L && p.getLong(1) == 2L)
    assert(p.getDouble(2) == 1.0 && p.getDouble(4) == 1.0)
    // every subject split: P-bar 0 -> kappa = -P_e/(1-P_e) = -1 at p=1/2
    val split = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"))
    val s = Planners.fleissKappa(split.toDF("subj", "cat"),
      "subj", "cat", ratersPerSubject = 2).head()
    assert(s.getDouble(2) == 0.0 && s.getDouble(4) == -1.0)
    // a subject with the wrong rating count is excluded
    val withPartial = perfect ++ Seq((4L, "A"))
    val w = Planners.fleissKappa(withPartial.toDF("subj", "cat"),
      "subj", "cat", ratersPerSubject = 2).head()
    assert(w.getLong(0) == 3L && w.getDouble(4) == 1.0)
    // single category: chance agreement is total -> kappa null
    val mono = Seq((1L, "A"), (1L, "A"), (2L, "A"), (2L, "A"))
    assert(Planners.fleissKappa(mono.toDF("subj", "cat"),
      "subj", "cat", ratersPerSubject = 2).head().get(4) == null)
  }

  test("chapmanEstimate: hand N-hat and SE; disjoint samples keep the estimate, null the SE") {
    import graft.stats.Planners
    import spark.implicits._
    val r6 = (x: Double) => math.round(x * 1e6) / 1e6
    val s1 = Seq(1L, 2L, 3L, 4L).toDF("id")
    val s2 = Seq(3L, 4L, 5L, 6L, 7L, 8L).toDF("id")
    val r = Planners.chapmanEstimate(s1, s2).head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 6L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == r6(5.0 * 7 / 3 - 1))
    assert(r.getDouble(4) == r6(math.sqrt(5.0 * 7 * 2 * 4 / (3.0 * 3 * 4))))
    // duplicates inside a sample don't inflate the counts
    val dup = Planners.chapmanEstimate(
      Seq(1L, 1L, 2L, 3L, 4L).toDF("id"), s2).head()
    assert(dup.getLong(0) == 4L && dup.getDouble(3) == r.getDouble(3))
    // disjoint: estimate still defined, variance not
    val d = Planners.chapmanEstimate(Seq(1L, 2L).toDF("id"),
      Seq(9L, 10L).toDF("id")).head()
    assert(d.getDouble(3) == 3.0 * 3 - 1 && d.get(4) == null)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Cf, Text, Vectors}
import graft.stats.Planners

/** Distribution mining + CF: hand-computed MI, constructed Simpson flip,
  * winsorize bounds, matryoshka unit norms, JSD identities, CF cosine. */
class MiningSpec extends SparkSpec {
  import spark.implicits._

  test("mutualInfo: independent -> 0; determined -> NMI 1; constant -> null") {
    // perfectly dependent: b == a
    val dep = Seq(("x", "x"), ("y", "y"), ("x", "x"), ("y", "y"))
      .toDF("a", "b")
    val d = Planners.mutualInfo(dep, "a", "b").collect().head
    assert(math.abs(d.getAs[Double]("mi") - math.log(2.0)) < 1e-6)
    assert(math.abs(d.getAs[Double]("nmi") - 1.0) < 1e-6)
    // independent uniform 2x2: every cell n/4 -> MI 0
    val ind = (for (a <- Seq("x", "y"); b <- Seq("u", "v"); _ <- 1 to 5)
      yield (a, b)).toDF("a", "b")
    val i = Planners.mutualInfo(ind, "a", "b").collect().head
    assert(math.abs(i.getAs[Double]("mi")) < 1e-9)
    // constant column: H = 0 -> nmi null, mi 0
    val const = Seq(("x", "u"), ("x", "v")).toDF("a", "b")
    val c = Planners.mutualInfo(const, "a", "b").collect().head
    assert(c.getAs[Double]("mi") == 0.0 && c.isNullAt(c.fieldIndex("nmi")))
  }

  test("simpsonScan: constructed reversal flips every segment") {
    // within each segment y falls with x; across segments both rise
    def seg(name: String, x0: Double, y0: Double) =
      (0 to 9).map(i => (name, x0 + i, y0 - i))
    val df = (seg("a", 0, 10) ++ seg("b", 20, 100) ++ seg("c", 40, 190))
      .toDF("s", "x", "y")
    val out = Planners.simpsonScan(df, "s", "x", "y").collect()
    assert(out.length == 3)
    assert(out.forall(_.getAs[Double]("slope") == -1.0))
    assert(out.forall(_.getAs[Double]("pooled_slope") > 0))
    assert(out.forall(_.getAs[Boolean]("flipped")))
  }

  test("winsorize: bounds hold, counts preserved, interior untouched") {
    val df = ((1 to 98).map(i => ("g", i, i.toDouble)) ++
      Seq(("g", 99, 1000.0), ("g", 100, -1000.0))).toDF("g", "id", "v")
    val out = Planners.winsorize(df, Seq("g"), "v", 0.05, 0.95,
      idCols = Seq("id"))
    val rows = out.collect()
    assert(rows.length == 100)
    val ws = rows.map(_.getAs[Double]("value_w"))
    // p95 of {1..98, +-1000} sits just above 95; p05 just below 6
    assert(ws.max <= 96.0 && ws.min >= 4.0)
    assert(rows.count(_.getAs[Boolean]("clipped")) >= 2)
    // the median row is untouched
    val mid = rows.find(_.getAs[Int]("id") == 50).get
    assert(mid.getAs[Double]("value_w") == 50.0 && !mid.getAs[Boolean]("clipped"))
  }

  test("matryoshka: truncated vectors are unit L2; norm_kept in (0, 1]") {
    val df = Tables.load(spark, sf, "embeddings")
    val out = Vectors.matryoshkaNormalize(df, "vec_id", "embedding", 16)
    val norms = out.groupBy("vec_id")
      .agg(sum(col("val") * col("val")).as("ss"),
        first(col("norm_kept")).as("nk"),
        count(lit(1)).as("d")).collect()
    assert(norms.nonEmpty && norms.forall(_.getAs[Long]("d") == 16))
    norms.foreach { r =>
      assert(math.abs(r.getAs[Double]("ss") - 1.0) < 1e-3) // 6-dp rounded vals
      val nk = r.getAs[Double]("nk")
      assert(nk > 0 && nk <= 1.0 + 1e-9)
    }
  }

  test("jsDivergence: identical distributions -> 0; disjoint vocab -> ln 2") {
    val same = Seq(("a", "x y z"), ("b", "x y z"), ("a", "x y z"),
      ("b", "x y z")).toDF("src", "text")
    val s = Text.jsDivergence(same, "text", "src", minDf = 1)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("jsd")).toMap
    assert(s.values.forall(v => math.abs(v) < 1e-9))
    // two sources with disjoint vocab, equal sizes: each source's P and
    // the mix M = (P + Q)/2 give JSD = ln 2 * ... for Q = global (half
    // own terms, half other): jsd_norm must land strictly inside (0, 1)
    val disj = Seq(("a", "x x x"), ("b", "y y y")).toDF("src", "text")
    val d = Text.jsDivergence(disj, "text", "src", minDf = 1)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("jsd_norm")).toMap
    d.values.foreach(v => assert(v > 0.2 && v < 1.0))
    assert(math.abs(d("a") - d("b")) < 1e-9) // symmetric construction
  }

  test("itemCosineNeighbors: hand cosine, cap drops the bot user") {
    // u1: {1,2}, u2: {1,2}, u3: {1,3} -> n1=3, n2=2, n3=1
    // c(1,2)=2 -> cos = 2/sqrt(6); c(1,3)=1 -> 1/sqrt(3)
    val r = Seq((1, 1L), (1, 2L), (2, 1L), (2, 2L), (3, 1L), (3, 3L))
      .toDF("u", "i")
    val out = Cf.itemCosineNeighbors(r, "u", "i", k = 5).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getAs[Double]("cos")).toMap
    assert(math.abs(out((1L, 2L)) - 2.0 / math.sqrt(6)) < 1e-6)
    assert(math.abs(out((1L, 3L)) - 1.0 / math.sqrt(3)) < 1e-6)
    assert(!out.contains((2L, 3L))) // no co-occurrence
    // a bot user touching everything would connect 2 and 3; the cap
    // removes it AND its contribution to item counts
    val bot = r.union(Seq((9, 1L), (9, 2L), (9, 3L), (9, 4L)).toDF("u", "i"))
    val capped = Cf.itemCosineNeighbors(bot, "u", "i", k = 5,
      maxUserItems = 3).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getAs[Double]("cos")).toMap
    assert(capped == out)
  }

  test("cfMerge: state merge equals full recompute, incl. cap crossing and dedup") {
    // base: three normal users + u9 at 2 items (under cap 3).
    // delta: new pairs for u1 (cross-batch), a brand-new user u4, a
    // re-send of an existing (u2, 1) row (must dedup), and two more
    // items for u9 -> 4 items total, CROSSING the cap: its base
    // contribution must be retracted.
    val base = Seq((1, 1L), (1, 2L), (2, 1L), (2, 2L), (3, 1L), (3, 3L),
      (9, 1L), (9, 2L)).toDF("u", "i")
    val delta = Seq((1, 3L), (2, 1L), (4, 2L), (4, 3L), (9, 3L), (9, 4L))
      .toDF("u", "i")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getAs[Double]("cos"),
        r.getAs[Long]("rank"))).toSet
    val full = Cf.itemCosineNeighbors(base.union(delta), "u", "i",
      k = 5, maxUserItems = 3)
    val merged = Cf.cfMerge(Cf.cfFit(base, "u", "i", maxUserItems = 3),
      delta, "u", "i", maxUserItems = 3)
    assert(canon(Cf.cfTopK(merged, 5)) == canon(full))
    // sanity: the crossing really happened (u9 has 4 distinct items)
    assert(merged.ratings.filter(col("__u") === 9).count() == 4)
    // and state items exclude u9's contribution: item 4 only ever
    // touched by u9 -> absent from counts
    assert(merged.items.filter(col("__i") === 4L).isEmpty)
    // a second merge of the SAME delta is a no-op (dedup via ratings)
    val again = Cf.cfMerge(merged, delta, "u", "i", maxUserItems = 3)
    assert(canon(Cf.cfTopK(again, 5)) == canon(full))
    // touched-only re-rank agrees with the full derivation on that slice
    val touched = Seq(1L, 2L, 3L).toDF("item")
    assert(canon(Cf.cfTopK(merged, 5, Some(touched))) ==
      canon(full.filter(col("item").isin(1L, 2L, 3L))))
  }

  test("bootstrapCi: degenerate on constants, brackets the true mean, deterministic") {
    // constant column: every resample mean IS the constant
    val const = (1 to 50).map(i => (i.toLong, 7.5)).toDF("id", "v")
    val c = Planners.bootstrapCi(const, "id", "v", b = 40, seed = 1L).head()
    assert(c.getAs[Long]("n_rows") == 50)
    assert(c.getAs[Long]("b_resamples") == 40)
    assert(c.getAs[Double]("mean") == 7.5)
    assert(c.getAs[Double]("ci_lo") == 7.5 && c.getAs[Double]("ci_hi") == 7.5)
    assert(c.getAs[Double]("se_boot") == 0.0)
    // a spread sample: interval is proper, contains the sample mean,
    // and the same seed reproduces it exactly
    val spread = (1 to 400).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val s1 = Planners.bootstrapCi(spread, "id", "v", b = 60, seed = 9L).head()
    val s2 = Planners.bootstrapCi(spread, "id", "v", b = 60, seed = 9L).head()
    assert(s1 == s2)
    val (lo, hi, m) = (s1.getAs[Double]("ci_lo"), s1.getAs[Double]("ci_hi"),
      s1.getAs[Double]("mean"))
    assert(lo < m && m < hi, s"($lo, $m, $hi)")
    assert(m == 200.5)
    // CI width is in the CLT ballpark: se(mean) = sd/sqrt(n) ~ 5.78;
    // the 95% percentile interval should land within (1x, 8x) of it
    assert(hi - lo > 5.78 && hi - lo < 8 * 5.78, s"width ${hi - lo}")
    assert(s1.getAs[Double]("se_boot") > 1.0)
    // production xxhash64 draw: same invariants, same determinism
    val f1 = Planners.bootstrapCi(spread, "id", "v", b = 60, seed = 9L,
      fastHash = true).head()
    val f2 = Planners.bootstrapCi(spread, "id", "v", b = 60, seed = 9L,
      fastHash = true).head()
    assert(f1 == f2)
    assert(f1.getAs[Double]("ci_lo") < 200.5 &&
      200.5 < f1.getAs[Double]("ci_hi"))
    val fw = f1.getAs[Double]("ci_hi") - f1.getAs[Double]("ci_lo")
    assert(fw > 5.78 && fw < 8 * 5.78, s"fast width $fw")
    // dropped resamples (n = 1: each resample is a single Poisson(1)
    // draw, so ~e^-1 of them have zero weight and are filtered): the
    // order-statistic ranks must follow the SURVIVING count — ranking
    // against the declared b would null ci_hi here
    val one = Seq((1L, 3.0)).toDF("id", "v")
    val d = Planners.bootstrapCi(one, "id", "v", b = 40, seed = 5L).head()
    assert(d.getAs[Long]("b_resamples") < 40,
      s"expected drops, got ${d.getAs[Long]("b_resamples")}")
    assert(d.getAs[Long]("b_resamples") >= 20)
    assert(d.getAs[Double]("ci_lo") == 3.0 && d.getAs[Double]("ci_hi") == 3.0)
    assert(d.getAs[Double]("mean") == 3.0)
  }

  test("ebShrinkRates: small-n rates shrink to the global mean; leaderboard order flips; degenerate prior nulls out") {
    // unit rows: (key, success, trial=1). Raw rates: A 1/1, B 0/1,
    // C 5/10, D 50/100, E 9/10, F 1/10 -> m = 0.5, v = 0.164,
    // k = 0.25/0.164 - 1, alpha = beta = 0.5k ~ 0.2622
    val rows = Seq(("A", 1, 1)) ++ Seq(("B", 0, 1)) ++
      (1 to 10).map(i => ("C", if (i <= 5) 1 else 0, 1)) ++
      (1 to 100).map(i => ("D", if (i <= 50) 1 else 0, 1)) ++
      (1 to 10).map(i => ("E", if (i <= 9) 1 else 0, 1)) ++
      (1 to 10).map(i => ("F", if (i <= 1) 1 else 0, 1))
    val out = Planners.ebShrinkRates(rows.toDF("k", "s", "t"),
      Seq("k"), "s", "t").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size == 6)
    val a = out("A")
    assert(a.getAs[Double]("rate") == 1.0)
    assert(a.getAs[Double]("alpha") > 0 &&
      a.getAs[Double]("alpha") == a.getAs[Double]("beta")) // m = 0.5
    val shrunkA = a.getAs[Double]("shrunk_rate")
    assert(shrunkA > 0.5 && shrunkA < 1.0, s"A pulled inward: $shrunkA")
    // the leaderboard fix: 1/1 raw beats 9/10 raw, but shrunk it loses
    assert(shrunkA < out("E").getAs[Double]("shrunk_rate"))
    // high-n keys barely move
    assert(math.abs(out("D").getAs[Double]("shrunk_rate") - 0.5) < 0.001)
    // symmetric pair shrinks symmetrically around the mean
    assert(math.abs((shrunkA - 0.5) -
      (0.5 - out("B").getAs[Double]("shrunk_rate"))) < 1e-9)
    // degenerate prior (rates more dispersed than any Beta): v >= m(1-m)
    // -> alpha/shrunk null, raw rates intact
    val bimodal = (1 to 3).map(i => ("X", 1, 1)) ++
      (1 to 3).map(i => ("Y", 0, 1))
    val deg = Planners.ebShrinkRates(bimodal.toDF("k", "s", "t"),
      Seq("k"), "s", "t").collect().map(r => r.getString(0) -> r).toMap
    assert(deg("X").getAs[Double]("rate") == 1.0)
    assert(deg("X").isNullAt(deg("X").fieldIndex("shrunk_rate")))
    assert(deg("X").isNullAt(deg("X").fieldIndex("alpha")))
    // tight-rate population (true var ~5e-11, far below a 6-dp grid but
    // well above the 12-dp one): the prior must still FIT — a coarse
    // moment grid would round v to 0 and null the shrinkage exactly
    // where it matters most. Pre-aggregated (success, trial) rows are
    // legal input: the operator sums them per key.
    val tight = Seq(("P", 50001, 100000), ("Q", 49999, 100000),
      ("R", 50000, 100000)).toDF("k", "s", "t")
    val tr = Planners.ebShrinkRates(tight, Seq("k"), "s", "t").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(!tr("P").isNullAt(tr("P").fieldIndex("alpha")),
      "tight-rate prior must fit at the 12-dp grid")
    assert(tr("P").getAs[Double]("alpha") > 0)
  }

  test("ebShrinkRatesCorrected: noise-corrected prior shrinks HARDER on a mixed-n fixture; hand-computed; all-singleton and under-dispersed inputs null") {
    // three small-n keys (n = 4) and three large-n (n = 1000), rates
    // 0.25/0.75/0.5 in both groups: m = 0.5, v_raw = 0.05,
    // H = avg(1/n) = (3·0.25 + 3·0.001)/6. The raw variance includes
    // binomial noise m(1−m)·H ≈ 0.031, so the corrected prior variance
    // v = (0.05 − 0.25·H)/(1 − H) ≈ 0.0213 is ~2.3x smaller -> k jumps
    // from 4 to ~10.7 and every small-n key shrinks harder.
    val rows = Seq(("A", 1, 4), ("B", 3, 4), ("E", 2, 4),
      ("C", 250, 1000), ("D", 750, 1000), ("F", 500, 1000))
      .toDF("k", "s", "t")
    def grab(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> r).toMap
    val plain = grab(Planners.ebShrinkRates(rows, Seq("k"), "s", "t"))
    val corr = grab(Planners.ebShrinkRatesCorrected(rows, Seq("k"), "s", "t"))
    // hand computation with the operator's own pinned-moment op shapes
    def r12(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val m = 0.5; val vr = 0.05
    val h = r12((0.25 + 0.25 + 0.25 + 0.001 + 0.001 + 0.001) / 6)
    val vC = (vr - m * (1.0 - m) * h) / (1.0 - h)
    def ab(v: Double) = { val k = m * (1.0 - m) / v - 1.0; (m * k, (1.0 - m) * k) }
    val (aP, bP) = ab(vr); val (aC, bC) = ab(vC)
    assert(plain("A").getAs[Double]("alpha") == r6(aP) &&
      corr("A").getAs[Double]("alpha") == r6(aC),
      s"priors: plain ${plain("A").getAs[Double]("alpha")} vs ${r6(aP)}, " +
        s"corrected ${corr("A").getAs[Double]("alpha")} vs ${r6(aC)}")
    assert(aC > aP, "corrected prior must be tighter (more pseudo-counts)")
    assert(corr("A").getAs[Double]("shrunk_rate") ==
      r6((1.0 + aC) / (4.0 + aC + bC)))
    // shrinks HARDER: every small-n key lands closer to m
    for (k <- Seq("A", "B")) {
      val dP = math.abs(plain(k).getAs[Double]("shrunk_rate") - m)
      val dC = math.abs(corr(k).getAs[Double]("shrunk_rate") - m)
      assert(dC < dP, s"key $k: corrected $dC must shrink harder than $dP")
    }
    // large-n keys stay close to their own rate under both priors
    assert(math.abs(corr("D").getAs[Double]("shrunk_rate") - 0.75) < 0.01)
    // all-singleton trials: H = 1 leaves the correction undefined -> null
    val singles = Seq(("X", 1, 1), ("Y", 0, 1), ("Z", 1, 1)).toDF("k", "s", "t")
    val sOut = grab(Planners.ebShrinkRatesCorrected(singles, Seq("k"), "s", "t"))
    assert(sOut("X").isNullAt(sOut("X").fieldIndex("alpha")))
    // under-dispersed (raw variance below the noise floor -> v <= 0):
    // homogeneous keys must null the prior, not fabricate shrinkage
    val homo = Seq(("P", 2, 4), ("Q", 2, 4), ("R", 2, 4)).toDF("k", "s", "t")
    val hOut = grab(Planners.ebShrinkRatesCorrected(homo, Seq("k"), "s", "t"))
    assert(hOut("P").isNullAt(hOut("P").fieldIndex("shrunk_rate")))
  }

  test("winsorizeFitApprox: each bound lands in the sketch's rank band; serves through the same apply") {
    val ev = Tables.load(spark, sf, "events")
    val approx = Planners.winsorizeFitApprox(ev, Seq("event_type"), "value",
      pLo = 0.05, pHi = 0.95, accuracy = 10000).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val exact = Planners.winsorizeFit(ev, Seq("event_type"), "value")
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    val vals = ev.filter(col("value").isNotNull)
      .select(col("event_type"), col("value").cast("double")).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    approx.foreach { case (k, (lo, hi)) =>
      assert(lo <= hi)
      val xs = vals(k); val n = xs.length.toDouble
      // rank error: 1/accuracy from the sketch + discreteness of n
      val tol = 1.0 / 10000 + 2.0 / n
      assert(xs.count(_ < lo) / n <= 0.05 + tol, s"$k lo rank high")
      assert(xs.count(_ <= lo) / n >= 0.05 - tol, s"$k lo rank low")
      assert(xs.count(_ < hi) / n <= 0.95 + tol, s"$k hi rank high")
      assert(xs.count(_ <= hi) / n >= 0.95 - tol, s"$k hi rank low")
      // the sketch returns observed values, never interpolations
      assert(xs.contains(lo) && xs.contains(hi), s"$k not observed")
    }
    // the approx artifact serves through the SAME apply: counts kept,
    // every served value inside its group's bounds
    val served = Planners.winsorizeApply(ev,
      Planners.winsorizeFitApprox(ev, Seq("event_type"), "value"),
      Seq("event_type"), "value", Seq("event_id"))
    assert(served.count() == ev.filter(col("value").isNotNull).count())
    assert(served.filter(col("value_w") < lit(-1e12) ||
      col("value_w") > lit(1e12)).isEmpty)
  }

  test("bhFdr: hand-computed q-values, monotone, planted signals reject") {
    // classic worked example: p = .01, .02, .03, .04, .05 over n=5
    // raw = .05, .05, .05, .05, .05 -> q all .05, all reject at alpha=.05
    val even = (1 to 5).map(i => (i, i * 0.01)).toDF("id", "p")
    val out1 = Planners.bhFdr(even, "id", "p", alpha = 0.05).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out1.values.forall(_.getAs[Double]("q") == 0.05))
    assert(out1.values.forall(_.getAs[Boolean]("reject")))
    // one strong signal among uniform noise: only it survives
    val mixed = (Seq((0, 0.0001)) ++ (1 to 9).map(i => (i, 0.1 * i)))
      .toDF("id", "p")
    val out2 = Planners.bhFdr(mixed, "id", "p", alpha = 0.05).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out2(0).getAs[Boolean]("reject"))
    assert(math.abs(out2(0).getAs[Double]("q") - 0.001) < 1e-9)
    assert((1 to 9).forall(i => !out2(i).getAs[Boolean]("reject")))
    // q is monotone nondecreasing in rank and capped at 1
    val qs = out2.values.toSeq.sortBy(_.getAs[Long]("rank"))
      .map(_.getAs[Double]("q"))
    assert(qs.zip(qs.tail).forall { case (a, b) => b >= a })
    assert(qs.forall(_ <= 1.0))
  }

  test("nearestCentroid: separable clusters classify perfectly; ties break on label") {
    import graft.ops.Vectors
    // two orthogonal clusters with small within-cluster jitter
    def v(main: Int, eps: Float) = {
      val a = Array.fill(4)(0.0f); a(main) = 1.0f; a(3) = eps; a.toSeq
    }
    val train = Seq((1L, 0L, v(0, 0.1f)), (2L, 0L, v(0, -0.1f)),
      (3L, 1L, v(1, 0.1f)), (4L, 1L, v(1, -0.1f)))
      .toDF("vec_id", "label", "embedding")
    val test = Seq((10L, 0L, v(0, 0.05f)), (11L, 1L, v(1, 0.02f)))
      .toDF("vec_id", "label", "embedding")
    val out = Vectors.nearestCentroid(train, test, "vec_id", "embedding",
      "label").collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getAs[Double]("cos")))).toMap
    assert(out(10L)._1 == 0L && out(10L)._2 == 0L)
    assert(out(11L)._1 == 1L && out(11L)._2 == 1L)
    assert(out.values.forall(_._3 > 0.9))
    // a test vector equidistant from both centroids ties -> min label wins
    val mid = Seq((20L, 9L, Seq(0.5f, 0.5f, 0.0f, 0.0f)))
      .toDF("vec_id", "label", "embedding")
    val tie = Vectors.nearestCentroid(
      Seq((1L, 0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
        (2L, 1L, Seq(0.0f, 1.0f, 0.0f, 0.0f)))
        .toDF("vec_id", "label", "embedding"),
      mid, "vec_id", "embedding", "label").collect().head
    assert(tie.getLong(2) == 0L)
    // string labels would cast to null silently downstream -> rejected
    val strTrain = Seq((1L, "pos", v(0, 0.1f)))
      .toDF("vec_id", "label", "embedding")
    val err = intercept[IllegalArgumentException] {
      Vectors.nearestCentroid(strTrain,
        test.withColumn("label", lit("pos")), "vec_id", "embedding", "label")
    }
    assert(err.getMessage.contains("must be numeric"))
  }

  test("fuzzyPairsDeletes: exact same pair set as length-blocked fuzzyPairs") {
    import graft.ops.Fuzzy
    // substitutions (same length), inserts/deletes (length +-1), a
    // transposition (lev 2), unrelated values, and uniform-length ids
    // (the case where length blocking degenerates)
    val vals = Seq("alpha", "alphb", "alpa", "alphax", "beta", "ebta",
      "id0001", "id0002", "id0010", "id9999", "zzz").toDF("v")
    for (d <- Seq(1, 2)) {
      def toSet(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val want = toSet(Fuzzy.fuzzyPairs(vals, "v", d))
      val got = toSet(Fuzzy.fuzzyPairsDeletes(vals, "v", d))
      assert(got == want && want.nonEmpty, s"d=$d: $got vs $want")
    }
    // sanity: the d=1 set contains the planted substitution and insert
    val p1 = Fuzzy.fuzzyPairsDeletes(vals, "v", 1).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(p1.contains(("alpha", "alphb")) && p1.contains(("alpha", "alphax")))
    // long keys: SymSpell prefix truncation (prefixLen = 8 here) must
    // keep the pair set EXACT -- edits beyond the prefix (equal
    // prefixes -> shared self-key), inside it, and straddling the
    // boundary (insert/delete at position <= P shifts the suffix)
    val base = "abcdefghijklmnopqrst" // 20 chars, prefix cut at 8
    val longs = Seq(
      base,
      base.dropRight(1) + "x",          // substitution at position 20
      base + "zz",                      // two appends (lev 2)
      base.take(4) + "X" + base.drop(5),// substitution inside prefix
      base.take(8) + "Q" + base.drop(8),// insertion AT the boundary
      base.drop(1),                     // deletion at position 1
      "totally-unrelated-key-00").toDF("v")
    for (d <- Seq(1, 2)) {
      def toSet(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val want = toSet(Fuzzy.fuzzyPairs(longs, "v", d))
      val got = toSet(Fuzzy.fuzzyPairsDeletes(longs, "v", d, prefixLen = 8))
      assert(got == want && want.nonEmpty, s"long d=$d: $got vs $want")
    }
    // shared-prefix corpus (URL-style ids): every value shares the
    // first-window content, so FRONT buckets exceed a small maxBucket
    // and get dropped — the BACK-window keys must still carry every
    // true pair (suffix edits at d=1 and d=2, incl. length changes)
    val urls = ((0 until 30).map(i => f"https://cdn.example.com/item-$i%04d")
      ++ Seq("https://cdn.example.com/item-0000x",   // insert at end
        "https://cdn.example.com/item-9999"))         // far id, no pair
      .toDF("v")
    def toSetU(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // d=1 with maxBucket 20: every FRONT bucket (all 32 values share
    // the first window) is hot and DROPPED; the ~11-member back-window
    // buckets must still carry every true pair — the two-window rescue
    val want1 = toSetU(Fuzzy.fuzzyPairs(urls, "v", 1))
    val got1 = toSetU(Fuzzy.fuzzyPairsDeletes(urls, "v", 1,
      maxBucket = 20, prefixLen = 8))
    assert(got1 == want1 && want1.nonEmpty, s"url d=1: missing " +
      s"${(want1 -- got1).take(5)} extra ${(got1 -- want1).take(5)}")
    // d=2: ids differing at BOTH discriminating digits share only the
    // group-sized remainder key ("tem-00" x 30) — the documented
    // residual: such a corpus needs the cap above the group size (the
    // bounded full-block), at which point the pair set is exact again
    val want2 = toSetU(Fuzzy.fuzzyPairs(urls, "v", 2))
    val got2 = toSetU(Fuzzy.fuzzyPairsDeletes(urls, "v", 2,
      maxBucket = 40, prefixLen = 8))
    assert(got2 == want2 && want2.nonEmpty, s"url d=2: missing " +
      s"${(want2 -- got2).take(5)} extra ${(got2 -- want2).take(5)}")
    // and under the tight cap the result is a SUBSET (candidates only
    // drop, never appear from nowhere), still containing every pair
    // with a surviving discriminating key
    val tight2 = toSetU(Fuzzy.fuzzyPairsDeletes(urls, "v", 2,
      maxBucket = 20, prefixLen = 8))
    assert(tight2.subsetOf(want2) && tight2.nonEmpty)
    // boundary: a value of length EXACTLY prefixLen in a shared-prefix
    // corpus has no content beyond the front window — its back keys
    // (the whole value, right-aligned) must still rescue its pair with
    // a longer near-duplicate when the hot front buckets are capped
    val shortie = ((0 until 25).map(i => f"abcdefg$i%02d") // 9 chars, same 7-prefix
      ++ Seq("abcdefgh",      // length == prefixLen exactly
        "abcdefghX"))         // its d=1 partner (append)
      .toDF("v")
    val wantS = toSetU(Fuzzy.fuzzyPairs(shortie, "v", 1))
    val gotS = toSetU(Fuzzy.fuzzyPairsDeletes(shortie, "v", 1,
      maxBucket = 20, prefixLen = 8))
    assert(gotS == wantS && wantS.exists(p =>
      p._1 == "abcdefgh" && p._2 == "abcdefghX"),
      s"short-boundary: missing ${(wantS -- gotS).take(5)}")
  }

  test("fsScore: hand weights, missing fields contribute zero, classes split") {
    import graft.ops.Fuzzy
    val fields = Seq(("f1", 0.9, 0.1), ("f2", 0.8, 0.2))
    val Seq((wa1, wd1), (wa2, wd2)) = Fuzzy.fsWeights(fields)
    assert(math.abs(wa1 - math.log(9.0)) < 1e-12)
    assert(math.abs(wd1 - math.log(0.1 / 0.9)) < 1e-12)
    val pairs = Seq(
      (1, Some(true), Some(true)),   // both agree: wa1+wa2 ~ 3.58 -> match
      (2, Some(true), Some(false)),  // 2.197 - 1.386 ~ 0.81 -> possible
      (3, Some(false), Some(false)), // ~ -3.58 -> non_match
      (4, None, Some(true)))         // missing f1 -> just wa2 ~ 1.386
      .toDF("id", "f1", "f2")
    val out = Fuzzy.fsScore(pairs, fields, lower = 0.0, upper = 3.0)
      .collect().map(r => r.getInt(0) ->
        ((r.getAs[Double]("fs_weight"), r.getAs[String]("fs_class")))).toMap
    assert(math.abs(out(1)._1 - (wa1 + wa2)) < 1e-6 && out(1)._2 == "match")
    assert(out(2)._2 == "possible" && out(3)._2 == "non_match")
    assert(math.abs(out(4)._1 - wa2) < 1e-6 && out(4)._2 == "possible")
  }

  test("recommendForUsers: seen items excluded, score sums micro-cos") {
    val r = Seq((1, 1L), (1, 2L), (2, 1L), (2, 2L), (3, 1L), (3, 3L))
      .toDF("u", "i")
    val nbrs = Cf.itemCosineNeighbors(r, "u", "i", k = 5)
    val recs = Cf.recommendForUsers(r, nbrs, "u", "i", n = 3).collect()
    // u1 has {1,2}: only unseen reachable item is 3 (via 1)
    val u1 = recs.filter(_.getInt(0) == 1)
    assert(u1.length == 1 && u1.head.getLong(1) == 3L)
    assert(math.abs(u1.head.getAs[Double]("score") -
      math.round(1.0 / math.sqrt(3) * 1e6) / 1e6) < 1e-9)
    // nobody is ever recommended an item they already have
    val hist = r.collect().map(x => (x.getInt(0), x.getLong(1))).toSet
    assert(recs.forall(x => !hist.contains((x.getInt(0), x.getLong(1)))))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.ops.Experiment

/** Experimentation/causal readouts: hand-computed CUPED, SPRT stopping
  * semantics, the 2x2 DiD identity, stratified-ATT weighting. */
class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  test("cuped: theta and adjusted means match the closed form; reduction >= 0") {
    // y = 2x + arm effect + small noise-free residual => cov/var = 2 exactly.
    val rows = Seq(
      ("t", 1.0, 12.0), ("t", 2.0, 14.0), ("t", 3.0, 16.0),
      ("c", 1.0, 2.0), ("c", 2.0, 4.0), ("c", 3.0, 6.0))
    val out = Experiment.cuped(rows.toDF("arm", "pre", "post"),
      "arm", "pre", "post").collect().map(r =>
      r.getAs[String]("arm") -> r).toMap
    // Pooled: cov(x,y)=2*var(x) exactly (y-arm-offset = 2x), theta = 2.
    assert(math.abs(out("t").getAs[Double]("theta") - 2.0) < 1e-9)
    // Adjusted metric removes ALL within-arm variance here (y = 2x + c).
    assert(out("t").getAs[Double]("var_cuped") < 1e-9)
    assert(out("c").getAs[Double]("var_cuped") < 1e-9)
    assert(out("t").getAs[Double]("var_reduction") > 0.99)
    // x̄ = 2, so the adjusted mean equals the raw mean at x̄: 14 and 4.
    assert(math.abs(out("t").getAs[Double]("mean_cuped") - 14.0) < 1e-9)
    assert(math.abs(out("c").getAs[Double]("mean_cuped") - 4.0) < 1e-9)
  }

  test("sprt: stops at the first crossing, not the extremum; continue otherwise") {
    val (c1, c0) = Experiment.sprtLlrConstants(0.2, 0.8)
    val (_, hi) = Experiment.sprtBounds(0.05, 0.05)
    // All successes: llr after n obs = n*c1; first n with n*c1 >= hi.
    val nHit = Iterator.from(1).find(_ * c1 >= hi).get
    val df = (1 to 20).map(i => ("k", i, true)).toDF("key", "i", "x")
    val out = Experiment.sprt(df, Seq("key"), "i", "x",
      p0 = 0.2, p1 = 0.8).collect().head
    assert(out.getAs[String]("decision") == "accept_h1")
    assert(out.getAs[Long]("n_decision") == nHit)
    assert(out.getAs[Long]("n_total") == 20)
    // Alternating outcomes never leave the band at these params: continue,
    // reported at the final observation.
    val alt = (1 to 20).map(i => ("k", i, i % 2 == 0)).toDF("key", "i", "x")
    val cont = Experiment.sprt(alt, Seq("key"), "i", "x",
      p0 = 0.45, p1 = 0.55).collect().head
    assert(cont.getAs[String]("decision") == "continue")
    assert(cont.getAs[Long]("n_decision") == 20)
  }

  test("diffInDiff: recovers a constructed effect with parallel trends") {
    // ctrl: pre 10 post 12 (trend +2); treat: pre 20 post 27 (trend+effect).
    def cell(t: Boolean, p: Boolean, m: Double) =
      (1 to 50).map(i => (t, p, m + (i % 5) * 0.1))
    val df = (cell(true, false, 20) ++ cell(true, true, 27) ++
      cell(false, false, 10) ++ cell(false, true, 12))
      .toDF("treated", "post", "value")
    val out = Experiment.diffInDiff(df, "treated", "post", "value")
      .collect().head
    assert(math.abs(out.getAs[Double]("did") - 5.0) < 1e-9)
    assert(out.getAs[Long]("n_treat_pre") == 50)
    // Identical within-cell spreads => se > 0 and t enormous.
    assert(out.getAs[Double]("se") > 0)
    assert(out.getAs[Double]("t_stat") > 100)
  }

  test("srmCheck: hand chi2; balanced allocation passes, skewed flags") {
    // 60/40 observed vs declared 50/50: e = 50 each,
    // chi2 = (60-50)^2/50 + (40-50)^2/50 = 4
    val df = ((1 to 60).map(_ => "a") ++ (1 to 40).map(_ => "b")).toDF("arm")
    val out = Experiment.srmCheck(df, "arm", Seq("a" -> 0.5, "b" -> 0.5))
      .collect().map(r => r.getAs[String]("arm") -> r).toMap
    assert(out("a").getAs[Long]("n_obs") == 60)
    assert(out("a").getAs[Double]("expected") == 50.0)
    assert(out.values.forall(_.getAs[Double]("chi2") == 4.0))
    assert(out.values.forall(_.getAs[Long]("dof") == 1L))
    // declared 60/40 matches observed exactly: chi2 = 0
    val ok = Experiment.srmCheck(df, "arm", Seq("a" -> 0.6, "b" -> 0.4))
      .collect()
    assert(ok.forall(_.getAs[Double]("chi2") == 0.0))
    // undeclared arms are ignored by the chi2
    val extra = df.union(Seq("zzz").toDF("arm"))
    assert(Experiment.srmCheck(extra, "arm", Seq("a" -> 0.6, "b" -> 0.4))
      .collect().forall(_.getAs[Double]("chi2") == 0.0))
    // a declared arm with ZERO observed rows (the worst SRM: an arm that
    // logs nothing) still emits its row and its full (0-e)^2/e term:
    // 100 obs all in 'a', declared 50/50 -> e = 50 each,
    // chi2 = (100-50)^2/50 + (0-50)^2/50 = 100
    val oneArm = (1 to 100).map(_ => "a").toDF("arm")
    val ghost = Experiment.srmCheck(oneArm, "arm", Seq("a" -> 0.5, "b" -> 0.5))
      .collect().map(r => r.getAs[String]("arm") -> r).toMap
    assert(ghost.size == 2)
    assert(ghost("b").getAs[Long]("n_obs") == 0L)
    assert(ghost("b").getAs[Double]("ratio_obs") == 0.0)
    assert(ghost.values.forall(_.getAs[Double]("chi2") == 100.0))
    // ZERO observed rows total (mislabeled arms / empty slice): chi2
    // must be NULL, never NaN — NaN silently passes `chi2 > critical`
    val wrongLabels = Seq("Treatment", "Control").toDF("arm")
    val none = Experiment.srmCheck(wrongLabels, "arm",
      Seq("a" -> 0.5, "b" -> 0.5)).collect()
    assert(none.length == 2)
    none.foreach { r =>
      assert(r.getAs[Long]("n_obs") == 0L)
      assert(r.isNullAt(r.fieldIndex("chi2")), "chi2 must be null, not NaN")
      assert(r.isNullAt(r.fieldIndex("ratio_obs")))
    }
    // duplicate declared arm names would double-count that arm's rows
    // in n_obs and the chi2 term — rejected up front
    intercept[IllegalArgumentException] {
      Experiment.srmCheck(df, "arm", Seq("a" -> 0.3, "a" -> 0.2, "b" -> 0.5))
    }
  }

  test("upliftCurve: a perfect targeting score front-loads all the uplift") {
    // units 1..100 by score desc; treated responds ONLY in the top 20.
    val rows = (1 to 100).flatMap { i =>
      val resp = if (i <= 20) 1L else 0L
      Seq((i, 1000 - i, true, resp), (i + 1000, 1000 - i, false, 0L))
    }
    val df = rows.toDF("id", "score", "treated", "y")
    val out = Experiment.upliftCurve(df, "score", "treated", "y",
      buckets = 10, tiebreak = Seq("id")).collect()
      .map(r => r.getAs[Long]("bucket") -> r).toMap
    assert(out.size == 10)
    // bucket 1 = top 10% (20 units, 10 treated, all respond): uplift 1.0
    assert(out(1L).getAs[Double]("uplift") == 1.0)
    assert(out(1L).getAs[Double]("qini") == 10.0)
    // full depth: 20 responders over 100 treated, control 0: uplift 0.2
    assert(out(10L).getAs[Double]("uplift") == 0.2)
    assert(out(10L).getAs[Double]("qini") == 20.0)
    // qini is monotone nondecreasing for this construction
    val qs = (1L to 10L).map(out(_).getAs[Double]("qini"))
    assert(qs.zip(qs.tail).forall { case (a, b) => b >= a })
  }

  test("upliftCurve: an all-treated prefix reports 0 control response, not null") {
    // top half all treated, bottom half all control -> early buckets have
    // zero control units; cumulative control response must be 0 (the
    // oracle's SUM(CASE ... ELSE 0 END)), never null, and uplift stays
    // null until both arms appear.
    val rows = (1 to 40).map(i => (i, 100 - i, i <= 20, 1L))
    val out = Experiment.upliftCurve(rows.toDF("id", "score", "treated", "y"),
      "score", "treated", "y", buckets = 4, tiebreak = Seq("id")).collect()
      .map(r => r.getAs[Long]("bucket") -> r).toMap
    assert(out(1L).getAs[Double]("resp_ctrl_cum") == 0.0)
    assert(!out(1L).isNullAt(out(1L).fieldIndex("resp_ctrl_cum")))
    assert(out(1L).isNullAt(out(1L).fieldIndex("uplift")))
    assert(out(4L).getAs[Double]("resp_treat_cum") == 20.0)
    assert(out(4L).getAs[Double]("resp_ctrl_cum") == 20.0)
    assert(out(4L).getAs[Double]("uplift") == 0.0)
  }

  test("zQuantile: Acklam inverse normal hits the textbook quantiles") {
    assert(math.abs(Experiment.zQuantile(0.975) - 1.959963984540054) < 1e-8)
    assert(math.abs(Experiment.zQuantile(0.8) - 0.8416212335729143) < 1e-8)
    assert(Experiment.zQuantile(0.5) == 0.0)
    // symmetry, including through the tail branches
    assert(math.abs(Experiment.zQuantile(0.2) +
      Experiment.zQuantile(0.8)) < 1e-9)
    assert(math.abs(Experiment.zQuantile(0.001) +
      Experiment.zQuantile(0.999)) < 1e-8)
  }

  test("mdeReadout: closed-form MDE and required n from hand variances") {
    // treat {10,12}: mean 11, var 2; ctrl {10,14}: mean 12, var 8
    val df = Seq(("t", 10.0), ("t", 12.0), ("c", 10.0), ("c", 14.0))
      .toDF("arm", "v")
    val out = Experiment.mdeReadout(df, "arm", "v", "t", "c",
      alpha = 0.05, power = 0.8, targetRelEffect = 0.02).collect().head
    val zs = Experiment.zQuantile(0.975) + Experiment.zQuantile(0.8)
    assert(out.getAs[Long]("n_treat") == 2 && out.getAs[Long]("n_ctrl") == 2)
    assert(out.getAs[Double]("mean_ctrl") == 12.0)
    assert(out.getAs[Double]("var_treat") == 2.0)
    assert(out.getAs[Double]("var_ctrl") == 8.0)
    val mde = zs * math.sqrt(2.0 / 2 + 8.0 / 2)
    assert(math.abs(out.getAs[Double]("mde_abs") - mde) < 1e-6)
    assert(math.abs(out.getAs[Double]("mde_rel") - mde / 12.0) < 1e-6)
    assert(out.getAs[Long]("n_required_per_arm") ==
      math.ceil(zs * zs * 10.0 / math.pow(0.02 * 12.0, 2)).toLong)
  }

  test("ipwAte: hand Hajek weights, Kish ESS, clipping binds extreme propensities") {
    // treated (y, e): (3, .5) w=2, (1, .25) w=4 -> mu_t = 10/6
    // control (y, e): (1, .5) w=2, (2, .75) w=4 -> mu_c = 10/6 -> ate 0
    val df = Seq((true, 3.0, 0.5), (true, 1.0, 0.25),
      (false, 1.0, 0.5), (false, 2.0, 0.75)).toDF("t", "y", "e")
    val out = Experiment.ipwAte(df, "t", "y", "e").collect().head
    assert(out.getAs[Long]("n") == 4)
    assert(math.abs(out.getAs[Double]("mu_treat") - 10.0 / 6) < 1e-6)
    assert(math.abs(out.getAs[Double]("mu_ctrl") - 10.0 / 6) < 1e-6)
    assert(out.getAs[Double]("ate") == 0.0)
    // ESS = (2+4)^2 / (4+16) = 1.8 on both arms
    assert(out.getAs[Double]("ess_treat") == 1.8)
    assert(out.getAs[Double]("ess_ctrl") == 1.8)
    // a degenerate e = 0.001 clips to clipLo: the weight is bounded at
    // 1/0.05 = 20, so the unit cannot dominate the arm
    val ext = df.union(Seq((true, 100.0, 0.001)).toDF("t", "y", "e"))
    val clipped = Experiment.ipwAte(ext, "t", "y", "e").collect().head
    // with clipping mu_t = (2*3 + 4*1 + 20*100) / 26 = 2010/26
    assert(math.abs(clipped.getAs[Double]("mu_treat") - 2010.0 / 26) < 1e-6)
  }

  test("aipwAte: perfect outcome model zeroes the correction; zero model reduces to HT") {
    // perfect mu: psi = mu1 - mu0 exactly, per row, regardless of e
    val perfect = Seq((true, 5.0, 0.3, 5.0, 2.0), (true, 5.0, 0.8, 5.0, 2.0),
      (false, 2.0, 0.4, 5.0, 2.0), (false, 2.0, 0.6, 5.0, 2.0))
      .toDF("t", "y", "e", "m1", "m0")
    val p = Experiment.aipwAte(perfect, "t", "y", "e", "m1", "m0")
      .collect().head
    assert(p.getAs[Double]("ate") == 3.0)
    assert(p.getAs[Double]("mu_treat") == 5.0)
    assert(p.getAs[Double]("mu_ctrl") == 2.0)
    assert(p.getAs[Double]("se") == 0.0)
    assert(p.isNullAt(p.fieldIndex("t_stat"))) // sd = 0 -> no t
    // zero outcome model: AIPW = unnormalized Horvitz-Thompson
    val ht = Seq((true, 3.0, 0.5, 0.0, 0.0), (false, 1.0, 0.5, 0.0, 0.0))
      .toDF("t", "y", "e", "m1", "m0")
    val h = Experiment.aipwAte(ht, "t", "y", "e", "m1", "m0").collect().head
    assert(h.getAs[Double]("mu_treat") == 3.0) // (3/.5 + 0)/2
    assert(h.getAs[Double]("mu_ctrl") == 1.0)  // (0 + 1/.5)/2
    assert(h.getAs[Double]("ate") == 2.0)
  }

  test("replayEval: greedy policy, only matched rows score, unseen ctx never matches") {
    val fit = Seq(("A", 0L, 1.0), ("A", 0L, 1.0), ("A", 1L, 2.0))
      .toDF("ctx", "armL", "v")
    val pol = Experiment.greedyPolicy(fit, "ctx", "armL", "v")
      .collect().map(r => r.getAs[String]("ctx") ->
        ((r.getAs[Long]("arm"), r.getAs[Double]("mean_reward")))).toMap
    assert(pol("A") == ((1L, 2.0))) // higher mean wins over more rows
    val eval = Seq(("A", 1L, 5.0), ("A", 0L, 1.0), ("B", 0L, 3.0))
      .toDF("ctx", "armL", "v")
    val out = Experiment.replayEval(eval, "ctx", "armL", "v",
      Experiment.greedyPolicy(fit, "ctx", "armL", "v")).collect().head
    assert(out.getAs[Long]("n_logged") == 3)
    assert(out.getAs[Long]("n_matched") == 1)
    assert(out.getAs[Double]("match_rate") == 0.333333) // half-up int grid
    assert(out.getAs[Double]("reward_policy") == 5.0)
    assert(out.getAs[Double]("reward_logged") == 3.0)
    // tiebreak: equal means -> min arm
    val tie = Seq(("C", 3L, 1.0), ("C", 1L, 1.0)).toDF("ctx", "armL", "v")
    assert(Experiment.greedyPolicy(tie, "ctx", "armL", "v")
      .collect().head.getAs[Long]("arm") == 1L)
  }

  test("drReplay: zero model reduces to clipped IPS (= replayEval under constant p); perfect model kills the correction; uncovered ctx dropped") {
    val fit = Seq(("A", 0L, 1.0), ("A", 1L, 2.0), ("B", 0L, 4.0),
      ("B", 1L, 1.0)).toDF("ctx", "armL", "v")
    val policy = Experiment.greedyPolicy(fit, "ctx", "armL", "v") // A→1, B→0
    val logs = Seq(
      ("A", 1L, 5.0, 0.5), ("A", 0L, 1.0, 0.5),
      ("B", 0L, 3.0, 0.5), ("B", 1L, 2.0, 0.5))
      .toDF("ctx", "armL", "v", "p")
    // μ̂ ≡ 0 (empty model): ψ = 1{hit}·r/p — pure clipped IPS; with
    // constant p = n_matched/n_logged this equals replayEval's
    // matched-mean exactly (the Dudík et al. special case)
    val empty = Seq.empty[(String, Long, Double)].toDF("ctx", "arm", "mu")
    val ips = Experiment.drReplay(logs, "ctx", "armL", "v", "p",
      policy, empty).collect().head
    assert(ips.getAs[Long]("n_logged") == 4 &&
      ips.getAs[Long]("n_matched") == 2)
    assert(ips.getAs[Double]("match_rate") == 0.5)
    assert(ips.getAs[Double]("value_model") == 0.0)
    assert(ips.getAs[Double]("value_dr") == 4.0) // mean(10, 0, 6, 0)
    val re = Experiment.replayEval(logs, "ctx", "armL", "v", policy)
      .collect().head
    assert(re.getAs[Double]("reward_policy") == 4.0)
    // perfect model (μ̂ = the realized reward at every logged cell):
    // matched corrections vanish, value_dr = value_model = mean μ̂(π)
    val model = Seq(("A", 0L, 1.0), ("A", 1L, 5.0), ("B", 0L, 3.0),
      ("B", 1L, 2.0)).toDF("ctx", "arm", "mu")
    val pm = Experiment.drReplay(logs, "ctx", "armL", "v", "p",
      policy, model).collect().head
    assert(pm.getAs[Double]("value_model") == 4.0) // mean(5, 5, 3, 3)
    assert(pm.getAs[Double]("value_dr") == 4.0)
    // a ctx the policy does not cover is dropped (the estimand is the
    // policy's value over covered contexts)
    val logs2 = logs.unionByName(
      Seq(("C", 0L, 9.0, 0.5)).toDF("ctx", "armL", "v", "p"))
    assert(Experiment.drReplay(logs2, "ctx", "armL", "v", "p",
      policy, model).collect().head.getAs[Long]("n_logged") == 4)
    // positivity clip: p = 0.001 floors at clipLo = 0.01
    val tiny = Seq(("A", 1L, 1.0, 0.001)).toDF("ctx", "armL", "v", "p")
    assert(Experiment.drReplay(tiny, "ctx", "armL", "v", "p",
      policy, empty).collect().head.getAs[Double]("value_dr") == 100.0)
  }

  test("msprt: always-valid mixture test crosses at the hand-computed step; null data never rejects (p = 1)") {
    // sigma = tau = 5, mu0 = 50. Key A observes 60s: S_n = 10n, so
    // lnL_n = ½ln(1/(1+n)) + 2n²/(1+n) — 2.1174 at n=2 (< ln 20 =
    // 2.9957), 3.8069 at n=3 (crossing). Key B sits exactly on the
    // null: S = 0, lnL < 0 for all n, running max = ½ln(½) -> p = 1.
    val rows = Seq(
      ("A", 1L, 60.0), ("A", 2L, 60.0), ("A", 3L, 60.0),
      ("A", 4L, 60.0), ("A", 5L, 60.0),
      ("B", 1L, 50.0), ("B", 2L, 50.0), ("B", 3L, 50.0), ("B", 4L, 50.0))
      .toDF("k", "t", "v")
    val out = Experiment.msprt(rows, Seq("k"), "t", "v",
      mu0 = 50.0, sigma = 5.0, tau = 5.0, alpha = 0.05).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("A")
    assert(a.getAs[String]("decision") == "reject")
    assert(a.getAs[Long]("n_total") == 5)
    assert(a.getAs[Long]("n_decision") == 3, "first crossing, not the max")
    val expected = BigDecimal(4.5 - 0.5 * math.log(4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(a.getAs[Double]("log_lambda") == expected)
    assert(a.getAs[Double]("p_always_valid") < 0.05)
    val b = out("B")
    assert(b.getAs[String]("decision") == "continue")
    assert(b.getAs[Long]("n_decision") == 4)
    assert(b.getAs[Double]("p_always_valid") == 1.0)
  }

  test("srmSequential: equals msprt on the per-arm indicator; balanced ramp continues, flipped ramp rejects in-flight") {
    import org.apache.spark.sql.functions.{col, lit, when}
    // 40 alternating rows (perfect 50/50), then 60 rows of pure 'a' —
    // the mid-stream ramp bug a fixed-horizon check only sees at the end
    val rows = (1 to 100).map(i =>
      (if (i <= 40) (if (i % 2 == 0) "a" else "b") else "a", i.toLong))
      .toDF("arm", "t")
    val out = Experiment.srmSequential(rows, "arm", "t",
        Seq("a" -> 0.5, "b" -> 0.5), tau = 0.5, alpha = 0.05,
        tiebreak = Seq("t")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size == 2)
    assert(out("a").getAs[String]("decision") == "reject" &&
      out("b").getAs[String]("decision") == "reject",
      s"both monitors must alarm on the flip: $out")
    val nDec = out("a").getAs[Long]("n_decision")
    assert(nDec > 40 && nDec < 100,
      s"must cross after the flip, before the horizon: $nDec")
    assert(out("a").getAs[Double]("share") == 0.5)
    // composition contract: the arm-a monitor IS msprt on the indicator
    // with mu0 = q, sigma^2 = q(1-q)
    val viaMsprt = Experiment.msprt(
      rows.withColumn("x", when(col("arm") === "a", 1.0).otherwise(0.0))
        .withColumn("k", lit("a")),
      Seq("k"), "t", "x", mu0 = 0.5, sigma = 0.5, tau = 0.5,
      alpha = 0.05, tiebreak = Seq("t")).collect().head
    assert(viaMsprt.getAs[Long]("n_decision") == nDec &&
      viaMsprt.getAs[Double]("log_lambda") ==
        out("a").getAs[Double]("log_lambda"),
      s"srmSequential(a) $out vs msprt-on-indicator $viaMsprt")
    // a ramp that matches its declaration never alarms
    val ok = Experiment.srmSequential(rows.filter(col("t") <= 40),
        "arm", "t", Seq("a" -> 0.5, "b" -> 0.5), tau = 0.5,
        tiebreak = Seq("t")).collect()
    assert(ok.forall(_.getAs[String]("decision") == "continue"), ok.toSeq.toString)
    // undeclared arms are ignored (the srmCheck contract)
    val extra = rows.unionByName(Seq(("ghost", 101L)).toDF("arm", "t"))
    assert(Experiment.srmSequential(extra, "arm", "t",
        Seq("a" -> 0.5, "b" -> 0.5), tau = 0.5, tiebreak = Seq("t"))
      .collect().map(_.getAs[Long]("n_total")).forall(_ == 100L))
    intercept[IllegalArgumentException] {
      Experiment.srmSequential(rows, "arm", "t",
        Seq("a" -> 0.5, "a" -> 0.5), tau = 0.5)
    }
  }

  test("cmhTest: hand-computed stratified 2x2; single-subject strata are harmless") {
    // S1 cells (3,1;1,3): E = 2, V = 256/448, a−E = 1, OR terms 1.125/0.125
    // S2 cells (2,2;2,2): E = 2, V = 256/448, a−E = 0, OR terms 0.5/0.5
    // -> chi2 = 1 / (2·256/448) = 0.875; OR_MH = 1.625/0.625 = 2.6
    def cell(s: String, tr: Boolean, y: Boolean, k: Int) =
      Seq.fill(k)((s, tr, y))
    val rows = (cell("s1", true, true, 3) ++ cell("s1", true, false, 1) ++
      cell("s1", false, true, 1) ++ cell("s1", false, false, 3) ++
      cell("s2", true, true, 2) ++ cell("s2", true, false, 2) ++
      cell("s2", false, true, 2) ++ cell("s2", false, false, 2))
      .toDF("s", "tr", "y")
    val r = Experiment.cmhTest(rows, "s", "tr", "y").collect().head
    assert(r.getAs[Long]("n_strata") == 2 && r.getAs[Long]("sum_a") == 5)
    assert(r.getAs[Double]("sum_e") == 4.0)
    assert(r.getAs[Double]("variance") == 1.142857)
    assert(r.getAs[Double]("chi2") == 0.875, s"hand chi2: $r")
    assert(r.getAs[Double]("or_mh") == 2.6, s"hand OR_MH: $r")
    // a single-subject stratum contributes a − E = 0 and no variance
    val plus = rows.unionByName(Seq(("s3", true, true)).toDF("s", "tr", "y"))
    val r2 = Experiment.cmhTest(plus, "s", "tr", "y").collect().head
    assert(r2.getAs[Long]("n_strata") == 3 && r2.getAs[Long]("sum_a") == 6)
    assert(r2.getAs[Double]("sum_e") == 5.0 &&
      r2.getAs[Double]("chi2") == 0.875, s"T=1 stratum must be inert: $r2")
  }

  test("didEventStudy: per-period contrasts normalize to the base; base emits 0 with null se") {
    // cells (mean, var = 2 each, n = 2): T,w0 10; C,w0 5; T,w1 20; C,w1 7
    // -> effect_w1 = (20-7) - (10-5) = 8; se = sqrt(4*2/2) = 2; t = 4
    val rows = Seq(
      (true, "w0", 9.0), (true, "w0", 11.0),
      (false, "w0", 4.0), (false, "w0", 6.0),
      (true, "w1", 19.0), (true, "w1", 21.0),
      (false, "w1", 6.0), (false, "w1", 8.0))
      .toDF("treated", "period", "y")
    val out = Experiment.didEventStudy(rows, "treated", "period", "y", "w0")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.size == 2)
    val b = out("w0")
    assert(b.getAs[Double]("effect") == 0.0 &&
      b.isNullAt(b.fieldIndex("se")) && b.isNullAt(b.fieldIndex("t_stat")),
      s"base is normalized, not estimated: $b")
    val w1 = out("w1")
    assert(w1.getAs[Double]("effect") == 8.0 &&
      w1.getAs[Double]("se") == 2.0 && w1.getAs[Double]("t_stat") == 4.0,
      s"hand DiD cells: $w1")
    assert(w1.getAs[Long]("n_treat") == 2 && w1.getAs[Long]("n_ctrl") == 2)
  }

  test("deltaMethodRatio: hand-computed cluster variances; event-grain rows never count as units") {
    // treatment clusters: t1 sums (6, 2), t2 (2, 1) -> R_t = 8/3,
    // Var_t = (8 - 2·(8/3)·2 + (8/3)²·0.5) / (2·1.5²) = (8/9)/4.5;
    // control: c1 (1, 1), c2 (3, 2) -> R_c = 4/3, Var_c = (2/9)/4.5
    val rows = Seq(
      ("t", "t1", 2.0, 1L), ("t", "t1", 4.0, 1L), ("t", "t2", 2.0, 1L),
      ("c", "c1", 1.0, 1L), ("c", "c2", 3.0, 1L), ("c", "c2", 0.0, 1L))
      .toDF("arm", "u", "x", "y")
    val r = Experiment.deltaMethodRatio(rows, "arm", Seq("u"),
      "x", "y", treatArm = "t", ctrlArm = "c").collect().head
    assert(r.getAs[Long]("n_treat") == 2 && r.getAs[Long]("n_ctrl") == 2)
    assert(r.getAs[Double]("r_treat") == 2.666667)
    assert(r.getAs[Double]("r_ctrl") == 1.333333)
    assert(r.getAs[Double]("diff") == 1.333333)
    val seExp = math.sqrt(8.0 / 9 / 4.5 + 2.0 / 9 / 4.5)
    assert(math.abs(r.getAs[Double]("se") - seExp) < 1e-6,
      s"se ${r.getAs[Double]("se")} vs $seExp")
    assert(math.abs(r.getAs[Double]("z_stat") -
      (4.0 / 3) / seExp) < 1e-5)
    // one cluster on a side -> variance undefined -> null se/z
    val thin = rows.filter(col("u") =!= "t2")
    val rt = Experiment.deltaMethodRatio(thin, "arm", Seq("u"),
      "x", "y", "t", "c").collect().head
    assert(rt.isNullAt(rt.fieldIndex("se")))
    assert(!rt.isNullAt(rt.fieldIndex("r_treat"))) // ratio still reported
    // constant x/y ratio in every cluster: true variance is 0 and the
    // quadratic form can cancel an ulp below zero — the clamp keeps
    // sqrt() real (se >= 0, never NaN)
    val const = Seq(
      ("t", "t1", 1.0, 2L), ("t", "t1", 2.0, 4L), ("t", "t2", 3.0, 6L),
      ("c", "c1", 0.5, 1L), ("c", "c2", 1.0, 2L))
      .toDF("arm", "u", "x", "y")
    val rcn = Experiment.deltaMethodRatio(const, "arm", Seq("u"),
      "x", "y", "t", "c").collect().head
    assert(rcn.getAs[Double]("diff") == 0.0)
    val seC = rcn.getAs[Double]("se")
    assert(!seC.isNaN && seC >= 0.0, s"clamped se, got $seC")
  }

  test("regressionDiscontinuity: exact lines recover intercepts/slopes; jump = effect; thin sides null out") {
    // left: y = 10 + 1·x on x ∈ {-3,-2,-1}; right: y = 20 + 2·x on
    // x ∈ {0,1,2} — perfect fits, so the intercept jump is exactly 10
    // and the homoskedastic se collapses to 0 (t_stat null, not ∞)
    val pts = Seq((-3.0, 7.0), (-2.0, 8.0), (-1.0, 9.0),
      (0.0, 20.0), (1.0, 22.0), (2.0, 24.0)).toDF("x", "y")
    val r = Experiment.regressionDiscontinuity(pts, "x", "y",
      cutoff = 0.0, bandwidth = 5.0).collect().head
    assert(r.getAs[Long]("n_left") == 3 && r.getAs[Long]("n_right") == 3)
    assert(r.getAs[Double]("int_left") == 10.0)
    assert(r.getAs[Double]("slope_left") == 1.0)
    assert(r.getAs[Double]("int_right") == 20.0)
    assert(r.getAs[Double]("slope_right") == 2.0)
    assert(r.getAs[Double]("effect") == 10.0)
    assert(r.getAs[Double]("se") == 0.0)
    assert(r.isNullAt(r.fieldIndex("t_stat")))
    // noise on one side -> a real se and t
    val noisy = pts.unionByName(Seq((-2.5, 9.0)).toDF("x", "y"))
    val rn = Experiment.regressionDiscontinuity(noisy, "x", "y",
      cutoff = 0.0, bandwidth = 5.0).collect().head
    assert(rn.getAs[Double]("se") > 0)
    assert(!rn.isNullAt(rn.fieldIndex("t_stat")))
    // a side with < 3 points is underdetermined: fit columns null
    val thin = Seq((-1.0, 1.0), (-2.0, 2.0), (0.0, 5.0), (1.0, 6.0),
      (2.0, 7.0)).toDF("x", "y")
    val rt = Experiment.regressionDiscontinuity(thin, "x", "y",
      cutoff = 0.0, bandwidth = 5.0).collect().head
    assert(rt.isNullAt(rt.fieldIndex("int_left")))
    assert(rt.isNullAt(rt.fieldIndex("effect")))
    // bandwidth filters: far points don't enter the risk sums
    val far = pts.unionByName(Seq((100.0, 999.0)).toDF("x", "y"))
    assert(Experiment.regressionDiscontinuity(far, "x", "y",
      cutoff = 0.0, bandwidth = 5.0).collect().head
      .getAs[Long]("n_right") == 3)
    // razor-thin x-variance on one side: sxxC can round to <= 0 while
    // den > 0 — the guard must emit null se, never Inf/NaN
    val razor = Seq((1.0, 5.0), (1.0 + 1e-12, 6.0), (1.0 - 1e-12, 7.0),
      (-1.0, 1.0), (-2.0, 2.0), (-3.0, 3.0)).toDF("x", "y")
    val rz = Experiment.regressionDiscontinuity(razor, "x", "y",
      cutoff = 0.0, bandwidth = 5.0).collect().head
    if (!rz.isNullAt(rz.fieldIndex("se"))) {
      val s = rz.getAs[Double]("se")
      assert(!s.isNaN && !s.isInfinity, s"se must be finite or null: $s")
    }
  }

  test("attStrata: ATT weights per-stratum contrasts by treated count") {
    // Stratum structure by score; within-stratum lift = 1.0 in low,
    // 3.0 in high; treated counts 1 vs 3 => ATT = (1*1 + 3*3)/4 = 2.5.
    val rows = Seq(
      // low-score stratum (ntile(2) over 8 rows -> first 4): 1 treated, 3 ctrl
      (1, 0.1, true, 11.0), (2, 0.2, false, 10.0), (3, 0.3, false, 10.0),
      (8, 0.35, false, 10.0),
      // high-score stratum: 3 treated, 1 ctrl
      (4, 0.7, true, 23.0), (5, 0.8, true, 23.0), (6, 0.9, true, 23.0),
      (7, 0.95, false, 20.0))
    val df = rows.toDF("id", "score", "treated", "y")
    val out = Experiment.attStrata(df, "score", "treated", "y",
      strata = 2, tiebreak = Seq("id")).collect()
    assert(out.length == 2)
    val att = out.head.getAs[Double]("att")
    assert(math.abs(att - 2.5) < 1e-6)
    assert(out.forall(r => math.abs(r.getAs[Double]("att") - att) < 1e-12))
  }

  test("ivWald: hand-computed LATE and delta-method SE; zero first stage nulls") {
    val r6 = (x: Double) => math.round(x * 1e6) / 1e6
    // z=1: (x,y) = (1,10),(1,12),(0,5),(0,7) -> mx1=.5, my1=8.5
    // z=0: (1,9),(0,6),(0,4),(0,5)          -> mx0=.25, my0=6
    // itt_y=2.5 itt_x=.25 late=10
    val df = Seq(
      (true, 1.0, 10.0), (true, 1.0, 12.0), (true, 0.0, 5.0),
      (true, 0.0, 7.0),
      (false, 1.0, 9.0), (false, 0.0, 6.0), (false, 0.0, 4.0),
      (false, 0.0, 5.0)).toDF("z", "x", "y")
    val r = Experiment.ivWald(df, "z", "x", "y").head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == 2.5 && r.getDouble(3) == 0.25)
    assert(r.getDouble(4) == 10.0)
    // per-arm sample (co)variances: vy1=29/3 vy0=14/3 vx1=1/3 vx0=1/4
    // c1=5/3 c0=1; var(A)+late^2 var(B)-2 late cov(A,B), all over n=4
    val varA = (29.0 / 3 + 14.0 / 3) / 4
    val varB = (1.0 / 3 + 0.25) / 4
    val covAB = (5.0 / 3 + 1.0) / 4
    val se = math.sqrt(varA + 100 * varB - 20 * covAB) / 0.25
    assert(r.getDouble(5) == r6(se))
    assert(r.getDouble(6) == r6(10.0 / se))
    // instrument that moves nobody (identical x distributions by arm):
    // no first stage -> late/se/z null, ITTs still reported
    val flat = Seq((true, 1.0, 10.0), (true, 0.0, 5.0),
      (false, 1.0, 8.0), (false, 0.0, 3.0)).toDF("z", "x", "y")
    val f = Experiment.ivWald(flat, "z", "x", "y").head()
    assert(f.getDouble(3) == 0.0 && f.get(4) == null && f.get(6) == null)
    assert(f.getDouble(2) == 2.0)
  }
}

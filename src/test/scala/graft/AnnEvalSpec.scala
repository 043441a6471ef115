package graft

/** Invariants of the ANN quality-vs-cost report (`q_ann_recall_variants`):
  * the recall of every shipped index family is MEASURED against
  * brute-force truth in one table. */
class AnnEvalSpec extends SparkSpec {

  test("annRecallReport: full variant coverage, brute truth scores 1.0, metrics bounded") {
    val rows = SparkEntry.queries("q_ann_recall_variants")(spark, sf).collect()
    val byV = rows.map(r => r.getString(0) ->
      ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(byV.keySet == Set("brute", "lsh", "sq8", "pq_adc",
      "ivfpq_residual", "binary_rerank", "trunc32", "trunc16", "whitened"),
      s"report must cover every shipped index family, got ${byV.keySet}")
    // truth against itself is perfect — the harness's self-check
    assert(byV("brute") == ((20L, 1.0, 1.0, 1.0)))
    byV.foreach { case (v, (n, recall, mrr, ndcg)) =>
      assert(n == 20L, s"$v: every query must be graded")
      assert(recall >= 0.0 && recall <= 1.0, s"$v recall out of bounds: $recall")
      assert(mrr >= 0.0 && mrr <= 1.0, s"$v mrr out of bounds: $mrr")
      assert(ndcg >= 0.0 && ndcg <= 1.0, s"$v ndcg out of bounds: $ndcg")
      // every approximate family must beat the zero floor on this fixture
      assert(recall > 0.0, s"$v: zero recall means the index is broken")
    }
    // NOTE deliberately no cross-variant ordering or absolute-recall
    // bounds beyond the zero floor: the report EXISTS to measure the
    // quality-vs-cost frontier (at sf0.001 the 64-bit binary code
    // measures recall@3 = 0.4 — real quantization loss on a tiny
    // fixture, not a bug), and pinning today's numbers would turn a
    // measurement into an assertion.
  }

  test("ZCA whitening: whitened sample covariance is identity; shape and schema preserved") {
    import graft.ops.Vectors
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val fit = Vectors.whitenFit(e, "embedding")
    assert(fit.dim == 64)
    val w = Vectors.whitenApply(e, "embedding", fit)
    assert(w.columns.toSeq == e.columns.toSeq)
    // empirical covariance of the whitened vectors ~ I (float32 apply +
    // eps regularization -> loose tolerance)
    val vecs = w.select("embedding").collect().map(_.getSeq[Float](0).map(_.toDouble))
    val n = vecs.length
    val d = fit.dim
    val mean = Array.tabulate(d)(i => vecs.map(_(i)).sum / n)
    var offMax = 0.0
    var diagMin = Double.MaxValue
    var diagMax = 0.0
    for (i <- 0 until d; j <- i until d) {
      val c = vecs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
      if (i == j) { diagMin = math.min(diagMin, c); diagMax = math.max(diagMax, c) }
      else offMax = math.max(offMax, math.abs(c))
    }
    assert(diagMin > 0.8 && diagMax < 1.2, s"diag in [$diagMin, $diagMax]")
    assert(offMax < 0.15, s"max off-diagonal $offMax")
    // deterministic: refit equals fit
    val fit2 = Vectors.whitenFit(e, "embedding")
    assert(fit.mean.toSeq == fit2.mean.toSeq &&
      fit.w.map(_.toSeq).toSeq == fit2.w.map(_.toSeq).toSeq)
    // degenerate inputs fail with the contract message, not an opaque
    // first()/aggregate error
    val err = intercept[IllegalArgumentException] {
      Vectors.whitenFit(e.filter(org.apache.spark.sql.functions.lit(false)),
        "embedding")
    }
    assert(err.getMessage.contains("more than one vector"))
  }
}

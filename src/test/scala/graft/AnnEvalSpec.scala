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
      "ivfpq_residual", "binary_rerank"),
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
}

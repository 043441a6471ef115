package graft

import org.apache.spark.sql.functions._
import graft.nn.{Dims, EncoderWeights, TransformerConfig}
import graft.train.{LinearAutoencoder, TrainConfig}

/** Model-side specs: encoder numerics, training convergence, scoring shape. */
class MlSpec extends SparkSpec {
  import spark.implicits._

  test("embedding dim rule matches factory.py:63-64") {
    assert(Dims.embeddingDim(3) == 2)
    assert(Dims.embeddingDim(49) == 25)
    assert(Dims.embeddingDim(100000) == 25)
  }

  test("encoder forward: deterministic, finite, right shape") {
    val cfg = TransformerConfig(dModel = 8, heads = 2, layers = 2, pf = 4, maxLen = 10)
    val w = EncoderWeights.init(cfg, vocabSizes = Seq(5), nCont = 2)
    val cat = Array(Array(1), Array(2), Array(0))
    val cont = Array(Array(0.5, 0.1), Array(0.2, 0.9), Array(0.0, 0.0))
    val e1 = w.forward(cat, cont)
    val e2 = w.forward(cat, cont)
    assert(e1.length == 3 * 8)
    assert(e1.sameElements(e2))
    assert(e1.forall(v => !v.isNaN && !v.isInfinite))
    // different input -> different embedding
    val e3 = w.forward(Array(Array(3), Array(2), Array(0)), cont)
    assert(!e1.sameElements(e3))
  }

  test("linear AE training: loss strictly decreases on overfit-able data") {
    val data = (1 to 50).map(i => (i.toLong, i % 7 * 0.1, (i % 5) * 0.2, i % 3 * 0.3))
      .toDF("id", "a", "b", "c")
    val res = LinearAutoencoder.fit(data, Seq("a", "b", "c"),
      TrainConfig(nHidden = 3, lr = 5e-2, maxEpochs = 15, warmupEpochs = 2))
    assert(res.losses.size >= 3)
    assert(res.losses.last < res.losses.head,
      s"loss did not decrease: ${res.losses.head} -> ${res.losses.last}")
    // transform produces hidden-dim embeddings for every row
    val emb = LinearAutoencoder.transform(data, Seq("a", "b", "c"), res.weights, "id")
    assert(emb.count() == 50)
    assert(emb.select("ae_embedding").head().getSeq[Float](0).size == 3)
  }

  test("scoring query emits one embedding row per entity, scalar projections") {
    val out = SparkEntry.queries("q_score_embeddings")(spark, sf)
    val n = out.count()
    val users = graft.core.Tables.load(spark, sf, "events")
      .filter(col("ts") > to_timestamp(lit("2024-01-11 00:00:00")))
      .select("user_id").distinct().count()
    assert(n == users) // inner customer join: every user_id is a custkey
    // array payloads are projected to sortable scalars for the driver
    assert(out.columns.toSet == Set("user_id", "emb_norm", "emb_d0", "emb_d1", "emb_d2", "emb_d3"))
    val row = out.orderBy("user_id").head()
    assert(row.getDouble(out.columns.indexOf("emb_norm")) > 0.0)
  }

  test("training query: per-epoch losses decrease overall") {
    val losses = SparkEntry.queries("q_train_ae_loss")(spark, sf)
      .orderBy("epoch").select("loss").as[Double].collect()
    assert(losses.last < losses.head)
  }
}

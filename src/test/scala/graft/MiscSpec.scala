package graft

import org.apache.spark.sql.functions._
import graft.analyze.{Capacity, Hungarian}
import graft.nn.{EncoderWeights, TransformerConfig}
import graft.prep.Sampling
import graft.sources.Handover

/** Splits/sampling, handover sink, capacity formulas, Hungarian matching. */
class MiscSpec extends SparkSpec {
  import spark.implicits._

  test("G3 split: count preservation and disjointness") {
    val df = (1 to 1000).toDF("id")
    val parts = Sampling.split(df, Seq(0.7, 0.2, 0.1))
    assert(parts.map(_.count()).sum == 1000)
    val all = parts.map(_.select("id").as[Int].collect().toSet)
    assert(all(0).intersect(all(1)).isEmpty && all(0).intersect(all(2)).isEmpty)
  }

  test("G5 oversample: classes equalized; class weights inverse to frequency") {
    val df = ((1 to 90).map(i => (i, 0)) ++ (1 to 10).map(i => (100 + i, 1)))
      .toDF("id", "y")
    val up = Sampling.oversampleMinority(df, "y")
    val counts = up.groupBy("y").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts(0) == 90 && counts(1) >= 80) // sampled approx to parity
    val w = Sampling.withClassWeights(df, "y")
    val ws = w.select("y", "class_weight").distinct().collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(math.abs(ws(0) - 100.0 / (2 * 90)) < 1e-9)
    assert(math.abs(ws(1) - 100.0 / (2 * 10)) < 1e-9)
  }

  test("A1 handover: round trip with block-size option") {
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val path = Handover.write(df, java.nio.file.Files
      .createTempDirectory("graft_handover").toString, partitions = 4)
    val back = Handover.read(spark, path)
    assert(back.count() == 100)
    assert(back.rdd.getNumPartitions >= 1)
  }

  test("J11 capacity formulas match the actual initialized weight counts") {
    val cfg = TransformerConfig(dModel = 8, heads = 2, layers = 2, pf = 4, maxLen = 10)
    val vocabs = Seq(5L, 11L)
    val w = EncoderWeights.init(cfg, vocabs, nCont = 3)
    val actual =
      w.catEmbeddings.map(m => m.rows.toLong * m.cols).sum +
      w.linearSeq.w.size.toLong + w.linearSeq.b.size +
      w.posEmbedding.size.toLong +
      w.layersW.map { l =>
        Seq(l.wq, l.wk, l.wv, l.wo, l.ff1, l.ff2)
          .map(x => x.w.size.toLong + x.b.size).sum +
          l.ln1g.size + l.ln1b.size + l.ln2g.size + l.ln2b.size
      }.sum
    val formula = Capacity.transformerEncoderParams(vocabs, nCont = 3,
      d = 8, layers = 2, pf = 4, maxLen = 10)
    assert(actual == formula, s"actual=$actual formula=$formula")
  }

  test("K2 Hungarian: recovers permuted cluster labels exactly") {
    // predicted cluster = (truth + 1) mod 3, perfect under permutation
    val pairs = for (t <- 0 until 3; _ <- 1 to 10) yield ((t + 1) % 3, t)
    assert(Hungarian.clusterAccuracy(pairs, 3) == 1.0)
    val noisy = pairs ++ Seq((0, 0), (1, 1)) // 2 rows off the permutation
    assert(Hungarian.clusterAccuracy(noisy, 3) > 0.9)
  }
}

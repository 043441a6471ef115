package graft

import org.apache.spark.sql.functions._
import graft.nn.LstmEncoderWeights
import graft.train.Noise

/** I18 noise augmentation + LSTM encoder forward. */
class NoiseSpec extends SparkSpec {
  import spark.implicits._

  private lazy val seqDf = (for (u <- 1 to 10; r <- 1 to 20)
    yield (u.toLong, r.toLong, (r % 5 + 1).toLong, r * 1.0))
    .toDF("user_id", "rank", "code", "v")

  test("cat substitution: deterministic per seed, stays within vocab, rate ~ p") {
    val a = Noise.substituteCat(seqDf, "code", p = 0.3, vocab = 5, seed = 7)
    val b = Noise.substituteCat(seqDf, "code", p = 0.3, vocab = 5, seed = 7)
    assert(a.collect().sameElements(b.collect()))
    val codes = a.select("code").as[Long].collect()
    assert(codes.forall(c => c >= 1 && c <= 5))
    val changed = a.join(seqDf.withColumnRenamed("code", "orig"),
      Seq("user_id", "rank")).filter($"code" =!= $"orig").count()
    assert(changed > 10 && changed < 90) // ~0.3*200 with slack
  }

  test("gaussian noise: deterministic per seed, untouched rows exact") {
    val a = Noise.gaussianCont(seqDf, "v", p = 0.5, sigma = 0.1, seed = 3)
    val joined = a.withColumnRenamed("v", "nv")
      .join(seqDf, Seq("user_id", "rank", "code"))
    val untouched = joined.filter($"nv" === $"v").count()
    assert(untouched > 50 && untouched < 150)
  }

  test("bounded shuffle: displacement <= k, permutation per entity") {
    val k = 3
    val sh = Noise.boundedShuffle(seqDf, Seq("user_id"), k, seed = 5)
    val rows = sh.select($"user_id", $"rank", $"shuffled_rank".cast("long")).collect()
    assert(rows.forall(r => math.abs(r.getLong(1) - r.getLong(2)) <= k))
    // shuffled ranks form a permutation of 1..20 per user
    val perUser = rows.groupBy(_.getLong(0))
    assert(perUser.values.forall(_.map(_.getLong(2)).sorted.sameElements(1L to 20L)))
    // with k>0 at least something moved
    assert(rows.exists(r => r.getLong(1) != r.getLong(2)))
  }

  test("LSTM encoder forward: deterministic, finite, ReLU-nonnegative") {
    val w = LstmEncoderWeights.init(hidden = 8, outDim = 6, vocabSizes = Seq(5), nCont = 2)
    val cat = Array(Array(1), Array(2), Array(3))
    val cont = Array(Array(0.1, 0.5), Array(0.2, 0.4), Array(0.3, 0.3))
    val e1 = w.forward(cat, cont)
    assert(e1.length == 6)
    assert(e1.sameElements(w.forward(cat, cont)))
    assert(e1.forall(v => v >= 0 && !v.isNaN && !v.isInfinite))
    assert(!e1.sameElements(w.forward(Array(Array(4), Array(2), Array(3)), cont)))
  }

  test("LSTM non-seq fuse path: MLP'd ns embeddings + ns cont change the embedding") {
    val w = LstmEncoderWeights.init(hidden = 8, outDim = 6, vocabSizes = Seq(5), nCont = 2,
      nonSeqVocabSizes = Seq(4), nNonSeqCont = 1, nsMlpDim = 3)
    val cat = Array(Array(1), Array(2), Array(3))
    val cont = Array(Array(0.1, 0.5), Array(0.2, 0.4), Array(0.3, 0.3))
    val e1 = w.forward(cat, cont, Array(2), Array(0.7))
    assert(e1.length == 6 && e1.forall(v => v >= 0 && !v.isNaN))
    assert(e1.sameElements(w.forward(cat, cont, Array(2), Array(0.7))))
    assert(!e1.sameElements(w.forward(cat, cont, Array(1), Array(0.7))),
      "changing the ns cat code must change the embedding")
    assert(!e1.sameElements(w.forward(cat, cont, Array(2), Array(0.1))),
      "changing the ns cont value must change the embedding")
  }

  test("I2 DenseBnBlock: inference BN is the expected affine of ReLU(linear)") {
    import breeze.linalg.{DenseMatrix, DenseVector}
    import graft.nn.{DenseBnBlock, Linear}
    val lin = Linear(DenseMatrix((1.0, 0.0), (0.0, -1.0)), DenseVector(0.0, 0.5))
    val blk = DenseBnBlock(lin, gamma = DenseVector(2.0, 2.0),
      beta = DenseVector(1.0, 1.0), runMean = DenseVector(0.0, 0.0),
      runVar = DenseVector(1.0 - 1e-5, 1.0 - 1e-5))
    // x=(3,4): h=(3, -3.5), relu=(3, 0), bn = 2*relu + 1 = (7, 1)
    val y = blk.forward(DenseVector(3.0, 4.0))
    assert(math.abs(y(0) - 7.0) < 1e-9 && math.abs(y(1) - 1.0) < 1e-9)
  }

  test("I2 training-mode BN: batch stats normalize, running stats follow torch momentum") {
    import breeze.linalg.{DenseMatrix, DenseVector}
    import graft.nn.{DenseBnBlock, Linear}
    // identity linear so h = relu(x) = x for the positive hand example
    val lin = Linear(DenseMatrix.eye[Double](2), DenseVector(0.0, 0.0))
    val blk = DenseBnBlock(lin, gamma = DenseVector(1.0, 2.0),
      beta = DenseVector(0.0, 1.0), runMean = DenseVector(0.0, 0.0),
      runVar = DenseVector(1.0, 1.0))
    // batch 1: rows (1,2),(3,6). col0: mu=2 varB=1 varU=2; col1: mu=4 varB=4 varU=8
    val y1 = blk.forwardTrain(DenseMatrix((1.0, 2.0), (3.0, 6.0)))
    val e = 1e-5
    assert(math.abs(y1(0, 0) - (1 - 2) / math.sqrt(1 + e)) < 1e-9)
    assert(math.abs(y1(1, 0) - (3 - 2) / math.sqrt(1 + e)) < 1e-9)
    assert(math.abs(y1(0, 1) - (2.0 * (2 - 4) / math.sqrt(4 + e) + 1)) < 1e-9)
    assert(math.abs(y1(1, 1) - (2.0 * (6 - 4) / math.sqrt(4 + e) + 1)) < 1e-9)
    // running stats after batch 1 (momentum 0.1, unbiased var):
    // mean = 0.9*0 + 0.1*(2,4) = (0.2, 0.4); var = 0.9*1 + 0.1*(2,8)
    assert(math.abs(blk.runMean(0) - 0.2) < 1e-12 && math.abs(blk.runMean(1) - 0.4) < 1e-12)
    assert(math.abs(blk.runVar(0) - 1.1) < 1e-12 && math.abs(blk.runVar(1) - 1.7) < 1e-12)
    // batch 2 accumulates on top: mean = 0.9*(0.2,0.4) + 0.1*batchMu
    blk.forwardTrain(DenseMatrix((0.0, 0.0), (4.0, 2.0)))
    assert(math.abs(blk.runMean(0) - (0.9 * 0.2 + 0.1 * 2.0)) < 1e-12)
    assert(math.abs(blk.runMean(1) - (0.9 * 0.4 + 0.1 * 1.0)) < 1e-12)
    assert(math.abs(blk.runVar(0) - (0.9 * 1.1 + 0.1 * 8.0)) < 1e-12)
    assert(math.abs(blk.runVar(1) - (0.9 * 1.7 + 0.1 * 2.0)) < 1e-12)
    // eval-mode forward now uses the accumulated running stats
    val yEval = blk.forward(DenseVector(1.0, 1.0))
    val exp0 = (1.0 - blk.runMean(0)) / math.sqrt(blk.runVar(0) + e)
    assert(math.abs(yEval(0) - exp0) < 1e-12)
  }

  test("I5 MhaSumPool: pooled vector is finite and time-order sensitive") {
    import breeze.linalg.{DenseMatrix, DenseVector}
    import graft.nn.{Layers, MhaSumPool}
    val rng = new scala.util.Random(9)
    def lin(n: Int) = Layers.linear(rng, n, n)
    val pool = MhaSumPool(lin(4), lin(4), lin(4), lin(4),
      DenseVector.ones[Double](4), DenseVector.zeros[Double](4), heads = 2)
    val h1 = DenseMatrix((0.1, 0.2, 0.3, 0.4), (0.5, 0.6, 0.7, 0.8), (0.9, 1.0, 1.1, 1.2))
    val p1 = pool.forward(h1)
    assert(p1.toArray.forall(v => !v.isNaN && !v.isInfinite))
    // swapped rows change attention context -> different pooled vector
    val h2 = DenseMatrix((0.9, 1.0, 1.1, 1.2), (0.5, 0.6, 0.7, 0.8), (0.1, 0.2, 0.3, 0.4))
    assert(!p1.toArray.sameElements(pool.forward(h2).toArray))
  }

  test("I5 wiring: attnHeads > 1 routes the encoder context through MHA") {
    import graft.nn.LstmEncoderWeights
    val t = 5
    val cat = Array.fill(t)(Array(1))
    val cont = Array.tabulate(t)(i => Array(i / 10.0, 1.0 - i / 10.0))
    // same seed: identical embeddings/cells/fuse; only the context path
    // differs, so differing outputs prove the MHA branch is exercised
    val bah = LstmEncoderWeights.init(hidden = 8, outDim = 6,
      vocabSizes = Seq(5), nCont = 2, seed = 3L)
    val mha = LstmEncoderWeights.init(hidden = 8, outDim = 6,
      vocabSizes = Seq(5), nCont = 2, seed = 3L, attnHeads = 4)
    assert(mha.mha.isDefined && bah.mha.isEmpty)
    val eB = bah.forward(cat, cont)
    val eM = mha.forward(cat, cont)
    assert(eM.length == 6 && eM.forall(v => !v.isNaN && !v.isInfinite))
    assert(!eB.sameElements(eM))
  }
}

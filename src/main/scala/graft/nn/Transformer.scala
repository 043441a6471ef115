package graft.nn

import breeze.linalg.{*, argmax, DenseMatrix, DenseVector, max, sum}
import breeze.numerics.{exp, sqrt => bsqrt}

/**
 * Transformer-encoder numerics (SURVEY.md §2.I) in Breeze, mirroring the
 * reference semantics:
 *  - per-categorical-column embedding tables, dim = min(25, (vocab+1)/2)
 *    (reference: caspr/models/factory.py:63-64, embedding_layer.py:8-51)
 *  - unified encoder: seq cat embeddings ++ seq cont -> linear_seq -> d;
 *    non-seq (cat emb ++ cont) -> linear_non_seq appended as ONE extra
 *    timestep (reference: unified_transformer_encoder.py:18-114, append at
 *    :94-96; adjust_seq_len = seq_len+1, factory.py:43)
 *  - input scaled by sqrt(d), learned positional embedding, N x
 *    (self-attention + FFN, post-LN residuals), all-ones no-op mask
 *    (reference: transformer.py:62-132; scale :95,122; mask :97-103)
 *  - serving embedding = enc_src flattened to (T+1)*d
 *    (reference: caspr/utils/spark/score.py:55-57)
 *
 * Weights are deterministic (seeded Xavier) so scoring is reproducible; the
 * training loop lives in graft.train.
 */
final case class TransformerConfig(
    dModel: Int = 64,
    heads: Int = 2,
    layers: Int = 4,
    pf: Int = 32,
    maxLen: Int = 100,
    seed: Long = 42L) {
  require(dModel % heads == 0, "dModel must divide evenly into heads")
  def headDim: Int = dModel / heads
}

object Dims {
  /** Embedding dim rule from factory.py:63-64. */
  def embeddingDim(vocab: Long): Int = math.min(25, ((vocab + 1) / 2).toInt)
}

final case class Linear(w: DenseMatrix[Double], b: DenseVector[Double]) {
  /** x: (T, in) -> (T, out) */
  def apply(x: DenseMatrix[Double]): DenseMatrix[Double] = {
    val out = x * w
    out(*, ::) :+= b
    out
  }
}

object Layers {

  def xavier(rng: scala.util.Random, rows: Int, cols: Int): DenseMatrix[Double] = {
    val limit = math.sqrt(6.0 / (rows + cols))
    DenseMatrix.fill(rows, cols)((rng.nextDouble() * 2 - 1) * limit)
  }

  def linear(rng: scala.util.Random, in: Int, out: Int): Linear =
    Linear(xavier(rng, in, out), DenseVector.zeros[Double](out))

  /** Row-wise softmax. */
  def softmaxRows(m: DenseMatrix[Double]): DenseMatrix[Double] = {
    val out = m.copy
    for (i <- 0 until m.rows) {
      val row = out(i, ::).t
      val mx = max(row)
      val e = exp(row - mx)
      out(i, ::) := (e / sum(e)).t
    }
    out
  }

  /** ReLU (the reference FFN activation, transformer.py:158). */
  def relu(m: DenseMatrix[Double]): DenseMatrix[Double] =
    m.map(v => if (v > 0) v else 0.0)

  /** Row-wise LayerNorm with learned gain/bias. */
  def layerNorm(x: DenseMatrix[Double], g: DenseVector[Double],
      b: DenseVector[Double], eps: Double = 1e-5): DenseMatrix[Double] = {
    val out = DenseMatrix.zeros[Double](x.rows, x.cols)
    for (i <- 0 until x.rows) {
      val row = x(i, ::).t
      val mu = sum(row) / row.length
      val centered = row - mu
      val sd = math.sqrt(sum(centered *:* centered) / row.length + eps)
      out(i, ::) := (((centered / sd) *:* g) + b).t
    }
    out
  }
}

/** One encoder layer: self-MHA + FFN, post-LN residuals (transformer.py:9-59). */
final case class EncoderLayer(
    wq: Linear, wk: Linear, wv: Linear, wo: Linear,
    ff1: Linear, ff2: Linear,
    ln1g: DenseVector[Double], ln1b: DenseVector[Double],
    ln2g: DenseVector[Double], ln2b: DenseVector[Double]) {

  def forward(x: DenseMatrix[Double], cfg: TransformerConfig): DenseMatrix[Double] = {
    val t = x.rows
    val hd = cfg.headDim
    val q = wq(x); val k = wk(x); val v = wv(x)
    val ctx = DenseMatrix.zeros[Double](t, cfg.dModel)
    for (h <- 0 until cfg.heads) {
      val sl = h * hd until (h + 1) * hd
      val qh = q(::, sl); val kh = k(::, sl); val vh = v(::, sl)
      val scores = (qh * kh.t) / math.sqrt(hd.toDouble)
      val attn = Layers.softmaxRows(scores)
      ctx(::, sl) := attn * vh
    }
    val attnOut = wo(ctx)
    val res1 = Layers.layerNorm(x + attnOut, ln1g, ln1b)
    val ff = ff2(Layers.relu(ff1(res1))) // ReLU FFN (transformer.py:158)
    Layers.layerNorm(res1 + ff, ln2g, ln2b)
  }
}

/** Full weight set for the unified transformer encoder. */
final case class EncoderWeights(
    cfg: TransformerConfig,
    catEmbeddings: Seq[DenseMatrix[Double]], // per seq cat col: (vocab+1) x dim
    linearSeq: Linear,                       // (sum emb dims + nCont) -> d
    posEmbedding: DenseMatrix[Double],       // maxLen x d
    layersW: Seq[EncoderLayer],
    nonSeqEmbeddings: Seq[DenseMatrix[Double]] = Nil, // per non-seq cat col
    linearNonSeq: Option[Linear] = None) {   // (sum ns emb dims + nNsCont) -> d

  def embeddingDims: Seq[Int] = catEmbeddings.map(_.cols)
  def inputDim: Int = embeddingDims.sum + (linearSeq.w.rows - embeddingDims.sum)
  def hasNonSeq: Boolean = linearNonSeq.nonEmpty

  /**
   * Forward one entity: catCodes (T x nCat, 0=UNK valid index), cont
   * (T x nCont), plus optional non-seq features projected through
   * linear_non_seq and appended as one extra timestep
   * (unified_transformer_encoder.py:93-96) -> flattened (T' * d) embedding,
   * T' = T (+1 with non-seq).
   */
  def forward(catCodes: Array[Array[Int]], cont: Array[Array[Double]],
      nsCat: Array[Int] = null, nsCont: Array[Double] = null): Array[Float] = {
    val t = catCodes.length
    val tE = t + (if (hasNonSeq) 1 else 0)
    val nCat = if (t > 0) catCodes(0).length else 0
    val nCont = if (t > 0) cont(0).length else 0
    val embTotal = embeddingDims.sum
    val x0 = DenseMatrix.zeros[Double](t, embTotal + nCont)
    for (i <- 0 until t) {
      var off = 0
      for (c <- 0 until nCat) {
        val table = catEmbeddings(c)
        val code = math.min(math.max(catCodes(i)(c), 0), table.rows - 1)
        x0(i, off until off + table.cols) := table(code, ::)
        off += table.cols
      }
      for (c <- 0 until nCont) x0(i, embTotal + c) = cont(i)(c)
    }
    var h = DenseMatrix.zeros[Double](tE, cfg.dModel)
    h(0 until t, ::) := linearSeq(x0)
    linearNonSeq.foreach { lin =>
      val nsEmbTotal = nonSeqEmbeddings.map(_.cols).sum
      val nsIn = DenseVector.zeros[Double](lin.w.rows)
      var off = 0
      for (c <- nonSeqEmbeddings.indices) {
        val table = nonSeqEmbeddings(c)
        val code = math.min(math.max(if (nsCat != null) nsCat(c) else 0, 0), table.rows - 1)
        nsIn(off until off + table.cols) := table(code, ::).t
        off += table.cols
      }
      if (nsCont != null)
        for (c <- nsCont.indices) nsIn(nsEmbTotal + c) = nsCont(c)
      h(t, ::) := ((lin.w.t * nsIn) + lin.b).t
    }
    h = (h * math.sqrt(cfg.dModel.toDouble)) + posEmbedding(0 until tE, ::)
    for (layer <- layersW) h = layer.forward(h, cfg)
    val out = new Array[Float](tE * cfg.dModel)
    var idx = 0
    for (i <- 0 until tE; j <- 0 until cfg.dModel) { out(idx) = h(i, j).toFloat; idx += 1 }
    out
  }
}

object EncoderWeights {

  /** Deterministic init from vocab sizes and the cont-feature count; pass
    * non-seq vocab sizes / cont count to enable the extra-timestep branch. */
  def init(cfg: TransformerConfig, vocabSizes: Seq[Long], nCont: Int,
      nonSeqVocabSizes: Seq[Long] = Nil, nNonSeqCont: Int = 0): EncoderWeights = {
    val rng = new scala.util.Random(cfg.seed)
    val embs = vocabSizes.map(v =>
      Layers.xavier(rng, (v + 1).toInt, Dims.embeddingDim(v)))
    val inDim = embs.map(_.cols).sum + nCont
    val linearSeq = Layers.linear(rng, inDim, cfg.dModel)
    val nsEmbs = nonSeqVocabSizes.map(v =>
      Layers.xavier(rng, (v + 1).toInt, Dims.embeddingDim(v)))
    val nsInDim = nsEmbs.map(_.cols).sum + nNonSeqCont
    val linearNonSeq =
      if (nsInDim > 0) Some(Layers.linear(rng, nsInDim, cfg.dModel)) else None
    val pos = Layers.xavier(rng, cfg.maxLen, cfg.dModel)
    val layers = Seq.fill(cfg.layers) {
      EncoderLayer(
        Layers.linear(rng, cfg.dModel, cfg.dModel),
        Layers.linear(rng, cfg.dModel, cfg.dModel),
        Layers.linear(rng, cfg.dModel, cfg.dModel),
        Layers.linear(rng, cfg.dModel, cfg.dModel),
        Layers.linear(rng, cfg.dModel, cfg.pf),
        Layers.linear(rng, cfg.pf, cfg.dModel),
        DenseVector.ones[Double](cfg.dModel), DenseVector.zeros[Double](cfg.dModel),
        DenseVector.ones[Double](cfg.dModel), DenseVector.zeros[Double](cfg.dModel))
    }
    EncoderWeights(cfg, embs, linearSeq, pos, layers, nsEmbs, linearNonSeq)
  }
}

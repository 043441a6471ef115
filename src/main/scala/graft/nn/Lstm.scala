package graft.nn

import breeze.linalg.{DenseMatrix, DenseVector, sum}
import breeze.numerics.{exp, sigmoid, tanh}

/**
 * LSTM encoder path (SURVEY.md §2.I11/I12/I4): the reference's second
 * architecture — cat embeddings ++ cont -> LSTM -> Bahdanau additive
 * attention context ++ final hidden -> ReLU(Linear) = embedding
 * (reference unified_encoder.py:25-282, attention select :186-192, fuse
 * :194-202; multi_layer_lstm.py:7-63; BahdanauAttention
 * attention_mechanisms.py:102-123).
 */
final case class LstmCell(
    wi: DenseMatrix[Double], ui: DenseMatrix[Double], bi: DenseVector[Double],
    wf: DenseMatrix[Double], uf: DenseMatrix[Double], bf: DenseVector[Double],
    wg: DenseMatrix[Double], ug: DenseMatrix[Double], bg: DenseVector[Double],
    wo: DenseMatrix[Double], uo: DenseMatrix[Double], bo: DenseVector[Double]) {

  /** One step: (x_t, h_{t-1}, c_{t-1}) -> (h_t, c_t). */
  def step(x: DenseVector[Double], h: DenseVector[Double], c: DenseVector[Double])
      : (DenseVector[Double], DenseVector[Double]) = {
    val i = sigmoid(wi.t * x + ui.t * h + bi)
    val f = sigmoid(wf.t * x + uf.t * h + bf)
    val g = tanh(wg.t * x + ug.t * h + bg)
    val o = sigmoid(wo.t * x + uo.t * h + bo)
    val cNew = (f *:* c) + (i *:* g)
    val hNew = o *:* tanh(cNew)
    (hNew, cNew)
  }
}

/**
 * I11 optional ConvAggregation gate (convolutional_aggregation.py:28-50;
 * wired at unified_encoder.py:163-179,246-247): the (T x F) embedded input
 * sequence is treated as a single-channel image, reduced by
 * tanh(Conv2d(1->1, kernel, stride)) + MaxPool2d(pool), and the reduced
 * (T' x F') grid becomes the LSTM's input sequence. Default-off in the
 * reference; serving-parity forward (training of the kernel is out of
 * scope, matching the gate's default-off status).
 */
final case class ConvAgg(kernel: DenseMatrix[Double], bias: Double,
    strideT: Int = 2, strideF: Int = 2, poolT: Int = 2, poolF: Int = 2) {

  /** Output (rows, cols) for an input of shape (t, f); both must be >= 1. */
  def outShape(t: Int, f: Int): (Int, Int) =
    (((t - kernel.rows) / strideT + 1) / poolT,
     ((f - kernel.cols) / strideF + 1) / poolF)

  def forward(x: DenseMatrix[Double]): DenseMatrix[Double] = {
    val kT = kernel.rows; val kF = kernel.cols
    val cT = (x.rows - kT) / strideT + 1
    val cF = (x.cols - kF) / strideF + 1
    require(cT >= poolT && cF >= poolF,
      s"conv output ${cT}x$cF smaller than pool ${poolT}x$poolF")
    val conv = DenseMatrix.tabulate(cT, cF) { (i, j) =>
      var s = bias
      var a = 0
      while (a < kT) {
        var b = 0
        while (b < kF) { s += kernel(a, b) * x(i * strideT + a, j * strideF + b); b += 1 }
        a += 1
      }
      math.tanh(s)
    }
    // MaxPool2d default: stride = pool size, floor division on the shape
    DenseMatrix.tabulate(cT / poolT, cF / poolF) { (i, j) =>
      var m = Double.NegativeInfinity
      var a = 0
      while (a < poolT) {
        var b = 0
        while (b < poolF) { m = math.max(m, conv(i * poolT + a, j * poolF + b)); b += 1 }
        a += 1
      }
      m
    }
  }
}

final case class LstmEncoderWeights(
    hidden: Int,
    catEmbeddings: Seq[DenseMatrix[Double]],
    cells: Seq[Seq[LstmCell]], // layers x directions (multi_layer_lstm.py:28-30)
    // Bahdanau fc_encoder: D*hidden -> attnDim, bias-free in the faithful
    // form (attention_mechanisms.py:108: nn.Linear(..., bias=False));
    // attnB1 = Some(...) opts into the generalized input-bias form kept
    // from earlier rounds. attnHidden's scalar bias is softmax-shift-
    // invariant, so the serving forward omits it (it exists only for
    // parameter counting — see graft.analyze.Capacity).
    attnW1: DenseMatrix[Double], attnB1: Option[DenseVector[Double]],
    attnV: DenseVector[Double],                               // attnDim
    lstmToDense: Linear,     // [h_T fwd; h_T bwd] projection (multi_layer_lstm.py:34-36)
    fuse: Linear,            // (nsFinal + nNsCont + hidden + D*hidden) -> outDim
    nonSeqEmbeddings: Seq[DenseMatrix[Double]] = Nil,
    nsMlp: Option[DenseBnBlock] = None, // ns emb -> nsFinal (emb_lin_layer_non_seq)
    convAgg: Option[ConvAgg] = None,    // I11 gate (use_conv_agg)
    mha: Option[MhaSumPool] = None) {   // I5: attention_heads > 1 selects MHA
                                        // over Bahdanau (unified_encoder.py:186-192)

  private def embeddingDims = catEmbeddings.map(_.cols)

  /**
   * Forward one entity: per-timestep cat codes + cont -> embedding.
   *
   * Non-seq features follow the reference's LSTM mechanism — NOT the
   * transformer's extra timestep: non-seq cat embeddings run through the
   * DenseBnDropout MLP (emb_lin_layer_non_seq, unified_encoder.py:142-146)
   * and the result ++ non-seq cont is CONCATENATED in front of the
   * [lstm_to_dense(h_T), context] fuse input (fin_input,
   * unified_encoder.py:257-262; the h_T projection is
   * multi_layer_lstm.py:34-36,55-63) before output_layer + ReLU (:266).
   *
   * Stacked/bidirectional stacks follow nn.LSTM: layer l reads layer l-1's
   * per-timestep output ([h_fwd_t ; h_bwd_t] when bidir, width D*hidden);
   * attention runs over the TOP layer's outputs and lstm_to_dense projects
   * the concatenated final states of the top layer (multi_layer_lstm.py:55-63).
   */
  def forward(catCodes: Array[Array[Int]], cont: Array[Array[Double]],
      nsCat: Array[Int] = null, nsCont: Array[Double] = null): Array[Float] = {
    val t = catCodes.length
    val nCont = if (t > 0) cont(0).length else 0
    val embTotal = embeddingDims.sum
    val dirs = cells.head.size
    val oW = dirs * hidden
    // embed the input sequence once
    var layerIn = DenseMatrix.zeros[Double](t, embTotal + nCont)
    for (i <- 0 until t) {
      var off = 0
      for (cc <- catCodes(i).indices) {
        val table = catEmbeddings(cc)
        val code = math.min(math.max(catCodes(i)(cc), 0), table.rows - 1)
        layerIn(i, off until off + table.cols) := table(code, ::)
        off += table.cols
      }
      for (j <- 0 until nCont) layerIn(i, embTotal + j) = cont(i)(j)
    }
    // I11 gate: reduce the (T x F) input image before the LSTM
    // (unified_encoder.py:246-247)
    convAgg.foreach(ca => layerIn = ca.forward(layerIn))
    val tSeq = layerIn.rows // = t unless conv-aggregated
    var finals: Seq[DenseVector[Double]] = Nil // top-layer h_T per direction
    for (layer <- cells) {
      val outM = DenseMatrix.zeros[Double](tSeq, oW)
      finals = layer.zipWithIndex.map { case (cell, d) =>
        var h = DenseVector.zeros[Double](hidden)
        var c = DenseVector.zeros[Double](hidden)
        for (s <- 0 until tSeq) {
          val i = if (d == 0) s else tSeq - 1 - s
          val (hn, cn) = cell.step(layerIn(i, ::).t, h, c)
          h = hn; c = cn
          outM(i, d * hidden until (d + 1) * hidden) := h.t
        }
        h
      }
      layerIn = outM
    }
    val outputs = layerIn // tSeq x D*hidden (top layer)
    // attention select (unified_encoder.py:186-192): heads == 1 -> Bahdanau
    // weighted context; heads > 1 -> I5 MHA wrapper with sum-over-time pool
    val context = mha match {
      case Some(pool) => pool.forward(outputs)
      case None =>
        // Bahdanau: score_t = v . tanh(W1 out_t [+ b1]); context = softmax . H
        val scores = DenseVector.tabulate(tSeq) { i =>
          val pre = attnW1.t * outputs(i, ::).t
          attnB1.foreach(pre :+= _)
          sum(attnV *:* tanh(pre))
        }
        val mx = breeze.linalg.max(scores)
        val e = exp(scores - mx)
        val a = e / sum(e)
        val ctx = DenseVector.zeros[Double](oW)
        for (i <- 0 until tSeq) ctx :+= outputs(i, ::).t * a(i)
        ctx
    }
    // non-seq branch: MLP(ns cat embeddings) ++ ns cont, prepended
    val nsPart: DenseVector[Double] = nsMlp match {
      case Some(mlp) =>
        val nsEmbTotal = nonSeqEmbeddings.map(_.cols).sum
        val nsIn = DenseVector.zeros[Double](nsEmbTotal)
        var off = 0
        for (cc <- nonSeqEmbeddings.indices) {
          val table = nonSeqEmbeddings(cc)
          val code = math.min(math.max(if (nsCat != null) nsCat(cc) else 0, 0), table.rows - 1)
          nsIn(off until off + table.cols) := table(code, ::).t
          off += table.cols
        }
        val mlpOut = mlp.forward(nsIn)
        val nsContV =
          if (nsCont == null) DenseVector.zeros[Double](0)
          else DenseVector(nsCont)
        DenseVector.vertcat(mlpOut, nsContV)
      case None =>
        if (nsCont == null) DenseVector.zeros[Double](0) else DenseVector(nsCont)
    }
    // fuse: ReLU(Linear(nsPart ++ lstm_to_dense([h_T fwd; h_T bwd]) ++ context))
    val hNcat = DenseVector.vertcat(finals: _*)
    val hProj = (lstmToDense.w.t * hNcat) + lstmToDense.b
    val fused = DenseVector.vertcat(nsPart, hProj, context)
    val out = (fuse.w.t * fused) + fuse.b
    out.map(v => math.max(v, 0.0).toFloat).toArray
  }
}

object LstmEncoderWeights {
  def init(hidden: Int, outDim: Int, vocabSizes: Seq[Long], nCont: Int,
      attnDim: Int = 0, // 0 = reference-faithful width (= hidden)
      attnInputBias: Boolean = false, // generalized form (adds b1)
      seed: Long = 42L,
      nonSeqVocabSizes: Seq[Long] = Nil, nNonSeqCont: Int = 0,
      nsMlpDim: Int = 16, numLayers: Int = 1,
      bidirectional: Boolean = false,
      useConvAgg: Boolean = false, // I11 gate; reference defaults (3,3)/(2,2)/(2,2)
      convKernel: (Int, Int) = (3, 3), convStride: (Int, Int) = (2, 2),
      convPool: (Int, Int) = (2, 2),
      attnHeads: Int = 1): LstmEncoderWeights = { // > 1 -> I5 MHA path
    val rng = new scala.util.Random(seed)
    val embs = vocabSizes.map(v => Layers.xavier(rng, (v + 1).toInt, Dims.embeddingDim(v)))
    val rawIn = embs.map(_.cols).sum + nCont
    val conv =
      if (!useConvAgg) None
      else Some(ConvAgg(Layers.xavier(rng, convKernel._1, convKernel._2), bias = 0.0,
        strideT = convStride._1, strideF = convStride._2,
        poolT = convPool._1, poolF = convPool._2))
    // with the gate on, the LSTM reads the conv-reduced feature width
    val in = conv.map(c => ((rawIn - c.kernel.cols) / c.strideF + 1) / c.poolF)
      .getOrElse(rawIn)
    require(in >= 1, s"conv aggregation reduces feature width to $in")
    val dirs = if (bidirectional) 2 else 1
    def m(r: Int, cc: Int) = Layers.xavier(rng, r, cc)
    def vz(n: Int) = DenseVector.zeros[Double](n)
    def mkCell(inDim: Int) = LstmCell(
      m(inDim, hidden), m(hidden, hidden), vz(hidden),
      m(inDim, hidden), m(hidden, hidden), DenseVector.ones[Double](hidden), // forget bias 1
      m(inDim, hidden), m(hidden, hidden), vz(hidden),
      m(inDim, hidden), m(hidden, hidden), vz(hidden))
    val cells = (0 until numLayers).map { l =>
      val lin = if (l == 0) in else dirs * hidden
      (0 until dirs).map(_ => mkCell(lin))
    }
    val nsEmbs = nonSeqVocabSizes.map(v =>
      Layers.xavier(rng, (v + 1).toInt, Dims.embeddingDim(v)))
    val nsMlp =
      if (nsEmbs.isEmpty) None
      else Some(DenseBnBlock(
        Layers.linear(rng, nsEmbs.map(_.cols).sum, nsMlpDim),
        gamma = DenseVector.ones[Double](nsMlpDim), beta = vz(nsMlpDim),
        runMean = vz(nsMlpDim), runVar = DenseVector.ones[Double](nsMlpDim)))
    val nsFinal = nsMlp.map(_.gamma.length).getOrElse(0)
    val aW = if (attnDim <= 0) hidden else attnDim // faithful: attnDim = hidden
    LstmEncoderWeights(hidden, embs, cells,
      m(dirs * hidden, aW),
      if (attnInputBias) Some(vz(aW)) else None,
      DenseVector.tabulate(aW)(_ => rng.nextDouble() * 0.2 - 0.1),
      Layers.linear(rng, dirs * hidden, hidden),
      Layers.linear(rng, nsFinal + nNonSeqCont + hidden + dirs * hidden, outDim),
      nsEmbs, nsMlp, conv,
      mha = if (attnHeads <= 1) None else {
        val dM = dirs * hidden
        require(dM % attnHeads == 0, "attention heads must divide D*hidden")
        Some(MhaSumPool(
          Layers.linear(rng, dM, dM), Layers.linear(rng, dM, dM),
          Layers.linear(rng, dM, dM), Layers.linear(rng, dM, dM),
          lnG = DenseVector.ones[Double](dM), lnB = DenseVector.zeros[Double](dM),
          heads = attnHeads))
      })
  }
}

/**
 * I2 DenseBnDropout block (reference dense_bn_dropout.py:7-56:
 * [Linear -> ReLU -> BatchNorm1d -> Dropout] x k).
 *
 * Inference: the affine y = gamma*(x-mean)/sqrt(var+eps)+beta with RUNNING
 * stats; dropout is identity. Training (`forwardTrain`): normalize with the
 * BATCH stats and update the running stats in place with torch's
 * BatchNorm1d momentum rule — biased variance normalizes the batch,
 * UNBIASED variance feeds the running estimate (nn.BatchNorm1d defaults,
 * momentum 0.1).
 */
final case class DenseBnBlock(lin: Linear, gamma: DenseVector[Double],
    beta: DenseVector[Double], runMean: DenseVector[Double],
    runVar: DenseVector[Double], eps: Double = 1e-5) {

  def forward(x: DenseVector[Double]): DenseVector[Double] = {
    val h = (lin.w.t * x) + lin.b
    val relu = h.map(v => math.max(v, 0.0))
    ((relu - runMean) /:/ breeze.numerics.sqrt(runVar + eps)) *:* gamma + beta
  }

  /** Training-mode batch forward (rows = examples). Mutates runMean/runVar. */
  def forwardTrain(xs: DenseMatrix[Double], momentum: Double = 0.1): DenseMatrix[Double] = {
    val n = xs.rows
    require(n > 1, "training-mode BatchNorm needs batch size > 1")
    val h = lin(xs).map(v => math.max(v, 0.0)) // Linear -> ReLU
    val d = h.cols
    val mu = DenseVector.tabulate(d)(j => (0 until n).map(h(_, j)).sum / n)
    val varB = DenseVector.tabulate(d) { j =>
      (0 until n).map(i => math.pow(h(i, j) - mu(j), 2)).sum / n
    }
    val varU = varB * (n.toDouble / (n - 1))
    runMean := (runMean * (1 - momentum)) + (mu * momentum)
    runVar := (runVar * (1 - momentum)) + (varU * momentum)
    val out = DenseMatrix.zeros[Double](n, d)
    for (i <- 0 until n)
      out(i, ::) := ((((h(i, ::).t - mu) /:/ breeze.numerics.sqrt(varB + eps))
        *:* gamma) + beta).t
    out
  }
}

/**
 * I5 MHA-over-LSTM-outputs wrapper with residual + layernorm + SUM-over-time
 * pooling (reference attention_mechanisms.py:83-99).
 */
final case class MhaSumPool(wq: Linear, wk: Linear, wv: Linear, wo: Linear,
    lnG: DenseVector[Double], lnB: DenseVector[Double], heads: Int) {

  /** outputs: (T x h) LSTM outputs -> pooled (h) vector. */
  def forward(outputs: DenseMatrix[Double]): DenseVector[Double] = {
    val d = outputs.cols
    val hd = d / heads
    val q = wq(outputs); val k = wk(outputs); val v = wv(outputs)
    val ctx = DenseMatrix.zeros[Double](outputs.rows, d)
    for (h <- 0 until heads) {
      val sl = h * hd until (h + 1) * hd
      val a = Layers.softmaxRows((q(::, sl) * k(::, sl).t) / math.sqrt(hd.toDouble))
      ctx(::, sl) := a * v(::, sl)
    }
    val res = outputs + wo(ctx)
    val normed = Layers.layerNorm(res, lnG, lnB)
    // sum over time
    val pooled = DenseVector.zeros[Double](d)
    for (i <- 0 until normed.rows) pooled :+= normed(i, ::).t
    pooled
  }
}

package graft.nn

import breeze.linalg.{DenseMatrix, DenseVector, sum}
import breeze.numerics.{exp, sigmoid, tanh}

/**
 * Trainable LSTM encoder (SURVEY.md §2.I11/I12 training path): forward +
 * full BPTT backward over the flat-parameter scheme shared with
 * [[TransformerAE]], so the same broadcast+treeAggregate harness trains
 * either architecture.
 *
 * Objective (mirrors the pre-decoder transformer objective): per-timestep
 * reconstruction heads on the LSTM outputs (CE per cat col + MSE cont),
 * plus an MSE head on the pooled (Bahdanau context ++ h_n -> fuse)
 * embedding reconstructing the mean cont features — the latter gives the
 * attention/fuse parameters a gradient path. Serving embedding = the pooled
 * vector (reference unified_encoder.py:194-202 fuse; spark/score.py:60-61).
 */
final case class LstmAeConfig(hidden: Int, outDim: Int, attnDim: Int,
    seqLen: Int, vocabSizes: Seq[Int], nCont: Int, seed: Long = 42L) {
  def embDims: Seq[Int] = vocabSizes.map(v => Dims.embeddingDim(v.toLong))
  def inDim: Int = embDims.sum + nCont

  def layout: ParamLayout = {
    val specs = Seq.newBuilder[ParamSpec]
    vocabSizes.zip(embDims).zipWithIndex.foreach { case ((v, d), i) =>
      specs += ParamSpec(s"emb$i", v + 1, d)
    }
    for (g <- Seq("i", "f", "g", "o")) {
      specs += ParamSpec(s"w$g", inDim, hidden)
      specs += ParamSpec(s"u$g", hidden, hidden)
      specs += ParamSpec(s"b$g", 1, hidden)
    }
    specs += ParamSpec("aw1", hidden, attnDim)
    specs += ParamSpec("ab1", 1, attnDim)
    specs += ParamSpec("av", 1, attnDim)
    specs += ParamSpec("fuse_w", 2 * hidden, outDim)
    specs += ParamSpec("fuse_b", 1, outDim)
    vocabSizes.zipWithIndex.foreach { case (v, i) =>
      specs += ParamSpec(s"headCat${i}_w", hidden, v + 1)
      specs += ParamSpec(s"headCat${i}_b", 1, v + 1)
    }
    specs += ParamSpec("headCont_w", hidden, math.max(nCont, 1))
    specs += ParamSpec("headCont_b", 1, math.max(nCont, 1))
    specs += ParamSpec("headPool_w", outDim, math.max(nCont, 1))
    specs += ParamSpec("headPool_b", 1, math.max(nCont, 1))
    new ParamLayout(specs.result())
  }

  def initParams(): Array[Double] = {
    val lay = layout
    val rng = new scala.util.Random(seed)
    val a = new Array[Double](lay.totalSize)
    lay.specs.foreach { s =>
      val (off, _) = lay.offsets(s.name)
      if (s.name == "bf") for (i <- 0 until s.size) a(off + i) = 1.0 // forget bias
      else if (s.name.startsWith("b") || s.name.endsWith("_b") || s.name == "ab1") ()
      else {
        val limit = math.sqrt(6.0 / (s.rows + s.cols))
        for (i <- 0 until s.size) a(off + i) = (rng.nextDouble() * 2 - 1) * limit
      }
    }
    a
  }
}

object LstmAE {

  /** Forward one example; when `grad` is non-null also runs the backward and
    * accumulates parameter gradients. Returns (loss, pooledEmbedding). */
  def lossGradEmbed(cfg: LstmAeConfig, lay: ParamLayout, p: Array[Double],
      grad: Array[Double], catCodes: Array[Array[Int]],
      cont: Array[Array[Double]]): (Double, Array[Double]) = {
    val t = cfg.seqLen
    val h = cfg.hidden
    val nCat = cfg.vocabSizes.size
    val embDims = cfg.embDims

    // ---- embed inputs --------------------------------------------------
    val x0 = DenseMatrix.zeros[Double](t, cfg.inDim)
    for (i <- 0 until t) {
      var off = 0
      for (c <- 0 until nCat) {
        val table = lay.mat(s"emb$c", p)
        val code = math.min(math.max(catCodes(i)(c), 0), table.rows - 1)
        x0(i, off until off + embDims(c)) := table(code, ::)
        off += embDims(c)
      }
      for (c <- 0 until cfg.nCont) x0(i, embDims.sum + c) = cont(i)(c)
    }

    def W(n: String) = lay.mat(n, p)
    def V(n: String) = lay.vec(n, p)

    // ---- LSTM forward with caches -------------------------------------
    val hs = DenseMatrix.zeros[Double](t + 1, h) // h_0 .. h_T (row 0 = zeros)
    val cs = DenseMatrix.zeros[Double](t + 1, h)
    val ig = DenseMatrix.zeros[Double](t, h)
    val fg = DenseMatrix.zeros[Double](t, h)
    val gg = DenseMatrix.zeros[Double](t, h)
    val og = DenseMatrix.zeros[Double](t, h)
    for (i <- 0 until t) {
      val x = x0(i, ::).t
      val hp = hs(i, ::).t
      val iv = sigmoid(W("wi").t * x + W("ui").t * hp + V("bi"))
      val fv = sigmoid(W("wf").t * x + W("uf").t * hp + V("bf"))
      val gv = tanh(W("wg").t * x + W("ug").t * hp + V("bg"))
      val ov = sigmoid(W("wo").t * x + W("uo").t * hp + V("bo"))
      val cv = (fv *:* cs(i, ::).t) + (iv *:* gv)
      ig(i, ::) := iv.t; fg(i, ::) := fv.t; gg(i, ::) := gv.t; og(i, ::) := ov.t
      cs(i + 1, ::) := cv.t
      hs(i + 1, ::) := (ov *:* tanh(cv)).t
    }
    val outputs = hs(1 to t, ::) // T x h

    // ---- Bahdanau attention + fuse ------------------------------------
    val pre = DenseMatrix.zeros[Double](t, cfg.attnDim) // W1^T h_t + b1
    for (i <- 0 until t) pre(i, ::) := (W("aw1").t * outputs(i, ::).t + V("ab1")).t
    val preT = tanh(pre)
    val scores = DenseVector.tabulate(t)(i => sum(V("av") *:* preT(i, ::).t))
    val mx = breeze.linalg.max(scores)
    val ex = exp(scores - mx)
    val attn = ex / sum(ex)
    val context = DenseVector.zeros[Double](h)
    for (i <- 0 until t) context :+= outputs(i, ::).t * attn(i)
    val hN = hs(t, ::).t
    val fused = DenseVector.vertcat(context, hN)
    val eLin = (W("fuse_w").t * fused) + V("fuse_b")
    val embedding = eLin.map(v => math.max(v, 0.0)) // ReLU

    // ---- heads + loss --------------------------------------------------
    var loss = 0.0
    val dOut = DenseMatrix.zeros[Double](t, h)
    var dEmb = DenseVector.zeros[Double](cfg.outDim)
    val doGrad = grad != null
    for (c <- 0 until nCat) {
      val w = W(s"headCat${c}_w"); val b = V(s"headCat${c}_b")
      for (i <- 0 until t) {
        val logits = (w.t * outputs(i, ::).t) + b
        val lmx = breeze.linalg.max(logits)
        val e = exp(logits - lmx)
        val probs = e / sum(e)
        val y = math.min(math.max(catCodes(i)(c), 0), w.cols - 1)
        loss += -math.log(math.max(probs(y), 1e-12)) / t
        if (doGrad) {
          val dLogits = probs.copy; dLogits(y) -= 1.0; dLogits :/= t.toDouble
          lay.mat(s"headCat${c}_w", grad) :+= outputs(i, ::).t * dLogits.t
          lay.vec(s"headCat${c}_b", grad) :+= dLogits
          dOut(i, ::) :+= (w * dLogits).t
        }
      }
    }
    if (cfg.nCont > 0) {
      val w = W("headCont_w"); val b = V("headCont_b")
      for (i <- 0 until t) {
        val pred = (w.t * outputs(i, ::).t) + b
        val err = pred - DenseVector.tabulate(cfg.nCont)(j => cont(i)(j))
        loss += sum(err *:* err) / (2.0 * t)
        if (doGrad) {
          val dPred = err / t.toDouble
          lay.mat("headCont_w", grad) :+= outputs(i, ::).t * dPred.t
          lay.vec("headCont_b", grad) :+= dPred
          dOut(i, ::) :+= (w * dPred).t
        }
      }
      // pooled head: reconstruct the mean cont vector from the embedding
      val meanCont = DenseVector.tabulate(cfg.nCont)(j =>
        (0 until t).map(i => cont(i)(j)).sum / t)
      val wp = W("headPool_w"); val bp = V("headPool_b")
      val predP = (wp.t * embedding) + bp
      val errP = predP - meanCont
      loss += sum(errP *:* errP) / 2.0
      if (doGrad) {
        lay.mat("headPool_w", grad) :+= embedding * errP.t
        lay.vec("headPool_b", grad) :+= errP
        dEmb :+= wp * errP
      }
    }
    if (!doGrad) return (loss, embedding.toArray)

    // ---- backward: fuse + attention -----------------------------------
    val dELin = dEmb *:* eLin.map(v => if (v > 0) 1.0 else 0.0) // ReLU'
    lay.mat("fuse_w", grad) :+= fused * dELin.t
    lay.vec("fuse_b", grad) :+= dELin
    val dFused = W("fuse_w") * dELin
    val dContext = dFused(0 until h)
    val dHN = dFused(h until 2 * h).copy
    // context = sum a_i out_i
    val dAttn = DenseVector.tabulate(t)(i => sum(dContext *:* outputs(i, ::).t))
    for (i <- 0 until t) dOut(i, ::) :+= (dContext * attn(i)).t
    // softmax backward
    val dotA = sum(attn *:* dAttn)
    val dScores = (dAttn - dotA) *:* attn
    // scores_i = av . tanh(pre_i)
    for (i <- 0 until t) {
      val dPreT = V("av") * dScores(i)
      lay.vec("av", grad) :+= preT(i, ::).t * dScores(i)
      val dPre = dPreT *:* (1.0 - (preT(i, ::).t *:* preT(i, ::).t))
      lay.mat("aw1", grad) :+= outputs(i, ::).t * dPre.t
      lay.vec("ab1", grad) :+= dPre
      dOut(i, ::) :+= (W("aw1") * dPre).t
    }
    // h_N also feeds fuse directly
    dOut(t - 1, ::) :+= dHN.t

    // ---- BPTT ----------------------------------------------------------
    val dX0 = DenseMatrix.zeros[Double](t, cfg.inDim)
    var dhNext = DenseVector.zeros[Double](h)
    var dcNext = DenseVector.zeros[Double](h)
    for (i <- (t - 1) to 0 by -1) {
      val dh = dOut(i, ::).t + dhNext
      val cv = cs(i + 1, ::).t
      val tc = tanh(cv)
      val ov = og(i, ::).t; val iv = ig(i, ::).t
      val fv = fg(i, ::).t; val gv = gg(i, ::).t
      val dO = dh *:* tc *:* ov *:* (1.0 - ov)
      val dC = (dh *:* ov *:* (1.0 - (tc *:* tc))) + dcNext
      val dF = dC *:* cs(i, ::).t *:* fv *:* (1.0 - fv)
      val dI = dC *:* gv *:* iv *:* (1.0 - iv)
      val dG = dC *:* iv *:* (1.0 - (gv *:* gv))
      val x = x0(i, ::).t
      val hp = hs(i, ::).t
      for ((gate, dGate) <- Seq(("i", dI), ("f", dF), ("g", dG), ("o", dO))) {
        lay.mat(s"w$gate", grad) :+= x * dGate.t
        lay.mat(s"u$gate", grad) :+= hp * dGate.t
        lay.vec(s"b$gate", grad) :+= dGate
      }
      dX0(i, ::) := (W("wi") * dI + W("wf") * dF + W("wg") * dG + W("wo") * dO).t
      dhNext = W("ui") * dI + W("uf") * dF + W("ug") * dG + W("uo") * dO
      dcNext = dC *:* fv
    }
    // embeddings scatter
    for (i <- 0 until t) {
      var off = 0
      for (c <- 0 until nCat) {
        val tableG = lay.mat(s"emb$c", grad)
        val code = math.min(math.max(catCodes(i)(c), 0), tableG.rows - 1)
        tableG(code, ::) :+= dX0(i, off until off + embDims(c))
        off += embDims(c)
      }
    }
    (loss, embedding.toArray)
  }
}

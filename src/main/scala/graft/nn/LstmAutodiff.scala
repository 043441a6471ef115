package graft.nn

import breeze.linalg.{DenseMatrix, DenseVector, sum}
import breeze.numerics.{exp, sigmoid, tanh}

/**
 * Trainable LSTM encoder (SURVEY.md §2.I11/I12 training path): forward +
 * full BPTT backward over the flat-parameter scheme shared with
 * [[TransformerAE]], so the same broadcast+treeAggregate harness trains
 * either architecture.
 *
 * Objectives, selected by `decoder`:
 *  - "none": per-timestep reconstruction heads on the LSTM outputs (CE per
 *    cat col + MSE cont) plus an MSE head on the pooled ([lstm_to_dense
 *    (h_T), context] -> fuse) embedding — the denoising objective used
 *    pre-round-2.
 *  - "teacher" (I15, AutoencoderTeacherTraining, model_wrapper.py:158-214):
 *    a one-layer LSTM decoder (I13, lstm_decoder.py:8-57) is initialized
 *    with hidden = (fused embedding, c_T) — the reference's unified encoder
 *    returns exactly that pair (unified_encoder.py:271) — and fed the
 *    SHIFTED ground-truth inputs ([0; x_{0..T-2}], :183-188); per-step heads
 *    out_cont = ReLU(linear(tanh(h))) and per-cat logits reconstruct step i.
 *  - "auto" (I14, LSTMAutoencoder, model_wrapper.py:28-120): same decoder,
 *    but step i's input is the PREVIOUS PREDICTION — argmax cat codes
 *    re-embedded through the encoder's embedding tables ++ out_cont
 *    (:74-86). Gradients flow through the out_cont input chain and the
 *    re-embedded predicted codes' table rows (argmax itself is constant).
 *
 * In decoder modes the hidden-state init makes attention/fuse trainable
 * through the decoder (h0 = fused embedding), so the pooled head is
 * dropped; outDim must equal hidden. Serving embedding = the fused vector
 * in every mode (spark/score.py:60-61).
 */
final case class LstmAeConfig(hidden: Int, outDim: Int, attnDim: Int,
    seqLen: Int, vocabSizes: Seq[Int], nCont: Int, seed: Long = 42L,
    decoder: String = "none") {
  require(Seq("none", "teacher", "auto").contains(decoder))
  require(decoder == "none" || outDim == hidden,
    "decoder hidden init = fused embedding (unified_encoder.py:271) needs outDim == hidden")
  def embDims: Seq[Int] = vocabSizes.map(v => Dims.embeddingDim(v.toLong))
  def inDim: Int = embDims.sum + nCont
  def hasDecoder: Boolean = decoder != "none"

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
    // lin_layer_lstm_to_dense (multi_layer_lstm.py:34-36,55-60): h_T is
    // projected before the fuse concat [proj(h_T), context]
    specs += ParamSpec("l2d_w", hidden, hidden)
    specs += ParamSpec("l2d_b", 1, hidden)
    specs += ParamSpec("fuse_w", 2 * hidden, outDim)
    specs += ParamSpec("fuse_b", 1, outDim)
    if (hasDecoder) {
      // I13 decoder cell + heads (lstm_decoder.py:27-33)
      for (g <- Seq("i", "f", "g", "o")) {
        specs += ParamSpec(s"dw$g", inDim, hidden)
        specs += ParamSpec(s"du$g", hidden, hidden)
        specs += ParamSpec(s"db$g", 1, hidden)
      }
      specs += ParamSpec("decCont_w", hidden, math.max(nCont, 1))
      specs += ParamSpec("decCont_b", 1, math.max(nCont, 1))
      vocabSizes.zipWithIndex.foreach { case (v, i) =>
        specs += ParamSpec(s"decCat${i}_w", hidden, v + 1)
        specs += ParamSpec(s"decCat${i}_b", 1, v + 1)
      }
    } else {
      vocabSizes.zipWithIndex.foreach { case (v, i) =>
        specs += ParamSpec(s"headCat${i}_w", hidden, v + 1)
        specs += ParamSpec(s"headCat${i}_b", 1, v + 1)
      }
      specs += ParamSpec("headCont_w", hidden, math.max(nCont, 1))
      specs += ParamSpec("headCont_b", 1, math.max(nCont, 1))
      specs += ParamSpec("headPool_w", outDim, math.max(nCont, 1))
      specs += ParamSpec("headPool_b", 1, math.max(nCont, 1))
    }
    new ParamLayout(specs.result())
  }

  def initParams(): Array[Double] = {
    val lay = layout
    val rng = new scala.util.Random(seed)
    val a = new Array[Double](lay.totalSize)
    lay.specs.foreach { s =>
      val (off, _) = lay.offsets(s.name)
      if (s.name == "bf" || s.name == "dbf")
        for (i <- 0 until s.size) a(off + i) = 1.0 // forget bias
      else if (s.name.matches("d?b[igo]") || s.name.endsWith("_b") || s.name == "ab1") ()
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
    * accumulates parameter gradients. `grad == null` evaluates the loss
    * forward-only; `embedOnly = true` additionally skips the decoder/head
    * forward and returns (0, embedding) straight after the encoder — the
    * serving path, where the decoder loss is pure overhead.
    * Returns (loss, pooledEmbedding). */
  def lossGradEmbed(cfg: LstmAeConfig, lay: ParamLayout, p: Array[Double],
      grad: Array[Double], catCodes: Array[Array[Int]],
      cont: Array[Array[Double]],
      embedOnly: Boolean = false): (Double, Array[Double]) = {
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
    // fin_input order matches the reference: [lstm_to_dense(h_T), context]
    // (unified_encoder.py:257-262, multi_layer_lstm.py:55-63)
    val hProj = (W("l2d_w").t * hN) + V("l2d_b")
    val fused = DenseVector.vertcat(hProj, context)
    val eLin = (W("fuse_w").t * fused) + V("fuse_b")
    val embedding = eLin.map(v => math.max(v, 0.0)) // ReLU
    if (embedOnly) return (0.0, embedding.toArray)

    // ---- heads + loss --------------------------------------------------
    var loss = 0.0
    val dOut = DenseMatrix.zeros[Double](t, h)
    var dEmb = DenseVector.zeros[Double](cfg.outDim)
    var dcSeed = DenseVector.zeros[Double](h) // decoder dC_0 -> encoder c_T
    val doGrad = grad != null

    if (cfg.hasDecoder) {
      // ---- I13/I14/I15 decoder: hidden init (fused embedding, c_T),
      // per-step heads out_cont = ReLU(lin(tanh(h))) + cat logits ---------
      val dhs = DenseMatrix.zeros[Double](t + 1, h)
      val dcs = DenseMatrix.zeros[Double](t + 1, h)
      dhs(0, ::) := embedding.t
      dcs(0, ::) := cs(t, ::)
      val dIn = DenseMatrix.zeros[Double](t, cfg.inDim)
      val dIg = DenseMatrix.zeros[Double](t, h); val dFg = DenseMatrix.zeros[Double](t, h)
      val dGg = DenseMatrix.zeros[Double](t, h); val dOg = DenseMatrix.zeros[Double](t, h)
      val dVec = DenseMatrix.zeros[Double](t, h) // tanh(h_i), lstm_decoder.py:47
      val outCPre = DenseMatrix.zeros[Double](t, math.max(cfg.nCont, 1))
      val outC = DenseMatrix.zeros[Double](t, math.max(cfg.nCont, 1))
      val predCodes = Array.ofDim[Int](t, math.max(nCat, 1))
      val probsCache = Array.ofDim[DenseVector[Double]](t, math.max(nCat, 1))
      for (i <- 0 until t) {
        val x = DenseVector.zeros[Double](cfg.inDim)
        if (i > 0) {
          // teacher: shifted ground truth (model_wrapper.py:183-188);
          // auto: previous prediction re-embedded (model_wrapper.py:74-86)
          var off = 0
          for (c <- 0 until nCat) {
            val table = lay.mat(s"emb$c", p)
            val code0 = if (cfg.decoder == "teacher") catCodes(i - 1)(c) else predCodes(i - 1)(c)
            val code = math.min(math.max(code0, 0), table.rows - 1)
            x(off until off + embDims(c)) := table(code, ::).t
            off += embDims(c)
          }
          for (c <- 0 until cfg.nCont)
            x(embDims.sum + c) =
              if (cfg.decoder == "teacher") cont(i - 1)(c) else outC(i - 1, c)
        }
        dIn(i, ::) := x.t
        val hp = dhs(i, ::).t
        val iv = sigmoid(W("dwi").t * x + W("dui").t * hp + V("dbi"))
        val fv = sigmoid(W("dwf").t * x + W("duf").t * hp + V("dbf"))
        val gv = tanh(W("dwg").t * x + W("dug").t * hp + V("dbg"))
        val ov = sigmoid(W("dwo").t * x + W("duo").t * hp + V("dbo"))
        val cv = (fv *:* dcs(i, ::).t) + (iv *:* gv)
        dIg(i, ::) := iv.t; dFg(i, ::) := fv.t; dGg(i, ::) := gv.t; dOg(i, ::) := ov.t
        dcs(i + 1, ::) := cv.t
        dhs(i + 1, ::) := (ov *:* tanh(cv)).t
        val d = tanh(dhs(i + 1, ::).t)
        dVec(i, ::) := d.t
        for (c <- 0 until nCat) {
          val w = W(s"decCat${c}_w"); val b = V(s"decCat${c}_b")
          val logits = (w.t * d) + b
          val lmx = breeze.linalg.max(logits)
          val e = exp(logits - lmx)
          val probs = e / sum(e)
          probsCache(i)(c) = probs
          predCodes(i)(c) = breeze.linalg.argmax(logits)
          val y = math.min(math.max(catCodes(i)(c), 0), w.cols - 1)
          loss += -math.log(math.max(probs(y), 1e-12)) / t
        }
        if (cfg.nCont > 0) {
          val pre = (W("decCont_w").t * d) + V("decCont_b")
          outCPre(i, ::) := pre.t
          val oc = pre.map(v => math.max(v, 0.0)) // out_cont = relu(lin(d))
          outC(i, ::) := oc.t
          val err = oc - DenseVector.tabulate(cfg.nCont)(j => cont(i)(j))
          loss += sum(err *:* err) / (2.0 * t)
        }
      }
      if (!doGrad) return (loss, embedding.toArray)
      // ---- decoder backward (reverse BPTT, input-chain routing) --------
      var ddhNext = DenseVector.zeros[Double](h)
      var ddcNext = DenseVector.zeros[Double](h)
      val dOutCExtra = DenseMatrix.zeros[Double](t, math.max(cfg.nCont, 1))
      for (i <- (t - 1) to 0 by -1) {
        val d = dVec(i, ::).t
        val dD = DenseVector.zeros[Double](h)
        for (c <- 0 until nCat) {
          val w = W(s"decCat${c}_w")
          val y = math.min(math.max(catCodes(i)(c), 0), w.cols - 1)
          val dLogits = probsCache(i)(c).copy
          dLogits(y) -= 1.0
          dLogits :/= t.toDouble
          lay.mat(s"decCat${c}_w", grad) :+= d * dLogits.t
          lay.vec(s"decCat${c}_b", grad) :+= dLogits
          dD :+= w * dLogits
        }
        if (cfg.nCont > 0) {
          val err = DenseVector.tabulate(cfg.nCont)(j => outC(i, j) - cont(i)(j))
          val dOc = (err / t.toDouble) + dOutCExtra(i, ::).t
          val dPre = DenseVector.tabulate(cfg.nCont)(j =>
            if (outCPre(i, j) > 0) dOc(j) else 0.0)
          lay.mat("decCont_w", grad) :+= d * dPre.t
          lay.vec("decCont_b", grad) :+= dPre
          dD :+= W("decCont_w") * dPre
        }
        val dh = (dD *:* (1.0 - (d *:* d))) + ddhNext
        val cv = dcs(i + 1, ::).t
        val tc = tanh(cv)
        val ov = dOg(i, ::).t; val iv = dIg(i, ::).t
        val fv = dFg(i, ::).t; val gv = dGg(i, ::).t
        val dO = dh *:* tc *:* ov *:* (1.0 - ov)
        val dC = (dh *:* ov *:* (1.0 - (tc *:* tc))) + ddcNext
        val dF = dC *:* dcs(i, ::).t *:* fv *:* (1.0 - fv)
        val dI = dC *:* gv *:* iv *:* (1.0 - iv)
        val dG = dC *:* iv *:* (1.0 - (gv *:* gv))
        val x = dIn(i, ::).t
        val hp = dhs(i, ::).t
        for ((gate, dGate) <- Seq(("i", dI), ("f", dF), ("g", dG), ("o", dO))) {
          lay.mat(s"dw$gate", grad) :+= x * dGate.t
          lay.mat(s"du$gate", grad) :+= hp * dGate.t
          lay.vec(s"db$gate", grad) :+= dGate
        }
        val dX = W("dwi") * dI + W("dwf") * dF + W("dwg") * dG + W("dwo") * dO
        ddhNext = W("dui") * dI + W("duf") * dF + W("dug") * dG + W("duo") * dO
        ddcNext = dC *:* fv
        if (i > 0) {
          // route input grad to its producers: embedding-table rows (the
          // looked-up — teacher truth / auto argmax — codes) and, in auto
          // mode, the previous step's out_cont through its ReLU
          var off = 0
          for (c <- 0 until nCat) {
            val tableG = lay.mat(s"emb$c", grad)
            val code0 = if (cfg.decoder == "teacher") catCodes(i - 1)(c) else predCodes(i - 1)(c)
            val code = math.min(math.max(code0, 0), tableG.rows - 1)
            tableG(code, ::) :+= dX(off until off + embDims(c)).t
            off += embDims(c)
          }
          if (cfg.decoder == "auto")
            for (c <- 0 until cfg.nCont)
              dOutCExtra(i - 1, c) += dX(embDims.sum + c)
        }
      }
      // seeds into the encoder: h_0 = fused embedding, c_0 = encoder c_T
      dEmb :+= ddhNext
      dcSeed = ddcNext
    } else {
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
    }
    if (!doGrad) return (loss, embedding.toArray)

    // ---- backward: fuse + attention -----------------------------------
    val dELin = dEmb *:* eLin.map(v => if (v > 0) 1.0 else 0.0) // ReLU'
    lay.mat("fuse_w", grad) :+= fused * dELin.t
    lay.vec("fuse_b", grad) :+= dELin
    val dFused = W("fuse_w") * dELin
    val dHProj = dFused(0 until h)
    val dContext = dFused(h until 2 * h)
    lay.mat("l2d_w", grad) :+= hN * dHProj.t
    lay.vec("l2d_b", grad) :+= dHProj
    val dHN = W("l2d_w") * dHProj
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
    var dcNext = dcSeed // decoder c_0 = encoder c_T (zero without decoder)
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

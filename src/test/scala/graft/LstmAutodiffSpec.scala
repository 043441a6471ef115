package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.nn.{LstmAE, LstmAeConfig}

/** Gradient check for the LSTM training path (BPTT + attention backward). */
class LstmAutodiffSpec extends AnyFunSuite {

  private val cfg = LstmAeConfig(hidden = 5, outDim = 4, attnDim = 3,
    seqLen = 3, vocabSizes = Seq(4), nCont = 2, seed = 17L)
  private val lay = cfg.layout
  private val cat = Array(Array(1), Array(3), Array(2))
  private val cont = Array(Array(0.3, -0.1), Array(0.8, 0.2), Array(-0.5, 0.4))

  test("BPTT gradients match finite differences on every parameter block") {
    val p = cfg.initParams()
    val grad = new Array[Double](lay.totalSize)
    val (loss0, emb) = LstmAE.lossGradEmbed(cfg, lay, p, grad, cat, cont)
    assert(!loss0.isNaN && loss0 > 0 && emb.length == 4)

    val eps = 1e-6
    val rng = new scala.util.Random(5)
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    lay.specs.foreach { s =>
      val (off, _) = lay.offsets(s.name)
      val picks = Seq.fill(math.min(4, s.size))(off + rng.nextInt(s.size)).distinct
      picks.foreach { idx =>
        val orig = p(idx)
        p(idx) = orig + eps
        val lp = LstmAE.lossGradEmbed(cfg, lay, p, null, cat, cont)._1
        p(idx) = orig - eps
        val lm = LstmAE.lossGradEmbed(cfg, lay, p, null, cat, cont)._1
        p(idx) = orig
        val numeric = (lp - lm) / (2 * eps)
        val analytic = grad(idx)
        val bothTiny = math.abs(numeric) < 1e-8 && math.abs(analytic) < 1e-8
        val denom = math.max(1e-6, math.abs(numeric) + math.abs(analytic))
        val rel = if (bothTiny) 0.0 else math.abs(numeric - analytic) / denom
        if (rel > 1e-4)
          failures += f"${s.name}[$idx]: analytic=$analytic%.8f numeric=$numeric%.8f rel=$rel%.2e"
      }
    }
    assert(failures.isEmpty, s"mismatches:\n${failures.mkString("\n")}")
  }

  private def fdCheck(c: LstmAeConfig, picksPerBlock: Int = 3,
      nsCat: Array[Int] = null, nsCont: Array[Double] = null,
      label: Double = 0.0): Seq[String] = {
    val l = c.layout
    val p = c.initParams()
    val grad = new Array[Double](l.totalSize)
    val (loss0, emb) = LstmAE.lossGradEmbed(c, l, p, grad, cat, cont,
      nsCat, nsCont, label)
    assert(!loss0.isNaN && loss0 > 0 && emb.length == c.outDim)
    val eps = 1e-6
    val rng = new scala.util.Random(9)
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    l.specs.foreach { s =>
      val (off, _) = l.offsets(s.name)
      val picks = Seq.fill(math.min(picksPerBlock, s.size))(off + rng.nextInt(s.size)).distinct
      picks.foreach { idx =>
        val orig = p(idx)
        p(idx) = orig + eps
        val lp = LstmAE.lossGradEmbed(c, l, p, null, cat, cont, nsCat, nsCont, label)._1
        p(idx) = orig - eps
        val lm = LstmAE.lossGradEmbed(c, l, p, null, cat, cont, nsCat, nsCont, label)._1
        p(idx) = orig
        val numeric = (lp - lm) / (2 * eps)
        val analytic = grad(idx)
        val bothTiny = math.abs(numeric) < 1e-8 && math.abs(analytic) < 1e-8
        val denom = math.max(1e-6, math.abs(numeric) + math.abs(analytic))
        val rel = if (bothTiny) 0.0 else math.abs(numeric - analytic) / denom
        // abs floor: FD cancellation noise at eps=1e-6 dominates gradients
        // this small on deep chains; such a disagreement is not a bug signal
        if (rel > 1e-4 && math.abs(numeric - analytic) > 1e-9)
          failures += f"${s.name}[$idx]: analytic=$analytic%.8f numeric=$numeric%.8f rel=$rel%.2e"
      }
    }
    failures.toSeq
  }

  test("I12 multi-layer + bidirectional grid: FD gradients match") {
    // every (layers, bidir) combination beyond the default, including with
    // a decoder riding on the top fwd cell's c_T
    for ((nl, bd) <- Seq((2, false), (1, true), (2, true), (3, true))) {
      val f = fdCheck(cfg.copy(numLayers = nl, bidirectional = bd, seed = 41L + nl))
      assert(f.isEmpty, s"layers=$nl bidir=$bd mismatches:\n${f.mkString("\n")}")
    }
    val fDec = fdCheck(cfg.copy(outDim = 5, decoder = "teacher",
      numLayers = 2, bidirectional = true, seed = 47L))
    assert(fDec.isEmpty, s"decoder layers=2 bidir mismatches:\n${fDec.mkString("\n")}")
  }

  test("inter-layer dropout: FD gradients match at dropout=0.2 (fixed masks)") {
    // fixed dropSeed = identical masks every call, so FD is exact; proves
    // the BPTT routes grads through the same inter-layer masks the forward
    // drew. Also: serving (embedOnly) is mask-free.
    val c = cfg.copy(numLayers = 2, bidirectional = true, dropout = 0.2, seed = 61L)
    val l = c.layout
    val p = c.initParams()
    val grad = new Array[Double](l.totalSize)
    val (loss0, _) = LstmAE.lossGradEmbed(c, l, p, grad, cat, cont, dropSeed = 7L)
    assert(!loss0.isNaN && loss0 > 0)
    val eps = 1e-6
    val rng = new scala.util.Random(13)
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    l.specs.foreach { s =>
      val (off, _) = l.offsets(s.name)
      val picks = Seq.fill(math.min(3, s.size))(off + rng.nextInt(s.size)).distinct
      picks.foreach { idx =>
        val orig = p(idx)
        p(idx) = orig + eps
        val lp = LstmAE.lossGradEmbed(c, l, p, null, cat, cont, dropSeed = 7L)._1
        p(idx) = orig - eps
        val lm = LstmAE.lossGradEmbed(c, l, p, null, cat, cont, dropSeed = 7L)._1
        p(idx) = orig
        val numeric = (lp - lm) / (2 * eps)
        val analytic = grad(idx)
        val bothTiny = math.abs(numeric) < 1e-8 && math.abs(analytic) < 1e-8
        val denom = math.max(1e-6, math.abs(numeric) + math.abs(analytic))
        val rel = if (bothTiny) 0.0 else math.abs(numeric - analytic) / denom
        if (rel > 1e-4 && math.abs(numeric - analytic) > 1e-9)
          failures += f"${s.name}[$idx]: analytic=$analytic%.8f numeric=$numeric%.8f rel=$rel%.2e"
      }
    }
    assert(failures.isEmpty, s"dropout FD mismatches:\n${failures.mkString("\n")}")
    // serving ignores dropout: embedOnly output matches the dropout-free config
    val e1 = LstmAE.lossGradEmbed(c, l, p, null, cat, cont, embedOnly = true)._2
    val e2 = LstmAE.lossGradEmbed(c.copy(dropout = 0.0), l, p, null, cat, cont,
      embedOnly = true)._2
    assert(e1.toSeq == e2.toSeq)
  }

  test("I12 bidirectional embedding differs from unidirectional (uses both ends)") {
    val uni = cfg.copy(seed = 51L)
    val bid = cfg.copy(bidirectional = true, seed = 51L)
    val eUni = LstmAE.lossGradEmbed(uni, uni.layout, uni.initParams(), null, cat, cont)._2
    val eBid = LstmAE.lossGradEmbed(bid, bid.layout, bid.initParams(), null, cat, cont)._2
    assert(eUni.length == cfg.outDim && eBid.length == cfg.outDim)
    assert(eUni.toSeq != eBid.toSeq)
  }

  test("I11 ConvAggregation: tanh-conv + max-pool matches a hand computation") {
    import breeze.linalg.DenseMatrix
    // identity-diagonal kernel, stride (1,1), pool (2,2), bias 0:
    // conv(i,j) = tanh(x(i,j) + x(i+1,j+1)); output = max over 2x2 blocks
    val ca = graft.nn.ConvAgg(DenseMatrix((1.0, 0.0), (0.0, 1.0)), bias = 0.0,
      strideT = 1, strideF = 1, poolT = 2, poolF = 2)
    val x = DenseMatrix(
      (1.0, 0.0, 2.0, 1.0, 0.5),
      (0.0, 1.0, 0.0, 0.0, 1.0),
      (2.0, 0.0, 1.0, 3.0, 0.0),
      (0.0, 2.0, 0.0, 0.0, 1.0),
      (1.0, 0.0, 1.0, 0.0, 2.0))
    val out = ca.forward(x)
    assert(out.rows == 2 && out.cols == 2 && ca.outShape(5, 5) == (2, 2))
    def c(i: Int, j: Int) = math.tanh(x(i, j) + x(i + 1, j + 1))
    val want = Seq(
      (0, 0, Seq(c(0, 0), c(0, 1), c(1, 0), c(1, 1)).max),
      (0, 1, Seq(c(0, 2), c(0, 3), c(1, 2), c(1, 3)).max),
      (1, 0, Seq(c(2, 0), c(2, 1), c(3, 0), c(3, 1)).max),
      (1, 1, Seq(c(2, 2), c(2, 3), c(3, 2), c(3, 3)).max))
    for ((i, j, v) <- want)
      assert(math.abs(out(i, j) - v) < 1e-12, s"out($i,$j)=${out(i, j)} want $v")
  }

  test("I11 gate end-to-end: conv-aggregated encoder emits a finite embedding") {
    val w = graft.nn.LstmEncoderWeights.init(hidden = 6, outDim = 5,
      vocabSizes = Seq(5), nCont = 8, useConvAgg = true,
      convKernel = (3, 3), convStride = (1, 1), convPool = (2, 2))
    val t = 8
    val cat8 = Array.fill(t)(Array(1))
    val cont8 = Array.tabulate(t)(i => Array.tabulate(8)(j => (i * 8 + j) / 10.0))
    val e = w.forward(cat8, cont8)
    assert(e.length == 5 && e.forall(v => !v.isNaN && !v.isInfinite))
    // the LSTM consumed the REDUCED sequence: cell input width = conv width
    val convW = w.convAgg.get.outShape(t, w.catEmbeddings.map(_.cols).sum + 8)._2
    assert(w.cells.head.head.wi.rows == convW)
  }

  test("I15 teacher-forced decoder: BPTT gradients match finite differences") {
    val f = fdCheck(cfg.copy(outDim = 5, decoder = "teacher", seed = 27L))
    assert(f.isEmpty, s"teacher-decoder mismatches:\n${f.mkString("\n")}")
  }

  test("I14 autoregressive decoder: gradients match FD; argmax path constant") {
    val f = fdCheck(cfg.copy(outDim = 5, decoder = "auto", seed = 29L))
    assert(f.isEmpty, s"auto-decoder mismatches:\n${f.mkString("\n")}")
  }

  test("I14/I15 decoders: SGD reduces the reconstruction loss") {
    for (mode <- Seq("teacher", "auto")) {
      val c = cfg.copy(outDim = 5, decoder = mode, seed = 33L)
      val l = c.layout
      val p = c.initParams()
      var first = 0.0; var last = Double.MaxValue
      for (it <- 0 until 400) {
        val g = new Array[Double](l.totalSize)
        val lo = LstmAE.lossGradEmbed(c, l, p, g, cat, cont)._1
        if (it == 0) first = lo
        last = lo
        for (i <- p.indices) p(i) -= 0.05 * g(i)
      }
      assert(last < first * 0.7, s"$mode: loss $first -> $last")
    }
  }

  private val nsCatFix = Array(2, 0)
  private val nsContFix = Array(0.4, -0.7)

  test("I11 non-seq fuse branch: FD gradients flow through ns MLP + embeddings") {
    // the round-7 ADVICE gap: configured ns features must TRAIN, not just
    // serve — every ns block (nsemb*, ns_w/b/g/beta) and the widened fuse
    // must match finite differences
    val c = cfg.copy(nonSeqVocabSizes = Seq(3, 4), nNonSeqCont = 2, nsMlpDim = 4,
      seed = 71L)
    assert(c.layout.specs.exists(_.name == "ns_w"))
    assert(c.layout.specs.exists(_.name == "nsemb1"))
    val f = fdCheck(c, nsCat = nsCatFix, nsCont = nsContFix)
    assert(f.isEmpty, s"ns-branch mismatches:\n${f.mkString("\n")}")
    // ns inputs actually reach the embedding (not silently dropped)
    val l = c.layout; val p = c.initParams()
    val e1 = LstmAE.lossGradEmbed(c, l, p, null, cat, cont,
      nsCatFix, nsContFix, embedOnly = true)._2
    val e2 = LstmAE.lossGradEmbed(c, l, p, null, cat, cont,
      Array(1, 3), Array(-0.2, 0.9), embedOnly = true)._2
    assert(e1.toSeq != e2.toSeq, "ns inputs must influence the embedding")
  }

  test("I11 non-seq branch composes with the teacher decoder (FD)") {
    val c = cfg.copy(outDim = 5, decoder = "teacher",
      nonSeqVocabSizes = Seq(3), nNonSeqCont = 1, nsMlpDim = 4, seed = 73L)
    val f = fdCheck(c, nsCat = Array(1), nsCont = Array(0.6))
    assert(f.isEmpty, s"ns+teacher mismatches:\n${f.mkString("\n")}")
  }

  test("I14 auto decoder decodes ns features from the embedding (FD)") {
    // model_wrapper.py:55-58,114-118: mlp_non_seq_cont / mlp_non_seq_cat_list
    val c = cfg.copy(outDim = 5, decoder = "auto",
      nonSeqVocabSizes = Seq(3), nNonSeqCont = 2, nsMlpDim = 4, seed = 79L)
    assert(c.layout.specs.exists(_.name == "nsDecCont_w"))
    assert(c.layout.specs.exists(_.name == "nsDecCat0_w"))
    val f = fdCheck(c, nsCat = Array(2), nsCont = Array(0.3, -0.4))
    assert(f.isEmpty, s"auto+ns-decode mismatches:\n${f.mkString("\n")}")
  }

  test("I16 churn decoder: BCE head FD-checked, both labels, encoder unfrozen") {
    for (y <- Seq(0.0, 1.0)) {
      val c = cfg.copy(decoder = "churn", seed = 83L)
      assert(c.layout.specs.exists(_.name == "churn_w"))
      // no reconstruction heads in churn mode
      assert(!c.layout.specs.exists(_.name.startsWith("headCat")))
      val f = fdCheck(c, label = y)
      assert(f.isEmpty, s"churn label=$y mismatches:\n${f.mkString("\n")}")
    }
    // gradients reach the encoder (unfrozen fine-tune, model_wrapper.py:140-155)
    val c = cfg.copy(decoder = "churn", seed = 83L)
    val l = c.layout; val p = c.initParams()
    val g = new Array[Double](l.totalSize)
    LstmAE.lossGradEmbed(c, l, p, g, cat, cont, label = 1.0)
    val (off, _) = l.offsets("wi")
    assert((0 until 5 * 5).exists(i => math.abs(g(off + i)) > 1e-12),
      "churn gradients must flow into the LSTM cells")
  }

  test("I16 churn SGD drives the BCE loss toward the label") {
    val c = cfg.copy(decoder = "churn", seed = 89L)
    val l = c.layout
    val p = c.initParams()
    var first = 0.0; var last = Double.MaxValue
    for (it <- 0 until 200) {
      val g = new Array[Double](l.totalSize)
      val lo = LstmAE.lossGradEmbed(c, l, p, g, cat, cont, label = 1.0)._1
      if (it == 0) first = lo
      last = lo
      for (i <- p.indices) p(i) -= 0.1 * g(i)
    }
    assert(last < first * 0.5 && last < 0.2, s"churn loss $first -> $last")
  }

  test("I4 Bahdanau fidelity: attnDim=0 gives the faithful widths; FD green") {
    val c = cfg.copy(attnDim = 0, seed = 91L) // faithful: score width = hidden
    val l = c.layout
    assert(l.specs.find(_.name == "aw1").get.cols == c.hidden)
    assert(!l.specs.exists(_.name == "ab1"), "no input bias in faithful mode")
    assert(l.specs.exists(_.name == "avb"), "attnHidden keeps its scalar bias")
    val f = fdCheck(c)
    assert(f.isEmpty, s"faithful-Bahdanau mismatches:\n${f.mkString("\n")}")
    // generalized opt-in form still works (input bias + free width)
    val cg = cfg.copy(attnInputBias = true, seed = 93L)
    assert(cg.layout.specs.exists(_.name == "ab1"))
    val fg = fdCheck(cg)
    assert(fg.isEmpty, s"generalized-Bahdanau mismatches:\n${fg.mkString("\n")}")
  }

  test("I5 MHA wrapper dropout: FD green at dropout=0.2; serving mask-free") {
    // attention_mechanisms.py:64,95 — dropout on the attention weights
    // before @V and on the attention output before the residual add; fixed
    // dropSeed makes the FD secant exact through both masks
    val c = cfg.copy(hidden = 6, outDim = 4, attnHeads = 2, dropout = 0.2,
      numLayers = 2, bidirectional = true, seed = 103L)
    val f = fdCheck(c)
    assert(f.isEmpty, s"MHA dropout mismatches:\n${f.mkString("\n")}")
    // serving (embedOnly) ignores the MHA dropouts like every other mask
    val l = c.layout
    val p = c.initParams()
    val e1 = LstmAE.lossGradEmbed(c, l, p, null, cat, cont, embedOnly = true)._2
    val e2 = LstmAE.lossGradEmbed(c.copy(dropout = 0.0), l, p, null, cat, cont,
      embedOnly = true)._2
    assert(e1.toSeq == e2.toSeq)
  }

  test("I5 MHA attention path trains: FD green, heads > 1 replaces Bahdanau") {
    // unified_encoder.py:186-192 selects MHA over Bahdanau at heads > 1;
    // the serving twin (Lstm.MhaSumPool) has had this path since round 4 —
    // this makes it TRAINABLE (residual + layernorm + sum-pool backward)
    for ((nl, bd) <- Seq((1, false), (2, true))) {
      val c = cfg.copy(hidden = 6, outDim = 4, attnHeads = 2,
        numLayers = nl, bidirectional = bd, seed = 97L + nl)
      val l = c.layout
      assert(l.specs.exists(_.name == "mq_w") && !l.specs.exists(_.name == "aw1"))
      val f = fdCheck(c)
      assert(f.isEmpty, s"MHA layers=$nl bidir=$bd mismatches:\n${f.mkString("\n")}")
    }
    // composes with the decoder and the ns branch
    val c = cfg.copy(hidden = 6, outDim = 6, attnHeads = 3, decoder = "teacher",
      nonSeqVocabSizes = Seq(3), nNonSeqCont = 1, nsMlpDim = 4, seed = 101L)
    val f = fdCheck(c, nsCat = Array(1), nsCont = Array(0.5))
    assert(f.isEmpty, s"MHA+decoder+ns mismatches:\n${f.mkString("\n")}")
  }

  test("J11 Capacity.lstmEncoderParams matches the faithful layout") {
    val encoderBlock = (n: String) => !(n.startsWith("headC") ||
      n.startsWith("headP") || n.startsWith("dec") || n.startsWith("nsDec") ||
      n.startsWith("churn") || n.startsWith("dw") || n.startsWith("du") ||
      n.startsWith("db"))
    for ((nl, bd, nsv, nsc) <- Seq(
        (1, false, Seq(3L, 4L), 2), (2, true, Nil: Seq[Long], 0), (2, false, Seq(5L), 1))) {
      val c = cfg.copy(attnDim = 0, numLayers = nl, bidirectional = bd,
        nonSeqVocabSizes = nsv.map(_.toInt), nNonSeqCont = nsc, nsMlpDim = 4)
      val got = c.layout.specs.filter(s => encoderBlock(s.name)).map(_.size.toLong).sum
      val want = graft.analyze.Capacity.lstmEncoderParams(
        c.vocabSizes.map(_.toLong), c.nCont, c.hidden, c.outDim,
        numLayers = nl, bidirectional = bd,
        nonSeqVocabSizes = nsv, nNonSeqCont = nsc, nsMlpDim = 4)
      assert(got == want, s"layers=$nl bidir=$bd: layout=$got formula=$want")
    }
    // MHA attention mode (heads > 1) counted too
    val cm = cfg.copy(hidden = 6, outDim = 4, attnHeads = 2, bidirectional = true)
    val gotM = cm.layout.specs.filter(s => encoderBlock(s.name)).map(_.size.toLong).sum
    val wantM = graft.analyze.Capacity.lstmEncoderParams(
      cm.vocabSizes.map(_.toLong), cm.nCont, cm.hidden, cm.outDim,
      bidirectional = true, attnHeads = 2)
    assert(gotM == wantM, s"MHA: layout=$gotM formula=$wantM")
  }

  test("SGD on one example reduces the loss substantially") {
    val p = cfg.initParams()
    var first = 0.0; var last = Double.MaxValue
    for (it <- 0 until 200) {
      val g = new Array[Double](lay.totalSize)
      val l = LstmAE.lossGradEmbed(cfg, lay, p, g, cat, cont)._1
      if (it == 0) first = l
      last = l
      for (i <- p.indices) p(i) -= 0.1 * g(i)
    }
    assert(last < first * 0.5, s"loss $first -> $last")
  }

  test("I1 pretrained embeddings (LSTM arch): injected, frozen under Adam") {
    val dim = cfg.embDims.head
    val vecs = Array.tabulate(cfg.vocabSizes.head + 1, dim)((r, c) =>
      0.02 * (r * dim + c) - 0.05)
    val pre = cfg.copy(pretrainedEmb = Map(0 -> vecs))
    val p = pre.initParams()
    val emb = lay.mat("emb0", p)
    for (r <- vecs.indices; c <- 0 until dim) assert(emb(r, c) == vecs(r)(c))
    // non-emb blocks identical to vanilla init (rng stream untouched)
    val p0 = cfg.initParams()
    lay.specs.filterNot(_.name == "emb0").foreach { s =>
      val (off, _) = lay.offsets(s.name)
      for (i <- 0 until s.size) assert(p(off + i) == p0(off + i))
    }
    val grad = new Array[Double](lay.totalSize)
    LstmAE.lossGradEmbed(pre, lay, p, grad, cat, cont)
    val (embOff, embSpec) = lay.offsets("emb0")
    assert((embOff until embOff + embSpec.size).exists(grad(_) != 0.0))
    val before = p.clone()
    new graft.train.Adam(lay.totalSize, frozen = pre.frozenRanges).step(p, grad, 1e-2)
    for (i <- embOff until embOff + embSpec.size) assert(p(i) == before(i))
    assert(p.indices.exists(i => p(i) != before(i)))
    assert(pre.copy(freezePretrained = false).frozenRanges.isEmpty)
  }
}

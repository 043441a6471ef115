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

  private def fdCheck(c: LstmAeConfig, picksPerBlock: Int = 3): Seq[String] = {
    val l = c.layout
    val p = c.initParams()
    val grad = new Array[Double](l.totalSize)
    val (loss0, emb) = LstmAE.lossGradEmbed(c, l, p, grad, cat, cont)
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
        val lp = LstmAE.lossGradEmbed(c, l, p, null, cat, cont)._1
        p(idx) = orig - eps
        val lm = LstmAE.lossGradEmbed(c, l, p, null, cat, cont)._1
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
}

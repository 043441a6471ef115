package graft

import org.scalatest.funsuite.AnyFunSuite
import breeze.linalg.DenseMatrix
import graft.nn.{AeConfig, TransformerAE}

/** IG sanity: the completeness axiom and the seeded input-grad path. */
class ExplainerSpec extends AnyFunSuite {

  private val cfg = AeConfig(dModel = 4, heads = 2, layers = 1, pf = 3,
    seqLen = 2, vocabSizes = Seq(3), nCont = 2, seed = 5L)
  private val lay = cfg.layout
  private val cat = Array(Array(1), Array(2))

  private def outputAt(cont: Array[Array[Double]], dim: Int): Double =
    TransformerAE.embedDouble(cfg, lay, p, cat, cont)(dim)

  private val p = cfg.initParams()

  test("seeded backward input-grad matches finite differences") {
    val cont = Array(Array(0.4, -0.2), Array(0.1, 0.7))
    val seed = DenseMatrix.zeros[Double](2, 4); seed(1, 2) = 1.0 // output dim 6
    val gradOut = Array.ofDim[Double](2, 2)
    TransformerAE.lossAndGrad(cfg, lay, p, new Array[Double](lay.totalSize),
      cat, cont, encSeed = seed, contGradOut = gradOut)
    val eps = 1e-6
    for (i <- 0 until 2; j <- 0 until 2) {
      val up = cont.map(_.clone()); up(i)(j) += eps
      val dn = cont.map(_.clone()); dn(i)(j) -= eps
      val numeric = (outputAt(up, 6) - outputAt(dn, 6)) / (2 * eps)
      assert(math.abs(numeric - gradOut(i)(j)) < 1e-4,
        s"($i,$j): analytic=${gradOut(i)(j)} numeric=$numeric")
    }
  }

  test("IG completeness incl. cat embeddings: attributions sum ~ f(x) - f(0)") {
    // joint interpolation of cat EMBEDDINGS and cont features toward the
    // zero baseline, exactly as Explainer.integratedGradients does. ReLU
    // kinks make the midpoint rule O(1/steps), hence the high step count.
    val cont = Array(Array(0.4, -0.2), Array(0.1, 0.7))
    val zero = Array(Array(0.0, 0.0), Array(0.0, 0.0))
    val dim = 6
    val steps = 512
    val embSum = cfg.embDims.sum
    val seed = DenseMatrix.zeros[Double](2, 4); seed(dim / 4, dim % 4) = 1.0
    // the row's embedding endpoint
    val embX = DenseMatrix.zeros[Double](2, embSum)
    for (i <- 0 until 2)
      embX(i, 0 until embSum) := lay.mat("emb0", p)(cat(i)(0), ::)
    var total = 0.0
    val gradOut = Array.ofDim[Double](2, 2)
    val gradEmb = DenseMatrix.zeros[Double](2, embSum)
    for (k <- 1 to steps) {
      val a = (k - 0.5) / steps // midpoint rule, matches Explainer
      val xi = Array.tabulate(2, 2)((i, j) => cont(i)(j) * a)
      TransformerAE.lossAndGrad(cfg, lay, p, new Array[Double](lay.totalSize),
        cat, xi, encSeed = seed, contGradOut = gradOut,
        seqEmbInput = embX * a, seqEmbGradOut = gradEmb)
      for (i <- 0 until 2; j <- 0 until 2) total += cont(i)(j) * gradOut(i)(j) / steps
      for (i <- 0 until 2; j <- 0 until embSum) total += embX(i, j) * gradEmb(i, j) / steps
    }
    // f(baseline): zero embeddings emulated by zeroing the looked-up rows
    val p0 = p.clone()
    for (code <- Seq(1, 2)) lay.mat("emb0", p0)(code, ::) := 0.0
    val delta = outputAt(cont, dim) -
      TransformerAE.embedDouble(cfg, lay, p0, cat, zero)(dim)
    assert(math.abs(total - delta) < 5e-3,
      s"completeness violated: IG sum=$total vs delta=$delta")
  }
}

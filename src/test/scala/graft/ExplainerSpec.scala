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

  test("IG completeness: attributions sum ~ f(x) - f(baseline)") {
    val cont = Array(Array(0.4, -0.2), Array(0.1, 0.7))
    val zero = Array(Array(0.0, 0.0), Array(0.0, 0.0))
    val dim = 6
    val steps = 64
    val seed = DenseMatrix.zeros[Double](2, 4); seed(dim / 4, dim % 4) = 1.0
    var total = 0.0
    val gradOut = Array.ofDim[Double](2, 2)
    for (k <- 1 to steps) {
      val a = (k - 0.5) / steps // midpoint rule, matches Explainer
      val xi = Array.tabulate(2, 2)((i, j) => cont(i)(j) * a)
      TransformerAE.lossAndGrad(cfg, lay, p, new Array[Double](lay.totalSize),
        cat, xi, encSeed = seed, contGradOut = gradOut)
      for (i <- 0 until 2; j <- 0 until 2) total += cont(i)(j) * gradOut(i)(j) / steps
    }
    val delta = outputAt(cont, dim) - outputAt(zero, dim)
    assert(math.abs(total - delta) < 5e-3,
      s"completeness violated: IG sum=$total vs delta=$delta")
  }
}

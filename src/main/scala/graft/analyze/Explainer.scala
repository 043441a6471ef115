package graft.analyze

import breeze.linalg.DenseMatrix
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._
import graft.nn.{AeConfig, TransformerAE}

/**
 * K4 explainability: Integrated Gradients over the transformer encoder
 * (reference CASPRExplainer, explain/CASPRExplainer.py:25-395 — captum
 * IntegratedGradients with interpretable-embedding indirection).
 *
 * Round-1 scope: attributions for the CONTINUOUS sequence features toward a
 * chosen embedding output dimension. IG = (x - x0) * mean_k grad(x0 +
 * k/m (x - x0)); the gradient comes from the gradient-checked backward
 * (Autodiff) seeded with a one-hot in encoder space. Baseline x0 = zero
 * cont features with the observed cat codes (the reference's zero-tensor
 * baseline, CASPRExplainer.py:194-239). Per-cat-col attribution (summing
 * embedding-dim grads, :138-158) lands with embedding-space interpolation
 * in a later round.
 *
 * Distributed shape: per-row mapPartitions with broadcast params — m+1
 * forwards+backwards per row, embarrassingly parallel.
 */
object Explainer {

  /**
   * Adds `attributions: array<double>` (length T*nCont, row-major) for the
   * given flattened output dimension `targetDim` of the (T x d) encoder
   * output.
   */
  def integratedGradients(wide: DataFrame, cfg: AeConfig, params: Array[Double],
      idCol: String, seqCatCols: Seq[Seq[String]], seqContCols: Seq[Seq[String]],
      targetDim: Int, steps: Int = 8): DataFrame = {
    val spark = wide.sparkSession
    val lay = cfg.layout
    val bc = spark.sparkContext.broadcast(params)
    val t = cfg.seqLen
    val nCont = seqContCols.size
    val catIdx = seqCatCols.map(_.map(wide.schema.fieldIndex))
    val contIdx = seqContCols.map(_.map(wide.schema.fieldIndex))
    val idIdx = wide.schema.fieldIndex(idCol)
    val outSchema = StructType(Seq(wide.schema(idIdx),
      StructField("attributions", ArrayType(DoubleType, containsNull = false))))

    wide.mapPartitions { rows =>
      val p = bc.value
      val seed = DenseMatrix.zeros[Double](t, cfg.dModel)
      seed(targetDim / cfg.dModel, targetDim % cfg.dModel) = 1.0
      rows.map { row =>
        val cat = Array.tabulate(t, catIdx.size) { (ts, c) =>
          val v = row.get(catIdx(c)(ts))
          if (v == null) 0 else v.asInstanceOf[Number].intValue()
        }
        val x = Array.tabulate(t, nCont) { (ts, c) =>
          val v = row.get(contIdx(c)(ts))
          if (v == null) 0.0 else v.asInstanceOf[Number].doubleValue()
        }
        val acc = Array.ofDim[Double](t, nCont)
        val scratch = new Array[Double](lay.totalSize)
        val gradOut = Array.ofDim[Double](t, nCont)
        for (k <- 1 to steps) {
          val alpha = (k - 0.5) / steps // midpoint rule: O(1/steps^2) error
          val xi = Array.tabulate(t, nCont)((i, j) => x(i)(j) * alpha)
          java.util.Arrays.fill(scratch, 0.0)
          TransformerAE.lossAndGrad(cfg, lay, p, scratch, cat, xi,
            encSeed = seed, contGradOut = gradOut)
          for (i <- 0 until t; j <- 0 until nCont) acc(i)(j) += gradOut(i)(j)
        }
        val attr = new Array[Double](t * nCont)
        var idx = 0
        for (i <- 0 until t; j <- 0 until nCont) {
          attr(idx) = x(i)(j) * acc(i)(j) / steps
          idx += 1
        }
        Row(row.get(idIdx), attr)
      }
    }(Encoders.row(outSchema))
  }
}

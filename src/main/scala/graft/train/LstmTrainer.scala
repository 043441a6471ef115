package graft.train

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._
import graft.nn.{LstmAE, LstmAeConfig}

/**
 * Distributed LSTM-encoder training (SURVEY.md §2.I11/I12): the same
 * [[EpochLoop]] harness as [[TransformerTrainer]] (reference-style
 * multi-step epochs; see its scaladoc for the `examplesPerEpoch` budget
 * semantics), over the BPTT-gradient-checked [[LstmAE]].
 */
object LstmTrainer {

  final case class Result(cfg: LstmAeConfig, params: Array[Double],
      losses: Seq[Double], stoppedAt: Int)

  private def examples(wide: DataFrame, seqCatCols: Seq[Seq[String]],
      seqContCols: Seq[Seq[String]]) = {
    val t = seqCatCols.headOption.map(_.size)
      .orElse(seqContCols.headOption.map(_.size)).getOrElse(0)
    val nCat = seqCatCols.size; val nCont = seqContCols.size
    graft.ml.Ingress.project(wide, wide.columns.head, seqCatCols, seqContCols)
      .rdd.map { row =>
        (graft.ml.Ingress.seqCatOf(row, t, nCat),
         graft.ml.Ingress.seqContOf(row, t, nCat, nCont))
      }
  }

  def fit(wide: DataFrame, cfg: LstmAeConfig,
      seqCatCols: Seq[Seq[String]], seqContCols: Seq[Seq[String]],
      train: TrainConfig, batchSize: Int = 4096,
      examplesPerEpoch: Option[Int] = None): Result = {
    val lay = cfg.layout
    val data = examples(wide, seqCatCols, seqContCols)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val params = cfg.initParams()
    // per-example dropout seed (see TransformerTrainer.fit); probe
    // evaluates with dropout off (inference behavior)
    val lossGradFn = {
      var calls = 0L
      (p: Array[Double], a: Array[Double], ex: (Array[Array[Int]], Array[Array[Double]])) => {
        calls += 1
        val ds = train.seed ^ (calls * 0x9E3779B97F4A7C15L) ^
          java.util.Arrays.deepHashCode(ex._1.asInstanceOf[Array[AnyRef]])
        LstmAE.lossGradEmbed(cfg, lay, p, a, ex._1, ex._2, dropSeed = ds)._1
      }
    }
    val cfgEval = cfg.copy(dropout = 0.0)
    val res = EpochLoop.run(data, params, train, batchSize, examplesPerEpoch,
      lossGradFn,
      lossOnly = Some((p: Array[Double], ex: (Array[Array[Int]], Array[Array[Double]])) =>
        LstmAE.lossGradEmbed(cfgEval, lay, p, null, ex._1, ex._2)._1))
    data.unpersist()
    Result(cfg, params, res.losses, res.stoppedAt)
  }

  /** Score with trained weights: pooled attention-fused embedding. */
  def transform(wide: DataFrame, res: Result, idCol: String,
      seqCatCols: Seq[Seq[String]], seqContCols: Seq[Seq[String]]): DataFrame = {
    val spark = wide.sparkSession
    val lay = res.cfg.layout
    val bc = spark.sparkContext.broadcast(res.params)
    val t = res.cfg.seqLen
    val nCat = seqCatCols.size; val nCont = seqContCols.size
    val proj = graft.ml.Ingress.project(wide, idCol, seqCatCols, seqContCols)
    val outSchema = StructType(Seq(proj.schema(0),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    proj.mapPartitions { rows =>
      val p = bc.value
      rows.map { row =>
        val (_, emb) = LstmAE.lossGradEmbed(res.cfg, lay, p, null,
          graft.ml.Ingress.seqCatOf(row, t, nCat),
          graft.ml.Ingress.seqContOf(row, t, nCat, nCont), embedOnly = true)
        Row(row.get(0), emb.map(_.toFloat))
      }
    }(Encoders.row(outSchema))
  }
}

package graft.train

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._
import graft.nn.{LstmAE, LstmAeConfig}

/**
 * Distributed LSTM-encoder training (SURVEY.md §2.I11/I12): the same
 * broadcast-params + treeAggregate harness as [[TransformerTrainer]], over
 * the BPTT-gradient-checked [[LstmAE]].
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
      train: TrainConfig, batchSize: Int = 4096): Result = {
    val spark = wide.sparkSession
    val lay = cfg.layout
    val data = examples(wide, seqCatCols, seqContCols)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = data.count()
    val fraction =
      if (batchSize <= 0 || total <= batchSize) 1.0
      else math.min(1.0, batchSize * 1.05 / total)
    val params = cfg.initParams()
    val n = lay.totalSize
    val adam = new Adam(n)
    val sched = new LrSchedule(train.lr, train.warmupEpochs)
    val stopper = new EarlyStopping(train.patience, train.delta)
    val losses = scala.collection.mutable.ArrayBuffer[Double]()
    var epoch = 0
    var stopped = false
    while (epoch < train.maxEpochs && !stopped) {
      val bc = spark.sparkContext.broadcast(params)
      val batch =
        if (fraction >= 1.0) data
        else data.sample(withReplacement = false, fraction, train.seed + epoch)
      val zero = new Array[Double](n + 2)
      val acc = batch.treeAggregate(zero)(
        seqOp = (a, ex) => {
          val (loss, _) = LstmAE.lossGradEmbed(cfg, lay, bc.value, a, ex._1, ex._2)
          a(n) += loss; a(n + 1) += 1.0; a
        },
        combOp = (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a })
      bc.destroy()
      val cnt = math.max(acc(n + 1), 1.0)
      val loss = acc(n) / cnt
      val grad = Array.tabulate(n)(i => acc(i) / cnt)
      adam.step(params, grad, sched.lr(epoch))
      sched.observe(loss)
      losses += loss
      stopped = stopper.observe(epoch, loss)
      epoch += 1
    }
    data.unpersist()
    Result(cfg, params, losses.toSeq, epoch)
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
          graft.ml.Ingress.seqContOf(row, t, nCat, nCont))
        Row(row.get(0), emb.map(_.toFloat))
      }
    }(Encoders.row(outSchema))
  }
}

package graft.train

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._
import graft.nn.{AeConfig, TransformerAE}

/**
 * Distributed transformer-autoencoder pretraining (SURVEY.md §3.2): the same
 * broadcast-params + treeAggregate-gradients harness as LinearAutoencoder,
 * driving the gradient-checked TransformerAE backward. Reference lifecycle
 * J1/J2/J4/J5 (train.py:133-193, spark/large/train.py:112-261) with Spark
 * primitives: broadcast = param sync, treeAggregate = allreduce, driver =
 * rank-0 optimizer/scheduler/early-stop.
 *
 * Like the reference (which steps on 32k-row batches, spark/large/
 * train.py:35), each epoch samples a mini-batch of ~`batchSize` examples
 * from the cached example RDD (deterministic per-epoch seed) instead of
 * sweeping the full corpus per optimizer step — sampling is a narrow op
 * against the cache, so the per-epoch cost is proportional to the batch,
 * not the corpus.
 */
object TransformerTrainer {

  final case class Result(cfg: AeConfig, params: Array[Double],
      losses: Seq[Double], stoppedAt: Int)

  private type Example =
    (Array[Array[Int]], Array[Array[Double]], Array[Int], Array[Double])

  /** Extract (T x nCat codes, T x nCont doubles, ns codes, ns doubles)
    * examples via the narrowed positional projection (graft.ml.Ingress) —
    * casts/null-fills run in codegen, extraction is primitive getters. */
  private def examples(wide: DataFrame, seqCatCols: Seq[Seq[String]],
      seqContCols: Seq[Seq[String]],
      nonSeqCatCols: Seq[String], nonSeqContCols: Seq[String]) = {
    val t = seqCatCols.headOption.map(_.size)
      .orElse(seqContCols.headOption.map(_.size)).getOrElse(0)
    val nCat = seqCatCols.size; val nCont = seqContCols.size
    val nNsCat = nonSeqCatCols.size; val nNsCont = nonSeqContCols.size
    val idCol = wide.columns.head // any column works as the ingress anchor
    graft.ml.Ingress.project(wide, idCol, seqCatCols, seqContCols,
        nonSeqCatCols, nonSeqContCols)
      .rdd.map { row =>
        (graft.ml.Ingress.seqCatOf(row, t, nCat),
         graft.ml.Ingress.seqContOf(row, t, nCat, nCont),
         graft.ml.Ingress.nsCatOf(row, t, nCat, nCont, nNsCat),
         graft.ml.Ingress.nsContOf(row, t, nCat, nCont, nNsCat, nNsCont)): Example
      }
  }

  def fit(wide: DataFrame, cfg: AeConfig,
      seqCatCols: Seq[Seq[String]], seqContCols: Seq[Seq[String]],
      train: TrainConfig,
      nonSeqCatCols: Seq[String] = Nil, nonSeqContCols: Seq[String] = Nil,
      batchSize: Int = 4096): Result = {
    val spark = wide.sparkSession
    val lay = cfg.layout
    val data = examples(wide, seqCatCols, seqContCols, nonSeqCatCols, nonSeqContCols)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = data.count()
    // oversample slightly so the expected batch lands at batchSize even
    // after Bernoulli variance; fraction 1 = full-batch (small corpora)
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
          val loss = TransformerAE.lossAndGrad(cfg, lay, bc.value, a, ex._1, ex._2,
            nsCat = ex._3, nsCont = ex._4)
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

  /** Score with trained weights: embedding = flattened encoder output over
    * tEff timesteps (+1 with non-seq features, I8). */
  def transform(wide: DataFrame, res: Result, idCol: String,
      seqCatCols: Seq[Seq[String]], seqContCols: Seq[Seq[String]],
      nonSeqCatCols: Seq[String] = Nil, nonSeqContCols: Seq[String] = Nil): DataFrame = {
    val spark = wide.sparkSession
    val lay = res.cfg.layout
    val bc = spark.sparkContext.broadcast(res.params)
    val t = res.cfg.seqLen
    val nCat = seqCatCols.size; val nCont = seqContCols.size
    val nNsCat = nonSeqCatCols.size; val nNsCont = nonSeqContCols.size
    val proj = graft.ml.Ingress.project(wide, idCol, seqCatCols, seqContCols,
      nonSeqCatCols, nonSeqContCols)
    val outSchema = StructType(Seq(proj.schema(0),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    proj.mapPartitions { rows =>
      val p = bc.value
      rows.map { row =>
        Row(row.get(0), TransformerAE.embed(res.cfg, lay, p,
          graft.ml.Ingress.seqCatOf(row, t, nCat),
          graft.ml.Ingress.seqContOf(row, t, nCat, nCont),
          graft.ml.Ingress.nsCatOf(row, t, nCat, nCont, nNsCat),
          graft.ml.Ingress.nsContOf(row, t, nCat, nCont, nNsCat, nNsCont)))
      }
    }(Encoders.row(outSchema))
  }
}

package graft.train

import org.apache.spark.rdd.RDD
import org.apache.spark.storage.StorageLevel

/**
 * Distributed epoch loop shared by every trainer (LinearAutoencoder,
 * TransformerTrainer, LstmTrainer): broadcast params -> executors
 * accumulate per-partition (gradientSum ++ lossSum ++ count) ->
 * treeAggregate -> driver applies Adam + warmup/plateau schedule + early
 * stopping. This is MLlib's own optimization pattern (e.g. LBFGS),
 * replacing the reference's Horovod-allreduce/Petastorm machinery
 * (spark/large/train.py) with Spark primitives: broadcast = param sync,
 * treeAggregate = allreduce, driver = rank 0.
 *
 * Epoch semantics follow the reference (run_epoch, utils/train.py:133-193;
 * 32k-row batch steps, spark/large/train.py:35): one epoch = ceil(n /
 * batchSize) optimizer steps, each on a disjoint random ~batchSize slice
 * (RDD.randomSplit over the cached examples), together covering the whole
 * epoch sample. By default the epoch sample IS the corpus — full reference
 * parity. `examplesPerEpoch` caps how many examples an epoch touches
 * (smoke-test / bench budgets); that is LESS optimization than a full
 * reference epoch and callers opting in accept the difference.
 *
 * Monitored (early-stop / plateau / reported) loss: with full coverage it
 * is the epoch's mean training loss, exactly what the reference monitors.
 * With a subsampled epoch that mean is computed on a different random
 * subset each epoch, so patience would fire (or miss) on sampling noise —
 * instead the loss is evaluated on a FIXED held-out sample (seeded once,
 * ~half a batch, gradient part of the sweep discarded) so epochs compare
 * like with like. An empty slice (possible at tiny fractions) contributes
 * no optimizer step rather than a spurious loss-0 "best epoch".
 */
object EpochLoop {

  final case class RunResult(losses: Seq[Double], stoppedAt: Int)

  /**
   * Runs the loop, updating `params` IN PLACE.
   *
   * @param data     cached example RDD (callers persist + unpersist)
   * @param lossGrad (params, acc, example) => loss; must ACCUMULATE
   *                 dLoss/dParam into acc[0, params.length) and return the
   *                 example's loss. Must be serializable.
   */
  def run[E](data: RDD[E], params: Array[Double], train: TrainConfig,
      batchSize: Int, examplesPerEpoch: Option[Int],
      lossGrad: (Array[Double], Array[Double], E) => Double): RunResult = {
    val sc = data.context
    val n = params.length
    val total = data.count()
    val frac = examplesPerEpoch match {
      case Some(k) if k > 0 && k < total => k.toDouble / total
      case _ => 1.0
    }

    def sweep(rdd: RDD[E], p: Array[Double]): Array[Double] = {
      val bc = sc.broadcast(p)
      val acc = rdd.treeAggregate(new Array[Double](n + 2))(
        seqOp = (a, ex) => {
          val l = lossGrad(bc.value, a, ex); a(n) += l; a(n + 1) += 1.0; a
        },
        combOp = (a, b) => {
          var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a
        })
      bc.destroy()
      acc
    }

    val holdout =
      if (frac >= 1.0) None
      else {
        val want = math.max(64.0, math.min(batchSize / 2.0, 512.0))
        Some(data.sample(withReplacement = false,
            math.min(1.0, want / total), train.seed - 1)
          .persist(StorageLevel.MEMORY_AND_DISK))
      }

    val adam = new Adam(n)
    val sched = new LrSchedule(train.lr, train.warmupEpochs)
    val stopper = new EarlyStopping(train.patience, train.delta)
    val losses = scala.collection.mutable.ArrayBuffer[Double]()
    var epoch = 0
    var stopped = false
    while (epoch < train.maxEpochs && !stopped) {
      val epochData =
        if (frac >= 1.0) data
        else data.sample(withReplacement = false, frac, train.seed + epoch)
      val nSteps = math.max(1, math.ceil(frac * total / batchSize).toInt)
      val slices =
        if (nSteps == 1) Array(epochData)
        else epochData.randomSplit(Array.fill(nSteps)(1.0), train.seed ^ (epoch + 1))
      var lossSum = 0.0
      var cntSum = 0.0
      for (slice <- slices) {
        val acc = sweep(slice, params)
        val cnt = acc(n + 1)
        if (cnt > 0) { // empty-slice guard: skip the step, record no loss
          val grad = Array.tabulate(n)(i => acc(i) / cnt)
          adam.step(params, grad, sched.lr(epoch))
          lossSum += acc(n); cntSum += cnt
        }
      }
      val trainLoss = if (cntSum > 0) lossSum / cntSum else Double.PositiveInfinity
      val monitored = holdout match {
        case Some(h) =>
          val acc = sweep(h, params) // gradients discarded, loss only
          if (acc(n + 1) > 0) acc(n) / acc(n + 1) else trainLoss
        case None => trainLoss
      }
      sched.observe(monitored)
      losses += monitored
      stopped = stopper.observe(epoch, monitored)
      epoch += 1
    }
    holdout.foreach(_.unpersist(blocking = false))
    RunResult(losses.toSeq, epoch)
  }
}

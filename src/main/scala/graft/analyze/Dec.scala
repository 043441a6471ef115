package graft.analyze

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * I17 Deep Embedded Clustering refinement (reference caspr/models/dec.py:
 * student-t soft assignment :53-57, target distribution :107-119, KL loss).
 *
 * Round-1 scope: the embedding is frozen (the reference also supports this
 * mode via a frozen encoder); the refinement updates the CENTROIDS by
 * gradient descent on KL(P||Q). Distributed shape per iteration:
 *   pass 1 (treeAggregate): soft-assignment mass f_j = sum_i q_ij
 *   pass 2 (treeAggregate): centroid gradients using the target
 *     p_ij = (q_ij^2/f_j) / sum_j'(q_ij'^2/f_j')
 * Centroids are k x d doubles on the driver (tiny); embeddings never move.
 */
object Dec {

  final case class Result(centroids: Array[Array[Double]], klByIter: Seq[Double])

  private def dist2(x: Array[Double], c: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < x.length) { val d = x(i) - c(i); s += d * d; i += 1 }
    s
  }

  /** q_i over clusters for one point (alpha = 1 student-t kernel). */
  private def soft(x: Array[Double], cs: Array[Array[Double]]): Array[Double] = {
    val q = cs.map(c => 1.0 / (1.0 + dist2(x, c)))
    val z = q.sum
    q.map(_ / z)
  }

  def refine(df: DataFrame, embCol: String, k: Int, iterations: Int = 10,
      lr: Double = 0.5, seed: Long = 42L): Result = {
    val spark = df.sparkSession
    val data = df.select(col(embCol)).rdd
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val d = data.first().length

    // KMeans init (reference cluster_initialize, segmentation/dec_utils.py)
    val km = new KMeans().setK(k).setSeed(seed).setFeaturesCol("features")
      .fit(Segmentation.withFeatures(df, embCol))
    var centroids = km.clusterCenters.map(_.toArray)

    val kls = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 0 until iterations) {
      val bcC = spark.sparkContext.broadcast(centroids)
      // pass 1: cluster soft mass
      val f = data.treeAggregate(new Array[Double](k))(
        (a, x) => { val q = soft(x, bcC.value); var j = 0; while (j < k) { a(j) += q(j); j += 1 }; a },
        (a, b) => { var j = 0; while (j < k) { a(j) += b(j); j += 1 }; a })
      val bcF = spark.sparkContext.broadcast(f)
      // pass 2: centroid grads of KL(P||Q) + the KL value
      val zero = new Array[Double](k * d + 1)
      val acc = data.treeAggregate(zero)((a, x) => {
        val cs = bcC.value
        val q = soft(x, cs)
        val pRaw = Array.tabulate(k)(j => q(j) * q(j) / math.max(bcF.value(j), 1e-12))
        val pz = pRaw.sum
        val p = pRaw.map(_ / pz)
        var j = 0
        while (j < k) {
          if (p(j) > 1e-12) a(k * d) += p(j) * math.log(p(j) / math.max(q(j), 1e-12))
          // dKL/dmu_j = -2 * (p_j - q_j) * (1+||x-mu||^2)^-1 * (x - mu_j)
          val w = -2.0 * (p(j) - q(j)) / (1.0 + dist2(x, cs(j)))
          var t = 0
          while (t < d) { a(j * d + t) += w * (x(t) - cs(j)(t)); t += 1 }
          j += 1
        }
        a
      }, (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a })
      bcC.destroy(); bcF.destroy()
      val n = data.count().toDouble
      kls += acc(k * d) / n
      centroids = Array.tabulate(k, d)((j, t) => centroids(j)(t) - lr * acc(j * d + t) / n)
    }
    data.unpersist()
    Result(centroids, kls.toSeq)
  }

  /** Hard assignments under the refined centroids. */
  def assign(df: DataFrame, embCol: String, idCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(centroids)
    val idIdx = df.schema.fieldIndex(idCol)
    val embIdx = df.schema.fieldIndex(embCol)
    val outSchema = StructType(Seq(df.schema(idIdx),
      StructField("cluster", LongType, nullable = false)))
    df.mapPartitions { rows =>
      val cs = bc.value
      rows.map { r =>
        val x = r.getSeq[Float](embIdx).map(_.toDouble).toArray
        val q = soft(x, cs)
        Row(r.get(idIdx), q.indexOf(q.max).toLong)
      }
    }(Encoders.row(outSchema))
  }
}

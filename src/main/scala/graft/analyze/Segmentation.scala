package graft.analyze

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator, ClusteringEvaluator}
import org.apache.spark.ml.feature.PCA
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Downstream analytics on embeddings (SURVEY.md §2.K, §2.I16): clustering /
 * segmentation via MLlib KMeans (+ optional PCA, silhouette model
 * selection — reference segmentation/pandas.py:57-132) and the churn head =
 * logistic regression ON the embedding column (reference ChurnModel,
 * model_wrapper.py:123-155 — frozen encoder + MLP head; the MLlib LR is the
 * idiomatic frozen-encoder head).
 */
object Segmentation {

  /** array<float> embedding column -> MLlib vector column `features` via
    * the built-in `ml.functions.array_to_vector` (Catalyst expression, no
    * Scala UDF — closes the engine's last UDF exception, COVERAGE §2.M). */
  def withFeatures(df: DataFrame, embCol: String): DataFrame =
    df.withColumn("features",
      org.apache.spark.ml.functions.array_to_vector(col(embCol)))

  /** K1: optional PCA -> KMeans sweep over k, silhouette-scored; returns
    * (bestK, silhouette, assignments DF with `cluster`). */
  def cluster(df: DataFrame, embCol: String, ks: Seq[Int], pcaDims: Option[Int] = None,
      seed: Long = 42L): (Int, Double, DataFrame) = {
    var feats = withFeatures(df, embCol)
    pcaDims.foreach { d =>
      val pca = new PCA().setInputCol("features").setOutputCol("pca").setK(d).fit(feats)
      feats = pca.transform(feats).drop("features").withColumnRenamed("pca", "features")
    }
    feats.cache()
    val scored = ks.map { k =>
      val km = new KMeans().setK(k).setSeed(seed).setFeaturesCol("features")
        .setPredictionCol("cluster").fit(feats)
      val assigned = km.transform(feats)
      val sil = new ClusteringEvaluator().setFeaturesCol("features")
        .setPredictionCol("cluster").evaluate(assigned)
      (k, sil, assigned)
    }
    val best = scored.maxBy(_._2)
    feats.unpersist()
    best
  }

  /** I16/J9: churn head on embeddings; returns (model AUC, scored DF). */
  def churnHead(df: DataFrame, embCol: String, labelCol: String,
      seed: Long = 42L): (Double, DataFrame) = {
    val feats = withFeatures(df, embCol).withColumn("label", col(labelCol).cast("double"))
    val lr = new LogisticRegression().setMaxIter(25).setRegParam(0.01)
    val Array(train, test) = feats.randomSplit(Array(0.8, 0.2), seed)
    val model = lr.fit(train)
    val scoredTest = model.transform(test)
    val auc = new BinaryClassificationEvaluator().setMetricName("areaUnderROC")
      .evaluate(scoredTest)
    (auc, model.transform(feats))
  }
}

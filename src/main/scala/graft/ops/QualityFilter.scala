package graft.ops

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * fastText-style trained quality classifier — the GPT-3/LLaMA-family
 * pipeline stage that scores every corpus document against a trusted
 * "high quality" reference set (reference pipelines train a linear
 * classifier on hashed word/bigram features; the heuristic scores in
 * [[Text.qualityScore]] are its untrained sibling).
 *
 * Features: lowercased whitespace tokens plus joined word bigrams
 * ("w1_w2"), hashed into a fixed-width sparse count vector (HashingTF,
 * murmur3 — deterministic, vocabulary-free, so the transform is a
 * narrow per-row map with no fitted dictionary to ship). Model: MLlib
 * logistic regression (treeAggregate L-BFGS — the same distributed
 * pattern as the repo's other trainers).
 *
 * Scale shape: featurization is shuffle-free; training cost is
 * O(passes × corpus) with gradient aggregation over `numFeatures`-sized
 * vectors; scoring broadcasts one coefficient vector and is a narrow
 * map. Class balance is the caller's job (pair with [[Text.mixCorpus]]
 * to downsample the majority class deterministically).
 */
object QualityFilter {

  final case class Model(lr: LogisticRegressionModel, numFeatures: Int)

  /** tokens ++ "w1_w2" bigrams, the fastText feature recipe. */
  private def grams(textCol: Column): Column = {
    val ts = Text.tokens(textCol)
    concat(ts, zip_with(
      slice(ts, lit(1), size(ts) - 1), slice(ts, lit(2), size(ts) - 1),
      (a, b) => concat(a, lit("_"), b)))
  }

  private def featurize(df: DataFrame, textCol: String, numFeatures: Int): DataFrame =
    new HashingTF().setInputCol("__grams").setOutputCol("features")
      .setNumFeatures(numFeatures)
      .transform(df.withColumn("__grams", grams(col(textCol))))
      .drop("__grams")

  /** Fit on documents labeled 0/1 in `labelCol` (1 = high quality). */
  def fit(docs: DataFrame, textCol: String, labelCol: String,
      numFeatures: Int = 1 << 18, regParam: Double = 1e-4,
      maxIter: Int = 50): Model = {
    val lr = new LogisticRegression()
      .setFeaturesCol("features").setLabelCol(labelCol)
      .setRegParam(regParam).setMaxIter(maxIter)
    Model(lr.fit(featurize(
      docs.withColumn(labelCol, col(labelCol).cast("double")),
      textCol, numFeatures)), numFeatures)
  }

  /** (id, quality) with quality = P(label = 1), rounded to 6 dp. */
  def score(m: Model, docs: DataFrame, textCol: String, idCol: String): DataFrame =
    m.lr.transform(featurize(docs, textCol, m.numFeatures))
      .select(col(idCol),
        round(vector_to_array(col(m.lr.getProbabilityCol))(1), 6).as("quality"))

  /** Persist a fitted classifier: MLlib's own writer for the LR model
    * plus a one-row meta table pinning the hash-feature width (scores
    * are only reproducible with the SAME width). */
  def save(m: Model, spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    import spark.implicits._
    m.lr.write.overwrite().save(s"$dir/lr")
    Seq(m.numFeatures).toDF("num_features")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Load a [[save]]d classifier. */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String): Model =
    Model(LogisticRegressionModel.load(s"$dir/lr"),
      spark.read.parquet(s"$dir/meta").collect()(0).getInt(0))
}

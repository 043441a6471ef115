package graft.prep

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Splits and class-balance sampling (SURVEY.md §2.G).
 */
object Sampling {

  /** G3/G4 train/val/test random split by fractions (reference split_data,
    * preprocess.py:324-337; sklearn twin at data/load.py:69). */
  def split(df: DataFrame, fractions: Seq[Double], seed: Long = 42L): Array[DataFrame] = {
    require(math.abs(fractions.sum - 1.0) < 1e-9, "fractions must sum to 1")
    df.randomSplit(fractions.toArray, seed)
  }

  /**
   * G5 class rebalance. The reference uses SMOTE-NC (preprocess.py:365-385);
   * synthetic interpolation is a poor fit for a distributed engine (k-NN per
   * minority row), so per SURVEY §7.3 the engine ships the two standard
   * scale-friendly alternatives:
   *  - stratified up-sampling with replacement to equalize class counts
   *    (sampleBy with per-class fractions), and
   *  - class weights (weightCol for MLlib heads).
   */
  def oversampleMinority(df: DataFrame, labelCol: String, seed: Long = 42L): DataFrame = {
    val counts = df.groupBy(col(labelCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0) -> r.getLong(1)).toMap
    val maxN = counts.values.max
    counts.foldLeft(df.limit(0)) { case (acc, (label, n)) =>
      val cls = df.filter(col(labelCol) <=> lit(label))
      val up = if (n >= maxN) cls
        else cls.union(cls.sample(withReplacement = true, (maxN - n).toDouble / n, seed))
      acc.unionByName(up)
    }
  }

  /** Per-row class weight column: weight = total / (nClasses * classCount). */
  def withClassWeights(df: DataFrame, labelCol: String,
      weightCol: String = "class_weight"): DataFrame = {
    val counts = df.groupBy(col(labelCol)).agg(count(lit(1)).as("n"))
    val total = df.count().toDouble
    val k = counts.count().toDouble
    df.join(broadcast(counts), Seq(labelCol))
      .withColumn(weightCol, lit(total) / (lit(k) * col("n"))).drop("n")
  }
}

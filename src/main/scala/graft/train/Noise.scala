package graft.train

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * I18 denoising-autoencoder augmentation (reference caspr/models/noise.py):
 * categorical substitution with probability p, continuous gaussian noise,
 * and bounded sequence shuffle. All seeded `rand()` column ops —
 * deterministic per seed, no UDFs, applied lazily inside the training scan.
 */
object Noise {

  /** With probability p, replace the (coded) categorical value with a
    * uniform random code in [1, vocab] (noise.py:65-71). */
  def substituteCat(df: DataFrame, column: String, p: Double, vocab: Int,
      seed: Long = 42L): DataFrame =
    df.withColumn(column,
      when(rand(seed) < p,
        (floor(rand(seed + 1) * vocab) + 1).cast("long"))
        .otherwise(col(column)))

  /** With probability p, add N(0, sigma) noise (noise.py:73-77). */
  def gaussianCont(df: DataFrame, column: String, p: Double, sigma: Double,
      seed: Long = 42L): DataFrame =
    df.withColumn(column,
      when(rand(seed) < p, col(column) + randn(seed + 1) * sigma)
        .otherwise(col(column)))

  /**
   * Bounded sequence shuffle (noise.py:57-63): re-rank events by
   * `rank + U(0, k+1)` — the sort of perturbed positions displaces any
   * element by at most k, preserving coarse order while breaking exact
   * order. Expects a `rank` column (Windows.padShift output).
   */
  def boundedShuffle(df: DataFrame, tgtId: Seq[String], k: Int,
      seed: Long = 42L): DataFrame = {
    val w = Window.partitionBy(tgtId.map(col): _*)
      .orderBy((col("rank") + rand(seed) * (k + 1)).asc)
    df.withColumn("shuffled_rank", row_number().over(w))
  }
}

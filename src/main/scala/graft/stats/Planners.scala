package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Fit-time planners that pick pipeline hyper-parameters from the data
 * (SURVEY.md §2 D6/D7/G2). All single-pass aggregates; only scalars cross
 * the driver boundary.
 */
object Planners {

  /**
   * D6 sequence-length planner: a percentile of per-entity event counts.
   * Reference: get_sequence_length, spark/preprocess.py:485-490 (uses
   * approxQuantile; we keep the exact percentile for small fits and
   * recommend approx at 100 TB — both are one job).
   */
  def sequenceLength(df: DataFrame, tgtId: Seq[String], percentile: Double): Int = {
    val counts = df.groupBy(tgtId.map(col): _*).agg(count(lit(1)).as("cnt"))
    counts.agg(expr(s"percentile(cnt, $percentile)")).head().getDouble(0).ceil.toInt
  }

  /**
   * D7 lookback-period planner: bucket events into fixed-size windows before
   * the prediction date, measure events-per-active-entity in each, and pick
   * the lookback covering typical activity.
   * Reference: get_lookback_period, spark/preprocess.py:493-528 (4 monthly
   * `when` buckets -> countDistinct/count per bucket).
   * Returns (bucket, nEntities, nEvents) rows; the scalar decision is the
   * caller's (reference multiplies the avg ratio into days).
   */
  def lookbackBuckets(df: DataFrame, tgtId: String, activityDate: String,
      predictionDate: Column, bucketDays: Int): DataFrame =
    df.withColumn("bucket",
        floor(datediff(predictionDate, col(activityDate)) / bucketDays).cast("long"))
      .filter(col("bucket") >= 0)
      .groupBy(col("bucket"))
      .agg(countDistinct(col(tgtId)).as("n_entities"), count(lit(1)).as("n_events"))

  /**
   * G2 sliding-window cutoff generation: training cutoffs walking back from
   * the max activity date in `strideDays` steps.
   * Reference: get_sliding_window_dates, spark/preprocess.py:468-482
   * (cutoffs = arithmetic on max(date)). Distributed form: cross-join the
   * 1-row max aggregate with a small range — no collect.
   */
  def slidingCutoffs(df: DataFrame, activityDate: String, nWindows: Int,
      strideDays: Int): DataFrame = {
    val mx = df.agg(max(to_date(col(activityDate))).as("max_date"))
    val idx = df.sparkSession.range(0, nWindows).withColumnRenamed("id", "idx")
    idx.crossJoin(mx)
      .select(col("idx"),
        date_format(date_sub(col("max_date"), (col("idx") * strideDays).cast("int")),
          "yyyy-MM-dd").as("cutoff"))
  }
}

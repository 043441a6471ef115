package graft.prep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Column normalization (SURVEY.md §2 H2/D5).
 *
 * The reference computes `df.describe().toPandas()` (a driver collect) and
 * then burns one pandas_udf per numeric column (spark/preprocess.py:173-198)
 * — O(cols) Arrow round trips. Here: ONE aggregate pass collects
 * min/max/mean/stddev for all columns at once, and apply is pure column
 * arithmetic, fully inside whole-stage codegen.
 *
 * The no-variance guard (min==max / std==0 columns pass through unchanged)
 * mirrors spark/preprocess.py:178-180,188-190.
 */
final case class ColumnSummary(min: Double, max: Double, mean: Double, stddev: Double)

final case class NormalizationSummary(stats: Map[String, ColumnSummary]) {

  /** Min-max scale: (x - min) / (max - min); skipped when max == min. */
  def minMax(c: String): Column = {
    val s = stats(c)
    if (s.max == s.min) col(c).cast("double")
    else (col(c) - lit(s.min)) / lit(s.max - s.min)
  }

  /** Z-score scale: (x - mean) / stddev; skipped when stddev == 0. */
  def zScore(c: String): Column = {
    val s = stats(c)
    if (s.stddev == 0.0 || s.stddev.isNaN) col(c).cast("double")
    else (col(c) - lit(s.mean)) / lit(s.stddev)
  }

  /** Inverse of [[minMax]] (reference: denormalize_columns, spark/preprocess.py:202-234). */
  def minMaxInverse(c: String): Column = {
    val s = stats(c)
    if (s.max == s.min) col(c).cast("double")
    else col(c) * lit(s.max - s.min) + lit(s.min)
  }

  /** Inverse of [[zScore]]. */
  def zScoreInverse(c: String): Column = {
    val s = stats(c)
    if (s.stddev == 0.0 || s.stddev.isNaN) col(c).cast("double")
    else col(c) * lit(s.stddev) + lit(s.mean)
  }

  /** The normalized value a given raw constant maps to (used by H4 date fill). */
  def minMaxOf(c: String, raw: Double): Double = {
    val s = stats(c)
    if (s.max == s.min) raw else (raw - s.min) / (s.max - s.min)
  }

  /** Z-score analog of [[minMaxOf]]: what a raw constant maps to under the
    * fitted z-scale (H4 date fill when normMode = z_score). */
  def zScoreOf(c: String, raw: Double): Double = {
    val s = stats(c)
    if (s.stddev == 0.0 || s.stddev.isNaN) raw else (raw - s.mean) / s.stddev
  }

  /** Dispatch [[minMaxOf]]/[[zScoreOf]] on the configured mode. */
  def normalizedOf(c: String, raw: Double, mode: String): Double = mode match {
    case "min_max" => minMaxOf(c, raw)
    case "z_score" => zScoreOf(c, raw)
    case other     => throw new IllegalArgumentException(s"unknown mode $other")
  }
}

object Normalize {

  /** Fit min/max/mean/stddev for all columns in a single aggregation pass.
    * Zero columns (cat-only role sets) is a valid configuration. */
  def fit(df: DataFrame, cols: Seq[String]): NormalizationSummary = {
    if (cols.isEmpty) return NormalizationSummary(Map.empty)
    val aggs = cols.flatMap { c =>
      Seq(min(col(c)).cast("double").as(s"${c}__min"),
          max(col(c)).cast("double").as(s"${c}__max"),
          avg(col(c)).as(s"${c}__mean"),
          stddev_samp(col(c)).as(s"${c}__std"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val stats = cols.zipWithIndex.map { case (c, i) =>
      def d(j: Int): Double = if (row.isNullAt(i * 4 + j)) Double.NaN else row.getDouble(i * 4 + j)
      c -> ColumnSummary(d(0), d(1), d(2), d(3))
    }.toMap
    NormalizationSummary(stats)
  }

  /** Apply one scaling mode to many columns in a single projection. */
  def apply(df: DataFrame, summary: NormalizationSummary, cols: Seq[String],
      mode: String): DataFrame = {
    val exprs = cols.map { c =>
      mode match {
        case "min_max" => summary.minMax(c).as(c)
        case "z_score" => summary.zScore(c).as(c)
        case other     => throw new IllegalArgumentException(s"unknown mode $other")
      }
    }
    df.withColumns(cols.zip(exprs).toMap)
  }
}

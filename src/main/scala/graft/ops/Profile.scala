package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Whole-table data profiling (the engine-side `SUMMARIZE`): one long-form
 * row per column with row/null/distinct counts, numeric min/max/mean, and
 * string min/max — the first thing anyone runs against an unfamiliar
 * 100 TB table, and the input to drift monitors comparing two snapshots.
 *
 * Shape: ONE aggregate pass over the table produces a single wide row
 * (every per-column statistic is an aggregate expression in the same
 * `agg`, so Spark computes them in one scan; the exact distinct counts
 * expand into a grouping-sets style plan — pass `approxDistinct = true`
 * to keep the scan single-stage with HLL sketches at scale), then the
 * wide row explodes into per-column rows driver-free.
 *
 * Conventions: timestamps profile as epoch micros (min/max only — their
 * mean is numerically meaningless at 1e15 magnitudes where double
 * summation error exceeds the rounding grid); means round to 1e-6;
 * distinct counts exclude nulls (SQL COUNT DISTINCT semantics).
 */
object Profile {

  def summarize(df: DataFrame, approxDistinct: Boolean = false): DataFrame = {
    val fields = df.schema.fields.toSeq
    def nullNum = lit(null).cast("double")
    def nullStr = lit(null).cast("string")

    val aggs: Seq[Column] = fields.flatMap { f =>
      val c = col(f.name)
      val nd = if (approxDistinct) approx_count_distinct(c) else countDistinct(c)
      val (mn, mx, mean) = f.dataType match {
        case _: NumericType =>
          (min(c.cast("double")), max(c.cast("double")), round(avg(c), 6))
        case TimestampType | TimestampNTZType =>
          val us = unix_micros(c.cast(TimestampType)).cast("double")
          (min(us), max(us), max(nullNum))
        case _ => (max(nullNum), max(nullNum), max(nullNum))
      }
      val (mns, mxs) = f.dataType match {
        case StringType => (min(c), max(c))
        case _ => (max(nullStr), max(nullStr))
      }
      Seq(count(c).as(s"${f.name}__nn"), nd.as(s"${f.name}__nd"),
        mn.as(s"${f.name}__min"), mx.as(s"${f.name}__max"),
        mean.as(s"${f.name}__mean"),
        mns.as(s"${f.name}__mins"), mxs.as(s"${f.name}__maxs"))
    } :+ count(lit(1)).as("__n")

    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = array(fields.map { f =>
      struct(lit(f.name).as("column_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"${f.name}__nn")).as("n_null"),
        col(s"${f.name}__nd").as("n_distinct"),
        col(s"${f.name}__min").as("min_num"),
        col(s"${f.name}__max").as("max_num"),
        col(s"${f.name}__mean").as("mean_num"),
        col(s"${f.name}__mins").as("min_str"),
        col(s"${f.name}__maxs").as("max_str"))
    }: _*)
    row.select(explode(entries).as("e")).select("e.*")
  }
}

package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Customer-analytics rollups over the event log — the reference's home
 * domain (CASPR embeds customer activity sequences): RFM segmentation
 * and cohort lifetime-value triangles, the two reports every churn /
 * segmentation model is sanity-checked against.
 */
object Customer {

  /**
   * RFM segmentation (Hughes 1994): per entity, Recency (days from last
   * event to the prediction instant), Frequency (event count) and
   * Monetary (value summed in integer cents — exact across engines),
   * each quintile-scored 1–5 with 5 = best (most recent / most frequent
   * / highest spend) and combined into the classic `rfm` code
   * (r·100 + f·10 + m, "555" = champions). Quintile boundaries are
   * global NTILE ranks with id tiebreaks — deterministic, and the same
   * global-window convention as the D11 quantile scoring (at 100 TB
   * swap the exact ntile for approxQuantile bucketing, as documented in
   * SCALE.md for D11).
   *
   * One hash-aggregate to entity grain, then three ntile windows over
   * the entity-grain table. Output: `(entity, recency_days, frequency,
   * monetary_cents, r_score, f_score, m_score, rfm)`.
   */
  def rfm(events: DataFrame, entityCol: String, tsCol: String,
      valueCol: String, predTs: Column, buckets: Int = 5): DataFrame = {
    require(buckets >= 2, "buckets must be >= 2")
    val perUser = events.groupBy(col(entityCol).as("entity"))
      .agg(
        floor((unix_micros(predTs) - unix_micros(max(col(tsCol)))) /
          lit(86400000000L)).cast("long").as("recency_days"),
        count(lit(1)).as("frequency"),
        // all-null values -> 0 spend, not a NULL whose sort position
        // differs between engines (Spark nulls-first vs DuckDB
        // nulls-last under ASC would flip the quintile)
        coalesce(sum(round(col(valueCol) * 100).cast("long")), lit(0L))
          .as("monetary_cents"))
    // 5 = best: most recent last in DESC-recency order, most frequent /
    // highest spend last in ASC order. Null orderings pinned to the
    // DuckDB defaults (ASC nulls last, DESC nulls first) so a null-ts
    // entity can't diverge either.
    val rW = Window.orderBy(col("recency_days").desc_nulls_first,
      col("entity").asc)
    val fW = Window.orderBy(col("frequency").asc_nulls_last,
      col("entity").asc)
    val mW = Window.orderBy(col("monetary_cents").asc_nulls_last,
      col("entity").asc)
    perUser
      .withColumn("r_score", ntile(buckets).over(rW).cast("long"))
      .withColumn("f_score", ntile(buckets).over(fW).cast("long"))
      .withColumn("m_score", ntile(buckets).over(mW).cast("long"))
      .withColumn("rfm",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
  }

  /**
   * Cohort lifetime-value triangle: entities cohorted by the WEEK of
   * their first event (engine-neutral arithmetic week index
   * `unix_micros // 7·86400·10⁶` — no date_trunc semantics to reconcile
   * across engines), value accumulated per week of age. Per
   * (cohort_week, age_week): the cohort's size, how many of it were
   * active that week, the week's value (integer cents — exact), the
   * running cumulative value and the headline `cum_ltv` = cumulative
   * value per cohort member (6 dp). THE retention-economics report: read
   * down a column to compare cohorts at equal age, along a row to see a
   * cohort mature.
   *
   * Scale shape: one entity-grain aggregate for cohort assignment
   * (broadcast back onto the stream — entity grain is the small side),
   * one (cohort, age) hash-aggregate, then a running window over the
   * triangle itself (weeks², statistic-sized).
   */
  def cohortLtv(events: DataFrame, entityCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val weekUs = 7L * 86400000000L
    val wk = (c: Column) => floor(unix_micros(c) / lit(weekUs)).cast("long")
    // project to internal names FIRST so the join can never collide with
    // caller columns (an events frame carrying its own "entity" or
    // "cohort_week" column, or entityCol named exactly that)
    val slim = events.select(col(entityCol).as("__e"),
      wk(col(tsCol)).as("__w"),
      round(col(valueCol) * 100).cast("long").as("__cents"))
    val firstWeek = slim.groupBy(col("__e"))
      .agg(min(col("__w")).as("cohort_week"))
    val n = firstWeek.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_users"))
    val aged = slim
      .join(firstWeek, Seq("__e"))
      .select(col("cohort_week"),
        (col("__w") - col("cohort_week")).as("age_week"),
        col("__e").as("entity"), col("__cents"))
    val cell = aged.groupBy(col("cohort_week"), col("age_week"))
      .agg(countDistinct(col("entity")).as("n_active"),
        sum(col("__cents")).as("value_cents"))
    val run = Window.partitionBy(col("cohort_week"))
      .orderBy(col("age_week").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cell.join(n, Seq("cohort_week"))
      .withColumn("cum_value_cents", sum(col("value_cents")).over(run))
      .select(col("cohort_week"), col("age_week"), col("n_users"),
        col("n_active"), col("value_cents"), col("cum_value_cents"),
        round(col("cum_value_cents").cast("double") /
          col("n_users") / 100.0, 6).as("cum_ltv"))
  }
}

package graft.prep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence-construction window operators (SURVEY.md §2.B/§2.C).
 *
 * All pure DataFrame ops: one shuffle keyed on the entity id serves ranks,
 * pivot and the profile join downstream. Zero UDFs; everything stays inside
 * whole-stage codegen.
 */
object Windows {

  /**
   * B1 active-window filter: keep events with
   * `predictionDate - historyDays < activityDate < predictionDate`.
   * Reference: spark/preprocess.py:577-581 (seconds arithmetic on
   * unix_timestamp). Narrow op; Catalyst pushes it into the parquet scan.
   */
  def activeWindowFilter(df: DataFrame, activityDate: String,
      predictionDate: Column, historyDays: Int): DataFrame = {
    val start = predictionDate - expr(s"INTERVAL $historyDays DAYS")
    val semantic = col(activityDate) < predictionDate && col(activityDate) > start
    // When the date column was derived from a raw scan column (Tables.load),
    // the derived predicate cannot reach the parquet scan. Add an IMPLIED
    // predicate on the raw column itself: it constant-folds to literal
    // bounds that push down to row-group stats, and the exact semantic
    // filter still applies on top. For a nanos long the bounds are slightly
    // loose to account for the ns->us floor:
    //   ts_us < pred  =>  raw_ns <  us(pred)*1000 + 1000
    //   ts_us > start =>  raw_ns >  us(start)*1000
    // For an NTZ raw column the LTZ->NTZ cast of the foldable bound is
    // exact under any single session tz (the casts are inverses).
    val pushable =
      if (activityDate == "ts" && df.columns.contains(graft.core.Tables.RawTsCol)) {
        val raw = col(graft.core.Tables.RawTsCol)
        df.schema(graft.core.Tables.RawTsCol).dataType match {
          case org.apache.spark.sql.types.LongType =>
            raw < unix_micros(predictionDate) * 1000L + 1000L &&
              raw > unix_micros(start) * 1000L
          case org.apache.spark.sql.types.TimestampNTZType =>
            raw < predictionDate.cast(org.apache.spark.sql.types.TimestampNTZType) &&
              raw > start.cast(org.apache.spark.sql.types.TimestampNTZType)
          case _ => lit(true)
        }
      } else lit(true)
    df.filter(pushable && semantic)
  }

  /**
   * C1 get_rank: per-entity sequence length and descending/ascending event
   * ranks. Reference: spark/preprocess.py:531-539.
   *
   * `tiebreak` makes ordering total when two events share a timestamp
   * (required for deterministic hash-matched output; the reference relies on
   * undefined tie order).
   *
   * Identity: rank_asc + rank_desc == seq_len + 1.
   */
  def ranks(df: DataFrame, tgtId: Seq[String], activityDate: String,
      tiebreak: Seq[String] = Nil): DataFrame = {
    val part = tgtId.map(col)
    val ordered = Window.partitionBy(part: _*)
      .orderBy((col(activityDate).desc +: tiebreak.map(col(_).desc)): _*)
    val unordered = Window.partitionBy(part: _*)
    // ORDERED window first: the unordered count window then plans above it
    // and its sort-by-id requirement is prefix-satisfied by the ordered
    // window's (id, date desc, tiebreak desc) output ordering — ONE sort
    // per partition instead of two (plan-audited; the reverse order paid a
    // second Sort node on every ranked scan)
    df.withColumn("rank_desc", row_number().over(ordered))
      .withColumn("seq_len", count(lit(1)).over(unordered))
      .withColumn("rank_asc", col("seq_len") - col("rank_desc") + 1)
  }

  /**
   * B3 latest-n filter: keep the newest n events per entity.
   * Reference: spark/preprocess.py:411-412. Must run BEFORE pivot so row
   * width stays bounded regardless of entity skew (a 10^6-event entity
   * contributes n rows, not 10^6).
   */
  def latestN(ranked: DataFrame, n: Int): DataFrame =
    ranked.filter(col("rank_desc") <= lit(n))

  /**
   * C2 pad-shift: `rank = rank_asc + shift` where `shift = n - seq_len`,
   * applied iff left-padding is requested or the sequence overflows n.
   * Right-aligns short sequences under left padding. Reference semantics
   * spelled out in the comment at spark/preprocess.py:414-429.
   * Pure column arithmetic — no shuffle.
   */
  def padShift(ranked: DataFrame, n: Int, leftPad: Boolean): DataFrame = {
    val shift = lit(n) - col("seq_len")
    val applies = if (leftPad) lit(true) else col("seq_len") >= lit(n)
    ranked.withColumn("rank",
      when(applies, col("rank_asc") + shift).otherwise(col("rank_asc")))
  }

  /**
   * Fused C1+B3+C2 for the pivot path: rank -> keep the latest n (planned
   * as a WindowGroupLimit pushdown: the filter sits directly above the
   * rank window) -> seq_len/rank_asc counted over the KEPT rows -> pad
   * shift. One Exchange + ONE Sort serve all three windows: the rank
   * window sorts (id, date desc, tiebreak desc); the group-limit
   * preserves that order; the count window requires only sort-by-id,
   * which is prefix-satisfied — no second Sort node (plan-audited, frozen
   * in PlanShapeSpec). The count also runs over n-bounded rows instead of
   * every event.
   *
   * Why the capped count yields identical slots to [[ranks]]+[[latestN]]+
   * [[padShift]] (S = true seq_len, S' = min(S, n) = count over kept rows,
   * rd = rank_desc):
   *  - rightPad, S >= n: shift applies under both counts (S' = n);
   *    rank = (S - rd + 1) + (n - S) = n - rd + 1 = (S' - rd + 1) + (n - S').
   *  - rightPad, S < n: every row is kept so S' = S; the shift applies
   *    under neither; rank = S - rd + 1 either way.
   *  - leftPad: shift always applies; both reduce to n - rd + 1.
   * No slot depends on the uncapped count — seq_len here is the CAPPED
   * value (not exposed by the pivot output; use [[ranks]] when the true
   * sequence length itself is the deliverable).
   */
  def latestNSlots(df: DataFrame, tgtId: Seq[String], activityDate: String,
      n: Int, leftPad: Boolean, tiebreak: Seq[String] = Nil): DataFrame = {
    val part = tgtId.map(col)
    val ordered = Window.partitionBy(part: _*)
      .orderBy((col(activityDate).desc +: tiebreak.map(col(_).desc)): _*)
    val unordered = Window.partitionBy(part: _*)
    val kept = df.withColumn("rank_desc", row_number().over(ordered))
      .filter(col("rank_desc") <= lit(n))
    padShift(kept.withColumn("seq_len", count(lit(1)).over(unordered))
      .withColumn("rank_asc", col("seq_len") - col("rank_desc") + 1), n, leftPad)
  }

  /**
   * C3 inter-event intervals: `datediff(date, lag(date) over entity-window)`.
   * Reference: spark/preprocess.py:438-444.
   */
  def interEventGapDays(df: DataFrame, tgtId: Seq[String], activityDate: String,
      out: String, tiebreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(tgtId.map(col): _*)
      .orderBy((col(activityDate).asc +: tiebreak.map(col(_).asc)): _*)
    df.withColumn(out, datediff(col(activityDate), lag(col(activityDate), 1).over(w)))
  }
}

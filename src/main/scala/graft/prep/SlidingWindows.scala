package graft.prep

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * G2+F4 sliding-window training-set assembly (SURVEY.md §2.G2/F4):
 * featurize at several historical cutoffs and union the results, labels
 * inner-joined per window (reference preprocess.py:133-162; cutoff
 * generation spark/preprocess.py:468-482).
 *
 * The per-cutoff plans are independent — Spark runs the union's branches as
 * parallel stages; each branch's window filter pushes its own time bounds
 * into the scan, so the union reads each cutoff's slice, not the full log
 * per cutoff.
 */
object SlidingWindows {

  /**
   * Per cutoff: per-entity activity features over the trailing
   * `historyDays`, inner-joined with a clipped multi-hot label from the
   * `labelDays` after the cutoff, tagged with the cutoff.
   */
  def trainingSet(events: DataFrame, tgtId: String, tsCol: String,
      cutoffs: Seq[String], historyDays: Int, labelDays: Int,
      labelEvent: String): DataFrame = {
    val perCutoff = cutoffs.map { c =>
      val cut = to_timestamp(lit(c))
      val feats = Windows.activeWindowFilter(events, tsCol, cut, historyDays)
        .groupBy(col(tgtId))
        .agg(count(lit(1)).as("n_events"),
          sum(round(col("value") * 100).cast("long")).as("val_cents"))
      val labels = events
        .filter(col(tsCol) >= cut && col(tsCol) < cut + expr(s"INTERVAL $labelDays DAYS"))
        .filter(col("event_type") === labelEvent)
        .groupBy(col(tgtId))
        .agg(least(count(lit(1)), lit(1L)).as("label"))
      feats.join(labels, Seq(tgtId), "inner")
        .withColumn("cutoff", lit(c))
    }
    perCutoff.reduce(_.unionByName(_))
  }
}

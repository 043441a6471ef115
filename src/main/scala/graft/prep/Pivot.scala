package graft.prep

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * E1 long->wide pivot — the signature operator (SURVEY.md §2.E).
 *
 * Reference: main_featurizer_sequential_sp, spark/preprocess.py:394-435
 * (pivot at :432). Differences by design:
 *
 *  - Explicit pivot values `1..n` remove Spark's extra distinct-values job
 *    AND guarantee all n column groups exist, which deletes the reference's
 *    dummy-row union workaround (append_dummy_rank, spark/preprocess.py:373-391).
 *  - Output naming is `{col}_{t}` (parquet-safe), deleting the reference's
 *    rename pass (remove_underscore_in_seq_col_name_dataframe, :447-465).
 *  - The pivot compiles to a single hash Aggregate with n x |seqCols|
 *    `first(when(rank=t, c))` aggregates — partial aggregation happens
 *    map-side, so the shuffle moves one row per (entity, distinct-rank-set),
 *    not one per event.
 *
 * Callers must bound `rank` <= n first (Windows.latestN) so row width is
 * independent of entity skew.
 */
object Pivot {

  /** Pivot `seqCols` over `rank` 1..n, grouped by the entity key. */
  def toWide(ranked: DataFrame, tgtId: Seq[String], seqCols: Seq[String], n: Int): DataFrame = {
    val aggs = seqCols.map(c => first(col(c)).as(c))
    val wide = ranked
      .groupBy(tgtId.map(col): _*)
      .pivot("rank", (1 to n).map(_.toString))
      .agg(aggs.head, aggs.tail: _*)
    // Spark names multi-agg pivot columns "{value}_{alias}" => "3_value".
    // Rename to the parquet-safe "{col}_{t}" convention in ONE plan node.
    val renames = (for (t <- 1 to n; c <- seqCols) yield {
      val sparkName = if (seqCols.size == 1) t.toString else s"${t}_$c"
      sparkName -> s"${c}_$t"
    }).toMap
    wide.withColumnsRenamed(renames)
  }
}

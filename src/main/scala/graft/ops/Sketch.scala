package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Count-min sketch (Cormode & Muthukrishnan 2005): a fixed
 * `depth × width` grid of counters addressed by `depth` independent
 * hashes, answering point frequency queries with one-sided error
 * (estimate >= truth, overshoot bounded by ~2N/width at 1-δ confidence).
 * The memory-bounded complement of the exact groupBy-count profilers
 * ([[Skew.report]], [[Profile]]): at 100 TB a key universe can be too
 * large to materialize, but the sketch stays `depth × width` counters no
 * matter how many distinct keys stream through — the standard hot-key /
 * heavy-hitter detector for shuffle-skew diagnosis and rate limiting.
 *
 * Hashes are salted md5 nibbles (first 4 hex chars, the same engine-
 * portable primitive as [[Text.docBucket]]) — fully deterministic and
 * replayable by an external SQL engine, so the sketch AND its estimates
 * are oracle-checkable end-to-end (`q_heavy_hitters`).
 *
 * Scale shape: building the sketch is ONE explode(depth) + hash
 * aggregate whose map-side partial combine collapses every partition to
 * <= depth × width cells before the exchange — shuffled bytes are
 * O(partitions × depth × width), independent of row count. Estimation
 * broadcasts the (tiny) cell table onto the key set.
 */
object Sketch {

  /** Row-`j` cell index for a key: first 4 md5 nibbles of
    * `<key>#cms<j>` mod `width`. */
  private[ops] def cell(key: Column, j: Column, width: Int): Column =
    pmod(conv(substring(
      md5(concat(key.cast("string"), lit("#cms"), j.cast("string"))),
      1, 4), 16, 10).cast("long"), lit(width.toLong))

  /**
   * Build the sketch: one row per non-empty cell, (j, cell, cnt).
   * `weightCol` switches from row counting to weighted sums (e.g. bytes
   * per key). Cells never touched stay absent (an estimate probing an
   * absent cell reads a true zero — [[estimate]] coalesces).
   */
  def countMin(df: DataFrame, keyCol: String,
      depth: Int = 3, width: Int = 256,
      weightCol: Option[String] = None): DataFrame = {
    require(depth >= 1 && width >= 1, "need depth >= 1 and width >= 1")
    val w = weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    df.select(col(keyCol).as("__k"), w.as("__w"),
        explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .select(col("j"), cell(col("__k"), col("j"), width).as("cell"), col("__w"))
      .groupBy(col("j"), col("cell"))
      .agg(sum(col("__w")).as("cnt"))
  }

  /**
   * Point-frequency estimates for a key set: each key probes its `depth`
   * cells, estimate = min over rows (the CMS guarantee: >= truth, with
   * equality unless every row collides). The sketch side is broadcast —
   * it is at most depth × width rows by construction.
   */
  def estimate(cms: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int = 3, width: Int = 256): DataFrame = {
    val probes = keys.select(col(keyCol),
        explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .select(col(keyCol), col("j"), cell(col(keyCol), col("j"), width).as("cell"))
    probes.join(broadcast(cms), Seq("j", "cell"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /**
   * Heavy hitters: every distinct key of `df` whose CMS estimate reaches
   * `minCount`, ranked (est desc, key asc). In streaming/merge settings
   * the candidate keys come from a cheap per-partition top list; here the
   * distinct key set itself plays that role.
   */
  def heavyHitters(df: DataFrame, keyCol: String, minCount: Long,
      depth: Int = 3, width: Int = 256): DataFrame = {
    val cms = countMin(df, keyCol, depth, width)
    estimate(cms, df.select(col(keyCol)).distinct(), keyCol, depth, width)
      .filter(col("est") >= minCount)
      .orderBy(col("est").desc, col(keyCol).asc)
  }
}

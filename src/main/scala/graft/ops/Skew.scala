package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Salted equi-join for skewed keys. AQE's skew-join handles sort-merge
 * skew AFTER a shuffle materializes; salting is the plan-level fix when a
 * handful of hot keys would otherwise pin whole partitions — the standard
 * recipe for fact⋈fact joins where neither side broadcasts.
 *
 * `left` (the skewed/fact side) gets a deterministic per-row salt in
 * [0, nSalts); `right` (the smaller-but-not-broadcastable side) is
 * replicated nSalts× via a literal-array explode. The join key becomes
 * (key, salt), splitting each hot key across nSalts reducers. Output rows
 * are identical to the plain equi-join (spec-pinned) — salting changes
 * the partitioning, never the result.
 *
 * The salt is `pmod(xxhash64(saltBy…), nSalts)` — content-derived and
 * replayable (same row → same salt on retry/speculation), never rand().
 * Pass high-cardinality row-identifying columns as `saltBy`.
 */
object Skew {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      nSalts: Int, saltBy: Seq[String]): DataFrame = {
    require(nSalts >= 2, "nSalts >= 2 (1 would be a plain join)")
    require(saltBy.nonEmpty, "saltBy columns required for a stable salt")
    val l = left.withColumn("__salt",
      pmod(xxhash64(saltBy.map(col): _*), lit(nSalts.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(array((0 until nSalts).map(lit): _*)))
    l.join(r, l(key) === r(key) && l("__salt") === r("__salt"))
      .drop("__salt")
  }

  /**
   * Partial-aggregation salt for `collect_list`/`collect_set`-style aggs
   * whose map-side combine cannot shrink a hot key: aggregate on
   * (key, salt) first (bounded partitions), then merge the per-salt
   * partials on the key (nSalts rows per key max). `merge` sees the
   * salt-level frame grouped by key and produces the final columns.
   */
  def twoPhaseAgg(df: DataFrame, key: String, nSalts: Int,
      saltBy: Seq[String], partial: Seq[Column],
      merge: DataFrame => DataFrame): DataFrame = {
    require(nSalts >= 2, "nSalts >= 2")
    val salted = df.withColumn("__salt",
      pmod(xxhash64(saltBy.map(col): _*), lit(nSalts.toLong)).cast("int"))
    merge(salted.groupBy(col(key), col("__salt")).agg(partial.head, partial.tail: _*)
      .drop("__salt"))
  }
}

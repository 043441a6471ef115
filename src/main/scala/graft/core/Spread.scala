package graft.core

import org.apache.spark.sql.DataFrame

/**
 * Scale-adaptive parallelism guard for CPU-heavy narrow transforms
 * (regex tokenization, shingling, markup stripping): when the upstream
 * scan yields FEWER partitions than the session's core count — a small
 * input, or a big one packed into few row groups — every downstream
 * codegen'd per-row pass runs on that handful of tasks while the rest
 * of the machine idles (parquet can't split inside a row group, so
 * split-size configs cannot help). One round-robin repartition of the
 * (still narrow) rows up to `defaultParallelism` costs one shuffle of
 * the raw text bytes and buys full-width CPU for everything fused
 * after it.
 *
 * Adaptive by construction, not a tuned constant: at corpus scale the
 * scan already has >= cores partitions and this is the identity — the
 * shuffle only ever appears in the regime where the input is smaller
 * than the machine (optimization guide §2: derive partitioning from
 * the input, don't tune for one scale). Row order is not part of any
 * caller's contract (aggregation/join grains downstream); Spark's
 * sort-before-repartition keeps the placement deterministic under
 * task retries.
 */
object Spread {
  def toCores(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df // partitioning is the source's business
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}

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
 * (still narrow) rows costs one shuffle of the raw text bytes and buys
 * full-width CPU for everything fused after it.
 *
 * Bounded by BYTES on both sides (optimization guide §2: derive
 * partitioning from the input, never a constant):
 *
 *  - the spread fires only in the SMALL-INPUT regime — estimated source
 *    bytes <= cores * [[MaxBytesPerCore]] (2 MiB/core ≈ 64 MiB on the
 *    32-core bench box). At corpus scale the input blows the cap and
 *    this is the identity by construction, so a mid-sized table that
 *    already scans at ~cores partitions can never trigger a full
 *    reshuffle of raw text (the r16 version spread whenever
 *    partitions < cores, which at cluster scale could move terabytes
 *    for a fractional parallelism gain);
 *  - inside the small regime the task count is
 *    min(cores, ceil(bytes / perTaskBytes)), not blindly `cores`: a
 *    tiny input gets a handful of tasks instead of paying cores-many
 *    task launches for microseconds of work each (the r16 verdict's
 *    8-core anti-scaling finding). [[PerTaskBytes]]' default of 64 KiB
 *    of parquet-compressed source is still SMALL because every call
 *    site is a regex/shingle/hash front door whose downstream CPU per
 *    source byte is 2-3 orders of magnitude above scan cost (64 KiB
 *    compressed ≈ 0.25 MB raw ≈ tens of ms of shingling). Swept
 *    interleaved-in-one-JVM at sf0.1/32 cores: 18 KiB (the r16
 *    full-width behavior, 32 tasks) < 32 KiB < 64 KiB ≈ 128 KiB on all
 *    seven spread consumers — e.g. q_dedup_jaccard 1.39 -> 0.91 s,
 *    q_bm25_search 0.90 -> 0.85 s, q_dedup_minhash_admit 0.76 -> 0.68 s
 *    best-of-5 going from 32 to 10 tasks; spread OFF is 1.3-3x worse
 *    everywhere except q_dedup_minhash_fast (flat).
 *
 * The byte estimate is the optimizer's logical `stats.sizeInBytes` —
 * pure planning, no job: the r16 version called `df.rdd.getNumPartitions`
 * which under AQE eagerly materializes every upstream query stage (all
 * call sites were scan-side so it happened to be benign, but the
 * repartition then re-planned and re-executed them on composed inputs).
 * Both bounds are runtime-conf-overridable for A/B work
 * (`graft.spread.perTaskBytes` / `graft.spread.maxBytesPerCore`).
 *
 * Call sites are scan-side narrow pipelines; in the small regime the
 * repartition is applied unconditionally (re-shuffling <= 64 MiB is
 * noise), so the input's own partitioning is never inspected. Row order
 * is not part of any caller's contract (aggregation/join grains
 * downstream); Spark's sort-before-repartition keeps the placement
 * deterministic under task retries.
 */
object Spread {
  /** Parquet-compressed source bytes per spread task (small on purpose —
    * the downstream regex/shingle CPU, not the scan, is the unit of work). */
  val PerTaskBytes: Long = 64 * 1024

  /** Small-input regime cap: above cores * this, the spread is identity. */
  val MaxBytesPerCore: Long = 2L * 1024 * 1024

  def toCores(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df // partitioning is the source's business
    val conf = df.sparkSession.conf
    val perTask = conf.get("graft.spread.perTaskBytes", PerTaskBytes.toString).toLong
    val perCore = conf.get("graft.spread.maxBytesPerCore", MaxBytesPerCore.toString).toLong
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes > BigInt(cores) * perCore) return df // corpus scale: identity
    val target = ((bytes + perTask - 1) / perTask).min(BigInt(cores)).toInt
    if (target <= 1) df else df.repartition(target)
  }
}

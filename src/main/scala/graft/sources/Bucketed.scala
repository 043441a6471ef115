package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed-table layout for shuffle-free co-located joins — the storage
 * answer to a repeated big⋈big equi-join (feature store ⋈ label store,
 * corpus ⋈ per-doc scores): both sides written with `bucketBy(n, key)`
 * into the session catalog hash-partition their FILES by the join key at
 * write time, so every later join/aggregation on that key reads
 * co-located buckets and plans ZERO exchanges (spec-pinned). At 100 TB
 * this converts the recurring shuffle of the largest table into a
 * one-time write-side cost.
 *
 * Bucket counts must match across join partners (Spark joins bucketed
 * tables shuffle-free when the bucket specs line up); `sortBy` inside the
 * bucket additionally enables merge-join without a sort.
 */
object Bucketed {

  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    require(nBuckets > 0, "nBuckets must be positive")
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}

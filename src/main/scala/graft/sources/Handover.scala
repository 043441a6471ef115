package graft.sources

import org.apache.spark.sql.DataFrame

/**
 * A1 training-handover parquet sink (reference petastorm_handover,
 * spark/preprocess.py:47-62): repartition + parquet with a small block size
 * so downstream per-shard readers get many small row groups to stream.
 * The UUID-scoped directory convention is kept; Petastorm itself is not
 * (training consumes the same parquet via Spark, SURVEY §2 A2).
 */
object Handover {

  def write(df: DataFrame, baseDir: String, partitions: Int,
      blockSizeBytes: Int = 1 << 20): String = {
    val path = s"$baseDir/caspr-handover-${java.util.UUID.randomUUID()}"
    df.repartition(partitions)
      .write.mode("overwrite")
      .option("parquet.block.size", blockSizeBytes.toString)
      .parquet(path)
    path
  }

  /** A2/A3 consume side: re-read the handover for per-partition iteration. */
  def read(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}

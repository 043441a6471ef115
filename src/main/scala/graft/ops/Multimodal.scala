package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing (SURVEY.md §7.5): media as opaque `binary`
 * columns plus typed metadata, processed in partition-sized batches.
 *
 * The decode step is a clearly-marked deterministic STUB (no image/audio
 * codecs in this environment); everything around it — schema, typed
 * mapPartitions batching, partition sizing — is the real production shape.
 * In PySpark this stage would be `mapInPandas`; the Scala-native equivalent
 * is a typed `mapPartitions`, which keeps the batch loop in the JVM with no
 * Arrow hop.
 */
object Multimodal {

  /** Decoded-media metadata produced by the (stubbed) decoder. */
  final case class MediaMeta(doc_id: Long, byte_len: Long, width: Long,
      height: Long, n_frames: Long)

  val metaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))

  /**
   * STUB decoder: derives fake dimensions deterministically from payload
   * length. A real build replaces ONLY this function with a codec call
   * (e.g. javacv / TwelveMonkeys); the call sites do not change.
   */
  def decodeStub(payload: Array[Byte]): (Long, Long, Long) = {
    val len = payload.length.toLong
    (64 + len % 512, 64 + (len * 7) % 512, len % 30 + 1) // (width, height, frames)
  }

  /** Attach a binary payload column (here: utf-8 of the text, as the fake
    * media bytes the decode stage consumes). */
  def withBinaryPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8").cast(BinaryType))

  /**
   * Batch "decode": typed mapPartitions over (id, payload) rows emitting
   * typed metadata. Rows stream through in partition batches — constant
   * memory, no driver involvement, parallelism = input splits.
   */
  def decodeMetadata(spark: SparkSession, withPayload: DataFrame,
      idCol: String): DataFrame = {
    import spark.implicits._
    withPayload.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val (w, h, f) = decodeStub(payload)
          MediaMeta(id, payload.length.toLong, w, h, f)
        }
      }
      .toDF()
  }
}

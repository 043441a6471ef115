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

  /** One sampled frame: (doc, frame index within the media, payload slice
    * standing in for decoded pixels, fixed-dim feature vector). */
  final case class Frame(doc_id: Long, frame_idx: Long, frame_bytes: Array[Byte],
      features: Array[Float])

  /**
   * STUB frame extractor: slices `frameLen` bytes at a deterministic
   * per-frame offset — the stand-in for "decode frame i and resize to the
   * model's input size". A real build replaces ONLY this function.
   */
  def frameStub(payload: Array[Byte], frameIdx: Long, frameLen: Int): Array[Byte] = {
    if (payload.isEmpty) return Array.emptyByteArray
    val off = ((frameIdx * 2654435761L) % payload.length).toInt.abs
    Array.tabulate(math.min(frameLen, payload.length))(i =>
      payload((off + i) % payload.length))
  }

  /**
   * STUB feature extractor: `dim` byte-histogram-ish floats from the frame
   * bytes — the stand-in for an image-encoder forward. Deterministic.
   */
  def featureStub(frame: Array[Byte], dim: Int): Array[Float] = {
    val f = new Array[Float](dim)
    var i = 0
    while (i < frame.length) { f(i % dim) += (frame(i) & 0xFF) / 255.0f; i += 1 }
    f
  }

  /**
   * Frame sampling + per-frame featurization: for each media payload, emit
   * every `stride`-th frame (capped at `maxFrames`) with its stub-decoded
   * bytes and feature vector. The 1->N row explosion happens INSIDE the
   * typed mapPartitions (an iterator flatMap — frames stream out without
   * materializing a per-doc list), which is the production shape for video:
   * input rows are media files, output rows are frames, and downstream
   * stages (dedup on frame features, ANN over frame embeddings) operate on
   * the frame table. Parallelism = input splits; memory = one frame batch.
   */
  def sampleFrames(spark: SparkSession, withPayload: DataFrame, idCol: String,
      stride: Int = 2, maxFrames: Int = 8, frameLen: Int = 64,
      featDim: Int = 8): DataFrame = {
    import spark.implicits._
    require(stride >= 1 && maxFrames >= 1)
    withPayload.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val (_, _, nFrames) = decodeStub(payload)
          (0L until nFrames by stride.toLong).take(maxFrames).iterator.map { fi =>
            val bytes = frameStub(payload, fi, frameLen)
            Frame(id, fi, bytes, featureStub(bytes, featDim))
          }
        }
      }
      .toDF()
  }
}

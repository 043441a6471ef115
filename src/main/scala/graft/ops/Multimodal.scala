package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Pluggable media decoder contract for the multimodal operators. The
 * Spark-side plumbing (schemas, typed mapPartitions batching, 1->N frame
 * explosion) is codec-agnostic; a real build supplies an implementation
 * backed by an actual codec (javacv, TwelveMonkeys, ffmpeg-over-JNI) and
 * NOTHING else changes — the operators take the decoder as a parameter.
 *
 * Must be Serializable: instances ship inside task closures. Implement as
 * an `object` or a small case class holding only config (codec handles
 * must be created lazily per-executor, e.g. via a transient lazy val).
 */
trait MediaDecoder extends Serializable {

  /** Probe the container: (width, height, frame count). */
  def probe(payload: Array[Byte]): (Long, Long, Long)

  /** Decode frame `frameIdx` and resize toward the model input
    * (`frameLen` bytes here stands in for a WxHxC pixel budget). */
  def decodeFrame(payload: Array[Byte], frameIdx: Long, frameLen: Int): Array[Byte]

  /** Feature-extract a decoded frame to a `dim`-float vector (the
    * image-encoder forward in a real build). */
  def features(frame: Array[Byte], dim: Int): Array[Float]

  /** `w*h`-byte row-major luminance grid for perceptual hashing. Default:
    * the frame-0 decode sliced / zero-padded to `w*h` — exactly what
    * [[StubDecoder]]'s deterministic fake frames give (and therefore what
    * the DuckDB oracle replays); real codecs override with resample +
    * ITU-R BT.601 luma ([[ImageIoDecoder]]). */
  def luma(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val raw = decodeFrame(payload, 0L, w * h)
    if (raw.length == w * h) raw else java.util.Arrays.copyOf(raw, w * h)
  }
}

/**
 * The test/sandbox implementation: deterministic fakes derived from the
 * payload bytes (no image/audio codecs exist in this environment). This
 * is the clearly-marked STUB half of SURVEY.md §7.5 — the DuckDB oracle
 * for `q_multimodal_meta` mirrors exactly these formulas.
 */
object StubDecoder extends MediaDecoder {

  /** Fake dimensions, deterministic in payload length. */
  override def probe(payload: Array[Byte]): (Long, Long, Long) = {
    val len = payload.length.toLong
    (64 + len % 512, 64 + (len * 7) % 512, len % 30 + 1) // (width, height, frames)
  }

  /** Slices `frameLen` bytes at a deterministic per-frame offset — the
    * stand-in for "decode frame i and resize". */
  override def decodeFrame(payload: Array[Byte], frameIdx: Long,
      frameLen: Int): Array[Byte] = {
    if (payload.isEmpty) return Array.emptyByteArray
    val off = ((frameIdx * 2654435761L) % payload.length).toInt.abs
    Array.tabulate(math.min(frameLen, payload.length))(i =>
      payload((off + i) % payload.length))
  }

  /** `dim` byte-histogram-ish floats — the stand-in for an image-encoder
    * forward. Deterministic. */
  override def features(frame: Array[Byte], dim: Int): Array[Float] = {
    val f = new Array[Float](dim)
    var i = 0
    while (i < frame.length) { f(i % dim) += (frame(i) & 0xFF) / 255.0f; i += 1 }
    f
  }
}

/**
 * A REAL image codec behind the [[MediaDecoder]] contract, built entirely
 * on the JDK's `javax.imageio` (PNG/JPEG/BMP/GIF readers ship with the
 * JVM — no external codec dependency). Closes the "environment-blocked"
 * caveat on the multimodal stack: [[StubDecoder]] remains the
 * deterministic oracle fixture, this decoder is what a production
 * deployment plugs in for actual images — and per the contract, NOTHING
 * in the operators changes (spec-checked: decodeMetadata/sampleFrames run
 * unchanged over real PNG payloads).
 *
 *  - probe: container dimensions + image count (animated GIF = frames);
 *  - decodeFrame: decode frame i, nearest-neighbor resize to an s x s
 *    RGB thumbnail where 3s² <= frameLen (the "resize toward the model
 *    input budget" step), emitted as row-major RGB bytes;
 *  - features: mean-pooled byte histogram over the decoded bytes (the
 *    image-encoder forward stand-in, same fold as the stub).
 *
 * Unreadable payloads (not a known container) probe as (0, 0, 0): zero
 * frames means [[Multimodal.sampleFrames]] emits no rows for them — the
 * skip-broken-media behavior corpus pipelines want, not a task failure.
 * Stateless object: safe inside task closures; ImageIO readers are
 * created per call (they are not thread-safe to share).
 */
object ImageIoDecoder extends MediaDecoder {

  private def read(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case _: java.io.IOException => None }

  override def probe(payload: Array[Byte]): (Long, Long, Long) = {
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) (0L, 0L, 0L)
      else {
        val r = readers.next()
        try {
          r.setInput(in)
          val n = try r.getNumImages(true) catch { case _: java.io.IOException => 1 }
          (r.getWidth(0).toLong, r.getHeight(0).toLong, math.max(n, 1).toLong)
        } finally r.dispose()
      }
    } catch { case _: java.io.IOException => (0L, 0L, 0L) }
    finally if (in != null) in.close()
  }

  override def decodeFrame(payload: Array[Byte], frameIdx: Long,
      frameLen: Int): Array[Byte] = {
    // multi-image containers: read frame `frameIdx` (falls back to 0 for
    // single-image formats); then nearest-neighbor sample to s x s RGB
    val img0 = {
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(in)
            val idx = try {
              val n = r.getNumImages(true)
              if (frameIdx >= 0 && frameIdx < n) frameIdx.toInt else 0
            } catch { case _: java.io.IOException => 0 }
            Option(r.read(idx))
          } catch { case _: java.io.IOException => None }
          finally r.dispose()
        }
      } finally if (in != null) in.close()
    }
    img0.orElse(read(payload)) match {
      case None => Array.emptyByteArray
      case Some(img) =>
        val s = math.max(1, math.sqrt(frameLen / 3.0).toInt)
        val out = new Array[Byte](s * s * 3)
        var y = 0
        while (y < s) {
          var x = 0
          while (x < s) {
            val px = img.getRGB(x * img.getWidth / s, y * img.getHeight / s)
            val o = (y * s + x) * 3
            out(o) = ((px >> 16) & 0xFF).toByte
            out(o + 1) = ((px >> 8) & 0xFF).toByte
            out(o + 2) = (px & 0xFF).toByte
            x += 1
          }
          y += 1
        }
        out
    }
  }

  override def features(frame: Array[Byte], dim: Int): Array[Float] = {
    val f = new Array[Float](dim)
    var i = 0
    while (i < frame.length) { f(i % dim) += (frame(i) & 0xFF) / 255.0f; i += 1 }
    f
  }

  /** Real luminance grid: nearest-neighbor resample to w x h, ITU-R
    * BT.601 integer luma (299R + 587G + 114B) / 1000 per pixel. Unreadable
    * payloads yield the all-zero grid (hash 0 — groups with other
    * unreadables; filter on byte_len upstream like [[Multimodal.dedupFrames]]). */
  override def luma(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
    read(payload) match {
      case None => new Array[Byte](w * h)
      case Some(img) =>
        val out = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val px = img.getRGB(x * img.getWidth / w, y * img.getHeight / h)
            val r = (px >> 16) & 0xFF; val g = (px >> 8) & 0xFF; val b = px & 0xFF
            out(y * w + x) = ((299 * r + 587 * g + 114 * b) / 1000).toByte
            x += 1
          }
          y += 1
        }
        out
    }
}

/**
 * A REAL audio codec behind the [[MediaDecoder]] contract, built entirely
 * on the JDK's `javax.sound.sampled` (the WAV/AIFF/AU readers ship with
 * the JVM — no external codec dependency). Demonstrates that the
 * multimodal operators are modality-agnostic: audio "frames" are
 * ONE-SECOND WINDOWS, so [[Multimodal.sampleFrames]] becomes audio
 * windowing and [[Multimodal.dedupFrames]] window-grain dedup, with
 * NOTHING in the operators changing.
 *
 *  - probe: (sample rate, channels, number of 1 s windows);
 *  - decodeFrame: window `frameIdx` decoded to PCM, downmixed to mono
 *    signed-16-bit little-endian, truncated to `frameLen` bytes;
 *  - features: `dim` per-slice RMS energies of the mono samples in
 *    [0, 1] — the audio-encoder forward stand-in (a real build swaps
 *    in a mel filterbank + encoder).
 *
 * Unreadable payloads probe (0, 0, 0) and decode empty — skip broken
 * media, never fail the task (the [[ImageIoDecoder]] contract).
 * Stateless object: safe inside task closures; streams are created per
 * call.
 */
object WavDecoder extends MediaDecoder {
  import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

  private def open(payload: Array[Byte]): Option[AudioInputStream] =
    try {
      val raw = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val f = raw.getFormat
      val pcm = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        f.getSampleRate, 16, f.getChannels, f.getChannels * 2,
        f.getSampleRate, false)
      Some(if (f.matches(pcm)) raw else AudioSystem.getAudioInputStream(pcm, raw))
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
      case _: IllegalArgumentException => None // no PCM conversion path
    }

  override def probe(payload: Array[Byte]): (Long, Long, Long) =
    open(payload) match {
      case None => (0L, 0L, 0L)
      case Some(in) =>
        try {
          val f = in.getFormat
          val rate = f.getSampleRate.toLong
          val frames = in.getFrameLength
          val windows = if (frames <= 0 || rate <= 0) 0L
            else (frames + rate - 1) / rate
          (rate, f.getChannels.toLong, windows)
        } finally in.close()
    }

  override def decodeFrame(payload: Array[Byte], frameIdx: Long,
      frameLen: Int): Array[Byte] =
    open(payload) match {
      case None => Array.emptyByteArray
      case Some(in) =>
        try {
          val f = in.getFormat
          val ch = f.getChannels
          val rate = f.getSampleRate.toInt
          val frameSize = ch * 2
          var toSkip = frameIdx * rate * frameSize
          while (toSkip > 0) {
            val s = in.skip(toSkip)
            if (s <= 0) return Array.emptyByteArray
            toSkip -= s
          }
          val buf = new Array[Byte](rate * frameSize)
          var off = 0
          var n = 0
          while (off < buf.length && { n = in.read(buf, off, buf.length - off); n > 0 })
            off += n
          val nFrames = off / frameSize
          // downmix: average the channels' s16le samples per frame
          val mono = new Array[Byte](math.min(nFrames * 2, frameLen))
          var i = 0
          while (i * 2 + 1 < mono.length) {
            var acc = 0L
            var c = 0
            while (c < ch) {
              val o = i * frameSize + c * 2
              acc += ((buf(o + 1) << 8) | (buf(o) & 0xFF)).toShort
              c += 1
            }
            val v = (acc / ch).toInt
            mono(i * 2) = (v & 0xFF).toByte
            mono(i * 2 + 1) = ((v >> 8) & 0xFF).toByte
            i += 1
          }
          mono
        } finally in.close()
    }

  /** Per-slice RMS energy of the mono s16le samples, normalized to [0, 1]. */
  override def features(frame: Array[Byte], dim: Int): Array[Float] = {
    val f = new Array[Float](dim)
    val nSamp = frame.length / 2
    if (nSamp == 0 || dim == 0) return f
    val cnt = new Array[Int](dim)
    var i = 0
    while (i < nSamp) {
      val v = ((frame(i * 2 + 1) << 8) | (frame(i * 2) & 0xFF)).toShort.toDouble
      val k = (i.toLong * dim / nSamp).toInt
      f(k) += (v * v).toFloat
      cnt(k) += 1
      i += 1
    }
    var k = 0
    while (k < dim) {
      if (cnt(k) > 0) f(k) = (math.sqrt(f(k) / cnt(k)) / 32768.0).toFloat
      k += 1
    }
    f
  }
}

/**
 * Multimodal-column plumbing (SURVEY.md §7.5): media as opaque `binary`
 * columns plus typed metadata, processed in partition-sized batches.
 *
 * The decode step is behind the [[MediaDecoder]] contract with
 * [[StubDecoder]] as the sandbox default; everything around it — schema,
 * typed mapPartitions batching, partition sizing — is the real production
 * shape. In PySpark this stage would be `mapInPandas`; the Scala-native
 * equivalent is a typed `mapPartitions`, which keeps the batch loop in
 * the JVM with no Arrow hop.
 */
object Multimodal {

  /** Decoded-media metadata produced by the decoder's probe. */
  final case class MediaMeta(doc_id: Long, byte_len: Long, width: Long,
      height: Long, n_frames: Long)

  val metaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))

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
      idCol: String, decoder: MediaDecoder = StubDecoder): DataFrame = {
    import spark.implicits._
    withPayload.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val (w, h, f) = decoder.probe(payload)
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
   * Frame sampling + per-frame featurization: for each media payload, emit
   * every `stride`-th frame (capped at `maxFrames`) with its decoded
   * bytes and feature vector. The 1->N row explosion happens INSIDE the
   * typed mapPartitions (an iterator flatMap — frames stream out without
   * materializing a per-doc list), which is the production shape for video:
   * input rows are media files, output rows are frames, and downstream
   * stages (dedup on frame features, ANN over frame embeddings) operate on
   * the frame table. Parallelism = input splits; memory = one frame batch.
   */
  def sampleFrames(spark: SparkSession, withPayload: DataFrame, idCol: String,
      stride: Int = 2, maxFrames: Int = 8, frameLen: Int = 64,
      featDim: Int = 8, decoder: MediaDecoder = StubDecoder): DataFrame = {
    import spark.implicits._
    require(stride >= 1 && maxFrames >= 1)
    withPayload.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val (_, _, nFrames) = decoder.probe(payload)
          (0L until nFrames by stride.toLong).take(maxFrames).iterator.map { fi =>
            val bytes = decoder.decodeFrame(payload, fi, frameLen)
            Frame(id, fi, bytes, decoder.features(bytes, featDim))
          }
        }
      }
      .toDF()
  }

  /**
   * Frame-level exact dedup across the corpus: groups of byte-identical
   * decoded frames — the multimodal counterpart of
   * [[graft.ops.Dedup.exactGroups]] (dedup repeated stills/intro frames
   * before captioning or feature extraction). Groups key on
   * md5(hex(frame_bytes)), so the exchange carries a 32-char hash plus
   * scalars — frame bodies never shuffle; canonical = lexicographic min
   * (doc, frame).
   *
   * Output: (frame_hash, n_frames, canon_doc, canon_frame,
   * frame_byte_len), duplicate groups only (n_frames >= 2).
   */
  /** One perceptual hash: the doc plus its packed average-hash code
    * (`nWords` words of `bitsPerWord` sign bits each). */
  final case class PHashRow(doc_id: Long, pcode: Array[Long])

  /**
   * Perceptual average-hash (aHash) over the decoder's luminance grid:
   * resample the media to a `w` x `h` luma thumbnail, threshold each
   * pixel against the grid mean, pack the bits into `nWords` longs of
   * `bitsPerWord` bits (same word layout as
   * [[graft.ops.Vectors.binaryCode]], so
   * [[graft.ops.Vectors.hammingDist]] ranks distances directly). The
   * classic near-identical-image detector: crops/re-encodes/minor edits
   * keep the hash within a few bits, so frame/thumbnail dedup becomes
   * Hamming search over 64-bit codes instead of pixel comparison.
   *
   * The mean threshold is exact integer math — bit i is
   * `luma(i) * (w*h) > sum(luma)` (cross-multiplied, no division) — so
   * with [[StubDecoder]] (whose luma grid is the leading payload bytes,
   * zero-padded) the whole hash replays in DuckDB byte arithmetic and
   * hash-matches (`q_multimodal_phash`). Real codecs override
   * [[MediaDecoder.luma]] with resample + BT.601 ([[ImageIoDecoder]])
   * and nothing here changes.
   *
   * Scale shape: one typed mapPartitions (the decode), output 8 bytes of
   * code per media row — the corpus' payload bytes never shuffle.
   */
  def perceptualHash(spark: SparkSession, withPayload: DataFrame, idCol: String,
      w: Int = 8, h: Int = 8, nWords: Int = 4, bitsPerWord: Int = 16,
      decoder: MediaDecoder = StubDecoder): DataFrame = {
    import spark.implicits._
    require(w * h == nWords * bitsPerWord,
      s"grid ${w}x$h must supply exactly nWords*bitsPerWord = ${nWords * bitsPerWord} pixels")
    require(bitsPerWord <= 62, "bitsPerWord > 62 overflows the long fold")
    withPayload.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val n = w * h
        it.map { case (id, payload) =>
          val g = decoder.luma(payload, w, h)
          var sum = 0L
          var i = 0
          while (i < n) { sum += (g(i) & 0xFF); i += 1 }
          val words = Array.tabulate(nWords) { wd =>
            var acc = 0L
            var j = bitsPerWord - 1
            while (j >= 0) {
              val b = if ((g(wd * bitsPerWord + j) & 0xFF).toLong * n > sum) 1L else 0L
              acc = acc * 2 + b
              j -= 1
            }
            acc
          }
          PHashRow(id, words)
        }
      }
      .toDF()
  }

  /**
   * Perceptual near-duplicate pairs: docs whose average-hash codes are
   * within `maxDist` Hamming bits. Banded exactly like MinHash-LSH —
   * by pigeonhole, two codes at Hamming distance <= maxDist < nWords
   * agree on at least one whole word, so candidates are the pairs
   * sharing any (word_idx, word_value) key and the band equi-join is
   * EXACT (no recall loss), verified by the full Hamming distance.
   *
   * Scale shape: explode nWords skinny rows per doc, self equi-join on
   * the 16-bit band key, distinct, then one id-keyed join back to the
   * 8-byte codes for verification — no cartesian, payloads never move.
   * Identical-media cliques fan out quadratically in the band join, but
   * so does the pair OUTPUT itself; cap upstream with
   * [[dedupFrames]]-style exact grouping if byte-identical media
   * dominates.
   */
  def phashNearDup(phashes: DataFrame, idCol: String, maxDist: Int): DataFrame = {
    val nWords = 4
    require(maxDist >= 0 && maxDist < nWords,
      s"banding is exact only for maxDist < $nWords words")
    val p = phashes.select(col(idCol).as("__id"), col("pcode"))
    val bands = p.select(col("__id"), posexplode(col("pcode")).as(Seq("__w", "__v")))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.__w") === col("b.__w") && col("a.__v") === col("b.__v") &&
          col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("doc_a"), col("b.__id").as("doc_b"))
      .distinct()
    cand
      .join(p.select(col("__id").as("doc_a"), col("pcode").as("__pa")), Seq("doc_a"))
      .join(p.select(col("__id").as("doc_b"), col("pcode").as("__pb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        Vectors.hammingDist(col("__pa"), col("__pb")).as("ham"))
      .filter(col("ham") <= maxDist)
  }

  /**
   * Persistable perceptual-hash band index: one row per (id, band, word)
   * with the full code inline — the media analogue of
   * [[graft.ops.Dedup.minhashBandIndex]]. Write it to parquet
   * partitioned however the corpus ages; append
   * `phashBandIndex(perceptualHash(newlyAdmitted))` rows to complete
   * each increment.
   */
  def phashBandIndex(phashes: DataFrame, idCol: String): DataFrame =
    phashes.select(col(idCol), posexplode(col("pcode")).as(Seq("band", "word")),
      col("pcode"))

  /**
   * Perceptual near-dup ADMISSION of a new media batch against a
   * [[phashBandIndex]]: every new item is flagged dup/novel with its
   * canonical existing match — the multimodal counterpart of
   * [[graft.ops.Dedup.admitNearDups]], and by the same pigeonhole
   * argument as [[phashNearDup]] the band-keyed candidate join is EXACT
   * for `maxDist < 4` (below the bucket cap): an incoming near-identical
   * image cannot slip past the index.
   *
   * Scale shape: the new batch is decoded once (8-byte codes out); the
   * index side is read pre-bucketed, degenerate buckets (logo frames,
   * solid colors) capped via groupBy-count + broadcast anti-join; the
   * candidate join is (band, word)-keyed and the corpus payloads never
   * move. Output: (id, is_dup, dup_of = min matching existing id,
   * best_ham = min distance among matches; nulls when novel).
   */
  def phashAdmit(newMedia: DataFrame, index: DataFrame, idCol: String,
      maxDist: Int, maxBucket: Int = 1000,
      decoder: MediaDecoder = StubDecoder): DataFrame = {
    require(maxDist >= 0 && maxDist < 4,
      "banding is exact only for maxDist < 4 words")
    val spark = newMedia.sparkSession
    val ph = perceptualHash(spark, newMedia, idCol, decoder = decoder)
    val newBands = ph.select(col("doc_id").as("__new_id"),
      posexplode(col("pcode")).as(Seq("band", "word")), col("pcode").as("__pn"))
    val overCap = index.groupBy(col("band"), col("word"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucket)
      .select(col("band"), col("word"))
    val idx = index.join(broadcast(overCap), Seq("band", "word"), "left_anti")
      .select(col("band"), col("word"), col(idCol).as("__ex_id"),
        col("pcode").as("__pe"))
    val matched = newBands.join(idx, Seq("band", "word"))
      .dropDuplicates("__new_id", "__ex_id")
      .withColumn("__ham", Vectors.hammingDist(col("__pn"), col("__pe")))
      .filter(col("__ham") <= maxDist)
      .groupBy(col("__new_id"))
      .agg(min(col("__ex_id")).as("dup_of"), min(col("__ham")).as("best_ham"))
    ph.select(col("doc_id"))
      .join(matched.withColumnRenamed("__new_id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of").isNotNull.as("is_dup"),
        col("dup_of"), col("best_ham"))
  }

  /**
   * [[phashBandIndex]] packed one row per (band, word) bucket — members
   * inline — the serving layout that lets [[phashAdmitPacked]] resolve
   * admission with NO aggregation after the join (stream-static legal,
   * the [[graft.ops.Dedup.packedAdmitIndex]] house pattern). Buckets
   * over `maxBucket` drop whole at pack time — the degenerate-media cap
   * applied once, not per batch.
   */
  def packedPhashIndex(index: DataFrame, idCol: String,
      maxBucket: Int = 1000): DataFrame =
    index.groupBy(col("band"), col("word"))
      .agg(collect_list(struct(col(idCol).as("id"), col("pcode"))).as("members"))
      .filter(size(col("members")) <= maxBucket)

  /**
   * [[phashAdmit]] against a [[packedPhashIndex]] — identical verdicts
   * (spec-pinned) as 4 stream-static-legal left equi-joins plus
   * row-local array folds: band b joins on word = pcode[b]; candidate
   * member arrays concatenate in-row; Hamming verification, the
   * maxDist filter, min-id dup_of and min best_ham are array HOFs — no
   * post-join aggregation, no state, no watermark. Pass a STREAMING
   * media frame and this is a live admission feed against the persisted
   * index; pass a batch frame and it is a batch operator.
   */
  def phashAdmitPacked(docs: DataFrame, packed: DataFrame, idCol: String,
      maxDist: Int, decoder: MediaDecoder = StubDecoder): DataFrame = {
    require(maxDist >= 0 && maxDist < 4,
      "banding is exact only for maxDist < 4 words")
    val spark = docs.sparkSession
    val memType = packed.schema("members").dataType
    var cur = perceptualHash(spark, docs, idCol, decoder = decoder)
    (0 until 4).foreach { b =>
      val side = packed.filter(col("band") === b)
        .select(col("word").as(s"__pw_$b"), col("members").as(s"__mem_$b"))
      cur = cur.join(side, cur("pcode")(b) === side(s"__pw_$b"), "left")
    }
    val allMem = concat((0 until 4).map(b =>
      coalesce(col(s"__mem_$b"), array().cast(memType))): _*)
    val cands = transform(allMem, m => struct(
      m.getField("id").as("id"),
      Vectors.hammingDist(col("pcode"), m.getField("pcode")).as("ham")))
    val hits = filter(cands, c => c.getField("ham") <= maxDist)
    cur.select(col("doc_id"), hits.as("__hits"))
      .select(col("doc_id"),
        (size(col("__hits")) > 0).as("is_dup"),
        array_min(transform(col("__hits"), _.getField("id"))).as("dup_of"),
        array_min(transform(col("__hits"), _.getField("ham"))).as("best_ham"))
  }

  def dedupFrames(frames: DataFrame, idCol: String): DataFrame =
    frames.select(col(idCol), col("frame_idx"),
        md5(hex(col("frame_bytes"))).as("frame_hash"),
        length(col("frame_bytes")).cast("long").as("frame_byte_len"))
      .filter(col("frame_byte_len") > 0)
      .groupBy(col("frame_hash"))
      .agg(count(lit(1)).as("n_frames"),
        min(struct(col(idCol), col("frame_idx"))).as("__c"),
        min(col("frame_byte_len")).as("frame_byte_len"))
      .filter(col("n_frames") >= 2)
      .select(col("frame_hash"), col("n_frames"),
        col(s"__c.$idCol").as("canon_doc"),
        col("__c.frame_idx").cast("long").as("canon_frame"),
        col("frame_byte_len"))
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Scalar quantization (SQ8) for embedding compression — the simplest tier
 * of the quantized-search family ([[Pq]] product quantization, [[IvfIndex]]
 * coarse cells): each dimension is affinely mapped to one unsigned byte
 * using per-dimension (min, max) fit over the corpus, so a d-dim float
 * vector (4d bytes) stores in d bytes at much higher fidelity than PQ's
 * m bytes. Faiss's `SQ8` / Lucene's scalar-quantized HNSW use exactly this
 * layout as the default compromise before PQ becomes necessary.
 *
 * Everything here is deterministic integer/double arithmetic — fit is an
 * exact per-dimension min/max (no clustering), encode/decode are closed
 * forms — so unlike [[Pq.fit]] the WHOLE pipeline (fit → encode → decode →
 * rank) is replayable by an external SQL engine and oracle-checked
 * end-to-end (`q_ann_sq8`).
 *
 * Scale shape: fit is one posexplode + per-dimension min/max aggregate
 * (map-side partial combine; d rows reach the driver — a fit statistic
 * like [[PqCodebook]]); encode is a narrow codegen'd projection (the
 * params ride the plan as literals); search scans codes (1 byte/dim ≈ 4×
 * less IO than floats, 16× less than doubles) with the query side
 * broadcast — the corpus is never shuffled.
 */
final case class SqParams(mins: Array[Double], maxs: Array[Double]) {
  require(mins.length == maxs.length && mins.nonEmpty, "ragged/empty params")
  val d: Int = mins.length
  /** Per-dimension span; 0 marks a constant dimension (encodes to 0). */
  val spans: Array[Double] = mins.indices.map(i => maxs(i) - mins(i)).toArray

  private[ops] def minsLit: Column = array(mins.map(lit).toIndexedSeq: _*)
  private[ops] def spansLit: Column = array(spans.map(lit).toIndexedSeq: _*)

  /** Encode expression: `clamp(floor((x - min) / span * 255), 0, 255)` per
    * dimension, `array<int>` out. Evaluation order is fixed as
    * `((x - min) / span) * 255` so an external engine replays it
    * bit-identically. */
  def encodeExpr(vec: Column): Column =
    transform(vec, (x, i) => {
      val mn = element_at(minsLit, i + 1)
      val span = element_at(spansLit, i + 1)
      when(span === 0, lit(0))
        .otherwise(least(greatest(
          floor(x.cast("double").minus(mn).divide(span).multiply(255)),
          lit(0L)), lit(255L)).cast("int"))
    })

  /** Decode expression: mid-rise reconstruction
    * `min + (code + 0.5) * span / 255` per dimension, `array<double>` out
    * (the +0.5 centers each cell, halving worst-case error vs the cell
    * floor). */
  def decodeExpr(codes: Column): Column =
    transform(codes, (c, i) =>
      element_at(minsLit, i + 1) +
        (c.cast("double") + lit(0.5)) * element_at(spansLit, i + 1) / lit(255))
}

object Sq {

  /**
   * Fit per-dimension (min, max) over the corpus: posexplode + grouped
   * min/max. The partial aggregation combines map-side, so the exchange
   * carries at most d rows per input partition regardless of corpus size.
   */
  def fit(corpus: DataFrame, vecCol: String = "embedding"): SqParams = {
    val stats = corpus
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("i", "x")))
      .groupBy(col("i")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy(col("i"))
      .collect()
    require(stats.nonEmpty, "empty corpus")
    SqParams(stats.map(_.getDouble(1)), stats.map(_.getDouble(2)))
  }

  /** Compressed corpus: (id, codes array<int>, one byte of information per
    * dimension). For at-rest storage the codes pack to `array<tinyint>`
    * via [[toBytes]]. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
      p: SqParams): DataFrame =
    df.select(col(idCol), p.encodeExpr(col(vecCol)).as("codes"))

  /** Persist fitted params — the [[IvfIndex.save]] pattern for the SQ8
    * tier: fit offline once, [[loadParams]] per serving session. One
    * d-row parquet. */
  def save(p: SqParams, spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    import spark.implicits._
    p.mins.indices.map(i => (i, p.mins(i), p.maxs(i)))
      .toDF("i", "mn", "mx")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  def loadParams(spark: org.apache.spark.sql.SparkSession,
      dir: String): SqParams = {
    val rows = spark.read.parquet(dir).orderBy("i").collect()
    SqParams(rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

  /** Storage form: codes shifted by −128 into signed-byte range (parquet
    * stores `array<tinyint>` elements in one byte each). */
  def toBytes(codes: Column): Column =
    transform(codes, c => (c - 128).cast("tinyint"))

  /** Inverse of [[toBytes]]. */
  def fromBytes(bytes: Column): Column =
    transform(bytes, b => (b.cast("int") + 128))

  /**
   * Exact-over-compressed top-k: each query's float vector against the
   * corpus's decoded codes (squared L2, ascending; id tiebreak) — the
   * SQ scan. Queries broadcast; the corpus side streams codes only.
   * Output: (qid, cid, d2, rnk).
   */
  def topK(queries: DataFrame, qId: String,
      corpusCodes: DataFrame, cId: String,
      p: SqParams, k: Int, vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(qId), col(vecCol).as("__qv"))
    val d2 = graft.functions.VecL2Sq.vecL2Sq(col("__qv"),
      p.decodeExpr(col("codes")))
    val w = Window.partitionBy(col(qId)).orderBy(col("d2").asc, col(cId).asc)
    broadcast(q).crossJoin(corpusCodes)
      .select(col(qId), col(cId), round(d2, 6).as("d2"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(qId), col(cId), col("d2"), col("rnk").cast("long").as("rnk"))
  }
}

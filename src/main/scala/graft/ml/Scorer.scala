package graft.ml

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._
import graft.nn.{EncoderWeights, TransformerConfig}

/**
 * The serving entry point (SURVEY.md §3.3, J6): entity embeddings from the
 * featurizer's wide output.
 *
 * The reference routes this through a pandas_udf that rebuilds a torch
 * dataset per Arrow batch (caspr/utils/spark/score.py:18-78 — JVM -> Arrow
 * -> Python -> C++ per batch). Here it is a typed mapPartitions with
 * broadcast weights: pure JVM, no serialization hop, parallelism = input
 * partitions, constant memory per task. On a 1000-executor cluster the
 * weights broadcast once per executor (~a few MB at d=64) and scoring is
 * embarrassingly parallel.
 */
final case class CasprScorerModel(
    cfg: TransformerConfig,
    weights: EncoderWeights,
    idCol: String,
    seqCatCols: Seq[Seq[String]],  // per cat feature: its T wide columns
    seqContCols: Seq[Seq[String]],
    nonSeqCatCols: Seq[String] = Nil,  // pre-encoded int codes, one per ns cat
    nonSeqContCols: Seq[String] = Nil) {

  /** Adds an `embedding: array<float>` column of length (T' * dModel),
    * T' = T+1 when non-seq features feed the extra timestep (I8). */
  def transform(wide: DataFrame): DataFrame = {
    val spark = wide.sparkSession
    val bc = spark.sparkContext.broadcast(weights)
    val t = seqCatCols.headOption.map(_.size)
      .orElse(seqContCols.headOption.map(_.size)).getOrElse(0)

    val catIdx = seqCatCols.map(_.map(wide.schema.fieldIndex))
    val contIdx = seqContCols.map(_.map(wide.schema.fieldIndex))
    val nsCatIdx = nonSeqCatCols.map(wide.schema.fieldIndex)
    val nsContIdx = nonSeqContCols.map(wide.schema.fieldIndex)
    val idIdx = wide.schema.fieldIndex(idCol)

    val outSchema = StructType(Seq(
      wide.schema(idIdx),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))

    wide.mapPartitions { rows =>
      val w = bc.value
      rows.map { row =>
        val catCodes = Array.tabulate(t, catIdx.size) { (ts, c) =>
          val v = row.get(catIdx(c)(ts))
          if (v == null) 0 else v.asInstanceOf[Number].intValue()
        }
        val cont = Array.tabulate(t, contIdx.size) { (ts, c) =>
          val v = row.get(contIdx(c)(ts))
          if (v == null) 0.0 else v.asInstanceOf[Number].doubleValue()
        }
        val nsCat = Array.tabulate(nsCatIdx.size) { c =>
          val v = row.get(nsCatIdx(c))
          if (v == null) 0 else v.asInstanceOf[Number].intValue()
        }
        val nsCont = Array.tabulate(nsContIdx.size) { c =>
          val v = row.get(nsContIdx(c))
          if (v == null) 0.0 else v.asInstanceOf[Number].doubleValue()
        }
        Row(row.get(idIdx), w.forward(catCodes, cont, nsCat, nsCont))
      }
    }(Encoders.row(outSchema))
  }
}

/**
 * LSTM-architecture scorer (the reference's second encoder; arch switch at
 * caspr/utils/spark/score.py:53-61 — transformer emits flattened enc_src,
 * LSTM emits the attention-fused hidden state). Same mapPartitions +
 * broadcast-weights execution shape as the transformer scorer.
 */
final case class LstmScorerModel(
    weights: graft.nn.LstmEncoderWeights,
    idCol: String,
    seqCatCols: Seq[Seq[String]],
    seqContCols: Seq[Seq[String]]) {

  def transform(wide: DataFrame): DataFrame = {
    val spark = wide.sparkSession
    val bc = spark.sparkContext.broadcast(weights)
    val t = seqCatCols.headOption.map(_.size)
      .orElse(seqContCols.headOption.map(_.size)).getOrElse(0)
    val catIdx = seqCatCols.map(_.map(wide.schema.fieldIndex))
    val contIdx = seqContCols.map(_.map(wide.schema.fieldIndex))
    val idIdx = wide.schema.fieldIndex(idCol)
    val outSchema = StructType(Seq(
      wide.schema(idIdx),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    wide.mapPartitions { rows =>
      val w = bc.value
      rows.map { row =>
        val catCodes = Array.tabulate(t, catIdx.size) { (ts, c) =>
          val v = row.get(catIdx(c)(ts))
          if (v == null) 0 else v.asInstanceOf[Number].intValue()
        }
        val cont = Array.tabulate(t, contIdx.size) { (ts, c) =>
          val v = row.get(contIdx(c)(ts))
          if (v == null) 0.0 else v.asInstanceOf[Number].doubleValue()
        }
        Row(row.get(idIdx), w.forward(catCodes, cont))
      }
    }(Encoders.row(outSchema))
  }
}

object CasprScorer {

  /** Build a deterministic-weight scorer for a featurizer wide output.
    * `nonSeqCat` columns must already be int codes (Encoding.apply);
    * non-seq features enter as the appended extra timestep (I8). */
  def forWide(cfg: TransformerConfig, idCol: String,
      vocabSizes: Map[String, Long], seqLen: Int,
      seqCat: Seq[String], seqCont: Seq[String],
      nonSeqCat: Seq[String] = Nil, nonSeqCont: Seq[String] = Nil): CasprScorerModel = {
    val weights = EncoderWeights.init(cfg, seqCat.map(vocabSizes), seqCont.size,
      nonSeqCat.map(vocabSizes), nonSeqCont.size)
    CasprScorerModel(cfg, weights, idCol,
      seqCat.map(c => (1 to seqLen).map(t => s"${c}_$t")),
      seqCont.map(c => (1 to seqLen).map(t => s"${c}_$t")),
      nonSeqCat, nonSeqCont)
  }
}

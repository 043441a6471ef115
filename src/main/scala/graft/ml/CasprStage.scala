package graft.ml

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.types._
import graft.prep.{CasprFeaturizer, CasprFeaturizerModel, FeaturizerConfig}

/**
 * MLlib Pipeline-stage surface for the featurizer (SURVEY.md §7.1 step 2:
 * "CasprFeaturizer: Estimator -> CasprFeaturizerModel"). Wraps the plain
 * fit/transform pair so it composes with downstream MLlib stages
 * (KMeans, LogisticRegression heads) inside an org.apache.spark.ml.Pipeline.
 */
class CasprStage(val cfg: FeaturizerConfig, override val uid: String)
    extends Estimator[CasprStageModel] {

  def this(cfg: FeaturizerConfig) = this(cfg, Identifiable.randomUID("casprFeaturizer"))

  override def fit(ds: Dataset[_]): CasprStageModel =
    new CasprStageModel(CasprFeaturizer.fit(ds.toDF(), cfg), uid)

  override def copy(extra: ParamMap): CasprStage = new CasprStage(cfg, uid)

  override def transformSchema(schema: StructType): StructType =
    CasprStage.wideSchema(cfg, schema)
}

class CasprStageModel(val model: CasprFeaturizerModel, override val uid: String)
    extends Model[CasprStageModel] {

  override def transform(ds: Dataset[_]): DataFrame = model.transform(ds.toDF())

  override def copy(extra: ParamMap): CasprStageModel = new CasprStageModel(model, uid)

  override def transformSchema(schema: StructType): StructType =
    CasprStage.wideSchema(model.cfg, schema)
}

object CasprStage {

  /** Static output schema of the wide form for a given config. The pivot
    * emits timestep-major order: (f1_1, f2_1, ..., f1_2, f2_2, ...). */
  def wideSchema(cfg: FeaturizerConfig, input: StructType): StructType = {
    val r = cfg.roles
    val tgt = r.tgtId.map(input.apply)
    val catSet = r.seqCat.toSet
    val wide = for (t <- 1 to cfg.seqLen; c <- cfg.seqFeatures)
      yield StructField(s"${c}_$t", if (catSet.contains(c)) LongType else DoubleType)
    val profile = (r.nonSeqCols ++ r.outputCols).distinct
      .filterNot(r.tgtId.contains).map(input.apply)
    StructType(tgt ++ wide ++ profile)
  }
}

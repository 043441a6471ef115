package graft

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.functions._
import graft.core.{ColumnRoles, Tables}
import graft.ml.CasprStage
import graft.prep.FeaturizerConfig

/** The featurizer as a real MLlib Pipeline stage composing with MLlib. */
class CasprStageSpec extends SparkSpec {

  test("Pipeline(featurize -> assemble -> kmeans) fits and transforms") {
    val input = Tables.load(spark, sf, "events")
      .withColumn("pred_date", to_timestamp(lit("2024-02-01 00:00:00")))
    val roles = ColumnRoles(Seq("user_id"), "ts", "pred_date",
      Seq("event_type"), Seq("value"), Seq("event_type", "value", "ts"),
      Nil, Seq("ts"))
    val cfg = FeaturizerConfig(roles, seqLen = 4, historyDays = 21,
      tiebreak = Seq("event_id"))
    val stage = new CasprStage(cfg)
    val contCols = (for (c <- Seq("value", "ts_days"); t <- 1 to 4) yield s"${c}_$t").toArray
    val pipeline = new Pipeline().setStages(Array(
      stage,
      new VectorAssembler().setInputCols(contCols).setOutputCol("features"),
      new KMeans().setK(3).setSeed(42L).setFeaturesCol("features")
        .setPredictionCol("segment")))
    val fitted = pipeline.fit(input)
    val out = fitted.transform(input)
    assert(out.count() == 15)
    assert(out.columns.contains("segment"))
    assert(out.select("segment").distinct().count() == 3)
    // static schema matches the actual transform output for the stage alone
    val schema = stage.transformSchema(input.schema)
    val wide = stage.fit(input).transform(input)
    assert(schema.fieldNames.toSeq == wide.schema.fieldNames.toSeq)
  }
}

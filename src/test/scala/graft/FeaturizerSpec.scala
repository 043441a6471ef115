package graft

import org.apache.spark.sql.functions._
import graft.core.{ColumnRoles, Tables}
import graft.prep.{CasprFeaturizer, FeaturizerConfig}

/** Pipeline-level contract tests (SURVEY.md §5.2 item 2). */
class FeaturizerSpec extends SparkSpec {

  private lazy val events = Tables.load(spark, sf, "events")
  private lazy val input = events.withColumn("pred_date",
    to_timestamp(lit("2024-02-01 00:00:00")))

  private val roles = ColumnRoles(
    tgtId = Seq("user_id"), activityDate = "ts", predictionDate = "pred_date",
    catCols = Seq("event_type"), contCols = Seq("value"),
    seqCols = Seq("event_type", "value", "ts"), nonSeqCols = Nil,
    dateCols = Seq("ts"))
  private val cfg = FeaturizerConfig(roles, seqLen = 4, historyDays = 21,
    tiebreak = Seq("event_id"))

  test("output: one row per active entity; full wide column set") {
    val model = CasprFeaturizer.fit(input, cfg)
    val wide = model.transform(input)
    val active = input.filter(col("ts") < col("pred_date") &&
      col("ts") > col("pred_date") - expr("INTERVAL 21 DAYS"))
      .select("user_id").distinct().count()
    assert(wide.count() == active)
    val expected = Set("user_id") ++
      (for (c <- Seq("event_type", "value", "ts_days"); t <- 1 to 4) yield s"${c}_$t")
    assert(wide.columns.toSet == expected)
  }

  test("min-max cont features land in [0,1]; cat codes are non-negative") {
    val wide = CasprFeaturizer.fit(input, cfg).transform(input)
    for (t <- 1 to 4) {
      val bad = wide.filter(col(s"value_$t") < 0 || col(s"value_$t") > 1).count()
      assert(bad == 0, s"value_$t outside [0,1]")
      assert(wide.filter(col(s"event_type_$t") < 0).count() == 0)
    }
  }

  test("fit on train, apply to disjoint data reuses train statistics") {
    val train = input.filter(col("user_id") < 10)
    val test = input.filter(col("user_id") >= 10)
    val model = CasprFeaturizer.fit(train, cfg)
    val testWide = model.transform(test)
    // codes on test come from the train-fitted vocabulary
    assert(testWide.count() > 0)
    val trainVocab = model.encodings("event_type").mapping.count()
    assert(trainVocab > 0 && trainVocab <= 5)
  }

  test("entity with more events than seqLen is truncated to newest seqLen") {
    val wide = CasprFeaturizer.fit(input, cfg).transform(input)
    // sf0.001 has ~67 events/user; all 4 slots must be filled (no nulls/fills
    // for a fully active user): every cat slot > 0
    for (t <- 1 to 4)
      assert(wide.filter(col(s"event_type_$t") === 0).count() == 0)
  }
}

package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{ColumnRoles, Tables}
import graft.prep.{CasprFeaturizer, FeaturizerConfig}
import Catalog.{HistoryDays, LabelDays, PredTs}

/**
 * End-to-end CASPR featurization (SURVEY.md §3.1) on the events fixture,
 * hash-matched against a single-CTE DuckDB oracle: filter -> rank ->
 * encode -> normalize(min_max) -> pivot(5) -> impute -> profile+label join.
 */
object PipelineQ extends QueryGroup {

  val SeqLen = 5

  def queries: Seq[QueryDef] = Seq(

    // Same pipeline, other config axes: LEFT padding + Z-SCORE + ABSOLUTE
    // (unix seconds) date mode, no profile join. Derived z-values rounded to
    // 6 dp on both sides (engine mean/stddev differ at ~1e-12).
    QueryDef("q_pipeline_e2e_leftpad_z",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val input = ev.withColumn("pred_date", to_timestamp(lit(PredTs)))
        val roles = ColumnRoles(
          tgtId = Seq("user_id"), activityDate = "ts", predictionDate = "pred_date",
          catCols = Seq("event_type"), contCols = Seq("value"),
          seqCols = Seq("event_type", "value", "ts"), nonSeqCols = Nil,
          dateCols = Seq("ts"))
        val cfg = FeaturizerConfig(roles, seqLen = SeqLen, historyDays = HistoryDays,
          leftPad = true, normMode = "z_score", dateMode = "absolute",
          tiebreak = Seq("event_id"))
        val wide = CasprFeaturizer.fit(input, cfg).transform(input)
        val rounded = wide.columns.filter(c => c.startsWith("value_") || c.startsWith("ts_days_"))
          .foldLeft(wide)((d, c) => d.withColumn(c, round(col(c), 6)))
        rounded
      },
      Some {
        val pivotCols = (1 to SeqLen).map { t =>
          s"""  CAST(COALESCE(MAX(CASE WHEN rnk = $t THEN code END), 0) AS BIGINT) AS event_type_$t,
             |  ROUND(COALESCE(MAX(CASE WHEN rnk = $t THEN vnorm END), 0.0), 6) AS value_$t,
             |  ROUND(COALESCE(MAX(CASE WHEN rnk = $t THEN dnorm END), 0.0), 6) AS ts_days_$t""".stripMargin
        }.mkString(",\n")
        s"""WITH f AS (
           |  SELECT * FROM events
           |  WHERE ts < TIMESTAMP '$PredTs'
           |    AND ts > TIMESTAMP '$PredTs' - INTERVAL $HistoryDays DAY),
           |enc AS (
           |  SELECT event_type, ROW_NUMBER() OVER (ORDER BY cnt DESC, event_type) AS code
           |  FROM (SELECT event_type, COUNT(*) AS cnt FROM f GROUP BY event_type)),
           |stats AS (
           |  SELECT AVG(value) AS vmu, STDDEV_SAMP(value) AS vsd,
           |    AVG(epoch_ms(ts) // 1000) AS dmu,
           |    STDDEV_SAMP(epoch_ms(ts) // 1000) AS dsd
           |  FROM f),
           |r AS (
           |  SELECT f.*, COUNT(*) OVER (PARTITION BY user_id) AS cnt,
           |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rd
           |  FROM f),
           |k AS (
           |  SELECT user_id, event_type, value, ts,
           |    (cnt - rd + 1) + $SeqLen - cnt AS rnk
           |  FROM r WHERE rd <= $SeqLen),
           |feat AS (
           |  SELECT k.user_id, rnk, COALESCE(enc.code, 0) AS code,
           |    (value - vmu) / vsd AS vnorm,
           |    ((epoch_ms(ts) // 1000) - dmu) / dsd AS dnorm
           |  FROM k LEFT JOIN enc USING(event_type) CROSS JOIN stats)
           |SELECT user_id,
           |$pivotCols
           |FROM feat GROUP BY user_id""".stripMargin
      }),
    QueryDef("q_pipeline_e2e",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val cust = Tables.load(s, dir, "customer")
        val pred = to_timestamp(lit(PredTs))
        // churn label: no events in the last LabelDays before the cutoff
        val active = ev.filter(col("ts") >= pred - expr(s"INTERVAL $LabelDays DAYS") &&
            col("ts") < pred)
          .select(col("user_id")).distinct().withColumn("churn0", lit(0L))
        // input contract: prediction date + profile + label pre-joined per row
        val input = ev
          .join(cust, ev("user_id") === cust("c_custkey"), "inner").drop("c_custkey")
          .join(active, Seq("user_id"), "left")
          .withColumn("churn", coalesce(col("churn0"), lit(1L))).drop("churn0")
          .withColumn("pred_date", pred)
        val roles = ColumnRoles(
          tgtId = Seq("user_id"),
          activityDate = "ts",
          predictionDate = "pred_date",
          catCols = Seq("event_type"),
          contCols = Seq("value"),
          seqCols = Seq("event_type", "value", "ts"),
          nonSeqCols = Seq("c_acctbal", "c_mktsegment"),
          dateCols = Seq("ts"),
          outputCols = Seq("churn"))
        val cfg = FeaturizerConfig(roles, seqLen = SeqLen, historyDays = HistoryDays,
          tiebreak = Seq("event_id"))
        CasprFeaturizer.fit(input, cfg).transform(input)
      },
      Some {
        val pivotCols = (1 to SeqLen).map { t =>
          s"""  CAST(COALESCE(MAX(CASE WHEN rnk = $t THEN code END), 0) AS BIGINT) AS event_type_$t,
             |  COALESCE(MAX(CASE WHEN rnk = $t THEN vnorm END), 0.0) AS value_$t,
             |  COALESCE(MAX(CASE WHEN rnk = $t THEN dnorm END),
             |    (SELECT ($HistoryDays - dmin) / (dmax - dmin) FROM stats)) AS ts_days_$t""".stripMargin
        }.mkString(",\n")
        s"""WITH f AS (
           |  SELECT * FROM events
           |  WHERE ts < TIMESTAMP '$PredTs'
           |    AND ts > TIMESTAMP '$PredTs' - INTERVAL $HistoryDays DAY),
           |enc AS (
           |  SELECT event_type, ROW_NUMBER() OVER (ORDER BY cnt DESC, event_type) AS code
           |  FROM (SELECT event_type, COUNT(*) AS cnt FROM f GROUP BY event_type)),
           |stats AS (
           |  SELECT MIN(value) AS vmin, MAX(value) AS vmax,
           |    MIN(date_diff('day', CAST(ts AS DATE), DATE '2024-02-01')) AS dmin,
           |    MAX(date_diff('day', CAST(ts AS DATE), DATE '2024-02-01')) AS dmax
           |  FROM f),
           |r AS (
           |  SELECT f.*, COUNT(*) OVER (PARTITION BY user_id) AS cnt,
           |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rd
           |  FROM f),
           |k AS (
           |  SELECT user_id, event_type, value, ts,
           |    CASE WHEN cnt >= $SeqLen THEN (cnt - rd + 1) + $SeqLen - cnt
           |         ELSE cnt - rd + 1 END AS rnk
           |  FROM r WHERE rd <= $SeqLen),
           |feat AS (
           |  SELECT k.user_id, rnk, COALESCE(enc.code, 0) AS code,
           |    (value - vmin) / (vmax - vmin) AS vnorm,
           |    (date_diff('day', CAST(ts AS DATE), DATE '2024-02-01') - dmin)
           |      / (dmax - dmin) AS dnorm
           |  FROM k LEFT JOIN enc USING(event_type) CROSS JOIN stats),
           |wide AS (
           |  SELECT user_id,
           |$pivotCols
           |  FROM feat GROUP BY user_id),
           |lbl AS (
           |  SELECT DISTINCT user_id, 0 AS churn0 FROM events
           |  WHERE ts >= TIMESTAMP '$PredTs' - INTERVAL $LabelDays DAY
           |    AND ts < TIMESTAMP '$PredTs')
           |SELECT w.*, c.c_acctbal, c.c_mktsegment,
           |  CAST(COALESCE(l.churn0, 1) AS BIGINT) AS churn
           |FROM wide w
           |JOIN customer c ON w.user_id = c.c_custkey
           |LEFT JOIN lbl l USING(user_id)""".stripMargin
      })
  )
}

package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.prep.{Encoding, Windows}
import graft.stats.Planners
import Catalog.{HistoryDays, LabelDays, PredTs}

/**
 * Remaining relational + analytics operator scenarios
 * (SURVEY.md §2 B4/B5/D4/D6/D7/D8/D10/D11/G2/H3/H4/H5/H6/H7/J9/J10).
 */
object Analytics extends QueryGroup {

  private val predCol = to_timestamp(lit(PredTs))
  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  def queries: Seq[QueryDef] = Seq(

    // B4 profile projection + dedup (spark/preprocess.py:606)
    QueryDef("q_b4_profile",
      (s, dir) => Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey").cast("long").as("c_nationkey"),
          col("c_mktsegment"))
        .dropDuplicates(),
      Some("""SELECT DISTINCT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
             |  c_mktsegment FROM customer""".stripMargin)),

    // B5 outlier removal: keep rows within 3 sigma (segmentation/pandas.py:147-155)
    QueryDef("q_b5_outlier",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val stats = li.agg(avg(col("l_extendedprice")).as("mu"),
          stddev_samp(col("l_extendedprice")).as("sd"))
        li.crossJoin(broadcast(stats))
          .filter(abs(col("l_extendedprice") - col("mu")) <= col("sd") * 3)
          .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"))
      },
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber
             |FROM lineitem
             |WHERE abs(l_extendedprice - (SELECT AVG(l_extendedprice) FROM lineitem))
             |   <= 3 * (SELECT STDDEV_SAMP(l_extendedprice) FROM lineitem)""".stripMargin)),

    // B5 variant: Tukey IQR fences — the robust outlier filter (3-sigma
    // collapses when outliers inflate sigma itself; quartiles don't).
    // Exact percentile on both engines (percentile == quantile_cont)
    QueryDef("q_b5_iqr",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val q = ev.agg(
          expr("percentile(value, 0.25)").as("q1"),
          expr("percentile(value, 0.75)").as("q3"))
        ev.crossJoin(broadcast(q))
          .filter(col("value").between(
            col("q1") - (col("q3") - col("q1")) * 1.5,
            col("q3") + (col("q3") - col("q1")) * 1.5))
          .select(col("event_id"), col("user_id"))
      },
      Some("""WITH q AS (SELECT quantile_cont(value, 0.25) AS q1,
             |    quantile_cont(value, 0.75) AS q3 FROM events)
             |SELECT event_id, user_id FROM events, q
             |WHERE value BETWEEN q1 - (q3 - q1) * 1.5
             |                AND q3 + (q3 - q1) * 1.5""".stripMargin)),

    // Robust z-score: (x - median) / (1.4826 * MAD) — the outlier score
    // that survives heavy tails (mean/sigma move with the outliers, the
    // median/MAD pair does not); 1.4826 makes MAD sigma-consistent under
    // normality. Two exact-percentile scalars broadcast onto the rows
    QueryDef("q_robust_z",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val med = ev.agg(expr("percentile(value, 0.5)").as("med"))
        val withMed = ev.crossJoin(broadcast(med))
        val mad = withMed.agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
        withMed.crossJoin(broadcast(mad))
          .select(col("event_id"),
            when(col("mad") === 0, lit(0.0))
              .otherwise(round((col("value") - col("med")) /
                (lit(1.4826) * col("mad")), 6)).as("robust_z"))
      },
      Some("""WITH m AS (SELECT quantile_cont(value, 0.5) AS med FROM events),
             |d AS (SELECT quantile_cont(abs(value - med), 0.5) AS mad FROM events, m)
             |SELECT event_id,
             |  CASE WHEN mad = 0 THEN 0.0
             |       ELSE ROUND((value - med) / (1.4826 * mad), 6) END AS robust_z
             |FROM events, m, d""".stripMargin)),

    // Cross-source quantile normalization (Bolstad 2003 at a 5-point
    // grid): per-event-type score distributions mapped onto the global
    // distribution via distinct-value ranks + one exact percentile-array
    // aggregate — the calibration step before one threshold is applied
    // across heterogeneous sources.
    QueryDef("q_quantile_normalize",
      (s, dir) => graft.prep.Normalize.quantileNormalize(
        Tables.load(s, dir, "events"), "event_type", "value",
        q = 5, idCols = Seq("event_id")),
      Some("""WITH rws AS (SELECT event_id, event_type AS src, CAST(value AS DOUBLE) AS v
             |  FROM events WHERE value IS NOT NULL),
             |sv AS (SELECT src, v, COUNT(*) AS c FROM rws GROUP BY 1, 2),
             |rk AS (SELECT src, v, COALESCE(SUM(c) OVER (PARTITION BY src ORDER BY v
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lt FROM sv),
             |ns AS (SELECT src, COUNT(*) AS n FROM rws GROUP BY 1),
             |gq AS (SELECT quantile_cont(v, [0.0, 0.25, 0.5, 0.75, 1.0]) AS g FROM rws),
             |j AS (SELECT rws.event_id, rws.src, rws.v,
             |    CASE WHEN n > 1 THEN CAST(lt AS DOUBLE)/(n-1) ELSE 0.0 END AS r, g
             |  FROM rws JOIN rk USING (src, v) JOIN ns USING (src) CROSS JOIN gq),
             |k AS (SELECT event_id, src, v, r, g,
             |    CAST(floor(r*4) AS INT) AS lo, r*4 - floor(r*4) AS fr FROM j)
             |SELECT event_id, src AS event_type, v AS value, ROUND(r, 6) AS src_rank,
             |  ROUND(CASE WHEN lo >= 4 THEN g[5]
             |        ELSE g[lo+1] * (1.0 - fr) + g[lo+2] * fr END, 6) AS normalized
             |FROM k""".stripMargin)),

    // The 100 TB production twin: same distinct-grain ranks, but the
    // global grid from the approx_percentile sketch (O(accuracy) heap
    // vs exact percentile's every-distinct-value heap). Sketch output
    // is engine-specific -> rows-only by design; PrepSpec bounds the
    // deviation from the exact twin by the grid's own max gap, and the
    // output CARRIES the grid's observed max rank error vs the declared
    // 1/accuracy as constant audit columns — a quantitative signal in
    // the driver's rows-check.
    QueryDef("q_quantile_normalize_approx",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        graft.prep.Normalize.quantileNormalizeApprox(ev,
            "event_type", "value",
            q = 101, idCols = Seq("event_id"), accuracy = 10000)
          .crossJoin(broadcast(graft.prep.Normalize.quantileGridRankError(
            ev, "value", q = 101, accuracy = 10000)))
      },
      None),

    // B2 window filter with grace period (preprocess.py:90-92):
    // keep ts in [cutoff - grace - history, cutoff - grace], inclusive
    QueryDef("q_b2_grace_filter",
      (s, dir) => {
        val cut = to_timestamp(lit(PredTs))
        val hi = cut - expr("INTERVAL 3 DAYS")
        val lo = hi - expr("INTERVAL 14 DAYS")
        Tables.load(s, dir, "events")
          .filter(col("ts").between(lo, hi))
          .select(col("event_id"), col("user_id"))
      },
      Some(s"""SELECT event_id, user_id FROM events
              |WHERE ts BETWEEN TIMESTAMP '$PredTs' - INTERVAL 17 DAY
              |             AND TIMESTAMP '$PredTs' - INTERVAL 3 DAY""".stripMargin)),

    // G2+F4 sliding-window training set: per-cutoff features inner-joined
    // with clipped labels, unioned across cutoffs (preprocess.py:133-162)
    QueryDef("q_f4_sliding_union",
      (s, dir) => graft.prep.SlidingWindows.trainingSet(
        Tables.load(s, dir, "events"), "user_id", "ts",
        cutoffs = Seq("2024-01-22 00:00:00", "2024-01-29 00:00:00"),
        historyDays = 7, labelDays = 3, labelEvent = "purchase"),
      Some {
        def one(c: String) =
          s"""SELECT f.user_id, f.n_events, f.val_cents, l.label, '$c' AS cutoff
             |FROM (
             |  SELECT user_id, COUNT(*) AS n_events,
             |    CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS val_cents
             |  FROM events
             |  WHERE ts < TIMESTAMP '$c' AND ts > TIMESTAMP '$c' - INTERVAL 7 DAY
             |  GROUP BY user_id) f
             |JOIN (
             |  SELECT user_id, LEAST(COUNT(*), 1) AS label FROM events
             |  WHERE ts >= TIMESTAMP '$c' AND ts < TIMESTAMP '$c' + INTERVAL 3 DAY
             |    AND event_type = 'purchase'
             |  GROUP BY user_id) l USING(user_id)""".stripMargin
        one("2024-01-22 00:00:00") + "\nUNION ALL\n" + one("2024-01-29 00:00:00")
      }),

    // D3 collect_set distinct value lists (spark/preprocess.py:331-332);
    // sorted + joined so output is deterministic and hashable
    QueryDef("q_d3_collect_set",
      (s, dir) => Tables.load(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(concat_ws(",", array_sort(collect_set(col("event_type")))).as("types")),
      Some("""SELECT user_id,
             |  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types
             |FROM events GROUP BY user_id""".stripMargin)),

    // H10 sparsity probe: top-decile share + distinct ratio
    // (segmentation/pandas.py:14-23)
    QueryDef("q_h10_sparsity",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val w = Window.orderBy(col("value").desc, col("event_id").asc)
        ev.withColumn("decile", ntile(10).over(w))
          .agg(
            round(countDistinct(col("value")).cast("double") / count(lit(1)), 6)
              .as("distinct_ratio"),
            round(sum(when(col("decile") === 1, round(col("value") * 100).cast("long"))
                .otherwise(0L)).cast("double") /
              sum(round(col("value") * 100).cast("long")), 6).as("top_decile_share"))
      },
      Some("""WITH d AS (
             |  SELECT value, NTILE(10) OVER (ORDER BY value DESC, event_id) AS decile
             |  FROM events)
             |SELECT
             |  ROUND(COUNT(DISTINCT value) * 1.0 / COUNT(*), 6) AS distinct_ratio,
             |  ROUND(SUM(CASE WHEN decile = 1 THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END) * 1.0
             |    / SUM(CAST(ROUND(value*100) AS BIGINT)), 6) AS top_decile_share
             |FROM d""".stripMargin)),

    // D4 global max as scalar aggregate (spark/preprocess.py:411,476,499)
    QueryDef("q_d4_max",
      (s, dir) => Tables.load(s, dir, "events")
        .agg(unix_millis(max(col("ts"))).as("max_ts_ms"),
             unix_millis(min(col("ts"))).as("min_ts_ms")),
      Some("""SELECT epoch_ms(MAX(ts)) AS max_ts_ms, epoch_ms(MIN(ts)) AS min_ts_ms
             |FROM events""".stripMargin)),

    // D6 percentile of per-entity counts -> seq_len (spark/preprocess.py:485-490)
    QueryDef("q_d6_quantile",
      (s, dir) => {
        val counts = Tables.load(s, dir, "events")
          .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
        counts.agg(
          round(expr("percentile(cnt, 0.25)"), 6).as("p25"),
          round(expr("percentile(cnt, 0.5)"), 6).as("p50"),
          round(expr("percentile(cnt, 0.75)"), 6).as("p75"))
      },
      Some("""WITH c AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id)
             |SELECT ROUND(quantile_cont(cnt, 0.25), 6) AS p25,
             |       ROUND(quantile_cont(cnt, 0.5), 6) AS p50,
             |       ROUND(quantile_cont(cnt, 0.75), 6) AS p75
             |FROM c""".stripMargin)),

    // D7 lookback buckets: events-per-active-entity per window (spark/preprocess.py:493-528)
    QueryDef("q_d7_lookback",
      (s, dir) => Planners.lookbackBuckets(Tables.load(s, dir, "events"),
          "user_id", "ts", predCol, bucketDays = 7)
        .withColumn("ratio", round(col("n_events").cast("double") / col("n_entities"), 6)),
      Some(s"""SELECT CAST(FLOOR(date_diff('day', CAST(ts AS DATE),
              |         DATE '2024-02-01') / 7) AS BIGINT) AS bucket,
              |  COUNT(DISTINCT user_id) AS n_entities, COUNT(*) AS n_events,
              |  ROUND(COUNT(*) * 1.0 / COUNT(DISTINCT user_id), 6) AS ratio
              |FROM events
              |WHERE FLOOR(date_diff('day', CAST(ts AS DATE), DATE '2024-02-01') / 7) >= 0
              |GROUP BY 1""".stripMargin)),

    // D8 label pivot: per-entity multi-hot of activities in the label window
    // (preprocess.py:145-149: pivot_table(size) + clip_upper(1))
    QueryDef("q_d8_label_pivot",
      (s, dir) => {
        val labelStart = predCol - expr(s"INTERVAL $LabelDays DAYS")
        val ev = Tables.load(s, dir, "events").filter(col("ts") >= labelStart && col("ts") < predCol)
        val pivoted = ev.groupBy(col("user_id"))
          .pivot("event_type", eventTypes).agg(count(lit(1)))
          .na.fill(0L, eventTypes)
        eventTypes.foldLeft(pivoted) { (df, t) =>
          df.withColumn(s"lbl_$t", least(col(t), lit(1L))).drop(t)
        }
      },
      Some {
        val conds = eventTypes.map(t =>
          s"LEAST(COUNT(*) FILTER (WHERE event_type = '$t'), 1) AS lbl_$t").mkString(",\n  ")
        s"""SELECT user_id, $conds
           |FROM events
           |WHERE ts >= TIMESTAMP '$PredTs' - INTERVAL $LabelDays DAY
           |  AND ts < TIMESTAMP '$PredTs'
           |GROUP BY user_id""".stripMargin
      }),

    // D10 per-segment profiling means + relative importance (segmentation/pandas.py:229-256)
    QueryDef("q_d10_cluster_profile",
      (s, dir) => {
        val cust = Tables.load(s, dir, "customer")
        val seg = cust.groupBy(col("c_mktsegment"))
          .agg(avg(col("c_acctbal")).as("seg_avg"), count(lit(1)).as("n"))
        val glob = cust.agg(avg(col("c_acctbal")).as("glob_avg"))
        seg.crossJoin(broadcast(glob))
          .select(col("c_mktsegment"), round(col("seg_avg"), 6).as("avg_bal"), col("n"),
            round(col("seg_avg") / col("glob_avg") - 1, 6).as("rel_imp"))
      },
      Some("""SELECT c_mktsegment, ROUND(AVG(c_acctbal), 6) AS avg_bal, COUNT(*) AS n,
             |  ROUND(AVG(c_acctbal) / (SELECT AVG(c_acctbal) FROM customer) - 1, 6) AS rel_imp
             |FROM customer GROUP BY c_mktsegment""".stripMargin)),

    // D11 quantile scoring via ntile (segmentation/pandas.py:26-54 pd.qcut)
    QueryDef("q_d11_ntile",
      (s, dir) => Tables.load(s, dir, "customer")
        .select(col("c_custkey"),
          ntile(4).over(Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc))
            .cast("long").as("quartile")),
      Some("""SELECT c_custkey,
             |  NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
             |FROM customer""".stripMargin)),

    // RFM segmentation at the prediction instant: quintile-scored
    // recency/frequency/monetary (cents-exact) per user, 5 = best,
    // classic rfm code. Same global-ntile convention as q_d11_ntile.
    QueryDef("q_rfm",
      (s, dir) => graft.analyze.Customer.rfm(Tables.load(s, dir, "events"),
        "user_id", "ts", "value", predCol),
      Some(s"""WITH pu AS (SELECT user_id AS entity,
              |    CAST(date_diff('microsecond', MAX(ts), TIMESTAMP '$PredTs') // 86400000000 AS BIGINT) AS recency_days,
              |    CAST(COUNT(*) AS BIGINT) AS frequency,
              |    CAST(COALESCE(SUM(CAST(round(value * 100) AS BIGINT)), 0) AS BIGINT) AS monetary_cents
              |  FROM events GROUP BY user_id)
              |SELECT entity, recency_days, frequency, monetary_cents,
              |  CAST(NTILE(5) OVER (ORDER BY recency_days DESC, entity) AS BIGINT) AS r_score,
              |  CAST(NTILE(5) OVER (ORDER BY frequency, entity) AS BIGINT) AS f_score,
              |  CAST(NTILE(5) OVER (ORDER BY monetary_cents, entity) AS BIGINT) AS m_score,
              |  CAST(NTILE(5) OVER (ORDER BY recency_days DESC, entity) * 100
              |    + NTILE(5) OVER (ORDER BY frequency, entity) * 10
              |    + NTILE(5) OVER (ORDER BY monetary_cents, entity) AS BIGINT) AS rfm
              |FROM pu""".stripMargin)),

    // Cohort LTV triangle: users cohorted by first-event week (engine-
    // neutral arithmetic week index), value accumulated per week of age
    // — cumulative per-member LTV down each cohort row.
    QueryDef("q_cohort_ltv",
      (s, dir) => graft.analyze.Customer.cohortLtv(
        Tables.load(s, dir, "events"), "user_id", "ts", "value"),
      Some("""WITH fw AS (SELECT user_id AS entity,
             |    MIN(date_diff('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts) // 604800000000) AS cohort_week
             |  FROM events GROUP BY user_id),
             |nu AS (SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS n_users FROM fw GROUP BY 1),
             |aged AS (SELECT f.cohort_week,
             |    date_diff('microsecond', TIMESTAMP '1970-01-01 00:00:00', e.ts) // 604800000000
             |      - f.cohort_week AS age_week,
             |    e.user_id AS entity, CAST(round(e.value * 100) AS BIGINT) AS cents
             |  FROM events e JOIN fw f ON f.entity = e.user_id),
             |cell AS (SELECT cohort_week, age_week,
             |    CAST(COUNT(DISTINCT entity) AS BIGINT) AS n_active,
             |    CAST(SUM(cents) AS BIGINT) AS value_cents
             |  FROM aged GROUP BY 1, 2)
             |SELECT c.cohort_week, c.age_week, n.n_users, c.n_active, c.value_cents,
             |  CAST(SUM(c.value_cents) OVER (PARTITION BY c.cohort_week ORDER BY c.age_week
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_value_cents,
             |  ROUND(CAST(SUM(c.value_cents) OVER (PARTITION BY c.cohort_week ORDER BY c.age_week
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             |    / n.n_users / 100.0, 6) AS cum_ltv
             |FROM cell c JOIN nu n USING(cohort_week)""".stripMargin)),

    // Gini concentration of per-user spend (integer-cents exact): the
    // Lorenz inequality number next to groupEntropy — "how lopsided is
    // the mass across units".
    QueryDef("q_gini_spend",
      (s, dir) => graft.ops.Profile.gini(
        Tables.load(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(sum(round(col("value") * 100).cast("long")).as("spend_cents")),
        "spend_cents", "user_id"),
      Some("""WITH pu AS (SELECT user_id AS id,
             |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |r AS (SELECT id, x, ROW_NUMBER() OVER (ORDER BY x, id) AS i,
             |    COUNT(*) OVER () AS n FROM pu)
             |SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS total,
             |  CASE WHEN COUNT(*) > 0 AND SUM(x) > 0
             |       THEN ROUND(SUM((2 * i - n - 1) * x) * 1.0 / (COUNT(*) * SUM(x)), 6)
             |  END AS gini
             |FROM r""".stripMargin)),

    // G2 sliding-window cutoffs (spark/preprocess.py:468-482)
    QueryDef("q_g2_sliding_cutoffs",
      (s, dir) => Planners.slidingCutoffs(Tables.load(s, dir, "events"), "ts",
        nWindows = 4, strideDays = 7),
      Some("""SELECT i AS idx,
             |  strftime(((SELECT CAST(MAX(ts) AS DATE) FROM events)
             |    - CAST(i*7 AS INTEGER)), '%Y-%m-%d') AS cutoff
             |FROM generate_series(0, 3) t(i)""".stripMargin)),

    // H3 NaN fill with 0 (spark/preprocess.py:150-156)
    QueryDef("q_h3_fill",
      (s, dir) => Tables.load(s, dir, "events")
        .withColumn("v_capped", when(col("value") > 150, lit(null)).otherwise(col("value")))
        .na.fill(0.0, Seq("v_capped"))
        .select(col("event_id"), col("v_capped")),
      Some("""SELECT event_id,
             |  COALESCE(CASE WHEN value > 150 THEN NULL ELSE value END, 0.0) AS v_capped
             |FROM events""".stripMargin)),

    // H4 date-NaN fill with the window start (fill_date_nans_sp, spark/preprocess.py:88-135)
    QueryDef("q_h4_date_fill",
      (s, dir) => {
        val start = predCol - expr(s"INTERVAL $HistoryDays DAYS")
        val ranked = Windows.ranks(Tables.load(s, dir, "events"),
          Seq("user_id"), "ts", tiebreak = Seq("event_id"))
        ranked
          .withColumn("ts_maybe", when(col("rank_desc") > 3, lit(null)).otherwise(col("ts")))
          .select(col("event_id"),
            datediff(coalesce(col("ts_maybe"), start), start.cast("date"))
              .cast("long").as("days_from_start"))
      },
      Some(s"""WITH r AS (
              |  SELECT event_id, ts,
              |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rd
              |  FROM events)
              |SELECT event_id,
              |  date_diff('day', CAST(TIMESTAMP '$PredTs' - INTERVAL $HistoryDays DAY AS DATE),
              |    CAST(COALESCE(CASE WHEN rd > 3 THEN NULL ELSE ts END,
              |         TIMESTAMP '$PredTs' - INTERVAL $HistoryDays DAY) AS DATE)) AS days_from_start
              |FROM r""".stripMargin)),

    // H5 date featurization: interval mode + absolute (unix seconds) mode
    // (spark/preprocess.py:586-591)
    QueryDef("q_h5_date_interval",
      (s, dir) => Tables.load(s, dir, "events")
        .select(col("event_id"),
          datediff(predCol, col("ts")).cast("long").as("days_to_pred"),
          unix_seconds(col("ts")).as("ts_unix")),
      Some(s"""SELECT event_id,
              |  date_diff('day', CAST(ts AS DATE), DATE '2024-02-01') AS days_to_pred,
              |  epoch_ms(ts) // 1000 AS ts_unix
              |FROM events""".stripMargin)),

    // H6+H7 encode -> decode round trip; unseen values land on "UNK"
    // (spark/preprocess.py:344-351,355-370)
    QueryDef("q_h6_h7_roundtrip",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val enc = Encoding.fit(ev, "event_type")
        val coded = Encoding.apply(ev, enc, "etype_code")
        Encoding.decode(coded, enc, "etype_code", "etype_decoded")
          .select(col("event_id"), col("etype_code").cast("long").as("etype_code"),
            col("etype_decoded"))
      },
      Some("""WITH m AS (
             |  SELECT event_type, ROW_NUMBER() OVER (ORDER BY cnt DESC, event_type) AS code
             |  FROM (SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type))
             |SELECT e.event_id, CAST(COALESCE(m.code, 0) AS BIGINT) AS etype_code,
             |  COALESCE(m2.event_type, 'UNK') AS etype_decoded
             |FROM events e
             |LEFT JOIN m USING(event_type)
             |LEFT JOIN m m2 ON COALESCE(m.code, 0) = m2.code""".stripMargin)),

    // J9 confusion matrix via groupBy(label, pred).count (metrics.py:31-49)
    QueryDef("q_j9_confusion",
      (s, dir) => Tables.load(s, dir, "customer")
        .select((col("c_acctbal") > 5000).cast("long").as("label"),
          (col("c_custkey") % 2 === 0).cast("long").as("pred"))
        .groupBy(col("label"), col("pred")).agg(count(lit(1)).as("n")),
      Some("""SELECT CAST(c_acctbal > 5000 AS BIGINT) AS label,
             |  CAST(c_custkey % 2 = 0 AS BIGINT) AS pred, COUNT(*) AS n
             |FROM customer GROUP BY 1, 2""".stripMargin)),

    // J10 top-k scores (metrics.py:10-20 argsort top-k)
    QueryDef("q_j10_topk",
      (s, dir) => Tables.load(s, dir, "customer")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        .limit(10)
        .select(col("c_custkey"), col("c_acctbal")),
      Some("""SELECT c_custkey, c_acctbal FROM customer
             |ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 10""".stripMargin)),

    // Calibration report: binned confidence-vs-accuracy + ECE + Brier
    // over a deterministic (prob, label) fixture — completes the metrics
    // family (confusion, AUC, top-k, retrieval) with probability grading
    QueryDef("q_calibration",
      (s, dir) => Planners.calibrationReport(
        Tables.load(s, dir, "customer")
          .select(((col("c_custkey") % 100).cast("double") / 100.0 + 0.005).as("prob"),
            (col("c_acctbal") > 5000).cast("long").as("label")),
        "prob", "label", nBins = 10),
      Some("""WITH src AS (SELECT
             |    CAST(c_custkey % 100 AS DOUBLE) / 100.0 + 0.005 AS p,
             |    CAST(c_acctbal > 5000 AS INT) AS y FROM customer),
             |b AS (SELECT LEAST(GREATEST(CAST(FLOOR(p * 10) AS BIGINT), 0), 9) AS bin, p, y
             |  FROM src),
             |g AS (SELECT bin, COUNT(*) AS n, AVG(p) AS conf,
             |    AVG(CAST(y AS DOUBLE)) AS acc, SUM((p - y) * (p - y)) AS sqe
             |  FROM b GROUP BY 1),
             |t AS (SELECT *, SUM(n) OVER () AS tot FROM g)
             |SELECT bin, CAST(n AS BIGINT) AS n, ROUND(conf, 6) AS confidence,
             |  ROUND(acc, 6) AS accuracy, ROUND(ABS(acc - conf), 6) AS gap,
             |  ROUND(SUM(CAST(n AS DOUBLE) / tot * ABS(acc - conf)) OVER (), 6) AS ece,
             |  ROUND(SUM(sqe) OVER () / tot, 6) AS brier
             |FROM t""".stripMargin)),

    // Spiegelhalter's calibration z on the same (prob, label) fixture:
    // the significance test behind the calibration report — is the
    // observed miscalibration more than chance. One aggregate pass,
    // two sums; the identical op shapes replay in SQL.
    QueryDef("q_spiegelhalter_z",
      (s, dir) => graft.ops.Calibrate.spiegelhalterZ(
        Tables.load(s, dir, "customer")
          .select(((col("c_custkey") % 100).cast("double") / 100.0 + 0.005).as("prob"),
            (col("c_acctbal") > 5000).cast("long").as("label")),
        "prob", "label"),
      Some("""WITH src AS (SELECT
             |    CAST(c_custkey % 100 AS DOUBLE) / 100.0 + 0.005 AS p,
             |    CAST(CAST(c_acctbal > 5000 AS INT) AS DOUBLE) AS y
             |  FROM customer),
             |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    SUM((y - p) * (1.0 - 2.0 * p)) AS num,
             |    SUM((1.0 - 2.0 * p) * (1.0 - 2.0 * p) * p * (1.0 - p))
             |      AS den
             |  FROM src WHERE p >= 0 AND p <= 1)
             |SELECT n,
             |  ROUND(CASE WHEN den > 0 THEN num / sqrt(den) END, 6) AS z
             |FROM a""".stripMargin)),

    // Murphy decomposition of the Brier score on the same probability
    // fixture — reliability/resolution/uncertainty (+ the within-bin
    // variance residual that closes the identity): WHY the score is
    // what it is, next to spiegelhalter's whether-it's-chance. One
    // aggregate to the 10-bin grain, window sums over the bin table.
    QueryDef("q_brier_decomp",
      (s, dir) => graft.ops.Calibrate.brierDecomposition(
        Tables.load(s, dir, "customer")
          .select(((col("c_custkey") % 100).cast("double") / 100.0 + 0.005).as("prob"),
            (col("c_acctbal") > 5000).cast("long").as("label")),
        "prob", "label", nBins = 10),
      Some("""WITH src AS (SELECT
             |    CAST(c_custkey % 100 AS DOUBLE) / 100.0 + 0.005 AS p,
             |    CAST(CAST(c_acctbal > 5000 AS INT) AS DOUBLE) AS y
             |  FROM customer),
             |bb AS (SELECT LEAST(CAST(FLOOR(p * 10) AS BIGINT), 9) AS bin, p, y
             |  FROM src WHERE p >= 0 AND p <= 1),
             |g AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS nk,
             |    SUM(p) AS sp, SUM(y) AS sy,
             |    SUM((p - y) * (p - y)) AS ssq, SUM(p * p) AS spp,
             |    SUM(p * y) AS spy
             |  FROM bb GROUP BY 1),
             |a AS (SELECT
             |    CAST(COALESCE(SUM(nk), 0) AS BIGINT) AS n,
             |    SUM(sy) AS ty, SUM(ssq) AS tsq,
             |    SUM(nk * (sp / nk - sy / nk) * (sp / nk - sy / nk)) AS reln,
             |    SUM(nk * (sy / nk) * (sy / nk)) AS nko2,
             |    SUM(spp - sp / nk * sp) AS wvn,
             |    SUM(spy - sp * sy / nk) AS wcn
             |  FROM g)
             |SELECT n,
             |  ROUND(CASE WHEN n > 0 THEN tsq / n END, 6) AS brier,
             |  ROUND(CASE WHEN n > 0 THEN reln / n END, 6) AS reliability,
             |  ROUND(CASE WHEN n > 0 THEN
             |    GREATEST(nko2 / n - (ty / n) * (ty / n), 0.0) END, 6)
             |    AS resolution,
             |  ROUND(CASE WHEN n > 0 THEN (ty / n) * (1.0 - ty / n) END, 6)
             |    AS uncertainty,
             |  ROUND(CASE WHEN n > 0 THEN GREATEST(wvn, 0.0) / n END, 6)
             |    AS within_var,
             |  ROUND(CASE WHEN n > 0 THEN wcn / n END, 6) AS within_cov
             |FROM a""".stripMargin)),

    // Hosmer–Lemeshow goodness-of-fit on the same probability fixture
    // — the chi2-style significance readout next to the Brier/Murphy
    // decomposition; fixed-width bins (the scalable variant of the
    // textbook deciles), degenerate bins null the statistic honestly.
    QueryDef("q_hosmer_lemeshow",
      (s, dir) => graft.ops.Calibrate.hosmerLemeshow(
        Tables.load(s, dir, "customer")
          .select(((col("c_custkey") % 100).cast("double") / 100.0 + 0.005).as("prob"),
            (col("c_acctbal") > 5000).cast("long").as("label")),
        "prob", "label", nBins = 10),
      Some("""WITH src AS (SELECT
             |    CAST(c_custkey % 100 AS DOUBLE) / 100.0 + 0.005 AS p,
             |    CAST(CAST(c_acctbal > 5000 AS INT) AS DOUBLE) AS y
             |  FROM customer),
             |bb AS (SELECT LEAST(CAST(FLOOR(p * 10) AS BIGINT), 9) AS bin, p, y
             |  FROM src WHERE p >= 0 AND p <= 1),
             |gb AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS nk,
             |    SUM(y) AS o, SUM(p) AS e
             |  FROM bb GROUP BY 1),
             |t AS (SELECT nk, o, e,
             |    nk * (e / nk) * (1.0 - e / nk) AS den FROM gb),
             |a AS (SELECT CAST(COALESCE(SUM(nk), 0) AS BIGINT) AS n,
             |    CAST(COUNT(*) AS BIGINT) AS g,
             |    SUM(CASE WHEN den > 0 THEN (o - e) * (o - e) / den END) AS hl,
             |    CAST(COALESCE(SUM(CASE WHEN den > 0 THEN 0 ELSE 1 END), 0)
             |      AS BIGINT) AS bad
             |  FROM t)
             |SELECT n, g, CASE WHEN g >= 3 THEN g - 2 END AS dof,
             |  ROUND(CASE WHEN bad = 0 THEN hl END, 6) AS hl
             |FROM a""".stripMargin)),

    // Two-sample KS statistic between click and view value distributions
    // — exact empirical-CDF sup-gap, running windows on both engines
    QueryDef("q_ks_test",
      (s, dir) => Planners.ksTest(Tables.load(s, dir, "events"),
        "value", "event_type", "click", "view"),
      Some("""WITH g AS (SELECT value AS v, event_type = 'click' AS isa
             |  FROM events WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
             |d AS (SELECT v, SUM(CASE WHEN isa THEN 1 ELSE 0 END) AS ca,
             |    SUM(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS cb FROM g GROUP BY 1),
             |c AS (SELECT v, SUM(ca) OVER (ORDER BY v) AS cuma,
             |    SUM(cb) OVER (ORDER BY v) AS cumb,
             |    SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb FROM d)
             |SELECT ROUND(MAX(ABS(CAST(cuma AS DOUBLE) / na
             |    - CAST(cumb AS DOUBLE) / nb)), 6) AS ks_d,
             |  CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b
             |FROM c""".stripMargin)),

    // Welch's unequal-variance t between the same two event families:
    // the parametric mean-shift test next to KS — one aggregate pass,
    // two (n, mean, var) triples, no sort anywhere.
    QueryDef("q_welch_t",
      (s, dir) => Planners.welchT(Tables.load(s, dir, "events"),
        "value", "event_type", "click", "view"),
      Some("""WITH g AS (SELECT value AS v, event_type = 'click' AS isa
             |  FROM events WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
             |a AS (SELECT
             |    SUM(CASE WHEN isa THEN 1 ELSE 0 END) AS n_a,
             |    SUM(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS n_b,
             |    AVG(CASE WHEN isa THEN v END) AS ma,
             |    AVG(CASE WHEN NOT isa THEN v END) AS mb,
             |    VAR_SAMP(CASE WHEN isa THEN v END) AS va,
             |    VAR_SAMP(CASE WHEN NOT isa THEN v END) AS vb
             |  FROM g)
             |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
             |  ROUND(ma, 6) AS mean_a, ROUND(mb, 6) AS mean_b,
             |  ROUND((ma - mb) / SQRT(va / n_a + vb / n_b), 6) AS t_stat,
             |  ROUND(POWER(va / n_a + vb / n_b, 2) /
             |    (POWER(va / n_a, 2) / (n_a - 1) + POWER(vb / n_b, 2) / (n_b - 1)), 6) AS dof
             |FROM a""".stripMargin)),

    // One-way ANOVA F across ALL five event families: the k-sample
    // screening test before pairwise Welch/BH — per-group sufficient
    // sums in exact integer cents, quadratic forms clamped, and only
    // the scale-free ratios emitted (raw SS sit at cents^2*n magnitude
    // where double fold-order noise exceeds any rounding grid).
    QueryDef("q_anova_f",
      (s, dir) => Planners.anovaF(Tables.load(s, dir, "events")
          .withColumn("cents", round(col("value") * 100).cast("long")),
        "event_type", "cents"),
      Some("""WITH g AS (SELECT event_type,
             |    CAST(ROUND(value * 100) AS BIGINT) AS x
             |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
             |p AS (SELECT event_type, COUNT(*) AS ng,
             |    CAST(SUM(x) AS BIGINT) AS sg,
             |    SUM(CAST(x AS HUGEINT) * x) AS ssg
             |  FROM g GROUP BY 1),
             |a AS (SELECT CAST(COALESCE(SUM(ng), 0) AS BIGINT) AS n,
             |    CAST(COUNT(*) AS BIGINT) AS k,
             |    CAST(SUM(sg) AS BIGINT) AS s,
             |    SUM(CAST(ssg AS DOUBLE) - CAST(sg AS DOUBLE) * sg / ng)
             |      AS ssw0,
             |    SUM(CAST(sg AS DOUBLE) * sg / ng) AS sb0
             |  FROM p),
             |b AS (SELECT n, k,
             |    GREATEST(sb0 - CAST(s AS DOUBLE) * s / n, 0.0) AS ssb,
             |    GREATEST(ssw0, 0.0) AS ssw
             |  FROM a)
             |SELECT n, k, k - 1 AS dof1, n - k AS dof2,
             |  ROUND(CASE WHEN k >= 2 AND n > k AND ssw > 0
             |    THEN (ssb / (k - 1)) / (ssw / (n - k)) END, 6) AS f_stat,
             |  ROUND(CASE WHEN ssb + ssw > 0
             |    THEN ssb / (ssb + ssw) END, 6) AS eta_sq
             |FROM b""".stripMargin)),

    // Mann–Whitney U (rank-sum, midrank ties, tie-corrected z) between
    // the same two families: the nonparametric location test — ranks
    // computed on the DISTINCT-value table via running sums, the KS scan
    // shape.
    QueryDef("q_mann_whitney",
      (s, dir) => Planners.mannWhitneyU(Tables.load(s, dir, "events"),
        "value", "event_type", "click", "view"),
      Some("""WITH g AS (SELECT value AS v, event_type = 'click' AS isa
             |  FROM events WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
             |d AS (SELECT v, SUM(CASE WHEN isa THEN 1 ELSE 0 END) AS ca,
             |    SUM(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS cb,
             |    COUNT(*) AS t FROM g GROUP BY 1),
             |r AS (SELECT *, COALESCE(SUM(t) OVER (ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev FROM d),
             |m AS (SELECT ca, cb, t, prev + (t + 1.0) / 2 AS midrank FROM r),
             |a AS (SELECT SUM(ca) AS n_a, SUM(cb) AS n_b,
             |    SUM(ca * midrank) AS rs_a,
             |    SUM(POWER(CAST(t AS DOUBLE), 3) - t) AS ties
             |  FROM m)
             |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
             |  ROUND(rs_a - n_a * (n_a + 1.0) / 2, 6) AS u_a,
             |  ROUND(CAST(n_a AS DOUBLE) * n_b - (rs_a - n_a * (n_a + 1.0) / 2), 6) AS u_b,
             |  ROUND(((rs_a - n_a * (n_a + 1.0) / 2) - CAST(n_a AS DOUBLE) * n_b / 2) /
             |    SQRT(CAST(n_a AS DOUBLE) * n_b / 12 *
             |      ((n_a + n_b + 1) - ties / ((n_a + n_b) * (n_a + n_b - 1.0)))), 6) AS z,
             |  ROUND((rs_a - n_a * (n_a + 1.0) / 2) * 2 / (CAST(n_a AS DOUBLE) * n_b) - 1, 6) AS r_rb
             |FROM a""".stripMargin)),

    // Kruskal–Wallis H across ALL five event families — the k-sample
    // rank test completing the anovaF/mannWhitney grid: doubled
    // midranks are exact integers (HUGEINT rank-sums on both engines),
    // only the scale-free H/epsilon² pass through doubles.
    QueryDef("q_kruskal_wallis",
      (s, dir) => Planners.kruskalWallis(Tables.load(s, dir, "events"),
        "value", "event_type"),
      Some("""WITH g AS (SELECT value AS v, event_type AS gr FROM events
             |    WHERE value IS NOT NULL AND event_type IS NOT NULL),
             |d AS (SELECT v, gr, COUNT(*) AS c FROM g GROUP BY 1, 2),
             |vt AS (SELECT v, SUM(c) AS t FROM d GROUP BY 1),
             |rk AS (SELECT v, t, COALESCE(SUM(t) OVER (ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev FROM vt),
             |mm AS (SELECT d.gr, d.c, 2 * rk.prev + rk.t + 1 AS mr2
             |  FROM d JOIN rk ON d.v = rk.v),
             |pg AS (SELECT gr, CAST(SUM(c) AS BIGINT) AS ng,
             |    SUM(CAST(c AS HUGEINT) * mr2) AS rs2 FROM mm GROUP BY 1),
             |tw AS (SELECT COALESCE(SUM(CAST(t AS HUGEINT) * t * t - t), 0) AS tt FROM rk),
             |ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
             |    CAST(COALESCE(SUM(ng), 0) AS BIGINT) AS n,
             |    SUM(CAST(rs2 AS DOUBLE) * CAST(rs2 AS DOUBLE) / ng) AS q4 FROM pg),
             |hh AS (SELECT n, k,
             |    CASE WHEN k >= 2 AND n > 1 AND
             |        1.0 - CAST(tt AS DOUBLE) / (CAST(n AS DOUBLE) * n * n - n) > 0
             |      THEN (3.0 * q4 / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1)) /
             |           (1.0 - CAST(tt AS DOUBLE) / (CAST(n AS DOUBLE) * n * n - n))
             |    END AS hval
             |  FROM ag, tw)
             |SELECT n, k, k - 1 AS dof, ROUND(hval, 6) AS h,
             |  ROUND(CASE WHEN n > k THEN (hval - k + 1) / (n - k) END, 6) AS epsilon_sq
             |FROM hh""".stripMargin)),

    // Dunn's post-hoc pairwise z for the same five families — WHICH
    // pairs differ after a significant Kruskal–Wallis; the 10 raw
    // z-values are what bhFdr would correct. Self-join of the k-row
    // group table only.
    QueryDef("q_dunn_pairwise",
      (s, dir) => Planners.dunnPairwise(Tables.load(s, dir, "events"),
        "value", "event_type"),
      Some("""WITH g AS (SELECT value AS v, event_type AS gr FROM events
             |    WHERE value IS NOT NULL AND event_type IS NOT NULL),
             |d AS (SELECT v, gr, COUNT(*) AS c FROM g GROUP BY 1, 2),
             |vt AS (SELECT v, SUM(c) AS t FROM d GROUP BY 1),
             |rk AS (SELECT v, t, COALESCE(SUM(t) OVER (ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev FROM vt),
             |mm AS (SELECT d.gr, d.c, 2 * rk.prev + rk.t + 1 AS mr2
             |  FROM d JOIN rk ON d.v = rk.v),
             |pg AS (SELECT gr, CAST(SUM(c) AS BIGINT) AS ng,
             |    SUM(CAST(c AS HUGEINT) * mr2) AS rs2 FROM mm GROUP BY 1),
             |tw AS (SELECT COALESCE(SUM(CAST(t AS HUGEINT) * t * t - t), 0) AS tt,
             |    CAST(COALESCE(SUM(t), 0) AS BIGINT) AS n FROM rk),
             |gm AS (SELECT gr, ng, CAST(rs2 AS DOUBLE) / (2.0 * ng) AS mr FROM pg),
             |vv AS (SELECT n,
             |    (CAST(n AS DOUBLE) * (n + 1) - CAST(tt AS DOUBLE) / (n - 1)) / 12 AS v
             |  FROM tw)
             |SELECT l.gr AS group_a, r2.gr AS group_b,
             |  l.ng AS n_a, r2.ng AS n_b,
             |  ROUND(l.mr, 6) AS mean_rank_a, ROUND(r2.mr, 6) AS mean_rank_b,
             |  ROUND(CASE WHEN n > 1 AND v > 0 THEN (l.mr - r2.mr) /
             |    SQRT(v * (1.0 / l.ng + 1.0 / r2.ng)) END, 6) AS z
             |FROM gm l JOIN gm r2 ON l.gr < r2.gr, vv""".stripMargin)),

    // Brown–Forsythe spread-equality test across the five families —
    // the variance-homogeneity check behind anovaF's pooling: ANOVA F
    // on |2x − 2·median_g| (doubled so deviations stay exact longs;
    // F is invariant under the common scaling).
    QueryDef("q_brown_forsythe",
      (s, dir) => Planners.brownForsythe(Tables.load(s, dir, "events")
          .withColumn("cents", round(col("value") * 100).cast("long")),
        "cents", "event_type"),
      Some("""WITH g AS (SELECT event_type AS gr,
             |    CAST(ROUND(value * 100) AS BIGINT) AS x
             |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
             |md AS (SELECT gr, CAST(2 * median(x) AS BIGINT) AS med2
             |  FROM g GROUP BY 1),
             |z AS (SELECT g.gr, ABS(2 * g.x - md.med2) AS zz
             |  FROM g JOIN md ON g.gr = md.gr),
             |p AS (SELECT gr, COUNT(*) AS ng, CAST(SUM(zz) AS BIGINT) AS sg,
             |    SUM(CAST(zz AS HUGEINT) * zz) AS ssg FROM z GROUP BY 1),
             |a AS (SELECT CAST(COALESCE(SUM(ng), 0) AS BIGINT) AS n,
             |    CAST(COUNT(*) AS BIGINT) AS k,
             |    CAST(SUM(sg) AS BIGINT) AS s,
             |    SUM(CAST(ssg AS DOUBLE) - CAST(sg AS DOUBLE) * sg / ng)
             |      AS ssw0,
             |    SUM(CAST(sg AS DOUBLE) * sg / ng) AS sb0
             |  FROM p),
             |b AS (SELECT n, k,
             |    GREATEST(sb0 - CAST(s AS DOUBLE) * s / n, 0.0) AS ssb,
             |    GREATEST(ssw0, 0.0) AS ssw
             |  FROM a)
             |SELECT n, k, k - 1 AS dof1, n - k AS dof2,
             |  ROUND(CASE WHEN k >= 2 AND n > k AND ssw > 0
             |    THEN (ssb / (k - 1)) / (ssw / (n - k)) END, 6) AS f_stat,
             |  ROUND(CASE WHEN ssb + ssw > 0
             |    THEN ssb / (ssb + ssw) END, 6) AS eta_sq
             |FROM b""".stripMargin)),

    // Two-sample Poisson rate-ratio z between even/odd user cohorts:
    // high-value events per event of exposure — the unbounded-count
    // companion of q_proportion_z.
    QueryDef("q_poisson_rate",
      (s, dir) => Planners.poissonRateTest(
        Tables.load(s, dir, "events").filter(col("value").isNotNull)
          .groupBy(col("user_id"))
          .agg(sum(when(col("value") > 500, 1L).otherwise(0L)).as("ev"),
            count(lit(1)).as("ex"))
          .withColumn("grp", when(pmod(col("user_id"), lit(2)) === 0, "a")
            .otherwise("b")),
        "ev", "ex", "grp", "a", "b"),
      Some("""WITH u AS (SELECT user_id,
             |    SUM(CASE WHEN value > 500 THEN 1 ELSE 0 END) AS ev,
             |    COUNT(*) AS ex,
             |    CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS grp
             |  FROM events WHERE value IS NOT NULL GROUP BY 1),
             |a AS (SELECT
             |    CAST(COALESCE(SUM(CASE WHEN grp = 'a' THEN ev ELSE 0 END), 0)
             |      AS BIGINT) AS events_a,
             |    CAST(COALESCE(SUM(CASE WHEN grp <> 'a' THEN ev ELSE 0 END), 0)
             |      AS BIGINT) AS events_b,
             |    CAST(COALESCE(SUM(CASE WHEN grp = 'a' THEN ex ELSE 0 END), 0)
             |      AS BIGINT) AS exposure_a,
             |    CAST(COALESCE(SUM(CASE WHEN grp <> 'a' THEN ex ELSE 0 END), 0)
             |      AS BIGINT) AS exposure_b
             |  FROM u),
             |f AS (SELECT *,
             |    CASE WHEN exposure_a > 0
             |      THEN CAST(events_a AS DOUBLE) / exposure_a END AS r1,
             |    CASE WHEN exposure_b > 0
             |      THEN CAST(events_b AS DOUBLE) / exposure_b END AS r2
             |  FROM a),
             |f2 AS (SELECT *,
             |    CASE WHEN events_a > 0 AND events_b > 0 AND r2 > 0
             |      THEN r1 / r2 END AS ratio FROM f)
             |SELECT events_a, events_b, exposure_a, exposure_b,
             |  ROUND(r1, 6) AS rate_a, ROUND(r2, 6) AS rate_b,
             |  ROUND(ratio, 6) AS ratio,
             |  ROUND(LN(ratio) / SQRT(1.0 / events_a + 1.0 / events_b), 6)
             |    AS z
             |FROM f2""".stripMargin)),

    // Fleiss' kappa over each user's first four events as four
    // "ratings" of the event-type category — the multi-rater agreement
    // readout next to cohen_kappa/krippendorff; exact HUGEINT squares.
    QueryDef("q_fleiss_kappa",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Planners.fleissKappa(
          Tables.load(s, dir, "events")
            .filter(col("event_type").isNotNull)
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") <= 4)
            .select(col("user_id"), col("event_type")),
          "user_id", "event_type", ratersPerSubject = 4)
      },
      Some("""WITH r AS (SELECT user_id, event_type,
             |    ROW_NUMBER() OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS rn
             |  FROM events WHERE event_type IS NOT NULL),
             |rt AS (SELECT user_id, event_type FROM r WHERE rn <= 4),
             |cells AS (SELECT user_id AS i, event_type AS j, COUNT(*) AS c
             |  FROM rt GROUP BY 1, 2),
             |ps AS (SELECT i, SUM(c) AS tot,
             |    SUM(CAST(c AS HUGEINT) * c) AS c2 FROM cells GROUP BY 1),
             |keep AS (SELECT i, c2 FROM ps WHERE tot = 4),
             |bs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_subjects,
             |    COALESCE(SUM(c2), 0) AS sc2 FROM keep),
             |bc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_categories,
             |    COALESCE(SUM(CAST(cj AS HUGEINT) * cj), 0) AS scj2
             |  FROM (SELECT cells.j, SUM(cells.c) AS cj FROM cells
             |    JOIN keep ON cells.i = keep.i GROUP BY 1)),
             |f AS (SELECT n_subjects, n_categories,
             |    (CAST(sc2 AS DOUBLE) - CAST(n_subjects AS DOUBLE) * 4.0) /
             |      (CAST(n_subjects AS DOUBLE) * 4.0 * (4.0 - 1)) AS p_bar,
             |    CAST(scj2 AS DOUBLE) /
             |      (CAST(n_subjects AS DOUBLE) * 4.0 *
             |       (CAST(n_subjects AS DOUBLE) * 4.0)) AS p_e
             |  FROM bs, bc)
             |SELECT n_subjects, n_categories,
             |  ROUND(p_bar, 6) AS p_bar, ROUND(p_e, 6) AS p_e,
             |  ROUND(CASE WHEN 1.0 - p_e > 0
             |    THEN (p_bar - p_e) / (1.0 - p_e) END, 6) AS kappa
             |FROM f""".stripMargin)),

    // Chapman capture–recapture over two deterministic document
    // samples (doc_id % 2 vs % 3): how big is the hidden population
    // given two independent partial passes — the dedup-coverage
    // estimator.
    QueryDef("q_chapman",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Planners.chapmanEstimate(
          docs.filter(pmod(col("doc_id"), lit(2)) === 0).select("doc_id"),
          docs.filter(pmod(col("doc_id"), lit(3)) === 0).select("doc_id"))
      },
      Some("""WITH s1 AS (SELECT DISTINCT doc_id AS id FROM documents
             |  WHERE doc_id % 2 = 0 AND doc_id IS NOT NULL),
             |s2 AS (SELECT DISTINCT doc_id AS id FROM documents
             |  WHERE doc_id % 3 = 0 AND doc_id IS NOT NULL),
             |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_1 FROM s1),
             |b AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_2 FROM s2),
             |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS overlap
             |  FROM s1 WHERE id IN (SELECT id FROM s2)),
             |f AS (SELECT n_1, n_2, overlap,
             |    (CAST(n_1 AS DOUBLE) + 1) * (CAST(n_2 AS DOUBLE) + 1) /
             |      (CAST(overlap AS DOUBLE) + 1) - 1 AS n_hat,
             |    (CAST(n_1 AS DOUBLE) + 1) * (CAST(n_2 AS DOUBLE) + 1) *
             |      (CAST(n_1 AS DOUBLE) - overlap) *
             |      (CAST(n_2 AS DOUBLE) - overlap) /
             |      ((CAST(overlap AS DOUBLE) + 1) * (CAST(overlap AS DOUBLE) + 1)
             |       * (CAST(overlap AS DOUBLE) + 2)) AS var_n
             |  FROM a, b, m)
             |SELECT n_1, n_2, overlap, ROUND(n_hat, 6) AS n_hat,
             |  ROUND(CASE WHEN overlap > 0
             |    THEN SQRT(GREATEST(var_n, 0.0)) END, 6) AS se
             |FROM f""".stripMargin)),

    // Mood's median test across all five families — the robust
    // k-sample location screen (above/below the grand median, exact
    // percentile, at-median rows drop).
    QueryDef("q_mood_median",
      (s, dir) => Planners.moodMedianTest(Tables.load(s, dir, "events")
          .withColumn("cents", round(col("value") * 100).cast("long")),
        "cents", "event_type"),
      Some("""WITH b AS (SELECT event_type AS gr,
             |    CAST(ROUND(value * 100) AS BIGINT) AS x
             |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
             |md AS (SELECT median(x) AS med FROM b),
             |g AS (SELECT gr,
             |    CAST(SUM(CASE WHEN CAST(x AS DOUBLE) > med THEN 1 ELSE 0 END)
             |      AS BIGINT) AS av,
             |    CAST(SUM(CASE WHEN CAST(x AS DOUBLE) < med THEN 1 ELSE 0 END)
             |      AS BIGINT) AS bv
             |  FROM b, md WHERE CAST(x AS DOUBLE) <> med GROUP BY 1),
             |w AS (SELECT gr, av, bv,
             |    SUM(av) OVER () AS ta, SUM(bv) OVER () AS tb FROM g),
             |c AS (SELECT gr, av, bv, ta, tb,
             |    CAST(ta + tb AS BIGINT) AS n,
             |    CAST(av + bv AS DOUBLE) * ta / CAST(ta + tb AS DOUBLE) AS ea,
             |    CAST(av + bv AS DOUBLE) * tb / CAST(ta + tb AS DOUBLE) AS eb
             |  FROM w),
             |c2 AS (SELECT gr, ta, tb, n,
             |    (av - ea) * (av - ea) / ea + (bv - eb) * (bv - eb) / eb
             |      AS contrib
             |  FROM c)
             |SELECT CAST(COALESCE(MAX(n), 0) AS BIGINT) AS n,
             |  CAST(COUNT(*) AS BIGINT) AS k,
             |  CASE WHEN COUNT(*) >= 2 THEN CAST(COUNT(*) - 1 AS BIGINT) END
             |    AS dof,
             |  ROUND(CASE WHEN COUNT(*) >= 2 AND MAX(ta) > 0 AND MAX(tb) > 0
             |    THEN SUM(contrib) END, 6) AS chi2
             |FROM c2""".stripMargin)),

    // Two-sample energy distance between click and view cents — the
    // omnibus alternative-anything test next to KS/CvM; exact integer
    // pair-sums via the sorted-grid prefix identity, never an n² join.
    QueryDef("q_energy_distance",
      (s, dir) => Planners.energyDistance(Tables.load(s, dir, "events")
          .withColumn("cents", round(col("value") * 100).cast("long")),
        "cents", "event_type", "click", "view"),
      Some("""WITH g0 AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS v,
             |    event_type = 'click' AS isa
             |  FROM events WHERE event_type IN ('click', 'view')
             |    AND value IS NOT NULL),
             |d AS (SELECT v, SUM(CASE WHEN isa THEN 1 ELSE 0 END) AS ca,
             |    SUM(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS cb
             |  FROM g0 GROUP BY 1),
             |w AS (SELECT v, ca, cb,
             |    COALESCE(SUM(ca) OVER pre, 0) AS pca,
             |    COALESCE(SUM(cb) OVER pre, 0) AS pcb,
             |    COALESCE(SUM(CAST(v AS HUGEINT) * ca) OVER pre, 0) AS psa,
             |    COALESCE(SUM(CAST(v AS HUGEINT) * cb) OVER pre, 0) AS psb
             |  FROM d WINDOW pre AS (ORDER BY v
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
             |a AS (SELECT CAST(COALESCE(SUM(ca), 0) AS BIGINT) AS n_a,
             |    CAST(COALESCE(SUM(cb), 0) AS BIGINT) AS n_b,
             |    COALESCE(SUM(CAST(ca AS HUGEINT) *
             |      (CAST(v AS HUGEINT) * pca - psa)), 0) AS sxx,
             |    COALESCE(SUM(CAST(cb AS HUGEINT) *
             |      (CAST(v AS HUGEINT) * pcb - psb)), 0) AS syy,
             |    COALESCE(SUM(CAST(ca AS HUGEINT) *
             |        (CAST(v AS HUGEINT) * pcb - psb)
             |      + CAST(cb AS HUGEINT) *
             |        (CAST(v AS HUGEINT) * pca - psa)), 0) AS sxy
             |  FROM w),
             |f AS (SELECT n_a, n_b,
             |    CASE WHEN n_a > 0 AND n_b > 0 THEN
             |      CAST(sxy AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b) END AS exy,
             |    CASE WHEN n_a > 0 THEN
             |      2.0 * CAST(sxx AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_a) END AS exx,
             |    CASE WHEN n_b > 0 THEN
             |      2.0 * CAST(syy AS DOUBLE) / (CAST(n_b AS DOUBLE) * n_b) END AS eyy
             |  FROM a)
             |SELECT n_a, n_b, ROUND(exy, 6) AS e_xy, ROUND(exx, 6) AS e_xx,
             |  ROUND(eyy, 6) AS e_yy,
             |  ROUND(2.0 * exy - exx - eyy, 6) AS dist,
             |  ROUND(CAST(n_a AS DOUBLE) * n_b / (CAST(n_a AS DOUBLE) + n_b)
             |    * (2.0 * exy - exx - eyy), 6) AS t
             |FROM f""".stripMargin)),

    // Grubbs' most-extreme-point statistic over all event cents — one
    // aggregate pass (max|x - mean| = max(max-mean, mean-min)).
    QueryDef("q_grubbs",
      (s, dir) => Planners.grubbs(Tables.load(s, dir, "events")
          .withColumn("cents", round(col("value") * 100).cast("long")),
        "cents"),
      Some("""WITH b AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS x
             |  FROM events WHERE value IS NOT NULL),
             |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(COALESCE(SUM(x), 0) AS BIGINT) AS s,
             |    COALESCE(SUM(CAST(x AS HUGEINT) * x), 0) AS ss,
             |    MAX(x) AS mx, MIN(x) AS mn FROM b),
             |f AS (SELECT n, mx, mn,
             |    CASE WHEN n > 0 THEN CAST(s AS DOUBLE) / n END AS mean,
             |    CASE WHEN n > 1 THEN
             |      SQRT(GREATEST(CAST(ss AS DOUBLE)
             |        - CAST(s AS DOUBLE) * s / n, 0.0) / (n - 1)) END AS sd
             |  FROM a)
             |SELECT n, ROUND(mean, 6) AS mean, ROUND(sd, 6) AS sd,
             |  ROUND(CASE WHEN n >= 3 AND sd > 0
             |    THEN GREATEST(mx - mean, mean - mn) / sd END, 6) AS g,
             |  CASE WHEN mx - mean >= mean - mn THEN mx ELSE mn END
             |    AS extreme_value
             |FROM f""".stripMargin)),

    // Two-sample Cramér–von Mises between the same two families —
    // the integrated-ECDF-gap companion of q_ks_test (sees distributed
    // small shifts KS under-weights); exact-integer ECDF ratios.
    QueryDef("q_cvm",
      (s, dir) => Planners.cramerVonMises(Tables.load(s, dir, "events"),
        "value", "event_type", "click", "view"),
      Some("""WITH g AS (SELECT value AS v, event_type = 'click' AS isa
             |  FROM events WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
             |d AS (SELECT v, SUM(CASE WHEN isa THEN 1 ELSE 0 END) AS ca,
             |    SUM(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS cb FROM g GROUP BY 1),
             |c AS (SELECT v, ca, cb,
             |    SUM(ca) OVER (ORDER BY v) AS cuma,
             |    SUM(cb) OVER (ORDER BY v) AS cumb,
             |    SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb FROM d),
             |e AS (SELECT ca, cb, na, nb,
             |    CAST(cuma AS DOUBLE) / na - CAST(cumb AS DOUBLE) / nb AS dd
             |  FROM c),
             |a AS (SELECT CAST(COALESCE(MAX(na), 0) AS BIGINT) AS n_a,
             |    CAST(COALESCE(MAX(nb), 0) AS BIGINT) AS n_b,
             |    SUM((ca + cb) * dd * dd) AS s FROM e)
             |SELECT n_a, n_b,
             |  ROUND(CASE WHEN n_a > 0 AND n_b > 0 THEN
             |    CAST(n_a AS DOUBLE) * n_b /
             |    ((CAST(n_a AS DOUBLE) + n_b) * (CAST(n_a AS DOUBLE) + n_b)) * s
             |  END, 6) AS t
             |FROM a""".stripMargin)),

    // AUC + DeLong SE over a deterministic overlapping-label fixture:
    // placement mean at the distinct-score grain (exact ratios),
    // variances via the clamped expanded form — is the ranker better
    // than coin-flip, with a z to say so.
    QueryDef("q_auc_delong",
      (s, dir) => Planners.aucDeLong(
        Tables.load(s, dir, "events").filter(col("value").isNotNull)
          .withColumn("label",
            pmod(col("event_id"), lit(3)) === 0 || col("value") > 700),
        "value", "label"),
      Some("""WITH g AS (SELECT value AS v,
             |    (event_id % 3 = 0 OR value > 700) AS yy
             |  FROM events WHERE value IS NOT NULL),
             |d AS (SELECT v, SUM(CASE WHEN yy THEN 1 ELSE 0 END) AS a,
             |    SUM(CASE WHEN NOT yy THEN 1 ELSE 0 END) AS b FROM g GROUP BY 1),
             |w AS (SELECT a, b,
             |    COALESCE(SUM(a) OVER (ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pa,
             |    COALESCE(SUM(b) OVER (ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pb,
             |    SUM(a) OVER () AS n1, SUM(b) OVER () AS n0 FROM d),
             |e AS (SELECT a, b, n1, n0,
             |    (CAST(pb AS DOUBLE) + b / 2) / n0 AS v10,
             |    (CAST(n1 - pa - a AS DOUBLE) + a / 2) / n1 AS v01 FROM w),
             |ag AS (SELECT CAST(COALESCE(MAX(n1), 0) AS BIGINT) AS n_pos,
             |    CAST(COALESCE(MAX(n0), 0) AS BIGINT) AS n_neg,
             |    SUM(a * v10) AS sa1, SUM(a * v10 * v10) AS sa2,
             |    SUM(b * v01) AS sb1, SUM(b * v01 * v01) AS sb2 FROM e),
             |f AS (SELECT *,
             |    CASE WHEN n_pos > 0 THEN sa1 / n_pos END AS auc,
             |    CASE WHEN n_pos > 1 THEN
             |      GREATEST(sa2 - sa1 * sa1 / n_pos, 0.0) / (n_pos - 1) END AS s10,
             |    CASE WHEN n_neg > 1 THEN
             |      GREATEST(sb2 - sb1 * sb1 / n_neg, 0.0) / (n_neg - 1) END AS s01
             |  FROM ag),
             |h AS (SELECT *, SQRT(s10 / n_pos + s01 / n_neg) AS se FROM f)
             |SELECT n_pos, n_neg, ROUND(auc, 6) AS auc, ROUND(se, 6) AS se,
             |  ROUND(CASE WHEN se > 0 THEN (auc - 0.5) / se END, 6) AS z
             |FROM h""".stripMargin)),

    // Friedman test — the five event families ranked WITHIN each user
    // (cells = exact cent sums, only complete blocks enter): the
    // repeated-measures Kruskal–Wallis, with Kendall's W agreement.
    QueryDef("q_friedman",
      (s, dir) => Planners.friedmanTest(Tables.load(s, dir, "events")
          .withColumn("cents", round(col("value") * 100).cast("long")),
        "user_id", "event_type", "cents"),
      Some("""WITH cells AS (SELECT user_id AS i, event_type AS j,
             |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS s
             |  FROM events WHERE user_id IS NOT NULL
             |    AND event_type IS NOT NULL AND value IS NOT NULL
             |  GROUP BY 1, 2),
             |kk AS (SELECT CAST(COUNT(DISTINCT j) AS BIGINT) AS k FROM cells),
             |comp AS (SELECT i FROM cells GROUP BY i
             |  HAVING COUNT(*) = (SELECT k FROM kk)),
             |cc AS (SELECT cells.* FROM cells JOIN comp ON cells.i = comp.i),
             |vt AS (SELECT i, s, COUNT(*) AS t FROM cc GROUP BY 1, 2),
             |rk AS (SELECT i, s, t, COALESCE(SUM(t) OVER (PARTITION BY i
             |      ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |    0) AS prev FROM vt),
             |mm AS (SELECT cc.j, 2 * rk.prev + rk.t + 1 AS mr2
             |  FROM cc JOIN rk ON cc.i = rk.i AND cc.s = rk.s),
             |bc AS (SELECT j, SUM(CAST(mr2 AS HUGEINT)) AS r2 FROM mm GROUP BY 1),
             |q AS (SELECT SUM(CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE)) AS q4 FROM bc),
             |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM comp),
             |tw AS (SELECT COALESCE(SUM(CAST(t AS HUGEINT) * t * t - t), 0) AS tt FROM rk),
             |f1 AS (SELECT n, k, q4, tt,
             |    1.0 - CAST(tt AS DOUBLE) / (CAST(n AS DOUBLE) * k * (k * k - 1)) AS c
             |  FROM q, nn, kk, tw),
             |f2 AS (SELECT n, k,
             |    CASE WHEN k >= 2 AND n > 0 AND c > 0 THEN
             |      (3.0 * q4 / (CAST(n AS DOUBLE) * k * (k + 1))
             |        - 3.0 * CAST(n AS DOUBLE) * (k + 1)) / c END AS chi
             |  FROM f1)
             |SELECT n, k, k - 1 AS dof, ROUND(chi, 6) AS chi2,
             |  ROUND(chi / (CAST(n AS DOUBLE) * (k - 1)), 6) AS w
             |FROM f2""".stripMargin)),

    // Page's trend test on the same complete blocks — the ORDERED
    // alternative to Friedman (lexicographic condition order as the
    // hypothesized trend): L is exact (doubled midranks), z uses the
    // classical no-tie moments.
    QueryDef("q_page_trend",
      (s, dir) => Planners.pageTrend(Tables.load(s, dir, "events")
          .withColumn("cents", round(col("value") * 100).cast("long")),
        "user_id", "event_type", "cents"),
      Some("""WITH cells AS (SELECT user_id AS i, event_type AS j,
             |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS s
             |  FROM events WHERE user_id IS NOT NULL
             |    AND event_type IS NOT NULL AND value IS NOT NULL
             |  GROUP BY 1, 2),
             |kk AS (SELECT CAST(COUNT(DISTINCT j) AS BIGINT) AS k FROM cells),
             |comp AS (SELECT i FROM cells GROUP BY i
             |  HAVING COUNT(*) = (SELECT k FROM kk)),
             |cc AS (SELECT cells.* FROM cells JOIN comp ON cells.i = comp.i),
             |vt AS (SELECT i, s, COUNT(*) AS t FROM cc GROUP BY 1, 2),
             |rk AS (SELECT i, s, t, COALESCE(SUM(t) OVER (PARTITION BY i
             |      ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |    0) AS prev FROM vt),
             |mm AS (SELECT cc.j, 2 * rk.prev + rk.t + 1 AS mr2
             |  FROM cc JOIN rk ON cc.i = rk.i AND cc.s = rk.s),
             |co AS (SELECT j, CAST(ROW_NUMBER() OVER (ORDER BY j) AS BIGINT) AS cv
             |  FROM (SELECT DISTINCT j FROM mm)),
             |l2 AS (SELECT COALESCE(SUM(CAST(cv AS HUGEINT) * mr2), 0) AS lv
             |  FROM mm JOIN co ON mm.j = co.j),
             |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM comp)
             |SELECT n, k,
             |  CASE WHEN n > 0 AND k >= 2 THEN CAST(lv AS DOUBLE) / 2 END AS l,
             |  ROUND(CASE WHEN n > 0 AND k >= 2 AND
             |      CAST(n AS DOUBLE) * k * k * (k + 1) * (k + 1) * (k - 1) / 144 > 0
             |    THEN (CAST(lv AS DOUBLE) / 2
             |      - CAST(n AS DOUBLE) * k * (k + 1) * (k + 1) / 4) /
             |      SQRT(CAST(n AS DOUBLE) * k * k * (k + 1) * (k + 1) * (k - 1) / 144)
             |    END, 6) AS z
             |FROM l2, nn, kk""".stripMargin)),

    // ICC(2,1) absolute-agreement reliability over the same complete
    // user x family blocks — the continuous-outcome companion of
    // Cohen's kappa / Krippendorff; exact sufficient sums, only the
    // scale-free ICC/F emitted.
    QueryDef("q_icc",
      (s, dir) => Planners.iccTwoWay(Tables.load(s, dir, "events")
          .withColumn("cents", round(col("value") * 100).cast("long")),
        "user_id", "event_type", "cents"),
      Some("""WITH cells AS (SELECT user_id AS i, event_type AS j,
             |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS s
             |  FROM events WHERE user_id IS NOT NULL
             |    AND event_type IS NOT NULL AND value IS NOT NULL
             |  GROUP BY 1, 2),
             |kk AS (SELECT CAST(COUNT(DISTINCT j) AS BIGINT) AS k FROM cells),
             |comp AS (SELECT i FROM cells GROUP BY i
             |  HAVING COUNT(*) = (SELECT k FROM kk)),
             |cc AS (SELECT cells.* FROM cells JOIN comp ON cells.i = comp.i),
             |tot AS (SELECT CAST(COALESCE(SUM(s), 0) AS BIGINT) AS t,
             |    COALESCE(SUM(CAST(s AS HUGEINT) * s), 0) AS ss FROM cc),
             |bs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    COALESCE(SUM(CAST(si AS HUGEINT) * si), 0) AS ssi
             |  FROM (SELECT i, CAST(SUM(s) AS BIGINT) AS si FROM cc GROUP BY 1)),
             |br AS (SELECT COALESCE(SUM(CAST(rj AS HUGEINT) * rj), 0) AS srj
             |  FROM (SELECT j, CAST(SUM(s) AS BIGINT) AS rj FROM cc GROUP BY 1)),
             |f1 AS (SELECT n, k, ss, ssi, srj,
             |    CAST(t AS DOUBLE) * t / (CAST(n AS DOUBLE) * k) AS corr
             |  FROM tot, bs, br, kk),
             |f2 AS (SELECT n, k,
             |    GREATEST(CAST(ss AS DOUBLE) - corr, 0.0) AS sstot,
             |    GREATEST(CAST(ssi AS DOUBLE) / k - corr, 0.0) AS ssr,
             |    GREATEST(CAST(srj AS DOUBLE) / n - corr, 0.0) AS ssc
             |  FROM f1),
             |f3 AS (SELECT n, k, ssr, ssc,
             |    GREATEST(sstot - ssr - ssc, 0.0) AS sse FROM f2),
             |f4 AS (SELECT n, k,
             |    ssr / (n - 1) AS msr, ssc / (k - 1) AS msc,
             |    sse / ((n - 1) * (k - 1)) AS mse FROM f3),
             |f5 AS (SELECT n, k, msr, msc, mse,
             |    msr + (k - 1) * mse + k * (msc - mse) / n AS den FROM f4)
             |SELECT n, k,
             |  ROUND(CASE WHEN n >= 2 AND k >= 2 AND den > 0
             |    THEN (msr - mse) / den END, 6) AS icc21,
             |  ROUND(CASE WHEN n >= 2 AND k >= 2 AND mse > 0
             |    THEN msr / mse END, 6) AS f
             |FROM f5""".stripMargin)),

    // Average precision (right-step PR-AUC, tie-blocked) on the same
    // score/label fixture as q_auc_delong — the rare-positive ranking
    // readout; exact-integer block precisions.
    QueryDef("q_avg_precision",
      (s, dir) => Planners.averagePrecision(
        Tables.load(s, dir, "events").filter(col("value").isNotNull)
          .withColumn("label",
            pmod(col("event_id"), lit(3)) === 0 || col("value") > 700),
        "value", "label"),
      Some("""WITH g AS (SELECT value AS v,
             |    (event_id % 3 = 0 OR value > 700) AS yy
             |  FROM events WHERE value IS NOT NULL),
             |d AS (SELECT v, SUM(CASE WHEN yy THEN 1 ELSE 0 END) AS a,
             |    SUM(CASE WHEN NOT yy THEN 1 ELSE 0 END) AS b FROM g GROUP BY 1),
             |w AS (SELECT a, b,
             |    SUM(a) OVER (ORDER BY v DESC) AS ca,
             |    SUM(b) OVER (ORDER BY v DESC) AS cb,
             |    SUM(a) OVER () AS n1 FROM d),
             |ag AS (SELECT CAST(COALESCE(MAX(n1), 0) AS BIGINT) AS n_pos,
             |    CAST(COALESCE(SUM(b), 0) AS BIGINT) AS n_neg,
             |    SUM(a * (CAST(ca AS DOUBLE) / (ca + cb))) AS s FROM w)
             |SELECT n_pos, n_neg,
             |  ROUND(CASE WHEN n_pos > 0 THEN s / n_pos END, 6) AS ap
             |FROM ag""".stripMargin)),

    // Bland–Altman agreement between the raw cents and their
    // 100-cent-quantized twin — bias, limits of agreement, realized
    // coverage; exact integer differences.
    QueryDef("q_bland_altman",
      (s, dir) => Planners.blandAltman(
        Tables.load(s, dir, "events").filter(col("value").isNotNull)
          .withColumn("m1", round(col("value") * 100).cast("long"))
          .withColumn("m2", expr("(m1 div 100) * 100")),
        "m1", "m2"),
      Some("""WITH g AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS m1
             |  FROM events WHERE value IS NOT NULL),
             |g2 AS (SELECT m1 - (m1 // 100) * 100 AS d FROM g),
             |s1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(COALESCE(SUM(d), 0) AS BIGINT) AS sd,
             |    COALESCE(SUM(CAST(d AS HUGEINT) * d), 0) AS ssd FROM g2),
             |st AS (SELECT n,
             |    CASE WHEN n > 0 THEN CAST(sd AS DOUBLE) / n END AS bias,
             |    CASE WHEN n > 1 THEN
             |      SQRT(GREATEST(CAST(ssd AS DOUBLE)
             |        - CAST(sd AS DOUBLE) * sd / n, 0.0) / (n - 1)) END AS sdd
             |  FROM s1),
             |st2 AS (SELECT *, bias - CAST(1.96 AS DOUBLE) * sdd AS lo,
             |    bias + CAST(1.96 AS DOUBLE) * sdd AS hi FROM st),
             |cv AS (SELECT CAST(COALESCE(SUM(CASE WHEN CAST(d AS DOUBLE) >= lo
             |      AND CAST(d AS DOUBLE) <= hi THEN 1 ELSE 0 END), 0) AS BIGINT)
             |    AS nin
             |  FROM g2, st2)
             |SELECT n, ROUND(bias, 6) AS bias, ROUND(sdd, 6) AS sd_diff,
             |  ROUND(lo, 6) AS loa_lo, ROUND(hi, 6) AS loa_hi,
             |  ROUND(CASE WHEN sdd IS NOT NULL
             |    THEN CAST(nin AS DOUBLE) / n END, 6) AS coverage
             |FROM st2, cv""".stripMargin)),

    // Kendall's tau-b between hour-of-day and value bucket — pair
    // concordance counted on the (x, y) CELL self-join (aggregate
    // grain, never the n² row pairs); exact HUGEINT pair counts.
    QueryDef("q_kendall_tau",
      (s, dir) => Planners.kendallTauB(
        Tables.load(s, dir, "events").filter(col("value").isNotNull)
          .withColumn("xh", hour(col("ts")).cast("long"))
          .withColumn("yb", expr("cast(round(value * 100) as bigint) div 10000")),
        "xh", "yb"),
      Some("""WITH g AS (SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS x,
             |    CAST(ROUND(value * 100) AS BIGINT) // 10000 AS y
             |  FROM events WHERE value IS NOT NULL),
             |d AS (SELECT x, y, COUNT(*) AS c FROM g GROUP BY 1, 2),
             |cd AS (SELECT
             |    COALESCE(SUM(CASE WHEN r.y > l.y
             |      THEN CAST(l.c AS HUGEINT) * r.c END), 0) AS con,
             |    COALESCE(SUM(CASE WHEN r.y < l.y
             |      THEN CAST(l.c AS HUGEINT) * r.c END), 0) AS dis
             |  FROM d l JOIN d r ON l.x < r.x),
             |tx AS (SELECT COALESCE(SUM(CAST(t AS HUGEINT) * (t - 1)), 0) AS tx2,
             |    CAST(COALESCE(SUM(t), 0) AS BIGINT) AS n
             |  FROM (SELECT x, SUM(c) AS t FROM d GROUP BY 1)),
             |ty AS (SELECT COALESCE(SUM(CAST(t AS HUGEINT) * (t - 1)), 0) AS ty2
             |  FROM (SELECT y, SUM(c) AS t FROM d GROUP BY 1)),
             |nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cells FROM d)
             |SELECT n, n_cells,
             |  ROUND(CASE WHEN CAST(n AS DOUBLE) * (n - 1) - CAST(tx2 AS DOUBLE) > 0
             |      AND CAST(n AS DOUBLE) * (n - 1) - CAST(ty2 AS DOUBLE) > 0 THEN
             |    2.0 * (CAST(con AS DOUBLE) - CAST(dis AS DOUBLE)) /
             |    SQRT((CAST(n AS DOUBLE) * (n - 1) - CAST(tx2 AS DOUBLE)) *
             |         (CAST(n AS DOUBLE) * (n - 1) - CAST(ty2 AS DOUBLE)))
             |  END, 6) AS tau_b
             |FROM cd, tx, ty, nc""".stripMargin)),

    // Cochran's Q across the five event families as MATCHED conditions
    // per user (success = any event of that type above 300): the
    // within-subject k-sample binary test — all-integer identity, one
    // double division.
    QueryDef("q_cochran_q",
      (s, dir) => Planners.cochranQ(Tables.load(s, dir, "events")
          .withColumn("hit", col("value") > 300),
        "user_id", "event_type", "hit"),
      Some("""WITH c AS (SELECT user_id AS i, event_type AS j,
             |    MAX(CAST((value > 300) AS INT)) AS s
             |  FROM events WHERE user_id IS NOT NULL
             |    AND event_type IS NOT NULL AND (value > 300) IS NOT NULL
             |  GROUP BY 1, 2),
             |bc AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
             |    CAST(COALESCE(SUM(g), 0) AS BIGINT) AS su,
             |    COALESCE(SUM(CAST(g AS HUGEINT) * g), 0) AS gg
             |  FROM (SELECT j, SUM(s) AS g FROM c GROUP BY 1)),
             |bs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_subjects,
             |    COALESCE(SUM(CAST(l AS HUGEINT) * l), 0) AS ll
             |  FROM (SELECT i, SUM(s) AS l FROM c GROUP BY 1))
             |SELECT n_subjects, k, k - 1 AS dof,
             |  ROUND(CASE WHEN k >= 2 AND
             |      CAST(k AS DOUBLE) * su - CAST(ll AS DOUBLE) > 0
             |    THEN (CAST(k AS DOUBLE) - 1) *
             |      (CAST(k AS DOUBLE) * CAST(gg AS DOUBLE)
             |        - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))
             |      / (CAST(k AS DOUBLE) * su - CAST(ll AS DOUBLE)) END, 6)
             |    AS q
             |FROM bc, bs""".stripMargin)),

    // First-order partial correlation on customer: is the acctbal->y
    // association real once the synthetic z-driver is held fixed?
    // Exact-integer sufficient sums; only scale-free ratios in double.
    QueryDef("q_partial_corr",
      (s, dir) => Planners.partialCorrelation(
        Tables.load(s, dir, "customer")
          .withColumn("x", round(col("c_acctbal") * 100).cast("long"))
          .withColumn("zc", pmod(col("c_custkey"), lit(100)).cast("long"))
          .withColumn("y", expr("x div 10") + lit(700L) * col("zc")),
        "x", "y", "zc"),
      Some("""WITH src AS (SELECT
             |    CAST(ROUND(c_acctbal * 100) AS BIGINT) AS x,
             |    CAST(c_custkey % 100 AS BIGINT) AS z
             |  FROM customer),
             |s2 AS (SELECT x, x // 10 + 700 * z AS y, z FROM src),
             |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
             |    SUM(CAST(z AS HUGEINT)) AS sz,
             |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
             |    SUM(CAST(y AS HUGEINT) * y) AS syy,
             |    SUM(CAST(z AS HUGEINT) * z) AS szz,
             |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
             |    SUM(CAST(x AS HUGEINT) * z) AS sxz,
             |    SUM(CAST(y AS HUGEINT) * z) AS syz
             |  FROM s2),
             |b AS (SELECT n,
             |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS nxy,
             |    CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE) AS nxz,
             |    CAST(n AS DOUBLE) * CAST(syz AS DOUBLE)
             |      - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE) AS nyz,
             |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
             |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy,
             |    CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
             |      - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) AS vz
             |  FROM a),
             |r AS (SELECT n,
             |    CASE WHEN vx > 0 AND vy > 0 THEN nxy / SQRT(vx * vy) END AS rxy,
             |    CASE WHEN vx > 0 AND vz > 0 THEN nxz / SQRT(vx * vz) END AS rxz,
             |    CASE WHEN vy > 0 AND vz > 0 THEN nyz / SQRT(vy * vz) END AS ryz
             |  FROM b)
             |SELECT n, ROUND(rxy, 6) AS r_xy, ROUND(rxz, 6) AS r_xz,
             |  ROUND(ryz, 6) AS r_yz,
             |  ROUND(CASE WHEN 1.0 - rxz * rxz > 0 AND 1.0 - ryz * ryz > 0
             |    THEN (rxy - rxz * ryz) /
             |      SQRT((1.0 - rxz * rxz) * (1.0 - ryz * ryz)) END, 6)
             |    AS r_partial
             |FROM r""".stripMargin)),

    // Two-proportion z between the same two families' conversion rates
    // (value > 500 as the success flag): pooled-variance z + lifts.
    QueryDef("q_proportion_z",
      (s, dir) => Planners.proportionZTest(
        Tables.load(s, dir, "events").withColumn("converted", col("value") > 500),
        "converted", "event_type", "click", "view"),
      Some("""WITH g AS (SELECT (value > 500) AS s, event_type = 'click' AS isa
             |  FROM events WHERE event_type IN ('click', 'view')
             |    AND (value > 500) IS NOT NULL),
             |a AS (SELECT
             |    SUM(CASE WHEN isa THEN 1 ELSE 0 END) AS na,
             |    SUM(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS nb,
             |    SUM(CASE WHEN isa AND s THEN 1 ELSE 0 END) AS sa,
             |    SUM(CASE WHEN NOT isa AND s THEN 1 ELSE 0 END) AS sb
             |  FROM g)
             |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
             |  ROUND(CAST(sa AS DOUBLE) / na, 6) AS p_a,
             |  ROUND(CAST(sb AS DOUBLE) / nb, 6) AS p_b,
             |  ROUND(CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb, 6) AS lift_abs,
             |  ROUND(CASE WHEN sb > 0 THEN
             |    (CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb) / (CAST(sb AS DOUBLE) / nb)
             |  END, 6) AS lift_rel,
             |  ROUND(CASE WHEN na > 0 AND nb > 0 AND sa + sb > 0 AND sa + sb < na + nb THEN
             |    (CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb) /
             |    SQRT(CAST(sa + sb AS DOUBLE) / (na + nb) * (1 - CAST(sa + sb AS DOUBLE) / (na + nb))
             |      * (CAST(1 AS DOUBLE) / na + CAST(1 AS DOUBLE) / nb))
             |  END, 6) AS z
             |FROM a""".stripMargin)),

    // Fixed-width value histogram (data profiling; clamped edge bins)
    QueryDef("q_histogram",
      (s, dir) => Planners.histogram(Tables.load(s, dir, "events"),
        "value", lo = 0.0, hi = 500.0, nBins = 10),
      Some("""WITH b AS (
             |  SELECT LEAST(GREATEST(CAST(FLOOR((value - 0.0) / 50.0) AS BIGINT), 0), 9) AS bin
             |  FROM events WHERE value IS NOT NULL)
             |SELECT bin, COUNT(*) AS n,
             |  CAST(bin AS DOUBLE) * CAST(50.0 AS DOUBLE) AS bin_lo
             |FROM b GROUP BY 1""".stripMargin))
  )
}

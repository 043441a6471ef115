package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.prep.{Encoding, Normalize, Pivot, Windows}
import Catalog.{HistoryDays, PredTs}

/**
 * Core relational operator scenarios (SURVEY.md §2 groups B/C/D/E/F/H), each
 * with a DuckDB oracle. Conventions shared with the oracles:
 *  - money-like double sums are computed in integer cents
 *    (`sum(round(x*100)::bigint)`) so they hash-match exactly;
 *  - derived doubles that depend on mean/stddev are rounded to 6 dp on both
 *    sides (engines differ in partial-aggregation order at ~1e-12);
 *  - ranks/counts are cast to bigint to match DuckDB's window/agg types;
 *  - every window order carries an `event_id` tiebreak for total ordering.
 */
object Relational extends QueryGroup {

  private val predCol = to_timestamp(lit(PredTs))

  def queries: Seq[QueryDef] = Seq(

    // k-anonymity audit over (nation, segment) quasi-identifiers: class
    // structure, the dataset's anonymity k, and the sub-k violation
    // counts — the release-gate audit next to the PII scrub.
    QueryDef("q_privacy_kanon",
      (s, dir) => graft.ops.Privacy.kAnonymityReport(
        Tables.load(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"), k = 10),
      Some("""WITH c AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
             |  FROM customer GROUP BY 1, 2)
             |SELECT CAST(coalesce(SUM(n), 0) AS BIGINT) AS n_rows,
             |  CAST(COUNT(*) AS BIGINT) AS n_classes,
             |  CAST(MIN(n) AS BIGINT) AS anonymity_k,
             |  CAST(coalesce(SUM(CASE WHEN n < 10 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_violating_classes,
             |  CAST(coalesce(SUM(CASE WHEN n < 10 THEN n ELSE 0 END), 0) AS BIGINT) AS n_violating_rows
             |FROM c""".stripMargin)),

    // k-anonymity enforcement: suppress rows whose quasi-identifier
    // class has fewer than k members; survivors pass through unchanged.
    // k = 3 splits the sf0.001 fixture (max class 6) while the k = 10
    // REPORT above carries the violation signal at every scale.
    QueryDef("q_privacy_suppress",
      (s, dir) => graft.ops.Privacy.suppressRare(
          Tables.load(s, dir, "customer"),
          Seq("c_nationkey", "c_mktsegment"), k = 3)
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment")),
      Some("""SELECT c_custkey, c_nationkey, c_mktsegment
             |FROM (SELECT *, COUNT(*) OVER (
             |    PARTITION BY c_nationkey, c_mktsegment) AS n FROM customer)
             |WHERE n >= 3""".stripMargin)),

    // Laplace-mechanism DP count release over the same quasi-identifier
    // classes: count + Laplace(1/eps) with SEEDED noise (16-bit md5 of
    // the group key + seed through the inverse Laplace CDF) -- the
    // reproducible-release practice, replayed identically by the
    // oracle. True counts are deliberately absent from the output.
    // NOTE: seed=7 here is a TEST FIXTURE published with the oracle --
    // which, per the dpCounts security contract, voids the eps
    // guarantee for THIS fixture (a disclosed seed lets anyone undo the
    // noise). The operator itself takes no default seed; real releases
    // must supply a secret one.
    QueryDef("q_dp_counts",
      (s, dir) => graft.ops.Privacy.dpCounts(
        Tables.load(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"), epsilon = 0.5, seed = 7L),
      Some("""WITH g AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
             |  FROM customer GROUP BY 1, 2),
             |h AS (SELECT *,
             |    md5(COALESCE(CAST(c_nationkey AS VARCHAR), chr(0) || 'null')
             |        || chr(1) ||
             |        COALESCE(c_mktsegment, chr(0) || 'null')
             |        || chr(1) || '7') AS hx
             |  FROM g),
             |v AS (SELECT c_nationkey, c_mktsegment, n,
             |    (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 4096 +
             |    (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 256 +
             |    (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16 +
             |    (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1) AS hv
             |  FROM h),
             |u AS (SELECT c_nationkey, c_mktsegment, n,
             |    (hv + 0.5) / 65536.0 - 0.5 AS uu FROM v)
             |SELECT c_nationkey, c_mktsegment,
             |  ROUND(n + (-sign(uu)) * 2.0 * ln(1.0 - 2.0 * abs(uu)), 6)
             |    AS n_noisy,
             |  CAST(0.5 AS DOUBLE) AS epsilon
             |FROM u""".stripMargin)),

    // Distinct l-diversity over an account-balance bucket as the
    // sensitive attribute: a k-anonymous class can still leak a shared
    // sensitive value (the homogeneity attack); the report measures it.
    QueryDef("q_privacy_ldiv",
      (s, dir) => graft.ops.Privacy.lDiversityReport(
        Tables.load(s, dir, "customer")
          .withColumn("bal_bucket",
            floor(col("c_acctbal") / 2000).cast("long")),
        Seq("c_nationkey", "c_mktsegment"), "bal_bucket", l = 3),
      Some("""WITH b AS (SELECT c_nationkey, c_mktsegment,
             |    CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_bucket
             |  FROM customer),
             |c AS (SELECT c_nationkey, c_mktsegment,
             |    COUNT(DISTINCT bal_bucket) AS d
             |  FROM b GROUP BY 1, 2)
             |SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
             |  CAST(MIN(d) AS BIGINT) AS diversity_l,
             |  CAST(coalesce(SUM(CASE WHEN d < 3 THEN 1 ELSE 0 END), 0) AS BIGINT)
             |    AS n_low_diversity_classes
             |FROM c""".stripMargin)),

    // t-closeness over market segment as the categorical sensitive
    // attribute: per (nation) class, total-variation distance to the
    // GLOBAL segment mix (EMD under the 0/1 ground distance) — the
    // skewness-attack audit completing the k-anon / l-div triad.
    QueryDef("q_privacy_tclose",
      (s, dir) => graft.ops.Privacy.tClosenessReport(
        Tables.load(s, dir, "customer"),
        Seq("c_nationkey"), "c_mktsegment", t = 0.3),
      Some("""WITH cells AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
             |  FROM customer GROUP BY 1, 2),
             |ct AS (SELECT c_nationkey, SUM(n) AS ctot FROM cells GROUP BY 1),
             |g AS (SELECT c_mktsegment, COUNT(*) AS gn FROM customer GROUP BY 1),
             |gt AS (SELECT SUM(gn) AS gtot FROM g),
             |per AS (SELECT cells.c_nationkey,
             |    SUM(ABS(CAST(n AS DOUBLE) / ctot - CAST(gn AS DOUBLE) / gtot)) AS pres,
             |    1.0 - SUM(CAST(gn AS DOUBLE) / gtot) AS absent
             |  FROM cells JOIN ct USING (c_nationkey)
             |  JOIN g USING (c_mktsegment) CROSS JOIN gt
             |  GROUP BY cells.c_nationkey),
             |tv AS (SELECT ROUND((pres + absent) / 2, 6) AS tv FROM per)
             |SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
             |  MAX(tv) AS closeness_t,
             |  CAST(coalesce(SUM(CASE WHEN tv > 0.3 THEN 1 ELSE 0 END), 0) AS BIGINT)
             |    AS n_violating_classes
             |FROM tv""".stripMargin)),

    QueryDef("q1_agg",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
          sum(round(col("l_quantity") * 100).cast("long")).as("sum_qty_c"),
          sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
            .cast("long")).as("revenue_c"),
          count(lit(1)).as("n"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
             |  CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c,
             |  COUNT(*) AS n
             |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // B1 active-window filter (spark/preprocess.py:577-581)
    QueryDef("q_b1_window_filter",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        Windows.activeWindowFilter(ev, "ts", predCol, HistoryDays)
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      },
      Some(s"""SELECT event_id, user_id, event_type, value FROM events
              |WHERE ts < TIMESTAMP '$PredTs'
              |  AND ts > TIMESTAMP '$PredTs' - INTERVAL 21 DAY""".stripMargin)),

    // C1 get_rank (spark/preprocess.py:531-539)
    QueryDef("q_c1_rank",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        Windows.ranks(ev, Seq("user_id"), "ts", tiebreak = Seq("event_id"))
          .select(col("event_id"), col("user_id"), col("seq_len"),
            col("rank_desc").cast("long").as("rank_desc"),
            col("rank_asc").cast("long").as("rank_asc"))
      },
      Some("""SELECT event_id, user_id,
             |  COUNT(*) OVER (PARTITION BY user_id) AS seq_len,
             |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rank_desc,
             |  COUNT(*) OVER (PARTITION BY user_id)
             |    - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) + 1 AS rank_asc
             |FROM events""".stripMargin)),

    // C3 inter-event gap (spark/preprocess.py:438-444)
    QueryDef("q_c3_intervals",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        Windows.interEventGapDays(ev, Seq("user_id"), "ts", "gap_days",
            tiebreak = Seq("event_id"))
          .select(col("event_id"), col("gap_days").cast("long").as("gap_days"))
      },
      Some("""SELECT event_id,
             |  date_diff('day', CAST(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS DATE),
             |            CAST(ts AS DATE)) AS gap_days
             |FROM events""".stripMargin)),

    // C5/D2 frequency rank with deterministic tiebreak (spark/preprocess.py:247-250)
    QueryDef("q_c5_freq_rank",
      (s, dir) => {
        val enc = Encoding.fit(Tables.load(s, dir, "events"), "event_type")
        enc.mapping.select(col("event_type"), col("code").cast("long").as("rnk"))
      },
      Some("""SELECT event_type, ROW_NUMBER() OVER (ORDER BY cnt DESC, event_type) AS rnk
             |FROM (SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type)""".stripMargin)),

    // D2 value frequencies
    QueryDef("q_d2_freq",
      (s, dir) => Tables.load(s, dir, "events")
        .groupBy(col("event_type")).agg(count(lit(1)).as("cnt")),
      Some("SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type")),

    // D1 distinct counts driving encoding strategy (spark/preprocess.py:261)
    QueryDef("q_d1_distinct",
      (s, dir) => Tables.load(s, dir, "events").agg(
        countDistinct(col("event_type")).as("n_event_type"),
        countDistinct(col("user_id")).as("n_user_id")),
      Some("""SELECT COUNT(DISTINCT event_type) AS n_event_type,
             |       COUNT(DISTINCT user_id) AS n_user_id FROM events""".stripMargin)),

    // F1/H6 encoding apply via broadcast join (spark/preprocess.py:282-288)
    QueryDef("q_f1_encode_join",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val enc = Encoding.fit(ev, "event_type")
        Encoding.apply(ev, enc, "etype_code")
          .select(col("event_id"), col("etype_code").cast("long").as("etype_code"))
      },
      Some("""WITH m AS (
             |  SELECT event_type, ROW_NUMBER() OVER (ORDER BY cnt DESC, event_type) AS code
             |  FROM (SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type))
             |SELECT e.event_id, CAST(COALESCE(m.code, 0) AS BIGINT) AS etype_code
             |FROM events e LEFT JOIN m USING(event_type)""".stripMargin)),

    // F2 semi-join prune to top-k vocabulary (spark/preprocess.py:268-271)
    QueryDef("q_f2_semi_prune",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val enc = Encoding.fit(ev, "event_type", maxCardinality = 3)
        Encoding.pruneToVocabulary(ev, enc).select(col("event_id"))
      },
      Some("""WITH m AS (
             |  SELECT event_type FROM (
             |    SELECT event_type, ROW_NUMBER() OVER (ORDER BY cnt DESC, event_type) AS code
             |    FROM (SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type))
             |  WHERE code <= 3)
             |SELECT event_id FROM events WHERE event_type IN (SELECT event_type FROM m)""".stripMargin)),

    // E1 pivot long->wide, latest n=5, right padding (spark/preprocess.py:394-435)
    QueryDef("q_e1_pivot",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val ranked = Windows.latestNSlots(ev, Seq("user_id"), "ts",
          n = 5, leftPad = false, tiebreak = Seq("event_id"))
        Pivot.toWide(ranked, Seq("user_id"), Seq("event_type", "value"), 5)
      },
      Some {
        val conds = (1 to 5).flatMap(t => Seq(
          s"MAX(CASE WHEN rnk = $t THEN event_type END) AS event_type_$t",
          s"MAX(CASE WHEN rnk = $t THEN value END) AS value_$t")).mkString(",\n  ")
        s"""WITH ranked AS (
           |  SELECT user_id, event_type, value,
           |    COUNT(*) OVER (PARTITION BY user_id) AS cnt,
           |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rd
           |  FROM events),
           |shifted AS (
           |  SELECT user_id, event_type, value,
           |    CASE WHEN cnt >= 5 THEN (cnt - rd + 1) + 5 - cnt ELSE cnt - rd + 1 END AS rnk
           |  FROM ranked WHERE rd <= 5)
           |SELECT user_id,
           |  $conds
           |FROM shifted GROUP BY user_id""".stripMargin
      }),

    // F3 features-profile inner join co-keyed on the entity (spark/preprocess.py:606-608)
    QueryDef("q_f3_profile_join",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val cust = Tables.load(s, dir, "customer")
        val feats = ev.groupBy(col("user_id")).agg(
          count(lit(1)).as("n_events"),
          sum(round(col("value") * 100).cast("long")).as("val_cents"))
        feats.join(cust, feats("user_id") === cust("c_custkey"), "inner")
          .select(col("user_id"), col("n_events"), col("val_cents"),
            col("c_mktsegment"), col("c_acctbal"))
      },
      Some("""WITH f AS (
             |  SELECT user_id, COUNT(*) AS n_events,
             |    CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS val_cents
             |  FROM events GROUP BY user_id)
             |SELECT f.user_id, f.n_events, f.val_cents, c.c_mktsegment, c.c_acctbal
             |FROM f JOIN customer c ON f.user_id = c.c_custkey""".stripMargin)),

    // H2 min-max + z-score normalization as pure column arithmetic
    QueryDef("q_h2_normalize",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val summary = Normalize.fit(li, Seq("l_quantity", "l_extendedprice"))
        li.select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          summary.minMax("l_quantity").as("qty_mm"),
          round(summary.zScore("l_extendedprice"), 6).as("price_z"))
      },
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             |  (l_quantity - MIN(l_quantity) OVER ()) /
             |    (MAX(l_quantity) OVER () - MIN(l_quantity) OVER ()) AS qty_mm,
             |  ROUND((l_extendedprice - AVG(l_extendedprice) OVER ()) /
             |    STDDEV_SAMP(l_extendedprice) OVER (), 6) AS price_z
             |FROM lineitem""".stripMargin)),

    // Z-order (Morton) key for multi-column data-skipping layout: exact
    // integer scaling + bit interleave, replayed bit-for-bit in SQL.
    QueryDef("q_zorder",
      (s, dir) => {
        val cust = Tables.load(s, dir, "customer")
        val base = cust.select(col("c_custkey"),
          round(col("c_acctbal") * 100).cast("long").as("bal_c"))
        val (lo, hi) = graft.ops.Layout.fitBounds(base, Seq("c_custkey", "bal_c"))
        base.select(col("c_custkey"), col("bal_c"),
          graft.ops.Layout.zValue(Seq("c_custkey", "bal_c"), lo, hi, bits = 8)
            .as("zv"))
      },
      Some {
        val interleave = (0 until 8).flatMap(b => Seq(
          s"(((s0 >> $b) & 1) << ${2 * b})",
          s"(((s1 >> $b) & 1) << ${2 * b + 1})")).mkString(" + ")
        s"""WITH base AS (
           |  SELECT c_custkey, CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal_c
           |  FROM customer),
           |bnd AS (SELECT MIN(c_custkey) mn0, MAX(c_custkey) mx0,
           |               MIN(bal_c) mn1, MAX(bal_c) mx1 FROM base),
           |sc AS (SELECT c_custkey, bal_c,
           |    ((c_custkey - mn0) * 255) // (mx0 - mn0) AS s0,
           |    ((bal_c - mn1) * 255) // (mx1 - mn1) AS s1
           |  FROM base, bnd)
           |SELECT c_custkey, bal_c, CAST($interleave AS BIGINT) AS zv
           |FROM sc""".stripMargin
      }),

    // OLAP rollup: hierarchical subtotals in ONE pass (Spark plans a single
    // Expand + hash aggregate, not one scan per grouping level).
    QueryDef("q_rollup",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        li.rollup(col("l_returnflag"), col("l_linestatus")).agg(
            grouping_id().cast("long").as("gid"),
            sum(round(col("l_quantity") * 100).cast("long")).as("sum_qty_c"),
            count(lit(1)).as("n"))
          .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
            col("sum_qty_c"), col("n"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(2*GROUPING(l_returnflag) + GROUPING(l_linestatus) AS BIGINT) AS gid,
             |  CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
             |  COUNT(*) AS n
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"""
        .stripMargin)),

    // OLAP cube: all grouping-set combinations, same single-Expand plan.
    QueryDef("q_cube",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        li.cube(col("l_returnflag"), col("l_linestatus")).agg(
            grouping_id().cast("long").as("gid"),
            sum(round(col("l_extendedprice") * 100).cast("long")).as("rev_c"),
            count(lit(1)).as("n"))
          .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
            col("rev_c"), col("n"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(2*GROUPING(l_returnflag) + GROUPING(l_linestatus) AS BIGINT) AS gid,
             |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev_c,
             |  COUNT(*) AS n
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"""
        .stripMargin)),

    // Whole-table profiling (SUMMARIZE): one long-form row per column,
    // computed in ONE aggregate pass. Oracle = per-column UNION ALL.
    QueryDef("q_profile",
      (s, dir) => graft.ops.Profile.summarize(Tables.load(s, dir, "events")
        .drop(graft.core.Tables.RawTsCol)),
      Some {
        def numCol(c: String) =
          s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
             |  COUNT(*) - COUNT($c) AS n_null, COUNT(DISTINCT $c) AS n_distinct,
             |  CAST(MIN($c) AS DOUBLE) AS min_num, CAST(MAX($c) AS DOUBLE) AS max_num,
             |  ROUND(AVG($c), 6) AS mean_num,
             |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
             |FROM events""".stripMargin
        def strCol(c: String) =
          s"""SELECT '$c', COUNT(*), COUNT(*) - COUNT($c), COUNT(DISTINCT $c),
             |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
             |  MIN($c), MAX($c) FROM events""".stripMargin
        val tsCol =
          """SELECT 'ts', COUNT(*), COUNT(*) - COUNT(ts), COUNT(DISTINCT ts),
            |  CAST(epoch_us(MIN(ts)) AS DOUBLE), CAST(epoch_us(MAX(ts)) AS DOUBLE),
            |  CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
            |FROM events""".stripMargin
        Seq(numCol("event_id"), tsCol, numCol("user_id"),
          strCol("event_type"), numCol("value"), strCol("props"))
          .mkString("\nUNION ALL\n")
      }),

    // Per-group categorical composition: language entropy / majority
    // share per source — groupEntropy's simplest instantiation (its
    // pack-mixture composition is q_pack_mixture). Majority ties break
    // (count desc, category asc) on both engines.
    QueryDef("q_group_entropy",
      (s, dir) => graft.ops.Profile.groupEntropy(
        Tables.load(s, dir, "documents"), Seq("source"), "lang"),
      Some("""WITH c AS (SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2),
             |t AS (SELECT source, CAST(SUM(n) AS BIGINT) AS tot, COUNT(*) AS n_cats FROM c GROUP BY 1),
             |m AS (SELECT source, lang, n, ROW_NUMBER() OVER (
             |    PARTITION BY source ORDER BY n DESC, lang ASC) AS rn FROM c)
             |SELECT c.source, t.tot AS n_rows, CAST(t.n_cats AS BIGINT) AS n_cats,
             |  ROUND(SUM(-(CAST(c.n AS DOUBLE) / t.tot) * LN(CAST(c.n AS DOUBLE) / t.tot)), 6) AS entropy,
             |  MAX(CASE WHEN m.rn = 1 THEN m.lang END) AS majority_cat,
             |  ROUND(MAX(CASE WHEN m.rn = 1 THEN CAST(m.n AS DOUBLE) / t.tot END), 6) AS majority_share
             |FROM c JOIN t USING(source) JOIN m ON m.source = c.source AND m.lang = c.lang
             |GROUP BY c.source, t.tot, t.n_cats""".stripMargin)),

    // Pearson correlation matrix over lineitem's numeric columns: all
    // pairs in ONE aggregate pass, stack-unpivoted; 6-dp rounding absorbs
    // partial-agg order differences
    QueryDef("q_corr_matrix",
      (s, dir) => graft.ops.Profile.correlationMatrix(
        Tables.load(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")),
      Some {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        val pairs = for {
          i <- cols.indices; j <- (i + 1) until cols.size
        } yield (cols(i), cols(j))
        pairs.map { case (a, b) =>
          s"SELECT '$a' AS col_a, '$b' AS col_b, ROUND(corr($a, $b), 6) AS corr FROM lineitem"
        }.mkString("\nUNION ALL\n")
      }),

    // Exact per-group quantiles: type-7 interpolation on both engines
    QueryDef("q_group_quantiles",
      (s, dir) => graft.stats.Planners.groupQuantiles(
        Tables.load(s, dir, "documents"),
        Seq("source"), "n_chars", Seq(0.25, 0.5, 0.75, 0.9)),
      Some(Seq(0.25, 0.5, 0.75, 0.9).map(q =>
        s"""SELECT source, CAST($q AS DOUBLE) AS q,
           |  ROUND(quantile_cont(n_chars, $q), 6) AS q_value
           |FROM documents GROUP BY source""".stripMargin)
        .mkString("\nUNION ALL\n"))),

    // Chi-squared independence screen between event type and a derived
    // categorical label: contingency aggregate + window marginals over
    // the tiny cell table
    QueryDef("q_chi2",
      (s, dir) => graft.stats.Planners.chi2(
        Tables.load(s, dir, "events")
          .withColumn("label", col("user_id") % 3),
        "event_type", "label"),
      Some("""WITH c AS (SELECT event_type AS a, user_id % 3 AS b, COUNT(*) AS o
             |  FROM events GROUP BY 1, 2),
             |grid AS (SELECT xa.a, xb.b, COALESCE(c.o, 0) AS o
             |  FROM (SELECT DISTINCT a FROM c) xa
             |  CROSS JOIN (SELECT DISTINCT b FROM c) xb
             |  LEFT JOIN c ON c.a = xa.a AND c.b = xb.b),
             |m AS (SELECT *, SUM(o) OVER (PARTITION BY a) AS ra,
             |    SUM(o) OVER (PARTITION BY b) AS cb, SUM(o) OVER () AS n FROM grid)
             |SELECT ROUND(SUM(POWER(o - ra*1.0*cb/n, 2) / (ra*1.0*cb/n)), 6) AS chi2,
             |  CAST((COUNT(DISTINCT a) - 1) * (COUNT(DISTINCT b) - 1) AS BIGINT) AS dof
             |FROM m""".stripMargin)),

    // Cramér's V: the 0-1 effect size the raw chi2 can't give (chi2
    // grows with n) — lang vs source association on the doc corpus.
    QueryDef("q_cramers_v",
      (s, dir) => graft.stats.Planners.cramersV(
        Tables.load(s, dir, "documents"), "lang", "source"),
      Some("""WITH cells AS (SELECT lang, source, COUNT(*) AS o
             |  FROM documents GROUP BY 1, 2),
             |grid AS (SELECT xa.lang, xb.source, COALESCE(cells.o, 0) AS o
             |  FROM (SELECT DISTINCT lang FROM cells) xa
             |  CROSS JOIN (SELECT DISTINCT source FROM cells) xb
             |  LEFT JOIN cells ON cells.lang = xa.lang AND cells.source = xb.source),
             |m AS (SELECT o, SUM(o) OVER (PARTITION BY lang) AS ra,
             |    SUM(o) OVER (PARTITION BY source) AS cb,
             |    SUM(o) OVER () AS n FROM grid),
             |x AS (SELECT MAX(n) AS n,
             |    SUM(POW(o - ra * 1.0 * cb / n, 2) / (ra * 1.0 * cb / n)) AS chi2
             |  FROM m),
             |k AS (SELECT COUNT(DISTINCT lang) AS ka,
             |    COUNT(DISTINCT source) AS kb FROM documents)
             |SELECT CAST(x.n AS BIGINT) AS n, ROUND(x.chi2, 6) AS chi2,
             |  CAST((k.ka - 1) * (k.kb - 1) AS BIGINT) AS dof,
             |  CASE WHEN LEAST(k.ka, k.kb) > 1
             |       THEN ROUND(SQRT(x.chi2 / (x.n * (LEAST(k.ka, k.kb) - 1))), 6)
             |  END AS cramers_v
             |FROM x CROSS JOIN k""".stripMargin)),

    // Spearman rank correlation (average-rank ties): monotone
    // association between doc length in chars and in tokens — the
    // robust screen next to the Pearson q_corr_matrix.
    QueryDef("q_spearman",
      (s, dir) => graft.stats.Planners.spearman(
        Tables.load(s, dir, "documents")
          .select(col("n_chars"),
            size(graft.ops.Text.tokens(col("text"))).as("n_tokens")),
        "n_chars", "n_tokens"),
      Some("""WITH f AS (SELECT CAST(n_chars AS DOUBLE) AS a,
             |    CAST(len(regexp_split_to_array(lower(text), '\s+')) AS DOUBLE) AS b
             |  FROM documents WHERE n_chars IS NOT NULL AND text IS NOT NULL),
             |r AS (SELECT
             |    RANK() OVER (ORDER BY a) + (COUNT(*) OVER (PARTITION BY a) - 1) / 2.0 AS ra,
             |    RANK() OVER (ORDER BY b) + (COUNT(*) OVER (PARTITION BY b) - 1) / 2.0 AS rb
             |  FROM f),
             |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(ra) AS sa, SUM(rb) AS sb,
             |    SUM(ra * ra) AS saa, SUM(rb * rb) AS sbb, SUM(ra * rb) AS sab FROM r)
             |SELECT n,
             |  CASE WHEN n * saa - sa * sa > 0 AND n * sbb - sb * sb > 0 THEN
             |    ROUND((n * sab - sa * sb)
             |      / SQRT((n * saa - sa * sa) * (n * sbb - sb * sb)), 6)
             |  END AS spearman FROM s""".stripMargin)),

    // PSI drift between the first and second half of the month: the
    // monitoring alarm built from two k-row histogram aggregates.
    QueryDef("q_psi",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val cut = to_timestamp(lit("2024-01-16 00:00:00"))
        graft.ops.Profile.psi(ev.filter(col("ts") < cut),
          ev.filter(col("ts") >= cut), "value",
          lo = 0.0, hi = 500.0, nBins = 10)
      },
      Some("""WITH b AS (SELECT
             |    least(greatest(CAST(floor(value / 50.0) AS BIGINT), 0), 9) AS bin,
             |    ts < TIMESTAMP '2024-01-16 00:00:00' AS is_ref
             |  FROM events WHERE value IS NOT NULL),
             |g AS (SELECT unnest(generate_series(0, 9)) AS bin),
             |h AS (SELECT g.bin,
             |    COALESCE(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END), 0) AS n_ref,
             |    COALESCE(SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END), 0) AS n_cur
             |  FROM g LEFT JOIN b ON b.bin = g.bin GROUP BY g.bin),
             |t AS (SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM h)
             |SELECT h.bin, CAST(h.bin * 50.0 AS DOUBLE) AS bin_lo,
             |  ROUND((n_ref + 0.5) / (t_ref + 5.0), 6) AS p_ref,
             |  ROUND((n_cur + 0.5) / (t_cur + 5.0), 6) AS p_cur,
             |  ROUND(((n_ref + 0.5) / (t_ref + 5.0) - (n_cur + 0.5) / (t_cur + 5.0))
             |    * ln(((n_ref + 0.5) / (t_ref + 5.0)) / ((n_cur + 0.5) / (t_cur + 5.0))), 6)
             |    AS contrib
             |FROM h CROSS JOIN t""".stripMargin)),

    // Benford first-digit audit over order totals (a naturally
    // multiplicative quantity): per digit, observed vs log10(1+1/d)
    // expectation, chi2 contributions and the max-deviation alarm.
    QueryDef("q_benford",
      (s, dir) => graft.ops.Profile.benford(
        Tables.load(s, dir, "orders"), "o_totalprice"),
      Some("""WITH v AS (SELECT ABS(CAST(o_totalprice AS DOUBLE)) AS a
             |  FROM orders WHERE o_totalprice IS NOT NULL
             |    AND ABS(CAST(o_totalprice AS DOUBLE)) > 0),
             |d AS (SELECT CAST(FLOOR(a / POWER(10.0, FLOOR(LOG10(a)))) AS INT) AS digit
             |  FROM v),
             |c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
             |g AS (SELECT CAST(unnest(generate_series(1, 9)) AS INT) AS digit),
             |j AS (SELECT g.digit, COALESCE(c.n, 0) AS n,
             |    LOG10(1.0 + 1.0 / g.digit) AS pe FROM g LEFT JOIN c USING (digit)),
             |t AS (SELECT SUM(n) AS nn FROM j)
             |SELECT digit, CAST(n AS BIGINT) AS n,
             |  ROUND(CAST(n AS DOUBLE) / nn, 6) AS p_obs,
             |  ROUND(pe, 6) AS p_exp,
             |  ROUND(POWER(n - nn * pe, 2) / (nn * pe), 6) AS chi2_contrib,
             |  ROUND(SUM(POWER(n - nn * pe, 2) / (nn * pe)) OVER (), 6) AS chi2,
             |  ROUND(MAX(ABS(CAST(n AS DOUBLE) / nn - pe)) OVER (), 6) AS max_dev
             |FROM j CROSS JOIN t""".stripMargin)),

    // Key-skew diagnosis over the event log's user distribution.
    QueryDef("q_skew_report",
      (s, dir) => graft.ops.Skew.report(Tables.load(s, dir, "events"),
        "user_id", topK = 10),
      Some("""WITH c AS (SELECT user_id AS k, COUNT(*) AS c FROM events GROUP BY 1),
             |r AS (SELECT k, c,
             |    ROW_NUMBER() OVER (ORDER BY c ASC, k ASC) AS i,
             |    ROW_NUMBER() OVER (ORDER BY c DESC, k ASC) AS rr
             |  FROM c)
             |SELECT COUNT(*) AS n_keys, CAST(SUM(c) AS BIGINT) AS n_rows,
             |  ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top1_share,
             |  ROUND(CAST(SUM(CASE WHEN rr <= 10 THEN c ELSE 0 END) AS DOUBLE) / SUM(c), 6)
             |    AS topk_share,
             |  ROUND(2.0 * SUM(CAST(i AS DOUBLE) * c)
             |      / (CAST(COUNT(*) AS DOUBLE) * SUM(c))
             |    - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
             |FROM r""".stripMargin)),

    // Market-basket frequent items: parts appearing in >= 40 orders.
    QueryDef("q_frequent_items",
      (s, dir) => graft.ops.Basket.frequentItems(
        Tables.load(s, dir, "lineitem"), "l_orderkey", "l_partkey",
        minSupport = 40L),
      Some("""WITH p AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
             |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL)
             |SELECT i AS item, CAST(COUNT(*) AS BIGINT) AS support
             |FROM p GROUP BY 1 HAVING COUNT(*) >= 40""".stripMargin)),

    // Frequent co-purchased part pairs (support >= 2). The Spark side
    // Apriori-prunes and caps basket size; both are support-neutral, so
    // the oracle runs the naive self-join.
    QueryDef("q_frequent_pairs",
      (s, dir) => graft.ops.Basket.frequentPairs(
        Tables.load(s, dir, "lineitem"), "l_orderkey", "l_partkey",
        minSupport = 2L),
      Some("""WITH p AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
             |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL)
             |SELECT a.i AS item_a, b2.i AS item_b,
             |  CAST(COUNT(*) AS BIGINT) AS support
             |FROM p a JOIN p b2 ON a.b = b2.b AND a.i < b2.i
             |GROUP BY 1, 2 HAVING COUNT(*) >= 2""".stripMargin)),

    // Association rules from the frequent pairs, both directions, with
    // confidence and lift against the whole-corpus base rate.
    QueryDef("q_association_rules",
      (s, dir) => graft.ops.Basket.associationRules(
        Tables.load(s, dir, "lineitem"), "l_orderkey", "l_partkey",
        minSupport = 2L),
      Some("""WITH p AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
             |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
             |sup AS (SELECT i, COUNT(*) AS s FROM p GROUP BY 1),
             |nb AS (SELECT COUNT(DISTINCT b) AS n FROM p),
             |pr AS (SELECT a.i AS ia, b2.i AS ib, COUNT(*) AS support
             |  FROM p a JOIN p b2 ON a.b = b2.b AND a.i < b2.i
             |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
             |dirs AS (SELECT ia AS antecedent, ib AS consequent, support FROM pr
             |  UNION ALL SELECT ib, ia, support FROM pr)
             |SELECT antecedent, consequent, CAST(support AS BIGINT) AS support,
             |  ROUND(CAST(support AS DOUBLE) / sa.s, 6) AS confidence,
             |  ROUND(CAST(support AS DOUBLE) * nb.n / (sa.s * sc.s), 6) AS lift
             |FROM dirs
             |JOIN sup sa ON sa.i = dirs.antecedent
             |JOIN sup sc ON sc.i = dirs.consequent
             |CROSS JOIN nb""".stripMargin)),

    // Per-vertex triangles + clustering coefficient over the
    // co-purchase graph (frequent pairs as edges) — degree-ordered
    // orientation on the Spark side, naive x<y<z 3-join in the oracle.
    QueryDef("q_triangle_counts",
      (s, dir) => graft.ops.Graph.triangleCounts(
        graft.ops.Basket.frequentPairs(Tables.load(s, dir, "lineitem"),
          "l_orderkey", "l_partkey", minSupport = 2L)
          .select("item_a", "item_b"),
        "item_a", "item_b"),
      Some("""WITH p0 AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS i
             |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
             |e AS (SELECT a.i AS a, b2.i AS b FROM p0 a
             |  JOIN p0 b2 ON a.bk = b2.bk AND a.i < b2.i
             |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
             |deg AS (SELECT v, COUNT(*) AS d FROM
             |  (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
             |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
             |  FROM e e1 JOIN e e2 ON e2.a = e1.b
             |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
             |vt AS (SELECT v, COUNT(*) AS t FROM
             |  (SELECT x AS v FROM tri UNION ALL SELECT y FROM tri
             |   UNION ALL SELECT z FROM tri) GROUP BY 1)
             |SELECT deg.v AS vertex, CAST(d AS BIGINT) AS degree,
             |  CAST(coalesce(t, 0) AS BIGINT) AS triangles,
             |  CASE WHEN d >= 2 THEN
             |    ROUND(CAST(2 * coalesce(t, 0) AS DOUBLE) / (d * (d - 1)), 6)
             |  END AS clustering
             |FROM deg LEFT JOIN vt ON vt.v = deg.v""".stripMargin)),

    // Degree assortativity over the same co-purchase graph — do
    // well-connected parts pair with other hubs (r > 0) or with
    // one-off accessories (r < 0)? Exact-integer degree sums, one
    // double division, no sqrt (symmetric marginals).
    QueryDef("q_assortativity",
      (s, dir) => graft.ops.Graph.degreeAssortativity(
        graft.ops.Basket.frequentPairs(Tables.load(s, dir, "lineitem"),
          "l_orderkey", "l_partkey", minSupport = 2L)
          .select("item_a", "item_b"),
        "item_a", "item_b"),
      Some("""WITH p0 AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS i
             |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
             |e AS (SELECT a.i AS a, b2.i AS b FROM p0 a
             |  JOIN p0 b2 ON a.bk = b2.bk AND a.i < b2.i
             |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
             |sym AS (SELECT a AS src, b AS dst FROM e
             |  UNION ALL SELECT b, a FROM e),
             |deg AS (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS d
             |  FROM sym GROUP BY 1),
             |pr AS (SELECT dx.d AS dx, dy.d AS dy FROM sym
             |  JOIN deg dx ON sym.src = dx.v JOIN deg dy ON sym.dst = dy.v),
             |ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2,
             |    SUM(CAST(dx AS HUGEINT)) AS sx,
             |    SUM(CAST(dx AS HUGEINT) * dx) AS sxx,
             |    SUM(CAST(dx AS HUGEINT) * dy) AS sxy FROM pr),
             |vv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices FROM deg)
             |SELECT n_vertices, CAST(m2 / 2 AS BIGINT) AS n_edges,
             |  ROUND(CASE WHEN CAST(m2 AS DOUBLE) * CAST(sxx AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
             |    THEN (CAST(m2 AS DOUBLE) * CAST(sxy AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |      / (CAST(m2 AS DOUBLE) * CAST(sxx AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END, 6)
             |    AS assortativity
             |FROM ag, vv""".stripMargin)),

    // Seasonal-baseline anomalies: each event z-scored against its own
    // hour-of-day bucket's mean/std (broadcast profile, no row shuffle).
    QueryDef("q_seasonal_anomalies",
      (s, dir) => graft.ops.Temporal.seasonalAnomalies(
        Tables.load(s, dir, "events"), "ts", "value", threshold = 2.0,
        idCols = Seq("event_id")),
      Some("""WITH p AS (SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS season,
             |    COUNT(value) AS n, AVG(value) AS m, STDDEV_SAMP(value) AS s
             |  FROM events GROUP BY 1)
             |SELECT event_id, ts, value, p.season,
             |  ROUND(m, 6) AS season_mean, ROUND(s, 6) AS season_std,
             |  CASE WHEN s > 0 AND n >= 2 THEN ROUND((value - m) / s, 6) END AS z,
             |  coalesce(ABS(CASE WHEN s > 0 AND n >= 2
             |    THEN ROUND((value - m) / s, 6) END) > 2.0, false) AS is_anomaly
             |FROM events JOIN p ON p.season = CAST(EXTRACT(hour FROM ts) AS BIGINT)""".stripMargin)),

    // Data-quality expectations suite: five single-scan column checks
    // over orders, the lineitem->orders foreign key, and a freshness
    // gate — the promote-this-snapshot report. Mixed verdicts by
    // construction: the 200k price ceiling and the {O,F} status set
    // both fail partially, everything else passes.
    QueryDef("q_expectations",
      (s, dir) => {
        val orders = Tables.load(s, dir, "orders")
        val li = Tables.load(s, dir, "lineitem")
        graft.ops.Expect.report(orders, Seq(
            graft.ops.Expect.Complete("o_custkey"),
            graft.ops.Expect.Unique(Seq("o_orderkey")),
            graft.ops.Expect.InRange("o_totalprice", 0, 200000, 0.9),
            graft.ops.Expect.InSet("o_orderstatus", Seq("O", "F"), 0.99),
            graft.ops.Expect.Matches("o_orderpriority", "^[0-9]-")))
          .unionByName(graft.ops.Expect.referential(
            li, "l_orderkey", orders, "o_orderkey"))
          .unionByName(graft.ops.Expect.freshness(
            orders, "o_orderdate", "2001-09-01 00:00:00", 90L * 86400))
      },
      Some("""WITH m AS (SELECT COUNT(*) AS n, COUNT(o_custkey) AS c_cust,
             |    COUNT(DISTINCT o_orderkey) AS d_key,
             |    COUNT(o_orderkey) AS nn_key,
             |    COUNT(CASE WHEN o_totalprice BETWEEN 0 AND 200000 THEN 1 END) AS r_price,
             |    COUNT(o_totalprice) AS nn_price,
             |    COUNT(CASE WHEN o_orderstatus IN ('O','F') THEN 1 END) AS s_stat,
             |    COUNT(o_orderstatus) AS nn_stat,
             |    COUNT(CASE WHEN regexp_matches(o_orderpriority, '^[0-9]-') THEN 1 END) AS m_prio,
             |    COUNT(o_orderpriority) AS nn_prio,
             |    MAX(o_orderdate) AS mx
             |  FROM orders),
             |ri AS (SELECT COUNT(*) AS t,
             |    COUNT(CASE WHEN o.o_orderkey IS NULL THEN 1 END) AS orph
             |  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
             |    ON l.l_orderkey = o.o_orderkey
             |  WHERE l.l_orderkey IS NOT NULL),
             |rows_ AS (
             |  SELECT 'complete' AS check_name, 'o_custkey' AS target,
             |    ROUND(c_cust*1.0/n, 6) AS value, CAST(1.0 AS DOUBLE) AS threshold, 'ge' AS op FROM m
             |  UNION ALL SELECT 'unique', 'o_orderkey',
             |    ROUND(d_key*1.0/nn_key, 6), CAST(1.0 AS DOUBLE), 'ge' FROM m
             |  UNION ALL SELECT 'in_range', 'o_totalprice',
             |    ROUND(r_price*1.0/nn_price, 6), CAST(0.9 AS DOUBLE), 'ge' FROM m
             |  UNION ALL SELECT 'in_set', 'o_orderstatus',
             |    ROUND(s_stat*1.0/nn_stat, 6), CAST(0.99 AS DOUBLE), 'ge' FROM m
             |  UNION ALL SELECT 'matches', 'o_orderpriority',
             |    ROUND(m_prio*1.0/nn_prio, 6), CAST(1.0 AS DOUBLE), 'ge' FROM m
             |  UNION ALL SELECT 'referential', 'l_orderkey->o_orderkey',
             |    ROUND(orph*1.0/t, 6), CAST(0.0 AS DOUBLE), 'le' FROM ri
             |  UNION ALL SELECT 'freshness', 'o_orderdate',
             |    (epoch_us(TIMESTAMP '2001-09-01 00:00:00') - epoch_us(mx))/1000000.0,
             |    CAST(7776000.0 AS DOUBLE), 'le' FROM m)
             |SELECT check_name, target, value, threshold, op,
             |  coalesce(CASE WHEN op = 'ge' THEN value >= threshold
             |    ELSE value <= threshold END, false) AS passed
             |FROM rows_""".stripMargin))
  )
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Whole-table data profiling (the engine-side `SUMMARIZE`): one long-form
 * row per column with row/null/distinct counts, numeric min/max/mean, and
 * string min/max — the first thing anyone runs against an unfamiliar
 * 100 TB table, and the input to drift monitors comparing two snapshots.
 *
 * Shape: ONE aggregate pass over the table produces a single wide row
 * (every per-column statistic is an aggregate expression in the same
 * `agg`, so Spark computes them in one scan; the exact distinct counts
 * expand into a grouping-sets style plan — pass `approxDistinct = true`
 * to keep the scan single-stage with HLL sketches at scale), then the
 * wide row explodes into per-column rows driver-free.
 *
 * Conventions: timestamps profile as epoch micros (min/max only — their
 * mean is numerically meaningless at 1e15 magnitudes where double
 * summation error exceeds the rounding grid); means round to 1e-6;
 * distinct counts exclude nulls (SQL COUNT DISTINCT semantics).
 */
object Profile {

  /**
   * Pearson correlation matrix over numeric columns (upper triangle):
   * the feature-engineering / drift-triage companion of [[summarize]] —
   * all pairs computed in ONE aggregate pass (map-side partial moments,
   * a single reduce), then unpivoted driver-free with `stack`. Values
   * rounded to 6 dp (partial-agg order differs ~1e-12 across engines).
   */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs = pairs.map { case (a, b) =>
      round(corr(col(a).cast("double"), col(b).cast("double")), 6)
        .as(s"${a}__$b")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = s"stack(${pairs.size}, " + pairs.map { case (a, b) =>
      s"'$a', '$b', `${a}__$b`"
    }.mkString(", ") + ") as (col_a, col_b, corr)"
    one.selectExpr(stackExpr)
  }

  def summarize(df: DataFrame, approxDistinct: Boolean = false): DataFrame = {
    val fields = df.schema.fields.toSeq
    def nullNum = lit(null).cast("double")
    def nullStr = lit(null).cast("string")

    val aggs: Seq[Column] = fields.flatMap { f =>
      val c = col(f.name)
      val nd = if (approxDistinct) approx_count_distinct(c) else countDistinct(c)
      val (mn, mx, mean) = f.dataType match {
        case _: NumericType =>
          (min(c.cast("double")), max(c.cast("double")), round(avg(c), 6))
        case TimestampType | TimestampNTZType =>
          val us = unix_micros(c.cast(TimestampType)).cast("double")
          (min(us), max(us), max(nullNum))
        case _ => (max(nullNum), max(nullNum), max(nullNum))
      }
      val (mns, mxs) = f.dataType match {
        case StringType => (min(c), max(c))
        case _ => (max(nullStr), max(nullStr))
      }
      Seq(count(c).as(s"${f.name}__nn"), nd.as(s"${f.name}__nd"),
        mn.as(s"${f.name}__min"), mx.as(s"${f.name}__max"),
        mean.as(s"${f.name}__mean"),
        mns.as(s"${f.name}__mins"), mxs.as(s"${f.name}__maxs"))
    } :+ count(lit(1)).as("__n")

    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = array(fields.map { f =>
      struct(lit(f.name).as("column_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"${f.name}__nn")).as("n_null"),
        col(s"${f.name}__nd").as("n_distinct"),
        col(s"${f.name}__min").as("min_num"),
        col(s"${f.name}__max").as("max_num"),
        col(s"${f.name}__mean").as("mean_num"),
        col(s"${f.name}__mins").as("min_str"),
        col(s"${f.name}__maxs").as("max_str"))
    }: _*)
    row.select(explode(entries).as("e")).select("e.*")
  }

  /**
   * Population stability index between a reference and a current slice of
   * a numeric column — THE drift score monitoring pipelines alarm on
   * (PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted). Bins follow
   * [[graft.stats.Planners.histogram]]'s fixed-width clamped grid;
   * `smooth` pseudo-counts (Laplace, default 0.5 per bin) keep empty bins
   * finite. Returns one row per bin — (bin, bin_lo, p_ref, p_cur,
   * contrib) with `contrib = (p_ref - p_cur) * ln(p_ref / p_cur)`, all
   * rounded to 1e-6 — so the alarm threshold AND the bins driving it come
   * from the same result; PSI = sum(contrib).
   *
   * Shape: one map-side-combining histogram aggregate per slice (k-row
   * outputs), joined on the k-row bin grid — nothing here scales with the
   * table beyond the two scans.
   */
  def psi(ref: DataFrame, cur: DataFrame, valueCol: String,
      lo: Double, hi: Double, nBins: Int,
      smooth: Double = 0.5): DataFrame = {
    require(smooth > 0, "smooth must be positive (empty bins must stay finite)")
    import graft.stats.Planners
    val spark = ref.sparkSession
    val grid = spark.range(nBins).select(col("id").as("bin"))
    def side(df: DataFrame, s: String) =
      Planners.histogram(df, valueCol, lo, hi, nBins)
        .select(col("bin"), col("n").as(s"n_$s"))
    val w = (hi - lo) / nBins
    val j = grid
      .join(side(ref, "ref"), Seq("bin"), "left")
      .join(side(cur, "cur"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val tot = j.agg(sum(col("n_ref")).as("t_ref"), sum(col("n_cur")).as("t_cur"))
    def p(s: String) = (col(s"n_$s") + lit(smooth)) /
      (col(s"t_$s") + lit(smooth) * nBins)
    j.crossJoin(broadcast(tot))
      .select(col("bin"), (lit(lo) + col("bin") * lit(w)).as("bin_lo"),
        round(p("ref"), 6).as("p_ref"), round(p("cur"), 6).as("p_cur"),
        round((p("ref") - p("cur")) * log(p("ref") / p("cur")), 6).as("contrib"))
  }

  /**
   * Benford first-significant-digit audit: the distribution of leading
   * digits of `valueCol` against Benford's law p(d) = log₁₀(1 + 1/d) —
   * the classic fabricated-data / unit-mixing screen for numeric
   * telemetry (naturally-arising multiplicative quantities follow it;
   * uniform synthetics and capped counters don't). Emits one row per
   * digit 1–9 (observed n, p_obs, p_exp, the χ² contribution) plus the
   * total χ² and max |p_obs − p_exp| (the MAD-style alarm) repeated per
   * row, the [[graft.stats.Planners.calibrationReport]] constant-column
   * convention. Zero/null values carry no leading digit and are skipped;
   * signs and decimal points are irrelevant by construction (the digit
   * comes from |v| scaled into [1, 10)).
   *
   * ONE hash aggregate to a 9-row table + a window over it — nothing
   * scales with the input. The leading digit is computed arithmetically
   * (floor(|v| / 10^floor(log10 |v|))), not by string inspection, so
   * both engines agree on doubles.
   */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val v = abs(col(valueCol).cast("double"))
    val digit = floor(v / pow(lit(10.0), floor(log10(v)))).cast("int")
    val digits = df.filter(col(valueCol).isNotNull && v > 0)
      .select(digit.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val grid = df.sparkSession.range(1, 10).select(col("id").cast("int").as("digit"))
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    grid.join(digits, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"),
        log10(lit(1.0) + lit(1.0) / col("digit")).as("__pe"))
      .withColumn("__N", sum(col("n")).over(all))
      .withColumn("__po", col("n").cast("double") / col("__N"))
      .select(col("digit"), col("n"),
        round(col("__po"), 6).as("p_obs"),
        round(col("__pe"), 6).as("p_exp"),
        round(pow(col("n") - col("__N") * col("__pe"), 2) /
          (col("__N") * col("__pe")), 6).as("chi2_contrib"),
        round(sum(pow(col("n") - col("__N") * col("__pe"), 2) /
          (col("__N") * col("__pe"))).over(all), 6).as("chi2"),
        round(max(abs(col("__po") - col("__pe"))).over(all), 6).as("max_dev"))
  }

  /**
   * Per-group categorical composition: Shannon entropy (nats), category
   * count, and the majority category with its share — the one-line
   * answer to "how mixed is this group?" asked of packed training
   * sequences (source mixture per pack), corpus slices (language mix per
   * source), cluster assignments (label purity), and split audits.
   * Majority ties break (count desc, category asc) so the report is
   * engine-replayable; entropy and share round to 6 dp.
   *
   * Shape: a (keys, cat) hash aggregate with map-side partial combine
   * collapses the table to its composition matrix FIRST — everything
   * after (the key-partitioned window and the final per-key aggregate)
   * moves only (keys, cat, count) triples, at most one row per distinct
   * pair, no matter how large the input.
   */
  def groupEntropy(df: DataFrame, keyCols: Seq[String],
      catCol: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val keys = keyCols.map(col)
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy((keys :+ col(catCol)): _*)
      .agg(count(lit(1)).as("__n"))
    val byKey = Window.partitionBy(keys: _*)
    val rw = byKey.orderBy(col("__n").desc, col(catCol).asc)
    counts
      .withColumn("__tot", sum(col("__n")).over(byKey))
      .withColumn("__rn", row_number().over(rw))
      .withColumn("__p", col("__n").cast("double") / col("__tot"))
      .groupBy(keys: _*)
      .agg(max(col("__tot")).as("n_rows"),
        count(lit(1)).as("n_cats"),
        round(sum(-col("__p") * log(col("__p"))), 6).as("entropy"),
        max(when(col("__rn") === 1, col(catCol))).as("majority_cat"),
        round(max(when(col("__rn") === 1, col("__p"))), 6).as("majority_share"))
  }

  /**
   * Gini concentration coefficient over a non-negative measure — the
   * Lorenz-curve inequality number: 0 = perfectly even, →1 = one unit
   * holds everything. The corpus-mix diagnostic next to [[groupEntropy]]
   * (entropy says "how many effective groups", Gini says "how lopsided
   * is the mass"): token share across sources, spend across customers,
   * traffic across hosts. Computed on the rank form
   * G = Σᵢ(2i − n − 1)·xᵢ / (n·Σx) over ascending xᵢ, aggregated to
   * VALUE GRAIN: a run of c tied values with C rows strictly below
   * contributes Σ(2i − n − 1) = c·(2C + c − n) whatever the intra-tie
   * order (`idCol` is kept for signature stability but never consulted
   * — any total order over equal values yields the same sum), so
   * num = Σ_v x·c·(2C + c) − n·total needs ONE cumulative-count window
   * over the distinct-value table, never a row-grain rank.
   *
   * Exactness: the measure is taken in integer units (`valueCol` must
   * be integral — pre-scale money to cents), so numerator and
   * denominator are EXACT integer sums (algebraically identical to the
   * row-grain rank form — oracle hashes unchanged); the single division
   * is the only floating-point op. Scale shape: one hash-aggregate to
   * distinct values, then the cumulative window scans the
   * |distinct|-row value table — the
   * [[graft.stats.Planners.mannWhitneyU]] statistic-sized-window
   * convention, now actually holding here (the previous row-grain
   * rank funneled the ENTIRE input through one window task). Integer
   * cents already bound |distinct|; pre-quantize any genuinely
   * continuous measure to a grid first.
   *
   * Output: one row `(n, total, gini)` — gini 6 dp, null when n = 0 or
   * total = 0.
   */
  def gini(df: DataFrame, valueCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val x = col(valueCol).cast("long")
    val below = Window.orderBy(col("__x").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.filter(x.isNotNull && x >= 0)
      .select(x.as("__x"))
      .groupBy(col("__x")).agg(count(lit(1)).as("__c"))
      .withColumn("__b", coalesce(sum(col("__c")).over(below), lit(0L)))
      // per-term x·c·(2C + c) reaches n²·x when one value dominates
      // (1e16 ties × 1e5 cents ≈ 1e21 at the documented grain) — cast
      // to decimal(38,0) BEFORE multiplying so the product never passes
      // through a long; the sum is exact like DuckDB's HUGEINT
      // aggregate, and the n·total subtraction stays in decimal for the
      // same reason. The denominator multiplies in double (exact
      // integers → IEEE product, identical on both engines below 2^53,
      // last-ulp at most above it — inside the 6-dp round).
      .agg(coalesce(sum(col("__c")), lit(0L)).as("n"),
        sum(col("__x") * col("__c")).as("total"),
        sum(col("__x").cast("decimal(38,0)") * col("__c") *
          (lit(2L) * col("__b") + col("__c"))).as("__m"))
      .select(col("n"), col("total"),
        when(col("n") > 0 && col("total") > 0,
          round((col("__m") - col("n").cast("decimal(38,0)") *
              col("total").cast("decimal(38,0)")).cast("double") /
            (col("n").cast("double") * col("total")), 6)).as("gini"))
  }
}

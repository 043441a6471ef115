package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/**
 * Corpus-selection operators that need a GLOBAL total order — token-budget
 * fill and quantile (head/middle/tail) bucketing — without the
 * single-task global window an `ORDER BY`-only window function plans to.
 *
 * The shared machinery is the classic distributed scan: range-partition on
 * the order key, sort within partitions, then two jobs over the SAME
 * materialized physical plan — (1) per-partition row/value totals (one tiny
 * row per partition to the driver), (2) per-partition running totals seeded
 * with the exclusive prefix offsets. Spark reuses the sort's shuffle files
 * between the two jobs (same stage), so the range boundaries are sampled
 * ONCE and the pass over the data happens once; every partition's scan is
 * independent, so the operator parallelizes across the cluster instead of
 * funnelling 100 TB through one window task. The per-partition fold is
 * imperative by nature, so this is one of the few sanctioned
 * mapPartitions sites (SURVEY §7.3) — everything before and after stays
 * in the DataFrame world.
 *
 * Determinism: callers must pass a TOTAL order (unique tiebreak — same
 * contract as every window in this library). Given that, ranks and running
 * sums are independent of the sampled partition boundaries, so output is
 * deterministic and engine-replayable (the DuckDB oracles replay them with
 * `ROW_NUMBER()` / `SUM() OVER (ORDER BY ...)`).
 */
object Select {

  /** Internal: range-sorted df annotated with a global rank (and running
    * sum of `valueCol`, which must be LongType, when given); also returns
    * the driver-known total row count. */
  private def runningTotals(df: DataFrame, order: Seq[Column],
      valueCol: Option[String], rankCol: String, cumCol: Option[String],
      nRanges: Int): (DataFrame, Long) = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(nRanges, order: _*)
      .sortWithinPartitions(order: _*)
    val schema = sorted.schema
    val vIdx = valueCol.map(schema.fieldIndex).getOrElse(-1)
    valueCol.foreach { c =>
      require(schema(c).dataType == LongType, s"$c must be LongType (cast first)")
    }
    // one physical plan, one RDD: job 1 (totals) materializes the sort's
    // shuffle, job 2 reuses the same shuffle files, so the sampled range
    // boundaries cannot drift between the two passes
    val rdd = sorted.rdd
    val totals = rdd.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L; var s = 0L
      it.foreach { r => n += 1; if (vIdx >= 0) s += r.getLong(vIdx) }
      Iterator((pid, n, s))
    }.collect().sortBy(_._1)
    val rankOff = new Array[Long](totals.length)
    val sumOff = new Array[Long](totals.length)
    var (rAcc, sAcc) = (0L, 0L)
    totals.foreach { case (pid, n, s) =>
      rankOff(pid) = rAcc; sumOff(pid) = sAcc; rAcc += n; sAcc += s
    }
    val outSchema = {
      val base = StructType(schema.fields :+ StructField(rankCol, LongType, nullable = false))
      cumCol.map(c => base.add(StructField(c, LongType, nullable = false))).getOrElse(base)
    }
    val outRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      var rk = rankOff(pid); var cum = sumOff(pid)
      it.map { r =>
        rk += 1
        val extra: Seq[Any] =
          if (vIdx >= 0) { cum += r.getLong(vIdx); Seq(rk, cum) } else Seq(rk)
        Row.fromSeq(r.toSeq ++ extra)
      }
    }
    (spark.createDataFrame(outRdd, outSchema), rAcc)
  }

  /**
   * Token-budget fill: walk documents in `order` (highest-priority first)
   * and keep them while the RUNNING token total stays within `budget` —
   * the "select the best docs until the 1T-token budget is full" step of
   * training-data curation. Inclusive semantics: a doc is kept when the
   * running total INCLUDING it is <= budget (the straddling doc is
   * dropped, not truncated).
   *
   * Output: input columns + `rank` (1-based global position), `cum_tokens`
   * (inclusive running sum) and `keep`. `tokenCol` must be LongType.
   */
  def tokenBudget(df: DataFrame, tokenCol: String, order: Seq[Column],
      budget: Long, nRanges: Int = 32): DataFrame =
    runningTotals(df, order, Some(tokenCol), "rank", Some("cum_tokens"), nRanges)
      ._1.withColumn("keep", col("cum_tokens") <= budget)

  /**
   * Exact NTILE over a global order without a global window: bucket
   * 1..`buckets` per row, SQL NTILE semantics (first `n % buckets` buckets
   * get the extra row). The CCNet-style head/middle/tail split over a
   * perplexity score is `ntileBuckets(scored, Seq(col("avg_logp").desc,
   * col(id)), 3)` with buckets 1/2/3 mapped to labels by the caller.
   */
  def ntileBuckets(df: DataFrame, order: Seq[Column], buckets: Int,
      bucketCol: String = "bucket", nRanges: Int = 32): DataFrame = {
    require(buckets >= 1, "buckets >= 1")
    val (ranked, n) = runningTotals(df, order, None, "__rank", None, nRanges)
    val q = n / buckets
    val r = n % buckets
    val rk = col("__rank")
    // ranks 1..(q+1)*r fall in the first r buckets of size q+1; the rest in
    // buckets of size q (guard q == 0: every bucket holds <= 1 row).
    // Column `/` is double division — floor() is the exact integer quotient
    // for these positive < 2^53 operands.
    val bucket =
      if (q == 0) rk
      else when(rk <= (q + 1) * r, floor((rk - 1) / lit(q + 1)) + 1)
        .otherwise(lit(r) + floor((rk - lit((q + 1) * r) - 1) / lit(q)) + 1)
    ranked.withColumn(bucketCol, bucket.cast("long")).drop("__rank")
  }

  /**
   * UniMax-style per-source token budgeting (Chung et al. 2023, "UniMax:
   * Fairer and More Effective Language Sampling for Large-Scale
   * Multilingual Pretraining"): allocate a total training-token `budget`
   * across sources so no source repeats more than `maxEpochs` times and
   * the rest of the budget spreads UNIFORMLY over the unsaturated
   * sources — the waterfilling solution the paper reaches by a greedy
   * loop, computed here in closed form. With caps sorted ascending,
   * source j of k is SATURATED iff cap_j·(k−j+1) <= budget − prefix_{j−1}
   * — provably a prefix property (if it fails at j it fails at every
   * j' > j), so saturation is a per-row window expression and everyone
   * unsaturated shares the water level (budget − Σ saturated caps) /
   * #unsaturated.
   *
   * The input is the per-source AGGREGATE table (one row per source), so
   * the global windows here run over dozens of rows — the "never a
   * global window over the corpus" rule ([[tokenBudget]]'s reason for
   * existing) does not apply at this altitude.
   *
   * Output: (keyCol, n_tokens, cap_tokens, alloc_tokens, epochs,
   * saturated); allocations sum to min(budget, total capacity) and
   * epochs <= maxEpochs everywhere.
   */
  def waterfillBudgets(df: DataFrame, keyCol: String, tokenCol: String,
      budget: Double, maxEpochs: Double): DataFrame = {
    require(budget > 0 && maxEpochs > 0, "budget and maxEpochs must be positive")
    val ord = Window.orderBy(col("cap_tokens").asc, col(keyCol).asc)
    val prev = ord.rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.partitionBy()
    val flagged = df
      .select(col(keyCol), col(tokenCol).cast("long").as("n_tokens"))
      .withColumn("cap_tokens", col("n_tokens").cast("double") * lit(maxEpochs))
      .withColumn("__idx", row_number().over(ord))
      .withColumn("__prefix", coalesce(sum(col("cap_tokens")).over(prev), lit(0.0)))
      .withColumn("__k", count(lit(1)).over(all))
      .withColumn("saturated",
        col("cap_tokens") * (col("__k") - col("__idx") + 1) <=
          lit(budget) - col("__prefix"))
      .withColumn("__fsum",
        sum(when(col("saturated"), col("cap_tokens")).otherwise(lit(0.0))).over(all))
      .withColumn("__nsat",
        sum(when(col("saturated"), lit(1L)).otherwise(lit(0L))).over(all))
    val alloc = when(col("saturated"), col("cap_tokens"))
      .otherwise((lit(budget) - col("__fsum")) / (col("__k") - col("__nsat")))
    flagged.select(col(keyCol), col("n_tokens"),
      round(col("cap_tokens"), 6).as("cap_tokens"),
      round(alloc, 6).as("alloc_tokens"),
      round(alloc / col("n_tokens"), 6).as("epochs"),
      col("saturated"))
  }

  /**
   * Temperature-scaled source mixing (the T5/mT5 alpha-sampling rule,
   * Raffel et al. 2020 §3.4.3 / Conneau et al. 2020): sampling share
   * q_s = n_s^alpha / Σ n_t^alpha over per-source token masses. alpha = 1
   * is proportional (big sources dominate), alpha → 0 is uniform; the
   * usual 0.3–0.7 range boosts small sources without drowning the big
   * ones. The complement of [[waterfillBudgets]]: UniMax caps epochs,
   * temperature reshapes shares.
   *
   * One map-side-combining aggregate collapses the corpus to |sources|
   * rows; the totals broadcast back. Output: (keyCol, n_tokens, share,
   * q, boost = q/share), ratios rounded to 6 dp.
   */
  def temperatureMix(df: DataFrame, keyCol: String, tokenCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0, "alpha must be positive")
    val agg = df.groupBy(col(keyCol))
      .agg(sum(col(tokenCol).cast("long")).as("n_tokens"))
    val tot = agg.agg(sum(col("n_tokens")).as("__tot"),
      sum(pow(col("n_tokens").cast("double"), lit(alpha))).as("__ptot"))
    agg.crossJoin(broadcast(tot))
      .select(col(keyCol), col("n_tokens"),
        round(col("n_tokens") / col("__tot"), 6).as("share"),
        round(pow(col("n_tokens").cast("double"), lit(alpha)) / col("__ptot"), 6)
          .as("q"),
        round((pow(col("n_tokens").cast("double"), lit(alpha)) / col("__ptot")) /
          (col("n_tokens") / col("__tot")), 6).as("boost"))
  }

  /**
   * Deterministic low-discrepancy interleave: a global training order in
   * which source s occupies a fraction ~q_s of every prefix — the data
   * ORDER that realizes [[temperatureMix]]'s shares without sampling.
   * Each row's key is (rank_in_source − 0.5) / q_s (the classic
   * lattice/stride interleave): sorting by it round-robins sources at
   * densities proportional to q, so curriculum prefixes, checkpoint
   * restarts and partial epochs all see the target mixture. The
   * within-source order is the salted-md5 shuffle (content-derived,
   * engine-replayable, same device as the epoch-shuffle manifest).
   *
   * `rates` is the (keyCol, q) table — [[temperatureMix]] output or any
   * hand-set shares — broadcast onto one source-keyed window pass.
   * Output: (idCol, keyCol, rn, sort_key rounded to 6 dp).
   */
  def interleaveOrder(df: DataFrame, keyCol: String, idCol: String,
      rates: DataFrame): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(
      md5(concat(col(idCol).cast("string"), lit("#ilv"))), col(idCol))
    df.select(col(keyCol), col(idCol))
      .withColumn("rn", row_number().over(w).cast("long"))
      .join(broadcast(rates.select(col(keyCol), col("q"))), Seq(keyCol))
      .select(col(idCol), col(keyCol), col("rn"),
        round((col("rn") - lit(0.5)) / col("q"), 6).as("sort_key"))
  }

}

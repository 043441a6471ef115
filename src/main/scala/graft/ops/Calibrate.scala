package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Score calibration: turn a ranking score into a probability. The
 * calibration REPORT (ECE/Brier, `queries/MlOps`) measures miscalibration;
 * this is the standard fix — isotonic regression (Zadrozny & Elkan 2002),
 * the non-parametric recalibrator that only assumes "higher score ⇒ no
 * lower probability".
 */
object Calibrate {

  /**
   * Isotonic calibration curve over score bins, computed by the MINIMAX
   * characterization of the pool-adjacent-violators solution
   * (Robertson/Wright/Dykstra 1988, §1.2):
   *   iso_i = max_{a ≤ i} min_{b ≥ i} (Σ_{k∈[a,b]} pos_k) / (Σ_{k∈[a,b]} n_k)
   * — a closed FORM, not an iterative pooling loop, which is what makes
   * the fit replayable in SQL (the DuckDB oracle enumerates the same
   * segments) and shuffle-free at scale: rows bin once (one ntile over
   * the corpus), and everything after is B-grain — segment sums over the
   * B-row cumulative table, a B³ enumeration (B=10 ⇒ 1000 rows) that
   * never touches the corpus again. Weighted by construction (bins carry
   * their counts), exact by construction (every segment average is one
   * integer/integer division — both engines produce identical doubles).
   *
   * Output: one row per score bin — `(bin, n, pos, raw_prob, iso_prob)`,
   * probs 6 dp; `iso_prob` is nondecreasing in `bin` (spec-enforced) and
   * equals classic PAV output exactly.
   */
  def isotonicBins(df: DataFrame, scoreCol: String, labelCol: String,
      idCol: String, buckets: Int = 10): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val binW = Window.partitionBy(lit(1))
      .orderBy(col(scoreCol).asc, col(idCol).asc)
    val g = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(ntile(buckets).over(binW).cast("long").as("bin"),
        col(labelCol).cast("boolean").as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("pos"))
    val ord = Window.partitionBy(lit(1)).orderBy(col("bin").asc)
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = g
      .withColumn("cn", sum(col("n")).over(run))
      .withColumn("cp", sum(col("pos")).over(run))
    // segment [a, b] averages from the cumulative table
    val segs = cum.select(col("bin").as("b"), col("cn").as("cnb"),
        col("cp").as("cpb"))
      .join(cum.select(col("bin").as("a"),
        (col("cn") - col("n")).as("cna"), (col("cp") - col("pos")).as("cpa")),
        col("a") <= col("b"))
      .select(col("a"), col("b"),
        ((col("cpb") - col("cpa")).cast("double") /
          (col("cnb") - col("cna"))).as("seg_avg"))
    val bins = g.select(col("bin").as("i"))
    val inner = bins.join(segs, col("a") <= col("i") && col("i") <= col("b"))
      .groupBy(col("i"), col("a")).agg(min(col("seg_avg")).as("m"))
      .groupBy(col("i")).agg(max(col("m")).as("iso"))
    g.join(inner, col("bin") === col("i"))
      .select(col("bin"), col("n"), col("pos"),
        round(col("pos").cast("double") / col("n"), 6).as("raw_prob"),
        round(col("iso"), 6).as("iso_prob"))
  }
}

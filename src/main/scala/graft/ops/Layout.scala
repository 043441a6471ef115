package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton-curve) data layout: interleave the bits of several
 * rank-scaled columns into one sort key so that range-partitioning +
 * within-partition sorting clusters rows that are close in EVERY named
 * dimension. Parquet/ORC row-group min-max stats then prune multi-column
 * predicates — the lakehouse `OPTIMIZE ZORDER BY` primitive: a point/range
 * filter on any z-ordered column skips most files, instead of only the
 * single column a lexicographic sort favors.
 *
 * All integer arithmetic (integer scaling, shift/mask interleave) — exact,
 * engine-replayable, codegen'd; no UDF.
 */
object Layout {

  /**
   * Morton key over integral columns scaled to `bits` bits each via
   * exact integer division against caller-supplied [lo, hi] fit bounds
   * (values are clamped into the bounds first, so the fit may come from a
   * stale profile without overflowing the curve). Bit b of scaled column
   * j lands at position b*n + j. n*bits must stay < 63.
   */
  def zValue(colNames: Seq[String], lo: Seq[Long], hi: Seq[Long],
      bits: Int): Column = {
    val n = colNames.length
    require(n >= 2, "z-order needs at least 2 columns")
    require(lo.length == n && hi.length == n, "one [lo,hi] pair per column")
    require(n * bits < 63, s"n*bits = ${n * bits} overflows a long")
    val k = (1L << bits) - 1
    val terms = colNames.zipWithIndex.map { case (name, j) =>
      val span = hi(j) - lo(j)
      val scaled =
        if (span <= 0) "0"
        else s"((least(greatest(cast(($name) as bigint), ${lo(j)}L), ${hi(j)}L)" +
          s" - ${lo(j)}L) * ${k}L) div ${span}L"
      (0 until bits).map(b =>
        s"shiftleft(shiftright($scaled, $b) & 1, ${b * n + j})")
        .mkString(" + ")
    }
    expr(terms.mkString("(", ") + (", ")"))
  }

  /** Fit [lo, hi] per column with one min/max aggregate pass. */
  def fitBounds(df: DataFrame, colNames: Seq[String]): (Seq[Long], Seq[Long]) = {
    val aggs = colNames.flatMap(c =>
      Seq(min(col(c).cast("long")), max(col(c).cast("long"))))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    (colNames.indices.map(i => r.getLong(2 * i)),
      colNames.indices.map(i => r.getLong(2 * i + 1)))
  }

  /**
   * Re-layout a frame along the Morton curve: range-partition on the
   * z-key (one exchange; range boundaries from Spark's reservoir sample)
   * and sort within partitions, so each output file covers a compact
   * hyper-rectangle of the keyed space. Write the result with
   * [[graft.sources.CorpusIo.writeCorpus]] / plain parquet and min-max
   * pruning applies to every z-ordered column.
   */
  def zorderBy(df: DataFrame, colNames: Seq[String], nPartitions: Int,
      bits: Int = 10): DataFrame = {
    val (lo, hi) = fitBounds(df, colNames)
    df.withColumn("__z", zValue(colNames, lo, hi, bits))
      .repartitionByRange(nPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}

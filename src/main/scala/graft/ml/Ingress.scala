package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Row ingress for the model-side operators (scorers, trainers, explainer).
 *
 * `wide.rdd` over the raw featurizer output deserializes EVERY column of
 * every row — including string profile columns the model never reads — and
 * the extraction then pays a megamorphic `asInstanceOf[Number]` per cell.
 * Fine at sf0.1, measurable at 100x. This helper pushes the narrowing,
 * casts, and null fills into the Catalyst projection (whole-stage codegen),
 * so the deserialized row is exactly [id, seq cat (col-major int), seq cont
 * (col-major double), ns cat (int), ns cont (double)] and per-row access is
 * positional primitive getters.
 */
private[graft] object Ingress {

  /** Fixed positional layout: id at 0, then the four groups in order. */
  def project(wide: DataFrame, idCol: String,
      seqCat: Seq[Seq[String]], seqCont: Seq[Seq[String]],
      nsCat: Seq[String] = Nil, nsCont: Seq[String] = Nil): DataFrame =
    wide.select(
      col(idCol) +:
      (seqCat.flatten.map(c => coalesce(col(c).cast("int"), lit(0)).as(c)) ++
       seqCont.flatten.map(c => coalesce(col(c).cast("double"), lit(0.0)).as(c)) ++
       nsCat.map(c => coalesce(col(c).cast("int"), lit(0)).as(c)) ++
       nsCont.map(c => coalesce(col(c).cast("double"), lit(0.0)).as(c))): _*)

  def seqCatOf(row: Row, t: Int, nCat: Int): Array[Array[Int]] =
    Array.tabulate(t, nCat)((ts, c) => row.getInt(1 + c * t + ts))

  def seqContOf(row: Row, t: Int, nCat: Int, nCont: Int): Array[Array[Double]] =
    Array.tabulate(t, nCont)((ts, c) => row.getDouble(1 + (nCat + c) * t + ts))

  def nsCatOf(row: Row, t: Int, nCat: Int, nCont: Int, nNsCat: Int): Array[Int] =
    Array.tabulate(nNsCat)(c => row.getInt(1 + (nCat + nCont) * t + c))

  def nsContOf(row: Row, t: Int, nCat: Int, nCont: Int, nNsCat: Int,
      nNsCont: Int): Array[Double] =
    Array.tabulate(nNsCont)(c => row.getDouble(1 + (nCat + nCont) * t + nNsCat + c))
}

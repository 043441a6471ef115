package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator scenario: a Spark query plus (when SQL-expressible)
  * its DuckDB oracle over the same parquet tables. Column names must match
  * exactly between the two — the driver sorts columns by name before hashing. */
final case class QueryDef(
    name: String,
    spark: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryGroup {
  def queries: Seq[QueryDef]
}

object Catalog {
  /** Shared fixture constants (events span 2024-01-01..2024-01-30). */
  val PredTs = "2024-02-01 00:00:00"
  val HistoryDays = 21
  val LabelDays = 7
}

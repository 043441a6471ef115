package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator catalog lives in graft.queries.*; this object just flattens
  * it into the (queries, oracleSql) shape the driver consumes. */
object SparkEntry {

  private def groups: Seq[QueryGroup] =
    Seq(Relational, Analytics, TemporalQ, LlmOps, CurationQ, TokenizerQ,
      PipelineQ, MlOps, ExperimentQ, MiningQ)

  private lazy val catalog: Seq[QueryDef] = {
    val all = groups.flatMap(_.queries)
    // A duplicate name would silently drop one query from the gate maps
    // below (later group wins) — fail fast instead.
    val dups = all.groupBy(_.name).collect { case (n, qs) if qs.size > 1 => n }
    require(dups.isEmpty, s"duplicate catalog query names: ${dups.mkString(", ")}")
    all
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_pipeline_e2e")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.spark).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

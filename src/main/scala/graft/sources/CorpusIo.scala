package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Corpus ingest/egress for the LLM-data pipeline: raw web-scale text drops
 * arrive as JSONL (one document object per line — the Common Crawl /
 * RedPajama interchange shape), get normalized into the typed `documents`
 * schema, and leave as a partitioned parquet corpus that downstream stages
 * (dedup, mixing, packing) can partition-prune.
 *
 * Scale notes:
 *  - JSONL is splittable (newline-delimited), so a 100 TB drop parallelizes
 *    by HDFS block with no custom input format; schema is caller-supplied,
 *    never inferred (inference would scan the corpus twice).
 *  - Malformed lines are quarantined, not fatal: PERMISSIVE mode routes
 *    unparseable lines to a corrupt-record column so one bad shard can't
 *    kill an ingest job; [[readJsonl]] splits them into a `bad` frame the
 *    caller can count/sample, and the driver never materializes either side.
 *  - [[writeCorpus]] lays out hive-style `source=<s>/split=<t>` directories:
 *    per-source mixing weights and per-split training reads become partition
 *    pruning (a scan of one split touches no other split's files), and
 *    `maxRecordsPerFile` bounds file size so a skewed source still yields
 *    parallel-readable files.
 */
object CorpusIo {

  val CorruptCol = "_corrupt_record"

  /** Parsed + quarantined halves of a JSONL read (both lazy plans). */
  final case class JsonlRead(good: DataFrame, bad: DataFrame)

  /**
   * Read newline-delimited JSON with an enforced schema. Lines that fail to
   * parse land in `bad` with the raw line text; `good` carries exactly
   * `schema`'s columns. A line missing a field parses with nulls (schema
   * drift tolerance); a syntactically broken line is quarantined whole.
   */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): JsonlRead = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    // text scan + from_json rather than spark.read.json: the json file
    // source forbids plans that reference only the corrupt-record column
    // (QUERY_ONLY_CORRUPT_RECORD_COLUMN), which is exactly what the `bad`
    // side needs. A text scan is equally splittable and parses once per
    // line inside codegen.
    val withCorrupt = schema.add(CorruptCol, "string")
    val parsed = spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(col("value").as("raw_line"),
        from_json(col("value"), withCorrupt,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> CorruptCol)).as("_j"))
    val corrupt = col("_j").getField(CorruptCol)
    val good = parsed.filter(col("_j").isNotNull && corrupt.isNull)
      .select(schema.fieldNames.map(n => col("_j").getField(n).as(n)).toSeq: _*)
    val bad = parsed.filter(col("_j").isNull || corrupt.isNotNull)
      .select(col("raw_line"))
    JsonlRead(good, bad)
  }

  /**
   * Write a corpus as hive-partitioned parquet: `partitionCols` become
   * directory levels (prunable), `maxRecordsPerFile` caps file size inside
   * each partition. Returns the path for symmetry with [[Handover.write]].
   */
  def writeCorpus(df: DataFrame, path: String,
      partitionCols: Seq[String] = Seq("source"),
      maxRecordsPerFile: Long = 1000000L): String = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .partitionBy(partitionCols: _*)
      .parquet(path)
    path
  }

  /**
   * Compact a small-file corpus partition into ~`targetRecordsPerFile`
   * files (streaming ingest and per-batch appends accrete tiny files;
   * scan cost at 100 TB is dominated by file-open overhead once files
   * drop below a few hundred MB). Reads `inPath`, coalesces — a narrow
   * repartition, no shuffle — and writes `outPath`; the caller swaps
   * directories atomically (never compact in place: the scan would race
   * its own overwrite). Returns the output file count.
   */
  def compactTo(spark: SparkSession, inPath: String, outPath: String,
      targetRecordsPerFile: Long): Int = {
    require(targetRecordsPerFile > 0, "targetRecordsPerFile must be positive")
    val df = spark.read.parquet(inPath)
    val n = math.max(1L, (df.count() + targetRecordsPerFile - 1)
      / targetRecordsPerFile).toInt
    df.coalesce(n).write.mode("overwrite").parquet(outPath)
    spark.read.parquet(outPath).inputFiles.length
  }

  /**
   * Re-open a partitioned corpus. `filters` are plain column predicates —
   * apply them immediately after this call so Catalyst turns partition-
   * column predicates into partition pruning (no file listing beyond the
   * matching directories) and pushes the rest to parquet row-group stats.
   */
  def readCorpus(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /**
   * JSON field-coverage report: for every top-level key appearing in a
   * JSON column, how many rows carry it and what fraction of ALL rows
   * (including unparseable ones) that is — the schema-drift monitor for
   * JSONL ingest: a new producer field shows up as a low-coverage key, a
   * field being dropped decays toward zero, and the denominator catches
   * parse-failure spikes. One explode + hash-agg; the single-row total
   * joins back as a broadcast.
   */
  def jsonFieldCoverage(df: DataFrame, jsonCol: String): DataFrame = {
    val total = df.agg(count(lit(1)).as("__total"))
    df.select(explode(json_object_keys(col(jsonCol))).as("key"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_rows"))
      .crossJoin(broadcast(total))
      .select(col("key"), col("n_rows"),
        round(col("n_rows").cast("double") / col("__total"), 6).as("coverage"))
  }
}

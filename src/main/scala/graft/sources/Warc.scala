package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * WARC-style web-archive ingestion (ISO 28500, the Common Crawl container
 * format — every web-scale corpus pipeline starts by splitting WARC/WET
 * segments into records). Spark has no WARC reader; the standard
 * distributed trick is to read the archive as TEXT with the record
 * header `WARC/1.0\r\n` as the line separator — the scan stays SPLITTABLE
 * (each file still chunks by HDFS block; Hadoop's LineRecordReader scans
 * forward to the next delimiter), so a 100 TB crawl dump parallelizes
 * like any text read, no custom InputFormat and no per-file driver loop.
 *
 * [[read]] yields one row per record and parses it with pure codegen'd
 * string expressions: named headers are `regexp_extract`ed and the body
 * is cut by `Content-Length` from the first blank line — the
 * length-driven cut (not a second delimiter search) is what WARC's spec
 * prescribes and makes stray header-like bytes inside a payload
 * harmless. [[render]]/[[write]] produce the same format, giving the
 * round-trip the oracle checks (`q_warc_roundtrip`: documents → WARC
 * bytes on disk → re-read → parsed fields hash-match a direct SQL
 * projection of the source table).
 *
 * Contract: records are uncompressed inside the file (Common Crawl's
 * per-record gzip members need a decompressing InputFormat — out of
 * scope); the delimiter sequence must not open a payload line (real
 * crawls satisfy this: bodies are HTTP payloads, WARC forbids a bare
 * record header inside a member).
 */
object Warc {

  private val Delim = "WARC/1.0\r\n"

  /** One WARC response record per row, as a column: version line, named
    * headers (deterministic record id derived from the doc id), blank
    * line, payload. `Content-Length` counts payload BYTES (UTF-8). */
  def render(idCol: Column, textCol: Column, uriCol: Column): Column = {
    val payload = coalesce(textCol.cast("string"), lit(""))
    concat(
      lit("WARC/1.0\r\n"),
      lit("WARC-Type: response\r\n"),
      // null id/URI degrade to an empty header value — a null anywhere in
      // the concat would null the whole record string, the text sink would
      // write an empty line, and the record would silently vanish
      concat(lit("WARC-Record-ID: <urn:graft:"),
        coalesce(idCol.cast("string"), lit("")), lit(">\r\n")),
      concat(lit("WARC-Target-URI: "),
        coalesce(uriCol.cast("string"), lit("")), lit("\r\n")),
      concat(lit("Content-Length: "), octet_length(payload).cast("string"),
        lit("\r\n")),
      lit("\r\n"),
      payload, lit("\r\n"))
  }

  /** Write the corpus as one WARC-style archive (text files, one record
    * per row; the text sink's trailing `\n` is part of the inter-record
    * gap the reader discards). Records are rendered with a synthetic
    * `urn:graft` id and the given URI column. */
  def write(df: DataFrame, idCol: String, textCol: String, uriCol: Column,
      path: String): Unit =
    df.select(render(col(idCol), col(textCol), uriCol).as("value"))
      .write.mode("overwrite").text(path)

  /**
   * Read a WARC-style archive: one row per record with the version line
   * split off by `lineSep`, headers parsed, body cut by Content-Length.
   * Output: (record_id, target_uri, content_length, body) — record_id
   * and target_uri null when the header is absent (malformed records
   * surface as null-field rows for the caller to gate on, never as
   * exceptions mid-scan).
   */
  def read(spark: SparkSession, path: String): DataFrame =
    parse(spark.read.option("lineSep", Delim).text(path))

  /** Streaming twin: the same delimiter split + parse over a text STREAM
    * (new archive files appearing in a drop directory — the continuous-
    * crawl ingest shape). Pure projections, so the plan is append-legal
    * with no state; StreamingSpec pins batch parity. */
  def readStream(spark: SparkSession, path: String): DataFrame =
    parse(spark.readStream.option("lineSep", Delim).text(path))

  private def parse(input: DataFrame): DataFrame = {
    val raw = input
      .filter(length(trim(col("value"))) > 0) // preamble before record 1
    val hdrEnd = locate("\r\n\r\n", col("value"))
    val header = substring(col("value"), lit(1), hdrEnd - 1)
    val lenStr = regexp_extract(header, "(?m)^Content-Length: (\\d+)\\r?$", 1)
    val recId = regexp_extract(header, "(?m)^WARC-Record-ID: <([^>]*)>\\r?$", 1)
    val uri = regexp_extract(header, "(?m)^WARC-Target-URI: (\\S+)\\r?$", 1)
    // Content-Length counts BYTES; `locate` yields a CHAR offset. Convert
    // the char offset of the body start into a byte offset via the octet
    // length of the prefix, cut the payload on the BINARY form, and decode
    // back — a non-ASCII payload would otherwise pull trailing record
    // garbage in with it (a char-count cut over-reads by one position per
    // multi-byte character).
    val bodyStartBytes = octet_length(
      substring(col("value"), lit(1), hdrEnd + 3))
    raw.select(
        when(recId =!= "", recId).as("record_id"),
        when(uri =!= "", uri).as("target_uri"),
        when(lenStr =!= "", lenStr).cast("long").as("content_length"),
        when(hdrEnd > 0 && lenStr =!= "",
          substring(col("value").cast("binary"), bodyStartBytes + 1,
            lenStr.cast("int")).cast("string"))
          .as("body"))
  }
}

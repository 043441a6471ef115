package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * URL parsing and canonicalization for web-corpus curation (the
 * Common-Crawl-style ingest steps: group documents by registered domain,
 * strip tracking parameters so syntactically-different URLs of the same
 * page dedup together, cap documents per domain). The reference has no
 * web-ingest stage; these are the curation operators a 100 TB crawl
 * pipeline needs in front of the dedup/quality family.
 *
 * All extraction is regexp-based (not `parse_url`) on purpose: the same
 * pattern semantics replay in the DuckDB oracle, and everything stays a
 * single codegen'd narrow projection — no shuffle, no UDF. Patterns are
 * restricted to constructs Java regex and RE2 agree on (no backrefs, no
 * lookaround).
 */
object Urls {

  /** Query parameters dropped by [[canonicalize]]: click-tracking noise
    * that multiplies spellings of the same resource. */
  val TrackingParams = "utm_[a-z]+|ref|fbclid|gclid|mc_cid|mc_eid"

  /**
   * Structural parse: scheme, host, registered domain (host minus a
   * leading `www.`), top-level domain, path, raw query string. Scheme and
   * host are case-insensitive per RFC 3986 and are lowercased at
   * extraction; path/query keep their case. Columns append to the input
   * row (pure projection).
   */
  def parse(df: DataFrame, urlCol: String): DataFrame = {
    val u = col(urlCol)
    val host = lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val domain = regexp_replace(host, "^www\\.", "")
    df.withColumn("scheme", lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)))
      .withColumn("host", host)
      .withColumn("domain", domain)
      .withColumn("tld", regexp_extract(domain, "\\.([a-z0-9-]+)$", 1))
      .withColumn("path", regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1))
      .withColumn("query", regexp_extract(u, "\\?([^#]*)", 1))
  }

  /**
   * Canonical URL: lowercase scheme+host, drop the fragment, drop
   * tracking query parameters (keeping the survivors' original order),
   * drop a now-empty `?`, collapse an empty path to `/`. The query
   * rewrite is an array pipeline (`split` → `filter` → `array_join`) so
   * the DuckDB oracle replays it with `list_filter` exactly.
   */
  def canonicalize(df: DataFrame, urlCol: String): DataFrame = {
    val u = col(urlCol)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val path = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    val rawQuery = regexp_extract(u, "\\?([^#]*)", 1)
    val kept = filter(split(rawQuery, "&"),
      p => !(p.rlike("^(" + TrackingParams + ")=") || p === ""))
    val cleanQuery = array_join(kept, "&")
    df.withColumn("canonical_url", concat(
      scheme, lit("://"), host,
      when(path === "", lit("/")).otherwise(path),
      when(cleanQuery === "", lit("")).otherwise(concat(lit("?"), cleanQuery))))
  }

  /**
   * Per-domain document cap: [[parse]] + the deterministic salted-hash
   * quota sample ([[Text.quotaSample]]) keyed on the registered domain —
   * "no domain contributes more than `quota` docs", the standard
   * anti-spam / diversity bound of crawl curation. One window pass
   * partitioned by domain.
   */
  def capPerDomain(df: DataFrame, urlCol: String, idCol: String,
      quota: Int): DataFrame =
    Text.quotaSample(parse(df, urlCol), Seq("domain"), idCol, quota)
}

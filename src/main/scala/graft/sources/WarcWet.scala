package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Common Crawl WARC/WET ingestion (beyond the reference, which is
  * wiki-dump-only: WET "conversion" records — extracted plain text per
  * crawled page — are the de-facto raw feed of web-scale LLM training
  * corpora, and an engine claiming the 100 TB pipeline role needs to
  * scan them natively). Format: ISO 28500 (WARC 1.0/1.1) as published;
  * no crawler-specific behavior assumed.
  *
  * Distributed scan, same pattern as [[WikiXml]]: read the file as text
  * records delimited by the `WARC/1.` version line (`lineSep` record
  * splitting — Hadoop's reader keeps a single multi-GB uncompressed
  * WET splittable across executors at block boundaries), then parse the
  * named headers with codegen'd `regexp_extract` and cut the payload at
  * the first blank line, all next to the scan so Catalyst prunes
  * filtered records before anything wide runs.
  *
  * Compression reality check (the deployment note that matters at
  * 100 TB): Common Crawl ships `.warc.wet.gz` — gzip is NOT
  * block-splittable, so one .gz file = one task; the parallelism unit
  * is the ~53k-file segment listing, not intra-file splits. Point the
  * reader at the directory (or a glob) and Spark schedules one task per
  * file — exactly how production WET jobs run. bz2/zstd(hadoop codec)
  * variants split like the wiki dumps.
  *
  * Record shape notes, pinned by WarcWetSpec:
  *   - headers end at the first blank line (CRLF per spec; bare LF
  *     tolerated — both real-world forms appear in the fixture),
  *   - the leading `warcinfo` record and any non-`conversion` record
  *     are dropped for document extraction,
  *   - `Content-Length` is parsed but NOT trusted for the payload cut
  *     (the split already consumed the inter-record boundary; the
  *     blank-line cut is exact under lineSep splitting).
  *
  * Honest limitation of separator splitting (vs the spec's
  * Content-Length framing): a conversion payload that itself contains
  * the literal `WARC/1.` (a page about the WARC format) splits
  * mid-record — the doc truncates there and the orphan fragment is
  * dropped by the `WARC-Type:` screen. The wiki scan never faces this
  * (XML escaping makes `</page>` unrepresentable in text); exact WET
  * framing needs a custom Hadoop InputFormat that honors
  * Content-Length, the right upgrade if that corruption rate ever
  * matters against the splittability this gets for free.
  */
object WarcWet {

  /** Minimum extracted-text size for a usable document — same screen the
    * reference applies to wiki articles (wiki_parser.py:194-196). */
  val MinTextChars = 50

  /** One row per WARC record (any type), `value` = headers + payload
    * without the leading version line. The version line itself is the
    * record separator: every record in a WET file begins `WARC/1.x`. */
  def records(spark: SparkSession, path: String): DataFrame =
    spark.read.option("lineSep", "WARC/1.").text(path)
      .filter(col("value").contains("WARC-Type:"))

  private def header(name: String): Column =
    // value starts with the version remnant ("0\r\n" / "1\r\n"), then
    // headers; header names are case-insensitive per spec.
    regexp_extract(col("value"), "(?i)(?m)^" + name + ":\\s*([^\\r\\n]*)", 1)

  /** Parsed records: WARC headers as columns, payload cut at the first
    * blank line (CRLF or LF), trailing record padding trimmed. */
  def parsed(spark: SparkSession, path: String): DataFrame =
    records(spark, path).select(
      header("WARC-Type").as("warc_type"),
      header("WARC-Record-ID").as("record_id"),
      header("WARC-Target-URI").as("target_uri"),
      to_timestamp(header("WARC-Date")).as("warc_date"),
      header("Content-Length").cast("long").as("content_length"),
      // payload: everything after the first blank line; absent one
      // (warcinfo-style all-header records still have one, but a
      // truncated tail record may not) -> empty payload, filtered below.
      when(instr(col("value"), "\r\n\r\n") > 0,
        expr("substring(value, instr(value, '\\r\\n\\r\\n') + 4)"))
        .when(instr(col("value"), "\n\n") > 0,
          expr("substring(value, instr(value, '\\n\\n') + 2)"))
        .otherwise(lit(""))
        .as("payload"))

  /** WET documents: `conversion` records only, text trimmed of the
    * inter-record padding, short extractions dropped — the straight
    * analogue of [[WikiXml.articles]] for web text, with the same
    * derived counts the downstream pipeline stages key on. */
  def documents(spark: SparkSession, path: String,
      minChars: Int = MinTextChars): DataFrame =
    parsed(spark, path)
      .filter(lower(col("warc_type")) === "conversion")
      .select(
        col("record_id"), col("target_uri"), col("warc_date"),
        col("content_length"),
        regexp_replace(col("payload"), """^\s+|\s+$""", "").as("text"))
      .filter(length(col("text")) >= minChars)
      .withColumn("word_count", regexp_count(col("text"), lit("""\S+""")))
      .withColumn("char_count", length(col("text")))

  /** Pipeline-shaped projection, the WET analogue of feeding
    * [[WikiXml.articles]] into [[graft.pipeline.Pipeline.run]]:
    * `doc_id` = xxhash64 of the WARC record id (deterministic across
    * runs and partitions — the record id is globally unique per spec),
    * `source` = the target URI's host (the per-domain grouping key the
    * quality/mixture stages use), `text`. */
  def asDocs(spark: SparkSession, path: String): DataFrame =
    documents(spark, path).select(
      xxhash64(col("record_id")).as("doc_id"),
      regexp_extract(col("target_uri"), "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)", 1)
        .as("source"),
      col("text"))
}

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Deduplication stage (reference: src/processing/deduplicator.py).
  *
  * The reference is an in-memory, order-dependent incremental index
  * (first-seen doc wins, deduplicator.py:150-180). A distributed rebuild
  * must impose a deterministic order instead; we use ascending `doc_id` as
  * "seen first" everywhere, which makes every operator here a pure function
  * of its input set — rerunnable and partition-count-independent, the
  * property that actually matters at 100 TB.
  */
object Dedup {

  /** Python `text.strip().lower()` then md5 (deduplicator.py:299-304).
    * strip() trims all whitespace, so regexp-trim rather than `trim`.
    * Documented deviation (ADVICE r1): `\s` here is ASCII-only, while
    * Python's strip() also trims U+00A0/U+2028-class whitespace — kept
    * ASCII deliberately so the Spark and DuckDB oracle sides agree; docs
    * with exotic edge whitespace may hash differently than the reference. */
  def contentHash(text: Column): Column =
    md5(lower(regexp_replace(text, Clean.EdgeWsRe, "")))

  /** D9 exact dedup, first-seen (= lowest doc_id) wins
    * (deduplicator.py:281-330). One shuffle on the 128-bit content hash;
    * hash keys are uniform so there is no skew to salt at any scale, and
    * the window per key holds only the duplicate cluster (tiny). For
    * pure dedup-without-attribution, `dropDuplicates("content_hash")`
    * would shuffle the same but skip the sort. */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(col("content_hash")).orderBy(col(idCol))
    docs.withColumn("content_hash", contentHash(col(textCol)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Duplicate→original attribution map (deduplicator.py:176: duplicate_of). */
  def exactDuplicateOf(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("content_hash")).orderBy(col("doc_id"))
    docs.withColumn("content_hash", contentHash(col("text")))
      .withColumn("original_id", first(col("doc_id")).over(w))
      .filter(col("doc_id") =!= col("original_id"))
      .select(col("doc_id").as("duplicate_id"), col("original_id"))
  }

  /** D7 stats: totals, uniques, clusters (deduplicator.py:210-215, 262-269). */
  def exactStatsQuery(docs: DataFrame): DataFrame = {
    val h = docs.select(contentHash(col("text")).as("h"))
    h.agg(
      count(lit(1)).as("total_documents"),
      countDistinct(col("h")).as("unique_documents"),
      (count(lit(1)) - countDistinct(col("h"))).as("duplicate_documents"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, d) =>
      exactDedup(Tables.documents(s, d)).select("doc_id", "content_hash")),
    "dedup_exact_dupmap" -> ((s, d) => exactDuplicateOf(Tables.documents(s, d))),
    "dedup_exact_stats" -> ((s, d) => exactStatsQuery(Tables.documents(s, d))))

  def oracles: Map[String, String] = Map(
    "dedup_exact" ->
      s"""SELECT doc_id, content_hash FROM (
         |  SELECT doc_id,
         |         md5(lower(regexp_replace(text, '^\\s+|\\s+$$', '', 'g'))) AS content_hash,
         |         row_number() OVER (
         |           PARTITION BY md5(lower(regexp_replace(text, '^\\s+|\\s+$$', '', 'g')))
         |           ORDER BY doc_id) AS rn
         |  FROM documents)
         |WHERE rn = 1""".stripMargin,
    "dedup_exact_dupmap" ->
      s"""SELECT doc_id AS duplicate_id, original_id FROM (
         |  SELECT doc_id,
         |         first_value(doc_id) OVER (
         |           PARTITION BY md5(lower(regexp_replace(text, '^\\s+|\\s+$$', '', 'g')))
         |           ORDER BY doc_id) AS original_id
         |  FROM documents)
         |WHERE doc_id <> original_id""".stripMargin,
    "dedup_exact_stats" ->
      s"""SELECT count(*) AS total_documents,
         |       count(DISTINCT h) AS unique_documents,
         |       count(*) - count(DISTINCT h) AS duplicate_documents
         |FROM (SELECT md5(lower(regexp_replace(text, '^\\s+|\\s+$$', '', 'g'))) AS h
         |      FROM documents)""".stripMargin)
}

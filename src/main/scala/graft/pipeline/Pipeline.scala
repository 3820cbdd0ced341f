package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Config tree + end-to-end orchestrator (reference: src/main.py:44-150
  * `LLMDataPipeline`, configs/pipeline_config.yaml, src/utils/config.py).
  *
  * The reference materializes a Python list between stages; here the whole
  * run is ONE lazy plan per output action — clean and quality fuse into a
  * single codegen stage over the scan, dedup contributes the only wide
  * exchange, and the sinks are distributed writers. Stage counters come
  * from `observe` (no extra pass), not driver-side len() calls.
  */
object Pipeline {

  /** S3 source registry (reference download_wiki.py:22-25,160-168:
    * name → dump URL, raw URLs pass through). Download itself is out of
    * engine scope (SURVEY §2.1) — data arrives as files; this resolves
    * the reference's `ingestion.source` config key. */
  val SourceRegistry: Map[String, String] = Map(
    "simplewiki" -> "https://dumps.wikimedia.org/simplewiki/latest/simplewiki-latest-pages-articles.xml.bz2",
    "enwiki" -> "https://dumps.wikimedia.org/enwiki/latest/enwiki-latest-pages-articles.xml.bz2")

  def resolveSource(nameOrUrl: String): String =
    SourceRegistry.getOrElse(nameOrUrl, nameOrUrl)

  /** pipeline_config.yaml:24-31 */
  final case class CleaningConfig(
      removeUrls: Boolean = true,
      removeCitations: Boolean = true,
      normalizeUnicode: Boolean = true,
      normalizeWhitespace: Boolean = true,
      fixMojibake: Boolean = true,
      minLengthChars: Int = 100)

  /** pipeline_config.yaml:33-40. algorithm: exact_hash | minhash_lsh | simhash */
  final case class DedupConfig(
      enabled: Boolean = true,
      algorithm: String = "minhash_lsh")

  /** pipeline_config.yaml:61-71 */
  final case class TokenizationConfig(
      enabled: Boolean = true,
      vocabSize: Int = 32000,
      minFrequency: Long = 2L)

  /** pipeline_config.yaml:74-79 */
  final case class OutputConfig(
      format: String = "parquet", // parquet | jsonl
      maxRecordsPerFile: Long = 0L)

  final case class GraftConfig(
      maxDocs: Option[Long] = None, // ingestion.max_articles (O3/P5)
      cleaning: CleaningConfig = CleaningConfig(),
      dedup: DedupConfig = DedupConfig(),
      quality: Quality.Config = Quality.Config.reference,
      tokenization: TokenizationConfig = TokenizationConfig(),
      output: OutputConfig = OutputConfig())

  /** Toggleable clean chain (cleaner.py:62-90 constructor flags). The
    * UDF-backed steps (mojibake, NFKC) only enter the plan when enabled,
    * keeping the default chain fully codegen'd. */
  def cleanColumn(cfg: CleaningConfig): org.apache.spark.sql.Column = {
    var c = col("text")
    if (cfg.fixMojibake) c = CleanUdfs.fixMojibakeCol(c)
    if (cfg.normalizeUnicode) c = CleanUdfs.nfkcCol(c)
    if (cfg.removeUrls) c = Clean.stripEmails(Clean.stripUrls(c))
    if (cfg.removeCitations) c = Clean.stripCitations(c)
    c = Clean.stripControl(c)
    if (cfg.normalizeWhitespace) c = Clean.normalizeWhitespace(c)
    c
  }

  def dedupStage(df: DataFrame, cfg: DedupConfig): DataFrame =
    if (!cfg.enabled) df
    else cfg.algorithm match {
      case "exact_hash" => Dedup.exactDedup(df).drop("content_hash")
      case "simhash" =>
        df.join(NearDup.simhashDuplicateOf(df),
          df("doc_id") === col("duplicate_id"), "left_anti")
      case _ => MinHash.dedup(df) // minhash_lsh default
    }

  /** Full run: returns the one-row summary after writing outputs.
    * Mirrors src/main.py:80-150 stage order. */
  def run(docs0: DataFrame, cfg: GraftConfig, outDir: String): DataFrame = {
    val docs = cfg.maxDocs.fold(docs0)(n => docs0.limit(n.toInt))

    val (ingested, ingestObs) = Sinks.observeStage(docs, "ingest")
    val cleaned = ingested
      .withColumn("original_length", length(col("text")))
      .withColumn("text", cleanColumn(cfg.cleaning))
      .filter(length(col("text")) >= cfg.cleaning.minLengthChars)
      .withColumn("cleaned_length", length(col("text")))
    val deduped = dedupStage(cleaned, cfg.dedup)
    val passed = Quality.withReason(deduped, cfg.quality)
      .filter(col("reason") === "passed").drop("reason")

    val out =
      if (!cfg.tokenization.enabled) passed.withColumn("token_count", lit(null: java.lang.Long))
      else {
        val model = Bpe.train(
          Bpe.wordFrequencies(passed), cfg.tokenization.vocabSize, cfg.tokenization.minFrequency)
        val enc = udf((t: String) => model.encode(t))
        passed.withColumn("tokens", enc(col("text")))
          .withColumn("token_count", size(col("tokens")).cast("long"))
      }

    // S6/S7 final corpus + S8 tokens
    val docsOut = out.drop("tokens")
    cfg.output.format match {
      case "jsonl" => Sinks.writeDocsJsonl(docsOut, s"$outDir/documents")
      case _ => Sinks.writeParquet(docsOut, s"$outDir/documents", cfg.output.maxRecordsPerFile)
    }
    if (cfg.tokenization.enabled)
      Sinks.writeTokensJsonl(out.select("tokens"), s"$outDir/tokens")

    // S9: one-row summary (counts re-derived lazily; Spark reuses the
    // cached shuffle outputs of the write above where possible)
    val summary = docs.agg(count(lit(1)).as("docs_ingested"))
      .crossJoin(cleaned.agg(
        count(lit(1)).as("docs_after_clean"),
        sum(col("original_length") - col("cleaned_length")).as("chars_removed")))
      .crossJoin(deduped.agg(count(lit(1)).as("docs_after_dedup")))
      .crossJoin(out.agg(
        count(lit(1)).as("docs_passed_quality"),
        sum(col("token_count")).as("total_tokens")))
    Sinks.writeSummaryJson(summary, s"$outDir/summary.json")
    val _ = ingestObs // observation values surface after the actions above
    summary
  }
}

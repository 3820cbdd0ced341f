package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row
import graft.pipeline.{Clean, Dedup, Quality}

/** Structured Streaming variant of the pipeline (D6/S4 analogue;
  * reference: deduplicator.py:224-260 `deduplicate_stream` consumes a
  * generator and yields unique docs, keeping a growing in-memory index).
  *
  * The streaming rebuild: file-source micro-batches → the SAME clean /
  * quality Column transforms (they are narrow expressions, so they apply
  * to a streaming DataFrame unchanged) → stateful exact dedup via
  * `dropDuplicates` on the content hash — Spark's state store plays the
  * reference's growing index, and "first seen wins" is the arrival order,
  * exactly the reference's semantics (its batch driver iterates input
  * order).
  *
  * State at 100 TB: an unbounded exact-dedup state store is the same
  * memory hazard as the reference's in-memory LSH index; production runs
  * bound it with a watermark (`withWatermark` + `dropDuplicatesWithinWatermark`)
  * so state expires after the dedup horizon. Kept unbounded here to match
  * reference semantics on finite corpora.
  */
object StreamPipeline {

  /** Schema of the streamed documents (matches the driver's parquet). */
  val docSchema = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"

  /** File-source stream of document batches dropped into `dir`. */
  def readDocs(spark: SparkSession, dir: String, format: String = "json"): DataFrame =
    spark.readStream.schema(docSchema).format(format).load(dir)

  /** clean → min-length filter → quality reason → content-hash dedup.
    * Emits the surviving docs with their reason column. */
  def cleanedDeduped(docs: DataFrame, minLen: Int = 100,
      cfg: Quality.Config = Quality.Config()): DataFrame = {
    val cleaned = docs
      .withColumn("text", Clean.cleanText(col("text")))
      .filter(length(col("text")) >= minLen)
    Quality.withReason(cleaned, cfg)
      .withColumn("content_hash", Dedup.contentHash(col("text")))
      .dropDuplicates("content_hash")
  }

  /** Convenience writer for tests/demos: complete pipeline into a named
    * in-memory sink table. */
  def toMemorySink(out: DataFrame, name: String): DataStreamWriter[Row] =
    out.writeStream.format("memory").queryName(name).outputMode("append")
}

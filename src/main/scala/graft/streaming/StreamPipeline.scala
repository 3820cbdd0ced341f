package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}
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

  /** Bounded-state streaming dedup: `dropDuplicatesWithinWatermark` keys
    * the state store on the content hash but expires entries once the
    * watermark passes their event time — the production form of
    * [[cleanedDeduped]] for unbounded streams (an unbounded exact-dedup
    * state store is the same memory hazard as the reference's in-memory
    * index). Semantics: duplicates are only suppressed within the dedup
    * horizon; a re-arrival after the horizon is treated as new — the
    * documented trade for finite state at 100 TB/day. */
  def cleanedDedupedBounded(docs: DataFrame, tsCol: String, watermark: String,
      minLen: Int = 100, cfg: Quality.Config = Quality.Config()): DataFrame = {
    val cleaned = docs
      .withColumn("text", Clean.cleanText(col("text")))
      .filter(length(col("text")) >= minLen)
    Quality.withReason(cleaned, cfg)
      .withColumn("content_hash", Dedup.contentHash(col("text")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")
  }

  /** Watermarked tumbling-window aggregation over an event-time stream —
    * the streaming twin of Relational.hourlyEventStats. The watermark
    * bounds state: windows older than the horizon are finalized, emitted
    * (append mode), and their state dropped — the knob that keeps a
    * 100 TB/day stream's state finite. */
  def windowedEventCounts(events: DataFrame, window: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(
        org.apache.spark.sql.functions.window(col("ts"), window).as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"))

  /** Streaming sessionization — the streaming twin of
    * `Relational.sessionizeEvents` (same 30-minute inactivity gap),
    * expressed with Spark's native `session_window`: per-key gap-merging
    * windows maintained in the state store, finalized and emitted
    * (append mode) once the watermark passes `session_end + gap`. This
    * is the Spark-first spelling — no custom state function; the
    * SessionWindowStateStore operator merges overlapping windows
    * incrementally, and state per user is one open session, not the
    * event history, so a 100 TB/day stream holds state proportional to
    * ACTIVE users only. */
  def sessionizedEvents(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("s"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("s.start").as("session_start"),
        col("s.end").as("session_end"),
        col("n_events"))

  /** D4-with-state in streaming form: first-seen-wins dedup WITH
    * duplicate→original attribution via flatMapGroupsWithState — the
    * reference's growing index (`duplicate_of`, deduplicator.py:150-180)
    * as explicit keyed state. Emits every doc, tagging duplicates with
    * the id of the first-seen original in their hash group. */
  def dedupWithAttribution(docs: DataFrame): Dataset[DedupVerdict] = {
    import docs.sparkSession.implicits._
    docs
      .withColumn("content_hash", Dedup.contentHash(col("text")))
      .select(col("content_hash"), col("doc_id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, DedupVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[Long]) =>
          // within a micro-batch, arrival order decides first-seen (the
          // reference's iteration-order semantics)
          val out = rows.map { case (_, id) =>
            if (!state.exists) { state.update(id); DedupVerdict(id, isDuplicate = false, None) }
            else DedupVerdict(id, isDuplicate = true, Some(state.get))
          }
          out.toList.iterator
      }
  }
}

/** Output row of [[StreamPipeline.dedupWithAttribution]]. */
final case class DedupVerdict(docId: Long, isDuplicate: Boolean, originalId: Option[Long])

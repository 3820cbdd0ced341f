package graft

import java.nio.file.Files

import graft.streaming.StreamPipeline

/** Watermarked windowed aggregation + flatMapGroupsWithState dedup. */
class StreamWindowSpec extends SparkSpec {

  test("watermarked hourly windows finalize once the watermark passes") {
    val dir = Files.createTempDirectory("swin")
    val events = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, event_type STRING")
      .json(dir.toString)
    val q = StreamPipeline.toMemorySink(
      StreamPipeline.windowedEventCounts(events), "win_out").start()
    try {
      Files.writeString(dir.resolve("b1.json"),
        """{"event_id":1,"ts":"2024-01-01T10:05:00Z","event_type":"click"}
          |{"event_id":2,"ts":"2024-01-01T10:20:00Z","event_type":"click"}
          |{"event_id":3,"ts":"2024-01-01T10:40:00Z","event_type":"view"}
          |""".stripMargin)
      q.processAllAvailable()
      // advance event time far enough to close the 10:00 window (+2h watermark)
      Files.writeString(dir.resolve("b2.json"),
        """{"event_id":9,"ts":"2024-01-01T14:00:00Z","event_type":"click"}
          |""".stripMargin)
      q.processAllAvailable()
      val rows = spark.sql(
          "SELECT event_type, n_events FROM win_out WHERE window_start = TIMESTAMP '2024-01-01 10:00:00'")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows == Map("click" -> 2L, "view" -> 1L))
    } finally q.stop()
  }

  test("flatMapGroupsWithState dedup attributes duplicates across batches") {
    val dir = Files.createTempDirectory("sdup")
    val docs = spark.readStream
      .schema(StreamPipeline.docSchema)
      .json(dir.toString)
    val q = StreamPipeline.dedupWithAttribution(docs)
      .writeStream.format("memory").queryName("dup_out").outputMode("append").start()
    try {
      Files.writeString(dir.resolve("b1.json"),
        """{"doc_id":1,"text":"Alpha body","lang":"en","source":"s","n_chars":10}
          |{"doc_id":2,"text":"Beta body","lang":"en","source":"s","n_chars":9}
          |""".stripMargin)
      q.processAllAvailable()
      Files.writeString(dir.resolve("b2.json"),
        """{"doc_id":3,"text":"  ALPHA BODY  ","lang":"en","source":"s","n_chars":14}
          |""".stripMargin)
      q.processAllAvailable()
      val rows = spark.sql("SELECT docId, isDuplicate, originalId FROM dup_out")
        .collect().map(r => (r.getLong(0), r.getBoolean(1), Option(r.get(2)))).toSet
      assert(rows == Set(
        (1L, false, None), (2L, false, None), (3L, true, Some(1L))))
    } finally q.stop()
  }
}

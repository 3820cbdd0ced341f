package graft

import java.nio.file.Files

import graft.pipeline.{Pipeline, Quality}
import org.apache.spark.sql.functions._

/** Config-driven end-to-end run (reference src/main.py entry point 1). */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    "The history of science is the study of how natural knowledge was developed " +
      "and refined over many years by people in many parts of the world and it " +
      "is a field that draws on the work of many scholars over time and it " +
      "was shaped by the tools and ideas that were available at each point."

  private def docs = Seq(
    (1L, good),
    (2L, good), // exact dup of 1
    (3L, good.replace("science", "art")), // near dup of 1
    (4L, "too short"),
    (5L, good + " " + "A closing different sentence changes this document meaningfully with more unique words appended here.")
  ).toDF("doc_id", "text")

  test("end-to-end run: clean, dedup, quality, tokenize, sinks, summary") {
    val out = Files.createTempDirectory("pipe").toString
    val summary = Pipeline.run(docs, Pipeline.GraftConfig(), out).collect().head
    assert(summary.getAs[Long]("docs_ingested") == 5L)
    assert(summary.getAs[Long]("docs_after_clean") == 4L)   // doc 4 dropped
    assert(summary.getAs[Long]("docs_after_dedup") == 2L)   // 2 and 3 are dups of 1
    assert(summary.getAs[Long]("docs_passed_quality") == 2L)
    assert(summary.getAs[Long]("total_tokens") > 0L)
    assert(spark.read.parquet(s"$out/documents").count() == 2L)
    assert(spark.read.json(s"$out/tokens").count() == 2L)
    assert(Files.readString(java.nio.file.Paths.get(s"$out/summary.json"))
      .contains("\"docs_ingested\":5"))
  }

  test("pipeline_metrics.json carries the reference report fields (A6)") {
    val out = Files.createTempDirectory("pipe").toString
    // doc 6: long but digit-heavy → fails the quality cascade, so
    // filter_reasons is non-empty
    val digits = (1 to 60).map(i => s"$i$i$i$i").mkString(" ")
    Pipeline.run(docs.union(Seq((6L, digits + " " + digits)).toDF("doc_id", "text")),
      Pipeline.GraftConfig(), out).collect()
    val json = Files.readString(java.nio.file.Paths.get(s"$out/pipeline_metrics.json"))
    // metrics.py:151-161 to_dict shape
    for (f <- Seq("\"pipeline_duration_seconds\"", "\"stages\"", "\"filter_reasons\"",
        "\"timestamp\"")) assert(json.contains(f), s"missing $f in $json")
    // per-stage StageMetrics fields (metrics.py:18-59)
    for (f <- Seq("\"stage_name\"", "\"duration_seconds\"", "\"input_count\"",
        "\"output_count\"", "\"filtered_count\"", "\"error_count\"",
        "\"bytes_processed\"", "\"throughput\"", "\"filter_rate\""))
      assert(json.contains(f), s"missing $f in $json")
    for (s <- Seq("ingest", "clean", "dedup", "quality", "tokenize"))
      assert(json.contains(s"\"$s\": {\"stage_name\": \"$s\""), s"missing stage $s")
    // exact counts, from the same run the summary reports
    assert(json.contains("\"stage_name\": \"ingest\", ") && json.contains("\"input_count\": 6"))
    // doc 4 (too short) filtered at clean: filtered_count 1 of 6
    assert(json.replaceAll(".*\"clean\": \\{", "").takeWhile(_ != '}')
      .contains("\"filtered_count\": 1"))
    // doc 6 fails quality → appears in filter_reasons with a count
    val reasons = json.split("\"filter_reasons\": ")(1).takeWhile(_ != '}')
    assert(reasons.contains(": 1"), s"expected a filtered reason count in $reasons")
  }

  test("metricsEnabled=false writes no metrics file") {
    val out = Files.createTempDirectory("pipe").toString
    Pipeline.run(docs, Pipeline.GraftConfig(metricsEnabled = false,
      tokenization = Pipeline.TokenizationConfig(enabled = false)), out).collect()
    assert(!Files.exists(java.nio.file.Paths.get(s"$out/pipeline_metrics.json")))
  }

  test("exact_hash algorithm keeps near-dups; maxDocs caps ingest") {
    val out = Files.createTempDirectory("pipe").toString
    val cfg = Pipeline.GraftConfig(
      maxDocs = Some(4L),
      dedup = Pipeline.DedupConfig(algorithm = "exact_hash"),
      tokenization = Pipeline.TokenizationConfig(enabled = false))
    val summary = Pipeline.run(docs, cfg, out).collect().head
    assert(summary.getAs[Long]("docs_ingested") == 4L)
    assert(summary.getAs[Long]("docs_after_dedup") == 2L) // near-dup 3 survives exact hash
  }
}

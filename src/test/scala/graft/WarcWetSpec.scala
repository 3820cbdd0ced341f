package graft

import java.nio.file.Files

import graft.sources.WarcWet

/** WARC/WET ingest semantics on an inline fixture: record splitting on
  * the version line, header parse, blank-line payload cut (CRLF and
  * bare-LF forms), warcinfo/non-conversion drop, min-length screen,
  * and the gzip whole-file path (the Common Crawl shipping format). */
class WarcWetSpec extends SparkSpec {

  // Long enough (68 words, natural prose) to clear BOTH the source's
  // 50-char screen and the reference quality cascade's 50-word minimum,
  // so the Pipeline E2E below writes a non-empty corpus.
  private val longText =
    "The project gathered a small team of researchers who spent the " +
      "better part of two years collecting, cleaning, and describing web " +
      "documents for an open corpus. They wrote tools to measure quality, " +
      "removed pages that were mostly boilerplate, and kept careful notes " +
      "about every decision along the way. The result was a dataset that " +
      "other groups could audit, extend, and rebuild from scratch without " +
      "guessing what had happened."

  private def rec(tpe: String, id: Int, uri: String, body: String,
      sep: String = "\r\n"): String =
    s"WARC/1.0$sep" +
      s"WARC-Type: $tpe$sep" +
      s"WARC-Record-ID: <urn:uuid:0000-$id>$sep" +
      s"WARC-Target-URI: $uri$sep" +
      s"WARC-Date: 2024-03-0${id}T00:00:00Z$sep" +
      s"Content-Length: ${body.getBytes("UTF-8").length}$sep" +
      sep + body + sep + sep

  private val fixture: String =
    rec("warcinfo", 1, "", "software: test-crawler 1.0") +
      rec("conversion", 2, "http://a.example/page", longText) +
      rec("conversion", 3, "http://b.example/stub", "too short") +
      rec("conversion", 4, "http://c.example/lf", longText + " LF form.",
        sep = "\n") +
      rec("response", 5, "http://d.example/raw", longText)

  private def writeFixture(suffix: String, gz: Boolean = false): String = {
    val dir = Files.createTempDirectory("graft-wet").toFile
    val f = new java.io.File(dir, s"part-000.$suffix")
    val out: java.io.OutputStream =
      if (gz) new java.util.zip.GZIPOutputStream(new java.io.FileOutputStream(f))
      else new java.io.FileOutputStream(f)
    out.write(fixture.getBytes("UTF-8")); out.close()
    f.getAbsolutePath
  }

  test("records: one row per WARC record, version line is the separator") {
    val n = WarcWet.records(spark, writeFixture("warc.wet")).count()
    assert(n === 5)
  }

  test("documents: conversion-only, blank-line payload cut (CRLF and LF), " +
      "min-length screen, derived counts") {
    val docs = WarcWet.documents(spark, writeFixture("warc.wet"))
      .orderBy("target_uri")
      .collect()
    // warcinfo dropped, stub under 50 chars dropped, response dropped
    assert(docs.length === 2)
    val a = docs(0)
    assert(a.getAs[String]("target_uri") === "http://a.example/page")
    assert(a.getAs[String]("record_id") === "<urn:uuid:0000-2>")
    assert(a.getAs[String]("text") === longText)
    assert(a.getAs[Int]("word_count") === longText.split("\\s+").length)
    assert(a.getAs[Int]("char_count") === longText.length)
    assert(a.getAs[java.sql.Timestamp]("warc_date") != null)
    assert(a.getAs[Long]("content_length") === longText.getBytes("UTF-8").length)
    // the bare-LF record parses through the LF fallback cut
    val c = docs(1)
    assert(c.getAs[String]("target_uri") === "http://c.example/lf")
    assert(c.getAs[String]("text") === longText + " LF form.")
  }

  test("asDocs feeds Pipeline.run end-to-end: WET records through " +
      "clean/dedup/quality to the written corpus") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.WarcWet.asDocs(spark, writeFixture("warc.wet"))
    assert(docs.columns.toSeq === Seq("doc_id", "source", "text"))
    assert(docs.select("source").collect().map(_.getString(0)).toSet
      === Set("a.example", "c.example"))
    // stable ids: same fixture, same ids, no collisions
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.size === 2)
    assert(graft.sources.WarcWet.asDocs(spark, writeFixture("warc.wet"))
      .select("doc_id").collect().map(_.getLong(0)).toSet === ids)
    val out = Files.createTempDirectory("wet-e2e").toString
    val summary = graft.pipeline.Pipeline.run(docs,
      graft.pipeline.Pipeline.GraftConfig(
        quality = graft.pipeline.Quality.Config.reference), out)
      .collect().head
    assert(summary.getAs[Long]("docs_ingested") === 2L)
    assert(spark.read.parquet(s"$out/documents")
      .filter(col("text").isNotNull).count() >= 1L)
  }

  test("gzip WET: whole-file decompress via the Hadoop codec " +
      "(the Common Crawl shipping format) yields identical documents") {
    val plain = WarcWet.documents(spark, writeFixture("warc.wet"))
      .select("record_id", "text").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val gz = WarcWet.documents(spark, writeFixture("warc.wet.gz", gz = true))
      .select("record_id", "text").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(gz === plain)
    assert(gz.size === 2)
  }
}

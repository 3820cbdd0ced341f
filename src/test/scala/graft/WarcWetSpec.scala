package graft

import java.nio.file.Files

import graft.sources.WarcWet

/** WARC/WET ingest semantics on an inline fixture: record splitting on
  * the version line, header parse, blank-line payload cut (CRLF and
  * bare-LF forms), warcinfo/non-conversion drop, min-length screen,
  * and the gzip whole-file path (the Common Crawl shipping format). */
class WarcWetSpec extends SparkSpec {

  private val longText =
    "Web pages carry enough extracted text to clear the fifty character " +
      "minimum with room to spare, like this one does."

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

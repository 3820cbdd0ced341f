package graft

import java.nio.file.Files

import graft.sources.WarcWet

/** WARC/WET ingest semantics on an inline fixture: record splitting on
  * the version line, header parse from the header block only, earliest-
  * blank-line payload cut (CRLF and bare-LF forms), warcinfo/non-
  * conversion drop, min-length screen, the gzip whole-file path (the
  * Common Crawl shipping format), and the Content-Length exact-framing
  * reader against its separator-splitting fast path. */
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
      f"WARC-Date: 2024-03-${(id % 28) + 1}%02dT00:00:00Z$sep" +
      s"Content-Length: ${body.getBytes("UTF-8").length}$sep" +
      sep + body + sep + sep

  private val fixture: String =
    rec("warcinfo", 1, "", "software: test-crawler 1.0") +
      rec("conversion", 2, "http://a.example/page", longText) +
      rec("conversion", 3, "http://b.example/stub", "too short") +
      rec("conversion", 4, "http://c.example/lf", longText + " LF form.",
        sep = "\n") +
      rec("response", 5, "http://d.example/raw", longText)

  private def write(content: String, suffix: String,
      gz: Boolean = false): String = {
    val dir = Files.createTempDirectory("graft-wet").toFile
    val f = new java.io.File(dir, s"part-000.$suffix")
    val out: java.io.OutputStream =
      if (gz) new java.util.zip.GZIPOutputStream(new java.io.FileOutputStream(f))
      else new java.io.FileOutputStream(f)
    out.write(content.getBytes("UTF-8")); out.close()
    f.getAbsolutePath
  }

  private def writeFixture(suffix: String, gz: Boolean = false): String =
    write(fixture, suffix, gz)

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
    // the bare-LF record parses through the earliest-blank-line cut
    val c = docs(1)
    assert(c.getAs[String]("target_uri") === "http://c.example/lf")
    assert(c.getAs[String]("text") === longText + " LF form.")
  }

  test("payload cut takes the EARLIEST blank line of either form: a " +
      "bare-LF-header record whose payload contains a CRLF blank line " +
      "keeps its full payload (round-16 advice)") {
    val body = longText + " first part.\r\n\r\nsecond part after a CRLF blank."
    val one = rec("conversion", 6, "http://e.example/mixed", body, sep = "\n")
    val docs = WarcWet.documents(spark, write(one, "warc.wet")).collect()
    assert(docs.length === 1)
    // the old two-branch cut jumped to the payload's CRLF blank line,
    // silently dropping everything before it
    assert(docs(0).getAs[String]("text") === body)
  }

  test("headers parse from the header block only: a payload quoting " +
      "'WARC-Type: conversion' at a line start cannot spoof the type " +
      "screen (round-16 advice)") {
    val quoting = longText +
      "\nWARC-Type: conversion\nWARC-Target-URI: http://spoof.example/x\n"
    val one = rec("response", 7, "http://d.example/quoting", quoting)
    val docs = WarcWet.documents(spark, write(one, "warc.wet")).collect()
    assert(docs.isEmpty) // a response record, whatever its payload says
  }

  test("asDocs feeds Pipeline.run end-to-end: WET records through " +
      "clean/dedup/quality to the written corpus; record_id carried " +
      "through as the stable identity beside the 64-bit doc_id") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.WarcWet.asDocs(spark, writeFixture("warc.wet"))
    assert(docs.columns.toSeq === Seq("doc_id", "record_id", "source", "text"))
    assert(docs.select("source").collect().map(_.getString(0)).toSet
      === Set("a.example", "c.example"))
    assert(docs.select("record_id").collect().map(_.getString(0)).toSet
      === Set("<urn:uuid:0000-2>", "<urn:uuid:0000-4>"))
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

  // ---------------------------------------------------------------------
  // Exact Content-Length framing (WarcInputFormat)
  // ---------------------------------------------------------------------

  test("exact framing parity: on a well-formed file both framings yield " +
      "identical documents (plain and gzip)") {
    def docset(path: String, exact: Boolean) =
      WarcWet.documents(spark, path, exactFraming = exact)
        .select("record_id", "target_uri", "content_length", "text")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
        .toSet
    val p = writeFixture("warc.wet")
    assert(docset(p, exact = true) === docset(p, exact = false))
    val g = writeFixture("warc.wet.gz", gz = true)
    assert(docset(g, exact = true) === docset(g, exact = false))
    assert(docset(g, exact = true).size === 2)
  }

  test("exact framing extracts a payload containing the literal WARC/1. " +
      "byte-identically, where separator splitting truncates (round-15 " +
      "verdict #4)") {
    val trap = longText + "\r\nA page ABOUT the format: records begin\r\n" +
      "WARC/1.0\r\nWARC-Type: conversion\r\nand so on.\r\n\r\nAfter the quote."
    val one = rec("conversion", 8, "http://f.example/warc-page", trap) +
      rec("conversion", 9, "http://g.example/next", longText)
    val p = write(one, "warc.wet")
    val exact = WarcWet.documents(spark, p, exactFraming = true)
      .orderBy("target_uri").collect()
    assert(exact.length === 2)
    assert(exact(0).getAs[String]("target_uri") === "http://f.example/warc-page")
    assert(exact(0).getAs[String]("text") === trap) // byte-identical
    assert(exact(1).getAs[String]("target_uri") === "http://g.example/next")
    assert(exact(1).getAs[String]("text") === longText)
    // the fast path truncates the trap doc at the embedded version line
    // (and, here, the quoted header block even parses as a bogus
    // conversion fragment) — the documented corruption channel the exact
    // reader closes
    val fast = WarcWet.documents(spark, p)
      .filter(org.apache.spark.sql.functions.col("target_uri")
        === "http://f.example/warc-page").collect()
    assert(fast.forall(_.getAs[String]("text") != trap))
  }

  test("exact framing recovery: a record missing Content-Length degrades " +
      "to separator semantics instead of failing the scan") {
    val noCl =
      "WARC/1.0\r\n" +
        "WARC-Type: conversion\r\n" +
        "WARC-Record-ID: <urn:uuid:0000-10>\r\n" +
        "WARC-Target-URI: http://h.example/nocl\r\n" +
        "WARC-Date: 2024-03-10T00:00:00Z\r\n" +
        "\r\n" + longText + "\r\n\r\n"
    val p = write(noCl + rec("conversion", 11, "http://i.example/ok", longText),
      "warc.wet")
    val docs = WarcWet.documents(spark, p, exactFraming = true)
      .orderBy("target_uri").collect()
    assert(docs.length === 2)
    assert(docs(0).getAs[String]("text") === longText)
    assert(docs(1).getAs[String]("record_id") === "<urn:uuid:0000-11>")
  }

  test("exact framing payload cap: an over-cap payload truncates the VALUE " +
      "but realigns the STREAM — every following record parses intact " +
      "(round-16 watch item, cap exercised via the conf key)") {
    // one 8 KB single-line payload (no internal blank lines), cap at 1 KB,
    // then two ordinary records that MUST survive the realignment skip
    val big = ("The quick brown fox jumps over the lazy dog again and again " +
      "without a single blank line anywhere in sight ") * 80
    assert(big.getBytes("UTF-8").length > 4096)
    val p = write(
      rec("conversion", 20, "http://big.example/over-cap", big) +
        rec("conversion", 21, "http://after.example/one", longText) +
        rec("conversion", 22, "http://after.example/two", longText + " Two."),
      "warc.wet")
    val hc = spark.sparkContext.hadoopConfiguration
    hc.setLong(graft.sources.WarcInputFormat.MaxPayloadKey, 1024L)
    try {
      val docs = WarcWet.documents(spark, p, exactFraming = true)
        .orderBy("target_uri").collect()
      assert(docs.length === 3)
      val after = docs.filter(_.getAs[String]("target_uri").startsWith("http://after"))
      assert(after.map(_.getAs[String]("text")).toSet ===
        Set(longText, longText + " Two."), "records after the cap must parse intact")
      val capped = docs.find(_.getAs[String]("target_uri") == "http://big.example/over-cap").get
      val got = capped.getAs[String]("text")
      assert(got === big.substring(0, 1024).trim,
        "capped value must be exactly the first cap bytes of the payload " +
          "(modulo the extractor's whitespace trim)")
      // the declared Content-Length still reads from the headers —
      // consumers can SEE the truncation
      assert(capped.getAs[Long]("content_length") === big.getBytes("UTF-8").length.toLong)
    } finally hc.unset(graft.sources.WarcInputFormat.MaxPayloadKey)
  }

  test("a nonpositive configured payload cap falls back to the default: " +
      "-1 ('unlimited' convention) neither crashes the scan nor truncates " +
      "(round-17 review)") {
    val body = ("No crash and no truncation under a negative cap value. " +
      "Payload text long enough to prove it is not emptied. ") * 20
    val p = write(
      rec("conversion", 30, "http://negcap.example/a", body) +
        rec("conversion", 31, "http://negcap.example/b", longText),
      "warc.wet")
    val hc = spark.sparkContext.hadoopConfiguration
    hc.setLong(graft.sources.WarcInputFormat.MaxPayloadKey, -1L)
    try {
      val docs = WarcWet.documents(spark, p, exactFraming = true)
        .orderBy("target_uri").collect()
      assert(docs.length === 2)
      assert(docs(0).getAs[String]("text") === body.trim)
      assert(docs(1).getAs[String]("text") === longText)
    } finally hc.unset(graft.sources.WarcInputFormat.MaxPayloadKey)
  }
}

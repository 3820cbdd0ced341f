package graft

import java.nio.file.Files

import graft.pipeline.{Pipeline, Quality, Wiki}
import graft.sources.WikiXml
import org.apache.spark.sql.functions._

/** The reference's `python -m src.main` equivalent end to end:
  * wiki dump → parse/filter → wiki-markup clean → pipeline
  * (clean/dedup/quality/tokenize) → parquet + tokens + summary. */
class IngestE2ESpec extends SparkSpec {

  private val body =
    ("The '''history of science''' is the study of how [[natural knowledge|knowledge]] " +
      "was developed and refined over many years by people in many parts of the world " +
      "and it is a field that draws on the work of many scholars over time and it was " +
      "shaped by the tools and the ideas that were available to each generation. " +
      "See [https://example.org more] and a reference<ref>cite</ref> too.").trim

  private def page(id: Long, title: String, text: String) =
    s"""  <page>
       |    <title>$title</title>
       |    <ns>0</ns>
       |    <id>$id</id>
       |    <revision><id>${id + 900}</id><text>$text</text></revision>
       |  </page>""".stripMargin

  test("dump to training data: every stage of the reference main() runs") {
    val dumpPath = Files.createTempFile("dump", ".xml")
    Files.writeString(dumpPath,
      s"""<mediawiki>
         |${page(1, "Science", body)}
         |${page(2, "Science Copy", body)}
         |${page(3, "Art", body.replace("science", "art").replace("Science", "Art"))}
         |</mediawiki>
         |""".stripMargin)

    val docs = WikiXml.articles(spark, dumpPath.toString)
      .select(col("page_id").as("doc_id"), Wiki.cleanWiki(col("text")).as("text"))
    val out = Files.createTempDirectory("e2e").toString
    val summary = Pipeline.run(docs,
      Pipeline.GraftConfig(quality = Quality.Config.reference), out).collect().head

    assert(summary.getAs[Long]("docs_ingested") == 3L)
    // the exact copy AND the two-word "art" variant are both minhash dups
    assert(summary.getAs[Long]("docs_after_dedup") == 1L)
    assert(summary.getAs[Long]("docs_passed_quality") == 1L)
    val corpus = spark.read.parquet(s"$out/documents")
    assert(corpus.count() == 1L)
    // markup really is gone from the final corpus
    val texts = corpus.select("text").collect().map(_.getString(0))
    assert(texts.forall(t => !t.contains("'''") && !t.contains("[[") && !t.contains("<ref")))
    assert(spark.read.json(s"$out/tokens").count() == 1L)
  }
}

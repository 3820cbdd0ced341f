package graft

import graft.pipeline.Wiki

/** Wiki-markup removal semantics (reference wiki_parser.py:249-293). */
class WikiSpec extends SparkSpec {
  import spark.implicits._

  private def clean(s: String): String =
    Seq(s).toDF("text").select(Wiki.cleanWiki($"text").as("c"))
      .as[String].collect().head

  test("templates, refs, html tags removed") {
    assert(clean("Start {{infobox|x=1}} middle <ref name=a>cite</ref> end <br/>")
      == "Start middle end")
  }

  test("nested templates strip innermost-out (F9 fidelity)") {
    assert(clean("A {{outer|x={{inner|y=2}}|z=3}} B") == "A B")
    assert(clean("A {{a|{{b|{{c}}}}}} B") == "A B")
    // unbalanced braces are left alone, as in the reference fallback
    assert(clean("A {{dangling open B") == "A {{dangling open B")
  }

  test("wiki links unwrap to their label") {
    assert(clean("See [[Target Page|the label]] and [[Plain]]")
      == "See the label and Plain")
  }

  test("external links and bold/italic markup removed") {
    assert(clean("Go [https://example.com here] '''bold''' ''italic''")
      == "Go bold italic")
  }

  test("headings keep their title text") {
    assert(clean("== History ==\nSome text") == "History\nSome text")
  }

  test("tidy: empty parens dropped, space before punctuation fixed") {
    // NB the double space is reference-faithful: spaces collapse BEFORE
    // empty-paren removal (wiki_parser.py:278-293 order)
    assert(clean("A result ( ) appears , finally .") == "A result  appears, finally.")
  }
}

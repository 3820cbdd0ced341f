package graft

import graft.pipeline.Tokenize

/** Pin the BPE-ish pre-tokenizer pattern's behavior on the cases that
  * distinguish it from whitespace splitting. */
class TokenizeRegexSpec extends SparkSpec {
  import spark.implicits._

  private def counts(text: String): (Long, Long) = {
    val r = Tokenize.regexStatsQuery(Seq(("s", text)).toDF("source", "text"))
      .collect().head
    (r.getAs[Long]("total_bpeish_tokens"), r.getAs[Long]("total_ws_words"))
  }

  test("contractions, digits, and punctuation split off as separate tokens") {
    // don't -> [don]["'t"]; 42 -> [42]; "end." -> [end][.]
    assert(counts("don't stop") === ((3L, 2L)))
    assert(counts("version 42 beta") === ((3L, 3L)))
    assert(counts("the end.") === ((3L, 2L)))
    // mixed alnum splits at the letter/digit boundary
    assert(counts("abc123") === ((2L, 1L)))
  }

  test("plain words count identically under both tokenizations") {
    assert(counts("plain words only here") === ((4L, 4L)))
  }
}

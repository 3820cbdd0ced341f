package graft

import graft.pipeline.Repetition

/** Golden tests for the Gopher-style repetition signals — hand-computed
  * expectations, including the tiebreak and degenerate-doc edges the
  * sf testdata never exercises. */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) =
    Repetition.repetitionQuery(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap

  test("dup word fraction and top bigram on a repetitive doc") {
    // words: a b a b a  -> 5 words, 2 distinct, dup_frac = 3/5
    // bigrams: "a b","b a","a b","b a" -> both have cnt 2; tiebreak
    // picks "a b" (lexicographically smallest). nonspace = 5 chars,
    // covered = 2 * (len("a b")-1) = 4 -> frac 0.8
    val m = run(Seq(1L -> "a b a b a"))
    val r = m(1L)
    assert(r.getAs[Int]("n_words") === 5)
    assert(r.getAs[Int]("n_distinct_words") === 2L)
    assert(r.getAs[Double]("dup_word_frac") === (1.0 - 2.0 / 5.0))
    assert(r.getAs[String]("top_bigram") === "a b")
    assert(r.getAs[Int]("top_bigram_cnt") === 2L)
    assert(r.getAs[Double]("top_bigram_char_frac") === 4.0 / 5.0)
  }

  test("all-unique doc has zero dup fraction and cnt-1 bigram") {
    val m = run(Seq(2L -> "alpha beta gamma"))
    val r = m(2L)
    assert(r.getAs[Double]("dup_word_frac") === 0.0)
    assert(r.getAs[Int]("top_bigram_cnt") === 1)
    assert(r.getAs[String]("top_bigram") === "alpha beta")
  }

  test("degenerate docs: one word and empty text") {
    val m = run(Seq(3L -> "solo", 4L -> "   "))
    assert(m(3L).getAs[Int]("n_words") === 1)
    assert(m(3L).getAs[Int]("top_bigram_cnt") === 0L)
    assert(m(3L).isNullAt(m(3L).fieldIndex("top_bigram")))
    assert(m(3L).isNullAt(m(3L).fieldIndex("top_bigram_char_frac")))
    assert(m(4L).getAs[Int]("n_words") === 0L)
    assert(m(4L).isNullAt(m(4L).fieldIndex("dup_word_frac")))
  }

  test("dup n-grams: hand-computed top/dup char fractions for n=2..4") {
    // words: a b a b a b (nonspace = 6)
    // 2-grams: "a b" x3, "b a" x2 -> top cnt 3, frac 3*2/6 = 1.0;
    //          dup chars 3*2 + 2*2 = 10 -> 10/6
    // 3-grams: "a b a" x2, "b a b" x2 -> tie, smallest wins; 2*3/6 = 1.0;
    //          dup 2*3 + 2*3 = 12 -> 2.0
    // 4-grams: "a b a b" x2, "b a b a" x1 -> top 2*4/6; dup 8 -> 8/6
    val df = Repetition.dupNgramsQuery(
        Seq((1L, "a b a b a b"), (2L, "")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = df(1L)
    assert(r1.getAs[Long]("top_2gram_cnt") === 3L)
    assert(r1.getAs[Double]("top_2gram_char_frac") === 6.0 / 6.0)
    assert(r1.getAs[Long]("dup_2gram_chars") === 10L)
    assert(r1.getAs[Double]("dup_2gram_char_frac") === 10.0 / 6.0)
    assert(r1.getAs[Long]("top_3gram_cnt") === 2L)
    assert(r1.getAs[Double]("top_3gram_char_frac") === 6.0 / 6.0)
    assert(r1.getAs[Long]("dup_3gram_chars") === 12L)
    assert(r1.getAs[Double]("dup_3gram_char_frac") === 12.0 / 6.0)
    assert(r1.getAs[Long]("top_4gram_cnt") === 2L)
    assert(r1.getAs[Double]("top_4gram_char_frac") === 8.0 / 6.0)
    assert(r1.getAs[Long]("dup_4gram_chars") === 8L)
    assert(r1.getAs[Double]("dup_4gram_char_frac") === 8.0 / 6.0)
    val r2 = df(2L) // empty doc: zero counts, NULL fractions
    assert(r2.getAs[Long]("top_2gram_cnt") === 0L)
    assert(r2.isNullAt(r2.fieldIndex("top_2gram_char_frac")))
    assert(r2.getAs[Long]("dup_4gram_chars") === 0L)
    assert(r2.isNullAt(r2.fieldIndex("dup_4gram_char_frac")))
  }

  test("interval-merged dup n-grams are bounded by 1 on the fixture the " +
      "occurrence-weighted ratio exceeds it, and partial coverage merges") {
    // "a b a b a b": every word is covered by a duplicated n-gram at
    // every n -> merged chars = nonspace = 6, frac exactly 1.0 (where
    // the occurrence-weighted ratio read 10/6 and 2.0).
    // "x a b a b y zz": dup 2-grams {"a b" x2, "b a" — no, "b a" occurs
    // once}: occurrences of "a b" at words (1,2) and (3,4) -> covered
    // words {a,b,a,b} = 4 chars; x, y, zz uncovered -> 4/8.
    val df = Repetition.dupNgramsMergedQuery(
        Seq((1L, "a b a b a b"), (2L, "x a b a b y zz"), (3L, "")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = df(1L)
    assert(r1.getAs[Long]("dup_2gram_chars_merged") === 6L)
    assert(r1.getAs[Double]("dup_2gram_char_frac_merged") === 1.0)
    assert(r1.getAs[Long]("dup_3gram_chars_merged") === 6L)
    assert(r1.getAs[Double]("dup_3gram_char_frac_merged") === 1.0)
    assert(r1.getAs[Long]("dup_4gram_chars_merged") === 6L)
    assert(r1.getAs[Double]("dup_4gram_char_frac_merged") === 1.0)
    val r2 = df(2L)
    assert(r2.getAs[Long]("dup_2gram_chars_merged") === 4L)
    assert(r2.getAs[Double]("dup_2gram_char_frac_merged") === 4.0 / 8.0)
    assert(r2.getAs[Long]("dup_3gram_chars_merged") === 0L)
    val r3 = df(3L)
    assert(r3.getAs[Long]("dup_2gram_chars_merged") === 0L)
    assert(r3.isNullAt(r3.fieldIndex("dup_2gram_char_frac_merged")))
  }

  test("corpus top bigrams ranks by count then bigram") {
    val df = Seq(1L -> "x y x y z", 2L -> "x y q", 3L -> "a b").toDF("doc_id", "text")
    // "x y": 3 (doc1 twice, doc2 once); "y x": 1; ...
    val rows = Repetition.topBigramsQuery(df, k = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(rows.head === ("x y" -> 3L))
    assert(rows(1) === ("a b" -> 1L)) // count-1 ties break lexicographically
    assert(rows.length === 3L)
  }

  test("doc commonness averages corpus frequency over doc words") {
    // corpus: "a" x2, "b" x2, "c" x1
    // doc1 = "a b a": n=3, total = 2*2 + 1*2 = 6, avg = 2.0
    // doc2 = "b c":   n=2, total = 2 + 1 = 3,     avg = 1.5
    val df = Seq(1L -> "a b a", 2L -> "b c").toDF("doc_id", "text")
    val m = Repetition.commonnessQuery(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(m(1L) === ((3L, 6L, 2.0)))
    assert(m(2L) === ((2L, 3L, 1.5)))
  }

  test("gopher duplicate-line signals: run-length char sum matches hand count") {
    // lines: nav, body one, nav, body two, nav -> 5 lines, 3 distinct
    // dup chars: 'nav' x3 = 9; total = 3+8+3+8+3 = 25
    val d = Seq(
      (1L, "nav\nbody one\nnav\nbody two\nnav"),
      (2L, "all\nunique\nlines"),
      (3L, "")).toDF("doc_id", "text")
    val m = Repetition.gopherLinesQuery(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = m(1L)
    assert(r1.getLong(1) === 5L && r1.getLong(2) === 3L)
    assert(r1.getAs[Double]("dup_line_frac") === (1.0 - 3.0 / 5.0))
    assert(r1.getAs[Long]("dup_line_chars") === 9L)
    assert(r1.getAs[Long]("total_line_chars") === 25L)
    assert(r1.getAs[Double]("dup_line_char_frac") === 9.0 / 25.0)
    val r2 = m(2L)
    assert(r2.getAs[Long]("dup_line_chars") === 0L)
    assert(r2.getAs[Double]("dup_line_frac") === 0.0)
    // empty text: one empty line, zero chars -> NULL char fraction
    val r3 = m(3L)
    assert(r3.getLong(1) === 1L)
    assert(r3.isNullAt(r3.fieldIndex("dup_line_char_frac")))
  }

  test("strict-first tiebreak: later equal run never replaces the arg") {
    // bigrams sorted: "b c","b c","z z","z z" — equal maxima; first wins.
    // words: b c b c z z z? Construct: "z z z b c b c" ->
    // bigrams: z z, z z, z b, b c, c b, b c -> "b c":2, "z z":2 -> "b c"
    val m = run(Seq(5L -> "z z z b c b c"))
    assert(m(5L).getAs[String]("top_bigram") === "b c")
    assert(m(5L).getAs[Int]("top_bigram_cnt") === 2L)
  }
}

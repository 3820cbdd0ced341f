package graft

import graft.pipeline.Contamination

/** Goldens for benchmark n-gram decontamination. */
class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  test("training docs sharing a 5-gram with a benchmark doc are flagged") {
    val bench = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      1L -> bench, // benchmark (id < 10)
      // shares "alpha beta gamma delta epsilon" + "beta gamma delta epsilon zeta"
      20L -> ("prefix " + bench),
      // shares nothing 5 words long
      21L -> "alpha beta gamma NOPE delta epsilon zeta",
      // too short for any 5-gram
      22L -> "alpha beta").toDF("doc_id", "text")
    val m = Contamination.contaminationQuery(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m === Map(20L -> 2L))
  }

  test("fuzzy decontamination: a paraphrase with NO shared 5-gram is " +
      "caught by trigram jaccard; a stray shared phrase is below threshold") {
    // benchmark item, and a paraphrase with every 4th word changed: no 5
    // consecutive words survive (the exact tier is provably blind) but
    // the unedited trigram windows do (the fuzzy tier fires).
    val bench = "the quick brown fox jumps over the lazy dog near a misty river bank today " +
      "while seven wizards brew quartz potions under pale winter light"
    val words = bench.split(" ")
    val edited = words.zipWithIndex
      .map { case (w, i) => if (i % 4 == 3) w + "ish" else w }.mkString(" ")
    val docs = Seq(
      1L -> bench,
      20L -> edited,
      // shares exactly the one 3-word phrase -> present, below threshold
      21L -> ("unrelated report about tax season filings mentioning quartz potions under " +
        "regulations and many other unrelated administrative things all around"),
      22L -> "completely different text about oranges apples and long cold evenings"
    ).toDF("doc_id", "text")
    // exact tier: every 5-gram window of the paraphrase contains an edit
    assert(Contamination.contaminationQuery(docs).collect().map(_.getLong(0)).toSet
      === Set.empty[Long])
    val fuzzy = Contamination.fuzzyContaminationQuery(docs).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(fuzzy.keySet === Set(20L, 21L)) // doc 22 shares no trigram at all
    // local brute-force jaccard over distinct lowercased trigrams
    def tris(t: String) = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      .sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    def jac(a: String, b: String) = {
      val (x, y) = (tris(a), tris(b))
      (x & y).size.toDouble / (x | y).size.toDouble
    }
    assert(fuzzy(20L)._1 === jac(bench, edited))
    assert(fuzzy(20L)._2, s"paraphrase should clear the threshold: ${fuzzy(20L)._1}")
    assert(!fuzzy(21L)._2, s"one stray phrase should not: ${fuzzy(21L)._1}")
  }

  test("repeated grams inside one doc count once (distinct per doc)") {
    val g = "a b c d e"
    val docs = Seq(1L -> g, 30L -> (g + " " + g)).toDF("doc_id", "text")
    // doc 30's words: a b c d e a b c d e -> the gram "a b c d e" occurs
    // at positions 1 and 6 but counts once; the bridging grams
    // (e.g. "d e a b c") are not in the benchmark.
    val m = Contamination.contaminationQuery(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m === Map(30L -> 1L))
  }
}

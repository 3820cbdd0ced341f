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

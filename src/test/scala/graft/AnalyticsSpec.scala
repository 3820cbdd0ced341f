package graft

import graft.pipeline.Analytics

/** Readability metric goldens (the aggregate analytics queries are
  * oracle-arbitrated; this pins the per-doc counting semantics). */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("flesch: hand-computed counts and score") {
    // sentences: '.', '!' runs = 2; words = 6;
    // vowel groups: Th[e] c[a]t s[a]t Th[e] d[o]g r[a]n = 6
    val d = docs(1L -> "The cat sat. The dog ran!")
    val r = Analytics.readabilityQuery(d).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((2L, 6L, 6L)))
    assert(r.getDouble(4) === 206.835 - 1.015 * 3.0 - 84.6 * 1.0)
  }

  test("flesch: ellipsis is ONE run; unterminated prose = 1 sentence; blank drops") {
    val d = docs(
      1L -> "wait... what?", // runs: '...' and '?' = 2 sentences
      2L -> "no terminal punctuation here", // fallback: 1 sentence
      3L -> "   ")
    val m = Analytics.readabilityQuery(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m === Map(1L -> 2L, 2L -> 1L))
  }
}

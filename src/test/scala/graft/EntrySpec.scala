package graft

/** The driver's t1 smoke contract: entry() returns rows at sf0.001. */
class EntrySpec extends SparkSpec {
  test("flagship entry query returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSet == Set("lang", "reason", "n_docs"))
  }

  test("every registered query has either an oracle or a documented rows-only check") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o.diff(q)}")
    val rowsOnly = q.diff(o)
    // rows-only by nature: HLL sketch (exact columns hash-checked via
    // r_distinct_users_exact) and the learned BPE/WordPiece/unigram
    // vocabularies (not SQL-derivable; pinned by spec goldens).
    assert(rowsOnly == Set("r_approx_distinct_users", "tok_bpe_stats",
      "tok_unigram_stats", "tok_wordpiece_stats"), rowsOnly.toString)
  }
}

package graft

import graft.pipeline.Dedup

/** Mirrors reference tests/test_pipeline.py:107-124
  * (TestExactHashDeduplicator): first-seen wins, case-insensitive. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("exact duplicate: first-seen (lowest id) wins") {
    val d = docs(3L -> "same text here", 1L -> "same text here", 2L -> "different")
    val kept = Dedup.exactDedup(d).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("case-insensitive and edge-whitespace-insensitive hashing") {
    val d = docs(1L -> "Hello World", 2L -> "  hello world  ", 3L -> "HELLO WORLD")
    val kept = Dedup.exactDedup(d).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("dupmap attributes duplicates to the first-seen original") {
    val d = docs(1L -> "aaa", 2L -> "bbb", 3L -> "AAA", 4L -> "aaa")
    val m = Dedup.exactDuplicateOf(d).as[(Long, Long)].collect().toSet
    assert(m == Set((3L, 1L), (4L, 1L)))
  }

  test("stats: totals, uniques, duplicates") {
    val d = docs(1L -> "a a", 2L -> "b", 3L -> "A A")
    val row = Dedup.exactStatsQuery(d).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((3L, 2L, 1L)))
  }

  test("interior whitespace differences are NOT collapsed (strip is edges-only)") {
    val d = docs(1L -> "a  b", 2L -> "a b")
    assert(Dedup.exactDedup(d).count() == 2L)
  }

  test("line dedup drops cross-doc boilerplate lines, keeps order") {
    // "FOOTER" appears in docs 1 and 2 (distinct docs) -> dropped from
    // both; the doubled "body one" inside doc 1 is WITHIN one doc ->
    // kept (df counts distinct docs, not occurrences).
    val d = docs(
      1L -> "body one\nFOOTER\nbody one\nbody two",
      2L -> "other text\nFOOTER",
      3L -> "standalone")
    val m = Dedup.lineDedupQuery(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(m(1L) === ((4L, 3L, "body one\nbody one\nbody two")))
    assert(m(2L) === ((2L, 1L, "other text")))
    assert(m(3L) === ((1L, 1L, "standalone")))
  }

  test("line dedup: a doc whose every line is boilerplate keeps empty text") {
    val d = docs(1L -> "X", 2L -> "X", 3L -> "y")
    val m = Dedup.lineDedupQuery(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(m(1L) === ((0L, "")))
    assert(m(2L) === ((0L, "")))
    assert(m(3L) === ((1L, "y")))
  }

  test("bloom incremental dedup: known duplicates never survive; new docs pass") {
    val corpus = docs((1L to 200L).map(i => i -> s"corpus document number $i with its own words"): _*)
    val batch = docs(
      1001L -> "corpus document number 7 with its own words", // exact known dup
      1002L -> "  CORPUS document number 7 with its own words  ", // case/edge-ws variant
      1003L -> "a genuinely new document that the corpus has never seen",
      1004L -> "another brand new document with fresh content entirely")
    val kept = Dedup.bloomNewDocs(batch, corpus).select("doc_id").as[Long].collect().toSet
    // no false negatives: both known-content rows are gone, guaranteed
    assert(!kept.contains(1001L) && !kept.contains(1002L))
    // fpp = 0.1% over 2 new docs: pass outside astronomically-unlucky seeds
    assert(kept == Set(1003L, 1004L))
  }

  test("paragraph dedup drops a copied passage whole, even with internal line breaks") {
    // the shared PASSAGE contains a '\n' — line-level dedup would split
    // it into two lines; paragraph-level treats it as one unit
    val passage = "copied first line\nstill the same passage"
    val d = docs(
      1L -> s"own intro\n\n$passage\n\nown outro",
      2L -> s"different start\n\n$passage",
      3L -> "standalone doc")
    val m = Dedup.paragraphDedupQuery(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(m(1L) === ((3L, 2L, "own intro\n\nown outro")))
    assert(m(2L) === ((2L, 1L, "different start")))
    assert(m(3L) === ((1L, 1L, "standalone doc")))
  }

  test("substring dedup flags cross-doc AND within-doc repeated windows") {
    // docs 1 and 2 share their first 100 chars (one shared window each);
    // doc 4 is one char repeated -> every window duplicates every other;
    // doc 3 is too short to window; doc 5 is unique -> absent from output.
    val d = docs(
      1L -> ("A" * 100 + "1" * 50),
      2L -> ("A" * 100 + "2" * 50),
      3L -> ("z" * 99),
      4L -> ("B" * 300),
      5L -> ("uvwxy" * 20))
    val m = Dedup.substringDupQuery(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m === Map(1L -> ((2L, 1L)), 2L -> ((2L, 1L)), 4L -> ((5L, 5L))))
  }

  test("substring corpus stats count windows and duplication clusters") {
    val d = docs(
      1L -> ("A" * 100 + "1" * 50),
      2L -> ("A" * 100 + "2" * 50),
      4L -> ("B" * 300),
      5L -> ("uvwxy" * 20))
    val r = Dedup.substringStatsQuery(d).collect().head
    // spans: d1 {A100, A50+1s}, d2 {A100, A50+2s}, d4 {B100 x5}, d5 {u100}
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((10L, 5L, 2L, 7L)))
  }
}

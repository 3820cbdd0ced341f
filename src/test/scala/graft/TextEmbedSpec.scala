package graft

import graft.pipeline.TextEmbed

/** Hashed-BoW semantic dedup: the property the shingle family cannot
  * provide — word REORDERING preserves the vector, so shuffled
  * near-copies still pair — plus the do-not-pair side. */
class TextEmbedSpec extends SparkSpec {
  import spark.implicits._

  test("reordered text pairs as a semantic duplicate; distinct text does not") {
    val words = ("the quick brown fox jumps over a lazy dog while many " +
      "other animals watch from the forest edge near the river").split(" ")
    val orig = words.mkString(" ")
    // same multiset, different order -> identical hashed vector
    val shuffled = new scala.util.Random(7).shuffle(words.toSeq).mkString(" ")
    // one word swapped -> high but not perfect cosine
    val nearDup = orig.replace("river", "stream")
    val other = "completely different content about spark catalyst plans " +
      "and shuffle exchanges with partitions and codegen stages everywhere"
    val docs = Seq((1L, orig), (2L, shuffled), (3L, nearDup), (20L, other))
      .toDF("doc_id", "text")
    val dup = TextEmbed.semanticDedupQuery(docs).as[(Long, Long)].collect().toMap
    assert(dup.get(2L).contains(1L), s"shuffled copy not attributed: $dup")
    assert(dup.get(3L).contains(1L), s"one-word variant not attributed: $dup")
    assert(!dup.contains(20L), s"unrelated doc falsely paired: $dup")
  }

  test("hashed embedding is a deterministic (doc, dim, count) relation") {
    val docs = Seq((1L, "alpha beta alpha")).toDF("doc_id", "text")
    val rows = TextEmbed.hashEmbeddingQuery(docs)
      .as[(Long, Long, Long)].collect().toSet
    assert(rows.map(_._3).sum == 3) // three tokens, counts preserved
    assert(rows.forall { case (_, dim, _) => dim >= 0 && dim < TextEmbed.Dim })
    val again = TextEmbed.hashEmbeddingQuery(docs)
      .as[(Long, Long, Long)].collect().toSet
    assert(rows == again)
  }
}

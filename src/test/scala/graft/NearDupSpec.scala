package graft

import graft.pipeline.NearDup
import graft.relational.Similarity

/** SimHash, n-gram Jaccard, winnowing fingerprints, embedding near-dup. */
class NearDupSpec extends SparkSpec {
  import spark.implicits._

  private val longA =
    "the quick brown fox jumps over the lazy dog while the sun sets slowly " +
      "behind the distant mountains and the river flows quietly through the valley"
  private val longB = longA.replace("jumps", "leaps")
  private val other =
    "completely different content about databases indexes partitions shuffles " +
      "aggregations joins windows and the rest of the relational algebra zoo"

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("simhash: identical and near-identical docs attribute to lowest id") {
    val dup = NearDup.simhashDuplicateOf(docs(1L -> longA, 2L -> longA, 3L -> longB, 4L -> other))
      .as[(Long, Long)].collect().toSet
    assert(dup.contains((2L, 1L)))
    assert(dup.contains((3L, 1L))) // one-word edit flips < 4 of 32 bits
    assert(!dup.exists(_._1 == 4L))
  }

  test("simhash is deterministic and order-of-magnitude separated") {
    assert(NearDup.simHash(longA) == NearDup.simHash(longA))
    val d = java.lang.Long.bitCount(NearDup.simHash(longA) ^ NearDup.simHash(other))
    assert(d > NearDup.MaxHamming)
  }

  test("trigram jaccard: near-dup detected, distinct kept, short docs never join") {
    val dup = NearDup.jaccardDuplicateOf(
        docs(1L -> longA, 2L -> longB, 3L -> other, 4L -> "two words"))
      .as[(Long, Long)].collect().toSet
    assert(dup == Set((2L, 1L)))
  }

  test("fingerprints: deterministic scalars, identical docs agree, distinct differ") {
    val fp = NearDup.fingerprintQuery(docs(1L -> longA, 2L -> longA, 3L -> other))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
    assert(fp(1L)._1 > 0)
  }

  test("embedding near-dup: planted near-identical vectors detected, others kept") {
    val base = Array.tabulate(Similarity.Dim)(i => math.sin(i + 1).toFloat)
    val nearDup = base.clone(); nearDup(0) = base(0) + 0.001f
    val far = Array.tabulate(Similarity.Dim)(i => math.cos(3 * i + 2).toFloat)
    val emb = Seq((10L, base, 0), (20L, nearDup, 0), (30L, far, 1))
      .toDF("vec_id", "embedding", "label")
    val dup = Similarity.embedDedup(emb).as[(Long, Long)].collect().toSet
    assert(dup == Set((20L, 10L)))
  }
}

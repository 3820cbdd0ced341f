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

  /** The SQL oracle mirrors the sign-LSH blocking, so a blocking bug
    * (wrong plane math, lost candidate pairs, bad member expansion)
    * would agree with the oracle and slip through. This property checks
    * the dedup stage against TRUE cosine over the actual embeddings,
    * brute-force, with no blocking in the loop:
    *  - soundness: every reported (dup, orig) pair really has
    *    cosine >= 0.9 and orig < dup;
    *  - collapse completeness: byte-identical vectors are ALWAYS
    *    attributed to their group minimum (blocking-independent by
    *    construction — the one recall guarantee the operator makes). */
  test("random corpora: reported pairs are true near-dups; identical vectors always collapse") {
    for (seed <- Seq(11, 42, 97)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
        "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron")
      def doc(): String =
        Seq.fill(12 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val bases = (0 until 12).map(i => (i * 10L, doc()))
      val variants = bases.flatMap { case (id, text) =>
        val words = text.split(" ").toSeq
        val shuffled = rnd.shuffle(words).mkString(" ")
        val edited = (vocab(rnd.nextInt(vocab.size)) +: words.tail).mkString(" ")
        Seq((id + 1L, shuffled), (id + 2L, edited))
      }
      val docs = (bases ++ variants).toDF("doc_id", "text")
      val vecs = TextEmbed.hashEmbeddingQuery(docs)
        .as[(Long, Long, Long)].collect()
        .groupBy(_._1).map { case (id, rows) =>
          id -> rows.map(r => r._2 -> r._3).toMap
        }
      def cosine(a: Map[Long, Long], b: Map[Long, Long]): Double = {
        val dot = a.keysIterator.map(k => a(k) * b.getOrElse(k, 0L)).sum
        val na = a.valuesIterator.map(v => v * v).sum
        val nb = b.valuesIterator.map(v => v * v).sum
        dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
      }
      val dup = TextEmbed.semanticDedupQuery(docs).as[(Long, Long)].collect().toMap
      for ((d, o) <- dup) {
        assert(o < d, s"seed=$seed: original $o not below duplicate $d")
        assert(cosine(vecs(d), vecs(o)) >= 0.9,
          s"seed=$seed: reported pair ($d, $o) has cosine ${cosine(vecs(d), vecs(o))}")
      }
      val byVec = vecs.toSeq.groupBy(_._2).values.filter(_.size > 1)
      for (group <- byVec; gmin = group.map(_._1).min; (id, _) <- group if id != gmin)
        assert(dup.contains(id) && dup(id) <= gmin,
          s"seed=$seed: identical-vector doc $id not attributed at or below group min $gmin (got ${dup.get(id)})")
    }
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

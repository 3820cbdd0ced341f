package graft

import graft.relational.Similarity

/** Randomized soundness for the float-embedding dedup family. The SQL
  * oracles mirror the blocking (sign-LSH buckets, multi-probe, IVF
  * cells), so a blocking bug would agree with the oracle and pass the
  * gate. These properties check reported pairs against TRUE cosine
  * computed brute-force in plain Scala, with no blocking in the loop:
  *   - soundness: every reported (duplicate, original) pair really has
  *     cosine >= the threshold, and original < duplicate;
  *   - collapse completeness: byte-identical vectors always attribute
  *     to their group minimum (the one blocking-independent recall
  *     guarantee all three operators make, via the identical-vector
  *     collapse that runs before any bucketing).
  */
class SimilarityPropertySpec extends SparkSpec {
  import spark.implicits._

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private val dedupOps: Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)] = Seq(
    "embedDedup" -> (df => Similarity.embedDedup(df)),
    "embedDedupMultiProbe" -> (df => Similarity.embedDedupMultiProbe(df)),
    "semDedup" -> (df => Similarity.semDedup(df)))

  test("memoized IVF index serves the same rows as an ad-hoc per-query build") {
    // The three sim_ivf* registered queries read the shared ivfIndexFor
    // memo (one cell-assign + PQ-encode scan, localCheckpointed) while
    // the public emb-based entry points build a fresh index per call.
    // Same arithmetic, same rows — this pins the memo path against the
    // ad-hoc path so a stale/mis-keyed memo would fail loudly.
    val d = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, d)
    val served = Seq(
      Similarity.queries("sim_ivf_topk")(spark, d),
      Similarity.queries("sim_ivfpq_topk")(spark, d),
      Similarity.queries("sim_ivfpq_rerank")(spark, d))
    val adHoc = Seq(
      Similarity.ivfTopK(emb),
      Similarity.ivfPqTopK(emb),
      Similarity.ivfPqRerank(emb))
    for (((s, a), i) <- served.zip(adHoc).zipWithIndex) {
      val sr = s.collect().map(_.toSeq).sortBy(_.toString)
      val ar = a.collect().map(_.toSeq).sortBy(_.toString)
      assert(sr.toSeq == ar.toSeq, s"memoized vs ad-hoc mismatch for query #$i")
    }
  }

  for (seed <- Seq(5, 31)) {
    test(s"embedding dedup family: sound pairs, identical vectors always collapse (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      def vec(): Array[Float] = Array.fill(Similarity.Dim)(rnd.nextGaussian().toFloat)
      val rows = (0 until 18).flatMap { i =>
        val id = i * 10L
        val base = vec()
        i % 3 match {
          case 0 => // exact copy: must ALWAYS be attributed (collapse)
            Seq((id, base, 0L), (id + 1L, base.clone(), 0L))
          case 1 => // near-copy at cosine ~0.999: may pair, must be sound
            val near = base.map(x => x + rnd.nextGaussian().toFloat * 0.01f)
            Seq((id, base, 0L), (id + 1L, near, 0L))
          case _ => // unrelated
            Seq((id, base, 0L))
        }
      }
      val byId = rows.map(r => r._1 -> r._2).toMap
      val emb = rows.toDF("vec_id", "embedding", "label")
      val exactGroups = rows.groupBy(_._2.toSeq).values.filter(_.size > 1)
        .map(_.map(_._1).sorted).toSeq
      for ((name, op) <- dedupOps) {
        val dup = op(emb).as[(Long, Long)].collect().toMap
        for ((d, o) <- dup) {
          assert(o < d, s"$name seed=$seed: original $o not below duplicate $d")
          val c = cosine(byId(d), byId(o))
          assert(c >= Similarity.DedupCosine - 1e-9,
            s"$name seed=$seed: reported pair ($d, $o) has true cosine $c")
        }
        for (g <- exactGroups; id <- g.tail)
          assert(dup.contains(id) && dup(id) <= g.head,
            s"$name seed=$seed: identical vector $id not attributed at or below ${g.head} (got ${dup.get(id)})")
      }
    }
  }
}

package graft

import graft.relational.Similarity

/** Pins the fused native IVF encode kernel (round 11 promotion of the
  * cell-assign/PQ-encode UDFs) against an independent naive spelling:
  * full-dim L2 argmin over the id-sorted codebook (ties → lowest id)
  * and per-subspace L2 argmin over each centroid's slice (ties → lowest
  * index) — the exact contract the DuckDB oracles arbitrate at the gate. */
class IvfKernelSpec extends SparkSpec {
  import spark.implicits._

  private val dim = Similarity.Dim

  test("fused IVF encode kernel matches the independent argmin spelling " +
      "(cells and PQ codes, including tie order)") {
    val rnd = new scala.util.Random(5)
    val rows = (0L until 300L).map(i =>
      (i, s"l$i", Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
    val emb = rows.toDF("vec_id", "label", "embedding")
    val ix = Similarity.buildIvfIndex(emb)
    val got = ix.coded.select("vec_id", "cell", "codes").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getSeq[Int](2).toVector))).toMap
    val subDim = dim / Similarity.PqSub
    for ((id, _, e) <- rows) {
      val scored = ix.cents.map { case (cid, c) =>
        ((0 until dim).foldLeft(0.0) { (s, j) =>
          val d = e(j).toDouble - c(j); s + d * d
        }, cid)
      }
      val cell = scored.min._2
      val codes = (0 until Similarity.PqSub).map { m =>
        ix.cents.map(_._2).zipWithIndex.map { case (c, i) =>
          ((0 until subDim).foldLeft(0.0) { (s, j) =>
            val d = e(m * subDim + j).toDouble - c(m * subDim + j); s + d * d
          }, i)
        }.min._2
      }.toVector
      assert(got(id) === ((cell, codes)), s"vec $id")
    }
  }

  test("a duplicated vector encodes identically to its twin (pure function " +
      "of the value) and IvfCell agrees with IvfEncode's cell") {
    val rnd = new scala.util.Random(9)
    val v = Array.fill(dim)(rnd.nextFloat())
    val rows = (0L until 64L).map { i =>
      val e = if (i == 0L) v else if (i == 63L) v.clone() else Array.fill(dim)(rnd.nextFloat())
      (i, s"l$i", e)
    }
    val emb = rows.toDF("vec_id", "label", "embedding")
    val ix = Similarity.buildIvfIndex(emb)
    val m = ix.coded.select("vec_id", "cell", "codes").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getSeq[Int](2).toVector))).toMap
    assert(m(0L) === m(63L))
    import org.apache.spark.sql.functions.col
    val cellsViaCell = emb
      .select(col("vec_id"), graft.functions.IvfCell(col("embedding"), ix.cents).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, (cell, _)) <- m) assert(cellsViaCell(id) === cell, s"vec $id")
  }
}

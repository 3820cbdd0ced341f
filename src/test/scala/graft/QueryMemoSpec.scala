package graft

import graft.pipeline.{MinHash, QueryMemo}

/** The shared per-directory memo: rep-graph sharing across the minhash
  * family and data-fingerprint invalidation on in-place regeneration. */
class QueryMemoSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit =
    rows.toDF("doc_id", "text")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("repGraphFor is memoized: second call returns the same frames") {
    val dir = java.nio.file.Files.createTempDirectory("graft-memo-a").toString
    writeDocs(dir, Seq(0L -> "alpha beta gamma delta epsilon zeta eta theta",
      1L -> "alpha beta gamma delta epsilon zeta eta theta"))
    val first = MinHash.repGraphFor(spark, dir)
    val second = MinHash.repGraphFor(spark, dir)
    assert(first._1 eq second._1)
    assert(first._2 eq second._2)
  }

  test("dupsFor is invalidated when the table directory is regenerated " +
      "in place (data fingerprint in the memo key)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-memo-b").toString
    val dupText = "the quick brown fox jumps over the lazy dog again and again today"
    writeDocs(dir, Seq(0L -> dupText, 1L -> dupText))
    assert(MinHash.dupsFor(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 0L)))
    // regenerate IN PLACE with a duplicate-free corpus; mtime/len change
    writeDocs(dir, Seq(
      0L -> "completely different first document with its own words here",
      1L -> "and a second one that shares essentially nothing at all with it"))
    assert(MinHash.dupsFor(spark, dir).count() === 0L,
      "stale memo served: dupmap reflects the overwritten corpus")
  }

  test("fingerprint is deterministic and sensitive to content changes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-memo-c").toString
    writeDocs(dir, Seq(0L -> "one two three four five"))
    val f1 = QueryMemo.fingerprint(spark, dir)
    assert(f1 === QueryMemo.fingerprint(spark, dir))
    Thread.sleep(1100) // parquet mtime granularity can be 1 s
    writeDocs(dir, Seq(0L -> "six seven eight nine ten eleven"))
    assert(f1 !== QueryMemo.fingerprint(spark, dir))
  }

  test("gram scratch cache: in-place regeneration leaves exactly one " +
      "generation on disk (superseded fingerprints are GC'd)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-memo-g").toString
    val key = f"${scala.util.hashing.MurmurHash3.stringHash(dir)}%08x"
    def gens: Seq[java.io.File] =
      Option(new java.io.File(sys.props("java.io.tmpdir")).listFiles())
        .getOrElse(Array.empty)
        .filter(_.getName.startsWith(s"graft_grams_${key}_")).toSeq
    writeDocs(dir, Seq(0L -> "one two three four five"))
    graft.pipeline.Grams.gramsFor(spark, dir).count()
    assert(gens.map(_.getName).size === 1)
    val g1 = gens.head.getName
    assert(new java.io.File(gens.head, "_SUCCESS").exists(),
      "generation must be installed complete (atomic rename)")
    Thread.sleep(1100) // parquet mtime granularity can be 1 s
    writeDocs(dir, Seq(0L -> "six seven eight nine ten eleven"))
    graft.pipeline.Grams.gramsFor(spark, dir).count()
    assert(gens.map(_.getName).size === 1,
      "stale generation not GC'd on regeneration")
    assert(gens.head.getName !== g1, "new fingerprint must get a new dir")
  }

  test("gram scratch rides the reliable substrate: with a checkpoint dir " +
      "configured the parquet generation lands UNDER it (shared storage " +
      "every executor can read), not in the machine-local tmpdir") {
    val dir = java.nio.file.Files.createTempDirectory("graft-memo-h").toString
    writeDocs(dir, Seq(0L -> "one two three four five six seven"))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-memo-h-ckpt")
    spark.sparkContext.setCheckpointDir(ckpt.toString)
    try {
      assert(graft.pipeline.Grams.gramsFor(spark, dir).count() === 1L)
      val key = f"${scala.util.hashing.MurmurHash3.stringHash(dir)}%08x"
      val underCkpt = scala.util.Using.resource(java.nio.file.Files.walk(ckpt)) { st =>
        import scala.jdk.CollectionConverters._
        st.iterator().asScala
          .filter(_.getFileName.toString.startsWith(s"graft_grams_${key}_")).toList
      }
      assert(underCkpt.nonEmpty,
        s"scratch generation must live under the checkpoint dir $ckpt")
      assert(java.nio.file.Files.exists(underCkpt.head.resolve("_SUCCESS")))
      val inTmp = Option(new java.io.File(sys.props("java.io.tmpdir")).listFiles())
        .getOrElse(Array.empty)
        .filter(_.getName.startsWith(s"graft_grams_${key}_"))
      assert(inTmp.isEmpty, "must NOT also write the machine-local tmpdir")
    } finally {
      org.apache.spark.GraftTestHooks.clearCheckpointDir(spark.sparkContext)
      scala.util.Using.resource(java.nio.file.Files.walk(ckpt)) { st =>
        import scala.jdk.CollectionConverters._
        st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala.foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
  }

  test("scratch install race: a loser renaming onto a complete winner " +
      "is discarded, never nested inside the winner's generation " +
      "(Hadoop rename onto an existing dir MOVES INTO it)") {
    import org.apache.hadoop.fs.Path
    val root = java.nio.file.Files.createTempDirectory("graft-memo-race")
    val fs = new Path("file:" + root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def mkGen(name: String): Path = {
      val p = new Path("file:" + root, name)
      fs.mkdirs(p)
      fs.create(new Path(p, "part-0.parquet")).close()
      fs.create(new Path(p, "_SUCCESS")).close()
      p
    }
    val target = mkGen("graft_x_k_f") // the winner, installed complete
    val tmp = mkGen("graft_x_k_f.tmp-999-aa") // the loser's complete temp
    graft.pipeline.ScratchCache.install(fs, tmp, target)
    assert(!fs.exists(tmp), "loser temp must be discarded")
    assert(fs.exists(new Path(target, "_SUCCESS")))
    assert(!fs.exists(new Path(target, tmp.getName)),
      "loser must not nest inside the winner's generation")
    // and the files of the winner are untouched
    assert(fs.exists(new Path(target, "part-0.parquet")))
  }

  test("materialize engages fault-tolerant checkpoint() when a " +
      "checkpoint dir is configured, localCheckpoint otherwise") {
    val df = Seq(1L, 2L, 3L).toDF("v")
    // no dir configured → localCheckpoint (nothing written anywhere)
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
    assert(QueryMemo.materialize(df).count() === 3)
    val dir = java.nio.file.Files.createTempDirectory("graft-memo-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    try {
      val out = QueryMemo.materialize(df)
      assert(out.count() === 3)
      val rddDirs = scala.util.Using.resource(java.nio.file.Files.walk(dir)) { st =>
        import scala.jdk.CollectionConverters._
        st.iterator().asScala
          .filter(_.getFileName.toString.startsWith("rdd-")).toList
      }
      assert(rddDirs.nonEmpty,
        s"reliable mode must write an rdd-<id> checkpoint under $dir")
    } finally {
      org.apache.spark.GraftTestHooks.clearCheckpointDir(spark.sparkContext)
      scala.util.Using.resource(java.nio.file.Files.walk(dir)) { st =>
        import scala.jdk.CollectionConverters._
        st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala.foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
  }
}

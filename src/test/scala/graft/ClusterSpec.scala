package graft

import graft.pipeline.Cluster

/** Connected components: label correctness on chains/stars (the oracle
  * pins CC against WITH RECURSIVE on real data; this pins the algebra on
  * adversarial shapes) and the round-6 requirement that the reliable
  * `checkpoint()` path (checkpoint dir configured) and the local-mode
  * `localCheckpoint()` path produce IDENTICAL labels. */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  private def labelsOf(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Cluster.connectedComponents(pairs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  // A 6-long chain (pointer-jumping needs >1 round), a star, a 2-cycle
  // duplicate edge, and an isolated pair.
  private val graph = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), // chain -> min 1
    (10L, 11L), (10L, 12L), (10L, 13L),               // star  -> min 10
    (20L, 21L), (21L, 20L),                           // dup edge -> min 20
    (30L, 31L))                                       // pair -> min 30
  private val want = Map(
    1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 1L,
    10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
    20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L)

  test("localCheckpoint path: chain/star/cycle label to component minima") {
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
    assert(labelsOf(graph) == want)
  }

  test("keep-best dedup keeps the longest doc per cluster, ties to smallest id") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    val docs = Seq((1L, 100L), (2L, 500L), (3L, 500L), (10L, 50L), (11L, 50L))
      .toDF("doc_id", "n_chars")
    val removals = Cluster.keepBestOf(clusters, docs)
      .as[(Long, Long)].collect().toSet
    // cluster 1: docs 2 and 3 tie at 500 chars -> 2 kept (smaller id);
    // cluster 10: tie at 50 -> 10 kept.
    assert(removals == Set((1L, 2L), (3L, 2L), (11L, 10L)))
  }

  test("cluster histogram: size distribution with doc totals") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L),  // size 3
      (10L, 10L), (11L, 10L),                         // size 2
      (20L, 20L), (21L, 20L))                         // size 2
      .toDF("doc_id", "cluster_id")
    val hist = Cluster.clusterHistogramOf(clusters)
      .as[(Long, Long, Long)].collect().toSet
    assert(hist == Set((3L, 1L, 3L), (2L, 2L, 4L)))
  }

  test("reliable checkpoint() path produces identical labels") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    try assert(labelsOf(graph) == want)
    finally org.apache.spark.GraftTestHooks.clearCheckpointDir(spark.sparkContext)
    // reliable mode really wrote round states to the configured dir
    val wrote = java.nio.file.Files.walk(dir).count() > 1
    assert(wrote, s"no checkpoint data written under $dir")
    // ... and deleted every superseded round's files: only the final
    // round's rdd-<id> checkpoint may remain (round-7 hygiene — a
    // long-lived session must not accumulate one dir per CC round).
    import scala.jdk.CollectionConverters._
    val rddDirs = java.nio.file.Files.walk(dir).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("rdd-")).toList
    assert(rddDirs.size == 1,
      s"expected exactly the final round's checkpoint, found: $rddDirs")
  }

  test("componentsOfPairs: driver union-find matches distributed CC " +
      "(fixture + seeded random graphs)") {
    def driverLabels(pairs: Seq[(Long, Long)]): Map[Long, Long] =
      Cluster.componentsOfPairs(pairs.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
    assert(driverLabels(graph) == want) // fixture, via the driver path
    val rnd = new scala.util.Random(1234)
    for (_ <- 1 to 3) {
      val pairs = Seq.fill(60)(
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }
      assert(driverLabels(pairs) == labelsOf(pairs),
        s"driver UF diverged from distributed CC on $pairs")
    }
  }

  test("componentsOfPairs: empty pair frame yields an empty, " +
      "correctly-typed label frame") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val out = Cluster.componentsOfPairs(empty)
    assert(out.columns.toSeq == Seq("doc_id", "cluster_id"))
    assert(out.count() == 0L)
  }
}

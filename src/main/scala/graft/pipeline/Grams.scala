package graft.pipeline

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared word-trigram relation: `(doc_id, ga)` where `ga` is the doc's
  * DISTINCT lowercased word trigrams ([[graft.functions.Trigrams]], the
  * native codegen'd kernel; zero-gram docs — fewer than 3 words — are
  * dropped, identical on every consumer).
  *
  * Three operator families each re-derived exactly this frame from
  * `text` per query (round-11 verdict finding #2: 6.1 s of
  * `dedup_jaccard_dupmap`'s 14.3 s at the 100x probe was the trigram
  * kernel + gram explode, work also done by `corpus_novelty` and the
  * fuzzy decontamination index build). Like the MinHash rep graph, the
  * relation is a pure function of the corpus — so it is built once per
  * table directory and every consumer starts from the checkpoint:
  *
  *  - [[NearDup.jaccardOverGrams]] (`dedup_jaccard_dupmap`) — the
  *    PPJoin prefix-filter chain's `withG` stage;
  *  - [[Analytics.noveltyOver]] (`corpus_novelty`) — the gram →
  *    first-doc aggregation and the per-doc denominators;
  *  - [[Contamination]]'s fuzzy index build + probe pass
  *    (`decontaminate_fuzzy`, `decontaminate_attribution`).
  *
  * NOT a consumer: `dedup_containment` — its relation is the WINNOWING
  * fingerprint sketch (character k-grams, Schleimer et al. 2003), a
  * deliberately different granularity from word trigrams; no other
  * query shares it, so memoizing it would only pin blocks.
  *
  * Storage: PARQUET on scratch storage, not a localCheckpoint — the one
  * memo deliberately not in the block manager. The relation is the
  * fattest shared frame in the engine (one ~60-entry string array per
  * doc, ~1 GB of heap blocks at the 100x probe), and pinning it
  * evicted the per-query persists under the bench JVM's 8 GiB heap:
  * the checkpointed spelling made `dedup_jaccard_dupmap` SLOWER at
  * 100x (14.4 → 19.8 s, measured) even though its gram stages were
  * served from the memo. Dictionary-encoded snappy parquet holds the
  * same relation at a fraction of the bytes, streams on scan without
  * pinning heap, and is exactly how a production cluster shares a
  * derived relation across jobs (materialize once to scratch
  * HDFS/S3, scan many times). The file is keyed by the directory's
  * data fingerprint, so a regenerated corpus rebuilds it and a
  * same-data session reuses it across process restarts; the LRU memo
  * only caches the (cheap) reader frame.
  *
  * Scratch ROOT (round 16, closing the SCALE.md §15 caveat): when the
  * session has a reliable checkpoint directory configured
  * (`SparkContext.setCheckpointDir` — the same storage contract as
  * [[QueryMemo.materialize]]'s fault-tolerant mode), the scratch
  * parquet lives UNDER that directory, i.e. on storage every executor
  * JVM can read — previously it always went to `java.io.tmpdir`, which
  * on a real cluster is a per-machine local disk, so a multi-node
  * deployment would write task files to different machines' /tmp and
  * fail the read-back. Without a checkpoint dir (local runs, tests),
  * the tmpdir behavior is unchanged. All scratch I/O goes through the
  * Hadoop FileSystem API so both roots run the same code path; the
  * rename-install is atomic on HDFS and local filesystems (object
  * stores without atomic rename share the caveat RDD checkpoints have
  * there anyway).
  *
  * Scratch hygiene (round 13): the cache dir is named
  * `graft_grams_<corpusKey>_<fp>` — `corpusKey` hashes the table
  * DIRECTORY PATH (stable across regenerations), `fp` its data
  * fingerprint (changes on regeneration). A build writes to a
  * process-unique `.tmp-*` sibling and ATOMICALLY renames it into
  * place, so a concurrent JVM either sees the complete generation or
  * none — never a half-written one — and a lost install race simply
  * discards the loser's temp. After install, every OTHER generation
  * of the SAME corpus (same corpusKey, different fp — i.e. superseded
  * data) is deleted, as are orphaned temp dirs older than an hour, so
  * regenerating a corpus leaves exactly one generation on disk; the
  * live footprint and GC count are logged next to the memo split.
  */
object Grams {
  private val memo = new QueryMemo[DataFrame](name = "grams")

  /** Where scratch generations live: under the reliable checkpoint dir
    * when one is configured (shared, fault-tolerant storage — the
    * multi-node contract), else the local tmpdir (single-box runs). */
  private def scratchRoot(s: SparkSession): Path =
    s.sparkContext.getCheckpointDir match {
      case Some(cp) => new Path(cp, "graft_grams_scratch")
      case None => new Path("file:" + sys.props("java.io.tmpdir"))
    }

  def gramsFor(s: SparkSession, d: String): DataFrame =
    memo.getOrElseUpdate(s, d) {
      val fp = QueryMemo.fingerprint(s, d)
      if (fp == 0L) { // listing failed — no stable key; fall back to heap
        QueryMemo.materialize(triFrame(graft.Tables.documents(s, d)))
      } else {
        val root = scratchRoot(s)
        val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.mkdirs(root)
        val corpusKey = f"${scala.util.hashing.MurmurHash3.stringHash(d)}%08x"
        val target = new Path(root, f"graft_grams_${corpusKey}_$fp%016x")
        if (!fs.exists(new Path(target, "_SUCCESS"))) {
          val tmp = new Path(root,
            target.getName + f".tmp-${ProcessHandle.current.pid}-${System.nanoTime}%x")
          triFrame(graft.Tables.documents(s, d))
            .write.mode("overwrite").parquet(tmp.toString)
          install(fs, tmp, target)
        }
        gc(fs, root, corpusKey, target)
        s.read.parquet(target.toString)
      }
    }

  /** Atomically promote a complete temp generation to `target`. If a
    * half-written `target` exists (crashed writer under the pre-round-13
    * non-atomic scheme) it is cleared first; if a concurrent JVM wins
    * the rename race with a complete generation, ours is discarded.
    * (`FileSystem.rename` refuses an existing non-empty destination on
    * both HDFS and the local FS, which is exactly the race arbiter.) */
  private def install(fs: FileSystem, tmp: Path, target: Path): Unit = {
    if (fs.exists(target) && !fs.exists(new Path(target, "_SUCCESS")))
      fs.delete(target, true)
    val renamed =
      try fs.rename(tmp, target)
      catch { case _: java.io.IOException => false }
    if (!renamed) {
      if (fs.exists(new Path(target, "_SUCCESS")))
        fs.delete(tmp, true) // lost the race to a complete install — fine
      else
        throw new java.io.IOException(
          s"grams scratch install failed: $tmp -> $target")
    }
  }

  /** Delete superseded generations of THIS corpus (same path key,
    * different fingerprint — their data no longer exists), legacy
    * pre-round-13 `graft_grams_<fp16>` dirs, stale temps from crashed
    * writers, and ANY generation older than a week — the week sweep
    * bounds the tail of single-use corpora (every ScalaTest temp
    * directory is a distinct path key that is never superseded; one
    * tiny orphan per suite run would otherwise accumulate forever).
    * A week-old cache still in use is simply rebuilt — it is a cache.
    * Other corpora's fresh caches (different key) and temps younger
    * than an hour (a live writer) are untouched. */
  private def gc(fs: FileSystem, root: Path, corpusKey: String,
                 target: Path): Unit = {
    val legacy = ("graft_grams_[0-9a-f]{16}").r
    val cutoff = System.currentTimeMillis() - 3600L * 1000
    val weekOld = System.currentTimeMillis() - 7L * 86400 * 1000
    val entries: Array[FileStatus] =
      try fs.listStatus(root)
      catch { case scala.util.control.NonFatal(_) => Array.empty[FileStatus] }
    val stale = entries.filter { st =>
      val n = st.getPath.getName
      n != target.getName && (
        (n.startsWith(s"graft_grams_${corpusKey}_") &&
          (!n.contains(".tmp-") || st.getModificationTime < cutoff)) ||
        (n.startsWith("graft_grams_") && st.getModificationTime < weekOld) ||
        legacy.matches(n))
    }
    val freed = stale.map(st => sizeOf(fs, st.getPath)).sum
    stale.foreach(st => fs.delete(st.getPath, true))
    System.err.println(
      f"[graft.memos] grams scratch ${sizeOf(fs, target) / 1048576.0}%.1f MB" +
        f" at ${target.getName} (gc ${stale.length} stale," +
        f" ${freed / 1048576.0}%.1f MB freed)")
  }

  private def sizeOf(fs: FileSystem, p: Path): Long =
    try fs.getContentSummary(p).getLength
    catch { case scala.util.control.NonFatal(_) => 0L }

  /** The relation itself, un-memoized — the building block for callers
    * holding an arbitrary docs frame (tests, library users). The
    * Stage.once barrier stops the size() filter from re-inlining the
    * trigram kernel into both the filter and the projection (the
    * BarrierExpression failure mode, measured +2.5 s on the jaccard
    * chain). */
  private[graft] def triFrame(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        Stage.once(graft.functions.Trigrams(col("text"))).as("ga"))
      .filter(size(col("ga")) > 0)
}

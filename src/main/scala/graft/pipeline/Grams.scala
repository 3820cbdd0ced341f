package graft.pipeline

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
  * Storage: PARQUET on scratch disk, not a localCheckpoint — the one
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

  def gramsFor(s: SparkSession, d: String): DataFrame =
    memo.getOrElseUpdate(s, d) {
      val fp = QueryMemo.fingerprint(s, d)
      if (fp == 0L) { // listing failed — no stable key; fall back to heap
        QueryMemo.materialize(triFrame(graft.Tables.documents(s, d)))
      } else {
        val tmpRoot = new java.io.File(sys.props("java.io.tmpdir"))
        val corpusKey = f"${scala.util.hashing.MurmurHash3.stringHash(d)}%08x"
        val target = new java.io.File(tmpRoot, f"graft_grams_${corpusKey}_$fp%016x")
        if (!new java.io.File(target, "_SUCCESS").exists()) {
          val tmp = new java.io.File(tmpRoot,
            target.getName + f".tmp-${ProcessHandle.current.pid}-${System.nanoTime}%x")
          triFrame(graft.Tables.documents(s, d))
            .write.mode("overwrite").parquet(tmp.getAbsolutePath)
          install(tmp, target)
        }
        gc(tmpRoot, corpusKey, target)
        s.read.parquet(target.getAbsolutePath)
      }
    }

  /** Atomically promote a complete temp generation to `target`. If a
    * half-written `target` exists (crashed writer under the pre-round-13
    * non-atomic scheme) it is cleared first; if a concurrent JVM wins
    * the rename race with a complete generation, ours is discarded. */
  private def install(tmp: java.io.File, target: java.io.File): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    if (target.exists() && !new java.io.File(target, "_SUCCESS").exists())
      deleteRec(target)
    try Files.move(tmp.toPath, target.toPath, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.FileAlreadyExistsException |
           _: java.nio.file.FileSystemException
          if new java.io.File(target, "_SUCCESS").exists() =>
        deleteRec(tmp) // lost the race to a complete install — fine
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
  private def gc(tmpRoot: java.io.File, corpusKey: String,
                 target: java.io.File): Unit = {
    val legacy = ("graft_grams_[0-9a-f]{16}").r
    val cutoff = System.currentTimeMillis() - 3600L * 1000
    val weekOld = System.currentTimeMillis() - 7L * 86400 * 1000
    val stale = Option(tmpRoot.listFiles()).getOrElse(Array.empty).filter { f =>
      val n = f.getName
      n != target.getName && (
        (n.startsWith(s"graft_grams_${corpusKey}_") &&
          (!n.contains(".tmp-") || f.lastModified() < cutoff)) ||
        (n.startsWith("graft_grams_") && f.lastModified() < weekOld) ||
        legacy.matches(n))
    }
    val freed = stale.map(sizeRec).sum
    stale.foreach(deleteRec)
    System.err.println(
      f"[graft.memos] grams scratch ${sizeRec(target) / 1048576.0}%.1f MB" +
        f" at ${target.getName} (gc ${stale.length} stale," +
        f" ${freed / 1048576.0}%.1f MB freed)")
  }

  private def sizeRec(f: java.io.File): Long =
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).map(sizeRec).sum
    else f.length()

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete(): Unit
  }

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

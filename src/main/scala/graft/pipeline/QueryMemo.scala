package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Capacity-bounded LRU memo for per-table-directory derived frames,
  * shared by [[MinHash]] (rep graph, dup map), [[Cluster]] (connected
  * components), and [[LangModel]] (LM scores).
  *
  * The memo key is `(session, dir, data fingerprint)` where the
  * fingerprint hashes the directory's recursive file listing (path,
  * mtime, length): a directory REGENERATED IN PLACE within one session
  * gets a fresh key and is recomputed — without it the memo silently
  * served results for data that no longer exists. The listing is one
  * driver-side FS metadata call per memoized query invocation (a few
  * RPCs on an object store), negligible next to the query itself.
  *
  * Capacity bound (round-6 verdict): an unbounded memo pins every
  * directory's checkpointed blocks forever — block-manager memory that
  * `spark.catalog.clearCache()` cannot touch. An evicted (or
  * fingerprint-orphaned) entry's blocks are released by Spark's
  * ContextCleaner once the dropped reference is GC'd (Bench/Verify GC
  * between queries).
  *
  * Concurrency note: the value is BUILT inside the memo lock, so a
  * concurrent second consumer of the same key blocks until the first
  * evaluation finishes — the right trade for this engine's sequential
  * Bench/Verify drivers (it guarantees the expensive chain runs once).
  * A multi-tenant session serving unrelated directories concurrently
  * would want per-key futures with the lock held only for map access;
  * nothing here depends on the global lock beyond single evaluation.
  */
final class QueryMemo[V](capacity: Int = 4) {
  private val m =
    new java.util.LinkedHashMap[(SparkSession, String, Long), V](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String, Long), V]): Boolean =
        size() > capacity
    }

  def getOrElseUpdate(s: SparkSession, d: String)(build: => V): V = m.synchronized {
    val k = (s, d, QueryMemo.fingerprint(s, d))
    Option(m.get(k)).getOrElse { val v = build; m.put(k, v); v }
  }
}

object QueryMemo {
  /** Order-independent-input, deterministic hash of the directory's
    * recursive `(path, mtime, len)` listing (sorted by path before
    * folding). Returns 0 on any listing failure so memoization still
    * functions (keyed on path alone) rather than failing the query. */
  def fingerprint(s: SparkSession, d: String): Long = {
    try {
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      val entries = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
      while (it.hasNext) {
        val f = it.next()
        entries += ((f.getPath.toString, f.getModificationTime, f.getLen))
      }
      var h = 1125899906842597L
      entries.sortBy(_._1).foreach { case (pth, mt, ln) =>
        h = h * 31 + pth.hashCode.toLong
        h = h * 31 + mt
        h = h * 31 + ln
      }
      h
    } catch { case scala.util.control.NonFatal(_) => 0L }
  }
}

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
  * table directory and every consumer starts from the cached scan:
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
  * Storage: [[ScratchCache]] parquet (fingerprint-keyed, atomic
  * install, GC'd generations) — NOT a checkpoint. The relation is the
  * fattest shared frame in the engine (one ~60-entry string array per
  * doc, ~1 GB of heap blocks at the 100x probe), and pinning it
  * evicted the per-query persists under the bench JVM's 8 GiB heap:
  * the checkpointed spelling made `dedup_jaccard_dupmap` SLOWER at
  * 100x (14.4 → 19.8 s, measured) even though its gram stages were
  * served from the memo. With a reliable checkpoint dir configured the
  * scratch lands under it (shared storage every executor can read —
  * the multi-node contract, closing the SCALE.md §15 tmpdir caveat);
  * locally it lives in tmpdir and is reused across process restarts.
  * The LRU memo only caches the (cheap) reader frame.
  */
object Grams {
  private val memo = new QueryMemo[DataFrame](name = "grams")

  def gramsFor(s: SparkSession, d: String): DataFrame =
    memo.getOrElseUpdate(s, d) {
      ScratchCache.parquetFor(s, d, "grams")(
          triFrame(graft.Tables.documents(s, d)))
        .getOrElse( // listing failed — no stable key; fall back to heap
          QueryMemo.materialize(triFrame(graft.Tables.documents(s, d))))
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

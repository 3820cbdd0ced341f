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
  * Scale shape: the checkpoint is a skinny two-column frame, one row
  * per doc with a ~60-entry string array — the same order of bytes the
  * jaccard chain already persisted per query as `withG`. Same
  * localCheckpoint + LRU + fingerprint policy as every [[QueryMemo]];
  * on a real cluster the localCheckpoint becomes a reliable checkpoint
  * or a parquet materialization of the same frame.
  */
object Grams {
  private val memo = new QueryMemo[DataFrame]()

  def gramsFor(s: SparkSession, d: String): DataFrame =
    memo.getOrElseUpdate(s, d) {
      triFrame(graft.Tables.documents(s, d)).localCheckpoint(true)
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

package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Force-build every cross-query [[QueryMemo]] for a table directory.
  *
  * The localCheckpoint memos (MinHash rep graph + dup map, Cluster CC
  * labels, LangModel transition scores) deliberately survive the bench
  * harness's per-rep `CacheScope.drain()`/`clearCache()` barrier — they
  * are the "build the dedup index once, query it many times" model a
  * production pipeline amortizes the same way. That made median-of-N
  * timing dishonest: the one cold rep that actually built a memo was
  * discarded by the median, so the signature/band/verify cost appeared
  * in NO reported mark. [[graft.Bench]] calls this ONCE, timed, and
  * reports it as the `memo_build_shared` entry included in the total;
  * every query median then measures warm steady-state.
  */
object Memos {
  /** Per-component stderr timing: the memo build is the top mark of
    * every 100x sweep, so its internal split is the first thing a
    * perf investigation needs (scale-probe sweeps read these lines). */
  private def timed(name: String)(f: => Any): Unit = {
    val t0 = System.nanoTime()
    f
    System.err.println(
      f"[graft.memos] $name ${(System.nanoTime() - t0) / 1e9}%.1f s")
  }

  def build(s: SparkSession, d: String): Unit = {
    // Shared trigram relation: one Trigrams-kernel scan feeding the
    // jaccard dup map, corpus novelty and the fuzzy index build below.
    timed("grams") { Grams.gramsFor(s, d) }
    // rep graph: eager checkpoints inside the memo build.
    timed("rep_graph") { MinHash.repGraphFor(s, d) }
    // dup map: lazily checkpointed — force materialization.
    timed("dupmap") {
      MinHash.dupsFor(s, d).write.format("noop").mode("overwrite").save()
    }
    // CC labels: the CC loop materializes each round eagerly at call time.
    timed("cc_labels") { Cluster.clustersFor(s, d) }
    // LM scores: lazily checkpointed — force materialization.
    timed("lm_scores") {
      LangModel.scoresFor(s, d).write.format("noop").mode("overwrite").save()
    }
    // IVF/PQ index: the eager localCheckpoint inside the memo build
    // materializes the encoded corpus frame for the three sim_ivf* queries.
    timed("ivf_index") { graft.relational.Similarity.ivfIndexFor(s, d) }
    // Fuzzy decontamination index: bench collect + corpus df pass +
    // broadcast, shared by the two fuzzy-tier queries.
    timed("fuzzy_index") { Contamination.fuzzyIxFor(s, d) }
    // Exact-tier bench gram set: a bench-sized pruned mini-scan +
    // broadcast, shared by the two exact-tier queries.
    timed("bench_grams") { Contamination.benchGramsFor(s, d) }
    // Tokenizer-trainer lexicon: the shared corpus word-frequency pass
    // all three trainer stats queries start from (MaxLexicon-bounded
    // driver collect).
    timed("lexicon") { Bpe.lexiconFor(s, d) }
    // Per-doc scalar quality metrics (config-independent): the cascade
    // projection, both histograms, the language report and every reason
    // spelling derive from this one checkpoint; the default-config
    // verdicts (reasons) and the passed-id set (the DSIR target model)
    // are projections/filters of it.
    timed("metrics") { Quality.metricsFor(s, d) }
    timed("reasons") { Quality.reasonsFor(s, d) }
    timed("passed_ids") { Quality.passedIdsFor(s, d) }
  }
}

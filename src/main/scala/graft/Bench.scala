package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main. Executes every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query runs through a noop sink (`format("noop")`) rather than
  * `count()`: count() lets Catalyst prune all projections, so a pure-
  * projection query would benchmark a bare scan instead of the operator
  * (round-1 verdict). The noop sink evaluates every output column and
  * discards rows — the honest cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER=local-cluster[w,c,mem] times the same sweep under
    // multi-JVM executors (same contract as graft.Verify: driver classpath
    // rides along because local-cluster executors only get Spark's own).
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // Round-robin rep interleaving (below) cycles ~128 distinct plans
      // between two reps of the same mark; the generated-code cache
      // holds 100 classes by default, so every rep would RECOMPILE its
      // whole-stage codegen (janino) instead of hitting the cache —
      // measured +38% on the full-menu 100× sweep vs back-to-back reps.
      // A cache sized over the menu keeps rep 2+ codegen-warm, which is
      // also the steady state a production driver resubmitting the same
      // queries runs in. (Static conf: must be set before the session.)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
    if (master.startsWith("local-cluster"))
      builder.config("spark.executor.extraClassPath",
        System.getProperty("java.class.path"))
    if (sys.env.contains("SPARK_GRAFT_CHECKPOINT_DIR"))
      builder.config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOGLEVEL", "WARN"))
    // Same reliable-memo contract as graft.Verify: with a checkpoint dir
    // configured the memos survive executor loss (QueryMemo.materialize),
    // so the reliable path's cost is benchmarkable, not just correct.
    sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR")
      .foreach(spark.sparkContext.setCheckpointDir)
    // Warm the session so the alphabetically-first query doesn't absorb
    // JVM startup cost: one parquet scan (footer reader, vectorized
    // reader classes) plus a synthetic window + shuffle-join + aggregate
    // round (janino, codegen'd operator base classes, Tungsten shuffle
    // paths). The synthetic round touches NO benchmark data and caches no
    // query results — it compiles infrastructure, not answers.
    try {
      spark.read.parquet(s"$sfDir/documents.parquet")
        .write.format("noop").mode("overwrite").save()
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val w = spark.range(10000).select(col("id"), (col("id") % 97).as("k"),
        regexp_replace(concat(lit("w"), col("id")), "9", "x").as("s"))
      w.withColumn("rn", row_number().over(
          Window.partitionBy(col("k")).orderBy(col("id"))))
        .join(w.select(col("k"), col("id").as("id2")), "k")
        .groupBy("k").agg(count(lit(1)).as("n"), sum(col("id2")).as("t"))
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => }
    val only = args.toSet
    // Host-calibration mark (round-13 verdict #4): round totals on this
    // box swung 72.9 → 98.3 s on identical code under measured host
    // drift, so the 2x gate needs a denominator. One fixed pure-scan
    // probe — sum(length(text)) over documents, the shape of the
    // cheapest real marks — timed median-of-3 AFTER the warmup (so it
    // reads steady-state scan throughput, not JVM startup), reported as
    // `calibration_sec` beside `value` and EXCLUDED from the total.
    // Round-over-round: total/calibration_sec normalizes host drift
    // (SCALE.md documents the normalization).
    // Guarded like the warmup: the ONE-JSON-LINE contract must survive
    // a broken scan (missing table, bad dir) — the queries themselves
    // already report per-query failures; calibration reads null on
    // failure (round-14 advice: a -1 sentinel fed through the
    // total/calibration normalization produced a sign-flipped factor
    // instead of an obvious error — null makes the consumer fail loudly).
    val calibration: Option[Double] =
      try {
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          spark.read.parquet(s"$sfDir/documents.parquet")
            .selectExpr("sum(length(text)) AS b", "count(*) AS n")
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        Some(runs.sorted.apply(1))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] calibration FAILED: ${e.getMessage}")
        None
      }
    // Shared-memo setup mark (round-10 advice): the localCheckpoint memos
    // (MinHash rep graph + dup map, Cluster CC labels, LangModel scores)
    // deliberately survive the per-rep drain barrier below, so under
    // median-of-N the one cold rep that actually built a memo was
    // DISCARDED by the median — the signature/band/verify cost appeared
    // in no reported mark and the summed total silently excluded it.
    // Build them all ONCE here, timed, and report the cost as its own
    // `memo_build_shared` entry included in the total: per-query medians
    // then measure warm steady-state against an index built exactly
    // once — the same amortization a production deployment runs.
    // Skipped when a query filter is given and no memo consumer is in it.
    val memoConsumers = Set("dedup_delta_minhash",
      "dedup_minhash", "dedup_minhash_dupmap", "dedup_minhash_pairs",
      "dedup_minhash_stats", "pipeline_unique_docs", "dedup_minhash_clusters",
      "dedup_minhash_cluster_stats", "dedup_cluster_histogram", "dedup_keep_best",
      "quality_lm_transition", "quality_lm_buckets",
      "sim_ivf_topk", "sim_ivfpq_topk", "sim_ivfpq_rerank",
      "sim_ann_lsh", "sim_semdedup", "sim_embed_dedup", "sim_embed_dedup_mp",
      "dedup_semantic_text",
      "decontaminate_fuzzy", "decontaminate_attribution",
      "decontaminate_flags", "decontaminate_overlap",
      "dedup_jaccard_dupmap", "corpus_novelty",
      "mix_dsir_weights", "mix_dsir_weights_bigram", "quality_passed",
      "quality_histogram", "quality_reason_report", "quality_by_source",
      "tok_bpe_stats", "tok_wordpiece_stats", "tok_unigram_stats",
      "quality_cascade", "quality_histogram_refdefaults", "lang_distribution")
    val memoMark: Seq[(String, Double)] =
      if (only.nonEmpty && only.intersect(memoConsumers).isEmpty) Nil
      else {
        graft.pipeline.QueryMemo.phase = "memo_build"
        val t0 = System.nanoTime()
        val ok =
          try { graft.pipeline.Memos.build(spark, sfDir); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] memo_build_shared FAILED: ${e.getMessage}"); false
          }
        CacheScope.drain()
        spark.catalog.clearCache()
        System.gc()
        Seq("memo_build_shared" -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0))
      }
    // Median-of-N per query (round-8 verdict #3): with identical binaries
    // the single-shot sweep moved 311.6 -> 254.7 s round-over-round and
    // individual queries by 3-4x (cold-vs-warm memo ordering, GC debt
    // carried across lexically adjacent dedup queries, block-manager
    // state). Each query runs REPS times with the full cleanup barrier
    // between reps; the reported mark is the (lower) median — the
    // statistic least moved by one cold outlier while still penalizing a
    // genuinely bimodal query. REPS=1 restores the old single-shot sweep.
    //
    // Rep ORDER is round-robin across the whole menu (round-16, closing
    // r15 verdict #1): rep 1 of every mark, then rep 2 of every mark, …
    // With back-to-back reps, a transient slow host window (~minutes of
    // CPU contention / thermal / page-cache pressure) lands ENTIRELY on
    // whichever 2-3 marks it straddles and shifts all their reps
    // together — a tight-spread 2.9x phantom regression on untouched
    // code (r_cohort_retention 0.537 builder vs 1.558 driver, r15) that
    // neither rep_spread nor the global calibration can explain.
    // Interleaved, the same window clips ONE rep of many marks instead:
    // per-mark medians shrug it off, and the per-round wall-clock totals
    // (`round_sec` in the artifact) name the slow round outright — the
    // self-contained explanation the sweep reading needs. Steady-state
    // semantics are unchanged: the identical cleanup barrier runs
    // between any two timed windows either way, and the shared memos
    // are built once before round 1.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val qlist = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
    val marksByQuery =
      scala.collection.mutable.LinkedHashMap.empty[String, Vector[Double]]
    qlist.foreach { case (name, _) => marksByQuery(name) = Vector.empty }
    val roundSecs = (1 to reps).map { _ =>
      val tr0 = System.nanoTime()
      qlist.foreach { case (name, fn) =>
        graft.pipeline.QueryMemo.phase = name
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
          }
        val sec = (System.nanoTime() - t0) / 1e9
        // Release this query's persisted intermediates before the next
        // timed window: operators persist multi-use subtrees (LSH
        // signatures, gram indexes), and 46 queries' worth of leftover
        // blocks evict each other mid-query — a full sweep measured
        // jaccard at 85 s vs 18 s standalone before this. The explicit GC
        // then collects the freed blocks NOW instead of mid-way through
        // the next timed window (cross-query GC debt measured as 1.2 vs
        // 4.2 s swings on the same query, same binary). Cleanup time is
        // excluded from the mark, matching a per-job submission model.
        // CacheScope.drain() is the engine's own lifecycle (unpersists
        // operator-registered frames); clearCache() remains as a belt-
        // and-braces sweep for anything cached outside the registry.
        CacheScope.drain()
        spark.catalog.clearCache()
        System.gc()
        marksByQuery(name) :+= (if (ok) sec else -1.0)
      }
      (System.nanoTime() - tr0) / 1e9
    }
    val detailed = qlist.map { case (name, _) =>
      val marks = marksByQuery(name)
      // Median over the SUCCESSFUL reps (round-15 advice: sorting with
      // the -1 failure sentinels in place shifted the reported "median"
      // to the lower success); the MARK still reads -1 when any rep
      // failed — a flaky query is a failed query.
      val okMarks = marks.filter(_ >= 0).sorted
      val sec =
        if (okMarks.length < marks.length) -1.0
        else okMarks((okMarks.length - 1) / 2)
      // spread = successes ascending, then a null per failed rep
      (name, sec, okMarks ++ Seq.fill(marks.length - okMarks.length)(-1.0))
    }
    val results = memoMark ++ detailed.map { case (n, s, _) => (n, s) }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val nFail = results.count(_._2 < 0)
    // Attribution audit (round-12 verdict #1): shared-memo builds that
    // ran INSIDE a query mark instead of memo_build_shared. A non-empty
    // map means those query marks absorbed index-construction cost —
    // the map says exactly which mark and how much, so round-over-round
    // totals decompose into real changes vs accounting shifts. (Two
    // classes land here by design and cost what they cost: memos for
    // queries outside `memoConsumers`, and rebuilds after an LRU/
    // fingerprint eviction mid-sweep.)
    val late = graft.pipeline.QueryMemo.lateBuilds()
    late.foreach { case (k, s) =>
      System.err.println(f"[bench] late memo build $k ${s}%.1f s")
    }
    val lateJson = late.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // Per-mark rep spread (round-14 verdict #3): the driver sweep read
    // tok_stats at 3.63 s where the same binary read 0.71 s on the
    // builder's box, and the global calibration mark cannot localize a
    // one-rep stall. With the spread in the artifact, max >> median on
    // an untouched query reads as sweep noise in one look; a shifted
    // MEDIAN is the real regression signal. The list is the SUCCESSFUL
    // reps ascending, plus a trailing null per failed rep (round-15
    // advice: the old fixed [min, median, max] slots indexed across the
    // failure sentinels, mislabeling the median; and a -1 rendered as a
    // negative duration to noise-statistics consumers).
    def f3(v: Double) =
      if (v < 0) "null"
      else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val spreadJson = detailed.map { case (n, _, m) =>
      "\"" + n + "\":[" + m.map(f3).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val calJson = calibration.map(_.toString).getOrElse("null")
    // round_sec: wall-clock of each round-robin pass over the whole menu
    // (timed windows + cleanup barriers). A slow host window shows up as
    // one inflated round here — the sweep-level self-explanation for any
    // mark whose reps straddled it.
    val roundJson = roundSecs.map(f3).mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","calibration_sec":$calJson,"queries":$qs,"failed":$nFail,"reps":$reps,"round_sec":$roundJson,"rep_spread":$spreadJson,"late_memo_builds":$lateJson,"sf":"$sfDir"}"""
    println(json)
    // stdout goes through sbt's [info] prefix, which broke the driver's
    // parser in round 1 — also drop the raw line where it can be read back.
    Files.writeString(Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/root/repo/bench_out.json")), json + "\n")
    spark.stop()
  }
}

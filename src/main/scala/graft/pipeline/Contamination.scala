package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Eval-set decontamination — the pre-training hygiene op (GPT-3 §C,
  * PaLM, Llama: drop or flag training docs that share long n-grams with
  * an evaluation benchmark) that sits beside dedup in every production
  * pipeline but outside the single-corpus reference's scope.
  *
  * The benchmark here is a deterministic stand-in: the [[BenchmarkDocs]]
  * lowest-id documents play the eval set, everything else is the
  * training corpus. Contamination = a training doc sharing at least one
  * distinct word [[GramN]]-gram with any benchmark doc.
  *
  * Scale shape: the benchmark gram set is SMALL by construction (eval
  * sets are thousands of docs, not billions), so it broadcasts; the
  * training side explodes to distinct-per-doc grams and hash-joins the
  * broadcast — a map-side semi-join over the scan, one shuffle to
  * re-aggregate per doc. At 100 TB the training side never shuffles its
  * grams; only matched rows (rare) reach the exchange. */
object Contamination {

  val GramN = 5
  val BenchmarkDocs = 10

  /** Distinct word n-grams of `text` as a column expression (built-in
    * HOFs; the CASE guards short docs). */
  private[graft] def gramsExpr(n: Int): String = {
    val parts = (0 until n).map(k => s"element_at(w, i + $k)").mkString(", ")
    s"""CASE WHEN size(w) < $n THEN CAST(array() AS ARRAY<STRING>)
       |ELSE array_distinct(transform(sequence(1, size(w) - ${n - 1}),
       |                              i -> concat_ws(' ', $parts))) END""".stripMargin
  }

  /** Per contaminated training doc: how many of its distinct
    * [[GramN]]-grams appear anywhere in the benchmark. Only docs with
    * >= 1 overlap are emitted (the flag list a pipeline would subtract
    * or quarantine). */
  def contaminationQuery(docs: DataFrame): DataFrame = {
    val withGrams = docs.select(
        col("doc_id"),
        Stage.once(expr("filter(split(text, '\\\\s+'), x -> x != '')")).as("w"))
      .select(col("doc_id"), explode(expr(gramsExpr(GramN))).as("gram"))
    val benchGrams = withGrams.filter(col("doc_id") < BenchmarkDocs)
      .select(col("gram")).distinct()
    withGrams.filter(col("doc_id") >= BenchmarkDocs)
      .join(broadcast(benchGrams), "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_contaminated_grams"))
  }

  /** Severity tier: a doc whose shared-gram share clears this is
    * "substantially contaminated" (drop it); below, quarantine/inspect.
    * The two-tier read is the Llama/GPT-3 appendix practice — a single
    * shared 5-gram in a long doc is usually boilerplate, not leakage. */
  val OverlapThreshold = 0.2

  /** Fractional-overlap decontamination: per contaminated training doc,
    * the SHARE of its distinct [[GramN]]-grams found in the benchmark
    * (plus the substantial-contamination verdict at [[OverlapThreshold]]).
    * Same broadcast semi-join as [[contaminationQuery]] with one extra
    * per-doc aggregation for the denominator — the denominator count
    * rides the same exploded gram relation and its exchange is reused
    * (both aggregations key on doc_id). */
  def overlapQuery(docs: DataFrame): DataFrame = {
    val withGrams = docs.select(
        col("doc_id"),
        Stage.once(expr("filter(split(text, '\\\\s+'), x -> x != '')")).as("w"))
      .select(col("doc_id"), explode(expr(gramsExpr(GramN))).as("gram"))
    val train = withGrams.filter(col("doc_id") >= BenchmarkDocs)
    val benchGrams = withGrams.filter(col("doc_id") < BenchmarkDocs)
      .select(col("gram")).distinct()
    val totals = train.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    train.join(broadcast(benchGrams), "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .join(totals, "doc_id")
      .select(col("doc_id"), col("n_shared"), col("n_grams"),
        (col("n_shared").cast("double") / col("n_grams").cast("double"))
          .as("overlap_fraction"),
        (col("n_shared").cast("double") / col("n_grams").cast("double")
          >= OverlapThreshold).as("substantial"))
  }

  /** Trigram-Jaccard similarity at or above this flags a training doc
    * as a fuzzy near-match of a benchmark doc. Calibration: a word-level
    * paraphrase dense enough to defeat the exact 5-gram tier (an edit at
    * least every 5th word) still retains ~0.15–0.25 trigram Jaccard,
    * while unrelated prose sits near 0 — so the fuzzy tier is a
    * quarantine net, deliberately far below the ~0.7–0.8 near-dup
    * dedup thresholds. */
  val FuzzyThreshold = 0.15

  /** Stop-trigram document-frequency cap for fuzzy candidate
    * generation (the MOSS/[[NearDup.FpDfCap]] idiom): a trigram found
    * in more than this many documents corpus-wide (`" th"`-class
    * boilerplate) identifies nothing — pairing on it would regenerate
    * the all-pairs scan this index exists to avoid — so it cannot
    * nominate a candidate pair. It still participates in the EXACT
    * Jaccard computed for nominated candidates. */
  val FuzzyDfCap = 50

  /** FUZZY decontamination: per training doc, the MAXIMUM trigram-
    * Jaccard similarity against any benchmark doc sharing at least one
    * RARE trigram with it (corpus df ≤ [[FuzzyDfCap]]), flagged at
    * [[FuzzyThreshold]]. Exact n-gram overlap ([[contaminationQuery]])
    * misses paraphrased or lightly-edited eval leakage — a doc can
    * share zero 5-grams with a benchmark item yet be a near-copy of it;
    * whole-doc set similarity is the fuzzy tier the Llama-lineage
    * decontamination appendices describe on top of the exact tier. A
    * genuine paraphrase at J ≥ 0.15 shares MANY trigrams, nearly all of
    * them rare (they quote the benchmark item's specific phrasing), so
    * the rare-gram gate loses nothing real; pairs sharing ONLY
    * ubiquitous trigrams sit near J = 0 and are exactly the pairs the
    * old `arrays_overlap` broadcast nested-loop wasted |bench| full
    * `array_intersect`s per training doc on.
    *
    * Scale shape — an inverted df-capped trigram index, NOT an
    * all-pairs scan, and no corpus-scale shuffle anywhere: candidates
    * must share a BENCH gram, so the df aggregation first drops every
    * posting not in the broadcast bench-gram set (map-side semi-join;
    * partial aggregation collapses each partition to ≤ |bench grams|
    * rows before the exchange). The surviving rare-gram index is
    * eval-set-sized, broadcasts, and each training posting probes it
    * map-side; only nominated (doc, bench) pairs — bounded by
    * [[FuzzyDfCap]] × |bench postings|, not corpus × |bench| — reach
    * the distinct + exact-Jaccard stage, where the bench trigram
    * arrays broadcast and AQE broadcast-joins the candidate list back
    * to the (persisted) training arrays. */
  def fuzzyContaminationQuery(docs: DataFrame,
      benchDocs: Int = BenchmarkDocs): DataFrame = {
    val tri = docs.select(col("doc_id"), Stage.once(graft.functions.Trigrams(col("text"))).as("ga"))
      .filter(size(col("ga")) > 0)
      .transform(graft.CacheScope.persist) // reused: bench index, train postings, verify arrays
    val cand = fuzzyCandidates(tri, benchDocs)
    val bench = tri.filter(col("doc_id") < benchDocs)
      .select(col("doc_id").as("bench_id"), col("ga").as("bga"))
    cand.join(tri, "doc_id")
      .join(broadcast(bench), "bench_id")
      .select(col("doc_id"),
        size(array_intersect(col("ga"), col("bga"))).cast("double").as("inter"),
        (size(col("ga")) + size(col("bga"))).cast("double").as("sz"))
      .select(col("doc_id"), (col("inter") / (col("sz") - col("inter"))).as("jac"))
      .groupBy(col("doc_id"))
      .agg(max(col("jac")).as("max_jaccard"))
      .select(col("doc_id"), col("max_jaccard"),
        (col("max_jaccard") >= FuzzyThreshold).as("contaminated"))
  }

  /** Candidate (train doc, bench doc) pairs for the fuzzy tier: pairs
    * sharing ≥ 1 trigram whose corpus-wide document frequency is
    * ≤ [[FuzzyDfCap]]. `tri` is the (doc_id, ga) distinct-trigram
    * frame. Exposed for the scale spec, which asserts |cand| ≪
    * |corpus| × |bench| on a corpus where every pair shares a stop
    * trigram. */
  private[graft] def fuzzyCandidates(tri: DataFrame, benchDocs: Int): DataFrame = {
    val posts = tri.select(col("doc_id"), explode(col("ga")).as("g"))
    val benchPosts = posts.filter(col("doc_id") < benchDocs)
      .select(col("g"), col("doc_id").as("bench_id"))
      .transform(graft.CacheScope.persist) // eval-set-sized
    val benchGrams = benchPosts.select(col("g")).distinct()
    // corpus-wide df, computed only for grams that occur in the bench
    // (a candidate pair must share one): keep ⊆ bench grams, so it
    // broadcasts right back.
    val keep = posts.join(broadcast(benchGrams), "g")
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= FuzzyDfCap)
      .select(col("g"))
    val rareIndex = benchPosts.join(broadcast(keep), "g")
    posts.filter(col("doc_id") >= benchDocs)
      .join(broadcast(rareIndex), "g")
      .select(col("doc_id"), col("bench_id")).distinct()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "decontaminate_flags" -> ((s, d) => contaminationQuery(Tables.documents(s, d))),
    "decontaminate_overlap" -> ((s, d) => overlapQuery(Tables.documents(s, d))),
    "decontaminate_fuzzy" -> ((s, d) => fuzzyContaminationQuery(Tables.documents(s, d))))

  def oracles: Map[String, String] = {
    val parts = (0 until GramN).map(k => s"w[i + $k]").mkString(" || ' ' || ")
    Map(
      "decontaminate_fuzzy" ->
        s"""WITH grams AS (SELECT doc_id, unnest(${NearDup.TrigramsD}) AS g FROM documents),
           |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
           |keep AS (SELECT g FROM grams GROUP BY g HAVING count(*) <= $FuzzyDfCap),
           |rare AS (SELECT doc_id, grams.g FROM grams JOIN keep USING (g)),
           |cand AS (
           |  SELECT DISTINCT t.doc_id, b.doc_id AS bench_id
           |  FROM rare t JOIN rare b ON t.g = b.g
           |  WHERE t.doc_id >= $BenchmarkDocs AND b.doc_id < $BenchmarkDocs),
           |inter AS (
           |  SELECT t.doc_id, b.doc_id AS bench_id, count(*) AS inter
           |  FROM grams t JOIN grams b ON t.g = b.g
           |  WHERE t.doc_id >= $BenchmarkDocs AND b.doc_id < $BenchmarkDocs
           |  GROUP BY 1, 2),
           |jac AS (
           |  SELECT c.doc_id,
           |         CAST(inter AS DOUBLE)
           |           / (CAST(st.n + sb.n AS DOUBLE) - CAST(inter AS DOUBLE)) AS jac
           |  FROM cand c
           |  JOIN inter i ON i.doc_id = c.doc_id AND i.bench_id = c.bench_id
           |  JOIN sizes st ON st.doc_id = c.doc_id
           |  JOIN sizes sb ON sb.doc_id = c.bench_id)
           |SELECT doc_id, max(jac) AS max_jaccard,
           |       max(jac) >= $FuzzyThreshold AS contaminated
           |FROM jac GROUP BY doc_id""".stripMargin,
      "decontaminate_flags" ->
        s"""WITH b AS (
           |  SELECT doc_id,
           |         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS w
           |  FROM documents),
           |g AS (
           |  SELECT DISTINCT doc_id,
           |         unnest(list_transform(range(1, len(w) - ${GramN - 2}),
           |                               i -> $parts)) AS gram
           |  FROM b),
           |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id < $BenchmarkDocs)
           |SELECT doc_id, count(*) AS n_contaminated_grams
           |FROM g JOIN bench USING (gram)
           |WHERE doc_id >= $BenchmarkDocs
           |GROUP BY doc_id""".stripMargin,
      "decontaminate_overlap" ->
        s"""WITH b AS (
           |  SELECT doc_id,
           |         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS w
           |  FROM documents),
           |g AS (
           |  SELECT DISTINCT doc_id,
           |         unnest(list_transform(range(1, len(w) - ${GramN - 2}),
           |                               i -> $parts)) AS gram
           |  FROM b),
           |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id < $BenchmarkDocs),
           |tot AS (SELECT doc_id, count(*) AS n_grams FROM g
           |        WHERE doc_id >= $BenchmarkDocs GROUP BY doc_id),
           |sh AS (SELECT doc_id, count(*) AS n_shared
           |       FROM g JOIN bench USING (gram)
           |       WHERE doc_id >= $BenchmarkDocs GROUP BY doc_id)
           |SELECT doc_id, n_shared, n_grams,
           |       CAST(n_shared AS DOUBLE) / CAST(n_grams AS DOUBLE) AS overlap_fraction,
           |       CAST(n_shared AS DOUBLE) / CAST(n_grams AS DOUBLE) >= $OverlapThreshold AS substantial
           |FROM sh JOIN tot USING (doc_id)""".stripMargin)
  }
}

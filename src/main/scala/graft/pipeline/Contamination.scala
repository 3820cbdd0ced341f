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

  /** FUZZY decontamination: per training doc, the MAXIMUM trigram-
    * Jaccard similarity against any benchmark doc (emitted only when
    * ≥ 1 trigram is shared), flagged at [[FuzzyThreshold]]. Exact
    * n-gram overlap ([[contaminationQuery]]) misses paraphrased or
    * lightly-edited eval leakage — a doc can share zero 5-grams with a
    * benchmark item yet be a near-copy of it; whole-doc set similarity
    * is the fuzzy tier the Llama-lineage decontamination appendices
    * describe on top of the exact tier.
    *
    * Scale shape: the benchmark side is EVAL-SET-sized by construction,
    * so its (id, trigram-array) rows broadcast and the join is a
    * broadcast nested-loop with an `arrays_overlap` predicate — the
    * training side never shuffles; per row it pays |bench| codegen'd
    * set probes, i.e. O(corpus × |bench|) scan-shaped work with |bench|
    * fixed (eval suites do not grow with the corpus) — the same
    * absorbed-by-executors class as the ADC scans. The max and the
    * verdict are one IEEE division per pair and an order-independent
    * max, hash-identical to the oracle's unpruned pair join. */
  def fuzzyContaminationQuery(docs: DataFrame): DataFrame = {
    val tri = docs.select(col("doc_id"), graft.functions.Trigrams(col("text")).as("ga"))
      .filter(size(col("ga")) > 0)
    val bench = tri.filter(col("doc_id") < BenchmarkDocs)
      .select(col("doc_id").as("bench_id"), col("ga").as("bga"))
    tri.filter(col("doc_id") >= BenchmarkDocs)
      .join(broadcast(bench), arrays_overlap(col("ga"), col("bga")))
      .select(col("doc_id"),
        size(array_intersect(col("ga"), col("bga"))).cast("double").as("inter"),
        (size(col("ga")) + size(col("bga"))).cast("double").as("sz"))
      .select(col("doc_id"), (col("inter") / (col("sz") - col("inter"))).as("jac"))
      .groupBy(col("doc_id"))
      .agg(max(col("jac")).as("max_jaccard"))
      .select(col("doc_id"), col("max_jaccard"),
        (col("max_jaccard") >= FuzzyThreshold).as("contaminated"))
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
           |inter AS (
           |  SELECT t.doc_id, b.doc_id AS bench_id, count(*) AS inter
           |  FROM grams t JOIN grams b ON t.g = b.g
           |  WHERE t.doc_id >= $BenchmarkDocs AND b.doc_id < $BenchmarkDocs
           |  GROUP BY 1, 2),
           |jac AS (
           |  SELECT i.doc_id,
           |         CAST(inter AS DOUBLE)
           |           / (CAST(st.n + sb.n AS DOUBLE) - CAST(inter AS DOUBLE)) AS jac
           |  FROM inter i
           |  JOIN sizes st ON st.doc_id = i.doc_id
           |  JOIN sizes sb ON sb.doc_id = i.bench_id)
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

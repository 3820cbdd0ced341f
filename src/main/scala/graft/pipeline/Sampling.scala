package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic corpus sampling / split assignment — the data-mixing
  * ops every large-scale training-data pipeline needs (per-source
  * mixture rates à la The Pile / Dolma; reproducible train/val/test
  * carving) and that the reference, being single-corpus, stops short of.
  *
  * The sampling key is the first byte of `md5(doc_id)` rendered as two
  * hex chars — 256 uniform buckets that are (a) stable across runs,
  * machines, and engines (no RNG: the same doc always lands in the same
  * bucket, so samples are reproducible AND monotone — raising a rate
  * only ever ADDS docs), and (b) directly comparable as strings, which
  * keeps the predicate a codegen'd string compare instead of a
  * hex→int conversion that DuckDB spells differently. This is the
  * standard hash-mod sampling trick, shuffled-free and scan-local: at
  * 100 TB the sample is a pushed-down filter over the scan.
  */
object Sampling {

  /** 2-hex-char md5 bucket of the doc id: 256 buckets, '00'..'ff'. */
  def hashBucket(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    substring(md5(c.cast("string")), 1, 2)

  /** Per-source keep-thresholds (hex-string compare, inclusive): a
    * three-tier mixture — heavily sampled head sources, mid tier, tail.
    * Rates are n/256: '7f' ≈ 50%, '3f' ≈ 25%, '1f' ≈ 12.5%. */
  val tierOf: Map[String, String] =
    (0 to 4).map(i => s"src$i" -> "7f").toMap ++
      (5 to 9).map(i => s"src$i" -> "3f").toMap

  val defaultThreshold = "1f"

  /** Stratified sample: per-source rates via a broadcast rates dim —
    * the join is a BroadcastHashJoin and the keep predicate runs inside
    * the scan's codegen stage; no shuffle at any scale. */
  def stratifiedSampleQuery(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val rates = spark.createDataFrame(
        tierOf.toSeq.sortBy(_._1)).toDF("source", "thr")
    docs.join(broadcast(rates), Seq("source"), "left")
      .withColumn("thr", coalesce(col("thr"), lit(defaultThreshold)))
      .filter(hashBucket(col("doc_id")) <= col("thr"))
      .select(col("doc_id"), col("source"))
  }

  /** Reproducible train/val/test carve: 'cc' = 204/256 ≈ 80% train,
    * 'e5' = next 26/256 ≈ 10% val, rest test. Emitted as per-(source,
    * split) counts — the mixture report a pipeline logs before
    * training. */
  def splitCountsQuery(docs: DataFrame): DataFrame =
    docs.select(
        col("source"),
        when(hashBucket(col("doc_id")) <= "cc", "train")
          .when(hashBucket(col("doc_id")) <= "e5", "val")
          .otherwise("test").as("split"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"))

  /** Midpoint of the saturating length prior used as the keep
    * probability by [[qualityWeightedSampleQuery]] (a doc of this length
    * keeps with p = 0.5) — the same prior Similarity.hybridTopK blends. */
  val QwMidpoint = 300

  /** Quality-WEIGHTED (soft/rejection) sampling: instead of a hard
    * quality cutoff, each doc is kept with probability equal to its
    * quality score — here the saturating length prior
    * `n_chars / (n_chars + 300)`, the stand-in for any scalar score
    * riding the corpus. Soft sampling preserves a calibrated share of
    * every quality stratum (the practice FineWeb-style ablations use to
    * avoid filter-induced domain shift), rather than a cliff.
    *
    * Determinism: the uniform draw is the first two hex chars of
    * `md5(doc_id)` decoded to an integer 0..255 via position-in-alphabet
    * arithmetic (both engines spell the identical decode — no RNG, no
    * engine-specific hex parse), and the doc keeps iff
    * `u < floor(256 * p)`. Same monotone-reproducible property as
    * [[hashBucket]]: the same doc always draws the same u, so raising a
    * score only ever ADDS docs. Scan-local, zero shuffles: at 100 TB
    * this is a pushed-down filter over the scan. */
  def qualityWeightedSampleQuery(docs: DataFrame): DataFrame = {
    val hex = "0123456789abcdef"
    val u = (expr(s"instr('$hex', substring(md5(cast(doc_id AS STRING)), 1, 1)) - 1") * 16 +
      expr(s"instr('$hex', substring(md5(cast(doc_id AS STRING)), 2, 1)) - 1")).cast("int")
    val p = col("n_chars").cast("double") /
      (col("n_chars") + lit(QwMidpoint)).cast("double")
    docs.select(col("doc_id"), col("source"), col("n_chars"),
        u.as("u"), p.as("keep_prob"))
      .filter(col("u") < floor(lit(256.0) * col("keep_prob")).cast("int"))
      .select(col("doc_id"), col("source"), col("n_chars"), col("keep_prob"))
  }

  /** Split-leakage audit: exact-duplicate texts whose copies land in
    * MORE THAN ONE of the train/val/test splits — the cross-split
    * contamination the deterministic doc-id carve cannot see (the split
    * key is the id, so byte-identical re-crawls with different ids can
    * straddle the train/test boundary and leak evaluation data into
    * training). Composition of the [[splitCountsQuery]] assignment rule
    * with exact-dedup's content hash; run it BEFORE carving any eval
    * set out of a deduplicated-by-id corpus.
    *
    * Scale shape: one hash-partitioned aggregation keyed on the 32-hex
    * md5 of the text — uniform by construction (content hash), the same
    * single-shuffle envelope as `dedup_exact`; the HAVING cut means only
    * leaking groups (a vanishing fraction) survive the agg. */
  def splitLeakageQuery(docs: DataFrame): DataFrame =
    docs.select(
        md5(col("text")).as("text_md5"),
        when(hashBucket(col("doc_id")) <= "cc", "train")
          .when(hashBucket(col("doc_id")) <= "e5", "val")
          .otherwise("test").as("split"))
      .groupBy(col("text_md5"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("split")).as("n_splits"),
        min(col("split")).as("first_split"),
        max(col("split")).as("last_split"))
      .filter(col("n_splits") > 1)

  /** Token budget apportioned across sources by `mix_allocation`. */
  val MixBudget = 1000000L

  /** Mixture apportionment (the Pile/DoReMi-style source-weighting
    * table a training run starts from): given integer source weights
    * (here: the source's numeric suffix + 1 — a stand-in for the
    * configured mixture), split [[MixBudget]] target tokens across
    * sources by largest-remainder rounding, so the targets are EXACT
    * integers summing to the budget (floor division + the remainder
    * rank distributes the leftover). `epochs` = target/actual tokens is
    * the per-source up/down-sampling factor — the one double division.
    *
    * Scale shape: one per-source aggregation over the corpus (narrow
    * token counting inside the scan stage), then all arithmetic runs on
    * the #sources-row frame — the totals combine back via 1-row
    * broadcast cross joins, and the remainder-rank window sorts a
    * bounded-by-#sources relation, fine at any corpus size. */
  def mixAllocationQuery(docs: DataFrame, budget: Long = MixBudget): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val trimmed = regexp_replace(col("text"), Clean.EdgeWsRe, "")
    val bySource = docs
      .select(col("source"), size(split(trimmed, "\\s+")).cast("long").as("toks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
      .withColumn("weight",
        coalesce(expr("try_cast(regexp_extract(source, '\\\\d+', 0) AS BIGINT)"), lit(0L)) + 1L)
      .transform(graft.CacheScope.persist)
    val tw = bySource.agg(sum(col("weight")).as("tw"))
    val u = bySource.crossJoin(broadcast(tw))
      .withColumn("q", expr(s"(${budget}L * weight) div tw"))
      .withColumn("r", expr(s"(${budget}L * weight) % tw"))
    val sq = u.agg(sum(col("q")).as("sq"))
    // constant partition key: the frame is #sources rows, bounded by
    // construction — keeps the bounded window off the frameless path
    // (and its WARN) without changing the single-task execution.
    val rankW = Window.partitionBy(lit(0)).orderBy(col("r").desc, col("source"))
    u.crossJoin(broadcast(sq))
      .withColumn("rk", row_number().over(rankW))
      .withColumn("target_tokens",
        col("q") + when(col("rk") <= lit(budget) - col("sq"), 1L).otherwise(0L))
      .select(col("source"), col("weight"), col("n_docs"), col("n_tokens"),
        col("target_tokens"),
        (col("target_tokens").cast("double") / col("n_tokens").cast("double")).as("epochs"))
  }

  /** Temperature-balanced mixture (τ = 0.5): per-source token targets
    * proportional to `n_tokens^τ` — the multilingual up/down-sampling
    * practice (mT5/XLM-R temperature sampling: a low-resource source is
    * upsampled toward, but not all the way to, parity). τ is fixed at
    * 0.5 because `sqrt` is IEEE CORRECTLY ROUNDED in both engines while
    * general `pow` is not — the one τ that keeps the oracle bit-exact.
    *
    * Float determinism: the weight total is a LEFT FOLD over the
    * source-ordered weight list (both engines spell the same fold; a
    * plain SUM over doubles is accumulation-order-dependent and would
    * hash-differ), and each quota is the same mul/div/floor sequence.
    * The per-source relation is #sources rows — every list/fold here is
    * bounded by the source count, not the corpus. */
  def mixTemperatureQuery(docs: DataFrame, budget: Long = MixBudget): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val trimmed = regexp_replace(col("text"), Clean.EdgeWsRe, "")
    val bySource = docs
      .select(col("source"), size(split(trimmed, "\\s+")).cast("long").as("toks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
      .withColumn("w", sqrt(col("n_tokens").cast("double")))
      .transform(graft.CacheScope.persist)
    // deterministic total: fold source-ordered weights left to right
    val tw = bySource
      .agg(expr(
        """aggregate(
          |  transform(array_sort(collect_list(struct(source, w))), x -> x.w),
          |  CAST(0 AS DOUBLE), (s, v) -> s + v)""".stripMargin).as("tw"))
    val u = bySource.crossJoin(broadcast(tw))
      .withColumn("exact", lit(budget.toDouble) * col("w") / col("tw"))
      .withColumn("q", floor(col("exact")).cast("long"))
      .withColumn("r", col("exact") - col("q").cast("double"))
    val sq = u.agg(sum(col("q")).as("sq"))
    // constant partition key: the frame is #sources rows, bounded by
    // construction — keeps the bounded window off the frameless path
    // (and its WARN) without changing the single-task execution.
    val rankW = Window.partitionBy(lit(0)).orderBy(col("r").desc, col("source"))
    u.crossJoin(broadcast(sq))
      .withColumn("rk", row_number().over(rankW))
      .withColumn("target_tokens",
        col("q") + when(col("rk") <= lit(budget) - col("sq"), 1L).otherwise(0L))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("w").as("weight"),
        col("target_tokens"),
        (col("target_tokens").cast("double") / col("n_tokens").cast("double")).as("epochs"))
  }

  /** Per-language repeat ceiling for [[unimaxAllocationQuery]]: no
    * language's data is seen more than this many epochs however much
    * budget is left over (UniMax's core constraint — temperature
    * sampling has no such cap and can cycle a tiny language 100s of
    * times). */
  val UniMaxEpochCap = 2L

  /** UniMax language-balanced allocation (Chung et al. 2023): split a
    * character budget across languages as UNIFORMLY as possible subject
    * to a per-language repeat ceiling of [[UniMaxEpochCap]] epochs.
    * Greedy water-filling, smallest capacity first: each language gets
    * `min(capacity, remaining_budget / remaining_languages)`. The greedy
    * has a closed form — a language is budget-capped iff
    * `capacity * langs_from_here_on <= budget - smaller_capacities`
    * (exact BIGINT test; capped-ness is monotone in capacity order, so
    * the prefix sum only ever covers capped rows), and every uncapped
    * language shares the leftover equally (largest-remainder spread of
    * the integer remainder, ordered by capacity then language, keeps the
    * shares exact integers summing to the budget). The budget is
    * corpus-proportional (3/2 of total chars, integer division) so the
    * query exercises both branches at every scale: minority languages
    * hit the 2-epoch ceiling, the majority language absorbs the rest.
    *
    * Scale shape: one per-language aggregation inside the scan stage;
    * everything after runs on a #languages-row frame (windows ordered on
    * a bounded relation, 1-row broadcast scalar attaches) — the same
    * envelope as [[mixTemperatureQuery]], fine at any corpus size. */
  def unimaxAllocationQuery(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byLang = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .withColumn("capacity", col("n_chars") * lit(UniMaxEpochCap))
      .transform(graft.CacheScope.persist)
    val tot = byLang.agg(expr("(3 * sum(n_chars)) div 2").as("b"))
    // constant partition key: #languages rows, bounded by construction.
    val ord = Window.partitionBy(lit(0)).orderBy(col("capacity"), col("lang"))
    val c = byLang.crossJoin(broadcast(tot))
      .withColumn("i", row_number().over(ord))
      .withColumn("prefix", coalesce(
        sum(col("capacity")).over(ord.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("k", count(lit(1)).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("capped",
        col("capacity") * (col("k") - col("i") + 1L) <= col("b") - col("prefix"))
      .transform(graft.CacheScope.persist)
    val agg = c.agg(
      coalesce(sum(when(col("capped"), col("capacity"))), lit(0L)).as("s_capped"),
      sum(when(col("capped"), 0L).otherwise(1L)).as("m"))
    val urkW = Window.partitionBy(col("capped")).orderBy(col("i"))
    c.crossJoin(broadcast(agg))
      .withColumn("urk", row_number().over(urkW))
      .withColumn("alloc_chars", when(col("capped"), col("capacity"))
        .otherwise(expr("(b - s_capped) div m") +
          when(col("urk") <= expr("(b - s_capped) % m"), 1L).otherwise(0L)))
      .select(col("lang"), col("n_docs"), col("n_chars"), col("capacity"),
        col("alloc_chars"),
        (col("alloc_chars").cast("double") / col("n_chars").cast("double")).as("epochs"))
  }

  /** Per-source kept-doc budget for [[sourceCapSampleQuery]]. Sized to
    * bite at every gate scale (each sf's sources hold >20 docs). */
  val SourceCap = 20

  /** Per-source/domain document cap — the domain-balancing step of the
    * C4 / RefinedWeb / Dolma lineage: no single domain may contribute
    * more than `cap` documents, and WHICH docs survive is a uniform
    * deterministic draw (md5 of the doc id — the same unit-interval
    * device as the stratified/quality-weighted samplers), not head-of-
    * file order, so the kept subset is unbiased w.r.t. crawl order.
    *
    * Scale shape: the naive spelling is `row_number() OVER (PARTITION BY
    * source ORDER BY h)` — a per-source funnel, the exact shape the
    * round-9 de-funnels removed elsewhere (a hot domain = one task).
    * Instead, two-phase top-k (the tok_vocab idiom): phase 1 takes each
    * (source, input-partition)'s local top-`cap` by (h, doc_id) —
    * parallelism = the corpus partition count; phase 2 ranks the
    * survivors exactly — its per-source window reads ≤ cap × partitions
    * rows by construction, bounded whatever the corpus size. The final
    * rank is over the total order (h, doc_id), so the result is
    * deterministic and partition-layout-independent (any doc in the
    * global per-source top-cap is in its partition's local top-cap). */
  def sourceCapSampleQuery(docs: DataFrame, cap: Int = SourceCap): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col("doc_id"), col("source"),
      md5(col("doc_id").cast("string")).as("h"))
    val local = base
      .withColumn("pid", spark_partition_id())
      .withColumn("rk1", row_number().over(
        Window.partitionBy(col("source"), col("pid")).orderBy(col("h"), col("doc_id"))))
      .filter(col("rk1") <= cap)
      .drop("pid", "rk1")
    local
      .withColumn("cap_rank", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))).cast("long"))
      .filter(col("cap_rank") <= cap)
      .select(col("doc_id"), col("source"), col("cap_rank"))
  }

  /** The selected share of the corpus token mass: budget = total div 2. */
  val BudgetDenom = 2
  /** Range shards for the budget prefix sum (the pack_assignments
    * sharding, here over a single global stream). */
  val BudgetShards = 64

  /** TOKEN-BUDGET SELECTION (the DataComp / quality-threshold shape):
    * rank the corpus by a quality prior — longest documents first, the
    * same n_chars prior [[qualityWeightedSampleQuery]]'s keep
    * probability is monotone in, tie-broken by doc_id into a total
    * order — and keep documents greedily while the running token count
    * stays within a budget of total-corpus-words div [[BudgetDenom]].
    * Emits the kept docs with their inclusive running total (the
    * training-set manifest + the budget audit trail in one relation).
    *
    * Scale shape: a running sum over ONE global order is the
    * single-task window pathology, so it shards exactly like
    * `pack_assignments`: `repartitionByRange` on the order key gives
    * row-balanced, order-monotone shards (sampled quantiles), each
    * shard prefix-sums in parallel, and a carry pass over the ≤
    * [[BudgetShards]]-row totals frame broadcasts per-shard offsets
    * back (associativity makes any monotone sharding output-identical).
    * The budget scalar is a 1-row broadcast cross join. */
  def tokenBudgetQuery(docs: DataFrame, shards: Int = BudgetShards): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = docs.select(col("doc_id"), col("n_chars"),
      expr("size(filter(split(text, '\\\\s+'), x -> x != ''))").cast("long").as("n_words"))
    val budget = n.agg(expr(s"sum(n_words) div ${BudgetDenom}L").as("budget"))
    val nb = n.repartitionByRange(shards, col("n_chars").desc, col("doc_id"))
      .withColumn("bkt", spark_partition_id())
      .transform(graft.CacheScope.persist) // feeds shard totals AND the sharded window
    val winShard = Window.partitionBy(col("bkt"))
      .orderBy(col("n_chars").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry pass over the <= shards-row totals frame; the constant
    // partition key keeps the (bounded-by-construction) window off the
    // frameless-window path.
    val winCarry = Window.partitionBy(lit(0)).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = nb.groupBy(col("bkt")).agg(sum(col("n_words")).as("tot"))
      .withColumn("off", coalesce(sum(col("tot")).over(winCarry), lit(0L)))
      .select(col("bkt"), col("off"))
    nb.withColumn("run", sum(col("n_words")).over(winShard))
      .join(broadcast(offsets), "bkt")
      .withColumn("cum_words", (col("off") + col("run")).cast("long"))
      .crossJoin(broadcast(budget))
      .filter(col("cum_words") <= col("budget"))
      .select(col("doc_id"), col("n_words"), col("cum_words"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "select_token_budget" -> ((s, d) => tokenBudgetQuery(Tables.documents(s, d))),
    "sample_source_cap" -> ((s, d) => sourceCapSampleQuery(Tables.documents(s, d))),
    "sample_stratified" -> ((s, d) => stratifiedSampleQuery(Tables.documents(s, d))),
    "sample_quality_weighted" -> ((s, d) => qualityWeightedSampleQuery(Tables.documents(s, d))),
    "split_counts" -> ((s, d) => splitCountsQuery(Tables.documents(s, d))),
    "split_leakage" -> ((s, d) => splitLeakageQuery(Tables.documents(s, d))),
    "mix_allocation" -> ((s, d) => mixAllocationQuery(Tables.documents(s, d))),
    "mix_temperature" -> ((s, d) => mixTemperatureQuery(Tables.documents(s, d))),
    "mix_unimax" -> ((s, d) => unimaxAllocationQuery(Tables.documents(s, d))))

  def oracles: Map[String, String] = {
    val rateRows = tierOf.toSeq.sortBy(_._1)
      .map { case (s, t) => s"('$s', '$t')" }.mkString(", ")
    Map(
      "select_token_budget" ->
        s"""WITH n AS (
           |  SELECT doc_id, n_chars,
           |         CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_words
           |  FROM documents),
           |b AS (SELECT CAST(sum(n_words) // $BudgetDenom AS BIGINT) AS budget FROM n),
           |c AS (
           |  SELECT doc_id, n_words,
           |         CAST(sum(n_words) OVER (ORDER BY n_chars DESC, doc_id
           |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |           AS cum_words
           |  FROM n)
           |SELECT doc_id, n_words, cum_words FROM c, b
           |WHERE cum_words <= budget""".stripMargin,
      "sample_source_cap" ->
        s"""SELECT doc_id, source, cap_rank FROM (
           |  SELECT doc_id, source,
           |         row_number() OVER (PARTITION BY source
           |                            ORDER BY md5(doc_id::VARCHAR), doc_id) AS cap_rank
           |  FROM documents)
           |WHERE cap_rank <= $SourceCap""".stripMargin,
      "sample_stratified" ->
        s"""WITH rates(source, thr) AS (VALUES $rateRows)
           |SELECT d.doc_id, d.source
           |FROM documents d LEFT JOIN rates r ON d.source = r.source
           |WHERE substr(md5(d.doc_id::VARCHAR), 1, 2)
           |        <= COALESCE(r.thr, '$defaultThreshold')""".stripMargin,
      "sample_quality_weighted" ->
        s"""WITH draws AS (
           |  SELECT doc_id, source, n_chars,
           |         (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 1, 1)) - 1) * 16
           |           + (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 2, 1)) - 1) AS u,
           |         CAST(n_chars AS DOUBLE) / CAST(n_chars + $QwMidpoint AS DOUBLE) AS keep_prob
           |  FROM documents)
           |SELECT doc_id, source, n_chars, keep_prob
           |FROM draws WHERE u < CAST(floor(256.0 * keep_prob) AS INT)""".stripMargin,
      "split_leakage" ->
        """WITH s AS (
          |  SELECT md5(text) AS text_md5,
          |         CASE WHEN substr(md5(doc_id::VARCHAR), 1, 2) <= 'cc' THEN 'train'
          |              WHEN substr(md5(doc_id::VARCHAR), 1, 2) <= 'e5' THEN 'val'
          |              ELSE 'test' END AS split
          |  FROM documents)
          |SELECT text_md5,
          |       count(*) AS n_docs,
          |       CAST(count(DISTINCT split) AS BIGINT) AS n_splits,
          |       min(split) AS first_split,
          |       max(split) AS last_split
          |FROM s GROUP BY text_md5
          |HAVING count(DISTINCT split) > 1""".stripMargin,
      "split_counts" ->
        """SELECT source,
          |  CASE WHEN substr(md5(doc_id::VARCHAR), 1, 2) <= 'cc' THEN 'train'
          |       WHEN substr(md5(doc_id::VARCHAR), 1, 2) <= 'e5' THEN 'val'
          |       ELSE 'test' END AS split,
          |  count(*) AS n_docs
          |FROM documents GROUP BY 1, 2""".stripMargin,
      "mix_allocation" ->
        s"""WITH s AS (
           |  SELECT source,
           |         COALESCE(TRY_CAST(regexp_extract(source, '\\d+') AS BIGINT), 0) + 1 AS weight,
           |         count(*) AS n_docs,
           |         CAST(sum(len(regexp_split_to_array(
           |           regexp_replace(text, '^\\s+|\\s+$$', '', 'g'), '\\s+'))) AS BIGINT) AS n_tokens
           |  FROM documents GROUP BY source),
           |t AS (SELECT *,
           |        CAST(($MixBudget * weight) // (SELECT CAST(sum(weight) AS BIGINT) FROM s) AS BIGINT) AS q,
           |        CAST(($MixBudget * weight) % (SELECT CAST(sum(weight) AS BIGINT) FROM s) AS BIGINT) AS r
           |      FROM s),
           |v AS (SELECT *, row_number() OVER (ORDER BY r DESC, source) AS rk,
           |             (SELECT CAST(sum(q) AS BIGINT) FROM t) AS sq
           |      FROM t)
           |SELECT source, weight, n_docs, n_tokens,
           |       CAST(q + CASE WHEN rk <= $MixBudget - sq THEN 1 ELSE 0 END AS BIGINT) AS target_tokens,
           |       CAST(q + CASE WHEN rk <= $MixBudget - sq THEN 1 ELSE 0 END AS DOUBLE)
           |         / CAST(n_tokens AS DOUBLE) AS epochs
           |FROM v""".stripMargin,
      "mix_temperature" ->
        s"""WITH s AS (
           |  SELECT source, count(*) AS n_docs,
           |         CAST(sum(len(regexp_split_to_array(
           |           regexp_replace(text, '^\\s+|\\s+$$', '', 'g'), '\\s+'))) AS BIGINT) AS n_tokens,
           |         sqrt(CAST(CAST(sum(len(regexp_split_to_array(
           |           regexp_replace(text, '^\\s+|\\s+$$', '', 'g'), '\\s+'))) AS BIGINT) AS DOUBLE)) AS w
           |  FROM documents GROUP BY source),
           |tw AS (SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE), list(w ORDER BY source)),
           |                          (a, v) -> a + v) AS tw FROM s),
           |u AS (SELECT s.*, CAST($MixBudget AS DOUBLE) * w / tw AS ex FROM s, tw),
           |u2 AS (SELECT *, CAST(floor(ex) AS BIGINT) AS q,
           |              ex - CAST(CAST(floor(ex) AS BIGINT) AS DOUBLE) AS r
           |       FROM u),
           |v AS (SELECT *, row_number() OVER (ORDER BY r DESC, source) AS rk,
           |             (SELECT CAST(sum(q) AS BIGINT) FROM u2) AS sq
           |      FROM u2)
           |SELECT source, n_docs, n_tokens, w AS weight,
           |       CAST(q + CASE WHEN rk <= $MixBudget - sq THEN 1 ELSE 0 END AS BIGINT) AS target_tokens,
           |       CAST(q + CASE WHEN rk <= $MixBudget - sq THEN 1 ELSE 0 END AS DOUBLE)
           |         / CAST(n_tokens AS DOUBLE) AS epochs
           |FROM v""".stripMargin,
      "mix_unimax" ->
        s"""WITH s AS (
           |  SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars,
           |         CAST($UniMaxEpochCap * sum(n_chars) AS BIGINT) AS capacity
           |  FROM documents GROUP BY lang),
           |tot AS (SELECT CAST((3 * sum(n_chars)) // 2 AS BIGINT) AS b FROM s),
           |o AS (SELECT s.*, b,
           |        row_number() OVER (ORDER BY capacity, lang) AS i,
           |        CAST(COALESCE(sum(capacity) OVER (ORDER BY capacity, lang
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prefix,
           |        CAST(count(*) OVER () AS BIGINT) AS k
           |      FROM s, tot),
           |c AS (SELECT *, capacity * (k - i + 1) <= b - prefix AS capped FROM o),
           |agg AS (SELECT CAST(COALESCE(sum(capacity) FILTER (WHERE capped), 0) AS BIGINT) AS s_capped,
           |               CAST(count(*) FILTER (WHERE NOT capped) AS BIGINT) AS m
           |        FROM c),
           |r AS (SELECT c.*, s_capped, m,
           |        row_number() OVER (PARTITION BY capped ORDER BY i) AS urk
           |      FROM c, agg)
           |SELECT lang, n_docs, n_chars, capacity,
           |  CASE WHEN capped THEN capacity
           |       ELSE (b - s_capped) // m
           |            + CASE WHEN urk <= (b - s_capped) % m THEN 1 ELSE 0 END
           |  END AS alloc_chars,
           |  CAST(CASE WHEN capped THEN capacity
           |       ELSE (b - s_capped) // m
           |            + CASE WHEN urk <= (b - s_capped) % m THEN 1 ELSE 0 END
           |  END AS DOUBLE) / CAST(n_chars AS DOUBLE) AS epochs
           |FROM r""".stripMargin)
  }
}

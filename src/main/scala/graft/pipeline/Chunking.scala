package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Fixed-window document chunking with stride — the context-length
  * preparation step of an LLM training pipeline (HuggingFace
  * `return_overflowing_tokens` semantics): each document becomes
  * ceil-division many windows of `chunkWords` words advancing by
  * `strideWords`, so consecutive chunks overlap by `chunkWords -
  * strideWords` words and the final (possibly short) window always
  * covers the document tail.
  *
  * Scale shape: the word split is staged once per row (Barrier), the
  * window index materializes as a generated array + posexplode — a
  * narrow rowwise expansion (no shuffle, no state); at 100 TB the op
  * pipelines inside the scan and output size is input size × the
  * overlap factor, which is the physical lower bound.
  */
object Chunking {

  val ChunkWords = 32
  val StrideWords = 24

  def chunkQuery(docs: DataFrame,
      c: Int = ChunkWords, s: Int = StrideWords): DataFrame = {
    val s1 = docs.select(
      col("doc_id"),
      Stage.once(expr("filter(split(text, '\\\\s+'), x -> x != '')")).as("w"))
    // chunk count k = 1 + ceil(max(n - C, 0) / S), in exact integer
    // arithmetic spelled identically on both engines.
    val s2 = s1.select(
      col("doc_id"),
      Stage.once(expr(
        s"""transform(
           |  sequence(0, (greatest(size(w) - $c, 0) + ${s - 1}) div $s),
           |  i -> slice(w, i * $s + 1, $c))""".stripMargin)).as("chunks"))
    s2.select(col("doc_id"), posexplode(col("chunks")).as(Seq("chunk_idx", "chunk")))
      .select(
        col("doc_id"),
        col("chunk_idx"),
        size(col("chunk")).as("n_chunk_words"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }

  /** Context-window budget for the padding report. */
  val PackWindow = 64

  /** Training-cost report for pad-to-window batching: if each doc is
    * padded up to a multiple of `w` words (no cross-doc packing), how
    * much of the token budget is padding, per source? `padding_frac` =
    * 1 - real/padded — the number a pipeline inspects before deciding
    * to concat-and-split instead. One map-side-combined aggregation on
    * the low-cardinality source key; fractions are a single IEEE
    * division of exact ints, hash-identical to the oracle. */
  def packPaddingStatsQuery(docs: DataFrame, w: Int = PackWindow): DataFrame =
    docs.select(
        col("source"),
        expr("size(filter(split(text, '\\\\s+'), x -> x != ''))").as("n_words"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words").cast("long")).as("total_words"),
        sum(expr(s"CAST((n_words + ${w - 1}) div $w AS BIGINT)")).as("n_windows"))
      .select(
        col("source"), col("n_docs"), col("total_words"), col("n_windows"),
        expr(s"""IF(n_windows = 0, CAST(NULL AS DOUBLE),
                |   1.0D - CAST(total_words AS DOUBLE)
                |     / CAST(n_windows * ${w}L AS DOUBLE))""".stripMargin)
          .as("padding_frac"))

  /** GPT-style concat-and-split pack ASSIGNMENT: docs are concatenated
    * per source in doc_id order and the token stream is cut every
    * [[PackWindow]] words; each doc gets its starting offset and the
    * context-window index it begins in. This is the actual packing step
    * whose padding cost [[packPaddingStatsQuery]] only reports — the
    * deterministic map from corpus to training sequences.
    *
    * Scale shape (round-8 rewrite, resharded round 10): the obvious
    * spelling — one running-sum window per source — has parallelism
    * equal to the SOURCE COUNT: a single-source 100 TB corpus runs on
    * one task. The prefix sum is associative, so it shards instead by a
    * (source, bucket) composite key where the bucket is the RANGE
    * PARTITION id of a `repartitionByRange(buckets, doc_id)` exchange:
    * sampled-quantile boundaries balance shards by ROW COUNT whatever
    * the id distribution (ADVICE r9: the previous `(doc_id - lo) div
    * width` VALUE bucketing put nearly all rows in one shard when ids
    * cluster in a narrow band with far outliers), and partition ids are
    * monotone in doc_id by the range partitioner's contract — the only
    * property correctness needs. The running sum runs within each
    * (source, bkt) shard in parallel; each shard's carried-in offset is
    * the prefix sum of the per-shard totals — a second window over a
    * frame of at most #sources x ([[PackBuckets]]+1) rows that
    * broadcasts back. Identical output to the per-source window for ANY
    * monotone bucketing (associativity — boundary placement, sampled or
    * not, cannot leak into the result); pure integer arithmetic —
    * hash-exact vs the oracle. */
  val PackBuckets = 64

  def packAssignmentsQuery(docs: DataFrame, w: Int = PackWindow,
      buckets: Int = PackBuckets): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = docs.select(
        col("doc_id"), col("source"),
        expr("size(filter(split(text, '\\\\s+'), x -> x != ''))").as("n_words"))
    val nb = n.repartitionByRange(buckets, col("doc_id"))
      .withColumn("bkt", spark_partition_id())
      .transform(graft.CacheScope.persist) // feeds shard totals AND the sharded window
      // (persist also pins bkt: partition ids are stable under cached
      // blocks and, on recompute, under the same deterministic lineage)
    val winShard = Window.partitionBy(col("source"), col("bkt")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = nb.groupBy(col("source"), col("bkt"))
      .agg(sum(col("n_words").cast("long")).as("tot"))
    // Carry pass over the TINY totals frame (<= sources x (buckets+1)
    // rows): per-source exclusive prefix of shard totals. This window IS
    // partitioned by source alone — bounded by construction, not by data.
    val winCarry = Window.partitionBy(col("source")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("off", coalesce(sum(col("tot")).over(winCarry), lit(0L)))
      .select(col("source"), col("bkt"), col("off"))
    nb.withColumn("run", sum(col("n_words").cast("long")).over(winShard))
      .join(broadcast(offsets), Seq("source", "bkt"))
      .withColumn("start_offset", (col("off") + col("run") - col("n_words")).cast("long"))
      .select(
        col("doc_id"), col("source"), col("n_words"), col("start_offset"),
        expr(s"start_offset div ${w}L").as("pack_window"))
  }

  /** Deterministic global pre-training shuffle: every doc gets a
    * pseudo-random SHARD and its POSITION within that shard — the final
    * "shuffle the corpus, write S shard files, stream them in order"
    * step every training run performs so batches are not source- or
    * ingestion-ordered. The order key is content-free and reproducible
    * (first 60 md5 bits of the doc id, the cross-engine hash spelling
    * the embedding family established); shard = h mod [[ShuffleShards]].
    *
    * Scale shape: position-within-shard is a per-shard RANK — the naive
    * window has parallelism = shard count, a funnel once shards hold
    * ~TBs. Same cure as [[packAssignmentsQuery]]: rank is associative
    * under any monotone bucketing, so a `repartitionByRange(buckets,
    * h, doc_id)` exchange (sampled quantiles — row-balanced whatever
    * the hash distribution) gives (shard, bkt) shards whose local
    * row_numbers plus a carried per-shard prefix of bucket counts
    * reproduce the global rank exactly; the carry frame is
    * ≤ shards × (buckets+1) rows, broadcast back. Pure integer
    * arithmetic — hash-exact vs the oracle's per-shard window. */
  val ShuffleShards = 64
  val ShuffleBuckets = 64

  def shuffleShardsQuery(docs: DataFrame, shards: Int = ShuffleShards,
      buckets: Int = ShuffleBuckets): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = docs.select(col("doc_id"),
        expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)")
          .as("h"))
      .withColumn("shard", (col("h") % shards).cast("int")) // h >= 0
    val hb = h.repartitionByRange(buckets, col("h"), col("doc_id"))
      .withColumn("bkt", spark_partition_id())
      .transform(graft.CacheScope.persist) // feeds bucket counts AND the local ranks
    val totals = hb.groupBy(col("shard"), col("bkt")).agg(count(lit(1)).as("tot"))
    val winCarry = Window.partitionBy(col("shard")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("off", coalesce(sum(col("tot")).over(winCarry), lit(0L)))
      .select(col("shard"), col("bkt"), col("off"))
    val winLocal = Window.partitionBy(col("shard"), col("bkt"))
      .orderBy(col("h"), col("doc_id"))
    hb.withColumn("rn", row_number().over(winLocal))
      .join(broadcast(offsets), Seq("shard", "bkt"))
      .select(col("doc_id"), col("shard"), (col("off") + col("rn")).as("pos"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "doc_chunks" -> ((s, d) => chunkQuery(Tables.documents(s, d))),
    "pack_padding_stats" -> ((s, d) => packPaddingStatsQuery(Tables.documents(s, d))),
    "pack_assignments" -> ((s, d) => packAssignmentsQuery(Tables.documents(s, d))),
    "pack_shuffle_shards" -> ((s, d) => shuffleShardsQuery(Tables.documents(s, d))))

  def oracles: Map[String, String] = Map(
    "pack_shuffle_shards" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
         |  FROM documents)
         |SELECT doc_id, CAST(h % $ShuffleShards AS INT) AS shard,
         |       row_number() OVER (PARTITION BY h % $ShuffleShards
         |                          ORDER BY h, doc_id) AS pos
         |FROM h""".stripMargin,
    "pack_assignments" ->
      s"""WITH n AS (
         |  SELECT doc_id, source,
         |         len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS n_words
         |  FROM documents)
         |SELECT doc_id, source, n_words,
         |  CAST(sum(n_words) OVER (PARTITION BY source ORDER BY doc_id
         |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |       - n_words AS BIGINT) AS start_offset,
         |  CAST((sum(n_words) OVER (PARTITION BY source ORDER BY doc_id
         |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |        - n_words) // $PackWindow AS BIGINT) AS pack_window
         |FROM n""".stripMargin,
    "pack_padding_stats" ->
      s"""WITH n AS (
         |  SELECT source,
         |         len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS n_words
         |  FROM documents)
         |SELECT source,
         |  count(*) AS n_docs,
         |  CAST(sum(n_words) AS BIGINT) AS total_words,
         |  CAST(sum((n_words + ${PackWindow - 1}) // $PackWindow) AS BIGINT) AS n_windows,
         |  CASE WHEN sum((n_words + ${PackWindow - 1}) // $PackWindow) = 0 THEN NULL
         |       ELSE 1.0 - sum(n_words)::DOUBLE
         |              / (CAST(sum((n_words + ${PackWindow - 1}) // $PackWindow) AS BIGINT) * $PackWindow)::DOUBLE
         |  END AS padding_frac
         |FROM n GROUP BY source""".stripMargin,
    "doc_chunks" ->
      s"""WITH b AS (
         |  SELECT doc_id,
         |         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS w
         |  FROM documents),
         |k AS (
         |  SELECT doc_id, w,
         |         1 + (greatest(len(w) - $ChunkWords, 0) + ${StrideWords - 1}) // $StrideWords AS k
         |  FROM b),
         |s AS (
         |  SELECT doc_id, w, unnest(range(k)) AS i FROM k)
         |SELECT doc_id, i AS chunk_idx,
         |  len(w[i * $StrideWords + 1 : i * $StrideWords + $ChunkWords]) AS n_chunk_words,
         |  array_to_string(w[i * $StrideWords + 1 : i * $StrideWords + $ChunkWords], ' ') AS chunk_text
         |FROM s""".stripMargin)
}

package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic hashed bag-of-words text embeddings + semantic dedup
  * over them — the model-free bridge between the text pipeline and the
  * embedding-dedup family: when no learned embedding rides the corpus,
  * the feature-hashing trick (Weinberger et al. 2009, "Feature Hashing
  * for Large Scale Multitask Learning") gives every document a
  * deterministic sparse vector cheap enough to compute inline, and
  * cosine over it IS word-multiset similarity — near-dup detection that
  * survives word reordering, which the shingle family does not.
  *
  * Cross-engine exactness: the word→dimension hash is the first 8 hex
  * digits of md5 (both engines spell it: Spark `conv(substring(md5(w),
  * 1, 8), 16, 10)`, DuckDB `CAST('0x' || substr(md5(w), 1, 8) AS
  * BIGINT)`), weights are integer COUNTS, and the LSH planes are ±1
  * integers — so every sum (plane projections, dot products, norms) is
  * an EXACT integer aggregation, order-independent by construction.
  * Only the final cosine divides into doubles: deterministic IEEE ops
  * on exact ints, so the oracle hash-agrees with no fold gymnastics.
  * (Contrast the float-embedding family, which needs left-fold
  * spellings for every sum.)
  *
  * Scale shape: embedding is one explode + (doc, dim) count — narrow,
  * scan-shaped; dedup blocks pairs by an 8-bit sign-LSH bucket (the
  * same [[graft.relational.Similarity.planes]] constants, consumed as
  * integers), pairs join on bucket, and verification joins the two
  * sparse vectors dim-to-dim — work ∝ shared dims per candidate pair,
  * never corpus². Exact-text duplicates should be removed by the exact
  * dedup stage FIRST (standing pipeline order) — identical texts
  * produce identical vectors and would otherwise pair quadratically
  * inside their bucket, the same reason the embedding family collapses
  * identical vectors. */
object TextEmbed {

  val Dim = 64
  val NumPlanes = 8
  val DedupCosine = 0.9

  /** word → dimension: first 32 bits of md5, mod [[Dim]]. */
  private val dimExprS =
    s"CAST(conv(substring(md5(word), 1, 8), 16, 10) AS BIGINT) % $Dim"

  /** Sparse hashed-BoW embedding: one `(doc_id, dim, weight)` row per
    * populated dimension; weight = term count landing in the bucket. */
  def hashEmbeddingQuery(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(expr("filter(split(lower(text), '\\\\s+'), x -> x != '')")).as("word"))
      .select(col("doc_id"), expr(dimExprS).as("dim"))
      .groupBy(col("doc_id"), col("dim"))
      .agg(count(lit(1)).as("weight"))

  /** The ±1 plane entries as integer rows `(p, dim, sign)` — the SAME
    * LCG constants as the float-embedding family's first [[NumPlanes]]
    * planes, consumed exactly. */
  private def planeRows: Seq[(Int, Int, Int)] =
    for (p <- 0 until NumPlanes; d <- 0 until Dim)
      yield (p, d, graft.relational.Similarity.planes(p)(d).toInt)

  /** Semantic near-dup over the hashed vectors: sign-LSH bucket
    * blocking, dim-to-dim exact-integer dot verification, cosine >=
    * [[DedupCosine]]; lowest partner id wins. */
  def semanticDedupQuery(docs: DataFrame, threshold: Double = DedupCosine): DataFrame = {
    val ss = docs.sparkSession
    import ss.implicits._
    val e = hashEmbeddingQuery(docs).transform(graft.CacheScope.persist)
    val planes = planeRows.toDF("p", "pdim", "sign")
    // 8 exact-int plane sums per doc -> sign bits -> bucket id
    val buckets = e.join(broadcast(planes), col("dim") === col("pdim"))
      .groupBy(col("doc_id"), col("p"))
      .agg(sum(col("weight") * col("sign")).as("pv"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("pv") > 0, expr("CAST(shiftleft(1, p) AS BIGINT)"))
        .otherwise(0L)).as("bucket"))
    val norms = e.groupBy(col("doc_id"))
      .agg(sum(col("weight") * col("weight")).as("nn"))
    val cand = buckets.as("x").join(buckets.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
    val dots = cand
      .join(e.select(col("doc_id").as("id_a"), col("dim"), col("weight").as("wa")),
        Seq("id_a"))
      .join(e.select(col("doc_id").as("id_b"), col("dim"), col("weight").as("wb")),
        Seq("id_b", "dim"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("wa") * col("wb")).as("dot"))
    dots
      .join(norms.select(col("doc_id").as("id_a"), col("nn").as("na")), "id_a")
      .join(norms.select(col("doc_id").as("id_b"), col("nn").as("nb")), "id_b")
      .filter(col("dot").cast("double") /
        (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))) >= threshold)
      .groupBy(col("id_b").as("duplicate_id"))
      .agg(min(col("id_a")).as("original_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "doc_hash_embedding" -> ((s, d) => hashEmbeddingQuery(Tables.documents(s, d))),
    "dedup_semantic_text" -> ((s, d) => semanticDedupQuery(Tables.documents(s, d))))

  // -----------------------------------------------------------------------
  // DuckDB oracle — same integer algebra; planes interpolated as VALUES.
  // -----------------------------------------------------------------------

  private val dimExprD =
    s"CAST('0x' || substr(md5(word), 1, 8) AS BIGINT) % $Dim"

  private val embedCte =
    s"""e AS (
       |  SELECT doc_id, $dimExprD AS dim, count(*) AS weight FROM (
       |    SELECT doc_id,
       |           unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |                              x -> x <> '')) AS word
       |    FROM documents)
       |  GROUP BY doc_id, dim)""".stripMargin

  def oracles: Map[String, String] = {
    val planeVals = planeRows
      .map { case (p, d, s) => s"($p, $d, $s)" }.mkString(", ")
    Map(
      "doc_hash_embedding" ->
        s"""WITH $embedCte
           |SELECT doc_id, dim, weight FROM e""".stripMargin,
      "dedup_semantic_text" ->
        s"""WITH $embedCte,
           |planes(p, pdim, sign) AS (VALUES $planeVals),
           |pv AS (
           |  SELECT doc_id, p, CAST(sum(weight * sign) AS BIGINT) AS pv
           |  FROM e JOIN planes ON e.dim = planes.pdim
           |  GROUP BY doc_id, p),
           |bkt AS (
           |  SELECT doc_id,
           |         CAST(sum(CASE WHEN pv > 0 THEN (1 << p) ELSE 0 END) AS BIGINT) AS bucket
           |  FROM pv GROUP BY doc_id),
           |nrm AS (SELECT doc_id, CAST(sum(weight * weight) AS BIGINT) AS nn
           |        FROM e GROUP BY doc_id),
           |cand AS (
           |  SELECT x.doc_id AS id_a, y.doc_id AS id_b
           |  FROM bkt x JOIN bkt y ON x.bucket = y.bucket AND x.doc_id < y.doc_id),
           |dots AS (
           |  SELECT id_a, id_b, CAST(sum(ea.weight * eb.weight) AS BIGINT) AS dot
           |  FROM cand
           |  JOIN e ea ON ea.doc_id = id_a
           |  JOIN e eb ON eb.doc_id = id_b AND eb.dim = ea.dim
           |  GROUP BY id_a, id_b)
           |SELECT id_b AS duplicate_id, min(id_a) AS original_id
           |FROM dots
           |JOIN nrm na ON na.doc_id = id_a
           |JOIN nrm nb ON nb.doc_id = id_b
           |WHERE CAST(dot AS DOUBLE)
           |        / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE)))
           |      >= $DedupCosine
           |GROUP BY id_b""".stripMargin)
  }
}

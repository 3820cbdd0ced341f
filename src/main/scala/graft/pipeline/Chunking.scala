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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "doc_chunks" -> ((s, d) => chunkQuery(Tables.documents(s, d))))

  def oracles: Map[String, String] = Map(
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

package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Word-level tokenizer family (T1/T4/T6/T7 in their SQL-expressible
  * form; reference: src/processing/tokenizer.py). The reference's default
  * is BPE (see [[Bpe]] for the real trainer/encoder); this word-level
  * variant expresses the whole tokenize-and-count path in pure relational
  * operations so the driver's DuckDB oracle can hash-check it end to end:
  *
  *  - vocab: top-N words by (freq DESC, word ASC) with ids offset past
  *    the 4 specials (<pad>=0 <unk>=1 <bos>=2 <eos>=3,
  *    tokenizer.py:58-133) — a distributed groupBy + per-partition
  *    top-N (TakeOrderedAndProject) + bounded driver-side rank;
  *  - encode: explode words, broadcast-join the vocab, re-aggregate per
  *    doc (+2 tokens for bos/eos framing) — no UDF anywhere;
  *  - stats: TokenizationStats (tokenizer.py:24-55): totals, averages,
  *    compression ratio.
  *
  * At 100 TB the vocab build is a word-frequency aggregation (map-side
  * combine into a ~vocab-sized shuffle) and encode is a broadcast join —
  * both canonical scale-safe shapes. VocabWords is deliberately smaller
  * than the corpus vocabulary so the <unk> path is exercised.
  */
object Tokenize {

  val VocabWords = 20
  val NumSpecials = 4 // <pad> <unk> <bos> <eos>
  val UnkId = 1
  val BosId = 2
  val EosId = 3

  /** (token, id, freq) — specials + top-N corpus words.
    *
    * The top-N is `orderBy(...).limit(VocabWords)`, which Spark plans as
    * TakeOrderedAndProject: each partition keeps only its local top
    * VocabWords rows, so the driver receives at most
    * `numPartitions * VocabWords` candidates — never the corpus's full
    * distinct-word universe. (A `row_number().over(Window.orderBy(...))`
    * here would funnel ALL distinct words through one partition — a hard
    * scale-killer at 100 TB.) Ids are then assigned by a driver-side zip
    * over the <= VocabWords collected rows, which is bounded by
    * construction. */
  def vocabQuery(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val words = docs.select(explode(split(col("text"), "\\s+")).as("token"))
      .filter(col("token") =!= "")
    val top = words.groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(VocabWords) // TakeOrderedAndProject: per-partition top-N, no global sort
      .collect()
    val ranked = top.zipWithIndex.map { case (r, i) =>
      (r.getString(0), NumSpecials + i, r.getLong(1))
    }.toSeq
    val specials = Seq(("<pad>", 0, 0L), ("<unk>", UnkId, 0L),
      ("<bos>", BosId, 0L), ("<eos>", EosId, 0L))
    spark.createDataFrame(specials ++ ranked).toDF("token", "id", "freq")
  }

  /** Per-doc encode summary: token counts, unk counts, id checksum.
    * (The id *sequence* is an array — summarized to scalars here because
    * the driver hash-compares scalar columns; the sum is order-free.)
    *
    * Round 11: the vocabulary is DRIVER-KNOWN (vocabQuery's bounded
    * collect), so the summary folds in-row over the WordCounts kernel
    * against a map LITERAL — the word explode, the broadcast join, and
    * the doc_id re-aggregation exchange are gone; the query is
    * scan-local at any corpus size (the vocab map is id-table-sized,
    * the class a real tokenizer vocabulary stays in). */
  def encodeQuery(docs: DataFrame): DataFrame = {
    val vm: Map[String, Int] = vocabQuery(docs).filter(col("id") >= NumSpecials)
      .select(col("token"), col("id")).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val vmap = typedLit(vm)
    def idOf(x: org.apache.spark.sql.Column) =
      element_at(vmap, x.getField("word"))
    docs.select(col("doc_id"),
        graft.functions.WordCounts(col("text"), lower = false).as("ws"))
      .filter(size(col("ws")) > 0) // zero-word docs never entered the join form
      .select(col("doc_id"),
        (aggregate(col("ws"), lit(0L), (a, x) => a + x.getField("n")) + 2)
          .as("n_tokens"), // + <bos> and <eos>
        aggregate(col("ws"), lit(0L), (a, x) =>
          a + when(idOf(x).isNull, x.getField("n")).otherwise(lit(0L)))
          .as("n_unk"),
        (aggregate(col("ws"), lit(0L), (a, x) =>
          a + x.getField("n") * coalesce(idOf(x).cast("long"), lit(UnkId.toLong)))
          + BosId + EosId).as("sum_ids"))
  }

  /** T7 corpus stats (TokenizationStats, tokenizer.py:24-55). */
  def statsQuery(docs: DataFrame): DataFrame = {
    val enc = encodeQuery(docs)
    val chars = docs.agg(sum(length(col("text"))).as("total_chars"))
    enc.agg(
        count(lit(1)).as("total_documents"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_unk")).as("total_unk"))
      .crossJoin(chars)
      .select(
        col("total_documents"), col("total_tokens"), col("total_unk"), col("total_chars"),
        (col("total_tokens").cast("double") / col("total_documents").cast("double"))
          .as("avg_tokens_per_doc"),
        (col("total_chars").cast("double") / col("total_tokens").cast("double"))
          .as("compression_ratio"))
  }

  /** GPT-2-style pre-tokenizer pattern, restricted to the Java∩RE2
    * regex subset: contraction suffixes, space-prefixed letter runs,
    * digit runs, punctuation runs. Deviation from the original
    * (documented): GPT-2's trailing `\s+(?!\S)` branch needs lookahead,
    * which RE2 lacks — pure-whitespace tokens are simply not counted
    * here (both engines agree with themselves, which is what the hash
    * gate needs). Alternation is leftmost-first in BOTH Java regex and
    * RE2, so the branch order semantics match. */
  val BpeIshRe = """'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"""

  /** Token counting with the BPE-ish regex next to plain whitespace
    * words — the "how many tokens is this corpus" sizing pass, per
    * source. A single map-side-combined aggregation; both counts are
    * codegen'd regexp_count over the scan. */
  def regexStatsQuery(docs: DataFrame): DataFrame =
    docs.select(
        col("source"),
        regexp_count(col("text"), lit(BpeIshRe)).as("n_bpeish"),
        regexp_count(col("text"), lit("""\S+""")).as("n_ws"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_bpeish").cast("long")).as("total_bpeish_tokens"),
        sum(col("n_ws").cast("long")).as("total_ws_words"))
      .select(
        col("source"), col("n_docs"), col("total_bpeish_tokens"), col("total_ws_words"),
        (col("total_bpeish_tokens").cast("double") / col("total_ws_words").cast("double"))
          .as("tokens_per_word"))

  /** Sink→source round-trip, oracle-fenced (round 16, verdict #6): write
    * a (doc_id, tokens) slice as JSONL through the S7 sink, read it back
    * through [[Sinks.readJsonl]]'s EXPLICIT schema (no inference pass),
    * and aggregate — the oracle computes the same aggregation from the
    * parquet truth, so a round-trip that loses or mangles ANY doc, token
    * or id hash-mismatches. The 5% `doc_id % 20` slice keeps the mark's
    * cost a sink exercise rather than a second corpus-wide write in
    * every bench rep; JSONL fidelity is content-independent, so the
    * slice proves the loop. The write happens eagerly at plan-build time
    * (it IS the operator under test); each call overwrites one
    * process-keyed scratch dir. */
  /** Scratch hygiene for `graft_jsonl_rt_*` dirs (round-17 advice):
    * without a sweep, every process run leaves its slice behind
    * forever. Runs ONCE per JVM (lazy val — the /tmp listing and any
    * multi-GB recursive delete of a crashed run's leavings must not
    * recur inside every timed bench window). A sibling dir is swept
    * only when its owner is provably gone: the pid is dead, or the
    * process now holding that pid STARTED AFTER the dir was last
    * written (pid reuse — the original owner must predate its own
    * writes, so a younger process cannot be it). A live owner's dir is
    * never touched regardless of age: it may still hold a lazy frame
    * over the data (round-17 review — the earlier day-old backstop
    * deleted live long-session dirs). If the JVM hides the start time,
    * a day-unmodified dir is presumed reused — the narrow residual
    * heuristic, now confined to that no-information case. */
  private lazy val sweepStaleRoundtripDirs: Unit = {
    val tmpRoot = new java.io.File(sys.props("java.io.tmpdir"))
    val staleRe = "graft_jsonl_rt_([0-9]+)_[0-9a-f]+".r
    val dayOld = System.currentTimeMillis() - 86400L * 1000
    Option(tmpRoot.listFiles()).getOrElse(Array.empty).foreach { f =>
      f.getName match {
        case staleRe(pid) if pid.toLong != ProcessHandle.current.pid =>
          val ownerGone = ProcessHandle.of(pid.toLong) match {
            case ph if ph.isEmpty => true
            case ph =>
              val started = ph.get.info().startInstant()
              if (started.isPresent) started.get.toEpochMilli > f.lastModified
              else f.lastModified < dayOld
          }
          if (ownerGone) Sinks.deleteRecursively(f)
        case _ => ()
      }
    }
  }

  def jsonlRoundtripQuery(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types._
    val toks = Tables.documents(s, d)
      .filter(col("doc_id") % 20 === 0)
      .select(col("doc_id"),
        filter(split(col("text"), "\\s+"), t => t =!= "").as("tokens"))
    // keyed by pid AND corpus path (round-16 review): the write is eager
    // but the returned read is lazy, so a pid-only dir would let a second
    // corpus in the same JVM overwrite this one's data before (or
    // between) executions of the first frame
    val tmpRoot = new java.io.File(sys.props("java.io.tmpdir"))
    val dir = new java.io.File(tmpRoot,
      f"graft_jsonl_rt_${ProcessHandle.current.pid}_" +
        f"${scala.util.hashing.MurmurHash3.stringHash(d)}%08x")
    sweepStaleRoundtripDirs
    Sinks.writeDocsJsonl(toks, dir.getAbsolutePath)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("tokens", ArrayType(StringType))))
    Sinks.readJsonl(s, dir.getAbsolutePath, schema)
      .agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum(size(col("tokens")).cast("long")), lit(0L)).as("total_tokens"),
        coalesce(sum(aggregate(col("tokens"), lit(0L), (a, x) => a + length(x))),
          lit(0L)).as("total_token_chars"),
        coalesce(sum(col("doc_id")), lit(0L)).as("sum_doc_ids"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tok_jsonl_roundtrip" -> ((s, d) => jsonlRoundtripQuery(s, d)),
    "tok_vocab" -> ((s, d) => vocabQuery(Tables.documents(s, d))),
    "tok_encode" -> ((s, d) => encodeQuery(Tables.documents(s, d))),
    "tok_stats" -> ((s, d) => statsQuery(Tables.documents(s, d))),
    "tok_regex_stats" -> ((s, d) => regexStatsQuery(Tables.documents(s, d))))

  // -----------------------------------------------------------------------
  // DuckDB oracle
  // -----------------------------------------------------------------------

  private val vocabCte =
    s"""words AS (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS token
       |          FROM documents),
       |freqs AS (SELECT token, count(*) AS freq FROM words WHERE token <> ''
       |          GROUP BY token),
       |top AS (SELECT token, CAST(row_number() OVER (ORDER BY freq DESC, token) + ${NumSpecials - 1} AS INT) AS id,
       |               CAST(freq AS BIGINT) AS freq
       |        FROM freqs
       |        QUALIFY id < ${VocabWords + NumSpecials})""".stripMargin

  def oracles: Map[String, String] = Map(
    // The oracle reads the PARQUET truth directly: if the JSONL loop the
    // Spark side runs through dropped a row, reordered bytes in a token,
    // or lost a doc_id, one of the four aggregates diverges.
    "tok_jsonl_roundtrip" ->
      s"""WITH t AS (SELECT doc_id,
         |             list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS tokens
         |           FROM documents WHERE doc_id % 20 = 0)
         |SELECT count(*) AS n_docs,
         |       CAST(coalesce(sum(len(tokens)), 0) AS BIGINT) AS total_tokens,
         |       CAST(coalesce(sum(coalesce(
         |         list_sum(list_transform(tokens, x -> length(x))), 0)), 0) AS BIGINT)
         |         AS total_token_chars,
         |       CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS sum_doc_ids
         |FROM t""".stripMargin,
    "tok_regex_stats" ->
      s"""SELECT source,
         |  count(*) AS n_docs,
         |  CAST(sum(len(regexp_extract_all(text, '${BpeIshRe.replace("'", "''")}'))) AS BIGINT)
         |    AS total_bpeish_tokens,
         |  CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS total_ws_words,
         |  CAST(sum(len(regexp_extract_all(text, '${BpeIshRe.replace("'", "''")}'))) AS BIGINT)::DOUBLE
         |    / CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT)::DOUBLE
         |    AS tokens_per_word
         |FROM documents GROUP BY source""".stripMargin,
    "tok_vocab" ->
      s"""WITH $vocabCte
         |SELECT token, id, freq FROM (VALUES
         |  ('<pad>', CAST(0 AS INT), CAST(0 AS BIGINT)), ('<unk>', $UnkId, 0),
         |  ('<bos>', $BosId, 0), ('<eos>', $EosId, 0)) AS s(token, id, freq)
         |UNION ALL
         |SELECT token, id, freq FROM top""".stripMargin,
    "tok_encode" ->
      s"""WITH $vocabCte,
         |doc_words AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS token
         |              FROM documents),
         |joined AS (SELECT doc_id, id FROM doc_words LEFT JOIN top USING (token)
         |           WHERE token <> '')
         |SELECT doc_id,
         |  CAST(count(*) + 2 AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unk,
         |  CAST(sum(coalesce(id, $UnkId)) + $BosId + $EosId AS BIGINT) AS sum_ids
         |FROM joined GROUP BY doc_id""".stripMargin,
    "tok_stats" ->
      s"""WITH $vocabCte,
         |doc_words AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS token
         |              FROM documents),
         |joined AS (SELECT doc_id, id FROM doc_words LEFT JOIN top USING (token)
         |           WHERE token <> ''),
         |enc AS (SELECT doc_id, count(*) + 2 AS n_tokens,
         |               sum(CASE WHEN id IS NULL THEN 1 ELSE 0 END) AS n_unk
         |        FROM joined GROUP BY doc_id),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS total_documents,
         |               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |               CAST(sum(n_unk) AS BIGINT) AS total_unk
         |        FROM enc),
         |ch AS (SELECT CAST(sum(length(text)) AS BIGINT) AS total_chars FROM documents)
         |SELECT total_documents, total_tokens, total_unk, total_chars,
         |       CAST(total_tokens AS DOUBLE) / CAST(total_documents AS DOUBLE) AS avg_tokens_per_doc,
         |       CAST(total_chars AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS compression_ratio
         |FROM tot, ch""".stripMargin)
}

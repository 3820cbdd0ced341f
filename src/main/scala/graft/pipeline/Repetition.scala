package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Gopher-style repetition quality signals (Rae et al. 2021, "Scaling
  * Language Models: ... Gopher", Table A1; also used by RefinedWeb and
  * Dolma): the fraction of duplicated words and the character share of
  * the single most-frequent word bigram. These flag boilerplate-heavy
  * and template-generated documents that pass simple length/ratio
  * filters. Goes beyond the reference's quality cascade
  * (quality_filter.py), which has line-repetition only (Q6).
  *
  * Scale shape: every signal is computed per-row with built-in
  * higher-order functions over the split-word array — one narrow
  * projection, zero shuffles, no UDFs. The bigram mode is a sort +
  * run-length fold (O(n log n) per doc), the same kernel as the Q6
  * most-common-line metric, extended to also carry the argmax. At 100 TB
  * this pipelines inside the scan; nothing crosses the wire.
  */
object Repetition {

  /** Per-doc repetition signals over whitespace words.
    *
    * - `dup_word_frac`: 1 - distinct/total words (0 = all unique).
    * - `top_bigram`: most frequent adjacent word pair; ties break to the
    *   lexicographically smallest (the fold keeps the FIRST max of the
    *   sorted bigram array — same tiebreak the oracle's
    *   `ORDER BY cnt DESC, bg ASC` picks).
    * - `top_bigram_char_frac`: chars covered by its occurrences
    *   (`cnt * (len(bigram) - 1)`, the join space excluded) over all
    *   non-space chars — Gopher's "fraction of characters in the most
    *   common 2-gram".
    *
    * Fractions are a single IEEE division of two exact ints, identical
    * on the DuckDB side, so the driver's value-hash matches bit-for-bit.
    */
  def repetitionQuery(docs: DataFrame): DataFrame = {
    // Stage 1: the word array, once (Barrier keeps CollapseProject from
    // inlining the split into every downstream use).
    val s1 = docs.select(
      col("doc_id"),
      Stage.once(expr("filter(split(text, '\\\\s+'), x -> x != '')")).as("w"),
      length(regexp_replace(col("text"), "\\s+", "")).as("nonspace"))
    // Stage 2: run-length fold over the sorted bigram array -> (count,
    // argmax) of the bigram mode. Strict `>` on the arg update keeps the
    // first (= smallest, post-sort) bigram among equal maxima.
    val s2 = s1.select(
      col("doc_id"), col("nonspace"),
      expr("size(w)").as("n_words"),
      expr("size(array_distinct(w))").as("n_distinct_words"),
      Stage.once(expr(
        """CASE WHEN size(w) < 2
          |  THEN named_struct('cnt', 0, 'bg', CAST(NULL AS STRING))
          |  ELSE aggregate(
          |    array_sort(zip_with(slice(w, 1, size(w) - 1),
          |                        slice(w, 2, size(w) - 1),
          |                        (a, b) -> concat(a, ' ', b))),
          |    named_struct('prev', CAST(NULL AS STRING),
          |                 'run', 0, 'best', 0,
          |                 'arg', CAST(NULL AS STRING)),
          |    (a, x) -> named_struct(
          |      'prev', x,
          |      'run', IF(a.prev <=> x, a.run + 1, 1),
          |      'best', GREATEST(a.best, IF(a.prev <=> x, a.run + 1, 1)),
          |      'arg', IF(IF(a.prev <=> x, a.run + 1, 1) > a.best, x, a.arg)),
          |    a -> named_struct('cnt', a.best, 'bg', a.arg))
          |END""".stripMargin)).as("top"))
    s2.select(
      col("doc_id"), col("n_words"), col("n_distinct_words"),
      expr("""IF(n_words = 0, CAST(NULL AS DOUBLE),
             |   1.0D - CAST(n_distinct_words AS DOUBLE) / CAST(n_words AS DOUBLE))"""
        .stripMargin).as("dup_word_frac"),
      col("top.bg").as("top_bigram"),
      col("top.cnt").as("top_bigram_cnt"),
      expr("""IF(nonspace = 0 OR top.cnt = 0, CAST(NULL AS DOUBLE),
             |   CAST(top.cnt * (length(top.bg) - 1) AS DOUBLE)
             |     / CAST(nonspace AS DOUBLE))""".stripMargin)
        .as("top_bigram_char_frac"))
  }

  /** Gopher's duplicate-LINE pair of signals (Rae et al. 2021, Table A1:
    * "duplicate line fraction" and "duplicate line character fraction")
    * — the boilerplate detector that catches nav-bars, cookie banners,
    * and template footers repeated inside one page, which the word-level
    * signals above dilute. A doc fails Gopher's filter when either
    * fraction is high; this query emits both so the cutoff stays a user
    * knob.
    *
    * Scale shape: identical to [[repetitionQuery]] — per-row HOF folds
    * over the in-row line array (sort + run-length for the duplicated-
    * char sum), zero shuffles, pipelines inside the scan at any corpus
    * size. */
  def gopherLinesQuery(docs: DataFrame): DataFrame = {
    val s1 = docs.select(
      col("doc_id"),
      Stage.once(expr("split(text, '\\n')")).as("lines"))
    val s2 = s1.select(
      col("doc_id"),
      expr("size(lines)").cast("long").as("n_lines"),
      expr("size(array_distinct(lines))").cast("long").as("n_distinct_lines"),
      // chars in lines occurring 2+ times: run-length fold over the
      // sorted array; on entering a run's 2nd member both members'
      // chars are charged, later members charge only themselves.
      expr(
        """aggregate(array_sort(lines),
          |  named_struct('prev', CAST(NULL AS STRING), 'run', 0,
          |               'dup', CAST(0 AS BIGINT)),
          |  (a, x) -> named_struct(
          |    'prev', x,
          |    'run', IF(a.prev <=> x, a.run + 1, 1),
          |    'dup', a.dup + IF(a.prev <=> x,
          |                      IF(a.run = 1, length(a.prev) + length(x), length(x)),
          |                      0)),
          |  a -> a.dup)""".stripMargin).as("dup_line_chars"),
      expr("aggregate(lines, CAST(0 AS BIGINT), (s, x) -> s + length(x))")
        .as("total_line_chars"))
    s2.select(
      col("doc_id"), col("n_lines"), col("n_distinct_lines"),
      (lit(1.0) - col("n_distinct_lines").cast("double") / col("n_lines").cast("double"))
        .as("dup_line_frac"),
      col("dup_line_chars"), col("total_line_chars"),
      when(col("total_line_chars") > 0,
        col("dup_line_chars").cast("double") / col("total_line_chars").cast("double"))
        .otherwise(lit(null).cast("double")).as("dup_line_char_frac"))
  }

  private val WsSplit = java.util.regex.Pattern.compile("\\s+")

  /** Code-point-order string compare — UTF8 binary order, the order
    * `array_sort`/DuckDB `list_sort`/`ORDER BY g ASC` all use. Java's
    * `String.compareTo` (UTF-16 unit order) disagrees exactly when a
    * supplementary character meets U+E000..U+FFFF, so the tie-break
    * below cannot use it. */
  private def cpCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** JVM kernel behind [[graft.functions.DupNgramsExpression]]: for
    * n ∈ {2,3,4}, (top-gram count, top-gram code-point length,
    * duplicated-gram char sum) over whitespace words. Counting is hash-
    * grouped (the Σ over duplicated grams is order-independent); the
    * top-gram tie on equal counts breaks to the code-point-smallest
    * gram — the same total order the retired sorted-fold and the
    * oracle's `ORDER BY cnt DESC, g ASC` pick. */
  /** Whitespace words, empties dropped — shared by both n-gram kernels. */
  private def splitWords(text: String): Array[String] = {
    val raw = WsSplit.split(text)
    var nw = 0
    var i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) nw += 1; i += 1 }
    val words = new Array[String](nw)
    var k = 0
    i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) { words(k) = raw(i); k += 1 }; i += 1 }
    words
  }

  def dupNgramsKernel(text: String): Array[Long] = {
    val words = splitWords(text)
    var i = 0
    val out = new Array[Long](9)
    var slot = 0
    var n = 2
    while (n <= 4) {
      val m = words.length - n + 1
      if (m > 0) {
        val counts = new java.util.HashMap[String, Int](m * 2)
        i = 0
        while (i < m) {
          val sb = new java.lang.StringBuilder()
          var w = 0
          while (w < n) {
            if (w > 0) sb.append(' ')
            sb.append(words(i + w))
            w += 1
          }
          counts.merge(sb.toString, 1, Integer.sum _)
          i += 1
        }
        var bestCnt = 0
        var bestGram: String = null
        var dup = 0L
        val js = n - 1
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val g = e.getKey
          val c = e.getValue
          if (c > bestCnt || (c == bestCnt && cpCompare(g, bestGram) < 0)) {
            bestCnt = c
            bestGram = g
          }
          if (c > 1) dup += c.toLong * (g.codePointCount(0, g.length) - js)
        }
        out(slot) = bestCnt.toLong
        out(slot + 1) = bestGram.codePointCount(0, bestGram.length).toLong
        out(slot + 2) = dup
      }
      slot += 3
      n += 1
    }
    out
  }

  /** INTERVAL-MERGED duplicated-n-gram char counts for n ∈ {2,3,4} —
    * Gopher Table A1's actual "fraction of characters in duplicate
    * n-grams" semantics (ADVICE r10): a word's characters count ONCE if
    * any duplicated n-gram occurrence covers the word, however many
    * overlapping occurrences do, so the derived fraction is bounded by
    * 1. Complements [[dupNgramsKernel]]'s occurrence-weighted ratio
    * (kept — that spelling matches the repo's established top-bigram
    * attribution and is a useful repetition INTENSITY signal; this one
    * is the paper-threshold-compatible coverage). Join spaces excluded
    * on both sides (non-space char accounting throughout). */
  def dupNgramsMergedKernel(text: String): Array[Long] = {
    val words = splitWords(text)
    val out = new Array[Long](3)
    var slot = 0
    var n = 2
    while (n <= 4) {
      val m = words.length - n + 1
      if (m > 0) {
        val grams = new Array[String](m)
        val counts = new java.util.HashMap[String, Int](m * 2)
        var i = 0
        while (i < m) {
          val sb = new java.lang.StringBuilder()
          var w = 0
          while (w < n) {
            if (w > 0) sb.append(' ')
            sb.append(words(i + w))
            w += 1
          }
          grams(i) = sb.toString
          counts.merge(grams(i), 1, Integer.sum _)
          i += 1
        }
        val covered = new Array[Boolean](words.length)
        i = 0
        while (i < m) {
          if (counts.get(grams(i)) > 1) {
            var w = i
            while (w < i + n) { covered(w) = true; w += 1 }
          }
          i += 1
        }
        var dup = 0L
        var j = 0
        while (j < words.length) {
          if (covered(j)) dup += words(j).codePointCount(0, words(j).length)
          j += 1
        }
        out(slot) = dup
      }
      slot += 1
      n += 1
    }
    out
  }

  /** The n-gram rows of Gopher Table A1 that [[repetitionQuery]] (top
    * 2-gram) and [[gopherLinesQuery]] (lines) don't cover: for n ∈
    * {2,3,4}, the character share of the most frequent word n-gram and
    * of ALL duplicated word n-grams. Char attribution matches the
    * repo's established top-bigram spelling: `cnt × (len(gram) − (n−1))`
    * (join spaces excluded) over non-space chars — occurrence-weighted,
    * not interval-merged, and spelled identically in the oracle.
    *
    * Scale shape: one native-kernel pass per row ([[dupNgramsKernel]] —
    * hash-grouped counts for all three n, code-point tie-break), zero
    * shuffles, pipelines inside the scan. */
  def dupNgramsQuery(docs: DataFrame): DataFrame = {
    // coalesce: the null-safe kernel would emit a NULL struct for a
    // NULL-text row, where the retired fold (size(NULL) < n) and the
    // oracle's COALESCE both emit zero counts; '' reproduces the zeros
    // (the fractions stay NULL via the nonspace guard either way).
    val s1 = docs.select(
      col("doc_id"),
      Stage.once(graft.functions.DupNgrams(coalesce(col("text"), lit("")))).as("g"),
      length(regexp_replace(col("text"), "\\s+", "")).as("nonspace"))
    // n ∈ {2,3,4} is hardwired into the kernel's struct schema.
    s1.select(
      Seq(col("doc_id"), col("nonspace")) ++ Seq(2, 3, 4).flatMap { n =>
        val js = n - 1
        Seq(
          expr(s"g.cnt$n").as(s"top_${n}gram_cnt"),
          expr(s"""IF(nonspace = 0 OR g.cnt$n = 0, CAST(NULL AS DOUBLE),
                  |   CAST(g.cnt$n * (g.len$n - $js) AS DOUBLE)
                  |     / CAST(nonspace AS DOUBLE))""".stripMargin)
            .as(s"top_${n}gram_char_frac"),
          expr(s"g.dup$n").as(s"dup_${n}gram_chars"),
          expr(s"""IF(nonspace = 0, CAST(NULL AS DOUBLE),
                  |   CAST(g.dup$n AS DOUBLE) / CAST(nonspace AS DOUBLE))"""
            .stripMargin).as(s"dup_${n}gram_char_frac"))
      }: _*)
  }

  /** The Gopher-threshold-compatible companion to [[dupNgramsQuery]]:
    * interval-merged duplicated-n-gram char coverage ≤ 1 per doc (see
    * [[dupNgramsMergedKernel]]). Same zero-shuffle scan-stage shape. */
  def dupNgramsMergedQuery(docs: DataFrame): DataFrame = {
    val s1 = docs.select(
      col("doc_id"),
      Stage.once(graft.functions.DupNgramsMerged(coalesce(col("text"), lit("")))).as("g"),
      length(regexp_replace(col("text"), "\\s+", "")).as("nonspace"))
    s1.select(
      Seq(col("doc_id"), col("nonspace")) ++ Seq(2, 3, 4).flatMap { n =>
        Seq(
          expr(s"g.mdup$n").as(s"dup_${n}gram_chars_merged"),
          expr(s"""IF(nonspace = 0, CAST(NULL AS DOUBLE),
                  |   CAST(g.mdup$n AS DOUBLE) / CAST(nonspace AS DOUBLE))"""
            .stripMargin).as(s"dup_${n}gram_char_frac_merged"))
      }: _*)
  }

  /** Corpus-wide top-20 word bigrams — the classic n-gram frequency
    * report. Scale shape: per-row bigram explode → hash-partitioned
    * count (map-side partial agg absorbs the heavy hitters) → global
    * top-k planned as TakeOrderedAndProject (per-partition top-20, then
    * a 20-row-per-partition merge on the driver — no global sort, no
    * single-partition funnel). Tiebreak (count desc, bigram asc) matches
    * the oracle's ORDER BY. */
  def topBigramsQuery(docs: DataFrame, k: Int = 20): DataFrame =
    docs.select(Stage.once(expr("filter(split(text, '\\\\s+'), x -> x != '')")).as("w"))
      .select(explode(expr(
        """CASE WHEN size(w) < 2 THEN CAST(array() AS ARRAY<STRING>)
          |ELSE zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1),
          |             (a, b) -> concat(a, ' ', b)) END""".stripMargin)).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("bigram"))
      .limit(k)

  /** Corpus-informed commonness score — the integer-exact cousin of the
    * CCNet/RefinedWeb LM-perplexity filter: a doc whose words are rare
    * corpus-wide (low average corpus frequency) is jargon/noise; one
    * whose words are all top-frequency is boilerplate. Two-pass by
    * nature (the corpus frequency table IS the model).
    *
    * Scale shape: per-doc (word, count) pairs first (one hash shuffle on
    * (doc_id, word)), then the frequency join runs on the COLLAPSED
    * per-doc vocabulary, not raw token rows — a "the"-heavy corpus ships
    * one row per (doc, "the"), not one per occurrence, which is the skew
    * story for a Zipf vocabulary; AQE skew-join splits any residual hot
    * word. Docs with zero words drop out (both engines inner-join).
    * The score is exact-int sums + one IEEE division — hash-identical
    * to the oracle. */
  def commonnessQuery(docs: DataFrame): DataFrame = {
    // In-row collapsed (word, count) pairs (round 11): the per-doc
    // vocabulary comes straight off the scan — no occurrence-row
    // exchange; case-preserving split (this score reads raw tokens).
    val perDocWord = docs
      .select(col("doc_id"),
        explode(graft.functions.WordCounts(col("text"), lower = false)).as("w"))
      .select(col("doc_id"), col("w.word").as("word"), col("w.n").as("n_occ"))
      .transform(graft.CacheScope.persist)
    val freq = perDocWord.groupBy(col("word"))
      .agg(sum(col("n_occ")).as("corpus_freq"))
    perDocWord.join(freq, "word")
      .groupBy(col("doc_id"))
      .agg(
        sum(col("n_occ")).as("n_words"),
        sum(col("n_occ") * col("corpus_freq")).as("total_freq"))
      .select(
        col("doc_id"), col("n_words"), col("total_freq"),
        (col("total_freq").cast("double") / col("n_words").cast("double"))
          .as("avg_word_freq"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quality_dup_ngrams" -> ((s, d) => dupNgramsQuery(Tables.documents(s, d))),
    "quality_dup_ngrams_merged" -> ((s, d) => dupNgramsMergedQuery(Tables.documents(s, d))),
    "quality_repetition" -> ((s, d) => repetitionQuery(Tables.documents(s, d))),
    "quality_gopher_lines" -> ((s, d) => gopherLinesQuery(Tables.documents(s, d))),
    "corpus_top_bigrams" -> ((s, d) => topBigramsQuery(Tables.documents(s, d))),
    "doc_commonness" -> ((s, d) => commonnessQuery(Tables.documents(s, d))))

  /** The oracle spells the same signals relationally (unnest + group-by +
    * rank) — an independent derivation, which is the point: two different
    * computations, one hash. */
  def oracles: Map[String, String] = Map(
    "quality_dup_ngrams" -> {
      val ns = Seq(2, 3, 4)
      val gramCtes = ns.map { n =>
        val concat = (0 until n).map(k => s"w[i + $k]").mkString(" || ' ' || ")
        s"""g$n AS (
           |  SELECT doc_id,
           |         unnest(list_transform(range(1, len(w) - ${n - 2}), i -> $concat)) AS g
           |  FROM base),
           |c$n AS (SELECT doc_id, g, count(*) AS cnt FROM g$n GROUP BY doc_id, g),
           |t$n AS (SELECT doc_id, g, cnt,
           |          row_number() OVER (PARTITION BY doc_id
           |                             ORDER BY cnt DESC, g ASC) AS rk
           |        FROM c$n),
           |a$n AS (SELECT doc_id,
           |          CAST(sum(CASE WHEN cnt > 1
           |                        THEN cnt * (length(g) - ${n - 1}) ELSE 0 END)
           |               AS BIGINT) AS dup
           |        FROM c$n GROUP BY doc_id)""".stripMargin
      }.mkString(",\n")
      val cols = ns.map { n =>
        s"""  COALESCE(t$n.cnt, 0) AS top_${n}gram_cnt,
           |  CASE WHEN b.nonspace = 0 OR t$n.cnt IS NULL THEN NULL
           |       ELSE (t$n.cnt * (length(t$n.g) - ${n - 1}))::DOUBLE
           |              / b.nonspace::DOUBLE
           |  END AS top_${n}gram_char_frac,
           |  COALESCE(a$n.dup, 0) AS dup_${n}gram_chars,
           |  CASE WHEN b.nonspace = 0 THEN NULL
           |       ELSE COALESCE(a$n.dup, 0)::DOUBLE / b.nonspace::DOUBLE
           |  END AS dup_${n}gram_char_frac""".stripMargin
      }.mkString(",\n")
      val joins = ns.map { n =>
        s"""LEFT JOIN t$n ON b.doc_id = t$n.doc_id AND t$n.rk = 1
           |LEFT JOIN a$n ON b.doc_id = a$n.doc_id""".stripMargin
      }.mkString("\n")
      s"""WITH base AS (
         |  SELECT doc_id,
         |         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS w,
         |         length(regexp_replace(text, '\\s+', '', 'g')) AS nonspace
         |  FROM documents),
         |$gramCtes
         |SELECT b.doc_id, b.nonspace,
         |$cols
         |FROM base b
         |$joins""".stripMargin
    },
    // Interval-merged variant: duplicated-gram OCCURRENCES (positions
    // kept) → union of covered word indices per (doc, n) → char sum of
    // covered words, once each — the naive spelling of the kernel's
    // boolean-coverage pass.
    "quality_dup_ngrams_merged" -> {
      val ns = Seq(2, 3, 4)
      val gramCtes = ns.map { n =>
        val concat = (0 until n).map(k => s"w[CAST(i + $k AS INTEGER)]").mkString(" || ' ' || ")
        s"""o$n AS (
           |  SELECT doc_id, i, $concat AS g
           |  FROM base, unnest(range(1, len(w) - ${n - 2})) AS t(i)),
           |d$n AS (SELECT doc_id, g FROM o$n GROUP BY doc_id, g HAVING count(*) > 1),
           |cov$n AS (
           |  SELECT DISTINCT o.doc_id, o.i + k.x AS j
           |  FROM o$n o JOIN d$n USING (doc_id, g)
           |  CROSS JOIN (SELECT unnest(range(0, $n)) AS x) k),
           |m$n AS (
           |  SELECT c.doc_id,
           |         CAST(sum(length(b.w[CAST(c.j AS INTEGER)])) AS BIGINT) AS mdup
           |  FROM cov$n c JOIN base b USING (doc_id) GROUP BY c.doc_id)""".stripMargin
      }.mkString(",\n")
      val cols = ns.map { n =>
        s"""  COALESCE(m$n.mdup, 0) AS dup_${n}gram_chars_merged,
           |  CASE WHEN b.nonspace = 0 THEN NULL
           |       ELSE COALESCE(m$n.mdup, 0)::DOUBLE / b.nonspace::DOUBLE
           |  END AS dup_${n}gram_char_frac_merged""".stripMargin
      }.mkString(",\n")
      val joins = ns.map(n => s"LEFT JOIN m$n ON b.doc_id = m$n.doc_id").mkString("\n")
      s"""WITH base AS (
         |  SELECT doc_id,
         |         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS w,
         |         length(regexp_replace(text, '\\s+', '', 'g')) AS nonspace
         |  FROM documents),
         |$gramCtes
         |SELECT b.doc_id, b.nonspace,
         |$cols
         |FROM base b
         |$joins""".stripMargin
    },
    "quality_gopher_lines" ->
      """WITH l AS (
        |  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM documents),
        |g AS (SELECT doc_id, line, count(*) AS cnt FROM l GROUP BY doc_id, line),
        |a AS (SELECT doc_id,
        |        CAST(sum(cnt) AS BIGINT) AS n_lines,
        |        CAST(count(*) AS BIGINT) AS n_distinct_lines,
        |        CAST(sum(CASE WHEN cnt > 1 THEN cnt * length(line) ELSE 0 END) AS BIGINT)
        |          AS dup_line_chars,
        |        CAST(sum(cnt * length(line)) AS BIGINT) AS total_line_chars
        |      FROM g GROUP BY doc_id)
        |SELECT doc_id, n_lines, n_distinct_lines,
        |  1.0 - CAST(n_distinct_lines AS DOUBLE) / CAST(n_lines AS DOUBLE) AS dup_line_frac,
        |  dup_line_chars, total_line_chars,
        |  CASE WHEN total_line_chars > 0
        |       THEN CAST(dup_line_chars AS DOUBLE) / CAST(total_line_chars AS DOUBLE)
        |       ELSE NULL END AS dup_line_char_frac
        |FROM a""".stripMargin,
    "doc_commonness" ->
      s"""WITH pdw AS (
         |  SELECT doc_id, word, count(*) AS n_occ
         |  FROM (SELECT doc_id,
         |               unnest(list_filter(regexp_split_to_array(text, '\\s+'),
         |                                  x -> x <> '')) AS word
         |        FROM documents)
         |  GROUP BY doc_id, word),
         |freq AS (
         |  SELECT word, CAST(sum(n_occ) AS BIGINT) AS corpus_freq
         |  FROM pdw GROUP BY word)
         |SELECT p.doc_id,
         |  CAST(sum(p.n_occ) AS BIGINT) AS n_words,
         |  CAST(sum(p.n_occ * f.corpus_freq) AS BIGINT) AS total_freq,
         |  CAST(sum(p.n_occ * f.corpus_freq) AS BIGINT)::DOUBLE
         |    / CAST(sum(p.n_occ) AS BIGINT)::DOUBLE AS avg_word_freq
         |FROM pdw p JOIN freq f USING (word)
         |GROUP BY p.doc_id""".stripMargin,
    "corpus_top_bigrams" ->
      s"""WITH w AS (
         |  SELECT list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS w
         |  FROM documents),
         |bg AS (
         |  SELECT unnest(list_transform(range(1, len(w)),
         |                               i -> w[i] || ' ' || w[i + 1])) AS bigram
         |  FROM w)
         |SELECT bigram, count(*) AS n_occurrences
         |FROM bg GROUP BY bigram
         |ORDER BY n_occurrences DESC, bigram ASC
         |LIMIT 20""".stripMargin,
    "quality_repetition" ->
      s"""WITH base AS (
         |  SELECT doc_id,
         |         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS w,
         |         length(regexp_replace(text, '\\s+', '', 'g')) AS nonspace
         |  FROM documents),
         |b AS (
         |  SELECT doc_id, nonspace, len(w) AS n_words,
         |         len(list_distinct(w)) AS n_distinct_words, w
         |  FROM base),
         |bg AS (
         |  SELECT doc_id,
         |         unnest(list_transform(range(1, len(w)),
         |                               i -> w[i] || ' ' || w[i + 1])) AS bg
         |  FROM b),
         |top AS (
         |  SELECT doc_id, bg, count(*) AS cnt,
         |         row_number() OVER (PARTITION BY doc_id
         |                            ORDER BY count(*) DESC, bg ASC) AS rk
         |  FROM bg GROUP BY doc_id, bg)
         |SELECT b.doc_id, b.n_words, b.n_distinct_words,
         |  CASE WHEN b.n_words = 0 THEN NULL
         |       ELSE 1.0 - b.n_distinct_words::DOUBLE / b.n_words::DOUBLE
         |  END AS dup_word_frac,
         |  t.bg AS top_bigram,
         |  COALESCE(t.cnt, 0) AS top_bigram_cnt,
         |  CASE WHEN b.nonspace = 0 OR t.cnt IS NULL THEN NULL
         |       ELSE (t.cnt * (length(t.bg) - 1))::DOUBLE / b.nonspace::DOUBLE
         |  END AS top_bigram_char_frac
         |FROM b LEFT JOIN top t ON b.doc_id = t.doc_id AND t.rk = 1""".stripMargin)
}

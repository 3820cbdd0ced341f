package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Quality-filter stage.
  *
  * Reproduces the reference's `QualityFilter.check` (reference:
  * src/processing/quality_filter.py:150-254): ten predicates evaluated in a
  * fixed order, first failure wins and names the document's `reason`. Here
  * that is one `CASE WHEN` cascade — a single narrow projection, no UDFs,
  * no shuffles; at 100 TB the whole stage pipelines over the scan, and the
  * reference's "cheap checks first" cost heuristic is preserved by WHEN
  * ordering (the language check stays last and only ever sees a 1000-char
  * prefix, mirroring quality_filter.py:245).
  *
  * Everything is expressible in both Spark SQL and DuckDB SQL (list/lambda
  * functions), so the whole cascade is oracle-checkable.
  */
object Quality {

  /** Thresholds mirroring quality_filter.py:94-137 / pipeline_config.yaml:41-58.
    * Word-count/avg-word-length defaults are tightened for the driver's
    * synthetic docs (wc 10-99, awl 3.7-5.3) so the registered queries
    * exercise several cascade branches; the reference defaults are
    * minWords=50, maxWords=100000, avg word length in [3.0, 15.0]. */
  final case class Config(
      minWords: Int = 25,
      maxWords: Int = 90,
      minAvgWordLen: Double = 4.1,
      maxAvgWordLen: Double = 4.9,
      minAlphaRatio: Double = 0.7,
      maxDigitRatio: Double = 0.3,
      maxSymbolRatio: Double = 0.2,
      maxRepetitionRatio: Double = 0.3,
      maxBulletRatio: Double = 0.5,
      maxBoilerplate: Int = 3,
      allowedLanguages: Seq[String] = Seq("en"))

  /** reference quality_filter.py:82-92, joined with `|` and (?i) as at :140-143 */
  val BoilerplateRe: String =
    """(?i)copyright \d{4}|all rights reserved|terms of service|privacy policy|cookie policy|subscribe to our newsletter|click here to|share on facebook|follow us on twitter"""
  /** reference quality_filter.py:226 */
  val BulletRe = """^\s*[-•*►▪▸]\s"""

  /** Tiny public-stopword profiles for the n-gram-free language heuristic
    * (the reference calls langdetect, quality_filter.py:245; we keep its
    * *semantics* — allowed-set check, undetectable ⇒ pass — with a
    * deterministic, SQL-expressible detector). */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
      "on", "are", "with", "as", "at", "by", "this", "have", "from", "be"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu",
      "den", "von", "auf", "für", "im", "dem", "des", "als", "auch", "es"),
    "es" -> Seq("el", "los", "las", "que", "y", "en", "un", "una", "es", "por",
      "con", "para", "del", "se", "su", "al", "lo", "como", "más", "pero"),
    "fr" -> Seq("le", "les", "des", "et", "une", "est", "pour", "dans", "qui", "au",
      "pas", "sur", "ne", "ce", "vous", "nous", "mais", "ou", "si", "être"))

  // -----------------------------------------------------------------------
  // Per-document metric expressions (Spark SQL dialect). Input column: `text`.
  // -----------------------------------------------------------------------

  val wcS = """regexp_count(text, '\\S+')"""
  val nonspaceS = """length(regexp_replace(text, '\\s', ''))"""
  val alphaS = """length(regexp_replace(text, '[^\\p{L}]', ''))"""
  val digitS = """length(regexp_replace(text, '[^\\p{Nd}]', ''))"""
  /** Python sum(len(w) for w in words) == non-whitespace char count. */
  val avgWordLenS = s"""$nonspaceS / $wcS"""
  val linesS = """split(text, '\\n')"""
  val strippedNeS =
    s"""filter(transform($linesS, l -> regexp_replace(l, '^\\\\s+|\\\\s+$$', '')), x -> x <> '')"""
  val maxRepS =
    s"""array_max(transform($strippedNeS, x -> size(filter($strippedNeS, y -> y = x))))"""
  val bulletLinesS = s"""size(filter($linesS, l -> l rlike '${BulletRe.replace("\\", "\\\\")}'))"""
  val boilerS = s"""regexp_count(text, '${BoilerplateRe.replace("\\", "\\\\")}')"""

  private def hitsS(words: Seq[String]): String =
    s"""size(filter(split(lower(substring(text, 1, 1000)), '\\\\s+'),
       | w -> w in (${words.map(w => s"'$w'").mkString(",")})))""".stripMargin

  /** argmax over stopword-hit counts; ties break by profile order; all-zero ⇒ unknown. */
  val langS: String = {
    val hits = Stopwords.map { case (l, ws) => l -> hitsS(ws) }
    val conds = hits.zipWithIndex.map { case ((l, h), i) =>
      val geRest = hits.drop(i + 1).map { case (_, h2) => s"$h >= $h2" }
      (s"(${(geRest :+ s"$h > 0").mkString(" AND ")})", l)
    }
    "CASE " + conds.map { case (c, l) => s"WHEN $c THEN '$l'" }.mkString(" ") +
      " ELSE 'unknown' END"
  }

  /** The ordered first-failure cascade (Spark SQL dialect) —
    * quality_filter.py:163-253 transliterated into one CASE. */
  def reasonCascadeS(cfg: Config): String = {
    val langOk =
      if (cfg.allowedLanguages.isEmpty) "true"
      else s"($langS) = 'unknown' OR ($langS) IN (${cfg.allowedLanguages.map(l => s"'$l'").mkString(",")})"
    s"""CASE
       | WHEN $wcS < ${cfg.minWords} THEN 'too_short'
       | WHEN $wcS > ${cfg.maxWords} THEN 'too_long'
       | WHEN $avgWordLenS < ${cfg.minAvgWordLen} THEN 'short_avg_word_length'
       | WHEN $avgWordLenS > ${cfg.maxAvgWordLen} THEN 'long_avg_word_length'
       | WHEN $nonspaceS > 0 AND $alphaS / $nonspaceS < ${cfg.minAlphaRatio} THEN 'low_alpha_ratio'
       | WHEN $nonspaceS > 0 AND $digitS / $nonspaceS > ${cfg.maxDigitRatio} THEN 'high_digit_ratio'
       | WHEN $nonspaceS > 0 AND ($nonspaceS - $alphaS - $digitS) / $nonspaceS > ${cfg.maxSymbolRatio} THEN 'high_symbol_ratio'
       | WHEN size($linesS) > 1 AND size($strippedNeS) > 0
       |   AND $maxRepS / size($linesS) > ${cfg.maxRepetitionRatio} THEN 'high_repetition'
       | WHEN $bulletLinesS / size($linesS) > ${cfg.maxBulletRatio} THEN 'mostly_bullet_list'
       | WHEN $boilerS > ${cfg.maxBoilerplate} THEN 'boilerplate_content'
       | WHEN NOT ($langOk) THEN 'wrong_language'
       | ELSE 'passed'
       |END""".stripMargin
  }

  /** Reason column usable in any DataFrame pipeline. */
  def reason(cfg: Config = Config()): Column = expr(reasonCascadeS(cfg))

  // -----------------------------------------------------------------------
  // Registered queries
  // -----------------------------------------------------------------------

  /** Per-doc scores + first-failing reason (Q11: every metric as a column —
    * quality_filter.py:160-253 stashes them in `scores`). */
  def cascadeQuery(docs: DataFrame, cfg: Config = Config()): DataFrame =
    docs.selectExpr(
      "doc_id",
      s"$wcS AS word_count",
      s"$avgWordLenS AS avg_word_length",
      s"CASE WHEN $nonspaceS > 0 THEN $alphaS / $nonspaceS END AS alpha_ratio",
      s"CASE WHEN $nonspaceS > 0 THEN $digitS / $nonspaceS END AS digit_ratio",
      s"$boilerS AS boilerplate_matches",
      s"$langS AS detected_language",
      s"${reasonCascadeS(cfg)} AS reason")

  /** Q10/A3: histogram of filter reasons (quality_filter.py:272-287,
    * src/main.py:281-292) — one shuffle on a ≤12-value key. */
  def histogramQuery(docs: DataFrame, cfg: Config = Config()): DataFrame =
    docs.select(reason(cfg).as("reason")).groupBy("reason")
      .agg(count(lit(1)).as("n_docs"))

  /** The surviving documents (filter_batch keep-side, quality_filter.py:276-281). */
  def passedQuery(docs: DataFrame, cfg: Config = Config()): DataFrame =
    docs.filter(reason(cfg) === "passed").select("doc_id", "lang", "source", "n_chars")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quality_cascade" -> ((s, d) => cascadeQuery(Tables.documents(s, d))),
    "quality_histogram" -> ((s, d) => histogramQuery(Tables.documents(s, d))),
    "quality_passed" -> ((s, d) => passedQuery(Tables.documents(s, d))))

  // -----------------------------------------------------------------------
  // DuckDB oracle (RE2 + list lambdas)
  // -----------------------------------------------------------------------

  val wcD = """len(regexp_extract_all(text, '\S+'))"""
  val nonspaceD = """length(regexp_replace(text, '\s', '', 'g'))"""
  val alphaD = """length(regexp_replace(text, '[^\p{L}]', '', 'g'))"""
  val digitD = """length(regexp_replace(text, '[^\p{Nd}]', '', 'g'))"""
  val avgWordLenD = s"""$nonspaceD / $wcD"""
  val linesD = """string_split(text, chr(10))"""
  val strippedNeD =
    s"""list_filter(list_transform($linesD, l -> regexp_replace(l, '^\\s+|\\s+$$', '', 'g')), x -> x <> '')"""
  val maxRepD =
    s"""list_max(list_transform($strippedNeD, x -> len(list_filter($strippedNeD, y -> y = x))))"""
  val bulletLinesD = s"""len(list_filter($linesD, l -> regexp_matches(l, '$BulletRe')))"""
  val boilerD = s"""len(regexp_extract_all(text, '$BoilerplateRe'))"""

  private def hitsD(words: Seq[String]): String =
    s"""len(list_filter(regexp_split_to_array(lower(substr(text, 1, 1000)), '\\s+'),
       | w -> w in (${words.map(w => s"'$w'").mkString(",")})))""".stripMargin

  val langD: String = {
    val hits = Stopwords.map { case (l, ws) => l -> hitsD(ws) }
    val conds = hits.zipWithIndex.map { case ((l, h), i) =>
      val geRest = hits.drop(i + 1).map { case (_, h2) => s"$h >= $h2" }
      (s"(${(geRest :+ s"$h > 0").mkString(" AND ")})", l)
    }
    "CASE " + conds.map { case (c, l) => s"WHEN $c THEN '$l'" }.mkString(" ") +
      " ELSE 'unknown' END"
  }

  def reasonCascadeD(cfg: Config): String = {
    val langOk =
      if (cfg.allowedLanguages.isEmpty) "true"
      else s"($langD) = 'unknown' OR ($langD) IN (${cfg.allowedLanguages.map(l => s"'$l'").mkString(",")})"
    s"""CASE
       | WHEN $wcD < ${cfg.minWords} THEN 'too_short'
       | WHEN $wcD > ${cfg.maxWords} THEN 'too_long'
       | WHEN $avgWordLenD < ${cfg.minAvgWordLen} THEN 'short_avg_word_length'
       | WHEN $avgWordLenD > ${cfg.maxAvgWordLen} THEN 'long_avg_word_length'
       | WHEN $nonspaceD > 0 AND $alphaD / $nonspaceD < ${cfg.minAlphaRatio} THEN 'low_alpha_ratio'
       | WHEN $nonspaceD > 0 AND $digitD / $nonspaceD > ${cfg.maxDigitRatio} THEN 'high_digit_ratio'
       | WHEN $nonspaceD > 0 AND ($nonspaceD - $alphaD - $digitD) / $nonspaceD > ${cfg.maxSymbolRatio} THEN 'high_symbol_ratio'
       | WHEN len($linesD) > 1 AND len($strippedNeD) > 0
       |   AND $maxRepD / len($linesD) > ${cfg.maxRepetitionRatio} THEN 'high_repetition'
       | WHEN $bulletLinesD / len($linesD) > ${cfg.maxBulletRatio} THEN 'mostly_bullet_list'
       | WHEN $boilerD > ${cfg.maxBoilerplate} THEN 'boilerplate_content'
       | WHEN NOT ($langOk) THEN 'wrong_language'
       | ELSE 'passed'
       |END""".stripMargin
  }

  def oracles: Map[String, String] = {
    val cfg = Config()
    Map(
      "quality_cascade" ->
        s"""SELECT doc_id,
           | $wcD AS word_count,
           | $avgWordLenD AS avg_word_length,
           | CASE WHEN $nonspaceD > 0 THEN $alphaD / $nonspaceD END AS alpha_ratio,
           | CASE WHEN $nonspaceD > 0 THEN $digitD / $nonspaceD END AS digit_ratio,
           | $boilerD AS boilerplate_matches,
           | $langD AS detected_language,
           | ${reasonCascadeD(cfg)} AS reason
           |FROM documents""".stripMargin,
      "quality_histogram" ->
        s"""SELECT reason, count(*) AS n_docs
           |FROM (SELECT ${reasonCascadeD(cfg)} AS reason FROM documents)
           |GROUP BY reason""".stripMargin,
      "quality_passed" ->
        s"""SELECT doc_id, lang, source, n_chars FROM documents
           |WHERE (${reasonCascadeD(cfg)}) = 'passed'""".stripMargin)
  }
}

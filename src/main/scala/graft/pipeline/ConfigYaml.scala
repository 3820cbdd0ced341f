package graft.pipeline

import java.{util => ju}

import org.yaml.snakeyaml.Yaml

/** YAML config ingestion (reference: src/utils/config.py:12-125 over
  * configs/pipeline_config.yaml:1-98). A user holding the reference's own
  * YAML can run this engine unchanged: `Pipeline.GraftConfig.fromYaml`
  * parses it verbatim into the typed config tree.
  *
  * The dot-path accessor mirrors `Config.get('quality.min_words', 50)`
  * (config.py:54-70): missing keys fall back to the supplied default, and
  * every scalar is coerced through the JVM number tower (snakeyaml yields
  * Integer/Long/Double/Boolean/String/null). snakeyaml ships on the Spark
  * classpath, so no extra dependency.
  */
object ConfigYaml {

  /** Parsed YAML tree with config.py-style dot-path access. */
  final class Tree(private val root: Any) {

    /** config.py:54-70: walk nested maps; absent key → None. A key that
      * is present with an explicit `null` value also yields None (YAML
      * `max_articles: null`), matching Python's `dict.get` + None. */
    def get(path: String): Option[Any] = {
      var cur: Any = root
      path.split('.').foreach { k =>
        cur = cur match {
          case m: ju.Map[_, _] => m.asInstanceOf[ju.Map[String, Any]].get(k)
          case _ => null
        }
      }
      Option(cur)
    }

    def getString(path: String, default: String): String =
      get(path).map(_.toString).getOrElse(default)

    def getBoolean(path: String, default: Boolean): Boolean = get(path) match {
      case Some(b: java.lang.Boolean) => b.booleanValue
      case Some(s: String) => s.equalsIgnoreCase("true")
      case _ => default
    }

    def getInt(path: String, default: Int): Int = get(path) match {
      case Some(n: Number) => n.intValue
      case _ => default
    }

    def getLong(path: String, default: Long): Long = get(path) match {
      case Some(n: Number) => n.longValue
      case _ => default
    }

    def getDouble(path: String, default: Double): Double = get(path) match {
      case Some(n: Number) => n.doubleValue
      case _ => default
    }

    /** Present-and-non-null numeric, else None (nullable knobs like
      * ingestion.max_articles / deduplication.num_bands). */
    def getLongOpt(path: String): Option[Long] = get(path) match {
      case Some(n: Number) => Some(n.longValue)
      case _ => None
    }

    def getIntOpt(path: String): Option[Int] = getLongOpt(path).map(_.toInt)

    def getStrings(path: String, default: Seq[String]): Seq[String] = get(path) match {
      case Some(l: ju.List[_]) =>
        val b = Seq.newBuilder[String]
        l.forEach(v => b += String.valueOf(v))
        b.result()
      case _ => default
    }
  }

  def parse(yamlText: String): Tree = new Tree(new Yaml().load[Any](yamlText))

  /** configs/pipeline_config.yaml → GraftConfig. Key-by-key transliteration
    * of the YAML tree; every default below is the reference's own default
    * for the same key, so a partial YAML degrades exactly as the reference
    * does. */
  def fromYaml(yamlText: String): Pipeline.GraftConfig = {
    val t = parse(yamlText)

    val cleaning = Pipeline.CleaningConfig(
      removeUrls = t.getBoolean("cleaning.remove_urls", default = true),
      removeEmails = t.getBoolean("cleaning.remove_emails", default = true),
      removeCitations = t.getBoolean("cleaning.remove_citations", default = true),
      normalizeUnicode = t.getBoolean("cleaning.normalize_unicode", default = true),
      normalizeWhitespace = t.getBoolean("cleaning.normalize_whitespace", default = true),
      fixMojibake = t.getBoolean("cleaning.fix_encoding", default = true),
      removeWikiMarkup = t.getBoolean("cleaning.remove_wiki_markup", default = false),
      removeHtmlTags = t.getBoolean("cleaning.remove_html_tags", default = false),
      minLengthChars = t.getInt("cleaning.min_length_chars", default = 100))

    val dedup = Pipeline.DedupConfig(
      enabled = t.getBoolean("deduplication.enabled", default = true),
      algorithm = t.getString("deduplication.algorithm", default = "minhash_lsh"),
      numPermutations = t.getInt("deduplication.num_permutations", default = 128),
      threshold = t.getDouble("deduplication.threshold", default = 0.8),
      numBands = t.getIntOpt("deduplication.num_bands"),
      shingleSize = t.getInt("deduplication.shingle_size", default = 5))

    // quality_filter.py:94-137 constructor defaults
    val quality = Quality.Config(
      minWords = t.getInt("quality.min_words", default = 50),
      maxWords = t.getInt("quality.max_words", default = 100000),
      minAvgWordLen = t.getDouble("quality.min_avg_word_length", default = 3.0),
      maxAvgWordLen = t.getDouble("quality.max_avg_word_length", default = 15.0),
      minAlphaRatio = t.getDouble("quality.min_alphabetic_ratio", default = 0.7),
      maxDigitRatio = t.getDouble("quality.max_digit_ratio", default = 0.3),
      maxSymbolRatio = t.getDouble("quality.max_symbol_ratio", default = 0.2),
      allowedLanguages =
        if (!t.getBoolean("quality.language_filter.enabled", default = true)) Seq.empty
        else t.getStrings("quality.language_filter.allowed_languages", Seq("en")))

    val tokenization = Pipeline.TokenizationConfig(
      enabled = t.getBoolean("tokenization.enabled", default = true),
      algorithm = t.getString("tokenization.algorithm", default = "bpe"),
      vocabSize = t.getInt("tokenization.vocab_size", default = 32000),
      minFrequency = t.getLong("tokenization.min_frequency", default = 2L),
      specialTokens = t.getStrings("tokenization.special_tokens",
        Seq("<pad>", "<unk>", "<bos>", "<eos>")),
      outputFormat = t.getString("tokenization.output_format", default = "jsonl"))

    val output = Pipeline.OutputConfig(
      format = t.getString("output.format", default = "parquet"),
      compression = t.getString("output.compression", default = "snappy"),
      // max_file_size_mb is a size hint; Spark's file-split control is
      // maxRecordsPerFile, set separately — 0 keeps Spark's natural splits.
      maxRecordsPerFile = 0L,
      includeMetadata = t.getBoolean("output.include_metadata", default = true))

    Pipeline.GraftConfig(
      maxDocs = t.getLongOpt("ingestion.max_articles"),
      cleaning = cleaning,
      dedup = dedup,
      qualityEnabled = t.getBoolean("quality.enabled", default = true),
      quality = quality,
      tokenization = tokenization,
      output = output,
      metricsEnabled = t.getBoolean("metrics.enabled", default = true))
  }
}

package graft

import org.apache.spark.sql.functions._

/** Pins the `ScaleGen --unique` realistic-corpus generator — the
  * standing per-round 100x sweep input (SCALE.md round 12). The sweep's
  * value rests on the corpus having a DECLARED, reproducible shape:
  * ~98% globally-unique content over a shared vocabulary, ~2% planted
  * duplicate clusters, deterministic regeneration. */
class ScaleGenUniqueSpec extends SparkSpec {

  // Large enough that the 499 planted-cluster seeds repeat within the
  // 2% dup ids (n/100 residue-0 members over 499 seeds needs n > 49900
  // before any two share a seed and form an exact-dup group).
  private val n = 60000L
  private lazy val corpus = ScaleGen.uniqueCorpus(spark, n).cache()

  test("deterministic: two builds are row-identical") {
    val again = ScaleGen.uniqueCorpus(spark, n)
    assert(corpus.exceptAll(again).isEmpty && again.exceptAll(corpus).isEmpty)
  }

  test("declared dup structure: ~2% of docs sit in small planted clusters") {
    assert(corpus.count() == n)
    // residues 0/1 mod 100 are the planted members — 2% by construction
    val planted = corpus.filter(pmod(col("doc_id"), lit(100L)) < 2).count()
    assert(planted == n / 50, s"planted=$planted")
    // exact-dup mass: clusters exist, stay small, and live inside the
    // planted ids (unique docs draw from a disjoint seed space)
    val dupGroups = corpus.groupBy(col("text"))
      .agg(count(lit(1)).as("c"), max(pmod(col("doc_id"), lit(100L))).as("maxres"))
      .filter(col("c") > 1)
    val stats = dupGroups.agg(
      count(lit(1)), sum(col("c")), max(col("c")), max(col("maxres"))).head()
    val (groups, mass, largest, maxRes) =
      (stats.getLong(0), stats.getLong(1), stats.getLong(2), stats.getLong(3))
    assert(groups > 0 && mass < n / 25, s"groups=$groups mass=$mass")
    assert(largest <= 30, s"largest exact cluster $largest — should be ~n/5000 per seed")
    assert(maxRes <= 1, s"an unplanted doc collided: maxres=$maxRes")
  }

  test("content shape: declared schema, langs, sources, words from the shared vocab") {
    assert(corpus.columns.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    val bad = corpus.filter(col("n_chars") =!= length(col("text"))).count()
    assert(bad == 0)
    val langs = corpus.select(col("lang")).distinct().collect().map(_.getString(0)).toSet
    assert(langs == Set("en", "de", "fr", "es", "it"), langs)
    // en majority by construction (6 of 10 slots)
    val en = corpus.filter(col("lang") === "en").count()
    assert(en > n * 45 / 100 && en < n * 75 / 100, s"en=$en")
    // word lengths in the declared 30..79 band; common trigrams DO
    // repeat across docs (the crawl-like property the gate corpus lacks)
    val wc = corpus.select(size(split(col("text"), " ")).as("w"))
      .agg(min(col("w")), max(col("w"))).head()
    assert(wc.getInt(0) >= 30 && wc.getInt(1) <= 80, wc.toString)
    // stock-phrase blocks give common trigrams a real document
    // frequency — the gram-indexed operators must see df > 1 postings
    val sharedGrams = corpus.limit(500)
      .select(explode(graft.functions.Trigrams(col("text"))).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).count()
    assert(sharedGrams > 50, s"sharedGrams=$sharedGrams — no cross-doc trigram mass")
  }
}

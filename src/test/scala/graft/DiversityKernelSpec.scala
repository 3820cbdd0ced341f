package graft

import graft.pipeline.{Analytics, Repetition}

/** Randomized parity for the round-10 native diversity/repetition
  * kernels against independent brute-force references — including
  * non-ASCII and supplementary (non-BMP) code points, which the ASCII
  * sf corpus (and therefore the oracle gate) never exercises. */
class DiversityKernelSpec extends SparkSpec {

  private val alphabet: Array[String] =
    Array("a", "b", "ß", "Ĉ", "中", "😀" /* 😀 U+1F600 */,
      "" /* private-use BMP, above surrogates */, "1", ".")

  private def randText(rnd: scala.util.Random, maxWords: Int): String = {
    val nw = rnd.nextInt(maxWords + 1)
    (0 until nw).map { _ =>
      val len = 1 + rnd.nextInt(3)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }.mkString(" ")
  }

  test("char diversity kernel matches brute-force counts on random unicode") {
    for (seed <- 1 to 50) {
      val t = randText(new scala.util.Random(seed), 8)
      val (n, d, sq) = Analytics.charDiversityKernel(t)
      val counts = t.codePoints().toArray.groupBy(identity).view.mapValues(_.length)
      assert(n === t.codePointCount(0, t.length).toLong, s"seed $seed")
      assert(d === counts.size.toLong, s"seed $seed")
      assert(sq === counts.values.map(c => c.toLong * c).sum, s"seed $seed")
    }
  }

  test("word diversity kernel matches brute-force counts on random unicode") {
    for (seed <- 1 to 50) {
      val t = randText(new scala.util.Random(seed), 8)
      val ws = t.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)
      val (n, d, sq) = Analytics.wordDiversityKernel(t)
      val counts = ws.groupBy(identity).view.mapValues(_.length)
      assert(n === ws.length.toLong, s"seed $seed")
      assert(d === counts.size.toLong, s"seed $seed")
      assert(sq === counts.values.map(c => c.toLong * c).sum, s"seed $seed")
    }
  }

  test("dup n-grams kernel matches brute-force, incl. the codepoint-order tiebreak") {
    // Reference picks the top gram by (count desc, UTF8-binary order asc)
    // — sortBy on (-cnt, codepoints as a Seq) replicates ORDER BY cnt
    // DESC, g ASC without Java's UTF-16 compareTo pitfall.
    def ref(t: String, n: Int): (Long, Long, Long) = {
      val ws = t.split("\\s+").filter(_.nonEmpty)
      if (ws.length < n) (0L, 0L, 0L)
      else {
        val grams = ws.sliding(n).map(_.mkString(" ")).toSeq
        val counts: Seq[(String, Int)] =
          grams.groupBy(identity).view.mapValues(_.length).toSeq
        implicit val seqIntOrd: Ordering[Seq[Int]] =
          Ordering.Implicits.seqOrdering[Seq, Int]
        val (topG, topC) = counts
          .sortBy { case (g, c) => (-c, g.codePoints().toArray.toSeq) }
          .head
        val dup = counts.collect { case (g, c) if c > 1 =>
          c.toLong * (g.codePointCount(0, g.length) - (n - 1))
        }.sum
        (topC.toLong, topG.codePointCount(0, topG.length).toLong, dup)
      }
    }
    for (seed <- 1 to 50) {
      val t = randText(new scala.util.Random(seed), 10)
      val out = Repetition.dupNgramsKernel(t)
      for ((n, slot) <- Seq((2, 0), (3, 3), (4, 6))) {
        val (c, l, dup) = ref(t, n)
        assert(out(slot) === c, s"seed $seed n=$n cnt")
        if (c > 0) assert(out(slot + 1) === l, s"seed $seed n=$n len")
        assert(out(slot + 2) === dup, s"seed $seed n=$n dup")
      }
    }
  }
}

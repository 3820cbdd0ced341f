package graft.pipeline

import java.nio.charset.{CharacterCodingException, StandardCharsets}
import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** The two UDF-backed cleaning steps the regex chain can't express
  * (reference: src/processing/cleaner.py:107-116). Both are deterministic
  * `String => String`, so Catalyst can still prune/push around them; they
  * are kept OUT of oracle-compared projections (DuckDB has neither NFKC
  * nor a mojibake repair) and are exercised by ScalaTest instead.
  */
object CleanUdfs {

  /** Unicode NFKC normalization (reference cleaner.py:114-116,
    * `unicodedata.normalize('NFKC', text)`). */
  def nfkc(s: String): String =
    if (s == null) null else Normalizer.normalize(s, Normalizer.Form.NFKC)

  /** Inverse of the Windows-1252 decode for the 0x80–0x9F block: the 27
    * printable characters cp1252 assigns where Latin-1 has control codes
    * (the Unicode mapping published by the Unicode Consortium's
    * CP1252.TXT). Every other char <= 0xFF maps to its own code point —
    * which also covers "sloppy cp1252" (ftfy's convention for the five
    * bytes cp1252 leaves undefined: 0x81 0x8D 0x8F 0x90 0x9D decode to
    * the Latin-1 control char, so the identity inverse is exact). */
  private val cp1252Inverse: Map[Char, Byte] = Map(
    '€' -> 0x80, '‚' -> 0x82, 'ƒ' -> 0x83, '„' -> 0x84,
    '…' -> 0x85, '†' -> 0x86, '‡' -> 0x87, 'ˆ' -> 0x88,
    '‰' -> 0x89, 'Š' -> 0x8A, '‹' -> 0x8B, 'Œ' -> 0x8C,
    'Ž' -> 0x8E, '‘' -> 0x91, '’' -> 0x92, '“' -> 0x93,
    '”' -> 0x94, '•' -> 0x95, '–' -> 0x96, '—' -> 0x97,
    '˜' -> 0x98, '™' -> 0x99, 'š' -> 0x9A, '›' -> 0x9B,
    'œ' -> 0x9C, 'ž' -> 0x9E, 'Ÿ' -> 0x9F
  ).map { case (c, b) => c -> b.toByte }

  /** Mojibake repair (reference cleaner.py:107-112 uses ftfy.fix_text; this
    * covers ftfy's dominant real-world class — UTF-8 bytes mis-decoded as
    * Windows-1252 or Latin-1, e.g. "cafÃ©" → "café", "â€™" → "’"). The
    * string is re-encoded through the sloppy-cp1252 inverse (chars <= 0xFF
    * by identity, the 0x80–0x9F printables via [[cp1252Inverse]] — a
    * superset of the pure Latin-1 inverse, so both mis-decode channels
    * repair) and strictly re-decoded as UTF-8. The repair is accepted only
    * when the round-trip is exact AND changes the string; genuine
    * Latin-1/cp1252 text fails the strict decode and passes through
    * untouched. Applied to a fixed point (<= 3 rounds) so double-encoded
    * text ("cafÃƒÂ©") also unwinds — which makes the repair idempotent,
    * preserving the clean chain's idempotence property. Known fidelity
    * limit vs full ftfy (documented in SURVEY §7): a string MIXING already-
    * correct non-ASCII with mojibake fails the whole-string round-trip and
    * is left unrepaired — never corrupted. */
  def fixMojibake(s: String): String = {
    if (s == null) return null
    var cur = s
    var round = 0
    while (round < 3) {
      val next = fixOnce(cur)
      if (next eq cur) return cur
      cur = next
      round += 1
    }
    cur
  }

  private def fixOnce(s: String): String = {
    // Fast reject: repair is only possible when every char has a cp1252
    // byte preimage and at least one UTF-8 lead byte (0xC2-0xF4) is
    // present. (Both mis-decodings leave lead bytes in 0xC2-0xF4 intact:
    // that range is identity in Latin-1 and unchanged by cp1252.)
    var i = 0; var hasLead = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c > 0xFF && !cp1252Inverse.contains(c)) return s
      if (c >= 0xC2 && c <= 0xF4) hasLead = true
      i += 1
    }
    if (!hasLead) return s
    try {
      val bytes = new Array[Byte](s.length)
      i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        bytes(i) = if (c <= 0xFF) c.toByte else cp1252Inverse(c)
        i += 1
      }
      val dec = StandardCharsets.UTF_8.newDecoder() // REPORT on malformed by default
      val fixed = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      if (fixed != s) fixed else s
    } catch { case _: CharacterCodingException => s }
  }

  /** Column forms. Deterministic (default for Scala UDFs). */
  def nfkcCol(c: Column): Column = udf(nfkc _).apply(c)
  def fixMojibakeCol(c: Column): Column = udf(fixMojibake _).apply(c)

  /** F1+F2 prefix of the full clean chain (cleaner.py:92-116 order:
    * mojibake fix, then NFKC, then the regex steps in [[Clean.cleanText]]). */
  def fixAndNormalize(c: Column): Column = nfkcCol(fixMojibakeCol(c))
}

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

  /** Mojibake-lite repair (reference cleaner.py:107-112 uses ftfy.fix_text;
    * we implement the dominant real-world case ftfy fixes — UTF-8 bytes
    * mis-decoded as Latin-1, e.g. "cafÃ©" → "café"). The text is re-encoded
    * as Latin-1 and strictly re-decoded as UTF-8; the repair is accepted
    * only when the round-trip is exact and changes the string. Genuine
    * Latin-1 text fails the strict decode and passes through untouched.
    */
  def fixMojibake(s: String): String = {
    if (s == null) return null
    // Fast reject: repair is only possible when every char fits in Latin-1
    // and at least one UTF-8 lead byte (0xC2-0xF4) is present.
    var i = 0; var hasLead = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c > 0xFF) return s
      if (c >= 0xC2 && c <= 0xF4) hasLead = true
      i += 1
    }
    if (!hasLead) return s
    try {
      val bytes = s.getBytes(StandardCharsets.ISO_8859_1)
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

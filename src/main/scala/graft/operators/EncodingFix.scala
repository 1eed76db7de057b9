package graft.operators

import org.apache.spark.sql.Column

/** Mojibake repair — the encoding-fix stage every crawl pipeline runs
  * on scraped text (public practice: the ftfy library's core
  * heuristic, reimplemented): text that was UTF-8 on the wire but got
  * DECODED as Latin-1/windows-1252 shows the classic artifacts
  * (`Ã©` for `é`, `â€™` for `'`). The repair is the inverse
  * round-trip: re-encode the characters to the bytes a
  * windows-1252/Latin-1 decode came from, and if those bytes form
  * strictly valid UTF-8 that CHANGES the string, decode them as UTF-8
  * — applied up to twice for double-mojibake. The windows-1252
  * specials (0x80–0x9F: €‚ƒ„…†‡ˆ‰Š‹ŒŽ''""•–—˜™š›œžŸ) map back through
  * the cp1252 table, which is what makes `â€™` (containing U+20AC)
  * reversible at all.
  *
  * SAFETY — the property that makes this a pure projection you can
  * run corpus-wide: correctly-encoded text is a fixed point. A
  * genuine `é` re-encodes to the single byte 0xE9, which is invalid
  * UTF-8 (lone continuation lead-in), so the decode step fails and
  * the text passes through untouched; pure ASCII is byte-identical
  * under both encodings and also unchanged. Only strings whose
  * cp1252 byte image is WELL-FORMED multi-byte UTF-8 — i.e. actual
  * mojibake, to astronomically high probability — are rewritten.
  * Characters outside Latin-1/cp1252 (CJK, emoji) mark the string as
  * not-a-misdecode and it passes through unchanged.
  *
  * Scale shape: one [[graft.plans.FixEncodingExpr]] per row, no
  * shuffle — runs map-side in the scan stage like the rest of the
  * text-cleaning family.
  */
object EncodingFix {

  /** cp1252 0x80–0x9F specials: char → original byte. */
  private[graft] val cp1252Reverse: Map[Char, Byte] = Map(
    '€' -> 0x80, '‚' -> 0x82, 'ƒ' -> 0x83,
    '„' -> 0x84, '…' -> 0x85, '†' -> 0x86,
    '‡' -> 0x87, 'ˆ' -> 0x88, '‰' -> 0x89,
    'Š' -> 0x8A, '‹' -> 0x8B, 'Œ' -> 0x8C,
    'Ž' -> 0x8E, '‘' -> 0x91, '’' -> 0x92,
    '“' -> 0x93, '”' -> 0x94, '•' -> 0x95,
    '–' -> 0x96, '—' -> 0x97, '˜' -> 0x98,
    '™' -> 0x99, 'š' -> 0x9A, '›' -> 0x9B,
    'œ' -> 0x9C, 'ž' -> 0x9E, 'Ÿ' -> 0x9F)
    .map { case (c, b) => c -> b.toByte }

  /** One inverse round-trip: Some(fixed) if the cp1252 byte image is
    * valid UTF-8 that decodes to something different; None otherwise. */
  private[graft] def undoOnce(s: String): Option[String] = {
    val bytes = new Array[Byte](s.length)
    var i = 0
    var suspicious = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 0x80) bytes(i) = c.toByte
      else if (c <= 0xFF) { bytes(i) = c.toByte; suspicious = true }
      else cp1252Reverse.get(c) match {
        case Some(b) => bytes(i) = b; suspicious = true
        case None => return None // genuine non-Latin text: not mojibake
      }
      i += 1
    }
    if (!suspicious) return None // pure ASCII: fixed point
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try {
      val out = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      if (out != s) Some(out) else None
    } catch { case _: java.nio.charset.CharacterCodingException => None }
  }

  /** Fix up to `rounds` layers of mojibake (2 covers the
    * double-encoded case ftfy treats as standard). */
  private[graft] def fixString(s: String, rounds: Int = 2): String = {
    var cur = s
    var r = 0
    var changed = true
    while (r < rounds && changed) {
      undoOnce(cur) match {
        case Some(f) => cur = f; r += 1
        case None => changed = false
      }
    }
    cur
  }

  /** Column form — the native single-pass expression. */
  def fixEncoding(text: Column): Column =
    graft.plans.TextHashNative.fixEncoding(text)
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake REPAIR — the fix step the ftfy stage of every web pipeline
  * runs between extraction and quality gating (q248's
  * [[graft.operators.Corpus.encodingAudit]] DETECTS the damage; this
  * expression undoes it): text whose UTF-8 bytes were once mis-decoded
  * as Windows-1252/Latin-1 ("café" → "cafÃ©") is round-tripped back —
  * each char maps to the byte that PRODUCED it under cp1252 (the 27
  * cp1252 specials invert explicitly; C1 controls U+0080–U+009F invert
  * to their own bytes, covering the ISO-8859-1 mis-decode; all other
  * chars ≤ U+00FF are their Latin-1 byte), and the byte string is
  * re-decoded as STRICT UTF-8. A cp1252 mis-decode that hit one of the
  * five UNDEFINED bytes (0x81/8D/8F/90/9D) produced U+FFFD — the byte
  * is gone, U+FFFD refuses to map, and the row correctly reports
  * unrepairable. Deterministic byte arithmetic, no heuristics:
  *
  *  - the decode succeeds → the text WAS double-encoded; the repaired
  *    string is returned ("cafÃ©" → "café");
  *  - any char refuses to byte-map (true Unicode beyond cp1252's
  *    image — the text was never cp1252) or the strict decode fails
  *    (genuine Latin-1-looking text like a literal "café": 0xE9 is not
  *    valid UTF-8) → the input returns UNCHANGED. Correct text is
  *    never mangled; the one documented blind spot is text that
  *    intentionally QUOTES mojibake, which is indistinguishable from
  *    the damage itself.
  *
  * Pure-ASCII input short-circuits unchanged (the corpus fast path).
  * One pass repairs one layer of double-encoding; doubly-doubled text
  * (rare, ftfy loops) repairs one layer per application.
  *
  * Scale: per-row byte loop inside whole-stage codegen via a static
  * call — zero shuffle, zero UDF boxing (the [[BpeTokens]] pattern). */
case class FixEncoding(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_fix_encoding"

  override protected def nullSafeEval(input: Any): Any =
    FixEncoding.repair(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.FixEncoding.repair($c)")

  override protected def withNewChildInternal(newChild: Expression): FixEncoding =
    copy(child = newChild)
}

object FixEncoding {

  /** char → cp1252 byte for the 27 specials above U+00FF (the 0x80–0x9F
    * block's defined entries); -1 elsewhere. Indexed by char for the
    * hot loop: the specials all live in U+0152..U+2122. */
  private val cp1252Inverse: java.util.HashMap[Character, Integer] = {
    val m = new java.util.HashMap[Character, Integer](64)
    val pairs = Seq(
      '€' -> 0x80, '‚' -> 0x82, 'ƒ' -> 0x83,
      '„' -> 0x84, '…' -> 0x85, '†' -> 0x86,
      '‡' -> 0x87, 'ˆ' -> 0x88, '‰' -> 0x89,
      'Š' -> 0x8A, '‹' -> 0x8B, 'Œ' -> 0x8C,
      'Ž' -> 0x8E, '‘' -> 0x91, '’' -> 0x92,
      '“' -> 0x93, '”' -> 0x94, '•' -> 0x95,
      '–' -> 0x96, '—' -> 0x97, '˜' -> 0x98,
      '™' -> 0x99, 'š' -> 0x9A, '›' -> 0x9B,
      'œ' -> 0x9C, 'ž' -> 0x9E, 'Ÿ' -> 0x9F)
    pairs.foreach { case (c, b) =>
      m.put(Character.valueOf(c), Integer.valueOf(b))
    }
    m
  }

  /** Repair one value; called from interpreted eval and generated code. */
  def repair(text: UTF8String): UTF8String = {
    val s = text.toString
    var hasHi = false
    var i = 0
    while (i < s.length && !hasHi) {
      if (s.charAt(i) >= 0x80) hasHi = true
      i += 1
    }
    if (!hasHi) return text // pure ASCII: nothing a transcode could break
    val bytes = new Array[Byte](s.length)
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val b =
        if (c <= 0xFF) c.toInt
        else {
          val special = cp1252Inverse.get(Character.valueOf(c))
          if (special == null) return text // never cp1252 — leave intact
          special.intValue()
        }
      bytes(i) = b.toByte
      i += 1
    }
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try {
      val out = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      UTF8String.fromString(out)
    } catch {
      case _: java.nio.charset.CharacterCodingException => text
    }
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Repair UTF-8-read-as-Latin-1/Windows-1252 double encoding — the
  * single most common corruption in web-scraped training corpora
  * ("Ã©" where "é" was meant, "æ•°" where "数" was). The repair is the
  * exact INVERSE of the corruption, not a heuristic patch list:
  *
  *   1. map every char back to the byte it decoded from — identity for
  *      U+0000–U+00FF (the Latin-1 read), the 27-entry Windows-1252
  *      punctuation table for €‚ƒ„…†‡ˆ‰Š‹ŒŽ''""•–—˜™š›œžŸ (the cp1252
  *      read; the five undefined cp1252 bytes pass through as their C1
  *      controls, which the identity arm already covers);
  *   2. STRICTLY decode those bytes as UTF-8 (malformed sequences,
  *      overlongs, encoded surrogates all rejected).
  *
  * If any char is unmappable (beyond U+00FF and not cp1252
  * punctuation) or the byte stream is not valid UTF-8, the input
  * returns UNCHANGED — so the repair is a no-op on clean text (ASCII
  * maps to itself; real accents like a bare "é" produce an invalid
  * continuation and bail; CJK is unmappable and bails) and inverts the
  * corruption exactly when it is present. One generation per call:
  * doubly-corrupted text needs two applications (law-tested).
  *
  * The residual risk is inherent to mojibake repair: a clean string
  * whose Latin-1 chars HAPPEN to spell valid multi-byte UTF-8 (a
  * Ã/Â/å-class lead immediately followed by C1-control or
  * cp1252-punctuation chars) is indistinguishable from corruption by
  * construction — no detector can split that class, and real text
  * containing raw C1 controls is already out of any clean contract.
  *
  * Scale posture: per-row char walk with an ASCII fast path that
  * returns the input UTF8String unchanged (zero allocation for the
  * overwhelmingly common case); CodegenFallback for the [[AudioHeader]]
  * reason — the walk dominates, there is no expression tree to fuse.
  */
case class FixMojibake(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "fix_mojibake"

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    // ASCII fast path on the raw bytes: nothing to repair, no decode
    val nb = u.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < nb) { if (u.getByte(i) < 0) ascii = false; i += 1 }
    if (ascii) return u
    val repaired = FixMojibake.repair(u.toString)
    if (repaired == null) u else UTF8String.fromString(repaired)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FixMojibake {
  /** char → original byte for the 27 Windows-1252 punctuation
    * codepoints at 0x80–0x9F (RFC 1345 / the public cp1252 table). */
  private val Cp1252Inverse: Map[Char, Byte] = Map(
    '€' -> 0x80, '‚' -> 0x82, 'ƒ' -> 0x83, '„' -> 0x84,
    '…' -> 0x85, '†' -> 0x86, '‡' -> 0x87, 'ˆ' -> 0x88,
    '‰' -> 0x89, 'Š' -> 0x8A, '‹' -> 0x8B, 'Œ' -> 0x8C,
    'Ž' -> 0x8E, '‘' -> 0x91, '’' -> 0x92, '“' -> 0x93,
    '”' -> 0x94, '•' -> 0x95, '–' -> 0x96, '—' -> 0x97,
    '˜' -> 0x98, '™' -> 0x99, 'š' -> 0x9A, '›' -> 0x9B,
    'œ' -> 0x9C, 'ž' -> 0x9E, 'Ÿ' -> 0x9F
  ).map { case (c, b) => c -> b.toByte }

  /** The inverse map, or null when the string is not repairable
    * (unmappable char, invalid UTF-8 bytes, or a no-op). */
  private[graft] def repair(s: String): String = {
    val n = s.length
    val bytes = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c < 0x100) bytes(i) = c.toByte
      else Cp1252Inverse.get(c) match {
        case Some(b) => bytes(i) = b
        case None => return null // clean multilingual text — not mojibake
      }
      i += 1
    }
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try {
      val out = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      if (out == s) null else out
    } catch {
      case _: java.nio.charset.CharacterCodingException => null
    }
  }
}

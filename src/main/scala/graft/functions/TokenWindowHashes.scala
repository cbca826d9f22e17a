package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One 60-bit hash per k-token window start — the single-pass native
  * form of the span-dedup anchor derivation
  * ([[graft.operators.Boilerplate.anchorRel]]). VALUE-IDENTICAL to the
  * declarative `transform(sequence(0, n−k), i → h60(array_join(
  * slice(tokens, i+1, k), ' ')))` over `tokens = split(trim(text),
  * "\\s+")` minus empties — and therefore to the DuckDB oracle — but
  * computed in ONE eval over the UTF-8 bytes: token (start, end)
  * offsets are found by a byte scan (ASCII whitespace delimits; UTF-8
  * continuation bytes are ≥ 0x80 and can never read as whitespace, so
  * the byte-level scan is exact for any Unicode text), and each
  * window's bytes feed a reused MessageDigest with a single separator
  * byte between tokens. No per-window slice array, join string or
  * UTF8String is ever materialized — the allocation churn that
  * dominated the declarative form's cost (measured 4.9 CPU core-s for
  * the anchor-frequency pass alone at sf0.1; the [[KgramFingerprint]]
  * rationale at token granularity).
  *
  * Documents with fewer than k tokens yield an empty array (no
  * anchors). CodegenFallback is deliberate: the work is the per-row
  * token walk, one virtual eval per ROW is noise. */
case class TokenWindowHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, s"k must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "token_window_hashes"

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // token offsets: maximal runs of non-ASCII-whitespace bytes (the
    // split(trim(s), "\\s+") minus-empties tokenization, byte-exact)
    var nTok = 0
    val starts = new Array[Int](bytes.length / 2 + 1)
    val ends = new Array[Int](bytes.length / 2 + 1)
    var i = 0
    while (i < bytes.length) {
      if (!isWs(bytes(i))) {
        starts(nTok) = i
        while (i < bytes.length && !isWs(bytes(i))) i += 1
        ends(nTok) = i
        nTok += 1
      } else i += 1
    }
    if (nTok < k) return new GenericArrayData(Array.empty[Long])
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[Long](nTok - k + 1)
    var w = 0
    while (w <= nTok - k) {
      md.reset()
      var j = w
      while (j < w + k) {
        md.update(bytes, starts(j), ends(j) - starts(j))
        if (j < w + k - 1) md.update(' '.toByte)
        j += 1
      }
      val d = md.digest()
      // first 15 hex chars = bytes 0..6 plus the high nibble of byte 7
      // (the H60/KgramFingerprint construction)
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xFFL); b += 1 }
      h = (h << 4) | ((d(7) & 0xF0L) >> 4)
      out(w) = h
      w += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

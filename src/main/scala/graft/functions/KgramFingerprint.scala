package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass character-k-gram fingerprint: returns
  * `struct(fp: long, n_sampled: long)` where `fp` is the minimum 60-bit
  * md5 hash over all character k-grams (null when the text is shorter
  * than k) and `n_sampled` counts grams whose hash ≡ 0 (mod `mod`).
  *
  * Value-identical to the declarative form
  * `transform(charKgrams(text,k), g -> h60(g))` + `array_min`/filter —
  * and to the DuckDB oracle — but computed in ONE eval over the UTF-8
  * bytes: k-gram windows advance over codepoint boundaries (matching
  * substring()'s character semantics for non-ASCII), each window's raw
  * bytes feed a reused MessageDigest, and the 60-bit value comes
  * straight from the digest's first 7½ bytes. No per-gram string,
  * hex-string or array materialization — the declarative form allocates
  * three strings per gram, which dominates the fingerprint query's cost.
  *
  * CodegenFallback is deliberate: the work is the per-document loop, so
  * one virtual eval per ROW is noise (unlike per-ELEMENT higher-order
  * dispatch, which [[FloatDotProduct]] exists to avoid).
  */
case class KgramFingerprint(child: Expression, k: Int, mod: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && mod >= 1, "k and mod must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("fp", LongType, nullable = true),
    StructField("n_sampled", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "kgram_fingerprint"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // codepoint start offsets (UTF-8 continuation bytes are 10xxxxxx)
    val starts = new Array[Int](bytes.length + 1)
    var nChars = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(nChars) = i; nChars += 1 }
      i += 1
    }
    starts(nChars) = bytes.length
    if (nChars < k) return InternalRow(null, 0L)

    val md = MessageDigest.getInstance("MD5")
    var minHash = Long.MaxValue
    var sampled = 0L
    var g = 0
    while (g <= nChars - k) {
      md.reset()
      md.update(bytes, starts(g), starts(g + k) - starts(g))
      val d = md.digest()
      // first 15 hex chars = bytes 0..6 plus the high nibble of byte 7
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xFFL); b += 1 }
      h = (h << 4) | ((d(7) & 0xF0L) >> 4)
      if (h < minHash) minHash = h
      if (h % mod == 0) sampled += 1
      g += 1
    }
    InternalRow(minHash, sampled)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

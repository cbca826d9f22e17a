package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** REAL feature extraction for the one multimodal format a
  * zero-codec container can decode honestly: uncompressed WAV PCM.
  * Parses the RIFF container ([[AudioHeader]]'s chunk-walk rules — the
  * Microsoft/IBM RIFF spec), decodes the `data` payload's integer PCM
  * samples, and reduces them to a fixed-`dims` feature vector of exact
  * long bucket sums:
  *
  *   frame value v(j) = Σ_channels sample   (8-bit: unsigned − 128;
  *                                           16-bit: signed LE)
  *   feature  f(k)   = Σ_{j : ⌊j·dims/n⌋ = k} v(j)   (n = frame count)
  *
  * — the piecewise "amplitude envelope" every audio pipeline computes
  * before a model sees anything, in pure integer arithmetic so a SQL
  * oracle replays the exact values cross-engine (the repo-wide
  * integer-exactness discipline; float DSP would be bit-fragile).
  *
  * Contract: format must be integer PCM (fmt audioFormat = 1), bits ∈
  * {8, 16}, channels ≥ 1, and the data payload fully PRESENT — this is
  * a decoder, not a header reader, so a declared-but-missing payload
  * (the [[AudioHeader]] metadata contract) yields NULL here, as does
  * any other container the contract excludes (compressed codecs stay
  * behind `Multimodal.decodeFeaturesPartitioned`'s pluggable harness).
  * A trailing partial frame is ignored; an empty data chunk yields all
  * zeros (valid empty sums). Exactness envelope: |v| ≤ channels·2^15,
  * so a bucket overflows long only past ~2^47 frames — no real WAV.
  *
  * CodegenFallback for the [[AudioHeader]] reason: the per-row byte
  * walk dominates; there is no expression tree to fuse. */
case class WavPcmFeatures(child: Expression, dims: Int)
    extends UnaryExpression with CodegenFallback {
  require(dims >= 1, s"wav_pcm_features: dims must be >= 1, got $dims")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "wav_pcm_features"

  override def nullSafeEval(input: Any): Any =
    WavPcmFeatures.parse(input.asInstanceOf[Array[Byte]], dims)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WavPcmFeatures {
  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  @inline private def le16(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8)
  @inline private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  @inline private def ascii4(b: Array[Byte], i: Int, s: String): Boolean =
    u8(b, i) == s.charAt(0) && u8(b, i + 1) == s.charAt(1) &&
      u8(b, i + 2) == s.charAt(2) && u8(b, i + 3) == s.charAt(3)

  private[graft] def parse(b: Array[Byte], dims: Int): GenericArrayData = {
    val n = b.length
    if (n < 12 || !ascii4(b, 0, "RIFF") || !ascii4(b, 8, "WAVE")) return null
    // chunk walk: fmt (PCM geometry) + data (payload offset/size). Both
    // must appear, and unlike the header reader the data payload must
    // actually be in the buffer — this expression reads the samples.
    // pos walks in LONG: a declared u32 chunk size near 2^31 would wrap
    // Int arithmetic to a negative index and crash instead of nulling
    // (adversarial-bytes contract: this expression is SQL-exposed)
    var pos = 12L
    var fmtCode = -1; var ch = -1; var bits = -1; var blockAlign = -1
    var dataAt = -1L; var dataBytes = -1L
    while (pos + 7 < n && (fmtCode < 0 || dataAt < 0)) {
      val p = pos.toInt
      val size = le32(b, p + 4) // u32 as Long — never negative
      if (ascii4(b, p, "fmt ")) {
        if (pos + 8 + 16 > n || size < 16) return null
        fmtCode = le16(b, p + 8)
        ch = le16(b, p + 10)
        blockAlign = le16(b, p + 20)
        bits = le16(b, p + 22)
      } else if (ascii4(b, p, "data")) {
        dataAt = pos + 8
        dataBytes = size
      }
      pos += 8L + size + (size & 1L) // RIFF pads odd payloads
    }
    if (fmtCode != 1 || ch < 1 || (bits != 8 && bits != 16)) return null
    if (blockAlign != ch * bits / 8) return null
    if (dataAt < 0 || dataAt + dataBytes > n) return null // payload missing
    val frames = (dataBytes / blockAlign).toInt
    val sums = new Array[Long](dims)
    var j = 0
    while (j < frames) {
      var v = 0L
      var c = 0
      // bounded by the payload check above: dataAt + dataBytes <= n
      var at = (dataAt + j.toLong * blockAlign).toInt
      while (c < ch) {
        v += (if (bits == 8) u8(b, at) - 128 else le16(b, at).toShort.toLong)
        at += bits / 8
        c += 1
      }
      // bucket of frame j by the forward map ⌊j·dims/n⌋ — a balanced
      // dims-way partition that the oracle replays as (j * dims) // n
      sums((j.toLong * dims / frames).toInt) += v
      j += 1
    }
    new GenericArrayData(sums)
  }
}

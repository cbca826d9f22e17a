package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Genuine audio-container header parse over a binary column — the
  * audio twin of [[ImageHeader]] (pure public-format byte arithmetic,
  * no codec library). Returns `struct(format: string, sample_rate:
  * int, channels: int, bits_per_sample: int, n_samples: long)`:
  *
  *  - WAV (RIFF/WAVE, Microsoft/IBM RIFF spec): `RIFF` + `WAVE`
  *    magic, then a real chunk walk — 4-byte id + little-endian u32
  *    size, payloads padded to even — reading `fmt ` (channels,
  *    sample rate, block align, bits per sample at their LE offsets)
  *    and `data` (declared byte size / block align = `n_samples`).
  *    Chunk order is not assumed; unknown chunks (LIST, JUNK, …) are
  *    stepped over by their declared size.
  *  - FLAC (xiph.org spec §STREAMINFO): `fLaC` magic, mandatory
  *    first STREAMINFO block — sample rate 20 bits, channels−1
  *    3 bits, bits−1 5 bits, total samples 36 bits, unpacked with
  *    explicit shifts at byte offsets 18–25.
  *  - MP3 (MPEG-1/2 audio + ID3v2): an ID3v2 tag (syncsafe 28-bit
  *    size) is skipped to the first frame, or the payload starts at a
  *    frame sync directly; the 4-byte frame header yields the sample
  *    rate (version-dependent index table) and mono/stereo channel
  *    mode. `bits_per_sample`/`n_samples` are null — MPEG audio has
  *    neither fixed sample width nor a header-declared length.
  *
  * Recognized magic with a malformed/truncated interior yields the
  * format with null fields (the [[ImageHeader]] quarantine
  * discipline); unrecognized payloads yield all-null. CodegenFallback
  * for the [[KgramFingerprint]] reason: the per-row walk dominates. */
case class AudioHeader(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("bits_per_sample", IntegerType, nullable = true),
    StructField("n_samples", LongType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "audio_header"

  override def nullSafeEval(input: Any): Any =
    AudioHeader.parse(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AudioHeader {
  private val NoneAll = InternalRow(null, null, null, null, null)
  private def fmtOnly(fmt: String) =
    InternalRow(UTF8String.fromString(fmt), null, null, null, null)

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  @inline private def le16(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8)
  @inline private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  @inline private def ascii4(b: Array[Byte], i: Int, s: String): Boolean =
    u8(b, i) == s.charAt(0) && u8(b, i + 1) == s.charAt(1) &&
      u8(b, i + 2) == s.charAt(2) && u8(b, i + 3) == s.charAt(3)

  private[graft] def parse(b: Array[Byte]): InternalRow = {
    val n = b.length
    if (n >= 12 && ascii4(b, 0, "RIFF") && ascii4(b, 8, "WAVE")) parseWav(b)
    else if (n >= 4 && ascii4(b, 0, "fLaC")) parseFlac(b)
    else if (n >= 3 && u8(b, 0) == 'I' && u8(b, 1) == 'D' && u8(b, 2) == '3')
      parseMp3(b, id3 = true)
    else if (n >= 2 && u8(b, 0) == 0xFF && (u8(b, 1) & 0xE0) == 0xE0)
      parseMp3(b, id3 = false)
    else NoneAll
  }

  private def parseWav(b: Array[Byte]): InternalRow = {
    val n = b.length
    // pos walks in LONG: a declared u32 chunk size near 2^31 would wrap
    // Int arithmetic to a negative index and crash the walk instead of
    // quarantining (the r16 WavPcmFeatures review finding — same walk)
    var pos = 12L
    var sr = -1; var ch = -1; var bits = -1; var blockAlign = -1
    var dataBytes = -1L
    while (pos + 7 < n && (sr < 0 || dataBytes < 0)) {
      val p = pos.toInt
      val size = le32(b, p + 4) // u32 as Long — never negative
      if (ascii4(b, p, "fmt ")) {
        // format(2) channels(2) sampleRate(4) byteRate(4) align(2) bits(2)
        if (pos + 8 + 16 > n || size < 16) return fmtOnly("wav")
        ch = le16(b, p + 10)
        sr = le32(b, p + 12).toInt
        blockAlign = le16(b, p + 20)
        bits = le16(b, p + 22)
      } else if (ascii4(b, p, "data")) {
        // the DECLARED size: the metadata contract holds even when the
        // sample payload itself is not shipped alongside the header
        dataBytes = size
      }
      pos += 8L + size + (size & 1L) // RIFF pads odd payloads
    }
    if (sr <= 0 || ch <= 0) return fmtOnly("wav")
    val samples =
      if (dataBytes >= 0 && blockAlign > 0) dataBytes / blockAlign else -1L
    InternalRow(UTF8String.fromString("wav"), sr, ch,
      if (bits > 0) bits else null,
      if (samples >= 0) Long.box(samples) else null)
  }

  private def parseFlac(b: Array[Byte]): InternalRow = {
    val n = b.length
    // mandatory first block: header (1 type + 3 length) then STREAMINFO;
    // sample-rate/channels/bits/total pack starts at byte 18
    if (n < 26 || (u8(b, 4) & 0x7F) != 0) return fmtOnly("flac")
    val sr = (u8(b, 18) << 12) | (u8(b, 19) << 4) | (u8(b, 20) >> 4)
    val ch = ((u8(b, 20) >> 1) & 0x07) + 1
    val bits = (((u8(b, 20) & 1) << 4) | (u8(b, 21) >> 4)) + 1
    val total = ((u8(b, 21) & 0x0F).toLong << 32) |
      (u8(b, 22).toLong << 24) | (u8(b, 23).toLong << 16) |
      (u8(b, 24).toLong << 8) | u8(b, 25).toLong
    if (sr <= 0) return fmtOnly("flac")
    InternalRow(UTF8String.fromString("flac"), sr, ch, bits,
      if (total > 0) Long.box(total) else null)
  }

  /** MPEG audio sample-rate tables, by version bits (ISO 11172-3 /
    * 13818-3): index 3 = MPEG1, 2 = MPEG2, 0 = MPEG2.5; 1 reserved. */
  private val Mp3Rates: Map[Int, Array[Int]] = Map(
    3 -> Array(44100, 48000, 32000),
    2 -> Array(22050, 24000, 16000),
    0 -> Array(11025, 12000, 8000))

  private def parseMp3(b: Array[Byte], id3: Boolean): InternalRow = {
    val n = b.length
    val frameAt =
      if (!id3) 0
      else {
        if (n < 10) return fmtOnly("mp3")
        // syncsafe 28-bit tag size (7 bits per byte), tag header is 10
        val tag = (u8(b, 6) << 21) | (u8(b, 7) << 14) | (u8(b, 8) << 7) | u8(b, 9)
        10 + tag
      }
    if (frameAt + 3 >= n) return fmtOnly("mp3")
    if (u8(b, frameAt) != 0xFF || (u8(b, frameAt + 1) & 0xE0) != 0xE0)
      return fmtOnly("mp3")
    val version = (u8(b, frameAt + 1) >> 3) & 3
    val srIdx = (u8(b, frameAt + 2) >> 2) & 3
    val rates = Mp3Rates.getOrElse(version, null)
    if (rates == null || srIdx == 3) return fmtOnly("mp3")
    val mode = (u8(b, frameAt + 3) >> 6) & 3 // 3 = single channel
    InternalRow(UTF8String.fromString("mp3"), rates(srIdx),
      if (mode == 3) 1 else 2, null, null)
  }
}

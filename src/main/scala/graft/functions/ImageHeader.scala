package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Genuine image-container header parse over a binary column — the
  * real half of the multimodal decode surface (the learned-feature
  * extraction stays a stub; container structure is pure public-format
  * arithmetic and needs no codec library). Returns
  * `struct(format: string, width: int, height: int, channels: int)`:
  *
  *  - PNG (ISO/IEC 15948 §5.2, §11.2.2): 8-byte signature, then the
  *    IHDR chunk — width/height big-endian u32 at offsets 16/20,
  *    color type at 25 mapped to channels (0 grey→1, 2 RGB→3,
  *    3 palette→1, 4 grey+alpha→2, 6 RGBA→4).
  *  - GIF (GIF87a/GIF89a spec): 6-byte version magic, logical-screen
  *    width/height LITTLE-endian u16 at offsets 6/8; palette entries
  *    are RGB, so channels = 3.
  *  - BMP (Windows BITMAPINFOHEADER): `BM` magic, little-endian i32
  *    dims at 18/22 (negative height = top-down storage, reported as
  *    |h|), channels = bitCount/8 for byte-aligned depths (else
  *    null). Full pixel decode for the 24-bit uncompressed form lives
  *    in [[BmpGridFeatures]]/[[BmpResizeNearest]].
  *  - JPEG (ITU T.81 §B): FF D8, then a real marker-segment walk —
  *    fill bytes skipped, standalone markers (TEM, RSTn) stepped over,
  *    variable-length segments advanced by their big-endian length —
  *    until a frame header SOFn (C0–CF minus C4/C8/CC): precision at
  *    +4, height/width big-endian u16 at +5/+7, component count
  *    (channels) at +9. EOI or SOS before any SOF → no dimensions.
  *    `has_exif` reports whether an APP1 segment whose payload opens
  *    with the Exif identifier (`Exif\0\0`, the EXIF spec's APP1
  *    marker form) was seen during the walk — true/false for JPEG,
  *    null for the other formats (PNG's optional eXIf chunk lives
  *    past IHDR and is not walked here).
  *
  * A recognized magic with a malformed/truncated interior yields the
  * format with null dims (quarantine-able, not a throw — the DQ-gate
  * discipline); an unrecognized payload yields all-null. The walk is
  * bounded by the payload length, touches only the bytes it reads, and
  * allocates nothing per row.
  *
  * CodegenFallback is deliberate (the [[KgramFingerprint]] rationale):
  * the work is the per-row header walk; one virtual eval per ROW is
  * noise next to it. */
case class ImageHeader(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("has_exif", BooleanType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "image_header"

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    ImageHeader.parse(b)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageHeader {
  private val None5 = InternalRow(null, null, null, null, null)
  private def fmtOnly(fmt: String) =
    InternalRow(UTF8String.fromString(fmt), null, null, null, null)
  private def jpegOnly(exif: Boolean) =
    InternalRow(UTF8String.fromString("jpeg"), null, null, null, exif)
  private def full(fmt: String, w: Int, h: Int, c: Int) =
    InternalRow(UTF8String.fromString(fmt), w, h, c, null)
  private def fullJpeg(w: Int, h: Int, c: Int, exif: Boolean) =
    InternalRow(UTF8String.fromString("jpeg"), w, h, c, exif)

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  @inline private def be16(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 8) | u8(b, i + 1)
  @inline private def le16(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8)
  @inline private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)

  private[graft] def parse(b: Array[Byte]): InternalRow = {
    val n = b.length
    if (n >= 8 && u8(b, 0) == 0x89 && u8(b, 1) == 0x50 && u8(b, 2) == 0x4E &&
        u8(b, 3) == 0x47 && u8(b, 4) == 0x0D && u8(b, 5) == 0x0A &&
        u8(b, 6) == 0x1A && u8(b, 7) == 0x0A) {
      // PNG: the first chunk MUST be IHDR (13 bytes) at offset 8
      if (n < 26 || u8(b, 12) != 'I' || u8(b, 13) != 'H' ||
          u8(b, 14) != 'D' || u8(b, 15) != 'R') return fmtOnly("png")
      val w = be32(b, 16); val h = be32(b, 20)
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue)
        return fmtOnly("png")
      val channels = u8(b, 25) match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => -1
      }
      if (channels < 0) return fmtOnly("png")
      full("png", w.toInt, h.toInt, channels)
    } else if (n >= 6 && u8(b, 0) == 'G' && u8(b, 1) == 'I' &&
        u8(b, 2) == 'F' && u8(b, 3) == '8' &&
        (u8(b, 4) == '7' || u8(b, 4) == '9') && u8(b, 5) == 'a') {
      if (n < 10) return fmtOnly("gif")
      full("gif", le16(b, 6), le16(b, 8), 3)
    } else if (n >= 2 && u8(b, 0) == 'B' && u8(b, 1) == 'M') {
      // BMP (Windows BITMAPINFOHEADER): LE dims at 18/22, height may be
      // negative (top-down); channels from bitCount when byte-aligned.
      // The INFOHEADER offsets are only meaningful when the DIB header
      // size says ≥40: a legacy BITMAPCOREHEADER (dibSize=12, u16 dims
      // at 18/20, bitCount at 24) would read fused garbage through them
      // (advisor finding — consistent with BmpPixels.geometry).
      if (n < 30) return fmtOnly("bmp")
      val dibSize = le16(b, 14) | (le16(b, 16) << 16)
      if (dibSize < 40) return fmtOnly("bmp")
      val w = le16(b, 18) | (le16(b, 20) << 16)
      val hRaw = le16(b, 22) | (le16(b, 24) << 16)
      // Long abs: math.abs(Int.MinValue) stays negative — a crafted
      // 0x80000000 height would read back as -2^31 in a |h| field
      val hAbs = math.abs(hRaw.toLong)
      val bits = le16(b, 28)
      if (w <= 0 || hRaw == 0 || hAbs > Int.MaxValue) return fmtOnly("bmp")
      val h = hAbs.toInt
      val channels: Any =
        if (bits > 0 && bits % 8 == 0) Int.box(bits / 8) else null
      InternalRow(UTF8String.fromString("bmp"), w, h, channels, null)
    } else if (n >= 2 && u8(b, 0) == 0xFF && u8(b, 1) == 0xD8) {
      var pos = 2
      var exif = false
      while (pos + 1 < n) {
        if (u8(b, pos) != 0xFF) return jpegOnly(exif) // broken stream
        val m = u8(b, pos + 1)
        if (m == 0xFF) { pos += 1 } // fill byte
        else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) pos += 2 // TEM/RSTn
        else if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
          if (pos + 9 >= n) return jpegOnly(exif) // truncated SOF
          return fullJpeg(be16(b, pos + 7), be16(b, pos + 5), u8(b, pos + 9), exif)
        }
        else if (m == 0xD9 || m == 0xDA) return jpegOnly(exif) // EOI/SOS first
        else {
          if (pos + 3 >= n) return jpegOnly(exif) // truncated length
          val len = be16(b, pos + 2)
          if (len < 2) return jpegOnly(exif) // malformed segment
          // APP1 with the Exif identifier: payload opens "Exif\0\0"
          if (m == 0xE1 && pos + 9 < n &&
              u8(b, pos + 4) == 'E' && u8(b, pos + 5) == 'x' &&
              u8(b, pos + 6) == 'i' && u8(b, pos + 7) == 'f' &&
              u8(b, pos + 8) == 0 && u8(b, pos + 9) == 0) exif = true
          pos += 2 + len
        }
      }
      jpegOnly(exif) // ran out of bytes before any SOF
    } else None5
  }
}

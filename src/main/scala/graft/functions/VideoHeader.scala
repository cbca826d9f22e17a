package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Genuine video-container header parse over a binary column — the
  * video member of the [[ImageHeader]]/[[AudioHeader]] family (pure
  * public-format byte arithmetic). Returns `struct(format: string,
  * brand: string, timescale: int, duration_units: long, width: int,
  * height: int)`:
  *
  *  - MP4 / ISO-BMFF (ISO 14496-12): a real top-level BOX WALK —
  *    4-byte big-endian size + 4-byte type, `size = 1` → 64-bit
  *    largesize, `size = 0` → box extends to EOF — reading `ftyp`
  *    (major brand, e.g. isom/mp42/qt) and descending into `moov`
  *    for `mvhd` (version 0: timescale u32 at payload +12, duration
  *    u32 at +16; version 1: u32 at +20, u64 at +24 — both handled)
  *    and the first `trak`→`tkhd` (width/height as 16.16 fixed-point
  *    at the box tail, integer part reported). Presentation seconds =
  *    `duration_units / timescale` — left to the caller so the
  *    relation stays integer-exact.
  *  - WebM/Matroska (EBML): the 4-byte EBML magic `1A 45 DF A3` is
  *    recognized as format `webm` with null fields — EBML's
  *    variable-length integers are a different machine; format
  *    detection keeps the family's sniff contract honest without
  *    pretending to parse what it does not.
  *
  * Recognized magic with a malformed/truncated interior yields the
  * format with null fields (the family's quarantine discipline);
  * unrecognized payloads yield all-null. The walk is bounded by the
  * payload length and a box-count cap (a zero-size malformed box
  * cannot loop). CodegenFallback for the [[KgramFingerprint]] reason. */
case class VideoHeader(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = true),
    StructField("brand", StringType, nullable = true),
    StructField("timescale", IntegerType, nullable = true),
    StructField("duration_units", LongType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "video_header"

  override def nullSafeEval(input: Any): Any =
    VideoHeader.parse(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VideoHeader {
  private val NoneAll = InternalRow(null, null, null, null, null, null)
  private def fmtOnly(fmt: String, brand: String = null) =
    InternalRow(UTF8String.fromString(fmt),
      if (brand == null) null else UTF8String.fromString(brand),
      null, null, null, null)

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  @inline private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)
  @inline private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def typ(b: Array[Byte], i: Int): String =
    new String(b, i + 4, 4, "ISO-8859-1")

  /** (payloadStart, boxEnd) of the box at `pos`, or null on malformed
    * size fields. Handles size=1 (largesize) and size=0 (to EOF). */
  private def boxBounds(b: Array[Byte], pos: Int, limit: Int): (Int, Int) = {
    if (pos + 8 > limit) return null
    val size32 = be32(b, pos)
    if (size32 == 1) {
      if (pos + 16 > limit) return null
      val size = be64(b, pos + 8)
      if (size < 16 || pos + size > limit) return null
      (pos + 16, pos + size.toInt)
    } else if (size32 == 0) (pos + 8, limit)
    else {
      if (size32 < 8 || pos + size32 > limit) return null
      (pos + 8, pos + size32.toInt)
    }
  }

  private[graft] def parse(b: Array[Byte]): InternalRow = {
    val n = b.length
    // EBML magic: WebM/Matroska — recognized, not walked
    if (n >= 4 && u8(b, 0) == 0x1A && u8(b, 1) == 0x45 &&
        u8(b, 2) == 0xDF && u8(b, 3) == 0xA3) return fmtOnly("webm")
    // ISO-BMFF: the first box must be ftyp (size ≥ 16 covers brand)
    if (n < 12 || typ(b, 0) != "ftyp") return NoneAll
    val brand = new String(b, 8, math.min(4, n - 8), "ISO-8859-1")
    var brandStr = brand.trim
    if (brandStr.isEmpty) brandStr = null
    var timescale = -1L; var duration = -1L
    var width = -1; var height = -1
    var pos = 0
    var guard = 0
    while (pos + 8 <= n && guard < 64) {
      guard += 1
      val bounds = boxBounds(b, pos, n)
      if (bounds == null) return fmtOnly("mp4", brandStr) // malformed
      val (payload, end) = bounds
      if (typ(b, pos) == "moov") {
        // walk moov's children for mvhd and trak/tkhd
        var p = payload
        var g2 = 0
        while (p + 8 <= end && g2 < 64) {
          g2 += 1
          val in = boxBounds(b, p, end)
          if (in == null) return fmtOnly("mp4", brandStr)
          val (ip, ie) = in
          typ(b, p) match {
            case "mvhd" if timescale < 0 =>
              if (ip >= ie || ip + 4 > ie) return fmtOnly("mp4", brandStr)
              val v = u8(b, ip)
              if (v == 0) {
                if (ip + 20 > ie) return fmtOnly("mp4", brandStr)
                timescale = be32(b, ip + 12)
                duration = be32(b, ip + 16)
              } else {
                if (ip + 32 > ie) return fmtOnly("mp4", brandStr)
                timescale = be32(b, ip + 20)
                duration = be64(b, ip + 24)
              }
            case "trak" if width < 0 =>
              // first child expected tkhd; walk to be order-free
              var tp = ip
              var g3 = 0
              while (tp + 8 <= ie && g3 < 16 && width < 0) {
                g3 += 1
                val tb = boxBounds(b, tp, ie)
                if (tb == null) return fmtOnly("mp4", brandStr)
                val (tpp, tpe) = tb
                if (typ(b, tp) == "tkhd") {
                  // width/height are the LAST 8 payload bytes (16.16)
                  if (tpe - tpp < 8) return fmtOnly("mp4", brandStr)
                  width = be32(b, tpe - 8).toInt >>> 16
                  height = be32(b, tpe - 4).toInt >>> 16
                }
                tp = tpe
              }
            case _ => ()
          }
          p = ie
        }
      }
      pos = end
    }
    InternalRow(UTF8String.fromString("mp4"),
      if (brandStr == null) null else UTF8String.fromString(brandStr),
      if (timescale > 0) Int.box(timescale.toInt) else null,
      if (duration >= 0 && timescale > 0) Long.box(duration) else null,
      if (width > 0) Int.box(width) else null,
      if (height > 0) Int.box(height) else null)
  }
}

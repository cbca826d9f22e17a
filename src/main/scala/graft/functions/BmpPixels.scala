package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** REAL pixel decode for the second codec-free multimodal format:
  * uncompressed 24-bit BMP (Windows BITMAPINFOHEADER layout — the
  * universal interchange form: 14-byte file header, ≥40-byte DIB
  * header, BI_RGB, BGR pixel triples in 4-byte-padded rows, bottom-up
  * by default with top-down signalled by negative height).
  *
  * Shared parsing/geometry lives here; the two expressions are
  * [[BmpGridFeatures]] (pixels → exact integer grid features) and
  * [[BmpResizeNearest]] (pixels → a smaller REAL BMP — actual image
  * resize, not the byte-sampling stub). Both return null for anything
  * outside the contract (wrong magic, bitCount ≠ 24, compressed,
  * pixel data not fully present) — decoders, not header readers.
  */
object BmpPixels {
  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  @inline private def le16(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8)
  @inline private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  /** Parsed 24-bit geometry: (pixel-data offset, width, height,
    * row stride, topDown). None when the payload is outside the
    * decode contract or the pixel data is not fully present. */
  private[graft] def geometry(b: Array[Byte]): Option[(Int, Int, Int, Int, Boolean)] = {
    val n = b.length
    if (n < 54 || u8(b, 0) != 'B' || u8(b, 1) != 'M') return None
    val dataAt = le32(b, 10)
    val dibSize = le32(b, 14)
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val bits = le16(b, 28)
    val compression = le32(b, 30)
    if (dibSize < 40 || w <= 0 || hRaw == 0 || bits != 24 || compression != 0)
      return None
    // LONG geometry throughout: a crafted width >= ~716M wraps Int
    // stride arithmetic negative and would defeat the bounds check
    // below (review finding — adversarial-bytes contract); math.abs of
    // Int.MinValue stays negative, so |h| is taken in Long too
    val h = math.abs(hRaw.toLong)
    val stride = ((w.toLong * 3 + 3) / 4) * 4
    // full pixel payload must be present — this is a decoder. The Long
    // product check also bounds w, h and stride to the buffer size, so
    // the Int narrowing below is exact. The header check runs in Long
    // too: a crafted dibSize near 2^31 wraps `14 + dibSize` negative in
    // Int, admitting a negative pixel-data offset (advisor finding).
    if (dataAt < 0 || dataAt.toLong < 14L + dibSize ||
        dataAt.toLong + h * stride > n) return None
    Some((dataAt, w, h.toInt, stride.toInt, hRaw < 0))
  }

  /** Byte offset of image pixel (x, y) in TOP-DOWN image coordinates
    * (row y = 0 is the top row regardless of storage order). */
  @inline private[graft] def pixelAt(dataAt: Int, stride: Int, h: Int,
      topDown: Boolean, x: Int, y: Int): Int = {
    val fileRow = if (topDown) y else h - 1 - y
    dataAt + fileRow * stride + x * 3
  }

  private[graft] def gridFeatures(b: Array[Byte], gx: Int, gy: Int): GenericArrayData =
    geometry(b) match {
      case None => null
      case Some((dataAt, w, h, stride, topDown)) =>
        val sums = new Array[Long](gx * gy * 3)
        var y = 0
        while (y < h) {
          val cy = (y.toLong * gy / h).toInt
          var x = 0
          while (x < w) {
            val cell = (cy * gx + (x.toLong * gx / w).toInt) * 3
            val at = pixelAt(dataAt, stride, h, topDown, x, y)
            // BGR on disk; features are (r, g, b) per cell
            sums(cell) += u8(b, at + 2)
            sums(cell + 1) += u8(b, at + 1)
            sums(cell + 2) += u8(b, at)
            x += 1
          }
          y += 1
        }
        new GenericArrayData(sums)
    }

  private[graft] def resizeNearest(b: Array[Byte], outW: Int, outH: Int): Array[Byte] =
    geometry(b) match {
      case None => null
      case Some((dataAt, w, h, stride, topDown)) =>
        val outStride = ((outW * 3 + 3) / 4) * 4
        val out = new Array[Byte](54 + outH * outStride)
        def put16(i: Int, v: Int): Unit = {
          out(i) = (v & 0xFF).toByte; out(i + 1) = ((v >> 8) & 0xFF).toByte
        }
        def put32(i: Int, v: Int): Unit = {
          put16(i, v & 0xFFFF); put16(i + 2, (v >> 16) & 0xFFFF)
        }
        out(0) = 'B'; out(1) = 'M'
        put32(2, out.length) // file size
        put32(10, 54)        // pixel data offset
        put32(14, 40)        // BITMAPINFOHEADER
        put32(18, outW); put32(22, outH) // positive height = bottom-up
        put16(26, 1); put16(28, 24)      // planes, 24-bit
        put32(30, 0)                     // BI_RGB
        put32(34, outH * outStride)      // image size
        var y2 = 0
        while (y2 < outH) {
          val sy = (y2.toLong * h / outH).toInt
          var x2 = 0
          while (x2 < outW) {
            val src = pixelAt(dataAt, stride, h, topDown, (x2.toLong * w / outW).toInt, sy)
            val dst = pixelAt(54, outStride, outH, topDown = false, x2, y2)
            out(dst) = b(src); out(dst + 1) = b(src + 1); out(dst + 2) = b(src + 2)
            x2 += 1
          }
          y2 += 1
        }
        out
    }
}

/** Exact integer grid features over a 24-bit BMP's REAL pixels: the
  * image is partitioned into a `gx`×`gy` grid by the forward maps
  * `cx = ⌊x·gx/w⌋`, `cy = ⌊y·gy/h⌋` (top-down image coordinates), and
  * the output `array<long>` of length gx·gy·3 carries, per cell in
  * row-major order, the (r, g, b) channel SUMS — the color-moment
  * features every image pipeline computes before a model sees
  * anything, in exact long arithmetic so a SQL oracle replays the
  * values bit-for-bit (the [[WavPcmFeatures]] discipline applied to
  * pixels). Bottom-up and top-down storage both decode to the same
  * image. Null for anything outside the 24-bit BI_RGB contract or a
  * truncated pixel payload. Exactness: a cell sum ≤ 255·w·h — no
  * overflow below ~2^45 pixels. CodegenFallback: per-row byte walk
  * dominates ([[AudioHeader]] rationale). */
case class BmpGridFeatures(child: Expression, gx: Int, gy: Int)
    extends UnaryExpression with CodegenFallback {
  // the 4096 cap mirrors BmpResizeNearest: the per-ROW output array is
  // gx·gy·3 longs, so an unbounded grid is a per-row multi-GB allocation
  // (or an Int-overflowed negative array size) — reject at construction
  require(gx >= 1 && gy >= 1 && gx <= 4096 && gy <= 4096,
    s"bmp_grid_features: grid must be 1..4096 per side, got ${gx}x$gy")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bmp_grid_features"
  override def nullSafeEval(input: Any): Any =
    BmpPixels.gridFeatures(input.asInstanceOf[Array[Byte]], gx, gy)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** REAL image resize for 24-bit BMPs — nearest-neighbor over the
  * actual pixels (`out(x,y) = in(⌊x·w/outW⌋, ⌊y·h/outH⌋)`, top-down
  * image coordinates), emitting a well-formed bottom-up 24-bit BMP
  * (54-byte header, padded rows) that every decoder here accepts —
  * the thumbnail step of an asset pipeline, replacing the byte-level
  * `resizeStub` for this format. Output size is outW·outH·3 + 54
  * bytes regardless of input size, so a resize-then-process plan
  * moves thumbnails, not originals, through every later shuffle.
  * Null propagates from the same decode contract as
  * [[BmpGridFeatures]]. */
case class BmpResizeNearest(child: Expression, outW: Int, outH: Int)
    extends UnaryExpression with CodegenFallback {
  require(outW >= 1 && outH >= 1 && outW <= 4096 && outH <= 4096,
    s"bmp_resize_nearest: target must be 1..4096 per side, got ${outW}x$outH")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${other.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "bmp_resize_nearest"
  override def nullSafeEval(input: Any): Any =
    BmpPixels.resizeNearest(input.asInstanceOf[Array[Byte]], outW, outH)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

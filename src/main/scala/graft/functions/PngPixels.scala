package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** REAL pixel decode for the third codec-free-in-the-JDK multimodal
  * format: non-interlaced 8-bit PNG (public spec, RFC 2083) — the
  * signature + chunk walk, IDAT concatenation through
  * `java.util.zip.Inflater`, and the five scanline unfilters
  * (None/Sub/Up/Average/Paeth). Gray, gray+alpha, RGB, RGBA and —
  * since r18 — PALETTE (PLTE-indexed, the most common PNG subtype on
  * the web: icons, screenshots, charts) color types decode; 16-bit and
  * interlaced images return null (documented contract edges, the
  * [[BmpPixels]] decode-or-null discipline — never garbage, never a
  * crash). Palette rules: exactly one PLTE chunk, before the first
  * IDAT, 1–256 entries of 3 bytes; a pixel indexing past the palette
  * is null (a decoder that clamped or wrapped would read back
  * plausible wrong colors); tRNS alpha is ignored (the feature surface
  * ignores alpha for RGBA too). CRCs are NOT verified: this is a
  * decoder, not a validator, and a corrupt stream already fails the
  * inflate/size checks.
  *
  * [[PngEncodeRgb]] is the inverse for the common case — raw top-down
  * RGB triples to a minimal standard PNG (filter-0 rows, one IDAT,
  * correct CRCs so external decoders accept it) — the
  * store-thumbnails-compressed step beside [[BmpResizeNearest]]'s
  * uncompressed emit, and the fixture generator that lets an oracle
  * value-check this decoder end to end.
  *
  * Scale posture: per-row byte walks (CodegenFallback — the
  * [[AudioHeader]] rationale), Long offset arithmetic throughout, and
  * a hard inflated-size cap so a crafted header cannot demand a
  * multi-GB per-row allocation.
  */
object PngPixels {
  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  @inline private def be32(b: Array[Byte], i: Int): Long =
    ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)) & 0xFFFFFFFFL
  @inline private def isType(b: Array[Byte], i: Int, t: String): Boolean =
    u8(b, i) == t.charAt(0) && u8(b, i + 1) == t.charAt(1) &&
      u8(b, i + 2) == t.charAt(2) && u8(b, i + 3) == t.charAt(3)

  /** Hard cap on the INFLATED image bytes (filter bytes included): a
    * per-row expression must never honor a crafted header demanding a
    * multi-GB allocation. 64 MB ≈ a 21-megapixel RGB image. */
  private[graft] val MaxInflated: Long = 64L << 20

  private[graft] final class Decoded(
      val w: Int, val h: Int, val channels: Int, val samples: Array[Byte])

  /** Full decode to unfiltered top-down samples (w·h·channels bytes);
    * null for anything outside the contract. */
  private[graft] def decode(b: Array[Byte]): Decoded = {
    val n = b.length
    if (n < 41) return null // sig(8) + IHDR chunk(25) + IEND header would not fit anyway
    if (u8(b, 0) != 0x89 || u8(b, 1) != 0x50 || u8(b, 2) != 0x4E ||
        u8(b, 3) != 0x47 || u8(b, 4) != 0x0D || u8(b, 5) != 0x0A ||
        u8(b, 6) != 0x1A || u8(b, 7) != 0x0A) return null
    // IHDR MUST be the first chunk, 13 bytes
    if (be32(b, 8) != 13L || !isType(b, 12, "IHDR")) return null
    val w = be32(b, 16)
    val h = be32(b, 20)
    val bitDepth = u8(b, 24)
    val colorType = u8(b, 25)
    if (u8(b, 26) != 0 || u8(b, 27) != 0) return null // compression/filter method
    if (u8(b, 28) != 0) return null                   // interlaced: out of contract
    // bound each dim BEFORE forming the product: with w, h near 2^31
    // the Long product h·(rowBytes+1) itself overflows past 2^63 and a
    // wrapped-negative size would sail through the cap (the r16
    // byte-walk lesson: every size check in overflow-free Long)
    if (w <= 0 || h <= 0 || w > MaxInflated || h > MaxInflated) return null
    if (bitDepth != 8) return null
    // palette images carry ONE index byte per pixel through the filter
    // stage; the PLTE indirection to RGB happens after unfiltering
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return null
    }
    val rowBytes = w * channels.toLong
    val inflatedLen = h * (rowBytes + 1) // ≤ 2^26 · (2^28+1): overflow-free
    if (inflatedLen > MaxInflated) return null
    // the palette EXPANSION (w·h·3) must obey the same cap as the
    // inflate buffer — a 1-byte-per-pixel image at the inflate cap
    // would otherwise allocate 3× past it
    if (colorType == 3 && h * w * 3L > MaxInflated) return null
    // chunk walk: collect IDAT extents in stream order (Long offsets —
    // a crafted length must not wrap the cursor); capture PLTE for
    // palette images (exactly one, before the first IDAT, 1–256
    // three-byte entries — anything else is out of contract)
    var at = 33L
    var idat = List.empty[(Int, Int)]
    var palette: Array[Byte] = null
    var ended = false
    while (!ended && at + 8 <= n) {
      val len = be32(b, at.toInt)
      if (len > Int.MaxValue || at + 12 + len > n) return null // truncated chunk
      if (isType(b, at.toInt + 4, "IDAT")) idat ::= ((at.toInt + 8, len.toInt))
      else if (isType(b, at.toInt + 4, "PLTE")) {
        if (palette != null || idat.nonEmpty) return null
        if (len == 0 || len % 3 != 0 || len > 768) return null
        palette = java.util.Arrays.copyOfRange(
          b, at.toInt + 8, at.toInt + 8 + len.toInt)
      }
      else if (isType(b, at.toInt + 4, "IEND")) ended = true
      at += 12 + len
    }
    if (idat.isEmpty) return null
    if (colorType == 3 && palette == null) return null // indexed, no table
    val ranges = idat.reverse
    val out = new Array[Byte](inflatedLen.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      var filled = 0
      val it = ranges.iterator
      while (filled < out.length && !inf.finished()) {
        if (inf.needsInput()) {
          if (!it.hasNext) return null // compressed stream truncated
          val (off, len) = it.next()
          inf.setInput(b, off, len)
        }
        val got = inf.inflate(out, filled, out.length - filled)
        if (got == 0 && inf.needsInput() && !it.hasNext) return null
        if (got == 0 && !inf.needsInput() && !inf.finished()) return null // dictionary etc.
        filled += got
      }
      if (filled < out.length) return null
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inf.end()
    // unfilter (bpp = channels at bit depth 8); filters operate on the
    // raw byte stream per the spec
    val rb = rowBytes.toInt
    val samples = new Array[Byte]((h * rowBytes).toInt)
    val bpp = channels
    var y = 0
    while (y < h) {
      val ft = u8(out, y * (rb + 1))
      val src = y * (rb + 1) + 1
      val dst = y * rb
      val prev = dst - rb
      var i = 0
      ft match {
        case 0 =>
          System.arraycopy(out, src, samples, dst, rb)
        case 1 => // Sub
          while (i < rb) {
            val left = if (i >= bpp) samples(dst + i - bpp) & 0xFF else 0
            samples(dst + i) = ((u8(out, src + i) + left) & 0xFF).toByte
            i += 1
          }
        case 2 => // Up
          while (i < rb) {
            val up = if (y > 0) samples(prev + i) & 0xFF else 0
            samples(dst + i) = ((u8(out, src + i) + up) & 0xFF).toByte
            i += 1
          }
        case 3 => // Average
          while (i < rb) {
            val left = if (i >= bpp) samples(dst + i - bpp) & 0xFF else 0
            val up = if (y > 0) samples(prev + i) & 0xFF else 0
            samples(dst + i) = ((u8(out, src + i) + (left + up) / 2) & 0xFF).toByte
            i += 1
          }
        case 4 => // Paeth
          while (i < rb) {
            val a = if (i >= bpp) samples(dst + i - bpp) & 0xFF else 0
            val c0 = if (y > 0) samples(prev + i) & 0xFF else 0
            val c = if (i >= bpp && y > 0) samples(prev + i - bpp) & 0xFF else 0
            val p = a + c0 - c
            val pa = math.abs(p - a); val pb = math.abs(p - c0); val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) c0 else c
            samples(dst + i) = ((u8(out, src + i) + pred) & 0xFF).toByte
            i += 1
          }
        case _ => return null // undefined filter type
      }
      y += 1
    }
    if (colorType != 3) new Decoded(w.toInt, h.toInt, channels, samples)
    else {
      // PLTE indirection: one table lookup per pixel ([[expandPalette]]
      // — shared with the GIF decoder); an index past the table is OUT
      // OF CONTRACT (null), never clamped or wrapped
      val rgb = expandPalette(samples, palette)
      if (rgb == null) null else new Decoded(w.toInt, h.toInt, 3, rgb)
    }
  }

  /** Exact integer grid color features over the REAL pixels — the
    * [[BmpPixels.gridFeatures]] construction (forward maps ⌊x·gx/w⌋ /
    * ⌊y·gy/h⌋, per-cell (r, g, b) Long sums, row-major). Gray
    * replicates into all three channels; alpha is ignored. */
  private[graft] def gridFeatures(b: Array[Byte], gx: Int, gy: Int): GenericArrayData = {
    val d = decode(b)
    if (d == null) return null
    val sums = new Array[Long](gx * gy * 3)
    val ch = d.channels
    var y = 0
    while (y < d.h) {
      val cy = (y.toLong * gy / d.h).toInt
      var x = 0
      while (x < d.w) {
        val cell = (cy * gx + (x.toLong * gx / d.w).toInt) * 3
        val at = (y.toLong * d.w + x).toInt * ch
        val r = d.samples(at) & 0xFF
        val (g, bl) =
          if (ch >= 3) (d.samples(at + 1) & 0xFF, d.samples(at + 2) & 0xFF)
          else (r, r) // gray / gray+alpha replicate
        sums(cell) += r; sums(cell + 1) += g; sums(cell + 2) += bl
        x += 1
      }
      y += 1
    }
    new GenericArrayData(sums)
  }

  /** Encode raw top-down RGB triples (w·h·3 bytes) as a minimal
    * standard PNG: 8-bit color type 2, filter-0 rows, one IDAT,
    * correct CRCs. Null when the payload length disagrees with the
    * dims or the dims exceed the decode cap (the encoder never emits
    * what the decoder would refuse). */
  private[graft] def encodeRgb(data: Array[Byte], w: Int, h: Int): Array[Byte] = {
    if (w <= 0 || h <= 0) return null
    val rowBytes = w.toLong * 3
    if (h * (rowBytes + 1) > MaxInflated) return null
    if (data.length.toLong != rowBytes * h) return null
    emitPng(data, w, h, rowBytes.toInt, colorType = 2, plte = null)
  }

  /** Encode a PALETTE PNG from raw top-down index bytes (w·h of them)
    * and a 1–256-entry RGB table (3·entries bytes) — 8-bit color type
    * 3, PLTE chunk, filter-0 rows, correct CRCs. Null when the lengths
    * disagree, the table is malformed, any index points past the table
    * (the decoder refuses such a pixel, and this encoder never emits
    * what the decoder would refuse), or the dims exceed the decode
    * caps. The fixture path that lets a SQL oracle value-check the
    * PLTE indirection end to end (the q163 encode→decode discipline). */
  private[graft] def encodePalette(indices: Array[Byte], w: Int, h: Int,
      palette: Array[Byte]): Array[Byte] = {
    if (!validPaletteArgs(indices, w, h, palette)) return null
    emitPng(indices, w, h, w, colorType = 3, plte = palette)
  }

  /** The shared palette-encoder refusal contract ([[encodePalette]] and
    * [[GifPixels.encodePalette]] — one rule set, so the two formats'
    * refusals cannot silently diverge): positive dims, a well-formed
    * 1–256-entry RGB table, indices exactly w·h with every value
    * inside the table, and the decode-side size caps (the filter-plane
    * and the ×3 expansion both under [[MaxInflated]]). */
  private[functions] def validPaletteArgs(indices: Array[Byte], w: Int,
      h: Int, palette: Array[Byte]): Boolean = {
    if (w <= 0 || h <= 0) return false
    if (palette == null || palette.length == 0 ||
      palette.length % 3 != 0 || palette.length > 768) return false
    val rowBytes = w.toLong
    if (h * (rowBytes + 1) > MaxInflated || h * w * 3L > MaxInflated) return false
    if (indices.length.toLong != rowBytes * h) return false
    val entries = palette.length / 3
    var i = 0
    while (i < indices.length) {
      if ((indices(i) & 0xFF) >= entries) return false
      i += 1
    }
    true
  }

  /** The PLTE/color-table indirection shared by both palette decoders:
    * top-down index bytes → RGB triples, null when any pixel indexes
    * past the table (never clamped or wrapped). */
  private[functions] def expandPalette(idx: Array[Byte],
      palette: Array[Byte]): Array[Byte] = {
    val entries = palette.length / 3
    val rgb = new Array[Byte](idx.length * 3)
    var i = 0
    while (i < idx.length) {
      val v = idx(i) & 0xFF
      if (v >= entries) return null
      rgb(3 * i) = palette(3 * v)
      rgb(3 * i + 1) = palette(3 * v + 1)
      rgb(3 * i + 2) = palette(3 * v + 2)
      i += 1
    }
    rgb
  }

  /** Shared emit: filter-0 rows, one deflate stream, IHDR(depth 8,
    * `colorType`), optional PLTE, IDAT, IEND — CRCs correct so
    * external decoders accept the file. */
  private def emitPng(data: Array[Byte], w: Int, h: Int, rb: Int,
      colorType: Int, plte: Array[Byte]): Array[Byte] = {
    val raw = new Array[Byte](h * (rb + 1))
    var y = 0
    while (y < h) {
      // filter byte 0 + the row
      System.arraycopy(data, y * rb, raw, y * (rb + 1) + 1, rb)
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    val compressed =
      try {
        deflater.setInput(raw); deflater.finish()
        val buf = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
        val tmp = new Array[Byte](8192)
        while (!deflater.finished()) buf.write(tmp, 0, deflater.deflate(tmp))
        buf.toByteArray
      } finally deflater.end()
    val out = new java.io.ByteArrayOutputStream(compressed.length + 57)
    def be(v: Long, nBytes: Int): Unit =
      ((nBytes - 1) to 0 by -1).foreach(i => out.write(((v >> (8 * i)) & 0xFF).toInt))
    def chunk(tpe: String, body: Array[Byte]): Unit = {
      be(body.length.toLong, 4)
      val crc = new java.util.zip.CRC32()
      val t = tpe.getBytes("US-ASCII")
      crc.update(t); crc.update(body)
      out.write(t); out.write(body); be(crc.getValue, 4)
    }
    out.write(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    val ihdr = new java.io.ByteArrayOutputStream(13)
    def beI(v: Long, nBytes: Int): Unit =
      ((nBytes - 1) to 0 by -1).foreach(i => ihdr.write(((v >> (8 * i)) & 0xFF).toInt))
    beI(w.toLong, 4); beI(h.toLong, 4)
    ihdr.write(8); ihdr.write(colorType); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    chunk("IHDR", ihdr.toByteArray)
    if (plte != null) chunk("PLTE", plte)
    chunk("IDAT", compressed)
    chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }
}

/** Exact integer grid features over a PNG's REAL pixels — the
  * [[BmpGridFeatures]] contract for the compressed sibling: Inflater +
  * the five scanline unfilters (+ the PLTE indirection for palette
  * images), then the same forward-map cell sums in exact long
  * arithmetic. Null for anything outside the decode contract
  * (16-bit/interlaced, malformed or missing PLTE, out-of-table
  * indexes, truncated IDAT, undefined filter types, over-cap dims). */
case class PngGridFeatures(child: Expression, gx: Int, gy: Int)
    extends UnaryExpression with CodegenFallback {
  require(gx >= 1 && gy >= 1 && gx <= 4096 && gy <= 4096,
    s"png_grid_features: grid must be 1..4096 per side, got ${gx}x$gy")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "png_grid_features"
  override def nullSafeEval(input: Any): Any =
    PngPixels.gridFeatures(input.asInstanceOf[Array[Byte]], gx, gy)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Encode raw top-down RGB triples as a standard 8-bit RGB PNG
  * ([[PngPixels.encodeRgb]]) — the compressed-thumbnail emit of an
  * asset pipeline ([[BmpResizeNearest]] is the uncompressed one), and
  * the fixture path that lets a SQL oracle value-check the PNG decoder
  * end to end. Null when the payload length ≠ w·h·3 or the dims exceed
  * the decode cap. */
case class PngEncodeRgb(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, int, int) inputs, got $other")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "png_encode_rgb"
  override def nullSafeEval(data: Any, w: Any, h: Any): Any =
    PngPixels.encodeRgb(data.asInstanceOf[Array[Byte]],
      w.asInstanceOf[Int], h.asInstanceOf[Int])
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Encode raw top-down index bytes + an RGB table as a standard 8-bit
  * PALETTE PNG ([[PngPixels.encodePalette]]) — the fixture path that
  * lets a SQL oracle value-check the decoder's PLTE indirection end to
  * end, and the icon/chart-thumbnail emit where 1 byte/pixel beats 3.
  * Null when `indices` ≠ w·h bytes, the table is empty/misaligned/over
  * 256 entries, any index points past the table, or the dims exceed
  * the decode caps. */
case class PngEncodePalette(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression
    with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (BinaryType, IntegerType, IntegerType, BinaryType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, int, int, binary) inputs, got $other")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "png_encode_palette"
  override def nullSafeEval(data: Any, w: Any, h: Any, palette: Any): Any =
    PngPixels.encodePalette(data.asInstanceOf[Array[Byte]],
      w.asInstanceOf[Int], h.asInstanceOf[Int],
      palette.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

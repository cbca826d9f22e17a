package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** REAL pixel decode for the fourth codec-free multimodal format: GIF
  * (public spec, GIF87a/89a) — header + logical-screen walk, global or
  * local color table, and a full variable-width LZW decoder (clear/end
  * codes, KwKwK case, dictionary growth to 4096, deferred width
  * bumps). The FIRST image frame decodes to RGB through the active
  * color table; extensions (GCE/comment/application) are skipped
  * structurally. Interlaced frames, a frame with no color table, an
  * index past the table, truncated sub-blocks and malformed LZW all
  * return null — the [[BmpPixels]]/[[PngPixels]] decode-or-null
  * discipline (never garbage, never a crash). Transparency (GCE) is
  * ignored like every other alpha channel in the feature surface.
  * Unlike PNG's CRC-bearing chunks there is no integrity field to
  * skip; a corrupt stream fails the LZW/size checks.
  *
  * [[GifPixels.encodePalette]] is the inverse for the common case —
  * raw top-down index bytes + an RGB table to a standard GIF89a (one
  * frame, global color table, literal-only LZW with correct
  * clear-code discipline so external decoders accept it) — the
  * fixture path that lets a SQL oracle value-check this decoder end
  * to end (the q163/q169 encode→decode discipline; q170).
  *
  * Scale posture: per-row byte walks (CodegenFallback — the
  * [[AudioHeader]] rationale), Long-safe size checks BEFORE
  * allocations, and the shared [[PngPixels.MaxInflated]] cap so a
  * crafted header cannot demand a multi-GB per-row allocation.
  */
object GifPixels {
  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  @inline private def le16(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8)

  private[graft] final class Decoded(
      val w: Int, val h: Int, val samples: Array[Byte]) // RGB triples

  /** Decode the first frame to top-down RGB triples; null for anything
    * outside the contract. */
  private[graft] def decode(b: Array[Byte]): Decoded = {
    val n = b.length
    if (n < 14) return null
    if (b(0) != 'G' || b(1) != 'I' || b(2) != 'F' || b(3) != '8' ||
      (b(4) != '7' && b(4) != '9') || b(5) != 'a') return null
    val packed = u8(b, 10)
    // the cursor walks in LONG (the r16 byte-walk lesson the PNG
    // sibling cites: near-2GB inputs must not wrap an Int bound check
    // into admitting a negative offset)
    var at = 13L
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val entries = 1 << ((packed & 7) + 1)
      if (at + 3L * entries > n) return null
      gct = java.util.Arrays.copyOfRange(b, at.toInt, (at + 3 * entries).toInt)
      at += 3 * entries
    }
    while (at < n) {
      u8(b, at.toInt) match {
        case 0x21 => // extension: label + sub-blocks
          at += 2
          var sub = true
          while (sub) {
            if (at >= n) return null
            val len = u8(b, at.toInt); at += 1 + len
            if (len == 0) sub = false
          }
        case 0x2C => // image descriptor — the frame we decode
          if (at + 10 > n) return null
          val fw = le16(b, (at + 5).toInt)
          val fh = le16(b, (at + 7).toInt)
          val packed2 = u8(b, (at + 9).toInt)
          at += 10
          if ((packed2 & 0x40) != 0) return null // interlaced: out of contract
          if (fw <= 0 || fh <= 0) return null
          if (fw.toLong * fh * 3 > PngPixels.MaxInflated) return null
          var table = gct
          if ((packed2 & 0x80) != 0) {
            val entries = 1 << ((packed2 & 7) + 1)
            if (at + 3L * entries > n) return null
            table = java.util.Arrays.copyOfRange(b, at.toInt, (at + 3 * entries).toInt)
            at += 3 * entries
          }
          if (table == null) return null // indexed data, no color table
          if (at >= n) return null
          val minCode = u8(b, at.toInt); at += 1
          if (minCode < 2 || minCode > 8) return null
          val idx = lzwDecode(b, at, minCode, fw * fh)
          if (idx == null) return null
          // the color-table indirection shared with the PNG decoder
          val rgb = PngPixels.expandPalette(idx, table)
          if (rgb == null) return null
          return new Decoded(fw, fh, rgb)
        case 0x3B => return null // trailer before any image frame
        case _ => return null    // undefined block type
      }
    }
    null
  }

  /** GIF LZW: variable code width from `minCode`+1, clear resets the
    * dictionary, KwKwK handled, growth capped at 4096 codes / width
    * 12. Exactly `nPixels` indexes must decode (short or overlong
    * streams are null). */
  private def lzwDecode(b: Array[Byte], subBlocksAt: Long, minCode: Int,
      nPixels: Int): Array[Byte] = {
    val n = b.length
    // gather the sub-block payload into one contiguous buffer (bounded
    // by the input length — no crafted expansion possible here); the
    // cursor stays in Long like the caller's chunk walk
    var at = subBlocksAt
    val buf = new java.io.ByteArrayOutputStream(256)
    var done = false
    while (!done) {
      if (at >= n) return null
      val len = u8(b, at.toInt); at += 1
      if (len == 0) done = true
      else {
        if (at + len > n) return null
        buf.write(b, at.toInt, len); at += len
      }
    }
    val data = buf.toByteArray
    val clear = 1 << minCode
    val end = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val out = new Array[Byte](nPixels)
    var outPos = 0
    var nextCode = end + 1
    var width = minCode + 1
    var prev = -1
    var bitPos = 0L
    val totalBits = data.length.toLong * 8
    val stack = new Array[Byte](4096)
    // expand `code` onto the output via the prefix-chain stack
    // (prefix(c) < c always, so chains are acyclic and ≤ 4096 long);
    // `repeatFirst` appends the expansion's own first byte — the KwKwK
    // case. Returns the first byte, or −1 when the stream would
    // overrun nPixels (out of contract).
    def expandInto(code: Int, repeatFirst: Boolean): Int = {
      var top = 0
      var c = code
      while (c >= clear) { stack(top) = suffix(c); top += 1; c = prefix(c) }
      val extra = if (repeatFirst) 1 else 0
      if (outPos + top + 1 + extra > nPixels) return -1
      out(outPos) = c.toByte; outPos += 1
      var t = top
      while (t > 0) { t -= 1; out(outPos) = stack(t); outPos += 1 }
      if (repeatFirst) { out(outPos) = c.toByte; outPos += 1 }
      c
    }
    while (outPos < nPixels) {
      if (bitPos + width > totalBits) return null // truncated stream
      var code = 0
      var got = 0
      while (got < width) {
        val byteAt = (bitPos >> 3).toInt
        code |= ((u8(data, byteAt) >> (bitPos & 7).toInt) & 1) << got
        got += 1; bitPos += 1
      }
      if (code == clear) { nextCode = end + 1; width = minCode + 1; prev = -1 }
      else if (code == end) return null // ended short of nPixels
      else if (prev == -1) {
        if (code >= clear) return null // first code after clear must be literal
        out(outPos) = code.toByte; outPos += 1
        prev = code
      } else {
        // valid here: a literal, an assigned dict code, or exactly
        // nextCode (KwKwK) — clear/end matched above and every code in
        // (end, nextCode) is assigned, so only past-nextCode is left
        if (code > nextCode) return null
        val first =
          if (code == nextCode) expandInto(prev, repeatFirst = true)
          else expandInto(code, repeatFirst = false)
        if (first < 0) return null
        if (nextCode < 4096) {
          prefix(nextCode) = prev
          suffix(nextCode) = first.toByte
          nextCode += 1
          if (nextCode == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    // the frame is full: a well-formed stream now carries the END code
    // (trailing padding bits after it are fine, and a stream that ends
    // exactly here — some real encoders omit END — is accepted), but
    // MORE pixel codes mean the stream encodes a bigger image than the
    // descriptor claims: out of contract, like every other
    // dims-vs-data disagreement in the multimodal decoders
    if (bitPos + width <= totalBits) {
      var code = 0
      var got = 0
      while (got < width) {
        val byteAt = (bitPos >> 3).toInt
        code |= ((u8(data, byteAt) >> (bitPos & 7).toInt) & 1) << got
        got += 1; bitPos += 1
      }
      if (code != end) return null
    }
    out
  }

  /** The [[PngPixels.gridFeatures]] contract over a GIF's first frame:
    * per-cell (r, g, b) Long sums, forward maps, row-major. */
  private[graft] def gridFeatures(b: Array[Byte], gx: Int, gy: Int): GenericArrayData = {
    val d = decode(b)
    if (d == null) return null
    val sums = new Array[Long](gx * gy * 3)
    var y = 0
    while (y < d.h) {
      val cy = (y.toLong * gy / d.h).toInt
      var x = 0
      while (x < d.w) {
        val cell = (cy * gx + (x.toLong * gx / d.w).toInt) * 3
        val at = (y * d.w + x) * 3
        sums(cell) += d.samples(at) & 0xFF
        sums(cell + 1) += d.samples(at + 1) & 0xFF
        sums(cell + 2) += d.samples(at + 2) & 0xFF
        x += 1
      }
      y += 1
    }
    new GenericArrayData(sums)
  }

  /** Encode raw top-down index bytes + an RGB table as a standard
    * GIF89a: logical screen = the frame, global color table padded to
    * the next power of two, one non-interlaced image, LITERAL-only LZW
    * (each pixel emitted as its own code, the encoder mirroring the
    * decoder's dictionary-width bookkeeping and emitting a clear code
    * before the table would overflow) — bigger than a compressing
    * encoder but valid for ANY decoder, deterministic, and linear.
    * Null exactly when the palette-PNG encoder would refuse
    * ([[PngPixels.encodePalette]]'s rules). */
  private[graft] def encodePalette(indices: Array[Byte], w: Int, h: Int,
      palette: Array[Byte]): Array[Byte] = {
    // one refusal contract with the palette-PNG encoder (shared rule
    // set — the two formats cannot silently diverge), plus the GIF
    // container's own limit: dims are 16-bit LE fields, so anything
    // wider would TRUNCATE into a corrupt-but-plausible stream
    if (!PngPixels.validPaletteArgs(indices, w, h, palette)) return null
    if (w > 0xFFFF || h > 0xFFFF) return null
    val entries = palette.length / 3
    var i = 0
    // global color table size: the next power of two ≥ entries (min 2)
    var bits = 1
    while ((1 << bits) < entries) bits += 1
    val gctEntries = 1 << bits
    val minCode = math.max(2, bits)
    val out = new java.io.ByteArrayOutputStream(indices.length * 2 + 64)
    def le(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le(w); le(h)
    out.write(0x80 | ((bits - 1) & 7)) // GCT present, size bits
    out.write(0); out.write(0)         // bg color, aspect
    out.write(palette, 0, palette.length)
    var pad = palette.length
    while (pad < gctEntries * 3) { out.write(0); pad += 1 }
    out.write(0x2C); le(0); le(0); le(w); le(h); out.write(0) // descriptor
    out.write(minCode)
    // literal-only LZW with the decoder's exact bookkeeping: emit
    // clear, then one code per pixel; every code after the first since
    // a clear grows the (unused) dictionary, widening codes in
    // lockstep with the decoder; clear again before the table fills
    val clear = 1 << minCode
    val endCode = clear + 1
    val bits0 = new java.io.ByteArrayOutputStream(indices.length + 16)
    var cur = 0L
    var curBits = 0
    var width = minCode + 1
    def put(code: Int): Unit = {
      cur |= code.toLong << curBits
      curBits += width
      while (curBits >= 8) {
        bits0.write((cur & 0xFF).toInt); cur >>= 8; curBits -= 8
      }
    }
    var nextCode = endCode + 1
    var first = true
    put(clear)
    i = 0
    while (i < indices.length) {
      put(indices(i) & 0xFF)
      if (first) first = false
      else {
        nextCode += 1
        if (nextCode == (1 << width) && width < 12) width += 1
      }
      // reset before the decoder's table fills — but never AFTER the
      // last pixel, where the decoder expects END (or nothing) next
      if (nextCode >= 4094 && i + 1 < indices.length) {
        put(clear); width = minCode + 1; nextCode = endCode + 1; first = true
      }
      i += 1
    }
    put(endCode)
    if (curBits > 0) bits0.write((cur & 0xFF).toInt)
    val stream = bits0.toByteArray
    var o = 0
    while (o < stream.length) {
      val len = math.min(255, stream.length - o)
      out.write(len); out.write(stream, o, len); o += len
    }
    out.write(0)    // sub-block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }
}

/** Exact integer grid features over a GIF first frame's REAL pixels —
  * the [[PngGridFeatures]] contract for the LZW sibling. Null for
  * anything outside the decode contract (interlaced, missing color
  * table, out-of-table pixels, truncated sub-blocks, malformed LZW,
  * over-cap dims). */
case class GifGridFeatures(child: Expression, gx: Int, gy: Int)
    extends UnaryExpression with CodegenFallback {
  require(gx >= 1 && gy >= 1 && gx <= 4096 && gy <= 4096,
    s"gif_grid_features: grid must be 1..4096 per side, got ${gx}x$gy")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "gif_grid_features"
  override def nullSafeEval(input: Any): Any =
    GifPixels.gridFeatures(input.asInstanceOf[Array[Byte]], gx, gy)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Encode raw top-down index bytes + an RGB table as a standard GIF89a
  * ([[GifPixels.encodePalette]]) — the animated-web-format sibling of
  * [[PngEncodePalette]], and the fixture path value-checking the LZW
  * decoder end to end. Null under the same refusals. */
case class GifEncodePalette(first: Expression, second: Expression,
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
  override def prettyName: String = "gif_encode_palette"
  override def nullSafeEval(data: Any, w: Any, h: Any, palette: Any): Any =
    GifPixels.encodePalette(data.asInstanceOf[Array[Byte]],
      w.asInstanceOf[Int], h.asInstanceOf[Int],
      palette.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** REAL sample decode for the first COMPRESSED audio format in the
  * multimodal surface: FLAC (public spec, RFC 9639) — metadata-block
  * walk (STREAMINFO), frame-header parse (every blocksize /
  * sample-rate code incl. the at-end forms, UTF-8-style coded frame
  * numbers, CRC-8 verified), all subframe types (CONSTANT, VERBATIM,
  * FIXED orders 0–4, LPC orders 1–32), rice-coded residuals (4- and
  * 5-bit parameter widths, escape-to-raw partitions, partition orders),
  * wasted-bits shifts, stereo decorrelation (left/side, right/side,
  * mid/side — integer-exact reconstruction), frame CRC-16 verified,
  * and the STREAMINFO MD5 checked when present. Decoded samples reduce
  * to the SAME fixed-`dims` integer amplitude envelope as
  * [[WavPcmFeatures]] (v(j) = Σ_channels s, bucket ⌊j·dims/n⌋), so one
  * oracle arithmetic covers both the raw and the compressed container.
  *
  * Contract edges (the [[BmpPixels]]/[[PngPixels]] decode-or-null
  * discipline — never garbage, never a crash): frame bit depth must be
  * 8 or 16 (the [[WavPcmFeatures]] envelope contract; side channels
  * carry their spec bps+1 internally), STREAMINFO must declare a
  * nonzero total-sample count and the stream must decode EXACTLY that
  * many, every CRC must verify, and every reconstructed sample must
  * fit its declared bit depth (an adversarial unstable predictor
  * cannot silently overflow into plausible wrong sums). Decode work is
  * linear in the input: per-frame state only, nothing sized by
  * declared-but-absent data.
  *
  * [[FlacPcm.encodePcm]] is the inverse for the common case — 16-bit
  * LE interleaved PCM to a real FLAC stream (honest STREAMINFO incl.
  * the actual MD5, 256-sample fixed-blocksize frames, CONSTANT /
  * FIXED-order-2-rice / VERBATIM subframes, correct CRCs so external
  * decoders accept it) — the fixture path that lets a SQL oracle
  * value-check this decoder end to end (the q163/q169/q170
  * encode→decode discipline). The LPC / decorrelation / escape /
  * wasted-bits paths the encoder never emits are pinned by hand-packed
  * bitstreams in FlacPcmSpec.
  *
  * Scale posture: per-row byte walks (CodegenFallback — the
  * [[AudioHeader]] rationale), Long bit-cursor arithmetic, per-sample
  * range checks BEFORE sums, and per-frame buffers bounded by the
  * format's own 65535-sample blocksize limit.
  */
object FlacPcm {
  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF

  /** CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — RFC 9639 §9.1.1. */
  private[functions] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= u8(b, i)
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF else (crc << 1) & 0xFF
        k += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — RFC 9639 §9.1.2. */
  private[functions] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= u8(b, i) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
        else (crc << 1) & 0xFFFF
        k += 1
      }
      i += 1
    }
    crc
  }

  /** MSB-first bit reader with a Long cursor and a sticky fail flag —
    * every read past the end sets `fail` and returns 0, so callers
    * check once per structural unit instead of per bit. */
  private final class Reader(b: Array[Byte], startByte: Int) {
    private val total: Long = b.length.toLong * 8
    var bit: Long = startByte.toLong * 8
    var fail: Boolean = false

    def bits(n: Int): Int = {
      // n <= 32; callers never ask for more in one int read
      if (fail || bit + n > total) { fail = true; return 0 }
      var v = 0
      var k = 0
      while (k < n) {
        val byteAt = (bit >> 3).toInt
        v = (v << 1) | ((u8(b, byteAt) >> (7 - (bit & 7).toInt)) & 1)
        bit += 1; k += 1
      }
      v
    }

    def bitsLong(n: Int): Long = {
      // n <= 56 (STREAMINFO's 36-bit total-samples field)
      if (fail || bit + n > total) { fail = true; return 0L }
      var v = 0L
      var k = 0
      while (k < n) {
        val byteAt = (bit >> 3).toInt
        v = (v << 1) | ((u8(b, byteAt) >> (7 - (bit & 7).toInt)) & 1)
        bit += 1; k += 1
      }
      v
    }

    /** Two's-complement signed read, n in 1..32. */
    def signed(n: Int): Int = {
      val v = bits(n)
      if (n == 32) v else (v << (32 - n)) >> (32 - n)
    }

    /** Unary: count of 0 bits before the terminating 1. Bounded by the
      * input length (each counted bit consumes stream). */
    def unary(): Int = {
      var q = 0
      while (!fail) {
        if (bits(1) == 1) return q
        q += 1
      }
      0
    }

    def alignByte(): Unit = { bit = (bit + 7) & ~7L }
    def bytePos: Int = (bit >> 3).toInt
    def atByteBoundary: Boolean = (bit & 7) == 0
  }

  // ---------------------------------------------------------------- decode

  /** Decode a FLAC stream and reduce to `dims` exact long bucket sums
    * (the [[WavPcmFeatures]] envelope contract); null for anything
    * outside the decode contract. */
  private[graft] def features(b: Array[Byte], dims: Int): GenericArrayData = {
    val n = b.length
    if (n < 42) return null // magic + STREAMINFO header + body would not fit
    if (b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C') return null

    // metadata walk: STREAMINFO first (spec-mandatory), others skipped
    var at = 4L
    var last = false
    var sawStreamInfo = false
    var streamCh = -1; var streamBps = -1
    var totalSamples = -1L
    var md5: Array[Byte] = null
    while (!last) {
      if (at + 4 > n) return null
      val head = u8(b, at.toInt)
      last = (head & 0x80) != 0
      val typ = head & 0x7F
      val len = (u8(b, at.toInt + 1).toLong << 16) |
        (u8(b, at.toInt + 2) << 8) | u8(b, at.toInt + 3)
      if (at + 4 + len > n) return null
      if (!sawStreamInfo) {
        if (typ != 0 || len != 34) return null // first block must be STREAMINFO
        val r = new Reader(b, at.toInt + 4)
        r.bits(16); r.bits(16)           // min/max blocksize (informative here)
        r.bits(24); r.bits(24)           // min/max frame size
        r.bits(20)                       // sample rate (features don't use it)
        streamCh = r.bits(3) + 1
        streamBps = r.bits(5) + 1
        totalSamples = r.bitsLong(36)
        if (r.fail) return null
        md5 = java.util.Arrays.copyOfRange(b, at.toInt + 22, at.toInt + 38)
        sawStreamInfo = true
      } else if (typ == 127) return null // invalid block type
      at += 4 + len
    }
    if (!sawStreamInfo) return null
    // a stream that does not declare its length cannot be bucketed in
    // one pass — out of contract (every real encoder writes it)
    if (totalSamples <= 0) return null
    if (streamBps != 8 && streamBps != 16) return null // the WAV envelope contract
    if (streamCh < 1 || streamCh > 8) return null

    var checkMd5 = false
    var mdIdx = 0
    while (mdIdx < 16) { if (md5(mdIdx) != 0) checkMd5 = true; mdIdx += 1 }
    val digest =
      if (checkMd5) java.security.MessageDigest.getInstance("MD5") else null

    val sums = new Array[Long](dims)
    var g = 0L // global inter-channel frame (sample-time) index
    var cursor = at.toInt
    // per-frame channel buffers, sized to the format's own blocksize
    // limit lazily (most streams never hit 65535)
    var chans: Array[Array[Long]] = null
    var chansBs = 0

    while (cursor < n) {
      val frameStart = cursor
      if (cursor + 5 > n) return null
      // sync 11111111 111110xx (14 bits) + reserved 0 + blocking strategy
      if (u8(b, cursor) != 0xFF || (u8(b, cursor + 1) & 0xFC) != 0xF8) return null
      val bsCode = u8(b, cursor + 2) >> 4
      val srCode = u8(b, cursor + 2) & 0x0F
      val chAsgn = u8(b, cursor + 3) >> 4
      val sizeCode = (u8(b, cursor + 3) >> 1) & 0x07
      if ((u8(b, cursor + 3) & 1) != 0) return null // reserved bit
      cursor += 4
      // UTF-8-style coded frame/sample number: structure validated,
      // value unused (features are position-derived)
      val lead = u8(b, cursor)
      val cont =
        if (lead < 0x80) 0
        else if (lead >= 0xC0 && lead < 0xE0) 1
        else if (lead >= 0xE0 && lead < 0xF0) 2
        else if (lead >= 0xF0 && lead < 0xF8) 3
        else if (lead >= 0xF8 && lead < 0xFC) 4
        else if (lead >= 0xFC && lead < 0xFE) 5
        else if (lead == 0xFE) 6
        else return null // continuation or 0xFF lead byte
      if (cursor + 1 + cont > n) return null
      var ci = 0
      while (ci < cont) {
        if ((u8(b, cursor + 1 + ci) & 0xC0) != 0x80) return null
        ci += 1
      }
      cursor += 1 + cont
      val blockSize = bsCode match {
        case 0 => return null // reserved
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 =>
          if (cursor + 1 > n) return null
          val v = u8(b, cursor) + 1; cursor += 1; v
        case 7 =>
          if (cursor + 2 > n) return null
          val v = ((u8(b, cursor) << 8) | u8(b, cursor + 1)) + 1; cursor += 2; v
        case c => 256 << (c - 8)
      }
      srCode match {
        case 15 => return null // invalid
        case 12 => if (cursor + 1 > n) return null else cursor += 1
        case 13 | 14 => if (cursor + 2 > n) return null else cursor += 2
        case _ => () // 0 = STREAMINFO, 1–11 = table codes: no extra bytes
      }
      if (cursor + 1 > n) return null
      if (crc8(b, frameStart, cursor) != u8(b, cursor)) return null
      cursor += 1

      val channels = chAsgn match {
        case a if a <= 7 => a + 1
        case 8 | 9 | 10 => 2
        case _ => return null // reserved assignments
      }
      if (channels != streamCh) return null // frames must agree with STREAMINFO
      val bps = sizeCode match {
        case 0 => streamBps
        case 1 => 8
        case 4 => 16
        case _ => return null // 12/20/24/32-bit and reserved: out of contract
      }
      if (bps != streamBps) return null

      if (blockSize > chansBs) {
        chans = Array.fill(channels)(new Array[Long](blockSize))
        chansBs = blockSize
      } else if (chans == null || chans.length != channels) {
        chans = Array.fill(channels)(new Array[Long](chansBs))
      }

      val r = new Reader(b, cursor)
      var c = 0
      while (c < channels) {
        // side channels carry one extra bit (RFC 9639 §9.2.1)
        val chBps = bps + (chAsgn match {
          case 8 if c == 1 => 1
          case 9 if c == 0 => 1
          case 10 if c == 1 => 1
          case _ => 0
        })
        if (!readSubframe(r, chans(c), blockSize, chBps)) return null
        c += 1
      }
      if (r.fail) return null
      r.alignByte()
      val crcAt = r.bytePos
      if (crcAt + 2 > n) return null
      if (crc16(b, frameStart, crcAt) !=
        ((u8(b, crcAt) << 8) | u8(b, crcAt + 1))) return null
      cursor = crcAt + 2

      // stereo decorrelation to L/R (integer-exact; RFC 9639 §4.1)
      if (chAsgn == 8) { // left/side: ch0 = left, ch1 = side
        var j = 0
        while (j < blockSize) { chans(1)(j) = chans(0)(j) - chans(1)(j); j += 1 }
      } else if (chAsgn == 9) { // right/side: ch0 = side, ch1 = right
        var j = 0
        while (j < blockSize) {
          val side = chans(0)(j)
          chans(0)(j) = chans(1)(j) + side
          j += 1
        }
      } else if (chAsgn == 10) { // mid/side
        var j = 0
        while (j < blockSize) {
          val side = chans(1)(j)
          val sum = (chans(0)(j) << 1) | (side & 1L)
          chans(0)(j) = (sum + side) >> 1
          chans(1)(j) = (sum - side) >> 1
          j += 1
        }
      }
      // decorrelated output must fit the frame bit depth too
      val lo = -(1L << (bps - 1)); val hi = (1L << (bps - 1)) - 1
      var cc = 0
      while (cc < channels) {
        var j = 0
        val a = chans(cc)
        while (j < blockSize) {
          if (a(j) < lo || a(j) > hi) return null
          j += 1
        }
        cc += 1
      }

      // envelope accumulation + incremental MD5 (interleaved LE samples
      // at bps/8 bytes — the layout the STREAMINFO digest covers)
      if (g + blockSize > totalSamples) return null // more than declared
      val md5Buf =
        if (digest != null) new Array[Byte](blockSize * channels * (bps / 8))
        else null
      var j = 0
      while (j < blockSize) {
        var v = 0L
        var c2 = 0
        while (c2 < channels) {
          val s = chans(c2)(j)
          v += s
          if (md5Buf != null) {
            val base = (j * channels + c2) * (bps / 8)
            if (bps == 8) md5Buf(base) = s.toByte
            else { md5Buf(base) = (s & 0xFF).toByte; md5Buf(base + 1) = ((s >> 8) & 0xFF).toByte }
          }
          c2 += 1
        }
        sums(((g + j) * dims / totalSamples).toInt) += v
        j += 1
      }
      if (digest != null) digest.update(md5Buf)
      g += blockSize
    }
    if (g != totalSamples) return null // declared length not delivered
    if (digest != null && !java.util.Arrays.equals(digest.digest(), md5))
      return null
    new GenericArrayData(sums)
  }

  /** One subframe into `out(0 until bs)`; false = out of contract. */
  private def readSubframe(r: Reader, out: Array[Long], bs: Int, bps: Int): Boolean = {
    if (r.bits(1) != 0) return false // padding bit must be 0
    val typ = r.bits(6)
    var wasted = 0
    if (r.bits(1) == 1) wasted = r.unary() + 1
    if (r.fail) return false
    val eff = bps - wasted
    if (eff <= 0) return false
    val ok = typ match {
      case 0 => // CONSTANT
        val v = r.signed(eff).toLong
        var j = 0
        while (j < bs) { out(j) = v; j += 1 }
        !r.fail
      case 1 => // VERBATIM
        var j = 0
        while (j < bs) { out(j) = r.signed(eff).toLong; j += 1 }
        !r.fail
      case t if t >= 8 && t <= 12 => // FIXED, order = t - 8
        val order = t - 8
        if (order > bs) return false
        var j = 0
        while (j < order) { out(j) = r.signed(eff).toLong; j += 1 }
        if (!readResiduals(r, out, bs, order)) return false
        // reconstruct; every sample must fit eff bits (an adversarial
        // stream cannot run the predictor into silent overflow)
        val lo = -(1L << (eff - 1)); val hi = (1L << (eff - 1)) - 1
        j = order
        while (j < bs) {
          val p = order match {
            case 0 => 0L
            case 1 => out(j - 1)
            case 2 => 2 * out(j - 1) - out(j - 2)
            case 3 => 3 * out(j - 1) - 3 * out(j - 2) + out(j - 3)
            case _ => 4 * out(j - 1) - 6 * out(j - 2) + 4 * out(j - 3) - out(j - 4)
          }
          out(j) += p
          if (out(j) < lo || out(j) > hi) return false
          j += 1
        }
        true
      case t if t >= 32 => // LPC, order = (t & 31) + 1
        val order = (t & 31) + 1
        if (order > bs) return false
        var j = 0
        while (j < order) { out(j) = r.signed(eff).toLong; j += 1 }
        val precM1 = r.bits(4)
        if (precM1 == 15) return false // forbidden
        val prec = precM1 + 1
        val shift = r.signed(5)
        if (shift < 0) return false
        val coefs = new Array[Long](order)
        var k = 0
        while (k < order) { coefs(k) = r.signed(prec).toLong; k += 1 }
        if (r.fail) return false
        if (!readResiduals(r, out, bs, order)) return false
        // bounded: |sample| < 2^17, |coef| < 2^15, order ≤ 32 ⇒ the
        // accumulator stays under 2^37 — the per-sample range check
        // keeps it bounded for the NEXT prediction as well
        val lo = -(1L << (eff - 1)); val hi = (1L << (eff - 1)) - 1
        j = order
        while (j < bs) {
          var acc = 0L
          k = 0
          while (k < order) { acc += coefs(k) * out(j - 1 - k); k += 1 }
          out(j) += (acc >> shift)
          if (out(j) < lo || out(j) > hi) return false
          j += 1
        }
        true
      case _ => false // reserved subframe types
    }
    if (!ok) return false
    if (wasted > 0) {
      var j = 0
      while (j < bs) { out(j) <<= wasted; j += 1 }
    }
    true
  }

  /** Rice-coded residual section into `out(order until bs)`. */
  private def readResiduals(r: Reader, out: Array[Long], bs: Int, order: Int): Boolean = {
    val method = r.bits(2)
    if (method > 1) return false // reserved coding methods
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val po = r.bits(4)
    val parts = 1 << po
    if (bs % parts != 0) return false
    var idx = order
    var p = 0
    while (p < parts) {
      val count = (bs >> po) - (if (p == 0) order else 0)
      if (count < 0) return false
      val param = r.bits(paramBits)
      if (param == escape) {
        val raw = r.bits(5)
        var i = 0
        while (i < count) {
          out(idx) = if (raw == 0) 0L else r.signed(raw).toLong
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < count) {
          val q = r.unary()
          if (r.fail) return false
          val z = (q.toLong << param) | r.bits(param).toLong
          out(idx) = (z >>> 1) ^ -(z & 1L) // unfold zigzag
          idx += 1; i += 1
        }
      }
      p += 1
    }
    !r.fail
  }

  // ---------------------------------------------------------------- encode

  /** MSB-first bit writer over a growable buffer; the frame CRCs are
    * computed over the produced bytes in place. */
  private final class Writer(initial: Int) {
    private[FlacPcm] var buf = new Array[Byte](math.max(initial, 64))
    var nBytes = 0
    private var acc = 0
    private var accBits = 0

    private def ensure(extra: Int): Unit =
      if (nBytes + extra > buf.length)
        buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, nBytes + extra))

    def bits(v: Long, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        acc = (acc << 1) | ((v >> k) & 1L).toInt
        accBits += 1
        if (accBits == 8) { ensure(1); buf(nBytes) = acc.toByte; nBytes += 1; acc = 0; accBits = 0 }
        k -= 1
      }
    }

    def byte(v: Int): Unit = bits(v.toLong & 0xFF, 8)

    def alignZero(): Unit = if (accBits > 0) bits(0, 8 - accBits)

    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, nBytes)
  }

  /** The blocksize every non-final frame uses: small enough that fixture
    * corpora exercise multi-frame streams, real enough to be efficient
    * (FLAC's own default is 4096; any value is valid in the container). */
  private val EncodeBlock = 256

  /** Encode 16-bit little-endian interleaved PCM as a real FLAC stream:
    * honest STREAMINFO (actual min/max blocksize, actual MD5),
    * fixed-blocksize frames of [[EncodeBlock]] samples, per-subframe
    * CONSTANT / FIXED-order-2-with-rice / VERBATIM (short blocks)
    * selection, correct CRC-8/CRC-16. Null when channels ∉ [1, 8], the
    * sample rate does not fit STREAMINFO's 20-bit field, the payload
    * is not whole 16-bit frames, or it is empty (the decoder requires a
    * declared nonzero length). Streams shorter than 16 samples are
    * emitted with their natural short blocksize — below the spec's
    * minimum STREAMINFO blocksize but accepted by decoders, and the
    * engine's own decoder treats blocksize as data. */
  private[graft] def encodePcm(pcm: Array[Byte], channels: Int,
      sampleRate: Int): Array[Byte] = {
    if (channels < 1 || channels > 8) return null
    if (sampleRate < 1 || sampleRate >= (1 << 20)) return null
    val frameBytes = 2 * channels
    if (pcm.length == 0 || pcm.length % frameBytes != 0) return null
    val total = pcm.length / frameBytes
    val nFrames = (total + EncodeBlock - 1) / EncodeBlock
    val lastBs = total - (nFrames - 1) * EncodeBlock
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(pcm)

    val w = new Writer(pcm.length / 2 + 128)
    w.byte('f'); w.byte('L'); w.byte('a'); w.byte('C')
    w.byte(0x80) // last metadata block, type 0 = STREAMINFO
    w.bits(34, 24)
    // the spec's min/max exclude the (possibly short) last block, so a
    // multi-frame stream is uniformly EncodeBlock-sized here
    val minBs = if (nFrames == 1) lastBs else EncodeBlock
    w.bits(minBs, 16); w.bits(minBs, 16)
    w.bits(0, 24); w.bits(0, 24) // min/max frame size unknown
    w.bits(sampleRate, 20)
    w.bits(channels - 1, 3)
    w.bits(15, 5) // bps − 1
    w.bits(total.toLong, 36)
    var i = 0
    while (i < 16) { w.byte(md5(i) & 0xFF); i += 1 }

    val samples = new Array[Int](EncodeBlock)
    var f = 0
    while (f < nFrames) {
      val bs = if (f == nFrames - 1) lastBs else EncodeBlock
      val frameAt = w.nBytes
      w.byte(0xFF); w.byte(0xF8) // sync + fixed blocksize strategy
      // uncommon-blocksize forms exercise the decoder's at-end paths
      val bsCode = if (bs <= 256) 6 else 7
      w.byte((bsCode << 4) | 0)                 // sample rate from STREAMINFO
      w.byte(((channels - 1) << 4) | (4 << 1))  // independent, 16-bit, reserved 0
      // UTF-8-style coded frame number — all forms up to 6 bytes, so a
      // 2^31-frame index still emits a well-formed header (the 4-byte
      // form tops out at 21 bits; a longer stream would otherwise
      // self-reject on its own continuation/CRC check)
      if (f < 0x80) w.byte(f)
      else if (f < 0x800) { w.byte(0xC0 | (f >> 6)); w.byte(0x80 | (f & 0x3F)) }
      else if (f < 0x10000) {
        w.byte(0xE0 | (f >> 12)); w.byte(0x80 | ((f >> 6) & 0x3F))
        w.byte(0x80 | (f & 0x3F))
      } else if (f < 0x200000) {
        w.byte(0xF0 | (f >> 18)); w.byte(0x80 | ((f >> 12) & 0x3F))
        w.byte(0x80 | ((f >> 6) & 0x3F)); w.byte(0x80 | (f & 0x3F))
      } else if (f < 0x4000000) {
        w.byte(0xF8 | (f >> 24)); w.byte(0x80 | ((f >> 18) & 0x3F))
        w.byte(0x80 | ((f >> 12) & 0x3F)); w.byte(0x80 | ((f >> 6) & 0x3F))
        w.byte(0x80 | (f & 0x3F))
      } else {
        w.byte(0xFC | (f >>> 30)); w.byte(0x80 | ((f >> 24) & 0x3F))
        w.byte(0x80 | ((f >> 18) & 0x3F)); w.byte(0x80 | ((f >> 12) & 0x3F))
        w.byte(0x80 | ((f >> 6) & 0x3F)); w.byte(0x80 | (f & 0x3F))
      }
      if (bsCode == 6) w.byte(bs - 1) else { w.byte((bs - 1) >> 8); w.byte((bs - 1) & 0xFF) }
      w.byte(crc8(w.buf, frameAt, w.nBytes))

      var c = 0
      while (c < channels) {
        var j = 0
        val base = f * EncodeBlock
        while (j < bs) {
          val at = ((base + j) * channels + c) * 2
          samples(j) = ((u8(pcm, at) | (u8(pcm, at + 1) << 8)) << 16) >> 16
          j += 1
        }
        writeSubframe(w, samples, bs)
        c += 1
      }
      w.alignZero()
      val crc = crc16(w.buf, frameAt, w.nBytes)
      w.byte(crc >> 8); w.byte(crc & 0xFF)
      f += 1
    }
    w.result()
  }

  /** CONSTANT when flat, VERBATIM when too short for a useful
    * predictor, FIXED order 2 + one rice partition otherwise (rice
    * parameter = the total-bits minimizer, deterministic). */
  private def writeSubframe(w: Writer, s: Array[Int], bs: Int): Unit = {
    var allEq = true
    var j = 1
    while (j < bs && allEq) { if (s(j) != s(0)) allEq = false; j += 1 }
    if (allEq) {
      w.bits(0, 1); w.bits(0, 6); w.bits(0, 1)
      w.bits(s(0).toLong & 0xFFFF, 16)
      return
    }
    if (bs < 8) {
      w.bits(0, 1); w.bits(1, 6); w.bits(0, 1)
      j = 0
      while (j < bs) { w.bits(s(j).toLong & 0xFFFF, 16); j += 1 }
      return
    }
    w.bits(0, 1); w.bits(10, 6); w.bits(0, 1) // FIXED order 2 = 0b001010
    w.bits(s(0).toLong & 0xFFFF, 16); w.bits(s(1).toLong & 0xFFFF, 16)
    // residuals and their zigzag folds (e ≤ 4·2^15 ⇒ z < 2^19)
    val z = new Array[Int](bs - 2)
    j = 2
    while (j < bs) {
      val e = s(j) - 2 * s(j - 1) + s(j - 2)
      z(j - 2) = (e << 1) ^ (e >> 31)
      j += 1
    }
    var bestP = 0
    var bestCost = Long.MaxValue
    var p = 0
    while (p <= 14) {
      var cost = 0L
      var i = 0
      while (i < z.length) { cost += (z(i) >>> p) + 1 + p; i += 1 }
      if (cost < bestCost) { bestCost = cost; bestP = p }
      p += 1
    }
    w.bits(0, 2)      // rice method 0 (4-bit parameters)
    w.bits(0, 4)      // partition order 0
    w.bits(bestP, 4)
    var i = 0
    while (i < z.length) {
      var q = z(i) >>> bestP
      while (q >= 32) { w.bits(0, 32); q -= 32 }
      w.bits(1, q + 1) // q zeros then the terminating 1
      if (bestP > 0) w.bits(z(i).toLong & ((1L << bestP) - 1), bestP)
      i += 1
    }
  }
}

/** Exact integer amplitude envelope over a FLAC stream's REAL decoded
  * samples — the [[WavPcmFeatures]] contract for the compressed
  * container (same v(j) = Σ_channels s, same ⌊j·dims/n⌋ buckets), so
  * one oracle arithmetic value-checks both. Null for anything outside
  * the decode contract (bad CRCs, reserved codes, undeclared length,
  * out-of-range samples, truncation, bit depths beyond 8/16). */
case class FlacPcmFeatures(child: Expression, dims: Int)
    extends UnaryExpression with CodegenFallback {
  require(dims >= 1, s"flac_pcm_features: dims must be >= 1, got $dims")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "flac_pcm_features"
  override def nullSafeEval(input: Any): Any =
    FlacPcm.features(input.asInstanceOf[Array[Byte]], dims)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Encode 16-bit LE interleaved PCM as a real FLAC stream
  * ([[FlacPcm.encodePcm]]) — the compressed-audio emit beside the raw
  * WAV surface, and the fixture path that lets a SQL oracle value-check
  * the FLAC decoder end to end (the q163/q169/q170 encode→decode
  * discipline). Null when channels ∉ [1, 8], the rate overflows the
  * 20-bit STREAMINFO field, or the payload is empty / not whole
  * frames. */
case class FlacEncodePcm(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, int, int) inputs, got $other")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "flac_encode_pcm"
  override def nullSafeEval(pcm: Any, channels: Any, rate: Any): Any =
    FlacPcm.encodePcm(pcm.asInstanceOf[Array[Byte]],
      channels.asInstanceOf[Int], rate.asInstanceOf[Int])
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

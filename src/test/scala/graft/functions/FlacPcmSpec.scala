package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Multimodal

class FlacPcmSpec extends SparkSpec {
  import spark.implicits._

  /** Spec-side MSB-first bit writer for hand-packed FLAC bitstreams —
    * each test controls the exact bits the decoder must invert. */
  private final class BW {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nb = 0
    def bits(v: Long, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        acc = (acc << 1) | ((v >> k) & 1L).toInt
        nb += 1
        if (nb == 8) { out.write(acc); acc = 0; nb = 0 }
        k -= 1
      }
    }
    def byte(v: Int): Unit = bits(v.toLong & 0xFF, 8)
    def align(): Unit = if (nb > 0) bits(0, 8 - nb)
    def result: Array[Byte] = { require(nb == 0, "unaligned"); out.toByteArray }
  }

  /** fLaC magic + a minimal last-block STREAMINFO (zero MD5 = skip the
    * digest check; hand-packed samples have no natural PCM buffer). */
  private def streamInfo(ch: Int, bps: Int, total: Long): Array[Byte] = {
    val w = new BW
    "fLaC".foreach(c => w.byte(c))
    w.byte(0x80); w.bits(34, 24)
    w.bits(16, 16); w.bits(65535, 16)
    w.bits(0, 24); w.bits(0, 24)
    w.bits(8000, 20); w.bits(ch - 1, 3); w.bits(bps - 1, 5); w.bits(total, 36)
    (0 until 16).foreach(_ => w.byte(0))
    w.result
  }

  /** One frame: header (blocksize-at-end form, rate from STREAMINFO,
    * frame number 0, correct CRC-8), `body` bits, alignment, CRC-16. */
  private def frame(ch: Int, chAsgn: Int, bps: Int, bs: Int)(
      body: BW => Unit): Array[Byte] = {
    val sizeCode = if (bps == 8) 1 else 4
    val hdr = new BW
    hdr.byte(0xFF); hdr.byte(0xF8)
    hdr.byte(0x60) // blocksize code 6 (8-bit at end), sample rate code 0
    hdr.byte((chAsgn << 4) | (sizeCode << 1))
    hdr.byte(0) // coded frame number 0
    hdr.byte(bs - 1)
    val h = hdr.result
    val w = new BW
    h.foreach(b => w.byte(b & 0xFF))
    w.byte(FlacPcm.crc8(h, 0, h.length))
    body(w)
    w.align()
    val sofar = w.result
    val crc = FlacPcm.crc16(sofar, 0, sofar.length)
    val full = new BW
    sofar.foreach(b => full.byte(b & 0xFF))
    full.byte(crc >> 8); full.byte(crc & 0xFF)
    full.result
  }

  private def flacFeats(bytes: Array[Byte], dims: Int): Option[Seq[Long]] =
    Seq(Tuple1(bytes)).toDF("b")
      .select(Multimodal.flacPcmFeatures(col("b"), dims).as("f"))
      .as[Option[Seq[Long]]].head()

  /** The WavPcmFeatures envelope over per-time-index channel sums. */
  private def envelope(v: Seq[Long], dims: Int): Seq[Long] = {
    val sums = new Array[Long](dims)
    v.zipWithIndex.foreach { case (x, j) => sums((j.toLong * dims / v.size).toInt) += x }
    sums.toSeq
  }

  /** 16-bit mono/interleaved PCM LE bytes. */
  private def pcmBytes(samples: Seq[Int]): Array[Byte] =
    samples.flatMap(s => Seq((s & 0xFF).toByte, ((s >> 8) & 0xFF).toByte)).toArray

  /** Structurally valid 16-bit PCM WAV around the same samples — the
    * cross-decoder law partner. */
  private def wav(samples: Seq[Int], channels: Int): Array[Byte] = {
    val data = pcmBytes(samples)
    val out = new java.io.ByteArrayOutputStream()
    def le(v: Long, n: Int): Unit =
      (0 until n).foreach(i => out.write(((v >> (8 * i)) & 0xFF).toInt))
    out.write("RIFF".getBytes); le(36L + data.length, 4); out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); le(16, 4); le(1, 2); le(channels, 2)
    le(8000, 4); le(8000L * 2 * channels, 4); le(2 * channels, 2); le(16, 2)
    out.write("data".getBytes); le(data.length, 4); out.write(data)
    out.toByteArray
  }

  private def encodeDecode(samples: Seq[Int], channels: Int,
      dims: Int): (Option[Seq[Long]], Option[Seq[Long]]) = {
    val row = Seq((pcmBytes(samples), wav(samples, channels)))
      .toDF("pcm", "wav")
      .select(
        Multimodal.flacPcmFeatures(
          Multimodal.flacEncodePcm(col("pcm"), lit(channels), lit(8000)), dims).as("f"),
        Multimodal.wavPcmFeatures(col("wav"), dims).as("w"))
      .as[(Option[Seq[Long]], Option[Seq[Long]])].head()
    row
  }

  // deterministic pseudo-random 16-bit samples (no Random in specs)
  private def lcg(seed: Long, n: Int): Seq[Int] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L)
      .drop(1).take(n).map(s => ((s >>> 16) & 0xFFFF).toInt.toShort.toInt).toSeq

  test("encode→decode equals the WAV decoder on the same samples (mono, multi-frame)") {
    val s = lcg(7, 700) // 3 frames: 256 + 256 + 188
    val (f, w) = encodeDecode(s, 1, 4)
    assert(f.isDefined && f == w)
  }

  test("encode→decode law holds for stereo and for 3 channels") {
    for (ch <- Seq(2, 3)) {
      val s = lcg(ch, 300 * ch)
      val (f, w) = encodeDecode(s, ch, 4)
      assert(f.isDefined && f == w, s"channels=$ch")
    }
  }

  test("constant and short-tail (verbatim) subframe paths round-trip") {
    val flat = Seq.fill(40)(-123)
    assert(encodeDecode(flat, 1, 2) match { case (f, w) => f.isDefined && f == w })
    val shortTail = lcg(11, 260) // last frame bs=4 < 8 → verbatim
    assert(encodeDecode(shortTail, 1, 3) match { case (f, w) => f.isDefined && f == w })
    val tiny = Seq(5, -5, 7) // single short frame
    assert(encodeDecode(tiny, 1, 1) match { case (f, w) => f.isDefined && f == w })
  }

  test("encoder refusals: bad channels, bad rate, ragged or empty payload") {
    val enc = Seq(
      (pcmBytes(Seq(1, 2)), 0, 8000),
      (pcmBytes(Seq(1, 2)), 9, 8000),
      (pcmBytes(Seq(1, 2)), 1, 1 << 20),
      (pcmBytes(Seq(1, 2, 3)), 2, 8000), // 3 samples not whole stereo frames
      (Array.empty[Byte], 1, 8000))
      .toDF("pcm", "ch", "rate")
      .select(Multimodal.flacEncodePcm(col("pcm"), col("ch"), col("rate")).as("b"))
      .as[Option[Array[Byte]]].collect()
    assert(enc.forall(_.isEmpty))
  }

  test("decoder refusals: truncation, flipped MD5, trailing garbage, short declared length") {
    val bytes = Seq(Tuple1(pcmBytes(lcg(3, 100))))
      .toDF("pcm")
      .select(Multimodal.flacEncodePcm(col("pcm"), lit(1), lit(8000)).as("b"))
      .as[Array[Byte]].head()
    assert(flacFeats(bytes, 2).isDefined)
    assert(flacFeats(bytes.dropRight(1), 2).isEmpty)   // mid-frame truncation
    assert(flacFeats(bytes.take(30), 2).isEmpty)       // mid-STREAMINFO truncation
    val badMd5 = bytes.clone(); badMd5(30) = (badMd5(30) ^ 1).toByte
    assert(flacFeats(badMd5, 2).isEmpty)               // MD5 mismatch
    assert(flacFeats(bytes :+ 0.toByte, 2).isEmpty)    // bytes after the last frame
    val badSync = bytes.clone()
    badSync(42) = 0.toByte                             // first frame's sync byte
    assert(flacFeats(badSync, 2).isEmpty)
    // STREAMINFO declaring fewer samples than the frames deliver
    val short = streamInfo(1, 16, 3) ++ frame(1, 0, 16, 4) { w =>
      w.bits(0, 1); w.bits(1, 6); w.bits(0, 1) // verbatim
      Seq(1, 2, 3, 4).foreach(s => w.bits(s.toLong & 0xFFFF, 16))
    }
    assert(flacFeats(short, 1).isEmpty)
  }

  test("hand-packed LPC subframe (order 1, coeff 1, shift 0) reconstructs") {
    val samples = Seq(100, 103, 99, 110, 110, 90, 95, 96)
    val bytes = streamInfo(1, 16, 8) ++ frame(1, 0, 16, 8) { w =>
      w.bits(0, 1); w.bits(32, 6); w.bits(0, 1) // LPC order 1
      w.bits(samples.head.toLong & 0xFFFF, 16)  // warmup
      w.bits(3, 4)                               // precision − 1 → 4 bits
      w.bits(0, 5)                               // shift 0
      w.bits(1, 4)                               // coefficient 1
      w.bits(0, 2); w.bits(0, 4); w.bits(4, 4)   // rice method 0, po 0, p=4
      samples.sliding(2).foreach { case Seq(a, b) =>
        val e = b - a
        val z = (e << 1) ^ (e >> 31)
        var q = z >>> 4
        while (q >= 32) { w.bits(0, 32); q -= 32 }
        w.bits(1, q + 1)
        w.bits(z.toLong & 15, 4)
      }
    }
    assert(flacFeats(bytes, 2).contains(envelope(samples.map(_.toLong), 2)))
  }

  test("hand-packed stereo decorrelation: left/side, right/side, mid/side") {
    def verbatim(w: BW, xs: Seq[Long], bits: Int): Unit = {
      w.bits(0, 1); w.bits(1, 6); w.bits(0, 1)
      xs.foreach(x => w.bits(x & ((1L << bits) - 1), bits))
    }
    val l = Seq(10L, 20L, 30L, 40L); val r = Seq(5L, 25L, -10L, 40L)
    val side = l.zip(r).map { case (a, b) => a - b }
    val ls = streamInfo(2, 16, 4) ++ frame(2, 8, 16, 4) { w =>
      verbatim(w, l, 16); verbatim(w, side, 17)
    }
    assert(flacFeats(ls, 1).contains(envelope(l.zip(r).map { case (a, b) => a + b }, 1)))

    val l2 = Seq(9L, 2L); val r2 = Seq(7L, -3L)
    val side2 = l2.zip(r2).map { case (a, b) => a - b }
    val rs = streamInfo(2, 16, 2) ++ frame(2, 9, 16, 2) { w =>
      verbatim(w, side2, 17); verbatim(w, r2, 16)
    }
    assert(flacFeats(rs, 1).contains(envelope(l2.zip(r2).map { case (a, b) => a + b }, 1)))

    val l3 = Seq(7L, -5L); val r3 = Seq(4L, -2L)
    val mid = l3.zip(r3).map { case (a, b) => (a + b) >> 1 }
    val side3 = l3.zip(r3).map { case (a, b) => a - b }
    val ms = streamInfo(2, 16, 2) ++ frame(2, 10, 16, 2) { w =>
      verbatim(w, mid, 16); verbatim(w, side3, 17)
    }
    assert(flacFeats(ms, 1).contains(envelope(l3.zip(r3).map { case (a, b) => a + b }, 1)))
  }

  test("hand-packed wasted bits, escape partitions, and partition order 1") {
    // wasted=1: samples stored at 15 bits, shifted left after decode
    val wasted = streamInfo(1, 16, 2) ++ frame(1, 0, 16, 2) { w =>
      w.bits(0, 1); w.bits(1, 6); w.bits(1, 1) // verbatim, wasted flag
      w.bits(1, 1)                              // unary 0 → k = 1
      w.bits(3L & 0x7FFF, 15); w.bits(-2L & 0x7FFF, 15)
    }
    assert(flacFeats(wasted, 1).contains(Seq(2L))) // 6 + (−4)

    // fixed order 0, escaped partition: raw 5-bit residuals ARE the samples
    val esc = streamInfo(1, 16, 4) ++ frame(1, 0, 16, 4) { w =>
      w.bits(0, 1); w.bits(8, 6); w.bits(0, 1)  // fixed order 0
      w.bits(0, 2); w.bits(0, 4); w.bits(15, 4) // method 0, po 0, ESCAPE
      w.bits(5, 5)                               // 5 raw bits per residual
      Seq(1L, -1L, 7L, -8L).foreach(x => w.bits(x & 31, 5))
    }
    assert(flacFeats(esc, 1).contains(Seq(-1L)))

    // fixed order 1 with partition order 1 (first partition short by the order)
    val samples = Seq(10L, 12L, 9L, 9L)
    val po1 = streamInfo(1, 16, 4) ++ frame(1, 0, 16, 4) { w =>
      w.bits(0, 1); w.bits(9, 6); w.bits(0, 1) // fixed order 1
      w.bits(samples.head & 0xFFFF, 16)        // warmup
      w.bits(0, 2); w.bits(1, 4)               // method 0, po 1
      def rice0(e: Long): Unit = {
        val z = (e << 1) ^ (e >> 63)
        var q = z
        while (q >= 32) { w.bits(0, 32); q -= 32 }
        w.bits(1, q.toInt + 1)
      }
      w.bits(0, 4); rice0(12L - 10L)           // partition 1: p=0, 1 residual
      w.bits(0, 4); rice0(9L - 12L); rice0(0L) // partition 2: p=0, 2 residuals
    }
    assert(flacFeats(po1, 1).contains(Seq(40L)))
  }

  test("sample outside the declared bit depth is refused, not clamped") {
    // verbatim 16-bit values are always in range; use LPC blow-up: coeff
    // 2, shift 0 doubles each step past the 16-bit envelope
    val bytes = streamInfo(1, 16, 40) ++ frame(1, 0, 16, 40) { w =>
      w.bits(0, 1); w.bits(32, 6); w.bits(0, 1)
      w.bits(30000, 16)  // warmup near the positive edge
      w.bits(3, 4); w.bits(0, 5); w.bits(2, 4) // prec 4, shift 0, coeff 2
      w.bits(0, 2); w.bits(0, 4); w.bits(0, 4) // rice p=0
      (1 until 40).foreach(_ => w.bits(1, 1))  // all residuals 0
    }
    assert(flacFeats(bytes, 1).isEmpty)
  }

  test("SQL surface: flac_encode_pcm → flac_pcm_features equals the Scala wrappers") {
    val s = lcg(42, 90)
    val df = Seq(Tuple1(pcmBytes(s))).toDF("pcm")
    df.createOrReplaceTempView("flac_sql_probe")
    val viaSql = spark.sql(
      "SELECT flac_pcm_features(flac_encode_pcm(pcm, 1, 8000), 4) AS f FROM flac_sql_probe")
      .as[Option[Seq[Long]]].head()
    val viaScala = df.select(Multimodal.flacPcmFeatures(
      Multimodal.flacEncodePcm(col("pcm"), lit(1), lit(8000)), 4).as("f"))
      .as[Option[Seq[Long]]].head()
    assert(viaSql.isDefined && viaSql == viaScala)
  }
}

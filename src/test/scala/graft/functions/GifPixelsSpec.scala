package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Multimodal

class GifPixelsSpec extends SparkSpec {
  import spark.implicits._

  private def bytesOf(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  private def feats(bytes: Array[Byte], gx: Int, gy: Int): Option[Seq[Long]] =
    Seq(Tuple1(bytes)).toDF("b")
      .select(Multimodal.gifGridFeatures(col("b"), gx, gy).as("f"))
      .as[Option[Seq[Long]]].head()

  private def enc(d: Array[Byte], w: Int, h: Int,
      t: Array[Byte]): Option[Array[Byte]] =
    Seq(Tuple1(d)).toDF("d")
      .select(Multimodal.gifEncodePalette(col("d"), lit(w), lit(h),
        lit(t)).as("p"))
      .as[Option[Array[Byte]]].head()

  private val table = bytesOf(10, 20, 30, 100, 110, 120, 200, 210, 220)

  /** Hand-assembled single-frame GIF with a 4-entry GCT — each test
    * controls the exact LZW bytes the decoder must consume. */
  private def handGif(w: Int, h: Int, minCode: Int, lzw: Array[Byte],
      gct: Array[Byte] = bytesOf(1, 2, 3, 11, 22, 33, 7, 8, 9, 0, 0, 0),
      packed2: Int = 0, gceBefore: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le(w); le(h)
    out.write(0x80 | 1); out.write(0); out.write(0) // 4-entry GCT
    out.write(gct, 0, gct.length)
    if (gceBefore) { // a graphic-control extension to skip structurally
      out.write(0x21); out.write(0xF9)
      out.write(4); out.write(bytesOf(0, 0, 0, 0), 0, 4); out.write(0)
    }
    out.write(0x2C); le(0); le(0); le(w); le(h); out.write(packed2)
    out.write(minCode)
    out.write(lzw.length); out.write(lzw, 0, lzw.length); out.write(0)
    out.write(0x3B)
    out.toByteArray
  }

  test("encoder round-trip: indices + table → standard GIF89a → the same grid sums; header readers agree") {
    val gif = enc(bytesOf(0, 1, 2, 0), 2, 2, table).get
    assert(feats(gif, 2, 2) == Some(Seq(
      10L, 20L, 30L, 100L, 110L, 120L, 200L, 210L, 220L, 10L, 20L, 30L)))
    val hdr = Seq(Tuple1(gif)).toDF("b")
      .select(Multimodal.imageHeader(col("b")).as("h"),
        Multimodal.sniffMime(col("b")).as("m"))
      .as[((String, Option[Int], Option[Int], Option[Int], Option[Boolean]), String)]
      .head()
    assert(hdr._1._1 == "gif" && hdr._1._2 == Some(2) && hdr._1._3 == Some(2))
    assert(hdr._2 == "image/gif")
  }

  test("a big frame exercises dictionary width growth and the encoder's clear-code reset; sums replay arithmetically") {
    val w = 80; val h = 60; val nc = 5 // 4800 px > the 4094 reset point
    val pal = Array.tabulate(nc * 3)(i => ((i * 13 + 5) % 256).toByte)
    val idx = Array.tabulate(w * h) { p =>
      val x = p % w; val y = p / w; ((x * 3 + y * 5 + 1) % nc).toByte
    }
    val want = new Array[Long](2 * 2 * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val cell = ((y * 2 / h) * 2 + x * 2 / w) * 3
      val v = idx(y * w + x) & 0xFF
      want(cell) += pal(3 * v) & 0xFF
      want(cell + 1) += pal(3 * v + 1) & 0xFF
      want(cell + 2) += pal(3 * v + 2) & 0xFF
    }
    val gif = enc(idx, w, h, pal).get
    assert(feats(gif, 2, 2) == Some(want.toSeq))
  }

  test("hand-packed LZW: the KwKwK case decodes; extensions before the frame are skipped") {
    // minCode 2 (clear=4, end=5), codes [clear, 1, 6, end] where 6 IS
    // nextCode at that point — the KwKwK expansion [1, 1] — so the
    // 3×1 frame decodes to indices [1, 1, 1] → 3 × (11, 22, 33)
    val kwkwk = bytesOf(0x8C, 0x0B)
    assert(feats(handGif(3, 1, 2, kwkwk), 1, 1) == Some(Seq(33L, 66L, 99L)))
    assert(feats(handGif(3, 1, 2, kwkwk, gceBefore = true), 1, 1) ==
      Some(Seq(33L, 66L, 99L)))
  }

  test("contract violations and adversarial bytes are null, never garbage or a crash") {
    val good = enc(bytesOf(0, 1, 2, 0), 2, 2, table).get
    assert(feats(good, 2, 2).nonEmpty)
    // truncated: mid-GCT and mid-LZW
    assert(feats(good.take(12), 2, 2).isEmpty)
    assert(feats(good.take(good.length - 4), 2, 2).isEmpty)
    // interlaced frame: out of contract
    assert(feats(handGif(3, 1, 2, bytesOf(0x8C, 0x0B), packed2 = 0x40), 1, 1).isEmpty)
    // a literal indexing past the color table: minCode 3 admits code 5,
    // but the table holds 4 entries
    assert(feats(handGif(1, 1, 3, bytesOf(0x58, 0x09)), 1, 1).isEmpty)
    // first code after clear is a dictionary code (malformed LZW)
    assert(feats(handGif(3, 1, 2, bytesOf(0x34)), 1, 1).isEmpty)
    // end code before the frame fills
    // codes [clear=4, 1, end=5]: only 1 of 3 pixels
    assert(feats(handGif(3, 1, 2, bytesOf(0x4C, 0x01)), 1, 1).isEmpty)
    // OVERLONG stream: codes [clear, 1, 1, 1, end] against a 2×1 frame
    // — the third pixel code where END must sit is out of contract
    // (review finding: the loop used to exit at nPixels and silently
    // accept the rest)
    assert(feats(handGif(2, 1, 2, bytesOf(0x4C, 0x52)), 1, 1).isEmpty)
    // dims past the GIF container's 16-bit fields refuse at encode
    // (le() would silently truncate into a corrupt-but-plausible file)
    assert(enc(Array.fill[Byte](70000)(0), 1, 70000, table).isEmpty)
    assert(enc(Array.fill[Byte](70000)(0), 70000, 1, table).isEmpty)
    // no color table anywhere: GCT flag off, no LCT
    val noGct = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("GIF89a".getBytes("US-ASCII"))
      out.write(bytesOf(3, 0, 1, 0, 0x00, 0, 0), 0, 7) // packed: no GCT
      out.write(0x2C); out.write(bytesOf(0, 0, 0, 0, 3, 0, 1, 0, 0), 0, 9)
      out.write(2); out.write(2); out.write(bytesOf(0x8C, 0x0B), 0, 2)
      out.write(0); out.write(0x3B)
      out.toByteArray
    }
    assert(feats(noGct, 1, 1).isEmpty)
    // trailer before any image frame
    val trailerOnly = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("GIF89a".getBytes("US-ASCII"))
      out.write(bytesOf(1, 0, 1, 0, 0, 0, 0), 0, 7)
      out.write(0x3B)
      out.toByteArray
    }
    assert(feats(trailerOnly, 1, 1).isEmpty)
    assert(feats("not a gif at all".getBytes("UTF-8"), 1, 1).isEmpty)
    assert(feats(Array.empty[Byte], 1, 1).isEmpty)
    // encoder refusals: index past the table, wrong payload length,
    // malformed tables
    assert(enc(bytesOf(0, 3, 0, 0), 2, 2, table).isEmpty)
    assert(enc(bytesOf(0, 1, 2), 2, 2, table).isEmpty)
    assert(enc(bytesOf(0, 0, 0, 0), 2, 2, bytesOf(1, 2)).isEmpty)
    assert(enc(bytesOf(0, 0, 0, 0), 2, 2, Array.empty[Byte]).isEmpty)
    intercept[IllegalArgumentException] {
      Multimodal.gifGridFeatures(col("x"), 0, 1)
    }
  }
}

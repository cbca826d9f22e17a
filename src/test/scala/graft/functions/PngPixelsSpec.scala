package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Multimodal

class PngPixelsSpec extends SparkSpec {
  import spark.implicits._

  /** Spec-assembled PNG: deflate a hand-chosen FILTERED scanline stream
    * and wrap it in signature + IHDR/IDAT/IEND chunks — so each test
    * controls the exact filter bytes the unfilters must invert. */
  private def png(w: Int, h: Int, raw: Array[Byte], bitDepth: Int = 8,
      colorType: Int = 2, interlace: Int = 0, splitIdat: Boolean = false,
      dropIend: Boolean = false, plte: Array[Byte] = null,
      plteAfterIdat: Boolean = false): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val cbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!d.finished()) cbuf.write(tmp, 0, d.deflate(tmp))
    d.end()
    val compressed = cbuf.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    def be(v: Long, n: Int): Unit =
      ((n - 1) to 0 by -1).foreach(i => out.write(((v >> (8 * i)) & 0xFF).toInt))
    def chunk(tpe: String, body: Array[Byte]): Unit = {
      be(body.length.toLong, 4)
      val crc = new java.util.zip.CRC32()
      crc.update(tpe.getBytes("US-ASCII")); crc.update(body)
      out.write(tpe.getBytes("US-ASCII")); out.write(body); be(crc.getValue, 4)
    }
    out.write(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    val ihdr = new java.io.ByteArrayOutputStream()
    def beI(v: Long, n: Int): Unit =
      ((n - 1) to 0 by -1).foreach(i => ihdr.write(((v >> (8 * i)) & 0xFF).toInt))
    beI(w.toLong, 4); beI(h.toLong, 4)
    ihdr.write(bitDepth); ihdr.write(colorType); ihdr.write(0); ihdr.write(0)
    ihdr.write(interlace)
    chunk("IHDR", ihdr.toByteArray)
    if (plte != null && !plteAfterIdat) chunk("PLTE", plte)
    if (splitIdat) {
      val cut = compressed.length / 2
      chunk("IDAT", compressed.take(cut))
      chunk("IDAT", compressed.drop(cut))
    } else chunk("IDAT", compressed)
    if (plte != null && plteAfterIdat) chunk("PLTE", plte)
    if (!dropIend) chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }

  private def feats(bytes: Array[Byte], gx: Int, gy: Int): Option[Seq[Long]] =
    Seq(Tuple1(bytes)).toDF("b")
      .select(Multimodal.pngGridFeatures(col("b"), gx, gy).as("f"))
      .as[Option[Seq[Long]]].head()

  private def bytesOf(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // 2×2 RGB image: row0 (1,2,3),(5,6,7); row1 (10,20,30),(40,50,60) —
  // per-pixel cell sums under a 2×2 grid are the pixels themselves
  private val px = Seq(1L, 2L, 3L, 5L, 6L, 7L, 10L, 20L, 30L, 40L, 50L, 60L)

  test("filters Sub and Up invert to the hand-computed pixels") {
    // row0 Sub: [1,2,3, 4,4,4]; row1 Up: raw − above
    val raw = bytesOf(1, 1, 2, 3, 4, 4, 4, 2, 9, 18, 27, 35, 44, 53)
    assert(feats(png(2, 2, raw), 2, 2) == Some(px))
  }

  test("filters Average and Paeth invert to the hand-computed pixels") {
    // row0 Average (up=0): [1,2,3, 5,5,6]; row1 Paeth (pred=up for x=0,
    // pred=left for x=1 on these values)
    val raw = bytesOf(3, 1, 2, 3, 5, 5, 6, 4, 9, 18, 27, 30, 30, 30)
    assert(feats(png(2, 2, raw), 2, 2) == Some(px))
  }

  test("filter None, a split IDAT stream and a missing IEND all decode") {
    val raw = bytesOf(0, 1, 2, 3, 5, 6, 7, 0, 10, 20, 30, 40, 50, 60)
    assert(feats(png(2, 2, raw), 2, 2) == Some(px))
    assert(feats(png(2, 2, raw, splitIdat = true), 2, 2) == Some(px))
    assert(feats(png(2, 2, raw, dropIend = true), 2, 2) == Some(px))
    assert(feats(png(2, 2, raw), 1, 1) ==
      Some(Seq(1L + 5 + 10 + 40, 2L + 6 + 20 + 50, 3L + 7 + 30 + 60)))
  }

  test("gray replicates channels; RGBA ignores alpha") {
    // 2×1 gray: values 10, 200 (Sub filter: [10, 190])
    val gray = png(2, 1, bytesOf(1, 10, 190), colorType = 0)
    assert(feats(gray, 1, 1) == Some(Seq(210L, 210L, 210L)))
    // 1×1 RGBA (7,8,9,alpha=99): alpha must not leak into the sums
    val rgba = png(1, 1, bytesOf(0, 7, 8, 9, 99), colorType = 6)
    assert(feats(rgba, 1, 1) == Some(Seq(7L, 8L, 9L)))
  }

  test("encodeRgb round-trips through the decoder and the header reader") {
    val data = bytesOf(1, 2, 3, 5, 6, 7, 10, 20, 30, 40, 50, 60)
    val out = Seq(Tuple1(data)).toDF("d")
      .select(Multimodal.pngEncodeRgb(col("d"), lit(2), lit(2)).as("p"))
      .select(Multimodal.pngGridFeatures(col("p"), 2, 2).as("f"),
        Multimodal.imageHeader(col("p")).as("hdr"),
        Multimodal.sniffMime(col("p")).as("mime"))
      .as[(Option[Seq[Long]], (String, Option[Int], Option[Int], Option[Int], Option[Boolean]), String)]
      .head()
    assert(out._1 == Some(px))
    assert(out._2 == (("png", Some(2), Some(2), Some(3), None)))
    assert(out._3 == "image/png")
    // length/dims disagreement → null, never a malformed emit
    assert(Seq(Tuple1(data)).toDF("d")
      .select(Multimodal.pngEncodeRgb(col("d"), lit(3), lit(2)).as("p"))
      .as[Option[Array[Byte]]].head().isEmpty)
  }

  test("palette decode: PLTE indirection, filtered index rows, encoder round-trip") {
    // 3-entry table: 0→(10,20,30) 1→(100,110,120) 2→(200,210,220)
    val table = bytesOf(10, 20, 30, 100, 110, 120, 200, 210, 220)
    // 2×2 indices row0 [0,1] row1 [2,0]; row0 None, row1 SUB on the
    // INDEX plane (bpp=1: 2 = 2−0, 254 wraps 0 = 2+254 mod 256) — the
    // filters must invert BEFORE the table lookup
    val raw = bytesOf(0, 0, 1, 1, 2, 254)
    val fileB = png(2, 2, raw, colorType = 3, plte = table)
    assert(feats(fileB, 2, 2) == Some(Seq(
      10L, 20L, 30L, 100L, 110L, 120L, 200L, 210L, 220L, 10L, 20L, 30L)))
    // encoder round-trip: indices + table → standard PNG → same sums,
    // and the header reader sees a palette PNG (3 channels)
    val out = Seq(Tuple1(bytesOf(0, 1, 2, 0))).toDF("d")
      .select(Multimodal.pngEncodePalette(col("d"), lit(2), lit(2),
        lit(table)).as("p"))
      .select(Multimodal.pngGridFeatures(col("p"), 2, 2).as("f"),
        Multimodal.sniffMime(col("p")).as("mime"))
      .as[(Option[Seq[Long]], String)].head()
    assert(out._1 == Some(Seq(
      10L, 20L, 30L, 100L, 110L, 120L, 200L, 210L, 220L, 10L, 20L, 30L)))
    assert(out._2 == "image/png")
    // encoder refusals: an index past the table; wrong payload length;
    // misaligned / empty / oversized tables — null, never a bad emit
    def enc(d: Array[Byte], w: Int, h: Int, t: Array[Byte]) =
      Seq(Tuple1(d)).toDF("d")
        .select(Multimodal.pngEncodePalette(col("d"), lit(w), lit(h),
          lit(t)).as("p"))
        .as[Option[Array[Byte]]].head()
    assert(enc(bytesOf(0, 3, 0, 0), 2, 2, table).isEmpty) // idx 3 ≥ 3 entries
    assert(enc(bytesOf(0, 1, 2), 2, 2, table).isEmpty)    // 3 bytes ≠ 2·2
    assert(enc(bytesOf(0, 0, 0, 0), 2, 2, bytesOf(1, 2)).isEmpty) // len % 3
    assert(enc(bytesOf(0, 0, 0, 0), 2, 2, Array.empty[Byte]).isEmpty)
    assert(enc(bytesOf(0, 0, 0, 0), 2, 2,
      Array.fill[Byte](771)(1)).isEmpty) // 257 entries
  }

  test("palette contract edges: missing/duplicate/misplaced/misaligned PLTE and out-of-table pixels are null") {
    val table = bytesOf(10, 20, 30, 100, 110, 120)
    val raw = bytesOf(0, 0, 1, 0, 1, 0)
    assert(feats(png(2, 2, raw, colorType = 3, plte = table), 2, 2).nonEmpty)
    // no PLTE at all
    assert(feats(png(2, 2, raw, colorType = 3), 2, 2).isEmpty)
    // PLTE after the first IDAT (spec: must precede)
    assert(feats(png(2, 2, raw, colorType = 3, plte = table,
      plteAfterIdat = true), 2, 2).isEmpty)
    // misaligned table (not a multiple of 3)
    assert(feats(png(2, 2, raw, colorType = 3,
      plte = bytesOf(1, 2, 3, 4)), 2, 2).isEmpty)
    // a pixel indexing past the table: index 5 ≥ 2 entries
    assert(feats(png(2, 2, bytesOf(0, 0, 5, 0, 1, 0), colorType = 3,
      plte = table), 2, 2).isEmpty)
    // 16-bit palette stays out of contract
    assert(feats(png(2, 2, raw, colorType = 3, plte = table,
      bitDepth = 16), 2, 2).isEmpty)
  }

  test("contract violations and adversarial bytes are null, never garbage or a crash") {
    val good = png(2, 2, bytesOf(0, 1, 2, 3, 5, 6, 7, 0, 10, 20, 30, 40, 50, 60))
    assert(feats(good, 2, 2).nonEmpty)
    // truncated mid-IDAT; inflate cannot fill the image
    assert(feats(good.take(40), 2, 2).isEmpty)
    // undefined filter type 5
    assert(feats(png(2, 2, bytesOf(5, 1, 2, 3, 5, 6, 7, 0, 10, 20, 30, 40, 50, 60)), 2, 2).isEmpty)
    // palette without its PLTE table / 16-bit / interlaced are null
    assert(feats(png(2, 2, bytesOf(0, 0, 1, 0, 1), colorType = 3), 1, 1).isEmpty)
    assert(feats(png(2, 2, bytesOf(0, 1, 2), bitDepth = 16), 1, 1).isEmpty)
    assert(feats(png(2, 2, bytesOf(0, 1, 2), interlace = 1), 1, 1).isEmpty)
    // raw stream shorter than h rows (declared dims exceed pixel data)
    assert(feats(png(2, 3, bytesOf(0, 1, 2, 3, 5, 6, 7)), 1, 1).isEmpty)
    // crafted dims blow the inflated-size cap → refused at the header
    val big = {
      val b = good.clone()
      b(16) = 0x7F.toByte; b(17) = 0xFF.toByte; b(18) = 0xFF.toByte; b(19) = 0xFF.toByte
      b(20) = 0x7F.toByte; b(21) = 0xFF.toByte; b(22) = 0xFF.toByte; b(23) = 0xFF.toByte
      b
    }
    assert(feats(big, 1, 1).isEmpty)
    // a chunk whose declared length overruns the buffer
    val overrun = {
      val b = good.clone()
      b(33) = 0x7F.toByte // IDAT length high byte
      b
    }
    assert(feats(overrun, 1, 1).isEmpty)
    assert(feats("not a png".getBytes("UTF-8"), 1, 1).isEmpty)
    assert(feats(Array.empty[Byte], 1, 1).isEmpty)
    intercept[IllegalArgumentException] {
      Multimodal.pngGridFeatures(col("x"), 0, 1)
    }
  }
}

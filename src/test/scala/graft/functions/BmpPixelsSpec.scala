package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Multimodal

class BmpPixelsSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal 24-bit BMP. `pixels(y)(x) = (r, g, b)` in TOP-DOWN image
    * coordinates; `topDown = false` stores rows bottom-up (the default
    * BMP layout), true uses a negative height. */
  private def bmp(pixels: Seq[Seq[(Int, Int, Int)]],
      topDown: Boolean = false, bits: Int = 24,
      compression: Int = 0, truncate: Int = 0): Array[Byte] = {
    val h = pixels.length; val w = pixels.head.length
    val stride = ((w * 3 + 3) / 4) * 4
    val out = new java.io.ByteArrayOutputStream()
    def le(v: Long, n: Int): Unit =
      (0 until n).foreach(i => out.write(((v >> (8 * i)) & 0xFF).toInt))
    out.write('B'); out.write('M'); le(54L + h * stride, 4); le(0, 4); le(54, 4)
    le(40, 4); le(w, 4); le(if (topDown) -h else h, 4)
    le(1, 2); le(bits, 2); le(compression, 4); le(h * stride, 4)
    le(0, 4); le(0, 4); le(0, 4); le(0, 4)
    val rows = if (topDown) pixels else pixels.reverse
    rows.foreach { row =>
      row.foreach { case (r, g, b) => out.write(b); out.write(g); out.write(r) }
      (0 until stride - w * 3).foreach(_ => out.write(0))
    }
    val full = out.toByteArray
    if (truncate > 0) full.take(truncate) else full
  }

  private def feats(bytes: Array[Byte], gx: Int, gy: Int): Option[Seq[Long]] =
    Seq(Tuple1(bytes)).toDF("b")
      .select(Multimodal.bmpGridFeatures(col("b"), gx, gy).as("f"))
      .as[Option[Seq[Long]]].head()

  // a 2×2 image with distinct channel values per pixel
  private val px2x2 = Seq(
    Seq((10, 20, 30), (40, 50, 60)),   // top row
    Seq((70, 80, 90), (100, 110, 120)) // bottom row
  )

  test("grid features: per-cell (r,g,b) sums, hand-computed; 1x1 grid = whole-image sums") {
    // 2×2 grid on a 2×2 image: each pixel its own cell, row-major
    assert(feats(bmp(px2x2), 2, 2) == Some(Seq(
      10L, 20L, 30L, 40L, 50L, 60L, 70L, 80L, 90L, 100L, 110L, 120L)))
    assert(feats(bmp(px2x2), 1, 1) == Some(Seq(220L, 260L, 300L)))
  }

  test("bottom-up and top-down storage decode to the SAME image") {
    assert(feats(bmp(px2x2), 2, 2) == feats(bmp(px2x2, topDown = true), 2, 2))
  }

  test("row padding is skipped (odd widths), forward-map bucketing on non-divisible dims") {
    // 3×1 image (stride 12, 3 pad bytes); gx=2 forward map ⌊x·2/3⌋:
    // x=0,1 → cell 0, x=2 → cell 1
    val row = Seq(Seq((1, 2, 3), (4, 5, 6), (7, 8, 9)))
    assert(feats(bmp(row), 2, 1) == Some(Seq(5L, 7L, 9L, 7L, 8L, 9L)))
  }

  test("decode-contract violations are null, never garbage") {
    assert(feats(bmp(px2x2, bits = 8), 1, 1).isEmpty)        // not 24-bit
    assert(feats(bmp(px2x2, compression = 1), 1, 1).isEmpty) // compressed
    assert(feats(bmp(px2x2, truncate = 58), 1, 1).isEmpty)   // pixels missing
    assert(feats("BMxxxx".getBytes("ISO-8859-1"), 1, 1).isEmpty)
    assert(feats(Array[Byte](1, 2), 1, 1).isEmpty)
  }

  test("adversarial headers null out instead of crashing or returning garbage") {
    // crafted width 805306368: Int stride arithmetic would wrap negative
    // and defeat the payload bounds check (then AIOOBE / a 8e8 iteration
    // loop); Long geometry rejects it as payload-missing
    def craft(w: Int, h: Int, dibSize: Int = 40, dataAt: Int = 54): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def le(v: Long, n: Int): Unit =
        (0 until n).foreach(i => out.write(((v >> (8 * i)) & 0xFF).toInt))
      out.write('B'); out.write('M'); le(0, 4); le(0, 4); le(dataAt & 0xFFFFFFFFL, 4)
      le(dibSize & 0xFFFFFFFFL, 4); le(w & 0xFFFFFFFFL, 4); le(h & 0xFFFFFFFFL, 4)
      le(1, 2); le(24, 2); le(0, 4); le(0, 4)
      le(0, 4); le(0, 4); le(0, 4); le(0, 4)
      out.toByteArray
    }
    assert(feats(craft(805306368, 1), 1, 1).isEmpty)
    // crafted dibSize near 2^31: `14 + dibSize` wraps negative in Int,
    // which would admit a negative pixel-data offset and AIOOBE in the
    // pixel walk — the header check must run in Long (advisor finding)
    assert(feats(craft(1, 1, dibSize = 2147483634,
      dataAt = -8 /* 0xFFFFFFF8 */), 1, 1).isEmpty)
    assert(feats(craft(1, 1, dataAt = -64), 1, 1).isEmpty)
    // height 0x80000000: |Int.MinValue| is negative in Int — must be
    // null, never an all-zero "successful" decode of a garbage header
    assert(feats(craft(1, Int.MinValue), 1, 1).isEmpty)
    // the header reader rejects the same height instead of reporting -2^31
    assert(Seq(Tuple1(craft(1, Int.MinValue))).toDF("b")
      .select(Multimodal.imageHeader(col("b")).getField("height").as("h"))
      .as[Option[Int]].head().isEmpty)
    // a legacy BITMAPCOREHEADER (dibSize=12: u16 dims at 18/20, bitCount
    // at 24) must degrade to format-only — the INFOHEADER offsets would
    // read fused garbage dims (advisor finding)
    val core = {
      val out = new java.io.ByteArrayOutputStream()
      def le(v: Long, n: Int): Unit =
        (0 until n).foreach(i => out.write(((v >> (8 * i)) & 0xFF).toInt))
      out.write('B'); out.write('M'); le(34, 4); le(0, 4); le(26, 4)
      le(12, 4); le(2, 2); le(1, 2); le(1, 2); le(24, 2) // COREHEADER
      le(0, 8) // one 2px BGR row, padded to 4 bytes
      out.toByteArray
    }
    val coreHdr = Seq(Tuple1(core)).toDF("b")
      .select(Multimodal.imageHeader(col("b")).as("h"))
      .select(col("h.format"), col("h.width"), col("h.height"))
      .as[(String, Option[Int], Option[Int])].head()
    assert(coreHdr == (("bmp", None, None)))
    assert(feats(core, 1, 1).isEmpty) // the pixel decoder already rejects it
    // grid caps are construction-time contracts
    intercept[IllegalArgumentException] {
      Multimodal.bmpGridFeatures(col("x"), 46341, 46341)
    }
  }

  test("resizeNearest: picks ⌊x·w/outW⌋ pixels, emits a decodable 24-bit BMP") {
    // 1x1 resize keeps the top-left pixel (⌊0·2/1⌋ = 0)
    val tiny = Seq(Tuple1(bmp(px2x2))).toDF("b")
      .select(Multimodal.bmpResizeNearest(col("b"), 1, 1).as("r"))
      .select(Multimodal.bmpGridFeatures(col("r"), 1, 1).as("f"),
        Multimodal.imageHeader(col("r")).as("hdr"),
        Multimodal.sniffMime(col("r")).as("mime"))
      .as[(Option[Seq[Long]], (String, Option[Int], Option[Int], Option[Int], Option[Boolean]), String)]
      .head()
    assert(tiny._1 == Some(Seq(10L, 20L, 30L)))
    assert(tiny._2 == (("bmp", Some(1), Some(1), Some(3), None)))
    assert(tiny._3 == "image/bmp")
    // 4x4 upscale of a 2×2: each source pixel covers a 2×2 block →
    // every channel sum is 4× the original
    val up = Seq(Tuple1(bmp(px2x2))).toDF("b")
      .select(Multimodal.bmpGridFeatures(
        Multimodal.bmpResizeNearest(col("b"), 4, 4), 2, 2).as("f"))
      .as[Option[Seq[Long]]].head()
    assert(up == Some(Seq(10L, 20L, 30L, 40L, 50L, 60L,
      70L, 80L, 90L, 100L, 110L, 120L).map(_ * 4)))
    // null propagates through the composition
    assert(Seq(Tuple1(bmp(px2x2, truncate = 58))).toDF("b")
      .select(Multimodal.bmpGridFeatures(
        Multimodal.bmpResizeNearest(col("b"), 4, 4), 1, 1).as("f"))
      .as[Option[Seq[Long]]].head().isEmpty)
  }

  test("top-down input resizes identically to its bottom-up twin") {
    def sums(td: Boolean) = Seq(Tuple1(bmp(px2x2, topDown = td))).toDF("b")
      .select(Multimodal.bmpGridFeatures(
        Multimodal.bmpResizeNearest(col("b"), 3, 3), 3, 3).as("f"))
      .as[Option[Seq[Long]]].head()
    assert(sums(false).nonEmpty && sums(false) == sums(true))
  }

  test("constructor contracts") {
    intercept[IllegalArgumentException] { Multimodal.bmpGridFeatures(col("x"), 0, 1) }
    intercept[IllegalArgumentException] { Multimodal.bmpResizeNearest(col("x"), 1, 5000) }
  }
}

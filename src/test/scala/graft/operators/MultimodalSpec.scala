package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def assets = Seq(
    (1L, Multimodal.PngMagic ++ "payload-one".getBytes("UTF-8")),
    (2L, Multimodal.JpegMagic ++ "p2".getBytes("UTF-8")),
    (3L, "just text bytes".getBytes("UTF-8"))
  ).toDF("asset_id", "bytes")

  test("withMetadata sniffs mime from magic bytes and carries byte length") {
    val m = Multimodal.withMetadata(assets, "bytes")
      .select("asset_id", "meta.mime", "meta.n_bytes")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(m == Set(
      (1L, "image/png", 8L + 11L),
      (2L, "image/jpeg", 4L + 2L),
      (3L, "application/octet-stream", 15L)))
  }

  test("chunkBytes splits payloads into fixed windows that reassemble exactly") {
    val chunks = Multimodal.chunkBytes(assets, "asset_id", "bytes", chunkSize = 4)
    val orig = assets.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val rebuilt = chunks.orderBy("asset_id", "chunk_id").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.flatMap(_.getAs[Array[Byte]](2))).toMap
    rebuilt.foreach { case (id, bytes) => assert(bytes.sameElements(orig(id))) }
    // chunk count is ceil(len/4); last chunk may be short, none empty
    val counts = chunks.groupBy("asset_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == orig.map { case (k, v) => k -> ((v.length + 3) / 4).toLong })
  }

  test("resizeStub nearest-neighbor-samples to the target; small payloads pass through") {
    val big = Array.tabulate(100)(_.toByte)
    val small = Array[Byte](1, 2, 3)
    val df = Seq((1L, big), (2L, small)).toDF("id", "payload")
      .withColumn("thumb", Multimodal.resizeStub(col("payload"), 10))
    val out = df.orderBy("id").collect()
      .map(r => r.getAs[Array[Byte]]("thumb").toSeq)
    // out[i] = in[i * 100 / 10] — deterministic nearest-neighbor picks
    assert(out(0) == (0 until 10).map(i => (i * 10).toByte))
    assert(out(1) == small.toSeq) // at/under target: pass-through
    // non-divisible length: ⌊i·len/target⌋ floors, never rounds
    val ten = Array.tabulate(10)(_.toByte)
    val odd = Seq((1L, ten)).toDF("id", "payload")
      .select(Multimodal.resizeStub(col("payload"), 3).as("t"))
      .head().getAs[Array[Byte]]("t").toSeq
    assert(odd == Seq[Byte](0, 3, 6))
    val e = intercept[IllegalArgumentException](
      Multimodal.resizeStub(col("payload"), 1 << 20))
    assert(e.getMessage.contains("thumbnails"))
  }

  test("frameSample keeps every Nth chunk only") {
    val chunks = Multimodal.chunkBytes(assets, "asset_id", "bytes", chunkSize = 2)
    val sampled = Multimodal.frameSample(chunks, stride = 3)
    assert(sampled.filter(col("chunk_id") % 3 =!= 0).count() == 0)
    assert(sampled.count() > 0)
  }

  test("stub features feed the ANN pipeline end to end (binary → features → top-k)") {
    val feats = assets.select(col("asset_id"),
      Multimodal.decodeFeaturesStub(col("bytes"), dims = 16).as("feat"))
    val ann = Similarity.annTopK(feats, "asset_id", "feat",
      k = 2, planes = 1, dims = 16, queryFilter = col("asset_id") === 1L)
    val plan = ann.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    val rows = ann.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("query_id") == 1L))
  }

  test("partitioned decode is bit-equal to the expression stub, any batch size") {
    val expected = assets.select(col("asset_id"),
      Multimodal.decodeFeaturesStub(col("bytes"), dims = 8).as("features"))
    for (bs <- Seq(1, 2, 1000)) {
      val got = Multimodal.decodeFeaturesPartitioned(
        assets.repartition(3), "asset_id", "bytes", dims = 8, batchSize = bs)
      assertSameRows(got, expected)
    }
  }

  test("partitioned decode initializes the codec once per partition, feeds bounded batches") {
    val inits = spark.sparkContext.longAccumulator("codec-inits")
    val maxBatch = spark.sparkContext.longAccumulator("max-batch")
    val many = spark.range(100)
      .select(col("id").as("asset_id"),
        col("id").cast("string").cast("binary").as("bytes"))
      .repartition(4)
    val factory = () => {
      inits.add(1)
      val stub = Multimodal.stubDecoder(4)
      (batch: Seq[Array[Byte]]) => { maxBatch.add(math.max(0, batch.length - 8) * 1000); stub(batch) }
    }
    val n = Multimodal.decodeFeaturesPartitioned(
      many, "asset_id", "bytes", dims = 4, batchSize = 8, decoderFactory = factory).count()
    assert(n == 100)
    assert(inits.value == 4, s"expected one codec init per partition, got ${inits.value}")
    assert(maxBatch.value == 0, "a batch exceeded batchSize")
  }

  // --------------------------------------- real container-header decode

  /** Byte-literal fixtures assembled from the PUBLIC format specs (not
    * from any image library): the exact layouts a real encoder writes. */
  private def hx(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // 3×2 RGBA PNG: signature + IHDR(len 13, w=3, h=2, depth 8, color 6)
  private val png3x2 = hx(
    "89504E470D0A1A0A 0000000D 49484452 00000003 00000002 08 06 00 00 00")
  // 640×480 baseline JPEG: SOI, APP0(JFIF), COM("hi"), DQT(stub), SOF0
  //   (precision 8, h=480=0x01E0, w=640=0x0280, 3 components)
  private val jpeg640 = hx(
    "FFD8 FFE0 0010 4A46494600010100000100010000" +
      "FFFE 0004 6869" + // COM, len 4, "hi"
      "FFDB 0005 000102" + // DQT-ish variable segment the walk must skip
      "FFC0 0011 08 01E0 0280 03 011100 021101 031101")
  // progressive JPEG (SOF2) with a fill byte before the frame marker
  private val jpeg2prog = hx("FFD8 FFFF FFC2 000B 08 0010 0020 01 011100")
  // 12×34 GIF89a: w=12=0x000C little-endian, h=34=0x0022 little-endian
  private val gif12x34 = hx("474946383961 0C00 2200 F70000")

  private def decode(payloads: (Long, Array[Byte])*) = {
    val df = payloads.toSeq.toDF("id", "bytes")
    val h = Multimodal.imageHeader(col("bytes"))
    df.select(col("id"), h.getField("format"), h.getField("width"),
        h.getField("height"), h.getField("channels"))
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) null else r.getString(1)),
          if (r.isNullAt(2)) -1 else r.getInt(2),
          if (r.isNullAt(3)) -1 else r.getInt(3),
          if (r.isNullAt(4)) -1 else r.getInt(4)))
      .toMap
  }

  test("imageHeader parses real PNG / JPEG / GIF layouts byte-exactly") {
    val out = decode(1L -> png3x2, 2L -> jpeg640, 3L -> jpeg2prog, 4L -> gif12x34)
    assert(out(1L) == (("png", 3, 2, 4)))
    assert(out(2L) == (("jpeg", 640, 480, 3)))
    assert(out(3L) == (("jpeg", 32, 16, 1))) // SOF2 found past the fill byte
    assert(out(4L) == (("gif", 12, 34, 3)))
  }

  test("imageHeader: PNG color types map to channel counts") {
    val variants = Seq(0 -> 1, 2 -> 3, 3 -> 1, 4 -> 2, 6 -> 4).zipWithIndex.map {
      case ((ct, _), i) =>
        val b = png3x2.clone(); b(25) = ct.toByte; (i.toLong, b)
    }
    val out = decode(variants: _*)
    Seq(0 -> 1, 2 -> 3, 3 -> 1, 4 -> 2, 6 -> 4).zipWithIndex.foreach {
      case ((_, ch), i) => assert(out(i.toLong)._4 == ch)
    }
    // an undefined color type keeps the format, nulls the dims
    val bad = png3x2.clone(); bad(25) = 5.toByte
    assert(decode(9L -> bad)(9L) == (("png", -1, -1, -1)))
  }

  test("imageHeader: EXIF presence from the APP1 identifier, not just the marker") {
    // APP1 with the Exif identifier before SOF0
    val withExif = hx(
      "FFD8 FFE1 0010 457869660000 49492A0008000000 FFC0 000B 08 0010 0020 01 011100")
    // APP1 carrying something else (XMP-style) must NOT count as EXIF
    val xmpApp1 = hx(
      "FFD8 FFE1 0008 687474703A00 FFC0 000B 08 0010 0020 01 011100")
    val df = Seq(
      (1L, withExif), (2L, xmpApp1), (3L, jpeg640), (4L, png3x2),
      // Exif APP1 seen, then truncated before any SOF: exif survives
      (5L, withExif.take(20))
    ).toDF("id", "bytes")
    val h = Multimodal.imageHeader(col("bytes"))
    val out = df.select(col("id"), h.getField("has_exif").as("e"),
        h.getField("width").as("w"))
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) null else Boolean.box(r.getBoolean(1))),
          if (r.isNullAt(2)) -1 else r.getInt(2))).toMap
    assert(out(1L) == ((true, 32)))
    assert(out(2L) == ((false, 32)), "a non-Exif APP1 is not EXIF")
    assert(out(3L) == ((false, 640)))
    assert(out(4L) == ((null, 3)), "has_exif is null outside JPEG")
    assert(out(5L) == ((true, -1)), "EXIF seen before truncation survives")
  }

  test("imageHeader: truncated and corrupt payloads degrade to format-only or null") {
    val out = decode(
      1L -> png3x2.take(9), // magic intact, IHDR gone
      2L -> jpeg640.take(9), // walk runs off the end before SOF
      3L -> gif12x34.take(8), // magic intact, screen descriptor cut
      4L -> hx("FFD8 FFD9"), // EOI immediately: no frame
      5L -> hx("FFD8 FFDA 0002"), // SOS before any SOF
      6L -> hx("FFD8 00C0 0011"), // broken stream: marker without FF
      7L -> hx("FFD8 FFE0 0001"), // malformed segment length < 2
      8L -> "not an image at all".getBytes("UTF-8"),
      9L -> Array.empty[Byte])
    assert(out(1L) == (("png", -1, -1, -1)))
    assert(out(2L) == (("jpeg", -1, -1, -1)))
    assert(out(3L) == (("gif", -1, -1, -1)))
    assert(out(4L) == (("jpeg", -1, -1, -1)))
    assert(out(5L) == (("jpeg", -1, -1, -1)))
    assert(out(6L) == (("jpeg", -1, -1, -1)))
    assert(out(7L) == (("jpeg", -1, -1, -1)))
    assert(out(8L) == ((null, -1, -1, -1)))
    assert(out(9L) == ((null, -1, -1, -1)))
  }

  // --------------------------------------------- audio container decode

  // 44100 Hz stereo 16-bit WAV, fmt AFTER an odd-length JUNK chunk
  // (walk must pad to even), data declares 1000 samples × 4 bytes
  private val wav44k = hx(
    "52494646 00000000 57415645" +
      "4A554E4B 03000000 414243 00" + // JUNK, 3 bytes + pad
      "666D7420 10000000 0100 0200 44AC0000 10B10200 0400 1000" +
      "64617461 A00F0000") // 4000 bytes declared
  // 48000 Hz mono FLAC, 20-bit sr / 3-bit ch / 5-bit bits / 36-bit total
  // packed by hand: sr=48000=0x0BB80, ch-1=0, bits-1=15, total=123456
  private val flac48k = hx(
    "664C6143 00 000022" + "1000 1000 000000 000000" +
      "0B B8 00 F0" + "0001E240" + // b18..b21 then the 32 low total bits
      "00000000000000000000000000000000")
  // ID3v2 (tag size 5) then an MPEG1 Layer III frame, 32000 Hz, mono
  private val mp3Id3 = hx(
    "494433 0400 00 00000005 48454C4C4F" + "FFFB 98 C0")

  test("audioHeader parses real WAV / FLAC / MP3 layouts byte-exactly") {
    val df = Seq(
      (1L, wav44k), (2L, flac48k), (3L, mp3Id3),
      (4L, hx("FFFB 94 00")), // bare frame sync, 48000 Hz stereo
      (5L, "plain text".getBytes("UTF-8"))
    ).toDF("id", "bytes")
    val h = Multimodal.audioHeader(col("bytes"))
    val out = df.select(col("id"), h.getField("format"),
        h.getField("sample_rate"), h.getField("channels"),
        h.getField("bits_per_sample"), h.getField("n_samples"))
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) null else r.getString(1)),
          if (r.isNullAt(2)) -1 else r.getInt(2),
          if (r.isNullAt(3)) -1 else r.getInt(3),
          if (r.isNullAt(4)) -1 else r.getInt(4),
          if (r.isNullAt(5)) -1L else r.getLong(5))).toMap
    assert(out(1L) == (("wav", 44100, 2, 16, 1000L)), s"wav: ${out(1L)}")
    assert(out(2L) == (("flac", 48000, 1, 16, 123456L)), s"flac: ${out(2L)}")
    assert(out(3L) == (("mp3", 32000, 1, -1, -1L)), s"mp3: ${out(3L)}")
    assert(out(4L) == (("mp3", 48000, 2, -1, -1L)), s"sync: ${out(4L)}")
    assert(out(5L) == ((null, -1, -1, -1, -1L)))
  }

  test("audioHeader: truncated/corrupt payloads degrade to format-only or null") {
    val out = Seq(
      (1L, wav44k.take(12)), // magic only, no chunks
      (2L, wav44k.take(30)), // walk runs out inside the JUNK chunk
      (3L, flac48k.take(20)), // STREAMINFO cut
      (4L, mp3Id3.take(10)), // ID3 header only, frame past the end
      (5L, hx("52494646 00000000 41564920")) // RIFF but AVI, not WAVE
    ).toDF("id", "bytes")
      .select(col("id"), Multimodal.audioHeader(col("bytes")).getField("format").as("f"),
        Multimodal.audioHeader(col("bytes")).getField("sample_rate").as("sr"))
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) null else r.getString(1)), r.isNullAt(2))).toMap
    assert(out(1L) == (("wav", true)))
    assert(out(2L) == (("wav", true)))
    assert(out(3L) == (("flac", true)))
    assert(out(4L) == (("mp3", true)))
    assert(out(5L) == ((null, true)), "RIFF without WAVE is not audio")
  }

  // --------------------------------------------- video container decode

  // minimal ISO-BMFF: ftyp(isom) + free + moov[mvhd v0 + trak[tkhd]]
  // mvhd: timescale 1000, duration 30000; tkhd tail: 640x360 as 16.16
  private val mp4v0 = hx(
    "00000010 66747970 69736F6D 00000000" + // ftyp isom
      "0000000C 66726565 414243 44" + // free, 4 payload bytes
      "000000D8 6D6F6F76" + // moov: 8 + 108 + 100 = 216 = 0xD8
      "0000006C 6D766864 00000000 00000000 00000000 000003E8 00007530" +
      ("00" * 80) + // mvhd v0: 8 + 100
      "00000064 7472616B" + // trak: 8 + 92
      "0000005C 746B6864" + ("00" * 76) + "0280 0000 0168 0000")

  test("videoHeader parses a real ISO-BMFF layout; WebM recognized; truncation degrades") {
    // v1 mvhd twin: 64-bit times/duration (timescale 600, duration 2^32+5
    // exercises the high dword), no trak
    val mp4v1 = hx(
      "00000010 66747970 6D703432 00000000" + // ftyp mp42
        "00000080 6D6F6F76" + // moov: 8 + 120
        "00000078 6D766864 01000000" + ("00" * 16) + // v1 + 8+8 times
        "00000258 0000000100000005" + ("00" * 80)) // ts 600, dur 2^32+5
    val df = Seq(
      (1L, mp4v0), (2L, mp4v1),
      (3L, hx("1A45DFA3 00000000")), // EBML → webm, fields null
      (4L, mp4v0.take(16)), // bare ftyp: format + brand survive
      (5L, hx("00000010 6D6F6F76 00000000 00000000")), // no ftyp first
      (6L, "not a video".getBytes("UTF-8"))
    ).toDF("id", "bytes")
    val hd = Multimodal.videoHeader(col("bytes"))
    val out = df.select(col("id"), hd.getField("format"), hd.getField("brand"),
        hd.getField("timescale"), hd.getField("duration_units"),
        hd.getField("width"), hd.getField("height"))
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) null else r.getString(1)),
          if (r.isNullAt(2)) null else r.getString(2),
          if (r.isNullAt(3)) -1 else r.getInt(3),
          if (r.isNullAt(4)) -1L else r.getLong(4),
          if (r.isNullAt(5)) -1 else r.getInt(5),
          if (r.isNullAt(6)) -1 else r.getInt(6))).toMap
    assert(out(1L) == (("mp4", "isom", 1000, 30000L, 640, 360)), s"${out(1L)}")
    assert(out(2L) == (("mp4", "mp42", 600, 4294967301L, -1, -1)), s"${out(2L)}")
    assert(out(3L) == (("webm", null, -1, -1L, -1, -1)))
    assert(out(4L) == (("mp4", "isom", -1, -1L, -1, -1)))
    assert(out(5L) == ((null, null, -1, -1L, -1, -1)), "no leading ftyp is not BMFF")
    assert(out(6L) == ((null, null, -1, -1L, -1, -1)))
    // malformed interior: moov declares more bytes than exist
    val broken = mp4v0.clone(); broken(31) = 0xFF.toByte // moov size low byte
    val b = decodeVideo(broken)
    assert(b == (("mp4", "isom", -1, -1L, -1, -1)), s"$b")
  }

  private def decodeVideo(bytes: Array[Byte]) = {
    val df = Seq((1L, bytes)).toDF("id", "bytes")
    val hd = Multimodal.videoHeader(col("bytes"))
    df.select(hd.getField("format"), hd.getField("brand"),
        hd.getField("timescale"), hd.getField("duration_units"),
        hd.getField("width"), hd.getField("height"))
      .collect().map(r =>
        ((if (r.isNullAt(0)) null else r.getString(0)),
          if (r.isNullAt(1)) null else r.getString(1),
          if (r.isNullAt(2)) -1 else r.getInt(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1 else r.getInt(4),
          if (r.isNullAt(5)) -1 else r.getInt(5))).head
  }

  test("withMetadata surfaces the decoded dims; null payloads stay null") {
    val df = Seq((1L, png3x2), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "bytes")
    val m = Multimodal.withMetadata(df, "bytes")
      .select("id", "meta.mime", "meta.width", "meta.height", "meta.channels")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getString(1) == "image/png" && m(1L).getInt(2) == 3 &&
      m(1L).getInt(3) == 2 && m(1L).getInt(4) == 4)
    // null payload: the sniff CASE falls through to octet-stream (its
    // documented default), the decoded dims are null
    assert(m(2L).getString(1) == "application/octet-stream")
    assert(m(2L).isNullAt(2) && m(2L).isNullAt(3) && m(2L).isNullAt(4))
  }

  test("decodeFeaturesStub yields deterministic fixed-width float vectors") {
    val f = assets.select(col("asset_id"),
      Multimodal.decodeFeaturesStub(col("bytes"), dims = 8).as("feat"))
    val rows = f.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toList).toMap
    assert(rows.values.forall(_.length == 8))
    assert(rows.values.forall(_.forall(v => v >= -1f && v < 1f)))
    // deterministic: same input, same features
    val again = f.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toList).toMap
    assert(rows == again)
    // distinct payloads get distinct features
    assert(rows(1L) != rows(3L))
  }
}

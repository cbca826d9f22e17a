package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal asset columns: opaque `binary` payloads + typed metadata
  * structs. The CONTAINER layer is fully real — magic sniffing, genuine
  * PNG/GIF/JPEG header decode ([[imageHeader]]: dimensions, channels,
  * via [[graft.functions.ImageHeader]]'s public-format byte
  * arithmetic), fingerprints, chunking, batch shape. Only the LEARNED
  * feature extraction is stubbed (north-star brief: the container
  * ships no ML codecs, so features are a deterministic fake behind the
  * same column contract a real model would use).
  *
  * Scale posture: every operator is a pure column expression over the
  * binary payload — no driver collects, no UDFs — so asset tables
  * partition, prune and shuffle exactly like any other DataFrame; the
  * payload column is only deserialized in the projections that touch it.
  */
object Multimodal {

  val PngMagic: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
  val JpegMagic: Array[Byte] = Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte)

  /** Content-sniffed MIME type from magic bytes (hex of the FIRST 8
    * BYTES only — hexing a multi-MB payload to read 8 chars would cost
    * 2× the blob per row; the prefix is constant cost and yields
    * identical comparisons). */
  def sniffMime(bin: Column): Column = {
    // 12 bytes, not 8: WAV's container magic is RIFF....WAVE — the
    // discriminating four bytes sit at offsets 8-11
    val prefix = hex(bin.substr(1, 12))
    when(substring(prefix, 1, 8) === "89504E47", "image/png")
      .when(substring(prefix, 1, 6) === "FFD8FF", "image/jpeg")
      .when(substring(prefix, 1, 12) === "474946383761" ||
        substring(prefix, 1, 12) === "474946383961", "image/gif")
      .when(substring(prefix, 1, 4) === "424D", "image/bmp")
      .when(substring(prefix, 1, 6) === "494433", "audio/mpeg")
      .when(substring(prefix, 1, 8) === "52494646" &&
        substring(prefix, 17, 8) === "57415645", "audio/wav")
      .when(substring(prefix, 1, 8) === "664C6143", "audio/flac")
      .when(substring(prefix, 9, 8) === "66747970", "video/mp4") // ....ftyp
      .when(substring(prefix, 1, 8) === "1A45DFA3", "video/webm")
      .otherwise("application/octet-stream")
  }

  /** REAL container-header decode: `struct(format, width, height,
    * channels)` parsed from the payload's own bytes — PNG IHDR, GIF
    * logical screen, JPEG SOFn marker walk
    * ([[graft.functions.ImageHeader]]). Recognized magic with a
    * malformed interior → format with null dims; unrecognized → all
    * null. Pure per-row byte arithmetic, nothing shuffles. */
  def imageHeader(bin: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.ImageHeader(ColumnBridge.expression(bin)))
  }

  /** REAL audio-container header decode: `struct(format, sample_rate,
    * channels, bits_per_sample, n_samples)` parsed from the payload's
    * own bytes — WAV RIFF-chunk walk, FLAC STREAMINFO bit unpack, MP3
    * ID3-skip + frame-header rates
    * ([[graft.functions.AudioHeader]]). Same quarantine discipline as
    * [[imageHeader]]. */
  def audioHeader(bin: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.AudioHeader(ColumnBridge.expression(bin)))
  }

  /** REAL video-container header decode: `struct(format, brand,
    * timescale, duration_units, width, height)` — MP4/ISO-BMFF box
    * walk (ftyp brand, moov/mvhd timescale+duration both versions,
    * trak/tkhd 16.16 dimensions), WebM recognized by EBML magic
    * ([[graft.functions.VideoHeader]]). Same quarantine discipline
    * as the image/audio twins. */
  def videoHeader(bin: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.VideoHeader(ColumnBridge.expression(bin)))
  }

  /** Cross-engine content fingerprint: sha256 over the uppercase hex of
    * the payload (hashing the hex, not the raw blob, because engines
    * differ on blob-typed hash support — DuckDB's sha256 is VARCHAR-only). */
  def fingerprint(bin: Column): Column = sha2(hex(bin), 256)

  /** Attach the typed metadata struct the north-star schema calls for:
    * `meta.mime`, `meta.n_bytes`, `meta.sha256`, plus the REAL decoded
    * container header (`meta.width`, `meta.height`, `meta.channels` —
    * null for non-image / malformed payloads). */
  def withMetadata(df: DataFrame, binCol: String, metaCol: String = "meta"): DataFrame = {
    val hdr = imageHeader(col(binCol))
    df.withColumn(metaCol, struct(
      sniffMime(col(binCol)).as("mime"),
      length(col(binCol)).cast("long").as("n_bytes"),
      fingerprint(col(binCol)).as("sha256"),
      hdr.getField("width").as("width"),
      hdr.getField("height").as("height"),
      hdr.getField("channels").as("channels")))
  }

  /** Split each payload into fixed-size byte chunks, one output row per
    * chunk (`chunk_id`, `chunk` binary) — the batch shape a decoder or an
    * embedding model consumes. Chunking is `sequence` + `substring` on
    * the binary column: distributed, no driver involvement. */
  def chunkBytes(df: DataFrame, idCol: String, binCol: String,
      chunkSize: Int): DataFrame = {
    val nChunks = ceil(length(col(binCol)) / lit(chunkSize.toDouble)).cast("int")
    // empty payloads produce zero chunk rows — without the filter,
    // sequence(0, -1) counts DOWN and emits phantom chunk_ids 0 and -1
    df.filter(length(col(binCol)) > 0)
      .select(col(idCol), col(binCol),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        col(binCol).substr(col("chunk_id") * chunkSize + 1, lit(chunkSize))
          .as("chunk"))
  }

  /** Every `stride`-th chunk — the frame-sampling shape for video-like
    * payloads (sample frames, not all of them, before feature extraction). */
  def frameSample(chunks: DataFrame, stride: Int): DataFrame =
    chunks.filter(col("chunk_id") % stride === 0)

  /** STUB — deterministic "resize" of an opaque payload to `targetBytes`
    * by nearest-neighbor byte sampling (out[i] = in[⌊i·len/target⌋] — the
    * byte-level analog of nearest-neighbor image scaling; a payload
    * already at or under the target passes through). Pure column
    * expression, so it partitions/prunes like everything else here; a
    * real deployment swaps in a codec via
    * [[decodeFeaturesPartitioned]]'s harness instead.
    *
    * Contract: THUMBNAIL-sized targets (≤ a few KB). The `aggregate`
    * re-concatenation is quadratic in `targetBytes` (immutable
    * accumulator), which is irrelevant at thumbnail size and wrong for
    * megabyte targets — enforced, not documented-only. */
  def resizeStub(bin: Column, targetBytes: Int): Column = {
    require(targetBytes > 0 && targetBytes <= 4096,
      s"resizeStub targets thumbnails (1..4096 bytes), got $targetBytes")
    val len = length(bin)
    val sampled = aggregate(
      sequence(lit(0), lit(targetBytes - 1)),
      lit(Array.empty[Byte]),
      // explicit floor: Column `/` is double division, and the byte pick
      // must be ⌊i·len/target⌋ exactly (the oracle replicates it in
      // integer arithmetic)
      (acc, i) => concat(acc,
        bin.substr((floor(i * len / targetBytes) + 1).cast("int"), lit(1))))
    when(len <= targetBytes, bin).otherwise(sampled)
  }

  /** REAL feature decode for the one format that needs no codec:
    * uncompressed WAV PCM → `array<long>` of `dims` exact bucket sums
    * (the integer amplitude envelope — [[graft.functions.
    * WavPcmFeatures]]: RIFF chunk walk, 8/16-bit multi-channel sample
    * decode, ⌊j·dims/n⌋ bucketing; null for non-PCM / truncated /
    * non-WAV payloads). Replaces [[decodeFeaturesStub]] for this
    * format; compressed codecs remain behind
    * [[decodeFeaturesPartitioned]]'s pluggable harness. */
  def wavPcmFeatures(bin: Column, dims: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.WavPcmFeatures(ColumnBridge.expression(bin), dims))
  }

  /** REAL sample decode for the first COMPRESSED audio format: FLAC →
    * the SAME `array<long>` amplitude envelope as [[wavPcmFeatures]]
    * ([[graft.functions.FlacPcmFeatures]]: metadata walk, frame
    * headers with CRC-8, constant/verbatim/fixed/LPC subframes, rice
    * residuals, stereo decorrelation, CRC-16 + MD5 verification; null
    * outside the decode contract). One oracle arithmetic covers the
    * raw and the compressed container. */
  def flacPcmFeatures(bin: Column, dims: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.FlacPcmFeatures(ColumnBridge.expression(bin), dims))
  }

  /** Encode 16-bit LE interleaved PCM as a real FLAC stream
    * ([[graft.functions.FlacEncodePcm]]) — the compressed-audio emit
    * beside the WAV surface, and the fixture path value-checking the
    * FLAC decoder end to end (q171). */
  def flacEncodePcm(pcm: Column, channels: Column, sampleRate: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.FlacEncodePcm(
      ColumnBridge.expression(pcm), ColumnBridge.expression(channels),
      ColumnBridge.expression(sampleRate)))
  }

  /** REAL pixel decode for the second codec-free format: 24-bit
    * uncompressed BMP → exact integer grid color features
    * (`array<long>` of gx·gy·3 per-cell (r, g, b) sums —
    * [[graft.functions.BmpGridFeatures]]; null outside the 24-bit
    * BI_RGB contract or on a truncated pixel payload). */
  def bmpGridFeatures(bin: Column, gx: Int, gy: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.BmpGridFeatures(ColumnBridge.expression(bin), gx, gy))
  }

  /** REAL image resize for 24-bit BMPs — nearest-neighbor over actual
    * pixels, emitting a well-formed BMP ([[graft.functions.
    * BmpResizeNearest]]): the thumbnail step, replacing [[resizeStub]]
    * for this format so downstream stages shuffle thumbnails, not
    * originals. */
  def bmpResizeNearest(bin: Column, outW: Int, outH: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.BmpResizeNearest(ColumnBridge.expression(bin), outW, outH))
  }

  /** REAL pixel decode for the third JDK-decodable format:
    * non-interlaced 8-bit PNG (Inflater + the five scanline unfilters —
    * [[graft.functions.PngGridFeatures]]) → the same exact integer
    * grid color features as [[bmpGridFeatures]]. Gray/gray+alpha/RGB/
    * RGBA/palette (PLTE-indexed, r18) decode; 16-bit and interlaced
    * return null. */
  def pngGridFeatures(bin: Column, gx: Int, gy: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.PngGridFeatures(ColumnBridge.expression(bin), gx, gy))
  }

  /** Encode raw top-down RGB triples (w·h·3 bytes) as a standard 8-bit
    * RGB PNG ([[graft.functions.PngEncodeRgb]]) — the
    * compressed-thumbnail emit beside [[bmpResizeNearest]]'s
    * uncompressed one. */
  def pngEncodeRgb(data: Column, w: Column, h: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.PngEncodeRgb(
      ColumnBridge.expression(data), ColumnBridge.expression(w),
      ColumnBridge.expression(h)))
  }

  /** Encode raw top-down index bytes + an RGB table as a standard
    * 8-bit PALETTE PNG ([[graft.functions.PngEncodePalette]]) — the
    * 1-byte-per-pixel emit for icon/chart-like assets, and the fixture
    * path value-checking the decoder's PLTE indirection (q169). */
  def pngEncodePalette(indices: Column, w: Column, h: Column,
      palette: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.PngEncodePalette(
      ColumnBridge.expression(indices), ColumnBridge.expression(w),
      ColumnBridge.expression(h), ColumnBridge.expression(palette)))
  }

  /** REAL pixel decode for the fourth codec-free format: GIF first
    * frames through a full variable-width LZW decoder
    * ([[graft.functions.GifGridFeatures]]) → the same exact integer
    * grid color features as the BMP/PNG siblings. Interlaced frames
    * and out-of-table pixels return null. */
  def gifGridFeatures(bin: Column, gx: Int, gy: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.GifGridFeatures(ColumnBridge.expression(bin), gx, gy))
  }

  /** Encode raw top-down index bytes + an RGB table as a standard
    * GIF89a ([[graft.functions.GifEncodePalette]]) — the LZW sibling
    * of [[pngEncodePalette]], and the fixture path value-checking the
    * GIF decoder (q170). */
  def gifEncodePalette(indices: Column, w: Column, h: Column,
      palette: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.GifEncodePalette(
      ColumnBridge.expression(indices), ColumnBridge.expression(w),
      ColumnBridge.expression(h), ColumnBridge.expression(palette)))
  }

  /** STUB — deterministic fake feature extraction. A real deployment
    * replaces this with an actual image/audio decoder feeding a model;
    * the container has no codecs beyond [[wavPcmFeatures]]'s
    * uncompressed-PCM path, the BMP/PNG pixel decoders and the PNG
    * encoder, so features are hash-derived floats in
    * [-1, 1). The column contract (binary in, `array<float>` of `dims`
    * out) and everything downstream (ANN, near-dup over the features) is
    * real and exercised by tests. */
  def decodeFeaturesStub(bin: Column, dims: Int): Column =
    transform(sequence(lit(1), lit(dims)),
      i => (xxhash64(bin, i) % 1000000L).cast("double") / 1000000.0)
      .cast("array<float>")

  // ------------------------------------------------- partitioned decode path

  /** JVM twin of [[decodeFeaturesStub]] for the partitioned path: the
    * same xxhash64-derived floats, computed by evaluating the identical
    * Catalyst expression per payload, so both decode paths are
    * bit-equal and interchangeable downstream. */
  def stubDecoder(dims: Int): Seq[Array[Byte]] => Seq[Array[Float]] = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal, XxHash64}
    import org.apache.spark.sql.types.BinaryType
    // the exact expressions the column stub evaluates, bound once
    val exprs = Array.tabulate(dims)(d =>
      XxHash64(Seq(BoundReference(0, BinaryType, nullable = true), Literal(d + 1)), 42L))
    batch => batch.map { bytes =>
      val row = InternalRow(bytes)
      Array.tabulate(dims) { d =>
        val h = exprs(d).eval(row).asInstanceOf[Long]
        ((h % 1000000L).toDouble / 1000000.0).toFloat
      }
    }
  }

  /** Partition-batched decode harness — the codec integration point.
    *
    * Real decoders (image/audio/video libraries) are imperative native
    * code: they want ONE expensive initialization and then batches of
    * payloads, which is exactly what `mapPartitions` provides and column
    * expressions cannot — so this is the one place the multimodal layer
    * deliberately drops below the DataFrame API (preference (d) of the
    * custom-operator ladder). `decoderFactory` runs once per partition
    * (codec init), its function is fed bounded `batchSize` slices of the
    * partition (decoder batch shape, bounds peak memory at
    * batchSize × payload), and results stream back row-aligned. The
    * default factory is the [[stubDecoder]]; swapping in a real codec
    * changes no plumbing.
    *
    * Scale posture: pure narrow transformation — assets stay in their
    * partitions, nothing shuffles, output carries (id, features) so the
    * multi-MB payload column is dropped as early as possible.
    */
  def decodeFeaturesPartitioned(
      df: DataFrame,
      idCol: String,
      binCol: String,
      dims: Int,
      batchSize: Int = 32,
      decoderFactory: () => Seq[Array[Byte]] => Seq[Array[Float]] = null): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val factory = Option(decoderFactory).getOrElse(() => stubDecoder(dims))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("features",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))))
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(col(idCol).cast("long").as("__id"), col(binCol).as("__bin"))
      .mapPartitions { it =>
        val decode = factory() // once per partition: the codec init
        it.grouped(batchSize).flatMap { batch =>
          // null-tolerant id read: the expression-stub path passes null
          // ids through, so this path must too (getLong would throw)
          val ids = batch.map(r => if (r.isNullAt(0)) null
            else java.lang.Long.valueOf(r.getLong(0)))
          val features = decode(batch.map(_.getAs[Array[Byte]](1)))
          require(features.length == ids.length,
            s"decoder returned ${features.length} results for ${ids.length} inputs")
          ids.lazyZip(features).map((id, f) => org.apache.spark.sql.Row(id, f.toSeq))
        }
      }
      .withColumnRenamed("__id", idCol)
  }
}

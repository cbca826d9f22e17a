package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal asset columns: opaque `binary` payloads + typed metadata
  * structs, with the Spark-side plumbing (schema, chunking, batch shape)
  * fully real and the codec step stubbed (north-star brief: the container
  * ships no image/audio codecs, so decode is a deterministic fake behind
  * the same column contract a real decoder would use).
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
    val prefix = hex(bin.substr(1, 8))
    when(substring(prefix, 1, 8) === "89504E47", "image/png")
      .when(substring(prefix, 1, 6) === "FFD8FF", "image/jpeg")
      .when(substring(prefix, 1, 6) === "494433", "audio/mpeg")
      .otherwise("application/octet-stream")
  }

  /** Cross-engine content fingerprint: sha256 over the uppercase hex of
    * the payload (hashing the hex, not the raw blob, because engines
    * differ on blob-typed hash support — DuckDB's sha256 is VARCHAR-only). */
  def fingerprint(bin: Column): Column = sha2(hex(bin), 256)

  /** Attach the typed metadata struct the north-star schema calls for:
    * `meta.mime`, `meta.n_bytes`, `meta.sha256`. */
  def withMetadata(df: DataFrame, binCol: String, metaCol: String = "meta"): DataFrame =
    df.withColumn(metaCol, struct(
      sniffMime(col(binCol)).as("mime"),
      length(col(binCol)).cast("long").as("n_bytes"),
      fingerprint(col(binCol)).as("sha256")))

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

  /** STUB — deterministic fake feature extraction. A real deployment
    * replaces this with an actual image/audio decoder feeding a model;
    * the container has no codecs, so features are hash-derived floats in
    * [-1, 1). The column contract (binary in, `array<float>` of `dims`
    * out) and everything downstream (ANN, near-dup over the features) is
    * real and exercised by tests. */
  def decodeFeaturesStub(bin: Column, dims: Int): Column =
    transform(sequence(lit(1), lit(dims)),
      i => (xxhash64(bin, i) % 1000000L).cast("double") / 1000000.0)
      .cast("array<float>")
}

package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Multimodal

class WavPcmFeaturesSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal valid PCM WAV: RIFF/WAVE + fmt(16) + optional junk chunk +
    * data. `samples` are raw channel-interleaved values. */
  private def wav(bits: Int, channels: Int, samples: Seq[Int],
      fmtCode: Int = 1, junkChunk: Boolean = false,
      declaredDataBytes: Option[Int] = None,
      blockAlignOverride: Option[Int] = None): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def le(v: Long, n: Int): Unit = {
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v)
      out.write(b.array(), 0, n)
    }
    out.write("RIFF".getBytes("ISO-8859-1")); le(0, 4)
    out.write("WAVE".getBytes("ISO-8859-1"))
    out.write("fmt ".getBytes("ISO-8859-1")); le(16, 4)
    le(fmtCode, 2); le(channels, 2); le(8000, 4)
    val align = blockAlignOverride.getOrElse(channels * bits / 8)
    le(8000L * align, 4); le(align, 2); le(bits, 2)
    if (junkChunk) { // odd-size payload exercises RIFF even-padding
      out.write("JUNK".getBytes("ISO-8859-1")); le(3, 4)
      out.write(Array[Byte](1, 2, 3)); out.write(0)
    }
    val dataBytes = samples.length * bits / 8
    out.write("data".getBytes("ISO-8859-1"))
    le(declaredDataBytes.getOrElse(dataBytes).toLong, 4)
    samples.foreach { s =>
      if (bits == 8) out.write(s & 0xFF) else le(s.toLong & 0xFFFF, 2)
    }
    out.toByteArray
  }

  private def decode(bytes: Array[Byte], dims: Int): Option[Seq[Long]] =
    Seq(Tuple1(bytes)).toDF("b")
      .select(Multimodal.wavPcmFeatures(col("b"), dims).as("f"))
      .as[Option[Seq[Long]]].head()

  test("16-bit mono: signed LE samples, forward-map bucketing, hand-computed sums") {
    // 8 frames, dims 4 → buckets of 2: [s0+s1, s2+s3, s4+s5, s6+s7]
    val s = Seq(100, -100, 32767, -32768, 1, 2, -1, -2)
    assert(decode(wav(16, 1, s), 4) ==
      Some(Seq(0L, 32767L - 32768L, 3L, -3L)))
    // dims 1 = total sum; dims 8 = identity
    assert(decode(wav(16, 1, s), 1) == Some(Seq(s.map(_.toLong).sum)))
    assert(decode(wav(16, 1, s), 8) == Some(s.map(_.toLong)))
  }

  test("8-bit stereo: unsigned−128 per channel, frames sum their channels") {
    // 2 frames × 2 channels: (128,130) → 0+2 = 2; (0, 255) → −128+127 = −1
    val s = Seq(128, 130, 0, 255)
    assert(decode(wav(8, 2, s), 2) == Some(Seq(2L, -1L)))
  }

  test("unknown chunks step over by declared size (odd-payload padding included)") {
    val s = Seq(5, -5, 7, -7)
    assert(decode(wav(16, 1, s, junkChunk = true), 2) == Some(Seq(0L, 0L)))
  }

  test("fewer frames than dims: forward map leaves the gaps at zero") {
    // 2 frames, dims 4: frame 0 → bucket 0, frame 1 → bucket 2
    assert(decode(wav(16, 1, Seq(9, 11)), 4) == Some(Seq(9L, 0L, 11L, 0L)))
  }

  test("empty data chunk yields all-zero sums, not null") {
    assert(decode(wav(16, 1, Seq.empty), 3) == Some(Seq(0L, 0L, 0L)))
  }

  test("a trailing partial frame is ignored") {
    // stereo 16-bit (align 4) with one lone extra sample (2 bytes)
    val full = wav(16, 2, Seq(10, 20, 30, 40, 99))
    assert(decode(full, 1) == Some(Seq(10L + 20L + 30L + 40L)))
  }

  test("contract violations are null, never garbage") {
    val good = Seq(1, 2, 3, 4)
    // declared-but-missing payload: this is a decoder, not a header read
    assert(decode(wav(16, 1, good, declaredDataBytes = Some(64)), 2).isEmpty)
    // non-PCM fmt code (3 = IEEE float)
    assert(decode(wav(16, 1, good, fmtCode = 3), 2).isEmpty)
    // unsupported bit width
    assert(decode(wav(24, 1, Seq.empty), 2).isEmpty)
    // inconsistent blockAlign
    assert(decode(wav(16, 1, good, blockAlignOverride = Some(3)), 2).isEmpty)
    // not a WAV at all / too short
    assert(decode("RIFFxxxxWAVE".getBytes("ISO-8859-1"), 2).isEmpty)
    assert(decode(Array[Byte](1, 2, 3), 2).isEmpty)
    // null payload stays null (nullSafeEval)
    assert(Seq(Tuple1(null: Array[Byte])).toDF("b")
      .select(Multimodal.wavPcmFeatures(col("b"), 2).as("f"))
      .as[Option[Seq[Long]]].head().isEmpty)
  }

  test("adversarial declared chunk sizes near 2^31 null out instead of crashing the walk") {
    // 'RIFF' + size + 'WAVE' + 'JUNK' chunk declaring ~Int.MaxValue
    // bytes: an Int chunk walk would wrap pos negative and read b(-2^31)
    val out = new ByteArrayOutputStream()
    def le(v: Long, n: Int): Unit = {
      val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v)
      out.write(bb.array(), 0, n)
    }
    out.write("RIFF".getBytes("ISO-8859-1")); le(0, 4)
    out.write("WAVE".getBytes("ISO-8859-1"))
    out.write("JUNK".getBytes("ISO-8859-1")); le(0x7FFFFFF0L, 4)
    val bytes = out.toByteArray
    assert(decode(bytes, 2).isEmpty)
    // the header reader shares the walk — must also survive
    assert(Seq(Tuple1(bytes)).toDF("b")
      .select(Multimodal.audioHeader(col("b")).getField("sample_rate").as("sr"))
      .as[Option[Int]].head().isEmpty)
    // a declared-huge DATA size with a real fmt chunk: decoder nulls
    // (payload missing); header reader keeps reporting the metadata
    val out2 = new ByteArrayOutputStream()
    def le2(v: Long, n: Int): Unit = {
      val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v)
      out2.write(bb.array(), 0, n)
    }
    out2.write("RIFF".getBytes("ISO-8859-1")); le2(0, 4)
    out2.write("WAVE".getBytes("ISO-8859-1"))
    out2.write("fmt ".getBytes("ISO-8859-1")); le2(16, 4)
    le2(1, 2); le2(1, 2); le2(8000, 4); le2(16000, 4); le2(2, 2); le2(16, 2)
    out2.write("data".getBytes("ISO-8859-1")); le2(0xFFFFFFF0L, 4)
    assert(decode(out2.toByteArray, 2).isEmpty)
  }

  test("agrees with the header reader's geometry on the same payload") {
    val bytes = wav(16, 2, Seq(1, 2, 3, 4, 5, 6))
    val row = Seq(Tuple1(bytes)).toDF("b").select(
      Multimodal.audioHeader(col("b")).getField("n_samples").as("n"),
      Multimodal.wavPcmFeatures(col("b"), 3).as("f")).head()
    assert(row.getLong(0) == 3L) // 6 samples / 2 channels
    assert(row.getSeq[Long](1) == Seq(3L, 7L, 11L))
  }

  test("wav_pcm_features rejects non-binary input and bad dims") {
    intercept[IllegalArgumentException] {
      Multimodal.wavPcmFeatures(col("x"), 0)
    }
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Tuple1("str")).toDF("x")
        .select(Multimodal.wavPcmFeatures(col("x"), 2)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("binary") ||
      e.getMessage.contains("wav_pcm_features"))
  }
}

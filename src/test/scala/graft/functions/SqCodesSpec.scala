package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

class SqCodesSpec extends SparkSpec {
  import spark.implicits._

  private def encodeOne(v: Seq[Float]): Option[(Array[Byte], Long)] =
    Seq(Tuple1(v)).toDF("v")
      .select(Similarity.sqEncodeCol(col("v")).as("e"))
      .as[Option[(Array[Byte], Long)]].head()

  test("encode matches the hand arithmetic: codes, scale, signed range") {
    // v = (3, -4): nrm 5, xn = (0.6, -0.8), ma = 0.8 →
    // codes = floor(0.6/0.8·127 + 0.5), floor(-1·127 + 0.5) = (95, -127)
    // scale = floor(1e6 · 0.8 / 127) = 6299
    val Some((codes, scale)) = encodeOne(Seq(3f, -4f))
    assert(codes.toSeq == Seq(95.toByte, (-127).toByte))
    assert(scale == math.floor(1e6 * 0.8 / 127).toLong)
  }

  test("degenerate vectors (zero, empty) encode as null") {
    assert(encodeOne(Seq(0f, 0f)).isEmpty)
    assert(encodeOne(Seq.empty[Float]).isEmpty)
  }

  test("sqTopKExhaustive ranks a parallel vector above near-orthogonal ones") {
    val corpus = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),
      (2L, Seq(0.9f, 0.1f, 0f, 0f)),
      (3L, Seq(0f, 1f, 0f, 0f)),
      (4L, Seq(0f, 0f, 1f, 0f)),
      (5L, Seq(0f, 0f, 0f, 0f)) // zero vector: excluded, never a hit
    ).toDF("vec_id", "embedding")
    val queries = Seq((100L, Seq(2f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val got = Similarity.sqTopKExhaustive(queries, corpus, "vec_id", "embedding", 3)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L) || got.map(_._1) == Seq(2L, 1L, 3L))
    assert(got.map(_._2) == Seq(1L, 2L, 3L))
    assert(!got.map(_._1).contains(5L))
  }

  test("score is the exact integer contract: scale * sum(qm * code)") {
    val corpus = Seq((7L, Seq(3f, -4f))).toDF("vec_id", "embedding")
    val queries = Seq((9L, Seq(1f, 1f))).toDF("vec_id", "embedding")
    val got = Similarity.sqTopKExhaustive(queries, corpus, "vec_id", "embedding", 1)
      .select("sq_micro").as[Long].head()
    // qm = floor(1e6/sqrt(2)) twice; codes (95, -127), scale 6299
    val qm = math.floor(1e6 * (1.0 / math.sqrt(2.0))).toLong
    assert(got == 6299L * (qm * 95 + qm * -127))
  }

  test("SQL surface: sq_adc null on length mismatch via direct expression") {
    val df = Seq((Array[Byte](1, 2, 3), Seq(1L, 2L))).toDF("c", "q")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val scored = df.select(ColumnBridge.column(graft.functions.SqAdc(
      ColumnBridge.expression(col("c")),
      ColumnBridge.expression(col("q")))).as("s"))
      .as[Option[Long]].head()
    assert(scored.isEmpty)
  }
}

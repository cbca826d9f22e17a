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

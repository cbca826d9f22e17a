package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted-index parameter contract: an index relation carries its
  * build parameters as stamped constant columns, and every probe
  * validates them. Before the stamp, a probe run under parameters other
  * than the index's build parameters silently equi-joined into the
  * wrong key space and returned a plausible-looking NEAR-EMPTY match
  * set — the worst failure mode, a wrong answer with no error. These
  * specs prove the mismatch now raises, the stamp survives the parquet
  * round-trip a persisted index lives through, and a matched probe is
  * byte-identical to the unstamped era.
  */
class IndexStampSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different text body here now")
  ).toDF("doc_id", "text")

  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.5f, 0.2f)),
    (2L, Array(0.9f, 0.1f, 0.4f, 0.2f)),
    (3L, Array(-1.0f, 0.3f, 0.0f, 0.7f)),
    (4L, Array(0.0f, -0.2f, 0.8f, 0.1f))
  ).toDF("vec_id", "embedding")

  /** Run `action` and assert some throwable in the cause chain carries
    * the stamp-mismatch message (Spark wraps the task-side raise). */
  private def assertMismatchRaises(action: => Any): Unit = {
    val t = intercept[Throwable](action)
    val messages = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString("\n")
    assert(messages.contains("build-parameter mismatch"),
      s"expected a build-parameter mismatch raise, got: $messages")
  }

  test("minhashProbe against an index built under different banding RAISES") {
    val index = Dedup.minhashIndex(docs, "doc_id", "text", n = 3, k = 16, bands = 4)
    assertMismatchRaises(
      Dedup.minhashProbe(docs, index, "doc_id", "text",
        n = 3, k = 16, bands = 8, minAgree = 1).count())
    // mismatched shingle width too — same band count, different key space
    assertMismatchRaises(
      Dedup.minhashProbe(docs, index, "doc_id", "text",
        n = 2, k = 16, bands = 4, minAgree = 1).count())
  }

  test("lshIndexProbe against an index built under a different plane count RAISES") {
    val index = Similarity.lshIndex(vecs, "vec_id", "embedding",
      planes = 2, dims = 4, tables = 4)
    assertMismatchRaises(
      Similarity.lshIndexProbe(vecs, index, "vec_id", "embedding",
        minMicro = 0L, planes = 3, dims = 4, tables = 4).count())
    assertMismatchRaises(
      Similarity.lshIndexProbe(vecs, index, "vec_id", "embedding",
        minMicro = 0L, planes = 2, dims = 4, tables = 6).count())
  }

  test("an unstamped index relation is rejected at plan construction") {
    val stripped = Dedup.minhashIndex(docs, "doc_id", "text")
      .drop("ix_n", "ix_k", "ix_bands")
    val e1 = intercept[IllegalArgumentException](
      Dedup.minhashProbe(docs, stripped, "doc_id", "text"))
    assert(e1.getMessage.contains("ix_n"))
    val strippedLsh = Similarity.lshIndex(vecs, "vec_id", "embedding",
      planes = 2, dims = 4).drop("ix_planes", "ix_dims", "ix_tables")
    val e2 = intercept[IllegalArgumentException](
      Similarity.lshIndexProbe(vecs, strippedLsh, "vec_id", "embedding",
        minMicro = 0L, planes = 2, dims = 4))
    assert(e2.getMessage.contains("ix_planes"))
  }

  test("streaming screens validate the stamp at plan construction too") {
    import graft.streaming.StreamingIngest
    val strippedMh = Dedup.minhashIndex(docs, "doc_id", "text").drop("ix_bands")
    intercept[IllegalArgumentException](
      StreamingIngest.nearDupScreenStream(docs, strippedMh, "doc_id", "text"))
    val strippedLsh = Similarity.lshIndex(vecs, "vec_id", "embedding",
      planes = 2, dims = 4).drop("ix_tables")
    intercept[IllegalArgumentException](
      StreamingIngest.embeddingScreenStream(vecs, strippedLsh, "vec_id",
        "embedding", minMicro = 0L, planes = 2, dims = 4))
  }

  test("stamp survives the partitioned parquet round-trip and a matched probe is unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stamp").toString
    val index = Dedup.minhashIndex(docs, "doc_id", "text")
    index.write.mode("overwrite").partitionBy("band").parquet(dir)
    val readBack = spark.read.parquet(dir)
    assert(Seq("ix_n", "ix_k", "ix_bands").forall(readBack.columns.contains),
      "stamp columns must survive persistence")
    val probes = Seq((10L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    def run(ix: org.apache.spark.sql.DataFrame) =
      Dedup.minhashProbe(probes, ix, "doc_id", "text", minAgree = 8)
        .collect().map(_.toSeq).toSet
    val fromDisk = run(readBack)
    assert(fromDisk == run(index))
    assert(fromDisk.nonEmpty, "near-identical doc must match through the index")
    // and the mismatch raise also fires through the persisted form
    assertMismatchRaises(
      Dedup.minhashProbe(probes, readBack, "doc_id", "text",
        n = 3, k = 16, bands = 2, minAgree = 1).count())
  }
}

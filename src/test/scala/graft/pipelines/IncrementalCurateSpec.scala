package graft.pipelines

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.TrainingQueries

/** End-to-end scenarios for q72 — the incremental curation pipeline.
  * Each batch document exercises exactly one screen of the composition:
  * the quality gates, the in-batch exact dedup, the exact-content-hash
  * screen against the store, and the stamped-index near-dup screen.
  * (The store slice is doc_id % 10 != 0; the batch is % 10 == 0.)
  */
class IncrementalCurateSpec extends SparkSpec {
  import spark.implicits._

  // all gate-passing texts: >= 10 tokens, >= 1% stopwords, >= 10%
  // distinct, no dominant token, no repeated-bigram saturation
  private val textA =
    "the quick brown fox jumps over a lazy dog near the river bank today"
  private val textB =
    "a merchant of venice sailed in the morning tide carrying spice and " +
      "silk toward the northern harbor gates before sunrise"
  private val textBNear = // one tail token changed: near-dup, not exact
    "a merchant of venice sailed in the morning tide carrying spice and " +
      "silk toward the northern harbor gates before sundown"
  private val textC =
    "seven engineers of the valley debugged a streaming pipeline in " +
      "the quiet hours and shipped it before dawn"

  test("q72: each screen drops its doc; the clean doc survives with a split") {
    val dir = Files.createTempDirectory("graft-q72").toString
    Seq(
      // store (curated corpus)
      (1L, textA, "en", "s1"),
      (2L, textB, "en", "s2"),
      // batch
      (10L, textA, "en", "s3"),     // exact dup of store 1 → hash screen
      (20L, textBNear, "en", "s4"), // near-dup of store 2 → index screen
      (30L, textC, "en", "s5"),     // clean → survives
      (40L, textC, "en", "s5"),     // exact in-batch dup of 30 → exact dedup
      (50L, "tiny", "en", "s6"))    // < 10 tokens → quality gates
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = TrainingQueries.q72IncrementalCurate(spark, dir).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(30L),
      s"expected only doc 30 to survive, got ${out.map(_.getAs[Long]("doc_id")).mkString(",")}")
    assert(Set("train", "val", "test").contains(out.head.getAs[String]("split")))
  }

  test("q72: empty store bootstraps to intra-batch collapse only") {
    val dir = Files.createTempDirectory("graft-q72-boot").toString
    Seq( // no doc_id % 10 != 0 rows at all: first-ever batch
      (10L, textA, "en", "s1"),
      (20L, textA, "en", "s1"), // exact in-batch dup of 10
      (30L, textC, "en", "s2"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ids = TrainingQueries.q72IncrementalCurate(spark, dir)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(ids == Seq(10L, 30L))
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The routed ANN front door ([[Similarity.annTopKAuto]]): route choice
  * asserted from the physical plan, answer-invariance proven at the
  * recall-1 point where both arms must return the identical exact
  * result — the same proof discipline as rangeJoinAuto / rollingAgg. */
class AnnRouteSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")
  // disjoint probe/corpus split — the ingest-screen shape the study used
  private lazy val corpus = emb.filter(col("vec_id") % 10 =!= 0)
  private lazy val probes = emb.filter(col("vec_id") % 10 === 0 && col("vec_id") < 500)
  private val NCELLS = 8
  private lazy val index = Similarity.ivfIndex(corpus, "vec_id", "embedding",
    nCells = NCELLS, dims = 64).localCheckpoint(true)

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("screening workload routes to the IVF probe") {
    val got = Similarity.annTopKAuto(corpus, probes, index, "vec_id", "embedding",
      k = 3, nProbe = 2, screening = true)
    // only the IVF arm reads the stamped index: its plan carries the
    // stamp-validation filter on ix_cells; the brute arm never touches
    // the index relation
    assert(plan(got).contains("ix_cells"),
      "screening must take the index probe, not the corpus scan")
    assert(canon(got) == canon(Similarity.ivfIndexProbeAuto(
      probes, index, "vec_id", "embedding", k = 3, nProbe = 2)))
  }

  test("true top-k at a high recall target routes to the exact brute-force batch") {
    val got = Similarity.annTopKAuto(corpus, probes, index, "vec_id", "embedding",
      k = 3, nProbe = 2, screening = false, minRecall = 0.9)
    assert(!plan(got).contains("ix_cells"),
      "a 0.9 recall target on unclustered data must take the exact scan, not the index")
    assert(canon(got) == canon(Similarity.bruteForceTopKBatch(
      corpus, probes, "vec_id", "embedding", k = 3)))
  }

  test("true top-k at a low recall target stays on IVF with the derived nProbe") {
    // minRecall 0.25 over 8 cells → probed fraction 2/8; caller's
    // nProbe=1 is raised to the derived 2
    val got = Similarity.annTopKAuto(corpus, probes, index, "vec_id", "embedding",
      k = 3, nProbe = 1, screening = false, minRecall = 0.25)
    assert(plan(got).contains("ix_cells"))
    assert(canon(got) == canon(Similarity.ivfIndexProbeAuto(
      probes, index, "vec_id", "embedding", k = 3, nProbe = 2)))
  }

  test("answer-invariance at the recall-1 point: both arms return the identical result") {
    // probing every cell makes the IVF arm exact — it must equal the
    // brute-force arm bit-for-bit (same ordering contract, same
    // cos_micro arithmetic, disjoint probe/corpus sets)
    val ivfArm = Similarity.annTopKAuto(corpus, probes, index, "vec_id", "embedding",
      k = 5, nProbe = NCELLS, screening = true)
    val bruteArm = Similarity.annTopKAuto(corpus, probes, index, "vec_id", "embedding",
      k = 5, nProbe = NCELLS, screening = false, minRecall = 1.0)
    assert(canon(ivfArm) == canon(bruteArm))
  }

  test("bruteForceTopKBatch matches bruteForceTopK where both contracts hold") {
    // queries ⊆ corpus: the subset form and the batch form must agree
    val qs = emb.filter(col("vec_id") < 40)
    val subsetForm = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", k = 5)
      .withColumn("rank", col("rank").cast("long"))
    val batchForm = Similarity.bruteForceTopKBatch(emb, qs, "vec_id", "embedding", k = 5)
    assertSameRows(batchForm, subsetForm)
  }
}

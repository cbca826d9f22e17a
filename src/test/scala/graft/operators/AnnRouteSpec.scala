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

  private lazy val cb = Pq.pqCodebook(corpus, "vec_id", "embedding",
    dims = 64, nSub = 8, k = 16).localCheckpoint(true)
  private lazy val pqIx = Pq.pqIndex(corpus, "vec_id", "embedding",
    cb, nCells = NCELLS, dims = 64).localCheckpoint(true)

  test("the compressed pair routes the index arms through ADC + exact rerank") {
    // the PQ arm is the only route that evaluates pq_adc; the raw IVF
    // arm is the only one that scans raw member vectors
    val got = Similarity.annTopKAuto(corpus, probes, pqIx, "vec_id", "embedding",
      k = 3, nProbe = 2, screening = false, minRecall = 0.25,
      pqIndex = Some(pqIx), pqCodebook = Some(cb), pqRerankR = 50)
    assert(plan(got).contains("pq_adc"),
      "a supplied IVF-PQ pair must route the probe through the compressed codes")
    // same route on the screening arm
    val scr = Similarity.annTopKAuto(corpus, probes, pqIx, "vec_id", "embedding",
      k = 3, nProbe = 2, screening = true,
      pqIndex = Some(pqIx), pqCodebook = Some(cb))
    assert(plan(scr).contains("pq_adc"))
    // and WITHOUT the pair, no route ever touches ADC
    val raw = Similarity.annTopKAuto(corpus, probes, index, "vec_id", "embedding",
      k = 3, nProbe = 2, screening = false, minRecall = 0.25)
    assert(!plan(raw).contains("pq_adc"))
    // the derived-nProbe rule is shared: the PQ arm at minRecall 0.25
    // probes the same 2-of-8 cells, composed with the R-pool rerank
    assert(canon(got) == canon(Pq.pqRerankSided(
      Pq.pqProbeAuto(probes, pqIx, cb, "vec_id", "embedding", k = 50, nProbe = 2),
      probes, corpus, "vec_id", "embedding", k = 3)))
  }

  test("compressed-arm answer-invariance at the recall-1 point") {
    // probing every cell with an R covering the whole corpus makes the
    // PQ arm exact: ADC only orders the pool, the pool is everything,
    // and the rerank scores every candidate with the exact cosine — it
    // must equal the brute-force arm bit-for-bit
    val all = corpus.count().toInt
    val pqArm = Similarity.annTopKAuto(corpus, probes, pqIx, "vec_id", "embedding",
      k = 5, nProbe = NCELLS, screening = true,
      pqIndex = Some(pqIx), pqCodebook = Some(cb), pqRerankR = all)
    val bruteArm = Similarity.bruteForceTopKBatch(corpus, probes,
      "vec_id", "embedding", k = 5)
    assert(canon(pqArm) == canon(bruteArm))
  }

  test("an empty compressed pair falls back to the raw routes; a lone half is refused") {
    val emptyCb = cb.limit(0)
    val got = Similarity.annTopKAuto(corpus, probes, index, "vec_id", "embedding",
      k = 3, nProbe = 2, screening = true,
      pqIndex = Some(pqIx.limit(0)), pqCodebook = Some(emptyCb))
    assert(!plan(got).contains("pq_adc"), "empty codebook must fall back to raw IVF")
    assert(canon(got) == canon(Similarity.ivfIndexProbeAuto(
      probes, index, "vec_id", "embedding", k = 3, nProbe = 2)))
    val e = intercept[IllegalArgumentException] {
      Similarity.annTopKAuto(corpus, probes, index, "vec_id", "embedding",
        k = 3, nProbe = 2, screening = true, pqIndex = Some(pqIx))
    }
    assert(e.getMessage.contains("travel together"))
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

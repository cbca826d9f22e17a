package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Physical-plan regression guards: the similarity/dedup operators must
  * stay equi-join-shaped — a BroadcastNestedLoopJoin or CartesianProduct
  * appearing in these plans is the difference between O(corpus) and
  * O(corpus²) at scale, regardless of what the row counts say at test SF.
  */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.5f, 0.2f)),
    (2L, Array(0.9f, 0.1f, 0.4f, 0.2f)),
    (3L, Array(-1.0f, 0.3f, 0.0f, 0.7f)),
    (4L, Array(0.0f, -0.2f, 0.8f, 0.1f))
  ).toDF("vec_id", "embedding")

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different text body here now")
  ).toDF("doc_id", "text")

  private def physicalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def assertNoQuadraticJoin(plan: String, what: String): Unit = {
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"$what plan contains BroadcastNestedLoopJoin")
    assert(!plan.contains("CartesianProduct"),
      s"$what plan contains CartesianProduct")
  }

  test("nearDupPairsLsh candidate generation is equi-join only") {
    val df = Similarity.nearDupPairsLsh(vecs, "vec_id", "embedding",
      minMicro = 400000L, planes = 3, dims = 4, tables = 6)
    assertNoQuadraticJoin(physicalPlan(df), "nearDupPairsLsh")
    assert(df.count() >= 1) // near-identical vectors 1 and 2 found
  }

  test("annTopK candidate generation is equi-join only") {
    val df = Similarity.annTopK(vecs, "vec_id", "embedding",
      k = 2, planes = 2, dims = 4, queryFilter = col("vec_id") === 1L)
    assertNoQuadraticJoin(physicalPlan(df), "annTopK")
  }

  test("jaccard, minhash and simhash pair generation are equi-join only") {
    for ((name, df) <- Seq(
        "jaccardPairs" -> Dedup.jaccardPairs(docs, "doc_id", "text",
          maxShingleDocFreq = Some(100)),
        "minhashLshPairs" -> Dedup.minhashLshPairs(docs, "doc_id", "text"),
        "simhashPairs" -> Dedup.simhashPairs(docs, "doc_id", "text")))
      assertNoQuadraticJoin(physicalPlan(df), name)
  }

  test("jaccard doc-frequency cap is a no-op on low-frequency data") {
    // every shingle here occurs in ≤2 docs, far under the cap — the skew
    // guard must not change a single pair or similarity value
    val uncapped = Dedup.jaccardPairs(docs, "doc_id", "text").collect().map(_.toSeq).toSet
    val capped = Dedup.jaccardPairs(docs, "doc_id", "text",
      maxShingleDocFreq = Some(100)).collect().map(_.toSeq).toSet
    assert(capped == uncapped)
    assert(uncapped.nonEmpty) // docs 1 and 2 share most shingles
  }

  test("quantizeInt8: values bounded, dequantize error within half a step, zero vectors excluded") {
    val withZero = vecs.unionByName(
      Seq((9L, Array(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"))
    val q = Similarity.quantizeInt8(withZero, "vec_id", "embedding")
    val rows = q.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(!rows.exists(_._1 == 9L), "zero vector must be excluded")
    assert(rows.map(_._1).toSet == Set(1L, 2L, 3L, 4L))
    assert(rows.forall(r => r._3 >= -127 && r._3 <= 127))
    // the max-abs dim quantizes to exactly +/-127
    assert(rows.filter(_._1 == 3L).map(_._3).min == -127)
    // dequantized value stays within half a quantization step of the input
    val orig = withZero.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    rows.foreach { case (id, dim, qv, scaleMicro) =>
      val scale = scaleMicro / 1e6
      val err = math.abs(qv * scale - orig(id)(dim))
      assert(err <= scale / 2 + 1e-6, s"id=$id dim=$dim err=$err scale=$scale")
    }
  }

  test("multi-table LSH recall beats single-table at equal cosine") {
    val single = Similarity.nearDupPairsLsh(vecs, "vec_id", "embedding",
      minMicro = 100000L, planes = 3, dims = 4, tables = 1).count()
    val multi = Similarity.nearDupPairsLsh(vecs, "vec_id", "embedding",
      minMicro = 100000L, planes = 3, dims = 4, tables = 8).count()
    assert(multi >= single)
  }
}

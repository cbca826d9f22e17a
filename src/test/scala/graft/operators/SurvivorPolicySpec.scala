package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SurvivorPolicySpec extends SparkSpec {
  import spark.implicits._

  // Two engineered near-dup clusters plus singletons. Docs 1/2/3 are
  // one chain (1~2, 2~3 under 3-shingle MinHash at minAgree=8: shared
  // long prefix); docs 10/11 another pair; 20/21 unrelated singletons.
  private val base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " +
    "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega " +
    "aleph bet gimel dalet he vav zayin het tet yod")
  private def corpus = Seq(
    (1L, s"$base one", 30L),
    (2L, s"$base two", 99L),  // best-by-score in cluster {1,2,3}
    (3L, s"$base three", 50L),
    (10L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed", 7L),
    (11L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do", 7L), // tie → min id
    (20L, "completely different text about spark catalyst optimizers", 1L),
    (21L, "another unrelated document concerning parquet row groups", 2L)
  ).toDF("doc_id", "text", "score")

  test("keep-best policy: max score survives, ties break to the smaller id") {
    val kept = Dedup.nearDupSurvivorsBy(corpus, "doc_id", "text", col("score"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(2L) && !kept.contains(1L) && !kept.contains(3L),
      s"cluster {1,2,3} must collapse to the max-score member 2, got $kept")
    assert(kept.contains(10L) && !kept.contains(11L),
      s"score tie in {10,11} must break to the smaller id, got $kept")
    assert(kept.contains(20L) && kept.contains(21L), "singletons always survive")
  }

  test("constant score degenerates to the min-id policy (nearDupSurvivors)") {
    val byPolicy = Dedup.nearDupSurvivorsBy(corpus, "doc_id", "text", lit(1))
      .select("doc_id").as[Long].collect().toSet
    val minId = Dedup.nearDupSurvivors(corpus, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(byPolicy == minId)
  }

  test("no near-dups: the corpus passes through untouched") {
    val solo = corpus.filter(col("doc_id") >= 20L)
    val kept = Dedup.nearDupSurvivorsBy(solo, "doc_id", "text", col("score"))
    assertSameRows(kept, solo)
  }

  // ----------------------------------- semantic (embedding-cluster) dedup

  // Engineered vector corpus: {1,2,3} EXACT scalar multiples (cos = 1),
  // {10,11} another collinear pair on an orthogonal axis, 20/21
  // isolated directions. Cosine is scale-invariant, so every member of
  // a collinear family scores every candidate centroid identically —
  // no centroid pick can split a family across cells.
  private def vecs = Seq(
    (1L, Array(1.0f, 0.5f, 0f, 0f), 30),
    (2L, Array(2.0f, 1.0f, 0f, 0f), 99), // best-by-score in {1,2,3}
    (3L, Array(4.0f, 2.0f, 0f, 0f), 50),
    (10L, Array(0f, 0f, 1.0f, 3.0f), 7),
    (11L, Array(0f, 0f, 2.0f, 6.0f), 7), // tie → min id
    (20L, Array(0f, -1.0f, 1.0f, 0f), 1),
    (21L, Array(-1.0f, 0f, 0f, 1.0f), 2)
  ).toDF("vec_id", "embedding", "label")

  test("semanticSurvivors: within-cell cosine clusters collapse; keep-best honors the score") {
    val minId = Similarity.semanticSurvivors(vecs, "vec_id", "embedding",
        nCells = 3, minMicro = 990000L)
      .select("vec_id").as[Long].collect().toSet
    assert(minId == Set(1L, 10L, 20L, 21L), s"min-id policy: got $minId")
    val best = Similarity.semanticSurvivors(vecs, "vec_id", "embedding",
        nCells = 3, minMicro = 990000L, scoreBy = Some(col("label")))
      .select("vec_id").as[Long].collect().toSet
    assert(best == Set(2L, 10L, 20L, 21L), s"keep-best policy: got $best")
  }

  test("law: where lexical and semantic clusters coincide, the two dedups agree") {
    // one embedding per doc, collinear exactly for the lexical near-dup
    // clusters {1,2,3} and {10,11} — the SemDeDup pass and the MinHash
    // pass must collapse to the SAME survivor set under the same policy
    val docs = corpus
    val emb = vecs.withColumnRenamed("vec_id", "doc_id")
    val lex = Dedup.nearDupSurvivorsBy(docs, "doc_id", "text", col("score"))
      .select("doc_id").as[Long].collect().toSet
    val sem = Similarity.semanticSurvivors(emb, "doc_id", "embedding",
        nCells = 3, minMicro = 990000L, scoreBy = Some(col("label")))
      .select("doc_id").as[Long].collect().toSet
    assert(lex == sem, s"lexical $lex != semantic $sem")
  }

  test("semanticSurvivors: zero-norm vectors never pair and always survive") {
    val withZero = vecs.unionByName(Seq(
      (30L, Array(0f, 0f, 0f, 0f), 5)).toDF("vec_id", "embedding", "label"))
    val kept = Similarity.semanticSurvivors(withZero, "vec_id", "embedding",
        nCells = 3, minMicro = 990000L)
      .select("vec_id").as[Long].collect().toSet
    assert(kept.contains(30L))
    assert(kept == Set(1L, 10L, 20L, 21L, 30L), s"got $kept")
  }

  test("semanticSurvivorsAuto: auto cell count equals the explicit form; boundaries exact") {
    assert(Similarity.semanticCellsAuto(0) == 1)
    assert(Similarity.semanticCellsAuto(512) == 1)
    assert(Similarity.semanticCellsAuto(513) == 2)
    assert(Similarity.semanticCellsAuto(1000000, 512) == 1954)
    val auto = Similarity.semanticSurvivorsAuto(vecs, "vec_id", "embedding",
        minMicro = 990000L, targetCellRows = 3)
      .select("vec_id").as[Long].collect().toSet
    val explicit = Similarity.semanticSurvivors(vecs, "vec_id", "embedding",
        nCells = 3, minMicro = 990000L) // 7 rows / 3 per cell -> 3 cells
      .select("vec_id").as[Long].collect().toSet
    assert(auto == explicit)
    // knownRows skips the sizing count but must not change the answer
    val known = Similarity.semanticSurvivorsAuto(vecs, "vec_id", "embedding",
        minMicro = 990000L, targetCellRows = 3, knownRows = 7L)
      .select("vec_id").as[Long].collect().toSet
    assert(known == explicit)
  }
}

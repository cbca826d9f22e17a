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
}

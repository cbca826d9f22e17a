package graft

import java.nio.file.Files

/** Empty-input robustness sweep: at cluster scale, empty slices are
  * routine — a date partition with no data, a filter that matches
  * nothing, the first run of an incremental pipeline. Every oracle
  * query must tolerate a dataset whose tables are all EMPTY (correct
  * schema, zero rows) without throwing: construction-time sizing counts,
  * eager checkpoints, convergence loops and gate aggregations all have
  * degenerate-input paths that nothing else exercises.
  *
  * (Found at introduction: q68's direct `lshAutoPlanes(corpus.count())`
  * bubbled the positivity require on an empty corpus — the same edge
  * `nearDupPairsLshAuto` already guarded.)
  */
class EmptyInputSpec extends SparkSpec {

  test("every oracle query runs on all-empty tables") {
    val dir = Files.createTempDirectory("graft-empty").toString
    val src = "/root/testdata/sf0.001"
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    val failures = scala.collection.mutable.ListBuffer[String]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try fn(spark, dir).collect()
      catch { case e: Throwable =>
        failures += s"$name: ${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).linesIterator.take(1).mkString.take(140)
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries fail on empty input:\n${failures.mkString("\n")}")
  }

  test("empty corpus: IVF build, semantic dedup and span dedup construct and run") {
    import spark.implicits._
    val noVecs = Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label")
    // construction must not throw (q78's bootstrap constructs the build
    // BEFORE its isEmpty check), and the run yields the empty relation
    val ix = graft.operators.Similarity.ivfIndex(noVecs, "vec_id", "embedding", 8, 4)
    assert(ix.isEmpty)
    assert(graft.operators.Similarity.semanticSurvivors(
      noVecs, "vec_id", "embedding", nCells = 4, minMicro = 900000L).isEmpty)
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.operators.Boilerplate.stripRepeatedSpans(
      noDocs, "doc_id", "text", "kept", 4, 2).isEmpty)
    assert(graft.operators.Boilerplate.stripRepeatedSpansKeepFirst(
      noDocs, "doc_id", "text", "kept", 4, 2).isEmpty)
    assert(graft.operators.Temporal.rollingActive(
      Seq.empty[(Long, Long)].toDF("u", "ts"), "u", "ts").isEmpty)
  }
}

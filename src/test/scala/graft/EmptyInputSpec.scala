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
}

package graft

import java.nio.file.{Files, Paths}

/** Write `.explain("formatted")` snapshots for the optimization-round
  * plan deliverables: `Test/runMain graft.PlanSnap <tag> q135_pagerank ...`
  * writes `plans/r18/<query>_<tag>.txt` for each named query (tag =
  * before/after). Uses the engine session posture (GraftSession) at the
  * bench core count so plan shapes match what Bench runs.
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val tag = args.head
    val names = args.tail.toSeq
    val spark = GraftSession.builder("plansnap",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Files.createDirectories(Paths.get("plans/r18"))
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/r18/${name}_$tag.txt"), txt)
      println(s"wrote plans/r18/${name}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}

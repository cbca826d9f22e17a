package graft
/** Ad-hoc query inspection: print the first rows of named queries at an
  * optional sfDir (default sf0.01). Usage: Test/runMain graft.ShowOne
  * [/root/testdata/sfX] q49_approx_distinct ... */
object ShowOne {
  def main(args: Array[String]): Unit = {
    val (dir, names) = args.toList match {
      case d :: rest if d.startsWith("/") => (d, rest)
      case rest => ("/root/testdata/sf0.01", rest)
    }
    val spark = GraftSession.builder("showone", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      println(s"===== $name @ $dir =====")
      SparkEntry.queries(name)(spark, dir).show(50, truncate = false)
    }
    spark.stop()
  }
}

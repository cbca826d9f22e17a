package graft
/** Ad-hoc row counts of named queries at an sfDir. */
object CountOne {
  def main(args: Array[String]): Unit = {
    val (dir, names) = args.toList match {
      case d :: rest if d.startsWith("/") => (d, rest)
      case rest => ("/root/testdata/sf0.01", rest)
    }
    val spark = GraftSession.builder("countone",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names)
      println(s"COUNT $name @ $dir = ${SparkEntry.queries(name)(spark, dir).count()}")
    spark.stop()
  }
}

package graft
/** Ad-hoc subset correctness dump: run Verify.run for the named queries
  * only, then replay the driver's DuckDB compare locally with
  * `python3 scripts/check.py <sfDir> <outDir>`. Usage:
  * Test/runMain graft.VerifyOne [/root/testdata/sfX] [outDir] q78... */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val (dir, rest) = args.toList match {
      case d :: r if d.startsWith("/root/testdata") => (d, r)
      case r => ("/root/testdata/sf0.01", r)
    }
    val (outDir, names) = rest match {
      case o :: r if o.startsWith("/") => (o, r.toSet)
      case r => ("/tmp/graft_verify_subset", r.toSet)
    }
    val spark = GraftSession.builder("verifyone",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def keep(k: String) = names.isEmpty || names(k)
    Verify.run(spark, dir, outDir,
      SparkEntry.queries.filter(kv => keep(kv._1)),
      SparkEntry.oracleSql.filter(kv => keep(kv._1)))
    spark.stop()
  }
}

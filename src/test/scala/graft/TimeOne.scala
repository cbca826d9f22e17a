package graft
/** Ad-hoc per-query timing at sf0.1: noop-sink each named query twice
  * (cold, warm) and print seconds. Usage:
  * Test/runMain graft.TimeOne [/root/testdata/sfX] q27_minhash_lsh ... */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val (dir, names) = args.toList match {
      case d :: rest if d.startsWith("/") => (d, rest)
      case rest => ("/root/testdata/sf0.1", rest)
    }
    val spark = GraftSession.get("timeone")
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-24s cold=${times(0)}%.2fs warm=${times(1)}%.2fs")
    }
    spark.stop()
  }
}

package graft
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("entry-smoke", "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRY rows=$n")
    require(n > 0, "flagship entry returned zero rows")
    spark.stop()
  }
}

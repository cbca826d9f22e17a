package graft

import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Evidence for the engine's standing skew rule ("shuffled joins rely
  * on AQE's skew split; explicit salting is not an operator here" —
  * asserted since the r10 temporal work, measured now): a Zipf-shaped
  * fact side joined to a non-broadcastable dim, hot key owning ~40% of
  * the corpus, sort-merge path forced (broadcast threshold off). Cells:
  * AQE skewJoin ON vs OFF, wall + max single-task duration + tasks in
  * the join stage. The max-task number is the one that matters at
  * 1000 executors: an unsplit hot partition is a straggler the whole
  * stage waits for.
  *
  * Usage: Test/runMain graft.SkewStudy [dir]
  */
object SkewStudy {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("scaledata/sf3")
    val spark = GraftSession.builder("skew-study",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // force the shuffled path: the dim must not broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    val maxTask = new java.util.concurrent.atomic.AtomicLong(0)
    val nTasks = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val d = t.taskInfo.duration
          nTasks.incrementAndGet()
          var cur = maxTask.get()
          while (d > cur && !maxTask.compareAndSet(cur, d)) cur = maxTask.get()
        }
      })

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    // Zipf head: half the fact rows on ONE key, the rest over 100k
    val fact = li.select(
      when(Hashing.h60(concat(lit("skew:"), col("l_orderkey").cast("string"),
          lit(":"), col("l_linenumber").cast("string"))) % 100 < 50, lit(7L))
        .otherwise(Hashing.h60(concat(lit("key:"),
          col("l_orderkey").cast("string"))) % 100000L).as("fk"),
      col("l_extendedprice").as("amount"))
    val dim = spark.range(100001)
      .select(col("id").as("fk"), (col("id") * 37 % 1000).as("grp"))
    // materialize the fact BEFORE the cells: the md5-heavy key
    // synthesis is fixture construction, not the operation under test —
    // unmaterialized, its scan tasks dominate maxTask in both arms and
    // bury the join-stage straggler the study exists to expose
    val factM = fact.localCheckpoint(true)

    // AQE's skew thresholds are sized for production partitions
    // (256 MB); at study scale the hot partition is ~25 MB, so the
    // thresholds scale DOWN with the data the way the defaults relate
    // to real 100 TB shuffles — the mechanism under test is the split,
    // not the constant
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")

    def cell(skewJoin: Boolean): (Double, Double, Long) = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoin.toString)
      maxTask.set(0); nTasks.set(0)
      val t0 = System.nanoTime()
      val q = factM.join(dim, Seq("fk"))
        .groupBy("grp").agg(sum("amount").as("amt"), count(lit(1)).as("n"))
      q.collect()
      val wall = (System.nanoTime() - t0) / 1e9
      val split = q.queryExecution.executedPlan.toString
        .split("Initial Plan").head.contains("skew=true")
      require(split == skewJoin,
        s"cell skewJoin=$skewJoin but plan skew=$split — the study is not " +
          "measuring the mechanism it claims to")
      (wall, maxTask.get() / 1e3, nTasks.get())
    }
    cell(true) // session warm-up (scan footers, codegen) — discarded
    val results = Seq(false, true, false, true).map(s => s -> cell(s))
    results.foreach { case (s, (w, m, t)) =>
      println(f"run skewJoin=$s%-5s wall=$w%6.2f s maxTask=$m%6.2f s tasks=$t")
    }
    for (skewJoin <- Seq(true, false)) {
      val runs = results.filter(_._1 == skewJoin).map(_._2)
      val best = runs.minBy(_._1)
      println(f"skewJoin=$skewJoin%-5s wall=${best._1}%6.2f s " +
        f"maxTask=${best._2}%6.2f s tasks=${best._3} (min of ${runs.size})")
    }
    spark.stop()
  }
}

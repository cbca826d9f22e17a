package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** SCALING.md power-law addendum driver: generates Zipf-df document
  * corpora ([[ScaleGen.documentsPowerLaw]]) and measures the two EXACT
  * Jaccard pair operators against each other — the raw shared-shingle
  * join ([[graft.operators.Dedup.jaccardPairs]], uncapped so both are
  * lossless) vs AllPairs/PPJoin prefix filtering
  * ([[graft.operators.Dedup.jaccardPairsPrefix]]) — asserting equal
  * output and reporting executor-CPU core-seconds (the throttle-immune
  * metric, per SCALING.md discipline).
  *
  * Two corpus shapes per run: PURE Zipf free text, and Zipf text with a
  * boilerplate fraction (verbatim template sentences across docs — the
  * repeated-header df mass of crawl text, which is the raw join's df²
  * failure mode and the prefix filter's design case).
  *
  * Usage: Test/runMain graft.JaccardStudy [rows1,rows2,...] [boilerplate]
  * (defaults 5000,15000 and 0.3).
  */
object JaccardStudy {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("5000,15000")
      .split(",").map(_.trim.toLong).toSeq
    val bp = if (args.length > 1) args(1).toDouble else 0.3
    val spark = GraftSession.builder("jaccard-study",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup

    val cpu = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) cpu.add(m.executorCpuTime)
      }
    })
    def measure(f: => Long): (Long, Double) = {
      Thread.sleep(300); cpu.reset()
      val out = f
      Thread.sleep(300)
      (out, cpu.sum() / 1e9)
    }

    // untimed warm-up: codegen + JIT for both plan shapes, so the first
    // measured size is not the cold one
    {
      val w = ScaleGen.documentsPowerLaw(spark, 1000).localCheckpoint(true)
      Dedup.jaccardPairs(w, "doc_id", "text").count()
      Dedup.jaccardPairsPrefix(w, "doc_id", "text").count()
    }

    for (shape <- Seq("pure" -> 0.0, "boilerplate" -> bp); rows <- sizes) {
      val (label, frac) = shape
      // materialize the corpus so neither operator pays generation cost
      val docs = ScaleGen.documentsPowerLaw(spark, rows, boilerplate = frac)
        .localCheckpoint(true)
      val (rawPairs, rawCpu) = measure(
        Dedup.jaccardPairs(docs, "doc_id", "text").count())
      val (prefPairs, prefCpu) = measure(
        Dedup.jaccardPairsPrefix(docs, "doc_id", "text").count())
      require(rawPairs == prefPairs,
        s"exact forms disagree at $rows docs ($label): raw=$rawPairs prefix=$prefPairs")
      println(f"STUDY $label%-12s rows=$rows%-7d pairs=$rawPairs%-6d " +
        f"raw_cpu=$rawCpu%8.2f core-s  prefix_cpu=$prefCpu%8.2f core-s  " +
        f"prefix/raw=${prefCpu / rawCpu}%5.2f")
      // NOTE: localCheckpoint blocks are not released by unpersist();
      // the six corpora total well under 100 MB, so they simply ride
      // out the run (measured numbers are CPU, unaffected by storage)
    }
    spark.stop()
  }
}

package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query CPU accounting: wall time is unreliable on burst-throttled
  * hosts, so optimization targets are picked by `executorCpuTime` (actual
  * CPU nanoseconds across all tasks) + deserialize/result times.
  *
  * Usage: Test/runMain graft.CpuProfile [sfDir] q02_agg_pricing ...
  * (no args = all queries).
  */
object CpuProfile {
  def main(args: Array[String]): Unit = {
    val (dir, names) = args.toList match {
      case d :: rest if d.startsWith("/") => (d, rest)
      case rest => ("/root/testdata/sf0.1", rest)
    }
    // the engine's session posture (GraftSession), so CPU numbers are
    // comparable with Bench and with the plans users actually get
    val spark = GraftSession.builder("cpuprofile", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpu = new LongAdder; val run = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) { cpu.add(m.executorCpuTime); run.add(m.executorRunTime) }
      }
    })
    val all = if (names.nonEmpty) names else SparkEntry.queries.keys.toSeq.sorted
    var totalCpu = 0.0
    for (name <- all) {
      cpu.reset(); run.reset()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; give the bus a moment
      Thread.sleep(300)
      val c = cpu.sum() / 1e9
      totalCpu += c
      println(f"CPU $name%-24s cpu=$c%8.2f core-s  taskwall=${run.sum() / 1e3}%8.1f s  wall=$wall%6.2f s")
    }
    println(f"CPU TOTAL cpu=$totalCpu%.1f core-s")
    spark.stop()
  }
}

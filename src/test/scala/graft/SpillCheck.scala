package graft
import java.util.concurrent.atomic.LongAdder
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
object SpillCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("scaledata/sf10")
    val q = args.drop(1).headOption.getOrElse("q32_clean_battery")
    val spark = GraftSession.builder("spillcheck", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpu = new LongAdder; val mem = new LongAdder; val disk = new LongAdder; val gc = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) { cpu.add(m.executorCpuTime); mem.add(m.memoryBytesSpilled); disk.add(m.diskBytesSpilled); gc.add(m.jvmGCTime) }
      }
    })
    (1 to 2).foreach { p =>
      cpu.reset(); mem.reset(); disk.reset(); gc.reset()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
      Thread.sleep(500)
      println(f"[spill] $q pass$p wall=${(System.nanoTime()-t0)/1e9}%.1f cpu=${cpu.sum/1e9}%.1f core-s gc=${gc.sum/1e3}%.1f s memSpill=${mem.sum/1e6}%.0f MB diskSpill=${disk.sum/1e6}%.0f MB")
    }
    spark.stop()
  }
}

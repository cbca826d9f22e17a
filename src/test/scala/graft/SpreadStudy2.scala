package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Second Spread decomposition: serial vs keyed-spread on the q119
  * (span strip) and q58 (profile) shapes, with run/GC split so CPU
  * inflation can be attributed. Usage: Test/runMain graft.SpreadStudy2
  */
object SpreadStudy2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("spreadstudy2", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cpu = new LongAdder; val run = new LongAdder; val gc = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) { cpu.add(m.executorCpuTime); run.add(m.executorRunTime); gc.add(m.jvmGCTime) }
      }
    })
    def phase(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      for (i <- 1 to 2) {
        Thread.sleep(800); cpu.reset(); run.reset(); gc.reset()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(800)
        println(f"PHASE $name%-30s p$i cpu=${cpu.sum / 1e9}%7.2f run=${run.sum / 1e3}%7.2f gc=${gc.sum / 1e3}%6.2f wall=$wall%6.2f")
      }
    }
    val t = Tables(spark, dir)
    def docs = t.documents.select("doc_id", "text")
    def spanStrip(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Boilerplate.stripRepeatedSpans(df, "doc_id", "text",
          "__kept", k = 12, minDocs = 2)
        .select(col("doc_id"), col("n_tokens"), col("n_removed"))
    phase("q119 serial")(spanStrip(docs))
    phase("q119 byKey32")(spanStrip(docs.repartition(32, col("doc_id"))))
    phase("q119 byKey8")(spanStrip(docs.repartition(8, col("doc_id"))))
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    def ords = t.orders.select(cols.map(col): _*)
    def prof(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Quality.profile(df, cols)
    phase("q58 serial")(prof(ords))
    phase("q58 byKey32")(prof(ords.repartition(32, col("o_orderkey"))))
    phase("q58 byKey8")(prof(ords.repartition(8, col("o_orderkey"))))
    spark.stop()
  }
}

package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Width sweep on the q58/q119 shapes. Usage: Test/runMain graft.SpreadStudy4 */
object SpreadStudy4 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("spreadstudy4", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cpu = new LongAdder; val tasks = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) { cpu.add(m.executorCpuTime); tasks.add(1) }
      }
    })
    def phase(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      var bc = Double.MaxValue; var bw = Double.MaxValue; var tk = 0L
      for (_ <- 1 to 2) {
        Thread.sleep(600); cpu.reset(); tasks.reset()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(600)
        bc = math.min(bc, cpu.sum / 1e9); bw = math.min(bw, wall); tk = tasks.sum
      }
      println(f"PHASE $name%-22s cpu=$bc%7.2f wall=$bw%6.2f tasks=$tk%5d")
    }
    val t = Tables(spark, dir)
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    def ords = t.orders.select(cols.map(col): _*)
    def prof(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Quality.profile(df, cols)
    for (p <- Seq(0, 4, 8, 16, 32))
      phase(s"q58 p=$p")(if (p == 0) prof(ords) else prof(ords.repartition(p, col("o_orderkey"))))
    def docs = t.documents.select("doc_id", "text")
    def spanStrip(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Boilerplate.stripRepeatedSpans(df, "doc_id", "text",
          "__kept", k = 12, minDocs = 2)
        .select(col("doc_id"), col("n_tokens"), col("n_removed"))
    for (p <- Seq(0, 8, 16, 32))
      phase(s"q119 p=$p")(if (p == 0) spanStrip(docs) else spanStrip(docs.repartition(p, col("doc_id"))))
    spark.stop()
  }
}

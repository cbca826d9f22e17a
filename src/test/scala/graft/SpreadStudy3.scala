package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Width sweep for the Spread target: the FLAC-synthesis (q171) and
  * z-order (q115) shapes at 1/4/8/16/32 partitions.
  * Usage: Test/runMain graft.SpreadStudy3
  */
object SpreadStudy3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("spreadstudy3", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cpu = new LongAdder; val run = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) { cpu.add(m.executorCpuTime); run.add(m.executorRunTime) }
      }
    })
    def phase(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      var bc = Double.MaxValue; var bw = Double.MaxValue
      for (_ <- 1 to 2) {
        Thread.sleep(600); cpu.reset(); run.reset()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(600)
        bc = math.min(bc, cpu.sum / 1e9); bw = math.min(bw, wall)
      }
      println(f"PHASE $name%-26s cpu=$bc%7.2f wall=$bw%6.2f (min of 2)")
    }
    val t = Tables(spark, dir)
    def flacQ(parts: Int) = {
      val base0 = t.documents.select("doc_id")
      val base = if (parts <= 0) base0 else base0.repartition(parts, col("doc_id"))
      def be(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        lpad(hex(v), 2, "0")
      val nFr = col("doc_id") % 600 + 20
      val ch = (col("doc_id") % 2 + 1).cast("int")
      val mult = when(col("doc_id") % 7 === 3, lit(0L)).otherwise(lit(1L))
      val nTot = (nFr * ch).cast("int")
      val dataHex = array_join(
        transform(sequence(lit(0), nTot - 1), tt => {
          val u = (col("doc_id") * 97 + tt * 31 * mult) % 65536
          concat(be(u.bitwiseAND(lit(255L))), be(shiftright(u, 8)))
        }), "")
      val flac = graft.operators.Multimodal.flacEncodePcm(unhex(dataHex), ch, lit(8000))
      val bytes = when(col("doc_id") % 10 === 7, flac.substr(1, 30)).otherwise(flac)
      val f = graft.operators.Multimodal.flacPcmFeatures(bytes, 4)
      base.select(col("doc_id"), element_at(f, 1).as("f0"))
    }
    for (p <- Seq(0, 4, 8, 16, 32)) phase(s"flac p=$p")(flacQ(p))
    import graft.functions.ZOrder
    def zQ(parts: Int) = {
      val base0 = t.lineitem.select("l_orderkey", "l_partkey", "l_suppkey")
      val base = if (parts <= 0) base0 else base0.repartition(parts, col("l_orderkey"))
      base.withColumn("zval", ZOrder.zorder3(
          ZOrder.bucket21(col("l_orderkey").cast("long"), 1L, 600000L),
          ZOrder.bucket21(col("l_partkey").cast("long"), 1L, 20000L),
          ZOrder.bucket21(col("l_suppkey").cast("long"), 1L, 1000L)))
        .groupBy(expr("zval div 144115188075855872").cast("long").as("z_region"))
        .agg(count(lit(1)).as("n_rows"))
    }
    for (p <- Seq(0, 4, 8, 16, 32)) phase(s"zorder3 p=$p")(zQ(p))
    spark.stop()
  }
}

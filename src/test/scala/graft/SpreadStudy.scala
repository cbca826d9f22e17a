package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Decompose the Spread (widen-before-heavy-exprs) cost: serial vs
  * round-robin repartition vs hash-key repartition, on the q61 checksum
  * shape. Usage: Test/runMain graft.SpreadStudy [sfDir]
  */
object SpreadStudy {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("spreadstudy", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cpu = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) cpu.add(m.executorCpuTime)
      }
    })
    def phase(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      // warm once, then measure twice
      df.write.format("noop").mode("overwrite").save()
      for (i <- 1 to 2) {
        Thread.sleep(800); cpu.reset()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(800)
        println(f"PHASE $name%-34s pass$i cpu=${cpu.sum / 1e9}%7.2f core-s  wall=$wall%6.2f s")
      }
    }
    val cols = Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_shipdate")
    def base = Tables(spark, dir).lineitem.select(cols.map(col): _*)
    def sum(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Quality.tableChecksum(df, cols)
    phase("checksum serial")(sum(base))
    phase("checksum roundrobin32")(sum(base.repartition(32)))
    phase("checksum hash(orderkey)32")(sum(base.repartition(32, col("l_orderkey"))))
    phase("checksum roundrobin8")(sum(base.repartition(8)))
    // the q115 zorder shape
    import graft.functions.ZOrder
    def z(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("zval", ZOrder.zorder3(
        ZOrder.bucket21(col("l_orderkey").cast("long"), 1L, 600000L),
        ZOrder.bucket21(col("l_partkey").cast("long"), 1L, 20000L),
        ZOrder.bucket21(col("l_suppkey").cast("long"), 1L, 1000L)))
      .groupBy(expr("zval div 144115188075855872").cast("long").as("z_region"))
      .agg(count(lit(1)).as("n_rows"))
    def zbase = Tables(spark, dir).lineitem.select("l_orderkey", "l_partkey", "l_suppkey")
    phase("zorder3 serial")(z(zbase))
    phase("zorder3 roundrobin32")(z(zbase.repartition(32)))
    phase("zorder3 hash(orderkey)32")(z(zbase.repartition(32, col("l_orderkey"))))
    spark.stop()
  }
}

package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Width sweep on the remaining serial-ish shapes: rollup (q16), cube
  * (q117), unpivot (q116), percentiles (q46), jaccard pairs (q26),
  * curate pipeline gates (q57 prefix). Usage: Test/runMain graft.SpreadStudy5
  */
object SpreadStudy5 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("spreadstudy5", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cpu = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) cpu.add(m.executorCpuTime)
      }
    })
    def phase(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      var bc = Double.MaxValue; var bw = Double.MaxValue
      for (_ <- 1 to 2) {
        Thread.sleep(600); cpu.reset()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(600)
        bc = math.min(bc, cpu.sum / 1e9); bw = math.min(bw, wall)
      }
      println(f"PHASE $name%-26s cpu=$bc%7.2f wall=$bw%6.2f (min2)")
    }
    val t = Tables(spark, dir)
    def li(parts: Int, cols: String*) = {
      val b = t.lineitem.select(cols.map(col): _*)
      if (parts <= 0) b else b.repartition(parts, col("l_orderkey"))
    }
    def rollupQ(p: Int) = li(p, "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)")).as("revenue"),
        count(lit(1)).as("n_items"))
    for (p <- Seq(0, 8, 16)) phase(s"rollup p=$p")(rollupQ(p))
    def cubeQ(p: Int) = li(p, "l_returnflag", "l_linestatus", "l_extendedprice")
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum(col("l_extendedprice").cast("decimal(18,2)")).as("total"))
    for (p <- Seq(0, 8, 16)) phase(s"cube p=$p")(cubeQ(p))
    def unpivotQ(p: Int) = li(p, "l_returnflag", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .unpivot(Array(col("l_returnflag")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "measure", "v")
      .groupBy("l_returnflag", "measure")
      .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(18,2)")).as("total"))
    for (p <- Seq(0, 8, 16)) phase(s"unpivot p=$p")(unpivotQ(p))
    def pctQ(p: Int) = {
      val b = t.orders.select("o_orderpriority", "o_totalprice")
      val bb = if (p <= 0) b else b.repartition(p, col("o_totalprice"))
      bb.groupBy("o_orderpriority")
        .agg(percentile(col("o_totalprice"), lit(0.5)).as("p50"))
    }
    for (p <- Seq(0, 8, 16)) phase(s"pct p=$p")(pctQ(p))
    def jacQ(p: Int) = {
      val b = t.documents.select("doc_id", "text")
      val bb = if (p <= 0) b else b.repartition(p, col("doc_id"))
      graft.operators.Dedup.jaccardPairs(bb, "doc_id", "text", n = 3,
        minPermille = 500, maxShingleDocFreq = Some(100))
    }
    for (p <- Seq(0, 8, 16)) phase(s"jaccard p=$p")(jacQ(p))
    spark.stop()
  }
}

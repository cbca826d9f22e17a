package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Decompose q135_pagerank's CPU: derivation vs checkpoint vs per-round
  * cost. Usage: Test/runMain graft.GraphStudy [sfDir]
  */
object GraphStudy {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("graphstudy", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpu = new LongAdder; val tasks = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) { cpu.add(m.executorCpuTime); tasks.add(1) }
      }
    })
    def phase[T](name: String)(f: => T): T = {
      Thread.sleep(1500); cpu.reset(); tasks.reset()
      val t0 = System.nanoTime(); val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500)
      println(f"PHASE $name%-28s cpu=${cpu.sum / 1e9}%8.2f core-s  tasks=${tasks.sum}%6d  wall=$wall%6.2f s")
      r
    }
    val li = Tables(spark, dir).lineitem.select("l_orderkey", "l_partkey")
    val edges = phase("derive+count") {
      val e = graft.operators.Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
        .select("src", "dst")
      println("  edges=" + e.count())
      e
    }
    val eMat = phase("checkpoint edges") { edges.localCheckpoint(true) }
    val deg = phase("outDegrees") {
      val d = graft.operators.Graph.outDegrees(eMat); d.count(); d }
    val eDeg = phase("eDeg join+repart+ckpt") {
      eMat.join(deg, "src").repartition(col("src")).localCheckpoint(true)
    }
    val nodes = phase("nodesOf+ckpt") {
      graft.operators.Graph.nodesOf(eMat).localCheckpoint(true)
    }
    var ranks = nodes.withColumn("rank", lit(1000000L))
    for (i <- 1 to 5) {
      ranks = phase(s"iteration $i") {
        val contrib = eDeg
          .join(ranks.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"), expr("rank div out_deg").as("__c"))
          .groupBy("node").agg(sum("__c").as("__s"))
        nodes.join(contrib, Seq("node"), "left")
          .select(col("node"),
            (lit(150000L) + expr("(85 * coalesce(__s, 0)) div 100")).as("rank"))
          .localCheckpoint(true)
      }
    }
    phase("final collect") { ranks.orderBy("node").collect() }

    // ---- variant B: window-degrees + persisted columnar edge relation
    val eDegB = phase("B: window eDeg persist") {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("src")
      val d = graft.operators.Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
        .select("src", "dst")
        .withColumn("out_deg", count(lit(1)).over(w))
        .persist()
      d.count(); d
    }
    val nodesB = phase("B: nodes from cached") {
      eDegB.select(col("src").as("node")).distinct()
        .union(eDegB.select(col("dst").as("node")).distinct())
        .distinct().localCheckpoint(true)
    }
    var ranksB = nodesB.withColumn("rank", lit(1000000L))
    for (i <- 1 to 5) {
      ranksB = phase(s"B: iteration $i") {
        val contrib = eDegB
          .join(ranksB.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"), expr("rank div out_deg").as("__c"))
          .groupBy("node").agg(sum("__c").as("__s"))
        ranksB.join(contrib, Seq("node"), "left")
          .select(col("node"),
            (lit(150000L) + expr("(85 * coalesce(__s, 0)) div 100")).as("rank"))
          .localCheckpoint(true)
      }
    }
    phase("B: final collect") { ranksB.orderBy("node").collect() }
    spark.stop()
  }
}

package graft

import java.util.concurrent.atomic.LongAdder
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** A/B study (r19): current prRound shape (src-checkpointed edges,
  * shuffled-hash rounds) vs adjacency-list rounds (edges grouped by src
  * ONCE; per round a node-sized join + explode + agg). Motivation: under
  * AQE, localCheckpoint loses outputPartitioning (UnknownPartitioning),
  * so every round re-exchanges the edge body despite the r18 design.
  */
object AdjStudy {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("adjstudy",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpu = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics; if (m != null) cpu.add(m.executorCpuTime) }
    })
    def timed[T](tag: String)(body: => T): T = {
      Thread.sleep(400); val c0 = cpu.sum(); val t0 = System.nanoTime()
      val r = body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      println(f"PHASE $tag%-28s wall=$wall%6.2f cpu=${(cpu.sum() - c0) / 1e9}%7.2f")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val li = Tables(spark, dir).lineitem.select("l_orderkey", "l_partkey")
    def co = graft.operators.Graph.coOccurrenceEdges(
      li, "l_orderkey", "l_partkey", minCount = 1L).select("src", "dst")
    // warm-up
    noop(co)
    graft.operators.Checkpoints.scoped(spark) {
      timed("derivation (co noop)") { noop(co) }
      // ---- current shape
      val e = timed("ckpt repartition(src)") { co.repartition(col("src")).localCheckpoint(true) }
      val deg = timed("deg ckpt") { graft.operators.Graph.outDegrees(e).localCheckpoint(true) }
      val nodes = timed("nodes ckpt") { deg.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct().localCheckpoint(true) }
      var ranks = nodes.withColumn("rank", lit(1000000L))
      timed("5 rounds CURRENT") {
        for (_ <- 1 to 5) {
          val shares = deg
            .join(ranks.withColumnRenamed("node", "src").hint("shuffle_hash"), "src")
            .select(col("src"), expr("rank div out_deg").as("__share"))
          val contrib = e.join(shares.hint("shuffle_hash"), "src")
            .select(col("dst").as("node"), col("__share").as("__c"))
            .groupBy("node").agg(sum("__c").as("__s"))
          ranks = nodes.join(contrib.hint("shuffle_hash"), Seq("node"), "left")
            .select(col("node"),
              (lit(150000L) + expr("(85 * coalesce(__s, 0)) div 100")).as("rank"))
        }
        noop(ranks)
      }
      val cur = ranks.orderBy("node").collect()
      // ---- adjacency shape
      val adj = timed("adj build (groupBy src)") {
        co.groupBy("src").agg(collect_list(col("dst")).as("__dsts"),
          count(lit(1)).as("out_deg")).localCheckpoint(true) }
      val nodes2 = timed("nodes2 ckpt") { adj.select(col("src").as("node"))
        .union(co.select(col("dst").as("node"))).distinct().localCheckpoint(true) }
      var ranks2 = nodes2.withColumn("rank", lit(1000000L))
      timed("5 rounds ADJ") {
        for (_ <- 1 to 5) {
          val contrib = adj
            .join(ranks2.withColumnRenamed("node", "src").hint("shuffle_hash"), "src")
            .select(explode(col("__dsts")).as("node"),
              expr("rank div out_deg").as("__c"))
            .groupBy("node").agg(sum("__c").as("__s"))
          ranks2 = nodes2.join(contrib.hint("shuffle_hash"), Seq("node"), "left")
            .select(col("node"),
              (lit(150000L) + expr("(85 * coalesce(__s, 0)) div 100")).as("rank"))
        }
        noop(ranks2)
      }
      val got = ranks2.orderBy("node").collect()
      println("EQUAL=" + (cur.toSeq == got.toSeq) + " n=" + cur.length)
    }
    spark.stop()
  }
}

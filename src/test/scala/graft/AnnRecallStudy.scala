package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The QUALITY side of the IVF index's cost model (SCALING.md r11):
  * recall@k against exact brute force, as a function of nProbe — the
  * cost side (probe CPU linear in probed-cell rows, partition-pruned
  * scan) was measured in r9/r10; this study pins what each probed cell
  * BUYS. One curve per scale point: recall@10 and probe CPU for
  * nProbe ∈ {1, 2, 4, 8, 16} over a 64-cell index, 500 fixed queries.
  *
  * Usage: Test/runMain graft.AnnRecallStudy [dir ...]
  */
object AnnRecallStudy {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("scaledata/sf1")
    val spark = GraftSession.builder("ann-recall-study",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val cpu = new java.util.concurrent.atomic.LongAdder
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) cpu.add(m.executorCpuTime)
        }
      })
    def quiesce(): Unit = {
      var prev = cpu.sum(); var quiet = 0; var spins = 0
      while (quiet < 20 && spins < 1200) {
        Thread.sleep(100); spins += 1
        val now = cpu.sum()
        if (now == prev) quiet += 1 else { quiet = 0; prev = now }
      }
    }

    val K = 10
    val NCELLS = 64
    println(f"${"point"}%-10s ${"nProbe"}%6s ${"recall@10"}%10s ${"probe_cpu_s"}%12s")
    for (dir <- dirs) {
      val point = dir.split('/').last
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val corpus = emb.filter(col("vec_id") % 10 =!= 0).localCheckpoint(true)
      val probes = emb.filter(col("vec_id") % 10 === 0 && col("vec_id") < 10000)
        .localCheckpoint(true)
      val nQueries = probes.count()

      // exact truth by hand: bruteForceTopK contracts queries ⊆ corpus,
      // but the recall question is probes-vs-index — disjoint sets, the
      // ingest-screen shape. Same plan shape: broadcast queries, scan
      // the corpus once, per-query top-k.
      val truth = {
        import org.apache.spark.sql.expressions.Window
        val dot = Similarity.dot _
        val q = broadcast(probes.select(col("vec_id").as("query_id"),
          col("embedding").as("q_vec")))
        val w = Window.partitionBy("query_id")
          .orderBy(col("score").desc, col("neighbor_id"))
        corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_vec"))
          .crossJoin(q)
          .withColumn("score", dot(col("q_vec"), col("c_vec")))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= K)
          .select("query_id", "neighbor_id")
          .localCheckpoint(true)
      }
      val nTruth = truth.count()

      val index = Similarity.ivfIndex(corpus, "vec_id", "embedding",
        nCells = NCELLS, dims = 64).localCheckpoint(true)

      // unmeasured warm-up probe: the first cell otherwise pays JIT +
      // codegen + checkpoint materialization (measured 6.9 CPU for the
      // cheapest cell before this)
      Similarity.ivfIndexProbe(probes, index, "vec_id", "embedding",
        k = K, nProbe = 1, nCells = NCELLS, dims = 64).count()

      // the routed front door's exact arm, same probe set: recall 1.0
      // by construction, cost = one corpus scan per batch — the anchor
      // annTopKAuto's bruteRecallThreshold trades against
      {
        var best = Double.MaxValue
        for (_ <- 1 to 2) {
          quiesce(); val c0 = cpu.sum()
          Similarity.bruteForceTopKBatch(corpus, probes, "vec_id", "embedding", K)
            .count()
          quiesce(); val c1 = cpu.sum()
          best = math.min(best, (c1 - c0) / 1e9)
        }
        println(f"$point%-10s ${"exact"}%6s ${1.0}%10.3f $best%11.2fs  (bruteForceTopKBatch)")
      }

      for (nProbe <- Seq(1, 2, 4, 8, 16)) {
        var hit = 0L; var best = Double.MaxValue
        for (_ <- 1 to 2) {
          quiesce(); val c0 = cpu.sum()
          val got = Similarity.ivfIndexProbe(probes, index, "vec_id", "embedding",
              k = K, nProbe = nProbe, nCells = NCELLS, dims = 64)
            .select(col("query_id"), col("neighbor_id"))
          hit = got.join(truth, Seq("query_id", "neighbor_id")).count()
          quiesce(); val c1 = cpu.sum()
          best = math.min(best, (c1 - c0) / 1e9)
        }
        println(f"$point%-10s $nProbe%6d ${hit.toDouble / nTruth}%10.3f $best%11.2fs" +
          (if (nProbe == 1) s"  ($nQueries queries, $nTruth truth pairs)" else ""))
      }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pq, Similarity}

/** The PQ cost/quality model (SCALING.md r13): compressed-domain ANN
  * against the exact brute-force batch and the raw-vector IVF probe, at
  * matched recall measurement. Per scale point:
  *
  *  - exact `bruteForceTopKBatch`-shaped scan: CPU (recall 1 by
  *    definition)
  *  - `pqTopKExhaustive` at 8-byte and 16-byte Lloyd codebooks:
  *    CPU + recall@10 + rerank@10 recall from an R=100 pool
  *  - raw IVF probe vs IVF-PQ probe at the same nCells/nProbe:
  *    CPU + recall@10, plus on-disk bytes of both persisted indexes
  *
  * Usage: Test/runMain graft.PqScaleStudy [dir ...]
  */
object PqScaleStudy {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("scaledata/sf1", "scaledata/sf3")
    val spark = GraftSession.builder("pq-scale-study",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

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
    def cell(f: => Long): (Long, Double) = {
      quiesce()
      val c0 = cpu.sum()
      val n = f
      quiesce()
      (n, (cpu.sum() - c0) / 1e9)
    }

    val K = 10
    val NCELLS = 64
    val NPROBE = 4
    println(f"${"point"}%-6s ${"arm"}%-22s ${"recall@10"}%10s ${"cpu_s"}%8s ${"notes"}%s")
    for (dir <- dirs) {
      val point = dir.split('/').last
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val corpus = emb.filter(col("vec_id") % 10 =!= 0).localCheckpoint(true)
      val probes = emb.filter(col("vec_id") % 10 === 0 && col("vec_id") < 10000)
        .localCheckpoint(true)
      val nQ = probes.count()

      val truth = Similarity.bruteForceTopKBatch(corpus, probes, "vec_id",
          "embedding", K)
        .select("query_id", "neighbor_id").localCheckpoint(true)
      val truthRows = truth.count()
      def recall(df: org.apache.spark.sql.DataFrame): Double = {
        val hits = df.select("query_id", "neighbor_id")
          .join(truth, Seq("query_id", "neighbor_id")).count()
        hits.toDouble / truthRows
      }

      // exact arm CPU (the plan recall-1 queries route to)
      val (_, exactCpu) = cell {
        Similarity.bruteForceTopKBatch(corpus, probes, "vec_id", "embedding", K)
          .count()
      }
      println(f"$point%-6s ${"exact_scan"}%-22s ${1.0}%10.3f $exactCpu%8.2f  $nQ queries")

      for ((nSub, iters, tag) <- Seq((8, 0, "pq8_sampled"), (8, 3, "pq8_lloyd"),
          (16, 3, "pq16_lloyd"))) {
        val cb = Pq.pqCodebook(corpus, "vec_id", "embedding", 64, nSub, 16,
          iters, sampleN = 2048).localCheckpoint(true)
        val adc = Pq.pqTopKExhaustive(probes, corpus, cb, "vec_id", "embedding", K)
          .localCheckpoint(true)
        val (_, adcCpu) = cell {
          Pq.pqTopKExhaustive(probes, corpus, cb, "vec_id", "embedding", K).count()
        }
        val r = recall(adc)
        val rr = recall(Pq.pqRerank(
          Pq.pqTopKExhaustive(probes, corpus, cb, "vec_id", "embedding", 100),
          emb, "vec_id", "embedding", K))
        println(f"$point%-6s $tag%-22s $r%10.3f $adcCpu%8.2f  rerank@10(R=100)=$rr%.3f")
      }

      // persisted raw IVF vs IVF-PQ: probe CPU + recall + bytes
      val tmpRaw = java.nio.file.Files.createTempDirectory("pq-study-raw").toString
      val tmpPq = java.nio.file.Files.createTempDirectory("pq-study-pq").toString
      Similarity.ivfIndex(corpus, "vec_id", "embedding", NCELLS, 64)
        .write.mode("overwrite").partitionBy("cell").parquet(tmpRaw)
      val cb16 = Pq.pqCodebook(corpus, "vec_id", "embedding", 64, 16, 16,
        iters = 3, sampleN = 2048).localCheckpoint(true)
      Pq.pqIndex(corpus, "vec_id", "embedding", cb16, NCELLS, 64)
        .write.mode("overwrite").partitionBy("cell").parquet(tmpPq)
      def bytes(d: String): Long = {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(d)).iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_)).map(java.nio.file.Files.size).sum
      }
      val raw = spark.read.parquet(tmpRaw)
      val pq = spark.read.parquet(tmpPq)
      val (_, rawCpu) = cell {
        Similarity.ivfIndexProbeAuto(probes, raw, "vec_id", "embedding", K,
          NPROBE).count()
      }
      val rRaw = recall(Similarity.ivfIndexProbeAuto(probes, raw, "vec_id",
        "embedding", K, NPROBE))
      val (_, pqCpu) = cell {
        Pq.pqProbe(probes, pq, cb16, "vec_id", "embedding", K, NPROBE,
          NCELLS, 64).count()
      }
      val rPq = recall(Pq.pqProbe(probes, pq, cb16, "vec_id", "embedding", K,
        NPROBE, NCELLS, 64))
      // the ROUTED arm head-to-head (annTopKAuto's compressed route):
      // IVF-PQ probe at the R=100 pool + exact sided rerank to K, vs
      // the raw-vector IVF probe at the SAME nProbe — CPU, recall, and
      // the on-disk byte ratio the route exists for
      def rerankArm() = Pq.pqRerankSided(
        Pq.pqProbe(probes, pq, cb16, "vec_id", "embedding", 100, NPROBE,
          NCELLS, 64),
        probes, corpus, "vec_id", "embedding", K)
      val (_, rrCpu) = cell { rerankArm().count() }
      val rRr = recall(rerankArm())
      println(f"$point%-6s ${"ivf_raw"}%-22s $rRaw%10.3f $rawCpu%8.2f  ${bytes(tmpRaw)}%d bytes")
      println(f"$point%-6s ${"ivf_pq16"}%-22s $rPq%10.3f $pqCpu%8.2f  ${bytes(tmpPq)}%d bytes")
      println(f"$point%-6s ${"ivf_pq16_rerank(R=100)"}%-22s $rRr%10.3f $rrCpu%8.2f  the routed arm")
    }
    spark.stop()
  }
}

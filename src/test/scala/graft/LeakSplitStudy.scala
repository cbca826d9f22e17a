package graft

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, TrainingData}

/** The sided-vs-symmetric cost model of the leak-safe splits
  * (SCALING.md r14): `leakSafeSplitEmbedding` indexes the HOLDOUT side
  * and probes it with the train side — candidate volume is
  * train×holdout band collisions — where the symmetric whole-corpus
  * pair relation also generates (and then discards) the intra-train
  * and intra-holdout bulk. At a t/(1−t) split the cross fraction of
  * random collisions is 2·t·(1−t) of the symmetric volume (0.32 at
  * 80/20), so the sided form should price near one third of the
  * symmetric one — this measures it, and re-verifies the equivalence
  * law (`TrainingDataSpec` proves it at fixture scale) at study scale.
  *
  * Usage: Test/runMain graft.LeakSplitStudy [dir ...]
  */
object LeakSplitStudy {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("scaledata/sf1", "scaledata/sf3")
    val spark = GraftSession.builder("leak-split-study",
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

    val MIN = 400000L
    println(f"${"point"}%-6s ${"arm"}%-12s ${"leaked"}%8s ${"cpu_s"}%8s")
    for (dir <- dirs) {
      val point = dir.split('/').last
      val emb = spark.read.parquet(s"$dir/embeddings.parquet").localCheckpoint(true)
      val split = TrainingData.assignSplit(emb, "label").localCheckpoint(true)
      val holdoutRows = split.filter(col("split") =!= "train").count()
      val planes = Similarity.lshAutoPlanes(holdoutRows)
      val sides = split.select("vec_id", "split")

      // SIDED: the operator's own construction — holdout indexed,
      // train probes, distinct train ids
      def sided(): Long =
        Similarity.lshIndexProbe(
            split.filter(col("split") === "train"),
            Similarity.lshIndex(split.filter(col("split") =!= "train"),
              "vec_id", "embedding", planes, dims = 64),
            "vec_id", "embedding", MIN, planes, dims = 64)
          .select(col("probe_id").as("vec_id")).distinct().count()

      // SYMMETRIC: the whole-corpus pair relation at the same planes,
      // filtered to cross-boundary pairs, train side named
      def symmetric(): Long = {
        val pairs = Similarity.nearDupPairsLsh(emb, "vec_id", "embedding",
          MIN, planes = planes, dims = 64, tables = 6)
        val a = pairs.join(sides.toDF("a_id", "a_split"), Seq("a_id"))
          .join(sides.toDF("b_id", "b_split"), Seq("b_id"))
        a.filter(col("a_split") === "train" && col("b_split") =!= "train")
          .select(col("a_id").as("vec_id"))
          .union(a.filter(col("b_split") === "train" && col("a_split") =!= "train")
            .select(col("b_id").as("vec_id")))
          .distinct().count()
      }

      val (nSided, cSided) = cell(sided())
      val (nSym, cSym) = cell(symmetric())
      // second pass each, min-of-2 (write-free cells, but the host breathes)
      val (_, cSided2) = cell(sided())
      val (_, cSym2) = cell(symmetric())
      require(nSided == nSym,
        s"equivalence law violated at $point: sided $nSided vs symmetric $nSym")
      println(f"$point%-6s ${"sided"}%-12s $nSided%8d ${math.min(cSided, cSided2)}%8.2f")
      println(f"$point%-6s ${"symmetric"}%-12s $nSym%8d ${math.min(cSym, cSym2)}%8.2f")
    }
    spark.stop()
  }
}

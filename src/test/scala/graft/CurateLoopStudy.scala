package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, IndexOps}
import graft.streaming.StreamingIngest

/** Measures the two steady-state costs of the streaming curate loop
  * that VERDICT r7 flagged:
  *
  *  1. the per-batch cost against a FRAGMENT-GROWN index vs one the
  *     in-loop compaction trigger maintains (`compactAtFiles`) — the
  *     "inside the loop" twin of [[CompactionStudy]];
  *  2. the ID-replay screen's cost: legacy full-index `distinct` vs
  *     the skinny id sidecar, full-scan and range-pruned.
  *
  * Model: the first 90% of documents (by id) bootstrap the index; the
  * last 10% arrives as `batches` ID-CONTIGUOUS slices — the monotone-id
  * shape of real ingest, which is what lets sidecar range pruning skip
  * non-overlapping row groups. Each batch runs the REAL loop body
  * ([[StreamingIngest.curateTextBatch]]), so the measured number is
  * the cost a drain actually pays, publishes included.
  *
  * Mode `embedding` runs the vector twin
  * ([[StreamingIngest.curateEmbeddingBatch]] over `embeddings.parquet`,
  * LSH index bootstrapped with the corpus-derived plane count) so BOTH
  * curate loops carry the same steady-state evidence.
  *
  * Usage: Test/runMain graft.CurateLoopStudy [sfDir] [batches] [compactAt] [mode]
  */
object CurateLoopStudy {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("scaledata/sf1")
    val batches = args.drop(1).headOption.map(_.toInt).getOrElse(12)
    val compactAt = args.drop(2).headOption.map(_.toInt).getOrElse(24)
    val mode = args.drop(3).headOption.getOrElse("text")
    require(mode == "text" || mode == "embedding" || mode == "ivf",
      s"unknown mode $mode")
    val spark = GraftSession.builder("curate-loop-study", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

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
      var prev = -1L; var spins = 0
      while (prev != cpu.sum() && spins < 40) { prev = cpu.sum(); Thread.sleep(50); spins += 1 }
    }

    val (table, idCol, payloadCol) =
      if (mode == "text") ("documents", "doc_id", "text")
      else ("embeddings", "vec_id", "embedding")
    // ivf mode: cells from the growth law (256 rows/cell), probes 2
    val docs = spark.read.parquet(s"$dir/$table.parquet").select(idCol, payloadCol)
    val n = docs.count()
    val corpusMax = n * 9 / 10
    val corpus = docs.filter(col(idCol) < corpusMax).localCheckpoint(true)
    val sliceW = (n - corpusMax + batches - 1) / batches
    def slice(b: Int) = docs
      .filter(col(idCol) >= corpusMax + b * sliceW &&
        col(idCol) < corpusMax + (b + 1) * sliceW)
      .localCheckpoint(true)
    val arrivals = (0 until batches).map(slice)
    // embedding mode: plane count derived from the bootstrap corpus the
    // way q71/the loop's own consumers derive it
    lazy val planes = graft.operators.Similarity.lshAutoPlanes(corpusMax)

    lazy val nCells = math.max(1L, corpusMax / 256).toInt

    def bootstrapIndex(indexDir: String): Unit = mode match {
      case "text" =>
        Dedup.minhashIndex(corpus, idCol, payloadCol)
          .write.mode("overwrite").partitionBy("band").parquet(indexDir)
      case "embedding" =>
        graft.operators.Similarity.lshIndex(corpus, idCol, payloadCol, planes, dims = 64)
          .write.mode("overwrite").partitionBy("tbl").parquet(indexDir)
      case _ =>
        graft.operators.Similarity.ivfIndex(corpus, idCol, payloadCol, nCells, dims = 64)
          .write.mode("overwrite").partitionBy("cell").parquet(indexDir)
    }

    def runBatch(b: Int, indexDir: String, outDir: String, compact: Int): Unit = mode match {
      case "text" =>
        StreamingIngest.curateTextBatch(arrivals(b), b.toLong, indexDir, outDir,
          idCol, payloadCol, df => df, 8, compact)
      case "embedding" =>
        StreamingIngest.curateEmbeddingBatch(arrivals(b), b.toLong, indexDir, outDir,
          idCol, payloadCol, minMicro = 400000L, df => df, compact)
      case _ =>
        StreamingIngest.curateIvfBatch(arrivals(b), b.toLong, indexDir, outDir,
          idCol, payloadCol, minMicro = 400000L, nProbe = 2, df => df, compact)
    }

    def runLoop(compact: Int): (String, Double, Double, Double, Double, Int) = {
      val indexDir = Files.createTempDirectory(s"clstudy_ix$compact").toString + "/ix"
      val outDir = Files.createTempDirectory(s"clstudy_out$compact").toString
      bootstrapIndex(indexDir)
      var lastWall = 0.0; var lastCpu = 0.0
      var totWall = 0.0; var totCpu = 0.0
      (0 until batches).foreach { b =>
        quiesce(); cpu.reset()
        val w0 = System.nanoTime()
        runBatch(b, indexDir, outDir, compact)
        quiesce()
        lastWall = (System.nanoTime() - w0) / 1e9
        lastCpu = cpu.sum / 1e9
        totWall += lastWall; totCpu += lastCpu
      }
      (indexDir, lastWall, lastCpu, totWall, totCpu,
        IndexOps.dataFileCount(spark, indexDir))
    }

    val (fragIx, fw, fc, ftw, ftc, ff) = runLoop(0)
    val (compIx, cw, cc, ctw, ctc, cf) = runLoop(compactAt)
    println(f"[study] last-batch FRAGMENTED  wall=$fw%.2f s cpu=$fc%.2f core-s files=$ff")
    println(f"[study] last-batch COMPACTED   wall=$cw%.2f s cpu=$cc%.2f core-s files=$cf (compactAt=$compactAt)")
    println(f"[study] loop-total FRAGMENTED  wall=$ftw%.1f s cpu=$ftc%.1f core-s")
    println(f"[study] loop-total COMPACTED   wall=$ctw%.1f s cpu=$ctc%.1f core-s")

    // --- id-screen variants at the final (fragment-grown) index state ---
    val index = spark.read.parquet(fragIx)
    val sidecar = spark.read.parquet(StreamingIngest.idSidecarDir(fragIx))
    val probe = arrivals.last
    def timed(what: String)(body: => Long): Unit = {
      val runs = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        quiesce(); cpu.reset()
        val w0 = System.nanoTime()
        val rows = body
        quiesce()
        ((System.nanoTime() - w0) / 1e9, cpu.sum / 1e9, rows)
      }
      println(f"[study] screen $what%-22s wall=${runs.map(_._1).min}%.3f s " +
        f"cpu=${runs.map(_._2).min}%.3f core-s rows=${runs.head._3}")
    }
    timed("index-distinct (old)") {
      probe.join(index.select(col(idCol)).distinct(), Seq(idCol), "left_anti").count()
    }
    timed("sidecar-full") {
      probe.join(sidecar.select(col(idCol)), Seq(idCol), "left_anti").count()
    }
    timed("sidecar-range-pruned") {
      val rng = probe.agg(min(col(idCol)).as("mn"), max(col(idCol)).as("mx")).head()
      probe.join(
        sidecar.filter(col(idCol).between(lit(rng.get(0)), lit(rng.get(1))))
          .select(col(idCol)),
        Seq(idCol), "left_anti").count()
    }
    println("[study] sidecar files=" +
      IndexOps.dataFileCount(spark, StreamingIngest.idSidecarDir(fragIx)) +
      " rows=" + sidecar.count() + " | index rows=" + index.count())
    spark.stop()
  }
}

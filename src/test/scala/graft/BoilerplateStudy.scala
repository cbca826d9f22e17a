package graft

import org.apache.spark.sql.functions._

import graft.operators.Boilerplate

/** Cost model of the boilerplate strip's join-back shape (SCALING.md
  * r14): [[Boilerplate.stripRepeatedUnits]] routes only heavy-unit
  * MATCHES through the shuffle machinery (inner join → bounded per-doc
  * heavy list → id join → order-preserving array filter), where the
  * naive rebuild explodes the whole corpus, anti-joins every unit
  * occurrence, and re-assembles documents with a positional sort — the
  * corpus body pays two shuffles it never needed. Both arms share the
  * identical frequency aggregation, so the measured delta isolates the
  * rebuild path. Equivalence is REQUIRED per point (doc count, total
  * stripped occurrences, and a text checksum over every kept document).
  *
  * Usage: Test/runMain graft.BoilerplateStudy [dir ...]
  */
object BoilerplateStudy {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("scaledata/sf1", "scaledata/sf3")
    val spark = GraftSession.builder("boilerplate-study",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cpu = new java.util.concurrent.atomic.LongAdder
    val shuffle = new java.util.concurrent.atomic.LongAdder
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            cpu.add(m.executorCpuTime)
            shuffle.add(m.shuffleWriteMetrics.bytesWritten)
          }
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
    def cell(f: => (Long, Long, String)): ((Long, Long, String), Double, Double) = {
      quiesce()
      val c0 = cpu.sum(); val s0 = shuffle.sum()
      val n = f
      quiesce()
      (n, (cpu.sum() - c0) / 1e9, (shuffle.sum() - s0) / 1048576.0)
    }

    // the q109 unit derivation: 8-word chunks
    def chunkLines(text: org.apache.spark.sql.Column) = {
      val words = split(trim(text), "\\s+")
      transform(
        sequence(lit(0), ((size(words) - lit(1)) / lit(8)).cast("int")),
        i => array_join(slice(words, i * lit(8) + lit(1), lit(8)), " "))
    }
    // (docs, total stripped occurrences, kept-text checksum) — the
    // three-way equivalence signature of one arm's full result
    def signature(out: org.apache.spark.sql.DataFrame): (Long, Long, String) = {
      val r = out.agg(count(lit(1)), sum("n_stripped"),
        sum(xxhash64(col("doc_id"), col("text_kept")).cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getLong(1), r.getDecimal(2).toString)
    }

    println(f"${"point"}%-6s ${"arm"}%-10s ${"docs"}%9s ${"stripped"}%9s ${"cpu_s"}%8s ${"shuf_mb"}%10s")
    for (dir <- dirs) {
      val point = dir.split('/').last
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text").localCheckpoint(true)
      val lines = chunkLines(col("text"))

      // OPERATOR arm: matches-only join-back, array-filter strip,
      // heavy relation pinned broadcast (the default)
      def hitsJoin(): (Long, Long, String) = signature(
        Boilerplate.stripRepeatedUnits(docs, "doc_id", lines, "__kept", 2)
          .select(col("doc_id"), col("n_stripped"),
            array_join(col("__kept"), "\n").as("text_kept")))

      // fallback arm: heavy too big to broadcast → forced sort-merge
      def mergeFallback(): (Long, Long, String) = signature(
        Boilerplate.stripRepeatedUnits(docs, "doc_id", lines, "__kept", 2,
            broadcastHeavy = false)
          .select(col("doc_id"), col("n_stripped"),
            array_join(col("__kept"), "\n").as("text_kept")))

      // NAIVE arm: full corpus explode → anti-join → positional rebuild
      // (shares repeatedUnits verbatim, so the frequency half is identical)
      def naive(): (Long, Long, String) = {
        val heavy = Boilerplate.repeatedUnits(docs, "doc_id", lines, 2)
          .select("unit")
        val ex = docs.select(col("doc_id"),
            posexplode(lines).as(Seq("pos", "line")))
          .withColumn("unit", trim(col("line")))
        val kept = ex.join(heavy, Seq("unit"), "left_anti")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_kept"),
            array_join(
              transform(array_sort(collect_list(struct(col("pos"), col("line")))),
                s => s("line")), "\n").as("text_kept"))
        val out = docs.select(col("doc_id"), size(lines).cast("long").as("n_units"))
          .join(kept, Seq("doc_id"), "left")
          .select(col("doc_id"),
            (col("n_units") - coalesce(col("n_kept"), lit(0L))).as("n_stripped"),
            coalesce(col("text_kept"), lit("")).as("text_kept"))
        signature(out)
      }

      val (sHits, cHits, shHits) = cell(hitsJoin())
      val (sMerge, cMerge, shMerge) = cell(mergeFallback())
      val (sNaive, cNaive, shNaive) = cell(naive())
      val (_, cHits2, _) = cell(hitsJoin())
      val (_, cMerge2, _) = cell(mergeFallback())
      val (_, cNaive2, _) = cell(naive())
      require(sHits == sNaive && sHits == sMerge,
        s"arms diverge at $point: broadcast $sHits vs merge $sMerge vs naive $sNaive")
      println(f"$point%-6s ${"hits-bcast"}%-10s ${sHits._1}%9d ${sHits._2}%9d ${math.min(cHits, cHits2)}%8.2f $shHits%10.1f")
      println(f"$point%-6s ${"hits-merge"}%-10s ${sMerge._1}%9d ${sMerge._2}%9d ${math.min(cMerge, cMerge2)}%8.2f $shMerge%10.1f")
      println(f"$point%-6s ${"naive"}%-10s ${sNaive._1}%9d ${sNaive._2}%9d ${math.min(cNaive, cNaive2)}%8.2f $shNaive%10.1f")
    }
    spark.stop()
  }
}

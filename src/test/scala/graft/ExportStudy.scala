package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Export

/** Measures the export family's scale posture (SCALING.md, r11).
  *
  * Two findings this study exists to pin:
  *
  *  - `balancedShards`' two-pass prefix sum vs the textbook GLOBAL
  *    WINDOW phrasing (`sum(w) OVER (ORDER BY ord, id)` with no
  *    partition clause). The naive form funnels the whole corpus
  *    through ONE sort task, so its WALL time degrades toward
  *    single-core throughput as data grows while its CPU stays flat-ish
  *    — the classic "CPU looks fine, cluster sits idle" trap. The
  *    operator must be answer-identical (hash cross-check per point)
  *    and must hold its wall advantage with scale.
  *  - `shardedWrite`'s cost shape: one exchange + one manifest re-scan,
  *    so wall/CPU should scale linearly with rows, and the manifest's
  *    own row counts give the shard-balance evidence (max/mean rows
  *    per shard — hash placement should hold ~1.0 with fixture-scale
  *    variance).
  *
  * Usage: Test/runMain graft.ExportStudy [dir1 dir2 ...]
  */
object ExportStudy {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("scaledata/sf0.1", "scaledata/sf1", "scaledata/sf3")
    val spark = GraftSession.builder("export-study",
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
    // sustained-silence quiesce (TemporalStudy's lesson: the listener
    // bus flushes in bursts; first-quiet-gap waits bleed a big cell's
    // tail CPU into its neighbor)
    def quiesce(): Unit = {
      var prev = cpu.sum(); var quiet = 0; var spins = 0
      while (quiet < 20 && spins < 1200) {
        Thread.sleep(100); spins += 1
        val now = cpu.sum()
        if (now == prev) quiet += 1 else { quiet = 0; prev = now }
      }
    }
    /** min-of-3 (cpuS, wallS) for one consuming action over `df`,
      * hashing `hashCol` so arms can assert answer equality. */
    def measure(df: => DataFrame, hashCol: String): ((Double, Double), (Long, Long)) = {
      var bestC = Double.MaxValue; var bestW = Double.MaxValue
      var out: (Long, Long) = (0L, 0L)
      for (_ <- 1 to 3) {
        quiesce(); val c0 = cpu.sum(); val w0 = System.nanoTime()
        val r = df.agg(count(lit(1)),
          sum(pmod(xxhash64(col(hashCol)), lit(1000000007L)))).collect()(0)
        val w1 = System.nanoTime(); quiesce(); val c1 = cpu.sum()
        bestC = math.min(bestC, (c1 - c0) / 1e9)
        bestW = math.min(bestW, (w1 - w0) / 1e9)
        out = (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }
      ((bestC, bestW), out)
    }

    // JIT/codegen warm-up
    spark.range(1000000).agg(sum(pmod(xxhash64(col("id")), lit(97L)))).collect()

    println(f"${"point"}%-10s ${"cell"}%-22s ${"cpu_s"}%8s ${"wall_s"}%8s  rows      agree")
    def row(point: String, cell: String, m: ((Double, Double), (Long, Long)),
        agree: String): Unit =
      println(f"$point%-10s $cell%-22s ${m._1._1}%7.2fs ${m._1._2}%7.2fs  ${m._2._1}%-9d $agree")

    // Optional cell filter for targeted reruns:
    //   EXPORT_STUDY_CELLS=write Test/runMain graft.ExportStudy scaledata/sf3
    val cellFilter = sys.env.get("EXPORT_STUDY_CELLS").map(_.split(",").toSet)
    def want(name: String): Boolean = cellFilter.forall(_.exists(name.startsWith))

    for (dir <- dirs) {
      val point = dir.split('/').last
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val nShards = 64

      // -- balanced shards: two-pass operator vs global window --------
      val keyed = (df: DataFrame) => df.withColumn("sh_key",
        concat_ws(":", col("doc_id"), col("shard")))
      if (want("balanced")) {
      val op = measure(keyed(
        Export.balancedShards(docs, "doc_id", "n_chars", nShards)), "sh_key")
      val nv = measure(keyed({
        val ord = graft.functions.Hashing.h60(
          concat(lit("ord:"), col("doc_id").cast("string")))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("ord"), col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val total = docs.agg(sum(coalesce(col("n_chars"), lit(0L)))).collect()(0).getLong(0)
        docs.withColumn("ord", ord)
          .withColumn("__p", coalesce(
            sum(coalesce(col("n_chars"), lit(0L)).cast("decimal(38,0)")).over(w),
            lit(java.math.BigDecimal.ZERO)))
          .withColumn("shard",
            least(expr(s"(__p * $nShards) div ${total}"), lit(nShards - 1)).cast("int"))
          .drop("__p")
      }), "sh_key")
      row(point, "balanced: operator", op, "")
      row(point, "balanced: global-win", nv, s"${op._2 == nv._2}")
      }

      if (want("write")) {
      // -- sharded write: one exchange + manifest scan + swap ---------
      // min-of-2: single-shot write cells proved drift-contaminated
      // (non-monotone 8.7/7.6/33.2 CPU across points in one run)
      val out = s"/tmp/graft_export_study/${point}"
      var bestC = Double.MaxValue; var bestW = Double.MaxValue
      var statline = ""
      for (_ <- 1 to 2) {
        quiesce(); val c0 = cpu.sum(); val w0 = System.nanoTime()
        val manifest = Export.shardedWrite(spark, docs, "doc_id",
          Seq("doc_id", "text", "lang", "source", "n_chars"), nShards, out)
        val stats = manifest.agg(sum("n_rows"), max("n_rows"), avg("n_rows")).collect()(0)
        val w1 = System.nanoTime(); quiesce(); val c1 = cpu.sum()
        bestC = math.min(bestC, (c1 - c0) / 1e9)
        bestW = math.min(bestW, (w1 - w0) / 1e9)
        statline = f"${stats.getLong(0)}%-9d max/mean=${stats.getLong(1) / stats.getDouble(2)}%.2f"
      }
      println(f"$point%-10s ${"shardedWrite"}%-22s $bestC%7.2fs $bestW%7.2fs  $statline")
      }
    }

    if (want("funnel")) {
    // -- the funnel: big synthetic corpus, operator vs global window --
    // The fixture points are too small to show the single-task sort
    // degrading (150k rows sort in one task in well under a second).
    // 20M rows is where one task's sort+window visibly holds the
    // cluster idle while the partitioned form spreads it.
    val big = spark.range(20L * 1000 * 1000).select(
      col("id").as("doc_id"),
      (pmod(xxhash64(col("id")), lit(997L)) + 1).as("n_chars"))
    val keyedB = (df: DataFrame) => df.withColumn("sh_key",
      concat_ws(":", col("doc_id"), col("shard")))
    val opB = measure(keyedB(
      Export.balancedShards(big, "doc_id", "n_chars", 64)), "sh_key")
    val nvB = measure(keyedB({
      val ord = graft.functions.Hashing.h60(
        concat(lit("ord:"), col("doc_id").cast("string")))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("ord"), col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val total = big.agg(sum(coalesce(col("n_chars"), lit(0L)))).collect()(0).getLong(0)
      big.withColumn("ord", ord)
        .withColumn("__p", coalesce(
          sum(coalesce(col("n_chars"), lit(0L)).cast("decimal(38,0)")).over(w),
          lit(java.math.BigDecimal.ZERO)))
        .withColumn("shard",
          least(expr(s"(__p * 64) div ${total}"), lit(63)).cast("int"))
        .drop("__p")
    }), "sh_key")
    row("range20M", "balanced: operator", opB, "")
    row("range20M", "balanced: global-win", nvB, s"${opB._2 == nvB._2}")
    }

    if (want("writepar")) {
    // -- write parallelism decoupled from nShards (r12) --------------
    // The r11 layout hash-repartitioned on `shard` alone: an export
    // with nShards << cores ran at most nShards (collision-reduced)
    // tasks. writeLayout's equi-width ord bucket spreads each shard
    // over multiple ord-sorted files with no sampling job. Cell: the
    // DATA WRITE alone (exchange + sort + parquet), 20M rows,
    // nShards = 8 on 32 cores — the regime the old shape serializes.
    val big = spark.range(20L * 1000 * 1000).select(
      col("id").as("doc_id"),
      pmod(xxhash64(col("id"), lit(7L)), lit(100000L)).as("payload"))
    val nSh = 8
    val assigned = Export.shardAssign(big, "doc_id", nSh)
    def writeWall(laid: DataFrame, out: String): (Double, Double) = {
      var bestC = Double.MaxValue; var bestW = Double.MaxValue
      for (_ <- 1 to 2) {
        quiesce(); val c0 = cpu.sum(); val w0 = System.nanoTime()
        laid.write.mode("overwrite").partitionBy("shard").parquet(out)
        val w1 = System.nanoTime(); quiesce(); val c1 = cpu.sum()
        bestC = math.min(bestC, (c1 - c0) / 1e9)
        bestW = math.min(bestW, (w1 - w0) / 1e9)
      }
      (bestC, bestW)
    }
    val oldShape = writeWall(
      assigned.repartition(nSh, col("shard"))
        .sortWithinPartitions(col("shard"), col("ord")),
      "/tmp/graft_export_study/writepar_old")
    val newShape = writeWall(
      graft.operators.Export.writeLayout(assigned, nSh,
        graft.operators.Export.writeTasks(assigned, nSh)),
      "/tmp/graft_export_study/writepar_new")
    println(f"range20M   ${"write: shard-hash(8)"}%-22s ${oldShape._1}%7.2fs ${oldShape._2}%7.2fs  nShards-capped tasks")
    println(f"range20M   ${"write: writeLayout"}%-22s ${newShape._1}%7.2fs ${newShape._2}%7.2fs  input-wide tasks")
    }

    if (want("delete")) {
    // -- targeted deletion: O(affected shards) (r13) ------------------
    // Three arms over a 20M-row 64-shard export, fresh-built before
    // each measurement (a delete consumes its own work):
    //  - ids(10):   deleteIdsFromExport, 10 ids — the hash contract
    //               derives the ≤10 affected shards from the list, so
    //               BOTH the match check and the rewrite prune to
    //               ≤10/64 of the corpus;
    //  - pred 1-shard: predicate delete confined to one shard — one
    //               full detection scan (the predicate could match
    //               anywhere) + a 1/64 rewrite;
    //  - pred all:  1% of rows spread over every shard — detection
    //               scan + full-corpus rewrite, the O(corpus) floor
    //               any takedown without placement knowledge pays.
    val big = spark.range(20L * 1000 * 1000).select(
      col("id").as("doc_id"),
      pmod(xxhash64(col("id"), lit(7L)), lit(100000L)).as("payload"))
    val nSh = 64
    val out = "/tmp/graft_export_study/delete"
    val cs = Seq("doc_id", "payload")
    val outFs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def deleteArm(name: String, act: => Long): Unit = {
      var bestC = Double.MaxValue; var bestW = Double.MaxValue
      var rows = 0L
      for (_ <- 1 to 2) {
        outFs.delete(new org.apache.hadoop.fs.Path(out), true)
        Export.shardedWrite(spark, big, "doc_id", cs, nSh, out)
        quiesce(); val c0 = cpu.sum(); val w0 = System.nanoTime()
        rows = act
        val w1 = System.nanoTime(); quiesce(); val c1 = cpu.sum()
        bestC = math.min(bestC, (c1 - c0) / 1e9)
        bestW = math.min(bestW, (w1 - w0) / 1e9)
      }
      println(f"range20M   $name%-22s $bestC%7.2fs $bestW%7.2fs  rows_left=$rows")
    }
    def rowsLeft(m: DataFrame): Long =
      m.agg(sum("n_rows")).collect()(0).getLong(0)
    val tenIds = (0 until 10).map(i => 1000000L + i * 997)
    deleteArm("delete: ids(10)", rowsLeft(
      Export.deleteIdsFromExport(spark, out,
        spark.createDataFrame(tenIds.map(Tuple1(_))).toDF("doc_id"),
        "doc_id", cs)))
    val oneShard = graft.functions.Hashing.h60(
      concat(lit("shard:"), col("doc_id").cast("string"))) % nSh === 3 &&
      col("payload") < 1000
    deleteArm("delete: pred 1-shard", rowsLeft(
      Export.deleteFromExport(spark, out, oneShard, cs)))
    deleteArm("delete: pred all-shards", rowsLeft(
      Export.deleteFromExport(spark, out, col("payload") < 1000, cs)))
    }

    if (want("verify")) {
    // -- tiered attestation: full vs subset vs counts (r13) -----------
    // One 20M-row 64-shard export, three attestation tiers over the
    // same bytes. The cost model the tiers exist for: the subset scans
    // k/64 of the corpus, the count check decodes no data column at
    // all (parquet answers from file metadata), the full replay is the
    // O(corpus) floor. All three are pure reads — one build serves all.
    val big = spark.range(20L * 1000 * 1000).select(
      col("id").as("doc_id"),
      pmod(xxhash64(col("id"), lit(7L)), lit(100000L)).as("payload"))
    val nSh = 64
    val out = "/tmp/graft_export_study/verify"
    val cs = Seq("doc_id", "payload")
    new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(out), true)
    Export.shardedWrite(spark, big, "doc_id", cs, nSh, out)
    def verifyCell(name: String, act: => Unit): Unit = {
      var bestC = Double.MaxValue; var bestW = Double.MaxValue
      for (_ <- 1 to 3) {
        quiesce(); val c0 = cpu.sum(); val w0 = System.nanoTime()
        act
        val w1 = System.nanoTime(); quiesce(); val c1 = cpu.sum()
        bestC = math.min(bestC, (c1 - c0) / 1e9)
        bestW = math.min(bestW, (w1 - w0) / 1e9)
      }
      println(f"range20M   $name%-22s $bestC%7.2fs $bestW%7.2fs")
    }
    verifyCell("verify: full", Export.verifyShards(spark, out, cs))
    verifyCell("verify: subset(8/64)",
      Export.verifyShardSubset(spark, out, cs, 0 until 8))
    verifyCell("verify: counts", Export.verifyShardCounts(spark, out))
    }

    if (want("nparts")) {
    // -- balancedShards nParts: pure parallelism, invariant answer ---
    val big = spark.range(20L * 1000 * 1000).select(
      col("id").as("doc_id"),
      (pmod(xxhash64(col("id")), lit(997L)) + 1).as("n_chars"))
    val keyedB = (df: DataFrame) => df.withColumn("sh_key",
      concat_ws(":", col("doc_id"), col("shard")))
    val p32 = measure(keyedB(
      Export.balancedShards(big, "doc_id", "n_chars", 64, nParts = 32)), "sh_key")
    val p256 = measure(keyedB(
      Export.balancedShards(big, "doc_id", "n_chars", 64, nParts = 256)), "sh_key")
    row("range20M", "balanced: nParts=32", p32, "")
    row("range20M", "balanced: nParts=256", p256, s"${p32._2 == p256._2}")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** The z-order layout's read-cost trade at scale (SCALING.md r11):
  * CPU, wall and rows-scanned for the three predicate shapes against
  * the SAME data in two layouts — z-ordered on (l_orderkey, l_partkey)
  * vs 1-D sorted on l_orderkey — at sf1 lineitem (6M rows, ~50k-row
  * files so row-group stats have real granularity).
  *
  *  - box (both dims selective): z's home turf;
  *  - y-only (the dimension the 1-D sort cannot serve): z prunes,
  *    1-D scans everything;
  *  - x-only (the 1-D sort's home turf): the honest cost of z — its
  *    x-runs are scattered across the curve, so it should LOSE here,
  *    and the table says by how much.
  *
  * Usage: Test/runMain graft.ZOrderStudy [dir]
  */
object ZOrderStudy extends org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("scaledata/sf1")
    val spark = GraftSession.builder("zorder-study",
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

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val rows = li.count()
    val zDir = "/tmp/graft_zorder_study/z"
    val sDir = "/tmp/graft_zorder_study/s"
    val perFile = math.max(1000L, rows / 120)
    Layout.zorderedWrite(spark, li, "l_orderkey", "l_partkey", zDir, perFile)
    li.repartitionByRange(120, col("l_orderkey")).sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(sDir)

    val r = li.agg(min("l_orderkey"), max("l_orderkey"),
      min("l_partkey"), max("l_partkey")).collect()(0)
    val (lo1, hi1) = (r.getLong(0), r.getLong(1))
    val (lo2, hi2) = (r.getLong(2), r.getLong(3))
    def span(lo: Long, hi: Long, f0: Double, f1: Double): (Long, Long) =
      (lo + ((hi - lo) * f0).toLong, lo + ((hi - lo) * f1).toLong)
    val (x0, x1) = span(lo1, hi1, 0.30, 0.425) // 1/8 of x
    val (y0, y1) = span(lo2, hi2, 0.60, 0.725) // 1/8 of y

    val shapes: Seq[(String, DataFrame => DataFrame)] = Seq(
      ("box both dims", df => df.filter(
        col("l_orderkey").between(x0, x1) && col("l_partkey").between(y0, y1))),
      ("y only", df => df.filter(col("l_partkey").between(y0, y1))),
      ("x only", df => df.filter(col("l_orderkey").between(x0, x1))))

    /** min-of-3 (cpu, wall, rows scanned by the file source, result rows). */
    def measure(build: => DataFrame): (Double, Double, Long, Long) = {
      var bc = Double.MaxValue; var bw = Double.MaxValue
      var scanned = 0L; var matched = 0L
      for (_ <- 1 to 3) {
        quiesce(); val c0 = cpu.sum(); val w0 = System.nanoTime()
        val agg = build.agg(count(lit(1)))
        matched = agg.collect()(0).getLong(0)
        val w1 = System.nanoTime(); quiesce(); val c1 = cpu.sum()
        bc = math.min(bc, (c1 - c0) / 1e9); bw = math.min(bw, (w1 - w0) / 1e9)
        // read the metric off the EXECUTED plan (the aggregated frame)
        scanned = collectWithSubqueries(agg.queryExecution.executedPlan) {
          case s: FileSourceScanExec => s.metrics("numOutputRows").value
        }.sum
      }
      (bc, bw, scanned, matched)
    }

    // warm-up
    spark.read.parquet(zDir).agg(count(lit(1))).collect()
    spark.read.parquet(sDir).agg(count(lit(1))).collect()

    println(f"${"shape"}%-14s ${"layout"}%-8s ${"cpu_s"}%7s ${"wall_s"}%7s ${"scanned"}%9s ${"matched"}%9s  (of $rows)")
    for ((name, pred) <- shapes; (lname, ldir) <- Seq(("zorder", zDir), ("xsort", sDir))) {
      val (c, w, sc, m) = measure(pred(spark.read.parquet(ldir)))
      println(f"$name%-14s $lname%-8s $c%6.2fs $w%6.2fs $sc%9d $m%9d")
    }
    spark.stop()
  }
}

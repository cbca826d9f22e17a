package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Temporal

/** Measures the temporal joins' scale posture (SCALING.md, r10):
  *
  *  1. AS-OF: `Temporal.asOfJoin` (union-window, |L|+|R| rows through
  *     one shuffle) vs the naive phrasing (per-key inequality join,
  *     |L_k|·|R_k| intermediate rows per key, then keep-latest). The
  *     gap must WIDEN with per-key density — events' user space is
  *     fixed across scale points, so density grows with the factor.
  *  2. RANGE: `Temporal.rangeJoin` (bucketized equi-join) vs the naive
  *     keyed inequality join (Spark extracts the key equi-part and
  *     leaves the range as a residual — per-key points×intervals
  *     explosion before the filter).
  *  3. OVERLAP: `Temporal.intervalOverlapJoin` (claim trick) vs the
  *     naive per-key session×session cross.
  *
  * Every pair also cross-checks row count + a value hash so the cheap
  * plan is proven answer-identical to the naive one at each point.
  * 30-minute sessions (not q83's 8h) so interval COUNT per key grows
  * with density — the regime the bucketing exists for.
  *
  * Usage: Test/runMain graft.TemporalStudy [dir1 dir2 ...]
  */
object TemporalStudy {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("scaledata/sf0.1", "scaledata/sf1", "scaledata/sf3")
    val spark = GraftSession.builder("temporal-study",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
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
    /** min-of-2 CPU core-seconds for one consuming action; returns
      * (cpuS, (rows, hash)) so callers can assert answer equality. */
    def measure(df: => DataFrame, hashCol: String): (Double, (Long, Long)) = {
      var best = Double.MaxValue
      var out: (Long, Long) = (0L, 0L)
      for (_ <- 1 to 2) {
        quiesce(); val c0 = cpu.sum()
        val r = df.agg(count(lit(1)), sum(xxhash64(col(hashCol)))).collect()(0)
        quiesce(); val c1 = cpu.sum()
        best = math.min(best, (c1 - c0) / 1e9)
        out = (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }
      (best, out)
    }

    val GAP = 1800L * 1000000L
    println(f"${"point"}%-14s ${"pair"}%-10s ${"operator"}%9s ${"naive"}%9s  rows      agree")
    for (dir <- dirs) {
      val ev = spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", col("ts").cast("timestamp_ntz"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts")
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("view_ts"),
          col("event_id").as("view_id"))

      // -- as-of ------------------------------------------------------
      val (aCpu, aOut) = measure(
        Temporal.asOfJoin(purchases, views, Seq("user_id"), "ts", "view_ts",
          rightVals = Seq("view_id"), tieBreak = Seq("view_id")), "view_id")
      val (nCpu, nOut) = measure({
        val j = purchases.join(views,
          purchases("user_id") === views("user_id") && views("view_ts") <= purchases("ts"),
          "left")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(purchases("user_id"), col("event_id"))
          .orderBy(col("view_ts").desc_nulls_last, col("view_id").desc_nulls_last)
        j.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
          .select(purchases("user_id"), col("event_id"), col("view_id"))
      }, "view_id")
      println(f"${dir.split('/').last}%-14s ${"asof"}%-10s $aCpu%8.2fs $nCpu%8.2fs  ${aOut._1}%-9d ${aOut == nOut}")

      // -- range ------------------------------------------------------
      val nav = ev.filter(col("event_type").isin("view", "click"))
      val sessions = Temporal.sessionIntervals(nav, Seq("user_id"), "ts", GAP,
        tieBreak = Seq("event_id"))
      val (rCpu, rOut) = measure(
        Temporal.rangeJoin(purchases, sessions, Seq("user_id"), "ts",
          "session_start", "session_end", bucketWidth = GAP,
          maxBucketsPerInterval = 4096), "session_seq")
      val (rnCpu, rnOut) = measure({
        val s = sessions.withColumnRenamed("user_id", "s_uid")
        purchases.join(s,
          purchases("user_id") === s("s_uid") &&
            s("session_start") <= purchases("ts") &&
            purchases("ts") <= s("session_end"), "inner")
          .select(purchases("user_id"), col("event_id"), col("session_seq"))
      }, "session_seq")
      println(f"${dir.split('/').last}%-14s ${"range"}%-10s $rCpu%8.2fs $rnCpu%8.2fs  ${rOut._1}%-9d ${rOut == rnOut}")

      // -- overlap ----------------------------------------------------
      def sess(kind: String, p: String) =
        Temporal.sessionIntervals(ev.filter(col("event_type") === kind),
            Seq("user_id"), "ts", GAP, tieBreak = Seq("event_id"))
          .select(col("user_id"), col("session_seq").as(s"${p}_seq"),
            col("session_start").as(s"${p}_start"), col("session_end").as(s"${p}_end"))
      val vs = sess("view", "v")
      val cs = sess("click", "c")
      val (oCpu, oOut) = measure(
        Temporal.intervalOverlapJoin(vs, cs, Seq("user_id"),
          "v_start", "v_end", "c_start", "c_end",
          bucketWidth = GAP, maxBucketsPerInterval = 4096), "c_seq")
      val (onCpu, onOut) = measure({
        val c2 = cs.withColumnRenamed("user_id", "c_uid")
        vs.join(c2, vs("user_id") === c2("c_uid") &&
            vs("v_start") <= c2("c_end") && c2("c_start") <= vs("v_end"), "inner")
          .select(vs("user_id"), col("v_seq"), col("c_seq"))
      }, "c_seq")
      println(f"${dir.split('/').last}%-14s ${"overlap"}%-10s $oCpu%8.2fs $onCpu%8.2fs  ${oOut._1}%-9d ${oOut == onOut}")
    }
    spark.stop()
  }
}

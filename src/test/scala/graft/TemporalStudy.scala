package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Temporal

/** Measures the temporal joins' scale posture (SCALING.md, r10) and the
  * ROUTING RULE for the bucketized forms.
  *
  * Two regimes per scale point, because the naive phrasings' cost is a
  * per-key product, not a row count:
  *
  *  - `spread`: the natural user axis (15,000 keys). Per-key products
  *    are small, so Spark's own plan for the naive inequality join — a
  *    sort-merge join with the range as residual (plus AQE flips to
  *    broadcast forms at small sizes) — is competitive or better; the
  *    bucketized rewrite pays explode+shuffle for nothing.
  *  - `dense50`: the same data on `user_id % 50` (50 hot keys, the
  *    few-hot-keys / keyless end of the spectrum). Per-key products
  *    explode quadratically and the bucketized equi-join's bounded
  *    per-bucket work must win — this is the regime the operators
  *    exist for.
  *
  * AS-OF has no regime split: the union-window form is one shuffle of
  * |L|+|R| rows regardless of key density, while the naive join
  * explodes with density — the gap must widen with the factor.
  *
  * Every pair cross-checks row count + a value hash so the cheap plan
  * is proven answer-identical to the naive one at each point.
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
    // The listener bus delivers task-end events in bursts with pauses
    // between flushes; breaking on the FIRST quiet 50 ms interval lets a
    // big cell's tail CPU bleed into the next cell (measured: adjacent
    // cells swapping 10× values between idle runs). Require sustained
    // silence instead.
    def quiesce(): Unit = {
      var prev = cpu.sum(); var quiet = 0; var spins = 0
      while (quiet < 20 && spins < 1200) {
        Thread.sleep(100); spins += 1
        val now = cpu.sum()
        if (now == prev) quiet += 1 else { quiet = 0; prev = now }
      }
    }
    /** min-of-2 CPU core-seconds for one consuming action; returns
      * (cpuS, (rows, hash)) so callers can assert answer equality. */
    def measure(df: => DataFrame, hashCol: String): (Double, (Long, Long)) = {
      var best = Double.MaxValue
      var out: (Long, Long) = (0L, 0L)
      for (_ <- 1 to 3) {
        quiesce(); val c0 = cpu.sum()
        // modular hash so the ANSI-mode sum can't overflow long
        val r = df.agg(count(lit(1)),
          sum(pmod(xxhash64(col(hashCol)), lit(1000000007L)))).collect()(0)
        quiesce(); val c1 = cpu.sum()
        best = math.min(best, (c1 - c0) / 1e9)
        out = (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }
      (best, out)
    }

    val GAP = 1800L * 1000000L
    println(f"${"point"}%-10s ${"pair"}%-16s ${"operator"}%9s ${"naive"}%9s  rows      agree")

    def row(point: String, pair: String, op: (Double, (Long, Long)),
        naive: (Double, (Long, Long))): Unit =
      println(f"$point%-10s $pair%-16s ${op._1}%8.2fs ${naive._1}%8.2fs  ${op._2._1}%-9d ${op._2 == naive._2}")

    // JIT/codegen warm-up so the first measured pair isn't inflated.
    spark.range(1000000).agg(sum(pmod(xxhash64(col("id")), lit(97L)))).collect()

    for (dir <- dirs) {
      val point = dir.split('/').last
      // Same ts branching as Tables.events: scaledata stores BIGINT nanos.
      val raw = spark.read.parquet(s"$dir/events.parquet")
      val ev = raw.withColumn("ts",
        raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            timestamp_micros(expr("ts DIV 1000")).cast("timestamp_ntz")
          case _ => col("ts").cast("timestamp_ntz")
        })

      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts")
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("view_ts"),
          col("event_id").as("view_id"))

      // Optional cell filter for targeted reruns:
      //   TEMPORAL_STUDY_CELLS=resample Test/runMain graft.TemporalStudy
      val cellFilter = sys.env.get("TEMPORAL_STUDY_CELLS").map(_.split(",").toSet)
      def want(name: String): Boolean = cellFilter.forall(_.exists(name.startsWith))

      // -- resample + LOCF -------------------------------------------
      // Operator (algebraic fill: observed cells explode over the span
      // they own — one exchange, no LOCF window) vs the textbook
      // phrasing (dense grid per key, left-join observed cells, then a
      // last(ignoreNulls) window — an extra join + window pass).
      // Cross-check hashes n_obs (exact long), not the mean: double avg
      // is not associative and the two arms aggregate under different
      // partitionings, so means differ in the last ULP (the reason q86
      // uses a decimal-exact mean); value equality is TemporalSpec's
      // job on exact fixtures.
      if (want("resample")) {
        val day = 86400L * 1000000L
        val rsOp = measure(
          Temporal.resampleLocf(ev, Seq("user_id"), "ts", "value", day), "n_obs")
        val rsNv = measure({
          val live = ev.filter(col("user_id").isNotNull && col("ts").isNotNull &&
            col("value").isNotNull)
          val cells = live
            .withColumn("cell", (unix_micros(col("ts").cast("timestamp")) / day).cast("long"))
            .groupBy("user_id", "cell")
            .agg(avg(col("value")).as("mean_v"), count(lit(1)).as("n"))
          val grid = cells.groupBy("user_id")
            .agg(min(col("cell")).as("c0"), max(col("cell")).as("c1"))
            .withColumn("g", explode(sequence(col("c0"), col("c1"))))
            .select("user_id", "g")
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy("g")
          grid.join(cells, grid("user_id") === cells("user_id") && col("g") === col("cell"),
              "left")
            .select(grid("user_id"), col("g"), col("mean_v"), col("n"))
            .withColumn("value", last(col("mean_v"), ignoreNulls = true).over(w))
            .withColumn("n_obs", coalesce(col("n"), lit(0L)))
            .select(col("user_id"), (col("g") * day).as("grid_ts"), col("value"),
              col("n_obs"))
        }, "n_obs")
        row(point, "resample", rsOp, rsNv)
      }

      // -- as-of ------------------------------------------------------
      if (want("asof")) {
      val asofOp = measure(
        Temporal.asOfJoin(purchases, views, Seq("user_id"), "ts", "view_ts",
          rightVals = Seq("view_id"), tieBreak = Seq("view_id")), "view_id")
      val asofNv = measure({
        val j = purchases.join(views,
          purchases("user_id") === views("user_id") && views("view_ts") <= purchases("ts"),
          "left")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(purchases("user_id"), col("event_id"))
          .orderBy(col("view_ts").desc_nulls_last, col("view_id").desc_nulls_last)
        j.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
          .select(purchases("user_id"), col("event_id"), col("view_id"))
      }, "view_id")
      row(point, "asof", asofOp, asofNv)
      }

      // -- keyless range (sf0.1 only): naive = true nested loop -------
      if (want("range") && point == "sf0.1") {
        val nav0 = ev.filter(col("event_type").isin("view", "click"))
        val sess0 = Temporal.sessionIntervals(nav0, Seq("user_id"), "ts", GAP,
            tieBreak = Seq("event_id"))
          .select("session_start", "session_end", "n_events")
        val pts0 = purchases.select("event_id", "ts")
        val klOp = measure(
          Temporal.rangeJoin(pts0, sess0, Nil, "ts",
            "session_start", "session_end", bucketWidth = GAP), "event_id")
        val klNv = measure(
          pts0.join(sess0,
            sess0("session_start") <= pts0("ts") &&
              pts0("ts") <= sess0("session_end"), "inner")
            .select(pts0("event_id"), col("n_events")), "event_id")
        row(point, "range/keyless", klOp, klNv)
      }

      // -- range + overlap, both regimes ------------------------------
      // Dense regime stops at sf1: its naive arm is ~2e10 residual pairs
      // at sf3 (hours of CPU to measure a foregone conclusion).
      for (dense <- Seq(false, true) if !dense || point != "sf3") {
        val tag = if (dense) "dense50" else "spread"
        // Dense regime: sessions are built PER USER and only the join
        // key is coarsened afterwards — the realistic "many overlapping
        // windows share one key-class" shape. (Coarsening before
        // sessionization would interleave 300 users' events into one
        // giant merged session per key and collapse the very per-key
        // interval count the regime exists to inflate.)
        def rekey(df: DataFrame): DataFrame =
          if (dense) df.withColumn("user_id", pmod(col("user_id"), lit(50L))) else df

        val nav = ev.filter(col("event_type").isin("view", "click"))
        val sessions = rekey(Temporal.sessionIntervals(nav, Seq("user_id"), "ts", GAP,
          tieBreak = Seq("event_id")))
        val pts = rekey(purchases)
        if (want("range")) {
        val rangeOp = measure(
          Temporal.rangeJoin(pts, sessions, Seq("user_id"), "ts",
            "session_start", "session_end", bucketWidth = GAP), "session_seq")
        val rangeNv = measure({
          val s = sessions.withColumnRenamed("user_id", "s_uid")
          pts.join(s,
            pts("user_id") === s("s_uid") &&
              s("session_start") <= pts("ts") &&
              pts("ts") <= s("session_end"), "inner")
            .select(pts("user_id"), col("event_id"), col("session_seq"))
        }, "session_seq")
        row(point, s"range/$tag", rangeOp, rangeNv)
        }

        if (!want("overlap")) () else {
        def sess(kind: String, p: String) =
          rekey(Temporal.sessionIntervals(ev.filter(col("event_type") === kind),
              Seq("user_id"), "ts", GAP, tieBreak = Seq("event_id")))
            .select(col("user_id"), col("session_seq").as(s"${p}_seq"),
              col("session_start").as(s"${p}_start"), col("session_end").as(s"${p}_end"))
        val vs = sess("view", "v")
        val cs = sess("click", "c")
        val ovOp = measure(
          Temporal.intervalOverlapJoin(vs, cs, Seq("user_id"),
            "v_start", "v_end", "c_start", "c_end",
            bucketWidth = GAP, maxBucketsPerInterval = 4096), "c_seq")
        val ovNv = measure({
          val c2 = cs.withColumnRenamed("user_id", "c_uid")
          vs.join(c2, vs("user_id") === c2("c_uid") &&
              vs("v_start") <= c2("c_end") && c2("c_start") <= vs("v_end"), "inner")
            .select(vs("user_id"), col("v_seq"), col("c_seq"))
        }, "c_seq")
        row(point, s"overlap/$tag", ovOp, ovNv)
        }
      }
    }
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Temporal joins: asOfJoin / sessionIntervals / rangeJoin /
  * intervalOverlapJoin — each checked against a naive join/window
  * phrasing on data small enough for the quadratic form. */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private val MIN = 60L * 1000000L // one minute in micros

  // (key, ts-micros, payload) fixtures built as plain longs so the
  // naive oracle is trivially expressible.
  private def L(rows: (Long, Long)*): DataFrame =
    rows.toSeq.toDF("k", "lts")
  private def R(rows: (Long, Long, String)*): DataFrame =
    rows.toSeq.toDF("k", "rts", "v")

  /** Naive as-of: inequality join + keep latest (rts, v) per left row. */
  private def naiveAsOf(left: DataFrame, right: DataFrame, inclusive: Boolean,
      tol: Option[Long] = None): DataFrame = {
    val cond = left("k") === right("k") &&
      (if (inclusive) right("rts") <= left("lts") else right("rts") < left("lts")) &&
      tol.map(t => left("lts") - right("rts") <= t).getOrElse(lit(true))
    val joined = left.join(right, cond, "left")
      .select(left("k"), left("lts"), right("rts"), right("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k", "lts")
      .orderBy(col("rts").desc_nulls_last, col("v").desc_nulls_last)
    joined.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("k"), col("lts"), col("rts").as("m_rts"), col("v").as("m_v"))
  }

  test("asOfJoin matches the naive inequality join (inclusive and exclusive)") {
    val left = L((1L, 100L), (1L, 200L), (1L, 300L), (2L, 150L), (3L, 10L))
    val right = R((1L, 100L, "a"), (1L, 250L, "b"), (2L, 150L, "c"), (2L, 149L, "d"))
    for (inc <- Seq(true, false)) {
      val got = Temporal.asOfJoin(left, right, Seq("k"), "lts", "rts",
        rightVals = Seq("rts", "v"), tieBreak = Seq("v"), inclusive = inc)
        .withColumnRenamed("rts", "m_rts").withColumnRenamed("v", "m_v")
      assertSameRows(got, naiveAsOf(left, right, inc))
    }
  }

  test("asOfJoin: equal-time right rows break ties by the greatest tieBreak") {
    val left = L((1L, 100L))
    val right = R((1L, 100L, "a"), (1L, 100L, "z"), (1L, 100L, "m"))
    val got = Temporal.asOfJoin(left, right, Seq("k"), "lts", "rts",
      rightVals = Seq("v"), tieBreak = Seq("v")).collect()
    assert(got.map(_.getString(2)).toSeq == Seq("z"))
  }

  test("asOfJoin: a right row with a genuinely-null payload is still the match") {
    // The struct pack must win here; per-column last(ignoreNulls) would
    // skip the null and resurrect "old".
    val left = L((1L, 300L))
    val right = Seq((1L, 100L, Some("old")), (1L, 200L, Option.empty[String]))
      .toDF("k", "rts", "v")
    val got = Temporal.asOfJoin(left, right, Seq("k"), "lts", "rts",
      rightVals = Seq("rts", "v"), tieBreak = Seq("rts"))
    val row = got.collect().head
    assert(row.getLong(2) == 200L && row.isNullAt(3))
  }

  test("asOfJoin: tolerance nulls out stale matches; null keys/ts never match") {
    val left = L((1L, 1000L), (1L, 5000L))
    val right = R((1L, 900L, "x"))
    val got = Temporal.asOfJoin(left, right, Seq("k"), "lts", "rts",
      rightVals = Seq("v"), toleranceMicros = Some(500L))
      .orderBy("lts").collect()
    assert(got(0).getString(2) == "x" && got(1).isNullAt(2))

    val nullRight = Seq((Option.empty[java.lang.Long], Option(50L), "n"))
      .toDF("k", "rts", "v")
      .select(col("k").cast("long"), col("rts").cast("long").as("rts"), col("v"))
    val got2 = Temporal.asOfJoin(L((1L, 100L)), nullRight, Seq("k"), "lts", "rts",
      rightVals = Seq("v"))
    assert(got2.collect().head.isNullAt(2))
  }

  test("asOfJoin forward/nearest match their naive phrasings") {
    val left = L((1L, 100L), (1L, 200L), (1L, 300L), (2L, 150L), (3L, 10L))
    val right = R((1L, 100L, "a"), (1L, 250L, "b"), (1L, 120L, "c"),
      (2L, 150L, "d"), (2L, 90L, "e"))

    def naive(dirn: String, inc: Boolean): DataFrame = {
      val fits = dirn match {
        case "forward" => if (inc) right("rts") >= left("lts") else right("rts") > left("lts")
        case _ => lit(true) // nearest: any side (strictness below)
      }
      val strictOk = if (inc) lit(true) else right("rts") =!= left("lts")
      val j = left.join(right, left("k") === right("k") && fits && strictOk, "left")
        .select(left("k"), left("lts"), right("rts"), right("v"))
      val dist = abs(col("rts") - col("lts"))
      val backPref = when(col("rts") <= col("lts"), 0).otherwise(1)
      val order = dirn match {
        case "forward" => Seq(col("rts").asc_nulls_last, col("v").desc_nulls_last)
        case "nearest" => Seq(dist.asc_nulls_last, backPref.asc, col("v").desc_nulls_last)
      }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k", "lts").orderBy(order: _*)
      j.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select(col("k"), col("lts"), col("rts").as("m_rts"), col("v").as("m_v"))
    }
    for (dirn <- Seq("forward", "nearest"); inc <- Seq(true, false)) {
      val got = Temporal.asOfJoin(left, right, Seq("k"), "lts", "rts",
        rightVals = Seq("rts", "v"), tieBreak = Seq("v"), inclusive = inc,
        direction = dirn)
        .withColumnRenamed("rts", "m_rts").withColumnRenamed("v", "m_v")
      assertSameRows(got, naive(dirn, inc))
    }
  }

  test("asOfJoin nearest: exact distance tie prefers the backward match") {
    val left = L((1L, 100L))
    val right = R((1L, 90L, "back"), (1L, 110L, "fwd"))
    val got = Temporal.asOfJoin(left, right, Seq("k"), "lts", "rts",
      rightVals = Seq("v"), direction = "nearest").collect()
    assert(got.head.getString(2) == "back")
  }

  test("asOfJoin forward: tolerance bounds the look-ahead") {
    val left = L((1L, 1000L))
    val right = R((1L, 1400L, "near"), (1L, 9000L, "far"))
    val got = Temporal.asOfJoin(left, right, Seq("k"), "lts", "rts",
      rightVals = Seq("v"), direction = "forward", toleranceMicros = Some(500L))
    assert(got.collect().head.getString(2) == "near")
    val none = Temporal.asOfJoin(left,
      right.filter(col("v") === "far"), Seq("k"), "lts", "rts",
      rightVals = Seq("v"), direction = "forward", toleranceMicros = Some(500L))
    assert(none.collect().head.isNullAt(2))
  }

  test("asOfJoin: colliding right value names take the suffix") {
    val left = Seq((1L, 100L, "mine")).toDF("k", "lts", "v")
    val right = R((1L, 50L, "theirs"))
    val got = Temporal.asOfJoin(left, right, Seq("k"), "lts", "rts", rightVals = Seq("v"))
    assert(got.columns.toSeq == Seq("k", "lts", "v", "v_r"))
    val row = got.collect().head
    assert(row.getString(2) == "mine" && row.getString(3) == "theirs")
  }

  test("sessionIntervals: gap splits, bounds and counts") {
    val df = Seq(
      (1L, 0L), (1L, 10L * MIN), (1L, 50L * MIN), // gap 40min splits
      (2L, 5L * MIN)
    ).toDF("k", "ts")
    val got = Temporal.sessionIntervals(df, Seq("k"), "ts", 30L * MIN)
      .orderBy("k", "session_seq").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq ==
      Seq((1L, 1L, 0L, 10L * MIN, 2L), (1L, 2L, 50L * MIN, 50L * MIN, 1L),
        (2L, 1L, 5L * MIN, 5L * MIN, 1L)))
  }

  private def naiveRange(points: DataFrame, iv: DataFrame, inclusiveHi: Boolean): DataFrame = {
    val cond = points("k") === iv("k") && iv("lo") <= points("p") &&
      (if (inclusiveHi) points("p") <= iv("hi") else points("p") < iv("hi"))
    points.join(iv, cond, "inner")
      .select(points("k"), points("p"), iv("lo"), iv("hi"), iv("tag"))
  }

  test("rangeJoin matches the naive inequality join, both boundary modes") {
    val points = Seq((1L, 5L), (1L, 100L), (1L, 250L), (2L, 5L), (1L, -7L))
      .toDF("k", "p")
    val iv = Seq((1L, 0L, 10L, "a"), (1L, 10L, 300L, "b"), (1L, -20L, -5L, "neg"),
      (2L, 100L, 200L, "far"), (1L, 30L, 20L, "malformed"))
      .toDF("k", "lo", "hi", "tag")
    for (inc <- Seq(true, false)) {
      val got = Temporal.rangeJoin(points, iv, Seq("k"), "p", "lo", "hi",
        bucketWidth = 16L, inclusiveHi = inc)
      assertSameRows(got, naiveRange(points, iv, inc))
    }
  }

  test("rangeJoin: wide intervals route through the broadcast stratum, same result") {
    val points = Seq((1L, 5L), (1L, 5000L), (1L, 999999L)).toDF("k", "p")
    val iv = Seq((1L, 0L, 1000000L, "wide"), (1L, 4990L, 5010L, "narrow"))
      .toDF("k", "lo", "hi", "tag")
    // width 16 → the "wide" interval covers 62k buckets >> 256 cap.
    val got = Temporal.rangeJoin(points, iv, Seq("k"), "p", "lo", "hi",
      bucketWidth = 16L, maxBucketsPerInterval = Some(256))
    assertSameRows(got, naiveRange(points, iv, inclusiveHi = true))
  }

  test("rangeJoin: keyless form works (single shared bucket axis)") {
    val points = Seq(Tuple1(5L), Tuple1(42L)).toDF("p")
    val iv = Seq((0L, 10L, "a"), (40L, 50L, "b"), (100L, 110L, "c")).toDF("lo", "hi", "tag")
    val got = Temporal.rangeJoin(points, iv, Nil, "p", "lo", "hi", bucketWidth = 8L)
      .orderBy("p").collect()
    assert(got.map(_.getString(3)).toSeq == Seq("a", "b"))
  }

  test("rangeJoinAuto routes by per-key product and is answer-invariant") {
    val points = Seq((1L, 5L), (1L, 100L), (2L, 5L)).toDF("k", "p")
    val iv = Seq((1L, 0L, 10L, "a"), (1L, 90L, 300L, "b"), (2L, 0L, 10L, "c"))
      .toDF("k", "lo", "hi", "tag")
    def hasExplode(df: DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("Generate")
    // spread fixture: per-key product ~2 < default 1e5 → naive route
    val spread = Temporal.rangeJoinAuto(points, iv, Seq("k"), "p", "lo", "hi",
      bucketWidth = 16L)
    assert(!hasExplode(spread), "spread keys must route to the naive join")
    // forced-dense: threshold 1 → bucketized route
    val densed = Temporal.rangeJoinAuto(points, iv, Seq("k"), "p", "lo", "hi",
      bucketWidth = 16L, perKeyProductThreshold = 1L)
    assert(hasExplode(densed), "above-threshold input must route to the bucketized join")
    assertSameRows(spread, densed)
    assertSameRows(spread,
      Temporal.rangeJoinNaive(points, iv, Seq("k"), "p", "lo", "hi"))
    // keyless always bucketizes (naive would be a nested loop)
    val kl = Temporal.rangeJoinAuto(points.select("p"), iv.select("lo", "hi", "tag"),
      Nil, "p", "lo", "hi", bucketWidth = 16L)
    assert(hasExplode(kl), "keyless must route to the bucketized join")
  }

  test("intervalOverlapJoinAuto routes and agrees with both phrasings") {
    val a = Seq((1L, 0L, 100L, "a1"), (2L, 0L, 10L, "a2")).toDF("k", "lo", "hi", "tag")
    val b = Seq((1L, 50L, 250L, "b1"), (2L, 5L, 20L, "b2")).toDF("k", "lo", "hi", "tag")
    def hasExplode(df: DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("Generate")
    val spread = Temporal.intervalOverlapJoinAuto(a, b, Seq("k"),
      "lo", "hi", "lo", "hi", bucketWidth = 64L)
    assert(!hasExplode(spread))
    val densed = Temporal.intervalOverlapJoinAuto(a, b, Seq("k"),
      "lo", "hi", "lo", "hi", bucketWidth = 64L, perKeyProductThreshold = 1L)
    assert(hasExplode(densed))
    assertSameRows(spread, densed)
    assertSameRows(spread,
      Temporal.intervalOverlapJoinNaive(a, b, Seq("k"), "lo", "hi", "lo", "hi"))
  }

  test("intervalOverlapJoin: each overlapping pair exactly once, matches naive") {
    val a = Seq((1L, 0L, 100L, "a1"), (1L, 200L, 300L, "a2"), (2L, 0L, 10L, "a3"))
      .toDF("k", "lo", "hi", "tag")
    val b = Seq((1L, 50L, 250L, "b1"), (1L, 90L, 95L, "b2"), (2L, 11L, 20L, "b3"))
      .toDF("k", "lo", "hi", "tag")
    val got = Temporal.intervalOverlapJoin(a, b, Seq("k"), "lo", "hi", "lo", "hi",
      bucketWidth = 16L, maxBucketsPerInterval = 64)
    val naive = a.join(b.withColumnRenamed("lo", "lo_b").withColumnRenamed("hi", "hi_b")
        .withColumnRenamed("tag", "tag_b"), Seq("k"))
      .filter(col("lo") <= col("hi_b") && col("lo_b") <= col("hi"))
    assertSameRows(got, naive.select(got.columns.map(col).toSeq: _*))
    // a1×b1 share many buckets — exactly-once is the point:
    assert(got.filter(col("tag") === "a1" && col("tag_b") === "b1").count() == 1L)
  }

  test("intervalOverlapJoin raises loudly on an over-wide interval") {
    val a = Seq((1L, 0L, 100000L, "wide")).toDF("k", "lo", "hi", "tag")
    val b = Seq((1L, 5L, 6L, "b")).toDF("k", "lo", "hi", "tag")
    val e = intercept[Exception] {
      Temporal.intervalOverlapJoin(a, b, Seq("k"), "lo", "hi", "lo", "hi",
        bucketWidth = 16L, maxBucketsPerInterval = 8).collect()
    }
    assert(e.getMessage != null)
  }

  test("resampleLocf: grid coverage, cell means, forward-fill, one exchange") {
    // key 1: cells 0 (two obs) and 3 (one obs) → grid rows 0,1,2,3 with
    // LOCF from cell 0 over the 1,2 gap; key 2: a single cell.
    val df = Seq(
      (1L, 5L, 10.0), (1L, 9L, 30.0), (1L, 35L, 7.0),
      (2L, 12L, 1.0)
    ).toDF("k", "ts", "v")
    val got = Temporal.resampleLocf(df, Seq("k"), "ts", "v", gridMicros = 10L)
      .orderBy("k", "grid_ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, 0L, 20.0, 2L), (1L, 10L, 20.0, 0L), (1L, 20L, 20.0, 0L),
      (1L, 30L, 7.0, 1L), (2L, 10L, 1.0, 1L)))

    val plan = Temporal.resampleLocf(df, Seq("k"), "ts", "v", 10L)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"resampleLocf must be one shuffle, got $exchanges:\n$plan")
  }

  test("resampleLocf: null keys/ts/values drop; custom cell aggregate applies") {
    val df = Seq(
      (Option(1L), Option(5L), Option(2.0)),
      (Option(1L), Option(6L), Option(4.0)),
      (Option.empty[Long], Option(7L), Option(9.0)),
      (Option(1L), Option.empty[Long], Option(9.0)),
      (Option(1L), Option(8L), Option.empty[Double])
    ).toDF("k", "ts", "v")
    val got = Temporal.resampleLocf(df, Seq("k"), "ts", "v", 10L,
      cellAgg = Some(max(col("v")))).collect()
    assert(got.length == 1)
    assert(got.head.getDouble(2) == 4.0 && got.head.getLong(3) == 2L)
  }

  test("resampleInterpolate: integral floor fill, double fill, ends exact, one exchange") {
    // integral path: key 1 observes cells 0 (sum 100) and 3 (sum 400) →
    // the 1,2 gap lies on the line (200, 300); key 2 observes 0 (10)
    // and 3 (12) → floor fill 10 + 2·g//3 = (10, 11); key 3 is a
    // single cell (no fill, no extrapolation).
    val df = Seq(
      (1L, 5L, 100L), (1L, 35L, 400L),
      (2L, 1L, 10L), (2L, 33L, 12L),
      (3L, 12L, 9L)
    ).toDF("k", "ts", "v")
    val got = Temporal.resampleInterpolate(df, Seq("k"), "ts", "v", 10L,
        cellAgg = Some(sum(col("v"))))
      .orderBy("k", "grid_ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, 0L, 100L, 1L), (1L, 10L, 200L, 0L), (1L, 20L, 300L, 0L),
      (1L, 30L, 400L, 1L),
      (2L, 0L, 10L, 1L), (2L, 10L, 10L, 0L), (2L, 20L, 11L, 0L),
      (2L, 30L, 12L, 1L),
      (3L, 10L, 9L, 1L)))

    // default mean (double) path: 10.0 at cell 0, 13.0 at cell 2 → 11.5
    val dbl = Seq((1L, 5L, 10.0), (1L, 25L, 13.0)).toDF("k", "ts", "v")
    val gd = Temporal.resampleInterpolate(dbl, Seq("k"), "ts", "v", 10L)
      .orderBy("grid_ts").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(gd == Seq((0L, 10.0, 1L), (10L, 11.5, 0L), (20L, 13.0, 1L)))

    // negative slope floors toward -inf (the DuckDB // semantics)
    val neg = Seq((1L, 5L, 0L), (1L, 35L, -2L)).toDF("k", "ts", "v")
    val gn = Temporal.resampleInterpolate(neg, Seq("k"), "ts", "v", 10L,
        cellAgg = Some(sum(col("v"))))
      .orderBy("grid_ts").collect().map(_.getLong(2)).toSeq
    assert(gn == Seq(0L, -1L, -2L, -2L))

    val plan = Temporal.resampleInterpolate(df, Seq("k"), "ts", "v", 10L,
        cellAgg = Some(sum(col("v"))))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"resampleInterpolate must be one shuffle, got $exchanges:\n$plan")
  }

  test("funnel: greedy-earliest, strict-after, span bound, anchored, gap-free") {
    // numeric ts (micros) — the operator takes them as-is
    val ev = Seq(
      // user 1: full A→B→C, but note B at t=5 is BEFORE A's earliest
      // (t=10): strict-after must skip it and take B at 20
      (1L, 10L, "A"), (1L, 5L, "B"), (1L, 20L, "B"), (1L, 30L, "C"),
      // user 2: ties do not advance — B at the same ts as A is not
      // "after" it; no later B, so the funnel stops at step 1
      (2L, 10L, "A"), (2L, 10L, "B"), (2L, 40L, "C"),
      // user 3: never did A — absent from the output (anchored)
      (3L, 10L, "B"), (3L, 20L, "C"),
      // user 4: B exists but only outside the span bound
      (4L, 10L, "A"), (4L, 1000L, "B")
    ).toDF("u", "ts", "step")
    val out = Temporal.funnel(ev, "u", "ts", "step", Seq("A", "B", "C"),
        maxSpanSec = None)
      .collect().map(r => r.getLong(0) ->
        ((r.get(1), r.get(2), r.get(3), r.getLong(4)))).toMap
    assert(out.keySet == Set(1L, 2L, 4L), "anchored: user 3 absent")
    assert(out(1L)._4 == 3L, s"user 1 completes all three: ${out(1L)}")
    assert(out(2L)._4 == 1L, "equal timestamps do not advance the funnel")
    assert(out(2L)._2 == null && out(2L)._3 == null,
      "no gaps: steps after the break are null")
    // span bound: 1000 - 10 micros is inside any seconds-scale span, so
    // bound with 0 seconds → only the anchor completes
    val bounded = Temporal.funnel(ev.filter(col("u") === 4L), "u", "ts", "step",
        Seq("A", "B"), maxSpanSec = Some(0L))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(bounded(4L) == 1L, "span 0: nothing after the anchor qualifies")
    val unbounded = Temporal.funnel(ev.filter(col("u") === 4L), "u", "ts", "step",
        Seq("A", "B"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(unbounded(4L) == 2L)
  }

  test("retentionCohorts: cohort by first bucket, offset-0 rows are cohort sizes") {
    val W = 100L // bucket width in micro-ts units
    val ev = Seq(
      // users 1,2 start in bucket 0; user 1 returns in buckets 1 and 3
      (1L, 5L), (1L, 105L), (1L, 340L),
      (2L, 50L),
      // user 3 starts in bucket 2, returns in bucket 3
      (3L, 250L), (3L, 350L),
      // duplicate activity in one bucket counts once
      (2L, 60L)
    ).toDF("u", "ts")
    val got = Temporal.retentionCohorts(ev, "u", "ts", bucketUs = W)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (0L, 0L) -> 2L, // cohort 0 = users 1,2
      (0L, 1L) -> 1L, (0L, 3L) -> 1L, // user 1's returns
      (2L, 0L) -> 1L, (2L, 1L) -> 1L // user 3's cohort and return
    ), s"got $got")
    // null keys/ts never cohort; empty input yields the empty matrix
    val withNulls = Seq((Option(9L), Option(5L)), (None, Option(7L)),
      (Option(10L), None)).toDF("u", "ts")
    assert(Temporal.retentionCohorts(withNulls, "u", "ts", W).count() == 1)
    assert(Temporal.retentionCohorts(ev.limit(0), "u", "ts", W).isEmpty)
  }

  test("rollingActive: trailing-window distinct counts, gap buckets, dedup within window") {
    val W = 100L // bucket width in micro-ts units
    val ev = Seq(
      (1L, 5L), (1L, 50L), // user 1 twice in bucket 0 — counts once
      (2L, 150L), // user 2 in bucket 1
      (1L, 450L), // user 1 again in bucket 4
      (3L, 450L) // user 3 in bucket 4 (the corpus max)
    ).toDF("u", "ts")
    val got = Temporal.rollingActive(ev, "u", "ts", bucketUs = W,
        windowBuckets = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      0L -> ((1L, 1L)), // user 1
      1L -> ((2L, 1L)), // users 1 (window), 2 (own)
      2L -> ((2L, 0L)), // gap bucket kept alive by 0 and 1
      3L -> ((1L, 0L)), // only user 2's window still covers
      4L -> ((2L, 2L)) // users 1, 3 own-bucket
    ), s"got $got")
    // a key active twice inside one window counts once per bucket
    assert(got(1L)._1 == 2L)
    // windows never run past the corpus max (no phantom buckets 5, 6)
    assert(!got.contains(5L) && !got.contains(6L))
    // null keys/ts drop; empty input yields the empty relation
    val withNulls = Seq((Option(9L), Option(5L)), (None, Option(7L)),
      (Option(10L), None)).toDF("u", "ts")
    assert(Temporal.rollingActive(withNulls, "u", "ts", W, 3).count() == 1)
    assert(Temporal.rollingActive(ev.limit(0), "u", "ts", W, 3).isEmpty)
  }

  test("asOfJoin is the batch twin of the q20 window phrasing on real events") {
    val t = graft.Tables(spark, "/root/testdata/sf0.001")
    val ev = t.events
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("signup_ts"), col("event_id").as("signup_id"))
    val got = Temporal.asOfJoin(purchases, signups, Seq("user_id"), "ts", "signup_ts",
      rightVals = Seq("signup_ts"), tieBreak = Seq("signup_id"))
      .select(col("user_id"), col("event_id"), col("signup_ts").as("last_signup_ts"))
    // q20's phrasing: strict window max over prior rows. q20 uses
    // rowsBetween(..., -1) with (ts, event_id) ordering — at distinct
    // microsecond timestamps that equals inclusive-as-of semantics
    // minus self-matches; signups≠purchases so no self rows exist.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val want = ev
      .withColumn("last_signup_ts",
        max(when(col("event_type") === "signup", col("ts"))).over(w))
      .filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "last_signup_ts")
    assertSameRows(got, want)
  }

  test("intervalCoverage: merged overlaps, touching stays split, degenerates drop") {
    import spark.implicits._
    val iv = Seq(
      // key a: [0,10) ∪ [5,20) merge → [0,20); [20,25) touches → own
      // island; [30,31) separate; [8,8) zero-length drops; [9,4)
      // inverted drops
      ("a", 0L, 10L), ("a", 5L, 20L), ("a", 20L, 25L), ("a", 30L, 31L),
      ("a", 8L, 8L), ("a", 9L, 4L),
      // key b: containment — [0,100) swallows [10,20) and [50,60)
      ("b", 0L, 100L), ("b", 10L, 20L), ("b", 50L, 60L)
    ).toDF("k", "lo", "hi")
    val got = Temporal.intervalCoverage(iv, Seq("k"), "lo", "hi")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == Map(
      "a" -> ((4L, 3L, 26L)),   // 4 kept intervals, islands [0,20)[20,25)[30,31), 20+5+1
      "b" -> ((3L, 1L, 100L))))
    // null keys/bounds contribute nothing
    val withNulls = iv.union(Seq((null: String, 0L, 5L)).toDF("k", "lo", "hi"))
    assert(Temporal.intervalCoverage(withNulls, Seq("k"), "lo", "hi")
      .count() == 2L)
  }

  test("peakConcurrency: overlap peak, closes-before-opens at ties, degenerates drop") {
    import spark.implicits._
    val iv = Seq(
      // key a: [0,10) [5,20) [8,12) — all three open on [8,10) → peak 3
      ("a", 0L, 10L), ("a", 5L, 20L), ("a", 8L, 12L),
      // key b: touching [0,5) [5,10) never overlap (close applies first)
      ("b", 0L, 5L), ("b", 5L, 10L),
      // key c: degenerate + inverted drop, one real interval remains
      ("c", 3L, 3L), ("c", 9L, 2L), ("c", 1L, 4L)
    ).toDF("k", "lo", "hi")
    val got = Temporal.peakConcurrency(iv, Seq("k"), "lo", "hi")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(
      "a" -> ((3L, 3L)),
      "b" -> ((1L, 2L)),
      "c" -> ((1L, 1L))))
  }

  test("transitionMatrix: ordered pairs, tie-broken, permille floors") {
    import spark.implicits._
    // user 1: A→B→A (ties on ts broken by event_id: 2 before 3)
    // user 2: A→A
    val ev = Seq(
      (1L, 1L, 100L, "A"), (1L, 2L, 200L, "B"), (1L, 3L, 200L, "A"),
      (2L, 4L, 50L, "A"), (2L, 5L, 60L, "A")
    ).toDF("user", "eid", "t", "state")
    val got = Temporal.transitionMatrix(ev, "user", "t", "eid", "state")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // from A: A→B (u1) and A→A (u2) → 2 total; from B: B→A (u1)
    assert(got == Map(
      ("A", "B") -> ((1L, 500L)),
      ("A", "A") -> ((1L, 500L)),
      ("B", "A") -> ((1L, 1000L))))
    // reversing the tie order flips the u1 chain: A→A→B
    val flipped = Seq(
      (1L, 3L, 100L, "A"), (1L, 2L, 200L, "B"), (1L, 1L, 200L, "A"))
      .toDF("user", "eid", "t", "state")
    val g2 = Temporal.transitionMatrix(flipped, "user", "t", "eid", "state")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(g2 == Map(("A", "A") -> 1L, ("A", "B") -> 1L))
  }
}

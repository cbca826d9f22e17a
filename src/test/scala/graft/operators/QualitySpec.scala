package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Quality._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1, 10.0), (2, -5.0), (3, 200.0), (4, 50.0)).toDF("k", "v")

  test("audit returns one row per gate with violation counts from a single scan") {
    val out = audit(fixture, Seq(
      Gate("negative", $"v" < 0),
      Gate("huge", $"v" > 100),
      Gate("never", lit(false))))
    val m = out.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m == Map("negative" -> ((1L, 4L)), "huge" -> ((1L, 4L)), "never" -> ((0L, 4L))))
  }

  test("enforce throws on violations, passes on clean gates") {
    enforce(fixture, Seq(Gate("none", $"v" > 1e9)))
    val e = intercept[IllegalStateException] {
      enforce(fixture, Seq(Gate("neg", $"v" < 0)))
    }
    assert(e.getMessage.contains("neg=1"))
  }

  test("profile: one row per column with null/distinct/min-max, single scan") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (Some(1L), "b"), (Some(2L), "a"), (None, "a"), (Some(2L), null))
      .toDF("num", "txt")
    val p = profile(df, Seq("num", "txt")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(p("num") == ((4L, 1L, 2L, "1", "2")))
    assert(p("txt") == ((4L, 1L, 2L, "a", "b")))
    // single scan: exactly one aggregate source, no join/union in the plan
    val plan = profile(df, Seq("num", "txt")).queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Union"))
    // the approx variant still produces a sane distinct estimate
    val ap = profile(df, Seq("txt"), exactDistinct = false)
      .select(col("n_distinct")).head().getLong(0)
    assert(ap == 2L)
  }

  test("tableChecksum: row/partition-order independent, any value change detected") {
    import org.apache.spark.sql.functions.{col, when}
    val df = Seq((1L, "a", Some("x")), (2L, "b", None), (3L, "a|b", Some("v1:y")))
      .toDF("k", "s", "t")
    def sum(d: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = tableChecksum(d, Seq("k", "s", "t")).head()
      (r.getLong(0), r.getLong(1))
    }
    val base = sum(df)
    assert(base == sum(df.orderBy(col("k").desc)))     // row order
    assert(base == sum(df.repartition(7)))             // partitioning
    // any single value change moves the checksum
    assert(base != sum(df.withColumn("s",
      when(col("k") === 2L, "B").otherwise(col("s")))))
    // null vs the string "n" are distinct under the injective encoding
    assert(base != sum(df.withColumn("t",
      when(col("t").isNull, "n").otherwise(col("t")))))
  }

  test("requireRowConservation is the G3 law") {
    requireRowConservation(fixture, fixture.select("k"))
    intercept[IllegalStateException] {
      requireRowConservation(fixture, fixture.filter($"v" > 0))
    }
  }

  test("skewReport flags the row-skewed key AQE's byte heuristic misses") {
    // the SkewStudy fixture shape (SCALING.md r13): half the rows on ONE
    // constant key — post-pruning that partition compresses below AQE's
    // skewedPartitionThresholdInBytes and the split never fires, a pure
    // row-based straggler invisible to the byte heuristic. The ROW-share
    // report is loud about it.
    val df = spark.range(10000).select(
      when(col("id") < 5000, lit(0L)).otherwise(col("id")).as("k"),
      col("id").as("v"))
    val rep = Quality.skewReport(df, Seq("k"), topN = 3).collect()
    assert(rep.length == 3)
    assert(rep.head.getAs[Long]("k") == 0L)
    assert(rep.head.getAs[Long]("n_rows") == 5000L)
    assert(rep.head.getAs[Long]("share_permille") == 500L,
      "exact integral share: 5000 of 10000 rows = 500 permille")
    assert(rep.tail.forall(_.getAs[Long]("share_permille") == 0L),
      "singleton keys floor to 0 permille")
    // the DQ-gate form names the hot key and its share
    val e = intercept[IllegalStateException](
      Quality.enforceKeyBalance(df, Seq("k"), maxSharePermille = 300))
    assert(e.getMessage.contains("k=0") && e.getMessage.contains("500"))
    // a balanced relation passes the same gate
    Quality.enforceKeyBalance(spark.range(1000).toDF("k"), Seq("k"),
      maxSharePermille = 10)
    // integral division (div), never float: 2 of 3 rows = 666, 1 of 3 = 333
    val thirds = Seq(1, 1, 2).toDF("k")
    assert(Quality.skewReport(thirds, Seq("k")).collect()
      .map(r => r.getAs[Int]("k") -> r.getAs[Long]("share_permille")).toMap
      == Map(1 -> 666L, 2 -> 333L))
    // deterministic top-N cut: ties broken by key ascending
    val ties = Seq(5, 5, 3, 3, 9, 9).toDF("k")
    assert(Quality.skewReport(ties, Seq("k"), topN = 2).collect()
      .map(_.getAs[Int]("k")).toSeq == Seq(3, 5))
  }

  test("binnedHistogram: clamped edges, closed upper bound, null bin, degenerate bounds") {
    val df = Seq[java.lang.Double](0.0, 5.0, 9.999, 10.0, -3.0, 42.0, null)
      .toDF("v")
    val bins = binnedHistogram(df, "v", nBins = 10, lo = 0.0, hi = 10.0)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(bins(-1) == 1L, "null row counts in bin -1")
    assert(bins(0) == 2L, "0.0 in bin 0; -3.0 clamps into bin 0")
    assert(bins(5) == 1L)
    assert(bins(9) == 3L, "9.999 in bin 9; 10.0 (closed edge) and 42.0 clamp in")
    val degenerate = binnedHistogram(Seq(7.0, 7.0).toDF("v"), "v", 10, 7.0, 7.0)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(degenerate == Map(0 -> 2L), "hi == lo puts everything in bin 0")
    // EXTREME outliers clamp into the edge bins instead of overflowing
    // the integer cast (an ANSI-mode throw — and garbage magnitudes are
    // exactly what a drift gate exists to catch, not die on)
    val extreme = binnedHistogram(Seq(1e300, -1e300).toDF("v"), "v", 10, 0.0, 10.0)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(extreme == Map(9 -> 1L, 0 -> 1L), s"extremes must clamp, got $extreme")
  }

  test("distributionDrift: identical snapshots are 0; disjoint are 2000 permille") {
    val a = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    assert(driftL1Permille(distributionDrift(a, a, "v", 4)) == 0L)
    // shifted: all current mass clamps into the ref's top bin — the
    // ref's own 250permille there overlaps, so L1 = 3·250 + |250−1000|
    // = 1500 exactly (clamping deliberately keeps outliers VISIBLE as
    // drift rather than dropping them outside the bin range)
    val far = Seq(100.0, 101.0).toDF("v")
    assert(driftL1Permille(distributionDrift(a, far, "v", 4)) == 1500L)
    enforceDistributionStability(a, a, "v", maxL1Permille = 0)
    intercept[IllegalStateException] {
      enforceDistributionStability(a, far, "v", maxL1Permille = 500)
    }
  }

  test("quantileProfile: lower-nearest exact selection, duplicate targets, empties") {
    import spark.implicits._
    // n = 10 values 0..9 → p500 target = 9*500 div 1000 = 4 → value 4
    val v = (0 until 10).map(_.toDouble).toDF("x")
    val got = Quality.quantileProfile(v, "x", Seq(0, 500, 1000))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == Map(0 -> ((0L, 0.0)), 500 -> ((4L, 4.0)), 1000 -> ((9L, 9.0))),
      s"got $got")
    // tiny n: several permilles collapse onto the same rank — all report
    val two = Seq(10.0, 20.0).toDF("x")
    val g2 = Quality.quantileProfile(two, "x", Seq(0, 400, 600, 1000))
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    // lower-nearest: (2-1)*600 div 1000 = 0 — even 600 permille picks
    // the first element at n = 2; only p = 1000 reaches the second
    assert(g2 == Map(0 -> 10.0, 400 -> 10.0, 600 -> 10.0, 1000 -> 20.0), s"$g2")
    // nulls drop; all-null and empty inputs yield the empty relation
    val withNulls = Seq(Option(1.0), None, Option(3.0)).toDF("x")
    assert(Quality.quantileProfile(withNulls, "x", Seq(1000))
      .collect().head.getDouble(2) == 3.0)
    assert(Quality.quantileProfile(withNulls.filter(col("x").isNull), "x").isEmpty)
    intercept[IllegalArgumentException] {
      Quality.quantileProfile(v, "x", Seq(1001))
    }
  }

  test("groupedQuantiles: per-group lower-nearest picks; ties and single-row groups") {
    import spark.implicits._
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 5.0),
      ("b", 10.0), // single-row group: every permille hits rank 0
      ("c", 7.0), ("c", 7.0) // duplicate values: rank picks are stable
    ).toDF("k", "x")
    val got = Quality.groupedQuantiles(df, Seq("k"), "x", Seq(0, 500, 1000))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(3)).toMap
    assert(got == Map(
      ("a", 0) -> 1.0, ("a", 500) -> 3.0, ("a", 1000) -> 5.0,
      ("b", 0) -> 10.0, ("b", 500) -> 10.0, ("b", 1000) -> 10.0,
      ("c", 0) -> 7.0, ("c", 500) -> 7.0, ("c", 1000) -> 7.0), s"got $got")
    // null values drop inside their group, not the group itself
    val withNull = Seq(("a", Option(1.0)), ("a", None), ("a", Option(9.0)))
      .toDF("k", "x")
    val g2 = Quality.groupedQuantiles(withNull, Seq("k"), "x", Seq(1000))
      .collect().map(r => r.getDouble(3))
    assert(g2.toSeq == Seq(9.0))
  }

  test("iqrOutlierReport: Tukey fences over exact quartiles, per group, nulls excluded") {
    import spark.implicits._
    // group a sorted: -10, 1..11, 16, 20 → n=14,
    // q250 = rank (13·250) div 1000 = 3 → 3.0; q750 = rank 9 → 9.0; iqr 6
    // low fence: 2v < 2·3 − 3·6 = −12 → v < −6 → only −10
    // high fence: 2v > 2·9 + 3·6 = 36 → v > 18 → only 20 (16 is inside)
    val a = (Seq(-10.0) ++ (1 to 11).map(_.toDouble) ++ Seq(16.0, 20.0))
      .map(v => ("a", Option(v)))
    // group b: constants → iqr 0, no outliers; a null value is excluded from n
    val b = Seq(("b", Option(5.0)), ("b", Option(5.0)), ("b", None))
    val got = Quality.iqrOutlierReport(
        (a ++ b).toDF("k", "x"), Seq("k"), "x")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got == Map(
      "a" -> ((14L, 3.0, 9.0, 1L, 1L)),
      "b" -> ((2L, 5.0, 5.0, 0L, 0L))), s"got $got")
  }
}

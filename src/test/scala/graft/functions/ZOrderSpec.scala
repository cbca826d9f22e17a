package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Layout

class ZOrderSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("zorder2 matches the reference bit-interleave, bucket16 is bounded and monotone") {
    // reference interleave in plain Scala
    def interleave(a: Long, b: Long): Long =
      (0 until 16).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    val pairs = for (a <- Seq(0L, 1L, 2L, 1000L, 65535L); b <- Seq(0L, 3L, 777L, 65535L))
      yield (a, b)
    val got = pairs.toDF("a", "b")
      .select(ZOrder.zorder2(col("a"), col("b")).as("z")).as[Long].collect()
    assert(got.toSeq == pairs.map { case (a, b) => interleave(a, b) })

    val vals = spark.range(0, 10000).select(
      ZOrder.bucket16(col("id"), 0L, 9999L).as("bk"), col("id"))
    assert(vals.filter(col("bk") < 0 || col("bk") > 65535).isEmpty)
    val seq = vals.orderBy("id").select("bk").as[Long].collect()
    assert(seq.zip(seq.tail).forall { case (x, y) => x <= y }, "bucket16 must be monotone")
    assert(seq.head == 0L && seq.last == 65535L, "bucket16 must span the full range")
    // degenerate range and nulls go to bucket 0
    assert(Seq(Some(5L), None).toDF("v")
      .select(ZOrder.bucket16(col("v"), 5L, 5L)).as[Long].collect().toSeq == Seq(0L, 0L))
  }

  test("z-ordered layout row-group-prunes a 2-D box where a 1-D sort cannot") {
    val n = 60000L
    // two independent uniform dims (decorrelated, the honest case for z-order)
    val data = spark.range(n).select(
      pmod(xxhash64(col("id"), lit(1L)), lit(10000L)).as("x"),
      pmod(xxhash64(col("id"), lit(2L)), lit(10000L)).as("y"),
      col("id").as("payload"))

    val zDir = Files.createTempDirectory("zlay").toString + "/z"
    val sDir = Files.createTempDirectory("zlay").toString + "/s"
    Layout.zorderedWrite(spark, data, "x", "y", zDir, targetRowsPerFile = 500)
    data.repartitionByRange(120, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(sDir)

    def scannedRows(df: DataFrame): Long = {
      df.collect()
      collectWithSubqueries(df.queryExecution.executedPlan) {
        case s: FileSourceScanExec => s.metrics("numOutputRows").value
      }.sum
    }
    // a selective box on BOTH dims (~1/8 of each axis)
    def box(df: DataFrame) = df.filter(
      col("x").between(1000, 2250) && col("y").between(4000, 5250))
    val zScanned = scannedRows(box(spark.read.parquet(zDir)))
    val sScanned = scannedRows(box(spark.read.parquet(sDir)))
    val matched = box(spark.read.parquet(zDir)).count()
    assert(matched == box(spark.read.parquet(sDir)).count(), "layouts must hold the same rows")
    // the 1-D sort prunes only on x (~1/8 of rows + file granularity);
    // the z layout prunes on both — the box's interior is ~1/64 but
    // BOUNDARY row groups (z-curve runs crossing the box edge) dominate
    // at file granularity, so the measured ratio here is ~1.9× (z 4466
    // vs sorted 8427 at 120 files), asymptoting toward 8× as files
    // shrink. Assert the stable part: a solid win over the 1-D sort
    // and most of the table pruned.
    assert(zScanned * 10 < sScanned * 7,
      s"z-order should out-prune the 1-D sort: z=$zScanned vs sorted=$sScanned")
    assert(zScanned < n / 8, s"z-order should prune most of the table: $zScanned of $n")

    // the probe-side helper: the study's three predicate shapes read
    // through zorderScan with EXACTLY the pruning a hand-written raw
    // filter gets (same scanned-row counts, same result rows) — the
    // helper adds routing documentation, not plan overhead
    val shapes: Seq[(Option[Long], Option[Long], Option[Long], Option[Long],
        DataFrame => DataFrame)] = Seq(
      (Some(1000L), Some(2250L), Some(4000L), Some(5250L),
        (df: DataFrame) => df.filter(
          col("x").between(1000, 2250) && col("y").between(4000, 5250))),
      (None, None, Some(4000L), Some(5250L),
        (df: DataFrame) => df.filter(col("y").between(4000, 5250))),
      (Some(1000L), Some(2250L), None, None,
        (df: DataFrame) => df.filter(col("x").between(1000, 2250))))
    for ((xLo, xHi, yLo, yHi, hand) <- shapes) {
      val viaHelper = Layout.zorderScan(spark, zDir, "x", "y", xLo, xHi, yLo, yHi)
      val viaHand = hand(spark.read.parquet(zDir))
      assert(scannedRows(viaHelper.select(col("payload"))) ==
        scannedRows(viaHand.select(col("payload"))),
        s"zorderScan must prune identically to the raw predicate for box ($xLo,$xHi,$yLo,$yHi)")
      assertSameRows(viaHelper, viaHand)
    }
  }

  test("zorder3 matches the reference 3-way interleave; bucket21 bounded, monotone") {
    def interleave3(a: Long, b: Long, c: Long): Long =
      (0 until 21).map(i =>
        (((a >> i) & 1L) << (3 * i)) |
          (((b >> i) & 1L) << (3 * i + 1)) |
          (((c >> i) & 1L) << (3 * i + 2))).reduce(_ | _)
    val max21 = (1L << 21) - 1
    val triples = for {
      a <- Seq(0L, 1L, 777L, max21)
      b <- Seq(0L, 2L, 100000L, max21)
      c <- Seq(0L, 5L, 1500000L, max21)
    } yield (a, b, c)
    val got = triples.toDF("a", "b", "c")
      .select(ZOrder.zorder3(col("a"), col("b"), col("c")).as("z")).as[Long].collect()
    assert(got.toSeq == triples.map { case (a, b, c) => interleave3(a, b, c) })
    assert(interleave3(max21, max21, max21) == Long.MaxValue,
      "63 bits exactly — the key sorts correctly as a signed long")

    val vals = spark.range(0, 10000).select(
      ZOrder.bucket21(col("id"), 0L, 9999L).as("bk"), col("id"))
    assert(vals.filter(col("bk") < 0 || col("bk") > max21).isEmpty)
    val seq = vals.orderBy("id").select("bk").as[Long].collect()
    assert(seq.zip(seq.tail).forall { case (x, y) => x <= y }, "bucket21 must be monotone")
    assert(seq.head == 0L && seq.last == max21, "bucket21 must span the full range")
  }

  test("3-D layout: zorderScan3 prunes identically to raw predicates, rows round-trip") {
    val n = 20000L
    val data = spark.range(n).select(
      pmod(xxhash64(col("id"), lit(1L)), lit(1000L)).as("x"),
      pmod(xxhash64(col("id"), lit(2L)), lit(1000L)).as("y"),
      pmod(xxhash64(col("id"), lit(3L)), lit(1000L)).as("t"),
      col("id").as("payload"))
    val dir = Files.createTempDirectory("zlay3").toString + "/z3"
    Layout.zorderedWrite3(spark, data, "x", "y", "t", dir, targetRowsPerFile = 500)
    assert(spark.read.parquet(dir).count() == n, "write is lossless")
    val viaHelper = Layout.zorderScan3(spark, dir, "x", "y", "t",
      c1Lo = Some(100L), c1Hi = Some(300L), c3Lo = Some(500L), c3Hi = Some(700L))
    val viaHand = spark.read.parquet(dir)
      .filter(col("x").between(100, 300) && col("t").between(500, 700))
    assertSameRows(viaHelper, viaHand)
    // and the box actually prunes: a 1/5 × 1/5 box on two of three dims
    def scanned(df: DataFrame): Long = {
      df.collect()
      collectWithSubqueries(df.queryExecution.executedPlan) {
        case s: FileSourceScanExec => s.metrics("numOutputRows").value
      }.sum
    }
    val sc = scanned(viaHelper.select("payload"))
    assert(sc < n / 2, s"3-D layout should prune a 2-of-3-dim box: $sc of $n")
  }
}

package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Quality

class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private val ref = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0).toDF("v")
  // the ref profile driftReportStream derives at construction (4 bins)
  private val refPm = Quality.binnedHistogram(ref, "v", 4, 1.0, 8.0)
    .collect().map(r => r.getInt(0) -> 1000L * r.getLong(1) / 8L).toMap

  private def run(batch: org.apache.spark.sql.DataFrame, id: Long, out: String): Unit =
    StreamingIngest.driftBatch(batch, id, "v", out, 4, 1.0, 8.0, refPm)

  test("identical batch reports zero drift; shifted batch reports it per bin") {
    val out = tmp("drift-out")
    run(ref, 0L, out)
    val r0 = spark.read.parquet(out).filter(col("batch_id") === 0L)
    assert(r0.select(max("l1_permille")).as[Long].head() == 0L)
    // everything in the top bin: 3 bins lose 250permille, bin 3 gains 750
    run(Seq(7.5, 7.6, 7.7, 7.8).toDF("v"), 1L, out)
    val r1 = spark.read.parquet(out).filter(col("batch_id") === 1L)
      .select("bin", "ref_permille", "cur_permille", "diff_permille", "l1_permille")
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r1.map(_._5).distinct.toSeq == Seq(1500L), s"L1 on every row: ${r1.toSeq}")
    assert(r1.find(_._1 == 3).get._3 == 1000L)
    // the batch-level drift agrees with the batch operator's statistic
    assert(Quality.driftL1Permille(
      Quality.distributionDrift(ref, Seq(7.5, 7.6, 7.7, 7.8).toDF("v"), "v", 4)) == 1500L)
  }

  test("empty batch is maximal drift, not a silent skip; replay overwrites") {
    val out = tmp("drift-empty-out")
    run(ref.limit(0), 0L, out)
    val r = spark.read.parquet(out)
    assert(r.select(max("l1_permille")).as[Long].head() == 1000L,
      "all reference mass unmatched")
    // replay of the same batch id converges on the same single report
    run(ref.limit(0), 0L, out)
    assert(spark.read.parquet(out).count() == r.count())
  }

  test("the real stream drains through the reporter") {
    val drop = tmp("drift-drop"); val out = tmp("drift-stream-out")
    val ckpt = tmp("drift-ckpt")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$drop/b0.csv"),
      "7.5\n7.6\n7.7\n7.8".getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.DoubleType)))
    StreamingIngest.driftReportStream(
        spark.readStream.schema(schema).csv(drop), ref, "v", out, ckpt, nBins = 4)
      .start().awaitTermination()
    assert(spark.read.parquet(out).select(max("l1_permille")).as[Long].head() == 1500L)
  }
}

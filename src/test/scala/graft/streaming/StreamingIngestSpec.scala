package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.sources.Schemas

/** Streaming ingest over the fixture drop directory: files discovered as
  * a stream, stream-static dimension join, exactly-once file processing
  * across two AvailableNow drains. */
class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("AvailableNow drains the drop dir; a second drop is processed exactly once") {
    val drop = tmp("graft-drop")
    val out = tmp("graft-stream-out")
    val ckpt = tmp("graft-stream-ckpt")
    def dropYear(name: String): Unit =
      Files.copy(
        Paths.get(s"src/test/resources/fixtures/$name"),
        Paths.get(s"$drop/$name"), StandardCopyOption.REPLACE_EXISTING)

    dropYear("data_2014.csv")
    val stream = StreamingIngest.csvStream(spark, Schemas.data, drop)
    assert(stream.isStreaming)
    StreamingIngest.availableNow(stream, out, ckpt).start().awaitTermination()
    assert(spark.read.parquet(out).count() == 3)

    // second yearly drop: only the new file is picked up
    dropYear("data_2015.csv")
    StreamingIngest.availableNow(
      StreamingIngest.csvStream(spark, Schemas.data, drop), out, ckpt)
      .start().awaitTermination()
    assert(spark.read.parquet(out).count() == 3 + 5)
  }

  test("stream-static join enriches micro-batches against a broadcast dim") {
    val drop = tmp("graft-drop2")
    val out = tmp("graft-stream-out2")
    val ckpt = tmp("graft-stream-ckpt2")
    Files.copy(Paths.get("src/test/resources/fixtures/data_2015.csv"),
      Paths.get(s"$drop/data_2015.csv"))
    val dim = Seq((6430002L, "BUTLER"), (6430003L, "MERCER"))
      .toDF("PWSID", "COUNTY_DIM")
    val enriched = StreamingIngest.enrichStream(
      StreamingIngest.csvStream(spark, Schemas.data, drop), dim, Seq("PWSID"))
    StreamingIngest.availableNow(enriched, out, ckpt).start().awaitTermination()
    val got = spark.read.parquet(out)
      .select("Contaminant ID", "COUNTY_DIM").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("LEAD") == "BUTLER" && got("ARSENIC") == "MERCER")
    assert(got("ZINC") == null) // unmatched PWSID stays (left join)
  }

  test("stateful dedup suppresses replayed keys across separate drains") {
    val drop = tmp("graft-drop4")
    val out = tmp("graft-dedup-out")
    val ckpt = tmp("graft-dedup-ckpt")
    def drain(): Unit = StreamingIngest.availableNow(
      StreamingIngest.dedupStream(
        StreamingIngest.csvStream(spark, Schemas.data, drop), Seq("PWSID", "Contaminant ID")),
      out, ckpt).start().awaitTermination()

    Files.copy(Paths.get("src/test/resources/fixtures/data_2014.csv"),
      Paths.get(s"$drop/a.csv"))
    drain()
    assert(spark.read.parquet(out).count() == 3) // 3 distinct (PWSID, contaminant)

    // second drop: the same file replayed + the 2015 file (5 new keys)
    Files.copy(Paths.get("src/test/resources/fixtures/data_2014.csv"),
      Paths.get(s"$drop/a_replay.csv"))
    Files.copy(Paths.get("src/test/resources/fixtures/data_2015.csv"),
      Paths.get(s"$drop/b.csv"))
    drain()
    val got = spark.read.parquet(out)
    assert(got.count() == 3 + 5) // replayed keys suppressed by state
    assert(got.select("Contaminant ID").distinct().count() == 8)
  }

  test("windowed counts with watermark compile to a streaming plan") {
    val drop = tmp("graft-drop3")
    Files.copy(Paths.get("src/test/resources/fixtures/data_2014.csv"),
      Paths.get(s"$drop/data_2014.csv"))
    val stream = StreamingIngest.csvStream(spark, Schemas.data, drop)
      .withColumn("ts", to_timestamp(col("Sample Date"), "MM/dd/yyyy"))
    val agg = StreamingIngest.windowedCounts(stream, "ts", "PWSID")
    assert(agg.isStreaming)
    assert(agg.columns.toSeq == Seq("ws", "PWSID", "n"))
  }
}

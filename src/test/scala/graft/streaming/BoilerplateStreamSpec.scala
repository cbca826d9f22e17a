package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Boilerplate

class BoilerplateStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def run(df: org.apache.spark.sql.DataFrame, id: Long, freqDir: String,
      outDir: String, minDocs: Long = 2, compactAt: Int = 0,
      failAfter: Int = Int.MaxValue): Unit =
    StreamingIngest.boilerplateBatch(df, id, freqDir, outDir,
      "doc_id", "text", minDocs, compactAt, failAfterStep = failAfter)

  private def outRows(outDir: String): Map[Long, (String, Long)] =
    spark.read.parquet(outDir).select("doc_id", "text", "n_stripped")
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("single-batch stream equals the batch operator") {
    val freqDir = tmp("bp-law-freq"); val outDir = tmp("bp-law-out")
    val docs = Seq(
      (1L, "COOKIE NOTICE\nunique line 1"),
      (2L, "unique line 2\nCOOKIE NOTICE"),
      (3L, "unique line 3")
    ).toDF("doc_id", "text")
    run(docs, 0L, freqDir, outDir)
    val want = Boilerplate.stripBoilerplateLines(docs, "doc_id", "text", 2)
      .select(col("doc_id"), col("text_kept").as("text"), col("n_stripped"))
    assertSameRows(spark.read.parquet(outDir).select("doc_id", "text", "n_stripped"), want)
  }

  test("point-in-time: a line crossing the threshold strips the CROSSING batch, not history") {
    val freqDir = tmp("bp-pit-freq"); val outDir = tmp("bp-pit-out")
    // batch 0: first carrier of the template — below threshold, kept
    run(Seq((1L, "TEMPLATE\nbody one")).toDF("doc_id", "text"), 0L, freqDir, outDir)
    assert(outRows(outDir)(1L) == (("TEMPLATE\nbody one", 0L)))
    // batch 1: second carrier — stored(1) + delta(1) = 2 ≥ minDocs →
    // stripped from the ARRIVING doc; doc 1's published row unchanged
    run(Seq((2L, "TEMPLATE\nbody two")).toDF("doc_id", "text"), 1L, freqDir, outDir)
    val rows = outRows(outDir)
    assert(rows(1L) == (("TEMPLATE\nbody one", 0L)), "history not rewritten")
    assert(rows(2L) == (("body two", 1L)), "the crossing batch is stripped")
    // batch 2: every later carrier is stripped too
    run(Seq((3L, "TEMPLATE\nbody three")).toDF("doc_id", "text"), 2L, freqDir, outDir)
    assert(outRows(outDir)(3L) == (("body three", 1L)))
  }

  test("crash replay at every failpoint converges on the identical state") {
    val freqDir = tmp("bp-crash-freq"); val outDir = tmp("bp-crash-out")
    run(Seq((1L, "AD BANNER\nalpha")).toDF("doc_id", "text"), 0L, freqDir, outDir)
    val b1 = Seq((2L, "AD BANNER\nbeta"), (3L, "AD BANNER\ngamma")).toDF("doc_id", "text")
    // crash after the stripped publish, before the delta lands
    intercept[IllegalStateException] { run(b1, 1L, freqDir, outDir, failAfter = 1) }
    run(b1, 1L, freqDir, outDir)
    val after1 = outRows(outDir)
    assert(after1(2L) == (("beta", 1L)) && after1(3L) == (("gamma", 1L)),
      "replay reads the store excluding its own delta — same heavy set")
    // the store holds exactly one delta per committed batch, no double count
    val freq = spark.read.parquet(freqDir)
      .groupBy("unit").agg(sum("doc_freq").as("df"))
      .as[(String, Long)].collect().toMap
    assert(freq("AD BANNER") == 3L, s"one delta per batch, got $freq")
    // crash after both publishes, before the marker
    val b2 = Seq((4L, "AD BANNER\ndelta")).toDF("doc_id", "text")
    intercept[IllegalStateException] { run(b2, 2L, freqDir, outDir, failAfter = 2) }
    run(b2, 2L, freqDir, outDir)
    assert(outRows(outDir)(4L) == (("delta", 1L)))
    assert(spark.read.parquet(freqDir)
      .groupBy("unit").agg(sum("doc_freq").as("df"))
      .as[(String, Long)].collect().toMap.apply("AD BANNER") == 4L)
    // replay of a committed batch is skipped outright
    run(b2, 2L, freqDir, outDir)
    assert(outRows(outDir).size == 4)
  }

  test("the real stream: AvailableNow drains drops through the screen exactly once") {
    val drop = tmp("bp-drop"); val freqDir = tmp("bp-drain-freq")
    val outDir = tmp("bp-drain-out"); val ckpt = tmp("bp-drain-ckpt")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    def dropBatch(name: String, rows: Seq[(Long, String)]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$drop/$name"),
        rows.map { case (i, t) => s"$i\t${t.replace("\n", "\\n")}" }
          .mkString("\n").getBytes("UTF-8"))
    def stream() = spark.readStream.schema(schema)
      .option("sep", "\t").csv(drop)
      .withColumn("text", regexp_replace(col("text"), "\\\\n", "\n"))
    def drain(): Unit =
      StreamingIngest.boilerplateScreenStream(stream(), freqDir, outDir,
        ckpt, "doc_id", "text", minDocs = 2)
        .start().awaitTermination()

    dropBatch("b0.tsv", Seq((1L, "PROMO\nalpha"), (2L, "PROMO\nbeta")))
    drain()
    val first = outRows(outDir)
    assert(first(1L) == (("alpha", 1L)) && first(2L) == (("beta", 1L)),
      "intra-batch counting strips the first drop's repeated line")
    // second drop: the store remembers PROMO; re-draining must not
    // reprocess the first file (checkpoint) or double-count the store
    dropBatch("b1.tsv", Seq((3L, "PROMO\ngamma")))
    drain()
    val second = outRows(outDir)
    assert(second.size == 3 && second(3L) == (("gamma", 1L)))
    val mass = spark.read.parquet(freqDir)
      .filter(col("unit") === "PROMO")
      .agg(sum("doc_freq")).head().getLong(0)
    assert(mass == 3L, s"one delta per document across both drops, got $mass")
  }

  test("frequency-store compaction merges deltas, preserves mass, keeps screening") {
    val freqDir = tmp("bp-compact-freq"); val outDir = tmp("bp-compact-out")
    run(Seq((1L, "FOOTER\none")).toDF("doc_id", "text"), 0L, freqDir, outDir, compactAt = 2)
    run(Seq((2L, "FOOTER\ntwo")).toDF("doc_id", "text"), 1L, freqDir, outDir, compactAt = 2)
    val store = spark.read.parquet(freqDir)
    assert(store.select("batch_id").distinct().as[Long].collect().toSeq == Seq(-1L),
      "post-commit compaction rewrote the store as merged batch_id = -1 rows")
    assert(store.filter(col("unit") === "FOOTER").select("doc_freq")
      .as[Long].head() == 2L, "mass preserved through the merge")
    // screening still works off the compacted store
    run(Seq((3L, "FOOTER\nthree")).toDF("doc_id", "text"), 2L, freqDir, outDir, compactAt = 2)
    assert(outRows(outDir)(3L) == (("three", 1L)))
  }

  // ------------------------------------------ token-span screen (r15)

  private def runSpan(df: org.apache.spark.sql.DataFrame, id: Long,
      freqDir: String, outDir: String, k: Int = 4, minDocs: Long = 2,
      compactAt: Int = 0, failAfter: Int = Int.MaxValue): Unit =
    StreamingIngest.spanScreenBatch(df, id, freqDir, outDir,
      "doc_id", "text", k, minDocs, compactAt, failAfterStep = failAfter)

  private def spanRows(outDir: String): Map[Long, (String, Long)] =
    spark.read.parquet(outDir).select("doc_id", "text", "n_removed")
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("span screen: single-batch stream equals the batch operator") {
    val freqDir = tmp("sp-law-freq"); val outDir = tmp("sp-law-out")
    val docs = Seq(
      (1L, "alpha beta P Q R S gamma"),
      (2L, "x P Q R S y"),
      (3L, "entirely different words here now")
    ).toDF("doc_id", "text")
    runSpan(docs, 0L, freqDir, outDir)
    val want = Boilerplate.stripRepeatedSpans(docs, "doc_id", "text",
        "__kept", k = 4, minDocs = 2)
      .select(col("doc_id"), array_join(col("__kept"), " ").as("text"),
        col("n_removed"))
    assertSameRows(
      spark.read.parquet(outDir).select("doc_id", "text", "n_removed"), want)
  }

  test("span screen: point-in-time — a span crossing the threshold strips the crossing batch only") {
    val freqDir = tmp("sp-pit-freq"); val outDir = tmp("sp-pit-out")
    runSpan(Seq((1L, "W X Y Z tail one")).toDF("doc_id", "text"), 0L, freqDir, outDir)
    assert(spanRows(outDir)(1L) == (("W X Y Z tail one", 0L)))
    runSpan(Seq((2L, "head W X Y Z tail two")).toDF("doc_id", "text"), 1L, freqDir, outDir)
    val rows = spanRows(outDir)
    assert(rows(1L) == (("W X Y Z tail one", 0L)), "history not rewritten")
    // heavy windows [W X Y Z]@1 and [X Y Z tail]@2 union to positions
    // 1..5 — overlapping spans merge, tail included
    assert(rows(2L) == (("head two", 5L)), "the crossing batch is stripped")
    runSpan(Seq((3L, "W X Y Z tail three")).toDF("doc_id", "text"), 2L, freqDir, outDir)
    assert(spanRows(outDir)(3L) == (("three", 5L)))
  }

  test("span screen: crash replay at every failpoint converges; store mass exact") {
    val freqDir = tmp("sp-crash-freq"); val outDir = tmp("sp-crash-out")
    runSpan(Seq((1L, "A B C D one")).toDF("doc_id", "text"), 0L, freqDir, outDir)
    val b1 = Seq((2L, "A B C D two"), (3L, "A B C D three")).toDF("doc_id", "text")
    intercept[IllegalStateException] { runSpan(b1, 1L, freqDir, outDir, failAfter = 1) }
    runSpan(b1, 1L, freqDir, outDir)
    val after1 = spanRows(outDir)
    assert(after1(2L) == (("two", 4L)) && after1(3L) == (("three", 4L)),
      "replay reads the store excluding its own delta")
    // the "A B C D" anchor holds one delta per committed batch: freq 3
    val abcd = graft.functions.Hashing.h60Jvm("A B C D")
    val mass = spark.read.parquet(freqDir).filter(col("anchor") === abcd)
      .agg(sum("doc_freq")).head().getLong(0)
    assert(mass == 3L, s"no double count under replay, got $mass")
    intercept[IllegalStateException] {
      runSpan(Seq((4L, "A B C D four")).toDF("doc_id", "text"), 2L, freqDir, outDir,
        failAfter = 2)
    }
    runSpan(Seq((4L, "A B C D four")).toDF("doc_id", "text"), 2L, freqDir, outDir)
    assert(spanRows(outDir)(4L) == (("four", 4L)))
    runSpan(Seq((4L, "A B C D four")).toDF("doc_id", "text"), 2L, freqDir, outDir)
    assert(spanRows(outDir).size == 4, "replay of a committed batch is skipped")
  }

  test("span screen: compaction merges anchor deltas, preserves mass, keeps screening") {
    val freqDir = tmp("sp-compact-freq"); val outDir = tmp("sp-compact-out")
    runSpan(Seq((1L, "K L M N one")).toDF("doc_id", "text"), 0L, freqDir, outDir, compactAt = 2)
    runSpan(Seq((2L, "K L M N two")).toDF("doc_id", "text"), 1L, freqDir, outDir, compactAt = 2)
    val store = spark.read.parquet(freqDir)
    assert(store.select("batch_id").distinct().as[Long].collect().toSeq == Seq(-1L),
      "post-commit compaction rewrote the store as merged batch_id = -1 rows")
    val klmn = graft.functions.Hashing.h60Jvm("K L M N")
    assert(store.filter(col("anchor") === klmn).select("doc_freq")
      .as[Long].head() == 2L, "mass preserved through the merge")
    runSpan(Seq((3L, "K L M N three")).toDF("doc_id", "text"), 2L, freqDir, outDir, compactAt = 2)
    assert(spanRows(outDir)(3L) == (("three", 4L)))
  }

  test("both screens honor the per-batch ingest gates: evidence rows, refusal before state") {
    val gates = StreamingIngest.BatchGates(
      keyBalance = Some(StreamingIngest.KeyBalanceGate(Seq("src"), maxSharePermille = 600)),
      refuse = true)
    val hot = Seq(
      (1L, "alpha beta gamma delta", "z"),
      (2L, "epsilon zeta eta theta", "z")
    ).toDF("doc_id", "text", "src")
    // unit screen
    val f1 = tmp("gate-bp-freq"); val o1 = tmp("gate-bp-out")
    intercept[IllegalStateException] {
      StreamingIngest.boilerplateBatch(hot, 0L, f1, o1, "doc_id", "text",
        minDocs = 2, compactFreqAtFiles = 0, gates = gates)
    }
    val g1 = spark.read.parquet(StreamingIngest.gateReportDir(o1)).collect()
    assert(g1.length == 1 && g1.head.getAs[Boolean]("violated"))
    assert(!new java.io.File(o1).listFiles().exists(_.getName.startsWith("b0-")),
      "refusal must land before any publish")
    // span screen: flag-only mode still publishes and admits
    val f2 = tmp("gate-sp-freq"); val o2 = tmp("gate-sp-out")
    StreamingIngest.spanScreenBatch(hot, 0L, f2, o2, "doc_id", "text",
      k = 3, minDocs = 2, compactFreqAtFiles = 0,
      gates = gates.copy(refuse = false))
    assert(spark.read.parquet(o2).count() == 2, "flag mode admits")
    val g2 = spark.read.parquet(StreamingIngest.gateReportDir(o2)).collect()
    assert(g2.length == 1 && g2.head.getAs[Boolean]("violated"))
  }
}

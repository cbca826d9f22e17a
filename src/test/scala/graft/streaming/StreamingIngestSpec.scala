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

  test("streaming sessionization: gap closes inline, quiet keys close by event-time timeout") {
    val drop = tmp("graft-sess-drop")
    val out = tmp("graft-sess-out")
    val ckpt = tmp("graft-sess-ckpt")
    def dropFile(name: String, lines: String*): Unit =
      Files.write(Paths.get(s"$drop/$name"),
        ("user,ts" +: lines).mkString("\n").getBytes)
    def drain(): Unit = {
      val stream = spark.readStream
        .option("header", "true")
        .schema("user STRING, ts TIMESTAMP")
        .csv(drop)
      val sess = StreamingIngest.sessionizeStream(
        stream, "user", "ts", gapMs = 10 * 60 * 1000, watermark = "0 seconds")
      StreamingIngest.availableNow(sess.toDF(), out, ckpt).start().awaitTermination()
    }
    def sessions(): Seq[(String, String, String, Long)] =
      spark.read.parquet(out).collect()
        .map(r => (r.getString(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3)))
        .toSeq.sorted

    // batch 1: a bursts at 10:00-10:05, then an 11:00 event 55min later —
    // the first session closes INSIDE the batch (gap exceeded inline)
    dropFile("b1.csv",
      "a,2024-01-01 10:00:00", "a,2024-01-01 10:05:00", "a,2024-01-01 11:00:00")
    drain()
    assert(sessions() == Seq(("a", "2024-01-01 10:00:00.0", "2024-01-01 10:05:00.0", 2L)))

    // batch 2: a@12:00 closes the open 11:00 session (gap) and stays open
    dropFile("b2.csv", "a,2024-01-01 12:00:00")
    drain()
    assert(sessions().map(_._2).contains("2024-01-01 11:00:00.0"))

    // batches 3-4: only OTHER keys arrive; the watermark they advance
    // (to 13:00) passes a's 12:10 horizon and times a's session out —
    // no further 'a' event was ever needed
    dropFile("b3.csv", "b,2024-01-01 13:00:00")
    drain()
    dropFile("b4.csv", "b,2024-01-01 14:00:00")
    drain()
    val a12 = sessions().filter(s => s._1 == "a" && s._2 == "2024-01-01 12:00:00.0")
    assert(a12 == Seq(("a", "2024-01-01 12:00:00.0", "2024-01-01 12:00:00.0", 1L)))
  }

  test("sessionization widens the open session for a late in-gap event from an earlier batch") {
    val drop = tmp("graft-sess2-drop")
    val out = tmp("graft-sess2-out")
    val ckpt = tmp("graft-sess2-ckpt")
    def dropFile(name: String, lines: String*): Unit =
      Files.write(Paths.get(s"$drop/$name"),
        ("user,ts" +: lines).mkString("\n").getBytes)
    def drain(): Unit = {
      val stream = spark.readStream
        .option("header", "true")
        .schema("user STRING, ts TIMESTAMP")
        .csv(drop)
      val sess = StreamingIngest.sessionizeStream(
        stream, "user", "ts", gapMs = 10 * 60 * 1000, watermark = "2 hours")
      StreamingIngest.availableNow(sess.toDF(), out, ckpt).start().awaitTermination()
    }
    dropFile("b1.csv", "a,2024-01-01 10:00:00")
    drain()
    // late event 2 min BEFORE the open session's start, within gap +
    // watermark: must widen the session backwards, not be mis-anchored
    dropFile("b2.csv", "a,2024-01-01 09:58:00")
    drain()
    // a gap-exceeding event closes the widened session
    dropFile("b3.csv", "a,2024-01-01 13:00:00")
    drain()
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getTimestamp(1).toString, r.getTimestamp(2).toString, r.getLong(3)))
      .toSeq
    assert(got == Seq(("2024-01-01 09:58:00.0", "2024-01-01 10:00:00.0", 2L)))
  }

  test("the hierarchical enrich cascade runs incrementally on a stream, batch-identical") {
    import graft.operators.Relational
    val drop = tmp("graft-enrich-drop")
    val out = tmp("graft-enrich-out")
    val ckpt = tmp("graft-enrich-ckpt")
    // static dimension with two key levels: (pws, loc) then (pws)
    val dim = Seq(
      ("P1", "L1", "zip-11", 3L), ("P1", "L2", "zip-12", 2L), ("P2", "L9", "zip-29", 1L))
      .toDF("pws", "loc", "zip", "pref")
    def cascade(data: org.apache.spark.sql.DataFrame) =
      Relational.hierarchicalEnrich(
        data, dim,
        keyLevels = Seq(Seq("pws", "loc"), Seq("pws")),
        payloadCols = Seq("zip"),
        dimOrder = Seq(col("pref").desc))
    Files.write(Paths.get(s"$drop/f1.csv"),
      "pws,loc,v\nP1,L1,10\nP1,LX,11\nP3,L1,12\n".getBytes)
    val stream = spark.readStream
      .option("header", "true").schema("pws STRING, loc STRING, v INT").csv(drop)
    StreamingIngest.availableNow(cascade(stream), out, ckpt).start().awaitTermination()
    val streamed = spark.read.parquet(out)
    // identical rows to the batch cascade over the same input
    val batch = cascade(
      spark.read.option("header", "true").schema("pws STRING, loc STRING, v INT")
        .csv(s"$drop/f1.csv"))
    assertSameRows(streamed, batch)
    // and the semantics are the reference's: exact 2-key hit, 1-key
    // fallback to the preferred survivor, conserving miss
    val got = streamed.collect()
      .map(r => (r.getAs[String]("pws"), r.getAs[String]("loc"),
        r.getAs[String]("zip"), r.getAs[Any]("match_level"))).toSet
    assert(got == Set(
      ("P1", "L1", "zip-11", 1), // exact (pws, loc) match
      ("P1", "LX", "zip-11", 2), // falls back to pws level, pref-max survivor
      ("P3", "L1", null, null))) // conserved miss (level null, as in batch)
  }

  test("streaming sessionization matches the batch sessionize query on the real events slice") {
    // Same equivalence proof the enrich cascade has, at fixture scale on
    // driver data: q43 (batch window sessionize) and sessionizeStream
    // must produce identical sessions over the same 1000-event slice.
    // The stream emits only CLOSED sessions, so a per-user sentinel
    // event 3 gaps past the global max closes every real session inline;
    // sentinel-started sessions stay open and are excluded. Events are
    // split into 4 TIME-CONTIGUOUS csv chunks → multiple micro-batches
    // in drop order (the yearly-file shape): sessions spanning a chunk
    // boundary stay open in state and merge with the next batch. (A
    // random split would NOT match batch: streaming finality means an
    // already-emitted session cannot be re-opened by an arbitrarily
    // earlier event in a later batch — that is the documented
    // bounded-lateness trade, not a bug.)
    val dir = "/root/testdata/sf0.001"
    val gapUs = 1800L * 1000000L
    val drop = tmp("graft-sessq43-drop")
    val out = tmp("graft-sessq43-out")
    val ckpt = tmp("graft-sessq43-ckpt")

    val events = graft.Tables(spark, dir).events
      .select(col("user_id").cast("string").as("user"),
        col("ts").cast("timestamp").as("ts"))
    val maxTs = events.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val sentinelUs = maxTs + 3 * gapUs
    val evCsv = events.select(col("user"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"))
      .withColumn("chunk", ntile(4).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("ts"))))
    for (i <- 1 to 4) // written sequentially: mtime order == time order
      evCsv.filter(col("chunk") === i).drop("chunk")
        .coalesce(1).write.option("header", "true").csv(s"$drop/c$i")
    evCsv.select("user").distinct()
      .withColumn("ts", date_format(timestamp_micros(lit(sentinelUs)),
        "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .coalesce(1).write.option("header", "true").csv(s"$drop/sentinel")

    val stream = spark.readStream
      .option("header", "true").option("maxFilesPerTrigger", 1)
      .schema("user STRING, ts TIMESTAMP").csv(s"$drop/*")
    val sess = StreamingIngest.sessionizeStream(
      stream, "user", "ts", gapMs = gapUs / 1000, watermark = "3650 days")
    StreamingIngest.availableNow(sess.toDF(), out, ckpt).start().awaitTermination()

    val streamed = spark.read.parquet(out)
      .filter(unix_micros(col("session_start")) < sentinelUs)
      .select(col("key").as("user_id"),
        unix_micros(col("session_start")).as("start_us"),
        unix_micros(col("session_end")).as("end_us"),
        col("n_events"))
    val batchSessions = graft.queries.ParityQueries.q43Sessionize(spark, dir)
      .groupBy(col("user_id").cast("string").as("user_id"), col("session_seq"))
      .agg(unix_micros(min(col("ts").cast("timestamp"))).as("start_us"),
        unix_micros(max(col("ts").cast("timestamp"))).as("end_us"),
        count(lit(1)).as("n_events"))
      .drop("session_seq")
    assert(streamed.count() > 10, "slice should produce a real session population")
    assertSameRows(streamed, batchSessions)
  }

  test("streaming as-of enrich matches the batch as-of join on the real events slice") {
    // q20's equivalence proof on driver data: each purchase's
    // last_signup_ts from asOfStream must equal the batch window
    // computation over the same events. Chunks are TIME-CONTIGUOUS for
    // the same finality reason as the sessionize test; every probe emits
    // immediately, so no sentinel is needed.
    val dir = "/root/testdata/sf0.001"
    val drop = tmp("graft-asof-drop")
    val out = tmp("graft-asof-out")
    val ckpt = tmp("graft-asof-ckpt")

    val events = graft.Tables(spark, dir).events
      .select(col("user_id").cast("string").as("user_id"), col("event_id"),
        col("ts").cast("timestamp").as("ts"), col("event_type"))
    val evCsv = events
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
        col("event_type"))
      .withColumn("chunk", ntile(4).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("ts"), col("event_id"))))
    for (i <- 1 to 4)
      evCsv.filter(col("chunk") === i).drop("chunk")
        .coalesce(1).write.option("header", "true").csv(s"$drop/c$i")

    val stream = spark.readStream
      .option("header", "true").option("maxFilesPerTrigger", 1)
      .schema("user_id STRING, event_id LONG, ts TIMESTAMP, event_type STRING")
      .csv(s"$drop/*")
    val enriched = StreamingIngest.asOfStream(stream, "user_id", "event_id", "ts",
      anchorPred = col("event_type") === "signup",
      probePred = col("event_type") === "purchase")
    StreamingIngest.availableNow(enriched.toDF(), out, ckpt).start().awaitTermination()

    val streamed = spark.read.parquet(out)
      .select(col("key").as("user_id"), col("id").as("event_id"),
        unix_micros(col("event_ts")).as("ts_us"),
        unix_micros(col("asof_ts")).as("last_signup_us"))
    val batch = graft.queries.ParityQueries.q20AsOfJoin(spark, dir)
      .select(col("user_id").cast("string").as("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        unix_micros(col("last_signup_ts").cast("timestamp")).as("last_signup_us"))
    assert(streamed.count() > 10, "slice should produce a real purchase population")
    assert(streamed.filter(col("last_signup_us").isNotNull).count() > 0,
      "slice should contain purchases with a prior signup")
    assertSameRows(streamed, batch)
  }

  test("TTL as-of enrich matches the batch as-of join with the tolerance predicate on the real events slice") {
    // asOfStreamTtl's contract is the TOLERANCE form of q20: the batch
    // oracle is the same window computation with matches older than the
    // TTL nulled. Same time-contiguous chunked feeding as the plain
    // as-of proof; the TTL (~27.8h) is chosen to split the slice's real
    // delta distribution so both populations (within / beyond) are
    // exercised, asserted below.
    val dir = "/root/testdata/sf0.001"
    val drop = tmp("graft-asofttl-drop")
    val out = tmp("graft-asofttl-out")
    val ckpt = tmp("graft-asofttl-ckpt")
    val ttlMs = 100000000L

    val events = graft.Tables(spark, dir).events
      .select(col("user_id").cast("string").as("user_id"), col("event_id"),
        col("ts").cast("timestamp").as("ts"), col("event_type"))
    val evCsv = events
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
        col("event_type"))
      .withColumn("chunk", ntile(4).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("ts"), col("event_id"))))
    for (i <- 1 to 4)
      evCsv.filter(col("chunk") === i).drop("chunk")
        .coalesce(1).write.option("header", "true").csv(s"$drop/c$i")

    val stream = spark.readStream
      .option("header", "true").option("maxFilesPerTrigger", 1)
      .schema("user_id STRING, event_id LONG, ts TIMESTAMP, event_type STRING")
      .csv(s"$drop/*")
    val enriched = StreamingIngest.asOfStreamTtl(stream, "user_id", "event_id", "ts",
      anchorPred = col("event_type") === "signup",
      probePred = col("event_type") === "purchase",
      ttlMs = ttlMs, watermark = "0 seconds")
    StreamingIngest.availableNow(enriched.toDF(), out, ckpt).start().awaitTermination()

    val streamed = spark.read.parquet(out)
      .select(col("key").as("user_id"), col("id").as("event_id"),
        unix_micros(col("event_ts")).as("ts_us"),
        unix_micros(col("asof_ts")).as("last_signup_us"))
    val batch = graft.queries.ParityQueries.q20AsOfJoin(spark, dir)
      .select(col("user_id").cast("string").as("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        unix_micros(col("last_signup_ts").cast("timestamp")).as("last_signup_us"))
      // the tolerance predicate: an anchor older than the TTL answers
      // null exactly as no anchor would
      .withColumn("last_signup_us",
        when(col("ts_us") - col("last_signup_us") <= ttlMs * 1000L,
          col("last_signup_us")))
    assert(streamed.filter(col("last_signup_us").isNotNull).count() > 10,
      "TTL should leave a real within-tolerance population")
    assert(batch.filter(col("last_signup_us").isNull).count() >
      graft.queries.ParityQueries.q20AsOfJoin(spark, dir)
        .filter(col("last_signup_ts").isNull).count(),
      "TTL should expire a real beyond-tolerance population")
    assertSameRows(streamed, batch)
  }

  test("TTL as-of tolerance is inclusive at exactly anchor + TTL") {
    val drop = tmp("graft-asofttl3-drop")
    val out = tmp("graft-asofttl3-out")
    val ckpt = tmp("graft-asofttl3-ckpt")
    // one batch, 30-min TTL: probes at exactly +30:00 (match, <= is
    // inclusive) and +30:00.000001 (null)
    Files.write(Paths.get(s"$drop/b1.csv"), Seq(
      "k,id,ts,et",
      "x,1,2024-01-01 10:00:00,a",
      "x,2,2024-01-01 10:30:00,p",
      "x,3,2024-01-01 10:30:00.000001,p").mkString("\n").getBytes)
    val stream = spark.readStream
      .option("header", "true")
      .schema("k STRING, id LONG, ts TIMESTAMP, et STRING").csv(drop)
    StreamingIngest.availableNow(
      StreamingIngest.asOfStreamTtl(stream, "k", "id", "ts",
        anchorPred = col("et") === "a", probePred = col("et") === "p",
        ttlMs = 30 * 60 * 1000, watermark = "0 seconds").toDF(),
      out, ckpt).start().awaitTermination()
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(1), Option(r.getTimestamp(3)).map(_.toString).orNull))
      .toSeq.sortBy(_._1)
    assert(got == Seq((2L, "2024-01-01 10:00:00.0"), (3L, null)))
  }

  test("TTL as-of enrich expires quiet keys' anchors by event-time timeout") {
    // the state-bound proof: an anchor whose TTL horizon the watermark
    // passes (advanced by OTHER keys only) stops matching — a later
    // probe of the same key answers null; a FRESH anchor after that
    // re-arms the key.
    val drop = tmp("graft-asofttl2-drop")
    val out = tmp("graft-asofttl2-out")
    val ckpt = tmp("graft-asofttl2-ckpt")
    var n = 0
    def dropFile(lines: String*): Unit = {
      n += 1
      Files.write(Paths.get(s"$drop/b$n.csv"),
        ("k,id,ts,et" +: lines).mkString("\n").getBytes)
    }
    def drain(): Unit = {
      val stream = spark.readStream
        .option("header", "true")
        .schema("k STRING, id LONG, ts TIMESTAMP, et STRING").csv(drop)
      StreamingIngest.availableNow(
        StreamingIngest.asOfStreamTtl(stream, "k", "id", "ts",
          anchorPred = col("et") === "a", probePred = col("et") === "p",
          ttlMs = 30 * 60 * 1000, watermark = "0 seconds").toDF(),
        out, ckpt).start().awaitTermination()
    }
    def probes(): Seq[(Long, String)] =
      spark.read.parquet(out).collect()
        .map(r => (r.getLong(1), Option(r.getTimestamp(3)).map(_.toString).orNull))
        .toSeq.sortBy(_._1)

    // anchor at 10:00; an in-TTL probe at 10:20 matches it
    dropFile("x,1,2024-01-01 10:00:00,a", "x,2,2024-01-01 10:20:00,p")
    drain()
    assert(probes() == Seq((2L, "2024-01-01 10:00:00.0")))

    // another key advances the watermark past x's 10:30 horizon —
    // x's anchor state is expired with no x event at all
    dropFile("y,3,2024-01-01 12:00:00,a")
    drain()
    // a later x probe answers null (its anchor is beyond the TTL);
    // a fresh anchor at 12:30 re-arms the key for the 12:40 probe
    dropFile("x,4,2024-01-01 12:10:00,p",
      "x,5,2024-01-01 12:30:00,a", "x,6,2024-01-01 12:40:00,p")
    drain()
    assert(probes() == Seq(
      (2L, "2024-01-01 10:00:00.0"), (4L, null), (6L, "2024-01-01 12:30:00.0")))
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

  test("TTL dedup: replay inside the TTL suppressed, after expiry it passes as fresh") {
    val drop = tmp("graft-ttl-drop")
    val out = tmp("graft-ttl-out")
    val ckpt = tmp("graft-ttl-ckpt")
    var n = 0
    def dropFile(lines: String*): Unit = {
      n += 1
      Files.write(Paths.get(s"$drop/b$n.csv"),
        ("k,ts" +: lines).mkString("\n").getBytes)
    }
    def drain(): Unit = {
      val stream = spark.readStream
        .option("header", "true").schema("k STRING, ts TIMESTAMP").csv(drop)
      StreamingIngest.availableNow(
        StreamingIngest.dedupStreamTtl(stream, Seq("k"), "ts",
          ttlMs = 30 * 60 * 1000, watermark = "0 seconds"),
        out, ckpt).start().awaitTermination()
    }
    def emitted(): Seq[(String, String)] =
      spark.read.parquet(out).collect()
        .map(r => (r.getString(0), r.getTimestamp(1).toString)).toSeq.sorted

    // first sighting passes; an in-batch replay is suppressed and the
    // earliest-by-event-time row is the survivor
    dropFile("a,2024-01-01 10:05:00", "a,2024-01-01 10:00:00")
    drain()
    assert(emitted() == Seq(("a", "2024-01-01 10:00:00.0")))

    // replay within the (sliding) TTL: suppressed, extends the horizon
    dropFile("a,2024-01-01 10:20:00")
    drain()
    assert(emitted() == Seq(("a", "2024-01-01 10:00:00.0")))

    // another key advances the watermark to 12:00 — past a's horizon
    // (10:20 + 30min); a's state expires even though no 'a' event arrives
    dropFile("b,2024-01-01 12:00:00")
    drain()
    // replay AFTER the TTL: a fresh first sighting, emitted again
    dropFile("a,2024-01-01 12:30:00")
    drain()
    assert(emitted() == Seq(
      ("a", "2024-01-01 10:00:00.0"), ("a", "2024-01-01 12:30:00.0"),
      ("b", "2024-01-01 12:00:00.0")))
  }

  test("TTL dedup expires stale state even when the post-TTL replay and expiry share a batch") {
    // the engine never times out a key that has data in the batch — the
    // in-band getCurrentWatermarkMs check must expire it instead
    val drop = tmp("graft-ttl2-drop")
    val out = tmp("graft-ttl2-out")
    val ckpt = tmp("graft-ttl2-ckpt")
    var n = 0
    def dropFile(lines: String*): Unit = {
      n += 1
      Files.write(Paths.get(s"$drop/b$n.csv"),
        ("k,ts" +: lines).mkString("\n").getBytes)
    }
    def drain(): Unit = {
      val stream = spark.readStream
        .option("header", "true").schema("k STRING, ts TIMESTAMP").csv(drop)
      StreamingIngest.availableNow(
        StreamingIngest.dedupStreamTtl(stream, Seq("k"), "ts",
          ttlMs = 30 * 60 * 1000, watermark = "0 seconds"),
        out, ckpt).start().awaitTermination()
    }
    dropFile("a,2024-01-01 10:00:00")
    drain()
    // watermark advances to 14:00 at the END of this batch...
    dropFile("b,2024-01-01 14:00:00")
    drain()
    // ...so THIS batch runs with watermark 14:00 ≥ a's 10:30 horizon and
    // carries a's replay: stale state must not suppress it
    dropFile("a,2024-01-01 14:10:00")
    drain()
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString)).toSeq.sorted
    assert(got == Seq(
      ("a", "2024-01-01 10:00:00.0"), ("a", "2024-01-01 14:10:00.0"),
      ("b", "2024-01-01 14:00:00.0")))
  }

  test("dedupedPairSink: the sink holds no duplicate pairs; the plan stays stateless") {
    import graft.operators.Dedup
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val probes = Seq(
      (101L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup: agrees in ALL bands
      (102L, "one two three four five six seven nine"))
      .toDF("doc_id", "text")
    val index = Dedup.minhashIndex(corpus, "doc_id", "text").cache()
    val batch = Dedup.minhashProbe(probes, index, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val drop = tmp("graft-pairsink-drop")
    val out = tmp("graft-pairsink-out")
    val ckpt = tmp("graft-pairsink-ckpt")
    probes.write.mode("overwrite").parquet(drop)
    val stream = spark.readStream.schema(probes.schema).parquet(drop)
    val screened = StreamingIngest.nearDupScreenStream(stream, index, "doc_id", "text")
    // stateless precondition: the raw screen emits 101↔1 once per band (4×)
    StreamingIngest.dedupedPairSink(screened, out, ckpt,
      keyCols = Seq("probe_doc_id", "corpus_doc_id")).start().awaitTermination()
    val sunk = spark.read.parquet(out)
    assert(sunk.groupBy("probe_doc_id", "corpus_doc_id")
      .count().filter(col("count") > 1).isEmpty, "sink holds duplicate pairs")
    val got = sunk.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == batch)
    assert(batch.exists(p => p._1 == 101L && p._2 == 1L && p._3 == 16L))
    index.unpersist()
  }

  test("streaming near-dup screen emits exactly the batch probe's matches") {
    import graft.operators.Dedup
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight"),
      (3L, "lorem ipsum dolor sit amet consectetur adipiscing elit")).toDF("doc_id", "text")
    val probes = Seq(
      (101L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup of 1
      (102L, "one two three four five six seven nine"),        // near dup of 2
      (103L, "wholly different vocabulary nothing shared with anything else"))
      .toDF("doc_id", "text")
    val index = Dedup.minhashIndex(corpus, "doc_id", "text").cache()
    val batch = Dedup.minhashProbe(probes, index, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val drop = tmp("graft-neardup-drop")
    probes.write.mode("overwrite").parquet(drop)
    val stream = spark.readStream.schema(probes.schema).parquet(drop)
    val screened = StreamingIngest.nearDupScreenStream(stream, index, "doc_id", "text")
    assert(screened.isStreaming)
    screened.writeStream.format("memory").queryName("neardup_screen")
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    // set-compare: the stream may emit a pair once per agreeing band
    val got = spark.table("neardup_screen")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == batch)
    assert(batch.exists(p => p._1 == 101L && p._2 == 1L && p._3 == 16L)) // exact dup, full agreement
    assert(!batch.exists(_._1 == 103L)) // novel doc passes clean
    index.unpersist()
  }

  test("streaming embedding screen emits exactly the batch index probe's matches") {
    import graft.operators.Similarity
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.5f, 0.2f)),
      (2L, Array(-0.8f, 0.3f, 0.1f, -0.6f)),
      (3L, Array(0.0f, 1.0f, -0.4f, 0.3f))).toDF("vec_id", "embedding")
    val probes = Seq(
      (101L, Array(0.99f, 0.01f, 0.5f, 0.2f)),  // near-dup of 1
      (102L, Array(0.0f, 0.0f, 0.0f, 0.0f)),    // zero vector: excluded
      (103L, Array(0.5f, -0.9f, 0.2f, -0.1f)))  // unrelated direction
      .toDF("vec_id", "embedding")
    val index = Similarity.lshIndex(corpus, "vec_id", "embedding",
      planes = 2, dims = 4, tables = 4).cache()
    val batch = Similarity.lshIndexProbe(probes, index, "vec_id", "embedding",
      minMicro = 900000L, planes = 2, dims = 4, tables = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val drop = tmp("graft-embed-drop")
    probes.write.mode("overwrite").parquet(drop)
    val stream = spark.readStream.schema(probes.schema).parquet(drop)
    val screened = StreamingIngest.embeddingScreenStream(stream, index,
      "vec_id", "embedding", minMicro = 900000L, planes = 2, dims = 4, tables = 4)
    assert(screened.isStreaming)
    screened.writeStream.format("memory").queryName("embed_screen")
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    // set-compare: the stream may emit a pair once per agreeing table
    val got = spark.table("embed_screen")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == batch)
    assert(batch.exists(p => p._1 == 101L && p._2 == 1L && p._3 >= 900000L)) // near-dup found
    assert(!batch.exists(_._1 == 102L)) // zero vector excluded (cosine undefined)
    index.unpersist()
  }

  test("auto screens read build parameters from the static index's stamp") {
    import graft.operators.{Dedup, Similarity}
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight")).toDF("doc_id", "text")
    // non-default banding, persisted: the auto screen must recover it
    val index = Dedup.minhashIndex(corpus, "doc_id", "text", n = 2, k = 8, bands = 2).cache()
    val probes = Seq((101L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val drop = tmp("graft-autoscreen-drop")
    probes.write.mode("overwrite").parquet(drop)
    val stream = spark.readStream.schema(probes.schema).parquet(drop)
    val screened = StreamingIngest.nearDupScreenStreamAuto(stream, index,
      "doc_id", "text", minAgree = 4)
    assert(screened.isStreaming)
    screened.writeStream.format("memory").queryName("auto_screen")
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    val got = spark.table("auto_screen")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Dedup.minhashProbe(probes, index, "doc_id", "text",
      n = 2, k = 8, bands = 2, minAgree = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == batch && got.nonEmpty)
    index.unpersist()
    // empty index: refused at construction — for BOTH auto screens
    intercept[IllegalArgumentException](
      StreamingIngest.nearDupScreenStreamAuto(stream,
        Dedup.minhashIndex(corpus.limit(0), "doc_id", "text"), "doc_id", "text"))
    val vecs = Seq((1L, Array(1.0f, 0.0f, 0.5f, 0.2f))).toDF("vec_id", "embedding")
    val vecStream = spark.readStream.schema(vecs.schema)
      .parquet(tmp("graft-autoscreen-vec"))
    intercept[IllegalArgumentException](
      StreamingIngest.embeddingScreenStreamAuto(vecStream,
        Similarity.lshIndex(vecs.limit(0), "vec_id", "embedding", planes = 2, dims = 4),
        "vec_id", "embedding", minMicro = 0L))
  }

  test("observed DQ gates ride the micro-batch progress metrics, no second scan") {
    import graft.operators.Quality
    val drop = tmp("graft-gates-drop")
    val out = tmp("graft-gates-out")
    val ckpt = tmp("graft-gates-ckpt")
    Files.copy(Paths.get("src/test/resources/fixtures/data_2014.csv"),
      Paths.get(s"$drop/data_2014.csv"))
    val stream = StreamingIngest.csvStream(spark, Schemas.data, drop)
    val gated = StreamingIngest.observedGates(stream, "dq", Seq(
      Quality.Gate("null_pwsid", col("PWSID").isNull),
      Quality.Gate("distribution_wordwrap", col("Sample Type") === "DISTRIBUTIO N")))
    val q = StreamingIngest.availableNow(gated, out, ckpt).start()
    q.awaitTermination()
    // SUM across every micro-batch's metric row — lastOption would break
    // the moment the drain spans more than one batch (maxFilesPerTrigger)
    val perBatch = q.recentProgress.flatMap(p => Option(p.observedMetrics.get("dq")))
    assert(perBatch.nonEmpty, "no 'dq' observed metrics on any progress event")
    def total(field: String): Long = perBatch.map(_.getAs[Long](field)).sum
    assert(total("total_rows") == spark.read.parquet(out).count())
    assert(total("null_pwsid") == 0L)
    // the 2014 fixture carries the reference's word-wrap artifact rows
    val expectWrap = spark.read.parquet(out)
      .filter(col("Sample Type") === "DISTRIBUTIO N").count()
    assert(total("distribution_wordwrap") == expectWrap)
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

  test("composed golden: drop → DQ observe → TTL dedup → embedding screen → deduped pair sink, batch-identical") {
    // every stage is specced in isolation above; this is the claimed
    // COMPOSITION — one ingest pipeline wiring all four together across
    // two drains, with an in-batch duplicate (TTL dedup picks the
    // earliest), a cross-drain replay inside the TTL (suppressed by
    // state), and a genuinely new probe in the second drain. The oracle
    // is the batch index probe over exactly the probes that survive the
    // TTL dedup — composition must change nothing.
    import graft.operators.{Quality, Similarity}
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.5f, 0.2f)),
      (2L, Array(-0.8f, 0.3f, 0.1f, -0.6f)),
      (3L, Array(0.0f, 1.0f, -0.4f, 0.3f))).toDF("vec_id", "embedding")
    val index = Similarity.lshIndex(corpus, "vec_id", "embedding",
      planes = 2, dims = 4, tables = 4).cache()

    val drop = tmp("graft-golden-drop")
    val out = tmp("graft-golden-out")
    val ckpt = tmp("graft-golden-ckpt")
    val schema = "vec_id LONG, embedding ARRAY<FLOAT>, ts TIMESTAMP"
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    def drain(): org.apache.spark.sql.streaming.StreamingQuery = {
      val stream = spark.readStream.schema(schema).parquet(drop)
      val gated = StreamingIngest.observedGates(stream, "dq",
        Seq(Quality.Gate("null_vec", col("vec_id").isNull)))
      val fresh = StreamingIngest.dedupStreamTtl(gated, Seq("vec_id"), "ts",
        ttlMs = 60 * 60 * 1000L, watermark = "0 seconds")
      val screened = StreamingIngest.embeddingScreenStream(fresh, index,
        "vec_id", "embedding", minMicro = 900000L, planes = 2, dims = 4, tables = 4)
      val q = StreamingIngest.dedupedPairSink(screened, out, ckpt,
        keyCols = Seq("probe_id", "corpus_id"), aggCol = "cos_micro").start()
      q.awaitTermination()
      q
    }

    // drain 1: 101 arrives twice in-batch (near-dup of corpus 1),
    // 103 is an unrelated direction (screens clean)
    Seq(
      (101L, Array(0.99f, 0.01f, 0.5f, 0.2f), ts("2024-01-01 10:00:00")),
      (101L, Array(0.99f, 0.01f, 0.5f, 0.2f), ts("2024-01-01 10:00:05")),
      (103L, Array(0.5f, -0.9f, 0.2f, -0.1f), ts("2024-01-01 10:00:10")))
      .toDF("vec_id", "embedding", "ts")
      .write.mode("append").parquet(drop)
    val q1 = drain()
    // the DQ observe stage is live in the composed plan
    val perBatch = q1.recentProgress.flatMap(p => Option(p.observedMetrics.get("dq")))
    assert(perBatch.nonEmpty, "no 'dq' observed metrics in the composed pipeline")
    assert(perBatch.map(_.getAs[Long]("total_rows")).sum == 3L)
    assert(perBatch.map(_.getAs[Long]("null_vec")).sum == 0L)

    // drain 2: 101 replays INSIDE the TTL (state suppresses it — its
    // matches must not re-enter the sink), 104 is new (near-dup of 1)
    Seq(
      (101L, Array(0.99f, 0.01f, 0.5f, 0.2f), ts("2024-01-01 10:20:00")),
      (104L, Array(1.0f, 0.02f, 0.49f, 0.21f), ts("2024-01-01 10:30:00")))
      .toDF("vec_id", "embedding", "ts")
      .write.mode("append").parquet(drop)
    drain()

    // batch oracle: the TTL-dedup survivor set, screened in one batch
    val survivors = Seq(
      (101L, Array(0.99f, 0.01f, 0.5f, 0.2f)),
      (103L, Array(0.5f, -0.9f, 0.2f, -0.1f)),
      (104L, Array(1.0f, 0.02f, 0.49f, 0.21f))).toDF("vec_id", "embedding")
    val expected = Similarity.lshIndexProbe(survivors, index, "vec_id", "embedding",
      minMicro = 900000L, planes = 2, dims = 4, tables = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val sunk = spark.read.parquet(out)
    assert(sunk.groupBy("probe_id", "corpus_id").count()
      .filter(col("count") > 1).isEmpty, "sink holds duplicate pairs")
    val got = sunk.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.exists(p => p._1 == 101L && p._2 == 1L), "near-dup probe must match")
    assert(got.exists(p => p._1 == 104L && p._2 == 1L), "second-drain probe must match")
    assert(!got.exists(_._1 == 103L), "unrelated probe must screen clean")
    index.unpersist()
  }

  test("streaming curate: the index grows across drains, first drop batch-identical") {
    import graft.operators.Dedup
    // gate-passing texts: >= 10 tokens with stopwords and diversity
    val storeA = "the quick brown fox jumps over a lazy dog near the river bank"
    val storeB = "a merchant of venice sailed in the morning tide carrying spice and silk"
    val novelC = "seven engineers of the valley debugged a streaming pipeline in the night"
    val novelD = "nine ravens of the tower guarded a rusty crown in the rain"
    val store = Seq((1L, storeA), (2L, storeB)).toDF("doc_id", "text")

    val indexDir = tmp("graft-curate-index")
    val outDir = tmp("graft-curate-out")
    val drop = tmp("graft-curate-drop")
    val ckpt = tmp("graft-curate-ckpt")
    Dedup.minhashIndex(store, "doc_id", "text")
      .write.mode("overwrite").partitionBy("band").parquet(indexDir)

    val gate: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => df.filter(graft.functions.TextAnalysis.qualityKeep(col("text")))
    def drain(): Unit = {
      val stream = spark.readStream.schema("doc_id LONG, text STRING").parquet(drop)
      StreamingIngest.curateIngestStream(stream, indexDir, outDir, ckpt,
        "doc_id", "text", gate).start().awaitTermination()
    }

    // drop 1: exact dup of store A, novel C twice (in-batch dup), a
    // gate-failing fragment — only C's min-id copy survives
    val drop1 = Seq((101L, storeA), (102L, novelC), (103L, novelC), (104L, "tiny"))
      .toDF("doc_id", "text")
    drop1.write.mode("append").parquet(drop)
    drain()
    val after1 = spark.read.parquet(outDir).collect()
    assert(after1.map(_.getLong(0)).toSeq == Seq(102L))
    assert(after1.head.schema.fieldNames.toSeq == Seq("doc_id", "text"),
      "survivors must keep the stream schema, not the dedup bookkeeping")
    // batch-identical: the direct ingest call on the same drop agrees
    val direct = Dedup.minhashIncrementalIngest(
      Dedup.minhashIndex(store, "doc_id", "text"),
      Dedup.exactDedup(gate(drop1), "doc_id", "text").filter(!col("is_dup")),
      "doc_id", "text")._1
    assert(direct.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(102L))

    // drop 2: a replay of C's text must be caught by the GROWN index
    // (cross-drain memory lives in indexDir, not the state store);
    // novel D survives
    Seq((201L, novelC), (202L, novelD)).toDF("doc_id", "text")
      .write.mode("append").parquet(drop)
    drain()
    assert(spark.read.parquet(outDir).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(102L, 202L))
    // the index holds rows for both admitted docs under one stamp
    val grown = spark.read.parquet(indexDir)
    assert(grown.select("doc_id").distinct().collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 102L, 202L))
    assert(grown.select("ix_n", "ix_k", "ix_bands").distinct().count() == 1)

    // drop 3: a full re-arrival of drop 1's exact (id, text) rows — the
    // replayed-batch shape — appends nothing: admitted ids hit the id
    // screen, the rest re-screen out
    drop1.write.mode("append").parquet(drop)
    drain()
    assert(spark.read.parquet(outDir).count() == 2,
      "re-arrival of already-processed rows must append nothing")
    assert(spark.read.parquet(indexDir).count() == grown.count(),
      "re-arrival must not grow the index")
  }

  test("curate batch protocol: a replay after EVERY write converges — no duplicate, no loss") {
    import graft.operators.Dedup
    val storeA = "the quick brown fox jumps over a lazy dog near the river bank"
    val novel = "seven engineers of the valley debugged a streaming pipeline in the night"
    val store = Seq((1L, storeA), (2L, "a merchant of venice sailed in the morning tide"))
      .toDF("doc_id", "text")
    val indexDir = tmp("graft-proto-index")
    val outDir = tmp("graft-proto-out")
    Dedup.minhashIndex(store, "doc_id", "text")
      .write.mode("overwrite").partitionBy("band").parquet(indexDir)
    // batch: an intra-batch dup pair (101 survives), a corpus dup (103)
    val batch = Seq((101L, novel), (102L, novel), (103L, storeA)).toDF("doc_id", "text")
    val noGate: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = df => df
    def run(failAfter: Int): Unit =
      StreamingIngest.curateTextBatch(batch, 7L, indexDir, outDir,
        "doc_id", "text", noGate, 8, 0, failAfterStep = failAfter)
    def assertConverged(): Unit = {
      val out = spark.read.parquet(outDir)
      assert(out.collect().map(_.getLong(0)).toSeq == Seq(101L), "outDir = the survivor, once")
      val ix = spark.read.parquet(indexDir)
      assert(ix.count() == 12L, "4 band rows per doc x {1, 2, 101}, no duplicates")
      val sc = spark.read.parquet(StreamingIngest.idSidecarDir(indexDir))
      assert(sc.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
        == Seq(1L, 2L, 101L), "sidecar = admitted ids, once each")
    }
    // crash after the outDir publish, then after the sidecar publish,
    // then after the index publish — each replay must recompute the
    // identical survivor set and overwrite its own files
    intercept[IllegalStateException](run(failAfter = 1))
    intercept[IllegalStateException](run(failAfter = 2))
    intercept[IllegalStateException](run(failAfter = 3))
    run(failAfter = Int.MaxValue) // the attempt that commits
    assertConverged()
    run(failAfter = Int.MaxValue) // replay of a COMMITTED batch: marker-skipped
    assertConverged()
    // embedding twin through its own riskiest window (index published,
    // marker not written — the probe cannot self-match, so only the
    // replay-aware screens prevent duplicate admission)
    val vstore = Seq((1L, Array(1.0f, 0.0f, 0.5f, 0.2f))).toDF("vec_id", "embedding")
    val vIndexDir = tmp("graft-proto-vindex")
    val vOutDir = tmp("graft-proto-vout")
    graft.operators.Similarity.lshIndex(vstore, "vec_id", "embedding",
        planes = 2, dims = 4, tables = 4)
      .write.mode("overwrite").partitionBy("tbl").parquet(vIndexDir)
    val vbatch = Seq((201L, Array(0.0f, 1.0f, -0.4f, 0.3f))).toDF("vec_id", "embedding")
    def vrun(failAfter: Int): Unit =
      StreamingIngest.curateEmbeddingBatch(vbatch, 3L, vIndexDir, vOutDir,
        "vec_id", "embedding", 900000L, df => df, 0, failAfterStep = failAfter)
    intercept[IllegalStateException](vrun(failAfter = 3))
    vrun(failAfter = Int.MaxValue)
    assert(spark.read.parquet(vOutDir).collect().map(_.getLong(0)).toSeq == Seq(201L))
    assert(spark.read.parquet(vIndexDir)
      .filter(col("vec_id") === 201L).count() == 4L, "4 table rows, not 8")
  }

  test("in-loop curate takedown: store+index purged, tombstone screens re-arrival, crash-idempotent") {
    import graft.operators.Dedup
    val storeA = "the quick brown fox jumps over a lazy dog near the river bank"
    val storeB = "a merchant of venice sailed in the morning tide carrying spice and silk"
    val novelC = "seven engineers of the valley debugged a streaming pipeline in the night"
    val novelD = "nine ravens of the tower guarded a rusty crown in the rain"
    val novelE = "four sailors of the delta charted a shallow reef before the storm"
    val novelF = "two owls of the orchard counted a hundred silver moths at dusk"
    val store = Seq((1L, storeA), (2L, storeB)).toDF("doc_id", "text")
    val indexDir = tmp("graft-takedown-index")
    val outDir = tmp("graft-takedown-out")
    val pend = tmp("graft-takedown-pend")
    Dedup.minhashIndex(store, "doc_id", "text")
      .write.mode("overwrite").partitionBy("band").parquet(indexDir)
    val noGate: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = df => df
    def run(df: org.apache.spark.sql.DataFrame, id: Long,
        failAfter: Int = Int.MaxValue): Unit =
      StreamingIngest.curateTextBatch(df, id, indexDir, outDir,
        "doc_id", "text", noGate, 8, 0, applyDeletesFrom = pend,
        failAfterStep = failAfter)
    def outIds: Seq[Long] =
      spark.read.parquet(outDir).select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    def indexIds: Seq[Long] = spark.read.parquet(indexDir)
      .select("doc_id").distinct().collect().map(_.getLong(0)).sorted.toSeq
    def sidecarIds: Seq[Long] = spark.read.parquet(StreamingIngest.idSidecarDir(indexDir))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

    run(Seq((101L, novelC), (102L, novelD)).toDF("doc_id", "text"), 0L)
    assert(outIds == Seq(101L, 102L))
    // takedown 101 (and an absent id); applied after batch 1 commits
    Seq(101L, 9999L).toDF("doc_id").write.parquet(s"$pend/take1")
    run(Seq((103L, novelE)).toDF("doc_id", "text"), 1L)
    assert(outIds == Seq(102L, 103L), "deleted id purged from the store")
    assert(indexIds == Seq(1L, 2L, 102L, 103L), "signature rows purged from the index")
    assert(sidecarIds == Seq(1L, 2L, 101L, 102L, 103L),
      "the sidecar keeps 101's content-free tombstone")
    assert(new java.io.File(s"$pend/_applied/take1").exists, "list consumed")
    // FORWARD FILTER: the deleted id re-arriving is rejected by the id
    // screen — not re-admitted even though its content left the index
    run(Seq((101L, novelC)).toDF("doc_id", "text"), 2L)
    assert(outIds == Seq(102L, 103L), "tombstone screens the re-arrival out")
    // crash between the halves (store swapped, index not yet): the
    // replay of the committed batch re-applies — store skips (no
    // match), the index half completes, the list is consumed
    Seq(102L).toDF("doc_id").write.parquet(s"$pend/take2")
    intercept[IllegalStateException] {
      run(Seq((301L, novelF)).toDF("doc_id", "text"), 3L, failAfter = 5)
    }
    assert(outIds == Seq(103L, 301L), "store half landed before the crash")
    assert(indexIds.contains(102L), "index half not yet applied")
    assert(new java.io.File(s"$pend/take2").exists, "list not yet consumed")
    run(Seq((301L, novelF)).toDF("doc_id", "text"), 3L)
    assert(outIds == Seq(103L, 301L))
    assert(indexIds == Seq(1L, 2L, 103L, 301L))
    assert(new java.io.File(s"$pend/_applied/take2").exists)
    // crash after both halves, before consume: the replay no-ops both
    // and consumes
    Seq(103L).toDF("doc_id").write.parquet(s"$pend/take3")
    intercept[IllegalStateException] {
      run(Seq((401L, novelC)).toDF("doc_id", "text"), 4L, failAfter = 6)
    }
    assert(new java.io.File(s"$pend/take3").exists)
    run(Seq((401L, novelC)).toDF("doc_id", "text"), 4L)
    assert(outIds == Seq(301L, 401L),
      "103 purged; 401 carries deleted-content C under a NEW id — content " +
        "left the index with the takedown, so it is admitted fresh (the " +
        "tombstone screens ids, not content; that is the contract)")
    assert(indexIds == Seq(1L, 2L, 301L, 401L))
    assert(new java.io.File(s"$pend/_applied/take3").exists)
    assert(sidecarIds == Seq(1L, 2L, 101L, 102L, 103L, 301L, 401L))
  }

  test("in-loop takedown against an all-gated (empty) store is the no-op path, not a crash") {
    import graft.operators.Dedup
    // every batch gates to zero rows, so outDir holds only the
    // _graft_commits markers and no data files — the pending-list read
    // used to throw "unable to infer schema" here and crash the loop
    // every batch; an empty store must take the no-op path (index half
    // still runs, list still consumed)
    val store = Seq(
      (1L, "the quick brown fox jumps over a lazy dog near the river bank"),
      (2L, "a merchant of venice sailed in the morning tide carrying spice and silk"))
      .toDF("doc_id", "text")
    val indexDir = tmp("graft-emptytd-index")
    val outDir = tmp("graft-emptytd-out")
    val pend = tmp("graft-emptytd-pend")
    Dedup.minhashIndex(store, "doc_id", "text")
      .write.mode("overwrite").partitionBy("band").parquet(indexDir)
    val dropAll: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => df.filter(org.apache.spark.sql.functions.lit(false))
    def run(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      StreamingIngest.curateTextBatch(df, id, indexDir, outDir,
        "doc_id", "text", dropAll, 8, 0, applyDeletesFrom = pend)
    run(Seq((101L, "seven engineers of the valley debugged a pipeline in the night"))
      .toDF("doc_id", "text"), 0L)
    // takedown of a bootstrap doc while the store is empty: the store
    // half no-ops, the INDEX half still purges, the list is consumed
    Seq(1L).toDF("doc_id").write.parquet(s"$pend/take1")
    run(Seq((102L, "nine ravens of the tower guarded a rusty crown in the rain"))
      .toDF("doc_id", "text"), 1L)
    assert(new java.io.File(s"$pend/_applied/take1").exists,
      "the pending list must be consumed, not crash the loop")
    assert(spark.read.parquet(indexDir)
      .select("doc_id").distinct().collect().map(_.getLong(0)).sorted.toSeq == Seq(2L),
      "index half applied even though the store half had nothing to do")
  }

  test("curateIvfIngestStream validates reclusterAtSkew at stream construction") {
    // a ratio in (0, 1) used to surface as a repeated per-batch runtime
    // crash inside post-commit maintenance; it must fail before the
    // DataStreamWriter is even built
    val rate = spark.readStream.format("rate").load()
    val e = intercept[IllegalArgumentException] {
      StreamingIngest.curateIvfIngestStream(rate, tmp("x-ix"), tmp("x-out"),
        tmp("x-chk"), "value", "vec", minMicro = 400000L,
        reclusterAtSkew = 0.5)
    }
    assert(e.getMessage.contains("reclusterAtSkew"))
  }

  test("curate stream compaction trigger: mid-stream compaction preserves results, shrinks files") {
    import graft.operators.{Dedup, IndexOps}
    val store = Seq(
      (1L, "the quick brown fox jumps over a lazy dog near the river bank"),
      (2L, "a merchant of venice sailed in the morning tide carrying spice"))
      .toDF("doc_id", "text")
    // six pairwise-disjoint-vocabulary novel docs across three drops
    val novels = Seq(
      "seven engineers of the valley debugged a streaming pipeline in the night",
      "nine ravens guarded a rusty crown beneath the tower in cold rain",
      "two violinists rehearsed an intricate sonata backstage before the grand premiere",
      "five geologists mapped basalt columns along the fjord during brief daylight",
      "three bakers proofed sourdough loaves while the village market slowly opened",
      "eight swimmers crossed the strait at dawn guided by small escort boats")
    def pipeline(compactAt: Int) = {
      val indexDir = tmp(s"graft-cmp$compactAt-index")
      val outDir = tmp(s"graft-cmp$compactAt-out")
      val drop = tmp(s"graft-cmp$compactAt-drop")
      val ckpt = tmp(s"graft-cmp$compactAt-ckpt")
      Dedup.minhashIndex(store, "doc_id", "text")
        .write.mode("overwrite").partitionBy("band").parquet(indexDir)
      def drain(): Unit = {
        val stream = spark.readStream.schema("doc_id LONG, text STRING").parquet(drop)
        StreamingIngest.curateIngestStream(stream, indexDir, outDir, ckpt,
          "doc_id", "text", df => df, compactAtFiles = compactAt)
          .start().awaitTermination()
      }
      novels.grouped(2).zipWithIndex.foreach { case (pair, i) =>
        pair.zipWithIndex.map { case (text, j) => (100L * (i + 1) + j, text) }
          .toDF("doc_id", "text").write.mode("append").parquet(drop)
        drain()
      }
      (indexDir, outDir)
    }
    val (plainIx, plainOut) = pipeline(compactAt = 0)
    val (compIx, compOut) = pipeline(compactAt = 4) // fires every drain
    // identical admissions, identical index CONTENT under both regimes
    assert(spark.read.parquet(compOut).collect().map(_.getLong(0)).sorted.toSeq
      == spark.read.parquet(plainOut).collect().map(_.getLong(0)).sorted.toSeq)
    val probes = (Seq((900L, novels(3))) ++ Seq((901L, "an entirely novel probe document about glacier caves and echoes")))
      .toDF("doc_id", "text")
    assert(canon(Dedup.minhashProbeAuto(probes, spark.read.parquet(compIx),
        "doc_id", "text", minAgree = 1))
      == canon(Dedup.minhashProbeAuto(probes, spark.read.parquet(plainIx),
        "doc_id", "text", minAgree = 1)))
    // and the compacted loop holds strictly fewer index files
    val nPlain = IndexOps.dataFileCount(spark, plainIx)
    val nComp = IndexOps.dataFileCount(spark, compIx)
    assert(nComp < nPlain, s"compaction must shrink the live index ($nComp vs $nPlain)")
    // the id sidecar was compacted with it — the screen stays correct:
    // replaying all six texts under fresh ids admits nothing
    val replayDrop = tmp("graft-cmp-replay")
    val replayCkpt = tmp("graft-cmp-replay-ckpt")
    novels.zipWithIndex.map { case (t, i) => (990L + i, t) }.toDF("doc_id", "text")
      .write.mode("append").parquet(replayDrop)
    val stream = spark.readStream.schema("doc_id LONG, text STRING").parquet(replayDrop)
    StreamingIngest.curateIngestStream(stream, compIx, compOut, replayCkpt,
      "doc_id", "text", df => df, compactAtFiles = 4).start().awaitTermination()
    assert(spark.read.parquet(compOut).count() == 6L,
      "re-sent content under fresh ids must be screened by the compacted index")
  }

  test("curate loops release their checkpoint blocks: storage flat across drains") {
    import graft.operators.Dedup
    val store = Seq((1L, "the quick brown fox jumps over a lazy dog near the river bank"))
      .toDF("doc_id", "text")
    val indexDir = tmp("graft-flat-index")
    val outDir = tmp("graft-flat-out")
    val drop = tmp("graft-flat-drop")
    val ckpt = tmp("graft-flat-ckpt")
    Dedup.minhashIndex(store, "doc_id", "text")
      .write.mode("overwrite").partitionBy("band").parquet(indexDir)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val texts = Seq(
      "nine ravens guarded a rusty crown beneath the tower in cold rain",
      "two violinists rehearsed an intricate sonata backstage before the grand premiere",
      "five geologists mapped basalt columns along the fjord during brief daylight",
      "three bakers proofed sourdough loaves while the village market slowly opened",
      "eight swimmers crossed the strait at dawn guided by small escort boats",
      "seven engineers of the valley debugged a streaming pipeline in the night")
    texts.zipWithIndex.foreach { case (text, i) =>
      Seq((500L + i, text)).toDF("doc_id", "text")
        .write.mode("append").parquet(drop)
      val stream = spark.readStream.schema("doc_id LONG, text STRING").parquet(drop)
      StreamingIngest.curateIngestStream(stream, indexDir, outDir, ckpt,
        "doc_id", "text", df => df).start().awaitTermination()
      // every batch's eager checkpoints (gated, admitted, the collapse
      // internals) must be gone the moment the drain returns — six
      // batches, zero accumulation, not "eventually collected"
      val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
      assert(leaked.isEmpty, s"batch $i leaked persisted RDDs: $leaked")
    }
    assert(spark.read.parquet(outDir).count() == 6L)
  }

  test("streaming embedding curate mirrors the text contract across drains") {
    import graft.operators.Similarity
    val store = Seq(
      (1L, Array(1.0f, 0.0f, 0.5f, 0.2f)),
      (2L, Array(-0.8f, 0.3f, 0.1f, -0.6f))).toDF("vec_id", "embedding")
    val indexDir = tmp("graft-ecurate-index")
    val outDir = tmp("graft-ecurate-out")
    val drop = tmp("graft-ecurate-drop")
    val ckpt = tmp("graft-ecurate-ckpt")
    Similarity.lshIndex(store, "vec_id", "embedding", planes = 2, dims = 4, tables = 4)
      .write.mode("overwrite").partitionBy("tbl").parquet(indexDir)

    def drain(): Unit = {
      val stream = spark.readStream
        .schema("vec_id LONG, embedding ARRAY<FLOAT>").parquet(drop)
      StreamingIngest.curateEmbeddingIngestStream(stream, indexDir, outDir, ckpt,
        "vec_id", "embedding", minMicro = 900000L).start().awaitTermination()
    }

    // drop 1: near-dup of store 1, a novel direction twice (in-batch pair)
    Seq(
      (101L, Array(0.99f, 0.01f, 0.5f, 0.2f)),
      (102L, Array(0.0f, 1.0f, -0.4f, 0.3f)),
      (103L, Array(0.01f, 0.99f, -0.4f, 0.3f)))
      .toDF("vec_id", "embedding")
      .write.mode("append").parquet(drop)
    drain()
    assert(spark.read.parquet(outDir).collect().map(_.getLong(0)).toSeq == Seq(102L))

    // drop 2: a replay of 102's direction is caught by the GROWN index;
    // an orthogonal vector survives
    Seq(
      (201L, Array(0.0f, 1.0f, -0.4f, 0.3f)),
      (202L, Array(0.3f, -0.2f, -0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
      .write.mode("append").parquet(drop)
    drain()
    assert(spark.read.parquet(outDir).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(102L, 202L))
    val grown = spark.read.parquet(indexDir)
    assert(grown.select("vec_id").distinct().collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 102L, 202L))
    assert(grown.select("ix_planes", "ix_dims", "ix_tables").distinct().count() == 1)

    // drop 3: re-arrival of an admitted id (the replayed-batch shape —
    // the probe would NOT self-match, the id screen is load-bearing)
    // plus a zero-norm vector (rejected at the door, not admitted)
    Seq(
      (102L, Array(0.0f, 1.0f, -0.4f, 0.3f)),
      (301L, Array(0.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
      .write.mode("append").parquet(drop)
    drain()
    assert(spark.read.parquet(outDir).count() == 2,
      "replayed id and zero-norm vector must both be rejected")
    assert(spark.read.parquet(indexDir).count() == grown.count(),
      "re-arrival must not grow the index")
  }

  test("streaming IVF curate mirrors the embedding contract across drains") {
    import graft.operators.Similarity
    val store = Seq(
      (1L, Array(1.0f, 0.0f, 0.5f, 0.2f)),
      (2L, Array(-0.8f, 0.3f, 0.1f, -0.6f))).toDF("vec_id", "embedding")
    val indexDir = tmp("graft-ivfcurate-index")
    val outDir = tmp("graft-ivfcurate-out")
    val drop = tmp("graft-ivfcurate-drop")
    val ckpt = tmp("graft-ivfcurate-ckpt")
    // nCells=2, nProbe=2: every vector probes both cells, so the screen
    // is exhaustive and the assertions are exact-cosine facts
    Similarity.ivfIndex(store, "vec_id", "embedding", nCells = 2, dims = 4)
      .write.mode("overwrite").partitionBy("cell").parquet(indexDir)

    def drain(): Unit = {
      val stream = spark.readStream
        .schema("vec_id LONG, embedding ARRAY<FLOAT>").parquet(drop)
      StreamingIngest.curateIvfIngestStream(stream, indexDir, outDir, ckpt,
        "vec_id", "embedding", minMicro = 900000L, nProbe = 2)
        .start().awaitTermination()
    }

    // drop 1: near-dup of store 1, a novel direction twice (in-batch pair)
    Seq(
      (101L, Array(0.99f, 0.01f, 0.5f, 0.2f)),
      (102L, Array(0.0f, 1.0f, -0.4f, 0.3f)),
      (103L, Array(0.01f, 0.99f, -0.4f, 0.3f)))
      .toDF("vec_id", "embedding")
      .write.mode("append").parquet(drop)
    drain()
    assert(spark.read.parquet(outDir).collect().map(_.getLong(0)).toSeq == Seq(102L))

    // drop 2: a replay of 102's direction is caught by the GROWN index;
    // an orthogonal vector survives
    Seq(
      (201L, Array(0.0f, 1.0f, -0.4f, 0.3f)),
      (202L, Array(0.3f, -0.2f, -0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
      .write.mode("append").parquet(drop)
    drain()
    assert(spark.read.parquet(outDir).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(102L, 202L))
    val grown = spark.read.parquet(indexDir)
    assert(grown.select("vec_id").distinct().collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 102L, 202L))
    assert(grown.select("ix_cells", "ix_dims").distinct().count() == 1)
    // appended rows are assigned under the BOOTSTRAP centroids — is_cent
    // marks exactly the two store vectors, before and after growth
    assert(grown.filter(col("is_cent")).select("vec_id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))

    // drop 3: re-arrival of an admitted id (id screen — the IVF probe
    // would not self-match either) plus a zero-norm vector
    Seq(
      (102L, Array(0.0f, 1.0f, -0.4f, 0.3f)),
      (301L, Array(0.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
      .write.mode("append").parquet(drop)
    drain()
    assert(spark.read.parquet(outDir).count() == 2,
      "replayed id and zero-norm vector must both be rejected")
    assert(spark.read.parquet(indexDir).count() == grown.count(),
      "re-arrival must not grow the index")
  }

  test("streaming PQ curate mirrors the IVF contract across drains — on codes, not vectors") {
    import graft.operators.Pq
    // hand-computed ADC fixture (dims 4, nSub 2, k 4): the four store
    // vectors are all codebook anchors, so their codes reconstruct
    // exactly and every screen decision below is an arithmetic fact,
    // not a hope. x = (0.6, 0.8, 0.8, -0.6) encodes to (a3, a4)'s
    // codewords, so a later same-direction arrival scores
    // 2·floor(1e6/√2) = 1414212 ≥ minMicro against x's CODE alone —
    // the compressed screen remembers admitted content without raw
    // vectors.
    val store = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 1.0f)),
      (3L, Array(0.6f, 0.8f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 0.8f, -0.6f))).toDF("vec_id", "embedding")
    val indexDir = tmp("graft-pqcurate-index")
    val cbDir = tmp("graft-pqcurate-cb")
    val outDir = tmp("graft-pqcurate-out")
    val drop = tmp("graft-pqcurate-drop")
    val ckpt = tmp("graft-pqcurate-ckpt")
    val cb = Pq.pqCodebook(store, "vec_id", "embedding", dims = 4, nSub = 2, k = 4)
    cb.write.mode("overwrite").parquet(cbDir)
    Pq.pqIndex(store, "vec_id", "embedding", cb, nCells = 2, dims = 4)
      .write.mode("overwrite").partitionBy("cell").parquet(indexDir)

    def drain(): Unit = {
      val stream = spark.readStream
        .schema("vec_id LONG, embedding ARRAY<FLOAT>").parquet(drop)
      StreamingIngest.curatePqIngestStream(stream, indexDir, cbDir, outDir,
        ckpt, "vec_id", "embedding", minMicro = 900000L, nProbe = 2)
        .start().awaitTermination()
    }

    // drop 1: 101 = a3's direction (ADC 1000000 against a3's exact
    // code → screened); 102/103 = the same novel direction twice
    // (best corpus ADC 707106 < 900000 → admitted; exact in-batch
    // cosine 1.0 → collapsed to min id)
    Seq(
      (101L, Array(0.6f, 0.8f, 0.0f, 0.0f)),
      (102L, Array(0.6f, 0.8f, 0.8f, -0.6f)),
      (103L, Array(1.2f, 1.6f, 1.6f, -1.2f)))
      .toDF("vec_id", "embedding")
      .write.mode("append").parquet(drop)
    drain()
    assert(spark.read.parquet(outDir).collect().map(_.getLong(0)).toSeq == Seq(102L))

    // drop 2: 201 replays 102's DIRECTION under a new id — caught by
    // the GROWN index's code rows (1414212 ≥ 900000, computed above);
    // 202 is novel (best ADC 800000 < 900000) and survives
    Seq(
      (201L, Array(0.3f, 0.4f, 0.4f, -0.3f)),
      (202L, Array(0.8f, -0.6f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
      .write.mode("append").parquet(drop)
    drain()
    assert(spark.read.parquet(outDir).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(102L, 202L))
    val grown = spark.read.parquet(indexDir)
    assert(grown.select("vec_id").distinct().collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 3L, 4L, 102L, 202L))
    // the storage contract survives growth: appended rows carry CODES
    // only, centroids stay the bootstrap pair, one stamp family
    assert(grown.filter(!col("is_cent") && col("embedding").isNotNull).isEmpty,
      "member rows must never carry raw vectors")
    assert(grown.filter(col("pq_codes").isNull).isEmpty)
    assert(grown.filter(col("is_cent")).count() == 2)
    assert(grown.select("ix_cells", "ix_dims", "pq_sub", "pq_k", "pq_cb")
      .distinct().count() == 1)

    // drop 3: re-arrival of an admitted id (the id screen is
    // load-bearing — codes cannot self-match an excluded id) plus a
    // zero-norm vector; both rejected, nothing grows
    Seq(
      (102L, Array(0.6f, 0.8f, 0.8f, -0.6f)),
      (301L, Array(0.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
      .write.mode("append").parquet(drop)
    drain()
    assert(spark.read.parquet(outDir).count() == 2)
    assert(spark.read.parquet(indexDir).count() == grown.count())
  }

  test("PQ curate batch protocol: replay after every write converges; takedown refuses centroid anchors loudly") {
    import graft.operators.Pq
    val store = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 1.0f)),
      (3L, Array(0.6f, 0.8f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 0.8f, -0.6f))).toDF("vec_id", "embedding")
    val indexDir = tmp("graft-pqproto-index")
    val cbDir = tmp("graft-pqproto-cb")
    val outDir = tmp("graft-pqproto-out")
    val pend = tmp("graft-pqproto-pend")
    val cb = Pq.pqCodebook(store, "vec_id", "embedding", dims = 4, nSub = 2, k = 4)
    cb.write.mode("overwrite").parquet(cbDir)
    Pq.pqIndex(store, "vec_id", "embedding", cb, nCells = 2, dims = 4)
      .write.mode("overwrite").partitionBy("cell").parquet(indexDir)
    def run(df: org.apache.spark.sql.DataFrame, id: Long,
        failAfter: Int = Int.MaxValue): Unit =
      StreamingIngest.curatePqBatch(df, id, indexDir, cbDir, outDir,
        "vec_id", "embedding", 900000L, 2, x => x, 0,
        applyDeletesFrom = pend, failAfterStep = failAfter)
    // the replay proof: an intra-batch dup pair (102 survives) and a
    // corpus dup (101); crash after EVERY write of the protocol, then
    // the committing attempt, then a replay of the committed batch
    val batch = Seq(
      (101L, Array(0.6f, 0.8f, 0.0f, 0.0f)),
      (102L, Array(0.6f, 0.8f, 0.8f, -0.6f)),
      (103L, Array(1.2f, 1.6f, 1.6f, -1.2f))).toDF("vec_id", "embedding")
    def assertConverged(): Unit = {
      assert(spark.read.parquet(outDir).collect().map(_.getLong(0)).toSeq
        == Seq(102L), "outDir = the survivor, once")
      assert(spark.read.parquet(indexDir).count() == 5,
        "4 bootstrap rows + 1 admitted code row, no duplicates")
      assert(spark.read.parquet(StreamingIngest.idSidecarDir(indexDir))
        .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
        == Seq(1L, 2L, 3L, 4L, 102L))
    }
    intercept[IllegalStateException](run(batch, 0L, failAfter = 1))
    intercept[IllegalStateException](run(batch, 0L, failAfter = 2))
    intercept[IllegalStateException](run(batch, 0L, failAfter = 3))
    run(batch, 0L)
    assertConverged()
    run(batch, 0L) // replay of a COMMITTED batch: marker-skipped
    assertConverged()
    // member takedown in-loop: store + index purged, tombstone kept
    Seq(102L).toDF("vec_id").write.parquet(s"$pend/take1")
    run(Seq((401L, Array(0.8f, -0.6f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding"), 1L)
    assert(spark.read.parquet(outDir).collect().map(_.getLong(0)).toSeq == Seq(401L))
    assert(spark.read.parquet(indexDir).filter(col("vec_id") === 102L).isEmpty)
    assert(new java.io.File(s"$pend/_applied/take1").exists)
    // 102's direction RE-ARRIVING under a new id is admitted again —
    // its content left the index with the takedown (the tombstone
    // screens ids, not content; same contract as the text loop)
    // …but first: a CENTROID-anchor takedown is refused LOUDLY, every
    // batch, until the operator resolves it offline (Pq.pqTakedown) —
    // codes cannot rebuild the quantizer
    val cent = spark.read.parquet(indexDir).filter(col("is_cent"))
      .select("vec_id").collect().map(_.getLong(0)).head
    Seq(cent).toDF("vec_id").write.parquet(s"$pend/take2")
    val ex = intercept[IllegalArgumentException] {
      run(Seq((402L, Array(0.0f, 1.0f, 0.0f, 0.0f)))
        .toDF("vec_id", "embedding"), 2L)
    }
    assert(ex.getMessage.contains("CENTROID") &&
      ex.getMessage.contains("pqTakedown"))
    assert(new java.io.File(s"$pend/take2").exists, "refused list stays pending")
    // the batch itself COMMITTED before the takedown ran: resolving the
    // list offline (here: withdrawing it) lets the replay complete
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$pend/take2"))
    run(Seq((402L, Array(0.0f, 1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding"), 2L)
    assert(spark.read.parquet(outDir).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(401L, 402L))
  }

  test("in-loop IVF takedown: member and centroid-anchor ids leave index and store") {
    import graft.operators.Similarity
    val store = Seq(
      (1L, Array(1.0f, 0.0f, 0.5f, 0.2f)),
      (2L, Array(-0.8f, 0.3f, 0.1f, -0.6f))).toDF("vec_id", "embedding")
    val indexDir = tmp("graft-ivftake-index")
    val outDir = tmp("graft-ivftake-out")
    val pend = tmp("graft-ivftake-pend")
    Similarity.ivfIndex(store, "vec_id", "embedding", nCells = 2, dims = 4)
      .write.mode("overwrite").partitionBy("cell").parquet(indexDir)
    def run(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      StreamingIngest.curateIvfBatch(df, id, indexDir, outDir,
        "vec_id", "embedding", 900000L, 2, x => x, 0,
        applyDeletesFrom = pend)
    run(Seq((101L, Array(0.0f, 1.0f, -0.4f, 0.3f))).toDF("vec_id", "embedding"), 0L)
    assert(spark.read.parquet(outDir).count() == 1)
    // take down 101 (a member) AND 1 (a bootstrap id that may anchor a
    // centroid — the deleteSwapIvf centroid rule applies in-loop)
    Seq(101L, 1L).toDF("vec_id").write.parquet(s"$pend/take")
    run(Seq((201L, Array(0.7f, -0.7f, 0.1f, 0.0f))).toDF("vec_id", "embedding"), 1L)
    val ix = spark.read.parquet(indexDir)
    assert(ix.filter(col("vec_id").isin(1L, 101L)).isEmpty,
      "deleted ids gone from the index, centroid anchors included")
    assert(spark.read.parquet(outDir)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(201L))
    // probes still bind on the rebuilt index: the survivor is findable
    val probe = Similarity.ivfIndexProbeAuto(
      Seq((901L, Array(-0.8f, 0.3f, 0.1f, -0.6f))).toDF("vec_id", "embedding"),
      ix, "vec_id", "embedding", k = 3, nProbe = 2)
    assert(probe.filter(col("neighbor_id") === 2L).count() >= 1,
      "surviving store vector still matched post-takedown")
    assert(probe.filter(col("neighbor_id").isin(1L, 101L)).isEmpty,
      "deleted ids are probe-invisible")
  }

  test("in-loop recluster and takedown compose in one stream; the window between them heals") {
    import graft.operators.Similarity
    val store = Seq(
      (1L, Array(1.0f, 0.0f, 0.5f, 0.2f)),
      (2L, Array(-0.8f, 0.3f, 0.1f, -0.6f))).toDF("vec_id", "embedding")
    val indexDir = tmp("graft-rectake-index")
    val outDir = tmp("graft-rectake-out")
    val pend = tmp("graft-rectake-pend")
    Similarity.ivfIndex(store, "vec_id", "embedding", nCells = 2, dims = 4)
      .write.mode("overwrite").partitionBy("cell").parquet(indexDir)
    val blob = (1 to 12).map(i =>
      (400L + i, Array(1.0f, 0.05f * i, 0.3f, 0.1f))).toDF("vec_id", "embedding")
    def run(df: org.apache.spark.sql.DataFrame, id: Long,
        failAfter: Int = Int.MaxValue): Unit =
      StreamingIngest.curateIvfBatch(df, id, indexDir, outDir,
        "vec_id", "embedding", 999999L, 2, x => x, 0,
        reclusterAtSkew = 1.2, applyDeletesFrom = pend,
        failAfterStep = failAfter)
    run(blob, 0L) // skew builds: cells 13 vs 1 (recluster fires already)
    assert(spark.read.parquet(outDir).count() == 12)
    // takedown naming a bootstrap id that MAY anchor a centroid (1),
    // an admitted member (405), and an absent id — dropped while both
    // in-loop maintenance knobs are live
    Seq(1L, 405L, 9999L).toDF("vec_id").write.parquet(s"$pend/take1")
    // crash AFTER the (possible) recluster, BEFORE the takedown: the
    // batch is committed, the list still pending
    intercept[IllegalStateException] {
      run(Seq((501L, Array(0.9f, -0.05f, 0.4f, 0.15f)))
        .toDF("vec_id", "embedding"), 1L, failAfter = 4)
    }
    assert(new java.io.File(s"$pend/take1").exists, "list must still be pending")
    // replay of the committed batch: write path skipped, the takedown
    // applies BOTH halves (store rewrite + deleteSwapIvf, centroid rule
    // included whatever the recluster did to centroid anchorship) and
    // consumes the list
    run(Seq((501L, Array(0.9f, -0.05f, 0.4f, 0.15f)))
      .toDF("vec_id", "embedding"), 1L)
    assert(new java.io.File(s"$pend/_applied/take1").exists)
    val outIds = spark.read.parquet(outDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(outIds == ((401L to 412L).toSet - 405L) + 501L,
      s"store after takedown: $outIds")
    val ix = spark.read.parquet(indexDir)
    assert(ix.filter(col("vec_id").isin(1L, 405L)).isEmpty,
      "deleted ids gone from the re-clustered index")
    assert(ix.select("ix_cells", "ix_dims").distinct().count() == 1, "stamp unique")
    // probes still bind, deleted ids invisible, survivors findable
    val probe = Similarity.ivfIndexProbeAuto(
      Seq((900L, Array(1.0f, 0.05f * 4, 0.3f, 0.1f))).toDF("vec_id", "embedding"),
      ix, "vec_id", "embedding", k = 3, nProbe = 2)
    assert(probe.filter(col("neighbor_id").isin(1L, 405L)).isEmpty)
    assert(probe.count() > 0)
    // forward filter survives both maintenance rewrites: 405 re-arriving
    // is tombstone-screened, not re-admitted
    run(Seq((405L, Array(1.0f, 0.25f, 0.3f, 0.1f))).toDF("vec_id", "embedding"), 2L)
    assert(spark.read.parquet(outDir).filter(col("vec_id") === 405L).isEmpty,
      "tombstone must screen the re-arrival after recluster + takedown")
  }

  test("in-loop recluster fires on cell skew, crash-replay safe, screen intact") {
    import graft.operators.Similarity
    // bootstrap: two orthogonal-ish directions, one centroid each
    val store = Seq(
      (1L, Array(1.0f, 0.0f, 0.5f, 0.2f)),
      (2L, Array(-0.8f, 0.3f, 0.1f, -0.6f))).toDF("vec_id", "embedding")
    val indexDir = tmp("graft-recluster-index")
    val outDir = tmp("graft-recluster-out")
    Similarity.ivfIndex(store, "vec_id", "embedding", nCells = 2, dims = 4)
      .write.mode("overwrite").partitionBy("cell").parquet(indexDir)
    // a 12-vector blob near direction 1: pairwise cosine ~0.999 (all
    // admitted at minMicro=999999), all landing in centroid 1's cell —
    // the frozen-centroid drift this trigger exists to catch
    val blob = (1 to 12).map(i =>
      (400L + i, Array(1.0f, 0.05f * i, 0.3f, 0.1f))).toDF("vec_id", "embedding")
    def files(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(indexDir))
        .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSet
    }
    // batch 0, trigger OFF: skew accumulates (cells 13 vs 1), nothing rewritten
    StreamingIngest.curateIvfBatch(blob, 0L, indexDir, outDir,
      "vec_id", "embedding", 999999L, 2, df => df, 0)
    val before = files()
    assert(spark.read.parquet(outDir).count() == 12, "whole blob admitted")
    // batch 1, trigger ON (max/mean = 14/7.5 > 1.2): recluster swaps in a
    // fresh generation — every pre-batch file is replaced, members intact
    StreamingIngest.curateIvfBatch(
      Seq((500L, Array(0.9f, -0.05f, 0.4f, 0.15f))).toDF("vec_id", "embedding"),
      1L, indexDir, outDir, "vec_id", "embedding", 999999L, 2, df => df, 0,
      reclusterAtSkew = 1.2)
    val after = files()
    assert(before.intersect(after).isEmpty,
      "recluster must swap in a fresh index generation")
    val ix = spark.read.parquet(indexDir)
    assert(ix.select("vec_id").distinct().count() == 15, "member set unchanged by recluster")
    assert(ix.select("ix_cells", "ix_dims").distinct().count() == 1, "stamp intact")
    // the screen still answers exactly through the re-clustered index
    val probe = Similarity.ivfIndexProbeAuto(
      Seq((900L, Array(1.0f, 0.051f, 0.3f, 0.1f))).toDF("vec_id", "embedding"),
      ix, "vec_id", "embedding", k = 1, nProbe = 2)
    assert(probe.select("neighbor_id").collect().map(_.getLong(0)).toSeq == Seq(401L))

    // crash AFTER the recluster (failpoint 4): the batch is already
    // committed — the replay heals at entry and skips the write path
    val indexDir2 = tmp("graft-recluster2-index")
    val outDir2 = tmp("graft-recluster2-out")
    Similarity.ivfIndex(store, "vec_id", "embedding", nCells = 2, dims = 4)
      .write.mode("overwrite").partitionBy("cell").parquet(indexDir2)
    intercept[IllegalStateException] {
      StreamingIngest.curateIvfBatch(blob, 0L, indexDir2, outDir2,
        "vec_id", "embedding", 999999L, 2, df => df, 0,
        reclusterAtSkew = 1.2, failAfterStep = 4)
    }
    StreamingIngest.curateIvfBatch(blob, 0L, indexDir2, outDir2,
      "vec_id", "embedding", 999999L, 2, df => df, 0, reclusterAtSkew = 1.2)
    assert(spark.read.parquet(outDir2).count() == 12, "no double admission")
    assert(spark.read.parquet(indexDir2).select("vec_id").distinct().count() == 14)
    // crash INSIDE the recluster's swap (live dir renamed away): the
    // next batch's entry recovery restores it before reading
    assert(new java.io.File(indexDir2).renameTo(new java.io.File(indexDir2 + ".old")))
    spark.catalog.refreshByPath(indexDir2)
    StreamingIngest.curateIvfBatch(
      Seq((600L, Array(-0.7f, 0.35f, 0.15f, -0.55f))).toDF("vec_id", "embedding"),
      1L, indexDir2, outDir2, "vec_id", "embedding", 999999L, 2, df => df, 0,
      reclusterAtSkew = 1.2)
    assert(spark.read.parquet(indexDir2).select("vec_id").distinct().count() == 15)
  }

  test("IVF curate batch protocol: replay after every write converges; compaction preserves the screen") {
    import graft.operators.{IndexOps, Similarity}
    val store = Seq(
      (1L, Array(1.0f, 0.0f, 0.5f, 0.2f)),
      (2L, Array(-0.8f, 0.3f, 0.1f, -0.6f))).toDF("vec_id", "embedding")
    val indexDir = tmp("graft-ivfproto-index")
    val outDir = tmp("graft-ivfproto-out")
    Similarity.ivfIndex(store, "vec_id", "embedding", nCells = 2, dims = 4)
      .write.mode("overwrite").partitionBy("cell").parquet(indexDir)
    // an intra-batch dup pair (201 survives), a corpus dup of store 1
    val batch = Seq(
      (201L, Array(0.0f, 1.0f, -0.4f, 0.3f)),
      (202L, Array(0.01f, 0.99f, -0.4f, 0.3f)),
      (203L, Array(0.99f, 0.01f, 0.5f, 0.2f)))
      .toDF("vec_id", "embedding")
    def run(failAfter: Int): Unit =
      StreamingIngest.curateIvfBatch(batch, 7L, indexDir, outDir,
        "vec_id", "embedding", 900000L, 2, df => df, 0, failAfterStep = failAfter)
    def assertConverged(): Unit = {
      assert(spark.read.parquet(outDir).collect().map(_.getLong(0)).toSeq
        == Seq(201L), "outDir = the survivor, once")
      val ix = spark.read.parquet(indexDir)
      assert(ix.count() == 3L, "one cell row per vector x {1, 2, 201}")
      assert(spark.read.parquet(StreamingIngest.idSidecarDir(indexDir))
        .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
        == Seq(1L, 2L, 201L), "sidecar = admitted ids, once each")
    }
    // crash after the outDir publish, the sidecar publish, the index
    // publish — each replay recomputes the identical survivor set (the
    // riskiest window is after step 3: the index holds 201's row but
    // the probe cannot self-match, so only the replay-aware screens
    // prevent duplicate admission)
    intercept[IllegalStateException](run(failAfter = 1))
    intercept[IllegalStateException](run(failAfter = 2))
    intercept[IllegalStateException](run(failAfter = 3))
    run(failAfter = Int.MaxValue)
    assertConverged()
    run(failAfter = Int.MaxValue) // replay of a COMMITTED batch: marker-skipped
    assertConverged()
    // post-commit compaction (threshold 1 file — fires): identical
    // screen behavior through the compacted index, fewer files
    val before = IndexOps.dataFileCount(spark, indexDir)
    StreamingIngest.curateIvfBatch(
      Seq((301L, Array(0.3f, -0.2f, -0.9f, 0.1f))).toDF("vec_id", "embedding"),
      8L, indexDir, outDir, "vec_id", "embedding", 900000L, 2, df => df,
      compactAtFiles = 1)
    assert(IndexOps.dataFileCount(spark, indexDir) < before + 2,
      "compaction must fold the appended files back in")
    val probe = Similarity.ivfIndexProbeAuto(
      Seq((900L, Array(0.0f, 1.0f, -0.4f, 0.3f))).toDF("vec_id", "embedding"),
      spark.read.parquet(indexDir), "vec_id", "embedding", k = 1, nProbe = 2)
    assert(probe.select("neighbor_id").collect().map(_.getLong(0)).toSeq
      == Seq(201L), "the compacted index still answers the screen probe")
  }

  test("streaming range enrich matches the batch range join on the real events slice") {
    // The q83 shape with the points side streamed: purchases dropped as
    // csv chunks, statically range-joined into the browse sessions of
    // the same slice. rangeEnrichStream is stateless per point row, so
    // — unlike sessionization — ANY chunking must match batch exactly,
    // with no finality caveat; the chunks here are deliberately split
    // round-robin (NOT time-contiguous) to prove order independence.
    val dir = "/root/testdata/sf0.001"
    val gapUs = 28800L * 1000000L
    val drop = tmp("graft-rangeq83-drop")
    val out = tmp("graft-rangeq83-out")
    val ckpt = tmp("graft-rangeq83-ckpt")

    val ev = graft.Tables(spark, dir).events
    val sessions = graft.operators.Temporal.sessionIntervals(
        ev.filter(col("event_type").isin("view", "click")),
        Seq("user_id"), "ts", gapUs, tieBreak = Seq("event_id"))
      .cache() // stream-static contract: cache the static side
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts")

    purchases
      .withColumn("ts", date_format(col("ts").cast("timestamp"),
        "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .withColumn("chunk", pmod(col("event_id"), lit(3L))) // round-robin
      .repartition(1)
      .write.partitionBy("chunk").option("header", "true").csv(s"$drop/files")

    val stream = spark.readStream
      .option("header", "true").option("maxFilesPerTrigger", 1)
      .schema("user_id LONG, event_id LONG, ts TIMESTAMP")
      .csv(s"$drop/files/chunk=*")
    val enriched = StreamingIngest.rangeEnrichStream(stream, sessions,
      Seq("user_id"), "ts", "session_start", "session_end", bucketWidth = gapUs)
    assert(enriched.isStreaming)
    StreamingIngest.availableNow(enriched, out, ckpt).start().awaitTermination()

    def comparable(df: org.apache.spark.sql.DataFrame) = df.select(
      col("user_id"), col("event_id"),
      unix_micros(col("ts").cast("timestamp")).as("ts_us"),
      col("session_seq"),
      unix_micros(col("session_start").cast("timestamp")).as("start_us"),
      col("n_events"))
    val streamed = comparable(spark.read.parquet(out))
    val batch = comparable(graft.operators.Temporal.rangeJoin(
      purchases, sessions, Seq("user_id"), "ts",
      "session_start", "session_end", bucketWidth = gapUs))
    assert(batch.count() > 0, "slice must produce real matches")
    assertSameRows(streamed, batch)
    sessions.unpersist()
  }

  test("ingest gates: a hot-key batch and a drifted batch surface per-batch gate rows") {
    import graft.operators.Dedup
    val store = Seq(
      (1L, "the quick brown fox jumps over a lazy dog near the river bank", "s0", 50.0))
      .toDF("doc_id", "text", "source", "score")
    val indexDir = tmp("graft-gate-index")
    val outDir = tmp("graft-gate-out")
    val drop = tmp("graft-gate-drop")
    val ckpt = tmp("graft-gate-ckpt")
    Dedup.minhashIndex(store, "doc_id", "text")
      .write.mode("overwrite").partitionBy("band").parquet(indexDir)
    // reference distribution: uniform 0..99 — exactly 5 values per bin
    val ref = (0 until 100).map(_.toDouble).toDF("score")
    val gates = StreamingIngest.BatchGates(
      keyBalance = Some(StreamingIngest.KeyBalanceGate(Seq("source"), maxSharePermille = 600)),
      drift = Some(StreamingIngest.DriftGate(ref, "score", maxL1Permille = 800)))
    def drain(): Unit = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING, source STRING, score DOUBLE")
        .parquet(drop)
      StreamingIngest.curateIngestStream(stream, indexDir, outDir, ckpt,
        "doc_id", "text", gate = df => df, gates = gates)
        .start().awaitTermination()
    }
    def noisyText(i: Int): String =
      (0 until 12).map(w => s"tok${i}w$w").mkString(" ")

    // batch 0: balanced sources (500 permille each), one score per ref
    // bin (L1 = 0) — gate rows publish, nothing violated
    val clean = (0 until 20).map(i =>
      (100L + i, noisyText(i), if (i % 2 == 0) "a" else "b", 5.0 * i + 2.5))
      .toDF("doc_id", "text", "source", "score")
    clean.write.mode("append").parquet(drop)
    drain()
    val gateDir = StreamingIngest.gateReportDir(outDir)
    val g0 = spark.read.parquet(gateDir).filter(col("batch_id") === 0L).collect()
    assert(g0.length == 3, s"2 key rows + 1 drift row expected, got ${g0.length}")
    assert(g0.forall(!_.getAs[Boolean]("violated")), "clean batch must not violate")
    assert(g0.filter(_.getAs[String]("gate") == "drift_l1")
      .head.getAs[Long]("permille") == 0L, "bin-matched batch has L1 = 0")
    assert(spark.read.parquet(outDir).count() == 20, "clean batch admitted")

    // batch 1: every row the same source (1000 permille) and the same
    // out-of-shape score (mass in one bin) — both gates flag; the
    // default flag-only mode still admits the batch
    val dirty = (0 until 10).map(i =>
      (300L + i, noisyText(1000 + i), "c", 99.9))
      .toDF("doc_id", "text", "source", "score")
    dirty.write.mode("append").parquet(drop)
    drain()
    val g1 = spark.read.parquet(gateDir).filter(col("batch_id") === 1L)
      .collect().map(r => (r.getAs[String]("gate"), r.getAs[String]("key"),
        r.getAs[Long]("permille"), r.getAs[Boolean]("violated"))).toSet
    assert(g1 == Set(
      ("key_balance", "source=c", 1000L, true),
      ("drift_l1", "score", 1900L, true)), s"got $g1")
    assert(spark.read.parquet(outDir).count() == 30, "flag mode still admits")
  }

  test("ingest gates: refuse halts before any state mutation; a cleared re-run converges") {
    import graft.operators.Dedup
    val store = Seq(
      (1L, "the quick brown fox jumps over a lazy dog near the river bank", "s0"))
      .toDF("doc_id", "text", "source")
    val indexDir = tmp("graft-refuse-index")
    val outDir = tmp("graft-refuse-out")
    Dedup.minhashIndex(store, "doc_id", "text")
      .write.mode("overwrite").partitionBy("band").parquet(indexDir)
    val refusing = StreamingIngest.BatchGates(
      keyBalance = Some(StreamingIngest.KeyBalanceGate(Seq("source"), maxSharePermille = 600)),
      refuse = true)
    val hot = (0 until 4).map(i =>
      (500L + i, (0 until 12).map(w => s"hot${i}w$w").mkString(" "), "z"))
      .toDF("doc_id", "text", "source")
    val ex = intercept[IllegalStateException] {
      StreamingIngest.curateTextBatch(hot, 3L, indexDir, outDir,
        "doc_id", "text", gate = df => df, minAgree = 8, compactAtFiles = 0,
        gates = refusing)
    }
    assert(ex.getMessage.contains("refused batch 3"))
    // evidence on disk, nothing admitted, batch uncommitted
    val gateDir = StreamingIngest.gateReportDir(outDir)
    val rows = spark.read.parquet(gateDir).collect()
    assert(rows.length == 1 && rows.head.getAs[Boolean]("violated"))
    val (fs, outPath) = (new org.apache.hadoop.fs.Path(outDir))
      .getFileSystem(spark.sessionState.newHadoopConf()) ->
      new org.apache.hadoop.fs.Path(outDir)
    assert(!fs.listFiles(outPath, true).hasNext ||
      spark.read.parquet(outDir).isEmpty)
    // operator clears the policy: the SAME batch id re-runs (the
    // sequential-replay shape), overwrites its own gate rows, admits
    StreamingIngest.curateTextBatch(hot, 3L, indexDir, outDir,
      "doc_id", "text", gate = df => df, minAgree = 8, compactAtFiles = 0,
      gates = refusing.copy(refuse = false))
    assert(spark.read.parquet(outDir).count() == 4)
    assert(spark.read.parquet(gateDir).count() == 1, "replay overwrote its gate rows")
    // and a third run of the now-committed batch is the skip path
    StreamingIngest.curateTextBatch(hot, 3L, indexDir, outDir,
      "doc_id", "text", gate = df => df, minAgree = 8, compactAtFiles = 0,
      gates = refusing)
    assert(spark.read.parquet(outDir).count() == 4)
  }
}

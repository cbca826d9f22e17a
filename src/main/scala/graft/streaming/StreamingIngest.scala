package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming ingest (SURVEY.md §2.10 — deliberately beyond parity): the
  * reference's yearly-file drop (`rptinfo2014..2023.csv`,
  * `/root/reference/down/down_water_prep.py:204-215`, re-downloaded and
  * re-run by hand) maps onto Spark's file source: the same directory
  * becomes a stream, each new drop is discovered and processed exactly
  * once, and `Trigger.AvailableNow` gives batch-like "process what's
  * there, then stop" runs on a schedule.
  *
  * The transforms are the SAME DataFrame expressions the batch pipelines
  * use — Structured Streaming plans them incrementally:
  *  - stream-static joins: the broadcast-sized site dimension joins each
  *    micro-batch with no state;
  *  - windowed aggregation with a watermark bounds state for late rows.
  */
object StreamingIngest {

  /** File-source stream over a drop directory (one logical table).
    * `maxFilesPerTrigger` caps micro-batch size so a backlog of years
    * drains in bounded-memory batches. */
  def csvStream(spark: SparkSession, schema: StructType, dir: String,
      maxFilesPerTrigger: Int = 4): DataFrame =
    spark.readStream
      .option("header", "true")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .schema(schema)
      .csv(dir)

  /** Stream-static enrichment: each arriving micro-batch left-joins the
    * (static, broadcast) dimension — the streaming form of the down
    * pipeline's dimension join; no streaming state involved. */
  def enrichStream(stream: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys, "left")

  /** Windowed per-key counts with a watermark: the streaming form of the
    * engine's event-window aggregation (q19); state for a window is
    * dropped once the watermark passes its end. */
  def windowedCounts(stream: DataFrame, tsCol: String, keyCol: String,
      window_ : String = "1 hour", watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col(s"window.start").as("ws"), col(keyCol), col("n"))

  /** Drain-what's-there runner: processes every pending file, then stops
    * (the scheduled-batch shape of the reference's manual re-runs). */
  def availableNow(df: DataFrame, outDir: String, checkpoint: String): DataStreamWriter[Row] =
    df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
}

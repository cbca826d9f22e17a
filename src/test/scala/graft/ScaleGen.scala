package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sf1 generator for the SCALING.md curvature study:
  * 10× the sf0.1 row counts for the heavy tables (lineitem, orders,
  * documents, embeddings, events), schema- and distribution-matched to
  * the driver's testdata (TESTDATA.md; seed discipline: every value is a
  * pure function of the row id under fixed per-column salts — fully
  * deterministic, partitioning-independent, and embarrassingly parallel,
  * the same discipline that would generate 100 TB on a cluster).
  *
  * Distributions were measured off `/root/testdata/sf0.1` (see
  * SCALING.md): uniform TPC-H-ish columns; documents are 10–100 words
  * from the same 30-word vocabulary with ~5.1% near-dup rows (an earlier
  * doc's text + " dup" appended — the corpus's engineered near-dup
  * population, reproduced here because the dedup queries' cost is a
  * function of it); embeddings are unit-norm 64-dim vectors with ~1%
  * near-copies; events are ~67 rows/user over a 30-day window with
  * exp(mean 50) values.
  *
  * Dimension tables (region/nation/customer/supplier/part) are COPIED
  * from the source sf0.1 dir, and fact foreign keys stay in the sf0.1
  * dim key ranges: that is the 100 TB posture under study — facts grow
  * 10×, dims stay broadcast-sized — and it keeps every dim join's match
  * rate identical across the two measured points.
  *
  * Usage: sbt "Test/runMain graft.ScaleGen [outDir] [srcDimDir] [factor]"
  * (defaults: /root/repo/scaledata/sf1, /root/testdata/sf0.1, 1.0).
  * `factor` scales the sf1 fact row counts: 0.1 regenerates the sf0.1
  * point THROUGH THIS GENERATOR, so both ends of the curvature pair
  * share parquet encoding (encoder, page layout, value distributions)
  * and the measured ratio isolates data volume — the driver-written
  * sf0.1 dir differs enough in encoding to loosen the linear floor to
  * ~11–15× (VERDICT r5).
  */
object ScaleGen {

  private val id = col("id")

  /** Uniform [0,1) as a pure function of (id, salt). */
  private def u(salt: Long): Column =
    pmod(xxhash64(id, lit(salt)), lit(1000000L)).cast("double") / 1e6

  /** Uniform integer [0, n) as a pure function of (id, salt). */
  private def ui(salt: Long, n: Long): Column = pmod(xxhash64(id, lit(salt)), lit(n))

  private def pick(salt: Long, vals: String*): Column =
    element_at(array(vals.map(lit): _*), ui(salt, vals.size.toLong).cast("int") + 1)

  def lineitem(spark: SparkSession, rows: Long, orders: Long): DataFrame =
    spark.range(rows).select(
      ui(11, orders).as("l_orderkey"),
      ui(12, 20000).as("l_partkey"),   // sf0.1 part keys: dims stay unscaled
      ui(13, 1000).as("l_suppkey"),    // sf0.1 supplier keys
      (ui(14, 7) + 1).cast("int").as("l_linenumber"),
      (ui(15, 50) + 1).cast("double").as("l_quantity"),
      round(lit(900.0) + u(16) * 104100.0, 2).as("l_extendedprice"),
      (ui(17, 11).cast("double") / 100.0).as("l_discount"),
      (ui(18, 9).cast("double") / 100.0).as("l_tax"),
      pick(19, "A", "N", "R").as("l_returnflag"),
      pick(20, "F", "O").as("l_linestatus"),
      // timestamp_ntz: the driver's parquet is TIMESTAMP(isAdjustedToUTC
      // =false, MILLIS), which Spark reads as TIMESTAMP_NTZ — match it
      date_add(to_date(lit("1995-01-02")), ui(21, 2499).cast("int"))
        .cast("timestamp_ntz").as("l_shipdate"))

  def orders(spark: SparkSession, rows: Long): DataFrame =
    spark.range(rows).select(
      id.as("o_orderkey"),
      ui(31, 15000).as("o_custkey"),   // sf0.1 customer keys
      pick(32, "O", "P", "F").as("o_orderstatus"),
      round(lit(1000.0) + u(33) * 499000.0, 2).as("o_totalprice"),
      date_add(to_date(lit("1995-01-01")), ui(34, 2400).cast("int"))
        .cast("timestamp_ntz").as("o_orderdate"),
      pick(35, "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        .as("o_orderpriority"))

  /** The sf0.1 documents vocabulary (measured; 'dup' excluded — it is the
    * near-dup marker word, not part of the base draw). */
  private val Vocab = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window")

  def documents(spark: SparkSession, rows: Long): DataFrame = {
    val vocab = array(Vocab.map(lit): _*)
    val words = array((0 until 100).map(slot =>
      element_at(vocab, ui(100 + slot, Vocab.size.toLong).cast("int") + 1)): _*)
    val base = spark.range(rows).select(id,
      concat_ws(" ", slice(words, lit(1), (ui(60, 91) + 10).cast("int"))).as("btext"))
    // ~5.1% of docs repeat an earlier doc's text + " dup" (measured rate:
    // 255/5000 docs carry the marker; same-source collisions make the
    // handful of exact dups the exact-dedup query expects)
    val withSrc = base
      .withColumn("is_dup", (u(61) < 0.051) && (id > 0))
      .withColumn("src",
        when(col("is_dup"), pmod(xxhash64(id, lit(62L)), greatest(id, lit(1L))))
          .otherwise(id))
    withSrc
      .join(base.select(id.as("src"), col("btext").as("srctext")), Seq("src"))
      .select(
        id.as("doc_id"),
        when(col("is_dup"), concat(col("srctext"), lit(" dup")))
          .otherwise(col("btext")).as("text"),
        when(u(63) < 0.412, "en").when(u(63) < 0.559, "de")
          .when(u(63) < 0.706, "zh").when(u(63) < 0.853, "fr")
          .otherwise("es").as("lang"),
        concat(lit("src"), ui(64, 20)).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  /** Power-law (Zipf s≈1) document corpus — the df distribution of real
    * text, which the uniform 30-word `documents` table deliberately
    * lacks: word rank r is drawn by inverse CDF as floor(V^u) over a
    * 10,000-word vocabulary, giving P(rank = r) ∝ 1/r — a handful of
    * stopword-like tokens in almost every doc and a long rare tail.
    * This is the corpus [[graft.operators.Dedup.jaccardPairsPrefix]]'s
    * prefix filter is built for (rare-token prefixes prune the join);
    * measured against [[graft.operators.Dedup.jaccardPairs]] in
    * SCALING.md's power-law addendum. Same near-dup population (~5.1%
    * append-marker copies) and length distribution as `documents`, so
    * the two corpora differ ONLY in df shape. */
  def documentsPowerLaw(spark: SparkSession, rows: Long, vocab: Long = 10000L,
      boilerplate: Double = 0.0): DataFrame = {
    val words = array((0 until 100).map { slot =>
      // inverse-CDF Zipf draw: rank = floor(vocab^u) + 1 with u uniform
      // over [0, 1) from the (id, slot)-salted hash — support is
      // [2, vocab] (rank 1 unreachable; the labels are shifted by one
      // but the 1/r frequency SHAPE, which is all the study measures,
      // is exact). The least() clamp is belt-and-braces for u → 1.
      val u = pmod(xxhash64(id, lit(500 + slot)), lit(1000000L)).cast("double") / 1e6
      concat(lit("w"), least(pow(lit(vocab.toDouble), u).cast("long") + 1, lit(vocab)))
    }: _*)
    // boilerplate fraction: docs carrying one of 20 verbatim 12-word
    // template sentences — the repeated-header/footer df mass of real
    // crawl text. Template shingles reach df ≈ rows·boilerplate/20,
    // exactly the fanout the raw shared-shingle join pays df² for and
    // a rarest-first prefix never indexes.
    val freeText = concat_ws(" ", slice(words, lit(1), (ui(60, 91) + 10).cast("int")))
    val templates = array((0 until 20).map(t =>
      lit((0 until 12).map(i => s"bp${t}_$i").mkString(" "))): _*)
    val text =
      if (boilerplate <= 0) freeText
      else when(u(66) < boilerplate,
        concat(freeText, lit(" "), element_at(templates, ui(67, 20).cast("int") + 1)))
        .otherwise(freeText)
    val base = spark.range(rows).select(id, text.as("btext"))
    val withSrc = base
      .withColumn("is_dup", (u(61) < 0.051) && (id > 0))
      .withColumn("src",
        when(col("is_dup"), pmod(xxhash64(id, lit(62L)), greatest(id, lit(1L))))
          .otherwise(id))
    withSrc
      .join(base.select(id.as("src"), col("btext").as("srctext")), Seq("src"))
      .select(
        id.as("doc_id"),
        when(col("is_dup"), concat(col("srctext"), lit(" dup")))
          .otherwise(col("btext")).as("text"))
  }

  def embeddings(spark: SparkSession, rows: Long): DataFrame = {
    // ~1% near-copies of the previous vector (perturbed ±0.02/dim before
    // normalization) — the high-cosine population the near-dup query finds
    val vsrc = when(u(71) < 0.01 && id > 0, id - 1).otherwise(id)
    val raw = array((0 until 64).map { i =>
      val base = pmod(xxhash64(vsrc, lit(3000L + i)), lit(2000001L)).cast("double") / 1e6 - 1.0
      val noise = (pmod(xxhash64(id, lit(4000L + i)), lit(2001L)).cast("double") / 1e3 - 1.0) * 0.02
      base + when(vsrc =!= id, noise).otherwise(lit(0.0))
    }: _*)
    spark.range(rows).select(
      id.as("vec_id"),
      transform(raw, x =>
        (x / sqrt(aggregate(raw, lit(0.0), (a, y) => a + y * y))).cast("float"))
        .as("embedding"),
      ui(72, 10).cast("int").as("label"))
  }

  def events(spark: SparkSession, rows: Long, users: Long): DataFrame =
    spark.range(rows).select(
      id.as("event_id"),
      // DELIBERATELY the legacy layout: a plain int64 of epoch nanos,
      // the engine-visible shape of the original TIMESTAMP(NANOS)
      // testdata under `nanosAsLong`. The driver's testdata moved to
      // timestamp[us] in r8; Tables.events branches on the actual type,
      // so scaledata keeps exercising the LongType branch (and stays
      // encoding-comparable with the r6/r7 events SCALING rows) while
      // the driver data exercises the native-timestamp branch
      ((lit(java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond) +
          ui(41, 30L * 86400)) * lit(1000000000L)).as("ts"),
      ui(42, users).as("user_id"),
      pick(43, "view", "click", "purchase", "signup", "error").as("event_type"),
      round(lit(-50.0) * log(lit(1.0) - u(44)), 2).as("value"),
      concat(lit("{\"k\": "), ui(45, 100), lit("}")).as("props"))

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/root/repo/scaledata/sf1")
    val srcDims = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val factor = if (args.length > 2) args(2).toDouble else 1.0
    require(factor > 0, "factor must be positive")
    def n(sf1Rows: Long): Long = math.max(1L, math.round(sf1Rows * factor))
    val spark = GraftSession.builder("graft-scale-gen",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // All timestamp columns here are TIMESTAMP_NTZ, which Spark 4.1
    // always writes as parquet INT64 TIMESTAMP(MICROS, utc=false)
    // regardless of spark.sql.parquet.outputTimestampType — no config
    // needed. The driver's testdata uses MILLIS, but the engine-visible
    // schema (TIMESTAMP_NTZ) and the INT64 min/max stats feeding
    // predicate pushdown are identical, which is what the curvature
    // comparison needs; and since BOTH scale points come from this
    // generator, the two measured ends share encoding exactly.
    // optional 4th arg: comma-separated table subset (a study that only
    // needs embeddings shouldn't pay the 60M-row lineitem write)
    val only = if (args.length > 3)
      Some(args(3).split(",").map(_.trim).filter(_.nonEmpty).toSet) else None
    def write(name: String, df: => DataFrame): Unit =
      if (only.forall(_.contains(name))) {
        df.write.mode("overwrite").parquet(s"$out/$name.parquet")
        println(s"wrote $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
      }
    write("lineitem", lineitem(spark, n(6000000L), n(1500000L)))
    write("orders", orders(spark, n(1500000L)))
    write("documents", documents(spark, n(50000L)))
    write("embeddings", embeddings(spark, n(20000L)))
    write("events", events(spark, n(1000000L), 15000L))
    for (dim <- Seq("region", "nation", "customer", "supplier", "part"))
      write(dim, spark.read.parquet(s"$srcDims/$dim.parquet"))
    spark.stop()
  }
}

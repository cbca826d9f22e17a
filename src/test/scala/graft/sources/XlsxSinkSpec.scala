package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The DataFrame-level xlsx sink (q81's write side): typed round-trip
  * through the real zip/XML scan, null handling, and the format-cap
  * refusal (the bounded-driver-materialization contract). */
class XlsxSinkSpec extends SparkSpec {
  import spark.implicits._

  test("sink → readSheet → cast round-trips types, nulls, and doubles exactly") {
    val p = Files.createTempDirectory("graft-xlsxsink").resolve("book.xlsx").toString
    val df = Seq(
      (1L, "alpha & <co>", Some(0.72)),
      (2L, "beta", None),
      (3L, "gamma", Some(-104100.13)))
      .toDF("id", "name", "score")
    XlsxSink.sink(df, p, "Data")
    val back = Excel.cast(Excel.readSheet(spark, p, "Data"),
      StructType(Seq(
        StructField("id", LongType),
        StructField("name", StringType),
        StructField("score", DoubleType))))
    val rows = back.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    // XML-escaped text and shortest-repr doubles come back bit-identical;
    // a null cell is omitted on write and read back as null
    assert(rows == Seq(
      (1L, "alpha & <co>", Some(0.72)),
      (2L, "beta", None),
      (3L, "gamma", Some(-104100.13))))
  }

  test("round-trip law: seeded random typed rows survive sink → scan → cast bit-exactly") {
    // the CSV sink's exactness argument, fuzzed: shortest-round-trip
    // decimal reprs (including extreme exponents), XML-special and
    // unicode text, and boundary longs all parse back identically.
    // Empty strings are EXCLUDED by generation: cast-at-the-edge maps
    // them to NULL (the CSV discipline), asserted separately below.
    for (seed <- Seq(1, 7, 23)) {
      val rnd = new scala.util.Random(seed)
      val specials = Seq("a&b", "<tag>", "\"q\"", "naïve π", "line one", "&amp;")
      def str(): String = {
        val s = if (rnd.nextBoolean()) specials(rnd.nextInt(specials.size))
          else rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString
        s
      }
      def dbl(): Double = rnd.nextInt(5) match {
        case 0 => rnd.nextDouble() * 2e300
        case 1 => java.lang.Double.MIN_VALUE
        case 2 => -rnd.nextDouble()
        case _ => rnd.nextDouble() * 1e6 - 5e5
      }
      def lng(): Long = rnd.nextInt(4) match {
        case 0 => Long.MaxValue - rnd.nextInt(1000)
        case 1 => Long.MinValue + rnd.nextInt(1000)
        case _ => rnd.nextLong() % 1000000
      }
      val rows = (0 until 40).map(i => (i.toLong, lng(), str(), dbl()))
      val p = Files.createTempDirectory(s"graft-xlsxfuzz$seed")
        .resolve("fuzz.xlsx").toString
      XlsxSink.sink(rows.toDF("rid", "lval", "sval", "dval"), p, "F")
      val back = Excel.cast(Excel.readSheet(spark, p, "F"),
        StructType(Seq(
          StructField("rid", LongType), StructField("lval", LongType),
          StructField("sval", StringType), StructField("dval", DoubleType))))
        .orderBy("rid").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
        .toSeq
      assert(back == rows, s"seed $seed round-trip mismatch")
    }
    // the one deliberate non-identity: an empty string cell reads back
    // as NULL through the cast (empty-field discipline shared with CSV)
    val p = Files.createTempDirectory("graft-xlsxempty").resolve("e.xlsx").toString
    XlsxSink.sink(Seq((1L, "")).toDF("id", "s"), p, "E")
    val r = Excel.cast(Excel.readSheet(spark, p, "E"),
      StructType(Seq(StructField("id", LongType), StructField("s", StringType))))
      .collect()(0)
    assert(r.isNullAt(1))
  }

  test("sink refuses fact-sized input instead of silently truncating") {
    val p = Files.createTempDirectory("graft-xlsxsink2").resolve("big.xlsx").toString
    val big = spark.range(10).select(col("id"))
    val e = intercept[IllegalArgumentException](
      XlsxSink.sink(big, p, "S", maxRows = 9))
    assert(e.getMessage.contains("exceeds 9 rows"))
    XlsxSink.sink(spark.range(9).select(col("id")), p, "S", maxRows = 9)
    assert(Excel.readSheet(spark, p, "S").count() == 9)
  }
}

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

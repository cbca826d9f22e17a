package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec
import graft.operators.Quality

class CsvSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", LongType)))

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-csv-audit")
    Files.writeString(d.resolve("a.csv"),
      """id,name,score
        |1,alpha,10
        |2,beta,not_a_number
        |3,gamma,30
        |""".stripMargin)
    d.toString
  }

  test("scanAudited captures the raw malformed line; clean rows type normally") {
    val df = Csv.scanAudited(spark, schema, "_corrupt_record", s"$dir/a.csv")
    val rows = df.select("id", "score", "_corrupt_record").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.getString(2)))).toSet
    assert(rows.contains((1L, Some(10L), None)))
    assert(rows.contains((3L, Some(30L), None)))
    // the malformed line: score null, raw text preserved verbatim
    assert(rows.contains((2L, None, Some("2,beta,not_a_number"))))
  }

  test("a DQ gate counts corrupt records in the same one-scan audit") {
    val df = Csv.scanAudited(spark, schema, "_corrupt_record", s"$dir/a.csv")
    val audit = Quality.audit(df, Seq(
      Quality.Gate("corrupt_line", col("_corrupt_record").isNotNull),
      Quality.Gate("null_score", col("score").isNull)))
    val m = audit.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("corrupt_line") == 1L && m("null_score") == 1L)
  }

  test("plain scan keeps PERMISSIVE null semantics (no corrupt column)") {
    val df = Csv.scan(spark, schema, s"$dir/a.csv")
    assert(!df.columns.contains("_corrupt_record"))
    assert(df.filter(col("score").isNull).count() == 1)
    assert(df.count() == 3)
  }
}

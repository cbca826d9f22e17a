package graft.clean

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.clean.Clean._

class CleanSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeNulls maps sentinel markers to SQL NULL, leaves data alone") {
    val df = Seq(".", "", "nan", "NaN", "real", "0.5").toDF("v")
    val out = normalizeNulls(df, Seq("v")).as[Option[String]].collect().toSeq
    assert(out.count(_.isEmpty) == 4)
    assert(out.flatten.sorted == Seq("0.5", "real"))
  }

  test("parseDateLenient accepts both zero-padded and bare formats plus embedded spaces") {
    val df = Seq("09/08/2014", "8/4/2017", "09/08/ 2014", "2020-01-31", "garbage")
      .toDF("d")
    val out = df.select(parseDateLenient($"d").as("p")).as[Option[Date]].collect().toSeq
    assert(out == Seq(
      Some(Date.valueOf("2014-09-08")),
      Some(Date.valueOf("2017-08-04")),
      Some(Date.valueOf("2014-09-08")),
      Some(Date.valueOf("2020-01-31")),
      None))
  }

  test("stripFloatArtifact removes only a trailing .0") {
    val df = Seq("726.0", "726", "7.05", "x.0.0").toDF("v")
    val out = df.select(stripFloatArtifact($"v").as("v")).as[String].collect().toSeq
    assert(out == Seq("726", "726", "7.05", "x.0"))
  }

  test("normalizeWhitespace collapses runs incl CR/LF/tab") {
    val df = Seq(" a\r\nb\t c  d ").toDF("v")
    assert(df.select(normalizeWhitespace($"v")).as[String].head() == "a b c d")
  }

  test("stringKey trims, strips artifact, prefixes — the n-prefix trick") {
    val df = Seq(" 726.0 ", "81").toDF("v")
    val out = df.select(stringKey($"v", "n").as("k")).as[String].collect().toSeq
    assert(out == Seq("n726", "n81"))
  }
}

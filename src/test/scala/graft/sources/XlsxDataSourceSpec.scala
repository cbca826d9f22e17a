package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class XlsxDataSourceSpec extends SparkSpec {

  /** Two workbooks in one dir: same logical columns, file B reorders them,
    * drops MAIL_ZIP and adds an extra column — exercising the by-header
    * union rule. */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-xlsx-v2")
    XlsxGen.write(d.resolve("a.xlsx").toString, Seq(
      "Sites" -> Seq(
        Seq("PWSID", "SYSNAME", "MAIL_ZIP"),
        Seq(1, "ALPHA WATER", "16137"),
        Seq(2, "BETA WATER", null)),
      "Notes" -> Seq(
        Seq("K"), Seq("ignored"))))
    XlsxGen.write(d.resolve("b.xlsx").toString, Seq(
      "Sites" -> Seq(
        Seq("SYSNAME", "PWSID", "EXTRA"),
        Seq("GAMMA WATER", 3, "x"))))
    d.toString
  }

  test("format(graft-xlsx) reads the named sheet of every file, one partition per file") {
    val df = spark.read.format("graft-xlsx").option("sheet", "Sites").load(dir)
    assert(df.columns.toSeq == Seq("PWSID", "SYSNAME", "MAIL_ZIP")) // from first file (sorted listing)
    assert(df.rdd.getNumPartitions == 2)
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(rows == Set(
      ("1", "ALPHA WATER", Some("16137")),
      ("2", "BETA WATER", None),
      ("3", "GAMMA WATER", None))) // b.xlsx matched by header name; MAIL_ZIP absent → null
  }

  test("sheet defaults to each workbook's first sheet") {
    val df = spark.read.format("graft-xlsx")
      .load(s"$dir/a.xlsx") // first sheet is Sites
    assert(df.columns.toSeq == Seq("PWSID", "SYSNAME", "MAIL_ZIP"))
    assert(df.count() == 2)
  }

  test("rows match the driver-side Excel.readSheet path exactly") {
    val v2 = spark.read.format("graft-xlsx").option("sheet", "Sites")
      .load(s"$dir/a.xlsx")
    val v1 = Excel.readSheet(spark, s"$dir/a.xlsx", "Sites")
    assert(v2.collect().map(_.toSeq).toSet == v1.collect().map(_.toSeq).toSet)
  }

  test("duplicate or empty headers fail at planning with the file name, not downstream") {
    val d = Files.createTempDirectory("graft-xlsx-badhdr")
    XlsxGen.write(d.resolve("dup.xlsx").toString, Seq(
      "S" -> Seq(Seq("A", "B", "A"), Seq(1, 2, 3))))
    XlsxGen.write(d.resolve("empty.xlsx").toString, Seq(
      "S" -> Seq(Seq("A", "", "C"), Seq(1, 2, 3))))
    val dup = intercept[IllegalArgumentException] {
      spark.read.format("graft-xlsx").load(d.resolve("dup.xlsx").toString)
    }
    assert(dup.getMessage.contains("duplicate header") && dup.getMessage.contains("dup.xlsx"))
    assert(dup.getMessage.contains("'A'"))
    val empty = intercept[IllegalArgumentException] {
      spark.read.format("graft-xlsx").load(d.resolve("empty.xlsx").toString)
    }
    assert(empty.getMessage.contains("empty header") && empty.getMessage.contains("empty.xlsx"))
  }

  test("missing sheet names the available ones; typed schema is rejected") {
    val e = intercept[Exception] {
      spark.read.format("graft-xlsx").option("sheet", "Nope").load(s"$dir/a.xlsx").collect()
    }
    assert(e.getMessage.contains("Sites"))
    val t = intercept[Exception] {
      spark.read.format("graft-xlsx")
        .schema("PWSID LONG, SYSNAME STRING")
        .option("sheet", "Sites").load(s"$dir/a.xlsx").collect()
    }
    // Spark rejects user schemas before getTable (no supportsExternalMetadata);
    // the all-string contract is typed downstream via Excel.cast
    assert(t.getMessage.contains("does not support user-specified schema"))
  }

  test("Excel.cast types the V2 output at the edge") {
    val typed = Excel.cast(
      spark.read.format("graft-xlsx").option("sheet", "Sites").load(dir),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("PWSID", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("SYSNAME", org.apache.spark.sql.types.StringType))))
    assert(typed.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }
}

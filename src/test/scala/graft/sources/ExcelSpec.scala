package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class ExcelSpec extends SparkSpec {

  private lazy val wb: String = {
    val p = Files.createTempDirectory("graft-xlsx").resolve("book.xlsx").toString
    XlsxGen.write(p, Seq(
      "System Info" -> Seq(
        Seq("PWSID", "EPID", "SPID", "SYSNAME", "MAIL_ZIP"),
        Seq(6430001, 101, 701, "SCENIC MOBILE HOME PARK", "16137"),
        Seq(6430002, 102, 702, "BUTLER WATER", null), // missing trailing cell
        Seq(6430003, 250, 703, "OUT OF RANGE EPID", "16001")),
      "Violations" -> Seq(
        Seq("PWSID", "VIOLATION_CODE", "VIOLATION_DATE"),
        Seq(6430001, "MCL", "01/02/2020")),
      "Data" -> Seq(
        Seq("PWSID", "CONTAMID", "RESULT"),
        Seq(6430001, "0999", 0.72),
        Seq(6430002, "1040", "."))))
    p
  }

  test("sheetNames lists all sheets in workbook order") {
    assert(Excel.sheetNames(wb) == Seq("System Info", "Violations", "Data"))
  }

  test("readSheet returns header-named string columns with null-padded short rows") {
    val df = Excel.readSheet(spark, wb, "System Info")
    assert(df.columns.toSeq == Seq("PWSID", "EPID", "SPID", "SYSNAME", "MAIL_ZIP"))
    val rows = df.collect().map(_.toSeq).toSet
    assert(rows.contains(Seq("6430001", "101", "701", "SCENIC MOBILE HOME PARK", "16137")))
    assert(rows.contains(Seq("6430002", "102", "702", "BUTLER WATER", null)))
    assert(df.count() == 3)
  }

  test("readSheets is the selective multi-sheet dict shape") {
    val m = Excel.readSheets(spark, wb, Seq("System Info", "Data"))
    assert(m.keySet == Set("System Info", "Data"))
    assert(m("Data").count() == 2)
    // sentinel '.' survives ingest untyped — cleaning happens downstream
    assert(m("Data").collect().map(_.getString(2)).toSet == Set("0.72", "."))
  }

  test("cast applies the catalog schema by name") {
    val typed = Excel.cast(
      Excel.readSheet(spark, wb, "System Info").select("PWSID", "EPID", "SPID"),
      org.apache.spark.sql.types.StructType(Schemas.systemInfo.fields.take(3)))
    assert(typed.schema.map(f => (f.name, f.dataType.typeName)).toSeq ==
      Seq(("PWSID", "long"), ("EPID", "integer"), ("SPID", "integer")))
    assert(typed.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(6430001L, 6430002L, 6430003L))
  }

  test("missing sheet fails with the available names in the message") {
    val e = intercept[IllegalArgumentException](Excel.readSheet(spark, wb, "Nope"))
    assert(e.getMessage.contains("System Info"))
  }
}

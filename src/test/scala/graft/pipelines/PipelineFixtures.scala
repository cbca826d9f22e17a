package graft.pipelines

import java.nio.file.Files

import graft.sources.XlsxGen

/** Shared FIXTURES.md-shaped inputs: committed CSV fixtures plus
  * generated xlsx workbooks (sites + the direct 3-sheet workbook). */
object PipelineFixtures {

  val fx = "src/test/resources/fixtures"

  lazy val sitesXlsx: String = {
    val p = Files.createTempDirectory("graft-sites").resolve("ResultsSite.xlsx").toString
    XlsxGen.write(p, Seq(
      "Sheet1" -> Seq(
        Seq("SITE_ID", "SITE_NAME", "SISSCD_ID", "EPA_SITE_ID", "ADDRESS1",
          "ADDRESS2", "CITY", "STATE_CODE", "ZIP_CODE", "Coordinates"),
        Seq("S1", "SCENIC SITE", "SC1", "EPA1", "12 MAIN ST",
          null, "GREENVILLE", "PA", "16125", "41.2,-80.1"),
        Seq("S2", "BUTLER SITE", "SC2", "EPA2", "9 OAK AVE",
          "SUITE 2", "BUTLER", "PA", "16001", "40.9,-79.9"),
        // real xlsx rows stop early (FIXTURES.md §4): no address, no zip
        Seq("S3", "SPI ONLY SITE", "SC3"),
        Seq("S4", "BI ONLY SITE", "SC4", "EPA4", "1 ELM ST",
          null, "MERCER", "PA", "16137", "41.1,-80.2"))))
    p
  }

  lazy val directXlsx: String = {
    val p = Files.createTempDirectory("graft-direct").resolve("WaterData.xlsx").toString
    XlsxGen.write(p, Seq(
      "System Info" -> Seq(
        Seq("PWSID", "EPID", "SPID", "SYSTYPE", "SYSNAME", "POPL", "AREACITY",
          "SYSOWNAM", "MAIL_ADDR1", "MAIL_ADDR2", "SYSLOCCY", "MAIL_ZIP"),
        Seq(6430001, 101, 701, "CWS", "SCENIC MOBILE HOME PARK", "150",
          "GREENVILLE", "OWNER A", "12 MAIN ST", null, "GREENVILLE", "16125"),
        Seq(6430002, 102, 801, "CWS", "BUTLER WATER", "5000",
          "BUTLER", "OWNER B", "9 OAK AVE", "SUITE 2", "BUTLER", "16001"),
        // system with no mailing zip: strict-matches but must be dropped
        Seq(6430005, 103, 703, "CWS", "NO ZIP SYSTEM", "100",
          "MERCER", "OWNER C", null, null, "MERCER", null)),
      "Violations" -> Seq(
        Seq("PWSID", "VIOLATION_CODE", "VIOLATION_DATE"),
        Seq(6430001, "MCL", "01/02/2020")),
      "Data" -> Seq(
        Seq("PWSID", "CONTAMID", "CONTNAM", "RESULT", "SAMPTYPE", "SAMPDATE",
          "SAMPTIME", "ANALDATE", "LOC_EPID"),
        Seq(6430001, "0999", "CHLORINE", "0.72", "E", "1/1/2014", "09:00", "1/1/2014", "701"),
        Seq(6430001, "1040", "NITRATE", "1.5", "D", "9/8/2014", "10:00", "1/9/1999", "726"),
        Seq(6430002, "1022", "LEAD", "0.01", "E", "5/6/2015", "11:00", "5/7/2015", "999"),
        Seq(6430009, "1095", "ZINC", "0.5", "E", "6/7/2015", "12:00", "6/8/2015", "101"),
        Seq(6430005, "1074", "COPPER", "0.2", "E", "7/8/2015", "13:00", "7/9/2015", "103"))))
    p
  }
}

package graft.pipelines

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import PipelineFixtures._

/** Golden end-to-end test of the down pipeline on FIXTURES.md-shaped
  * inputs: multi-file CSV scans, xlsx site ingest, J1+X9+G2 dimension
  * build, the 3→2→1 cascade with ZIP miss detection, G3 conservation. */
class DownPipelineSpec extends SparkSpec {

  private lazy val outDir = Files.createTempDirectory("graft-down-out").toString

  private lazy val result = DownPipeline.run(
    spark,
    spiPaths = Seq(s"$fx/spi_p1.csv", s"$fx/spi_p2.csv"),
    biPaths = Seq(s"$fx/bi_p1.csv"),
    sitesXlsx = sitesXlsx,
    sitesSheet = "Sheet1",
    dataPaths = Seq(s"$fx/data_2014.csv", s"$fx/data_2015.csv"),
    outDir = outDir)

  private lazy val rows =
    result.collect().map(r => r.getAs[String]("Contaminant ID") -> r).toMap

  test("G3: all 8 data rows survive the cascade, one row each") {
    assert(result.count() == 8)
    assert(rows.size == 8)
  }

  test("cascade match levels: exact, name-level, pwsid-level, unmatched") {
    val lv = result.collect().map(r =>
      r.getAs[String]("Contaminant ID") ->
        (if (r.isNullAt(r.fieldIndex("match_level"))) null
         else Int.box(r.getAs[Int]("match_level")))).toMap
    assert(lv == Map(
      "CHLORINE" -> 1, "NITRATE" -> 1, "COLIFORM" -> 2,
      "LEAD" -> 1, "COPPER" -> 2, "ARSENIC" -> 3,
      "ZINC" -> null, "SULFATE" -> 2))
  }

  test("float-artifact sample location still matches exactly (726.0 → n726)") {
    assert(rows("NITRATE").getAs[String]("Sample Location") == "n726")
    assert(rows("NITRATE").getAs[String]("ZIP_CODE") == "16125")
  }

  test("ZIP-null site matches only at the PWSID level and carries no zip") {
    assert(rows("ARSENIC").getAs[String]("ZIP_CODE") == null)
    assert(rows("ARSENIC").getAs[String]("SITE_NAME") == "SPI ONLY SITE")
  }

  test("coalesce repair fed BI-only values into the dimension") {
    assert(rows("SULFATE").getAs[String]("CLIENT ID") == "C400")
    assert(rows("SULFATE").getAs[String]("ZIP_CODE") == "16137")
  }

  test("word-wrap and embedded-space repairs applied to the fact side") {
    assert(rows("NITRATE").getAs[String]("Sample Type") == "DISTRIBUTION")
    assert(rows("NITRATE").getAs[String]("Sample Date") == "09/08/2014")
    assert(rows("COPPER").getAs[String]("Sample Type") == "SPECIA L") // only DISTRIBUTIO N is repaired
  }

  test("geocode coordinates split into latitude/longitude") {
    assert(rows("CHLORINE").getAs[String]("Latitude") == "41.2")
    assert(rows("CHLORINE").getAs[String]("Longitude") == "-80.1")
  }

  test("address assembly branches on ADDRESS2 nullness") {
    assert(rows("CHLORINE").getAs[String]("Lat_Long_Address")
      == "12 MAIN ST, GREENVILLE, PA, 16125")
    assert(rows("LEAD").getAs[String]("Lat_Long_Address")
      == "9 OAK AVE SUITE 2, BUTLER, PA, 16001")
  }

  test("stage checkpoints are written as single-file CSV directories") {
    for (d <- Seq("downprep_site", "downprep_data", "down_water_data")) {
      val files = new java.io.File(s"$outDir/$d").listFiles()
      assert(files != null && files.count(_.getName.endsWith(".csv")) == 1, d)
    }
  }

  test("unmatched row keeps its fact columns with null payload") {
    assert(rows("ZINC").getAs[String]("ZIP_CODE") == null)
    assert(rows("ZINC").getAs[Long]("PWSID") == 9999999L)
  }
}

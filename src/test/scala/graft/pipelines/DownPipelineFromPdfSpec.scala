package graft.pipelines

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.{Csv, Excel, PdfGen, Schemas, Pdf => PdfSrc}
import PipelineFixtures._

/** The COMPLETE down chain as the reference runs it — stage `pdf`
  * (distributed extraction → CSV checkpoint), stage `csv` (dimension
  * build), stage `join` (cascade) — starting from generated PDFs whose
  * pages carry the same analysis rows as the CSV fixtures, banner
  * provenance included. The cascade must land every row at the same
  * match level as the CSV-ingested golden test. */
class DownPipelineFromPdfSpec extends SparkSpec {

  private def banner(pwsid: Long, name: String): (Double, Double, String) =
    (36.0, 20.0, s"*** PWSID = $pwsid | SYSTEM NAME = $name*** 1")

  private def row(yTop: Double, cells: Seq[String]): Seq[(Double, Double, String)] =
    cells.zipWithIndex.map { case (c, i) => (36.0 + i * 55, yTop, c) }

  private val h10 = PdfSrc.TableHeaders

  private lazy val pdfDir: String = {
    val dir = Files.createTempDirectory("graft-pdf-chain").toString
    // one page per system, same facts as data_2014/2015.csv
    PdfGen.write(s"$dir/rptinfo2014.pdf", Seq(
      Seq(banner(6430001L, "SCENIC MOBILE HOME PARK")) ++
        row(80, h10) ++
        row(100, Seq("701", "CHLORINE", "0.72", ".", "01/01/2014", "ENTRY POINT",
          "LAB1", "METH1", "01/01/2014", "02/07/2014")) ++
        row(112, Seq("726.0", "NITRATE", "1.5", ".", "09/08/ 2014", "DISTRIBUTIO N",
          "LAB1", "METH2", ".", "02/07/2014")) ++
        row(124, Seq("", "COLIFORM", ".", ".", "03/04/2014", "DISTRIBUTION",
          "LAB2", "METH3", "03/05/2014", "03/06/2014"))), compress = true)
    PdfGen.write(s"$dir/rptinfo2015.pdf", Seq(
      Seq(banner(6430002L, "BUTLER WATER")) ++
        row(80, h10) ++
        row(100, Seq("801", "LEAD", "0.01", "0.015", "05/06/2015", "ENTRY POINT",
          "LAB1", "METH1", "05/07/2015", "05/08/2015")) ++
        row(112, Seq("999", "COPPER", "0.2", "1.3", "06/07/2015", "SPECIA L",
          "LAB3", "METH4", "06/08/2015", "06/09/2015")),
      Seq(banner(6430003L, "ONLY IN SPI")) ++
        row(80, h10) ++
        row(100, Seq("901", "ARSENIC", "0.003", "0.01", "07/08/2015", "ENTRY POINT",
          "LAB1", "METH1", "07/09/2015", "07/10/2015")),
      Seq(banner(9999999L, "UNKNOWN SYSTEM")) ++
        row(80, h10) ++
        row(100, Seq("555", "ZINC", "0.5", "5.0", "08/09/2015", "ENTRY POINT",
          "LAB1", "METH1", "08/10/2015", "08/11/2015")),
      Seq(banner(6430004L, "ONLY IN BI")) ++
        row(80, h10) ++
        row(100, Seq("", "SULFATE", "10", "250", "09/10/2015", "DISTRIBUTION",
          "LAB2", "METH3", "09/11/2015", "09/12/2015"))))
    dir
  }

  test("pdf stage -> csv checkpoint -> dimension build -> cascade, all levels as golden") {
    val stageOut = Files.createTempDirectory("graft-pdf-stage-out").toString
    DownPipeline.runPdfStage(spark,
      Seq(s"$pdfDir/rptinfo2014.pdf", s"$pdfDir/rptinfo2015.pdf"), stageOut)

    val data = DownPipeline.prepData(
      Csv.scan(spark, Schemas.data, s"$stageOut/rptinfo"))
    val spi = Csv.scan(spark, Schemas.spi, s"$fx/spi_p1.csv", s"$fx/spi_p2.csv")
    val bi = Csv.scan(spark, Schemas.bi, s"$fx/bi_p1.csv")
    val sites = Excel.cast(Excel.readSheet(spark, sitesXlsx, "Sheet1"), Schemas.sites)
    val (siteSub, _) = DownPipeline.buildSiteDim(spi, bi, sites)
    val out = DownPipeline.enrich(siteSub, data)

    val lv = out.collect().map(r =>
      r.getAs[String]("Contaminant ID") ->
        (if (r.isNullAt(r.fieldIndex("match_level"))) null
         else Int.box(r.getAs[Int]("match_level")))).toMap
    assert(lv == Map(
      "CHLORINE" -> 1, "NITRATE" -> 1, "COLIFORM" -> 2,
      "LEAD" -> 1, "COPPER" -> 2, "ARSENIC" -> 3,
      "ZINC" -> null, "SULFATE" -> 2))
    // provenance survived the whole chain
    val chl = out.filter(out("Contaminant ID") === "CHLORINE").collect()(0)
    assert(chl.getAs[Long]("PWSID") == 6430001L)
    assert(chl.getAs[Int]("TOP_MARGIN") == PdfSrc.Top1)
    assert(chl.getAs[String]("ZIP_CODE") == "16125")
  }
}

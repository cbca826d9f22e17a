package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** The PDF source against a generated 7-page fixture covering every
  * handled page condition: full table, TOP2 retry, column split with J8
  * stitch, headerless carryover, banner provenance, 16-col construction. */
class PdfSpec extends SparkSpec {

  private def banner(pwsid: Long, name: String, page: Int): (Double, Double, String) =
    (36.0, 20.0, s"*** PWSID = $pwsid | SYSTEM NAME = $name*** $page")

  private def row(yTop: Double, cells: Seq[String], x0: Double = 36, w: Double = 55)
      : Seq[(Double, Double, String)] =
    cells.zipWithIndex.map { case (c, i) => (x0 + i * w, yTop, c) }

  private val h10 = Pdf.TableHeaders
  private val h6 = h10.take(6)
  private val h4 = h10.drop(6)

  private lazy val pdfDir: String = {
    val dir = Files.createTempDirectory("graft-pdf").toString
    PdfGen.write(s"$dir/rpt2014.pdf", Seq(
      // p1: full table
      Seq(banner(6430001L, "SCENIC MOBILE HOME PARK", 1)) ++
        row(80, h10) ++
        row(100, Seq("101", "CHLORINE", "0.72", ".", "01/01/2014", "ENTRY POINT",
          "LAB1", "METH1", "01/01/2014", "02/07/2014")) ++
        row(112, Seq("101", "NITRATE", "1.5", ".", "02/02/2014", "DISTRIBUTION",
          "LAB1", "METH2", "02/03/2014", "03/07/2014")),
      // p2: part 1 of a column split (held)
      Seq(banner(6430001L, "SCENIC MOBILE HOME PARK", 2)) ++
        row(80, h6) ++
        row(100, Seq("102", "LEAD", "0.01", "0.015", "03/03/2014", "ENTRY POINT")) ++
        row(112, Seq("102", "COPPER", "0.2", "1.3", "04/04/2014", "ENTRY POINT")),
      // p3: part 2 -> stitched (J8)
      Seq(banner(6430001L, "SCENIC MOBILE HOME PARK", 3)) ++
        row(80, h4, w = 80) ++
        row(100, Seq("LAB2", "METH3", "03/04/2014", "04/07/2014"), w = 80) ++
        row(112, Seq("LAB2", "METH4", "04/05/2014", "05/07/2014"), w = 80),
      // p4: header sits below TOP1 -> only TOP2 finds it (retry path)
      Seq(banner(6430002L, "BUTLER WATER", 1)) ++
        row(55, h10) ++
        row(75, Seq("801", "ARSENIC", "0.003", "0.01", "05/05/2015", "ENTRY POINT",
          "LAB1", "METH1", "05/06/2015", "06/07/2015")) ++
        row(87, Seq("801", "ZINC", "0.5", "5.0", "06/06/2015", "ENTRY POINT",
          "LAB1", "METH1", "06/07/2015", "07/07/2015")),
      // p5: part 1 with one row (held)
      Seq(banner(6430002L, "BUTLER WATER", 2)) ++
        row(80, h6) ++
        row(100, Seq("802", "TOC", "4.2", ".", "07/23/2014", "RAW WATER")),
      // p6: headerless carryover (two more part-1-shaped rows)
      Seq(banner(6430002L, "BUTLER WATER", 3)) ++
        row(80, Seq("803", "TTHM", "0.05", "0.08", "08/08/2014", "DISTRIBUTION")) ++
        row(92, Seq("804", "HAA5", "0.03", "0.06", "09/09/2014", "DISTRIBUTION")),
      // p7: part 2 with the three matching rows -> stitch
      Seq(banner(6430002L, "BUTLER WATER", 4)) ++
        row(80, h4, w = 80) ++
        row(100, Seq("LAB3", "METH5", "07/24/2014", "08/07/2014"), w = 80) ++
        row(112, Seq("LAB3", "METH6", "08/09/2014", "09/07/2014"), w = 80) ++
        row(124, Seq("LAB3", "METH7", "09/10/2014", "10/07/2014"), w = 80)),
      compress = true)
    dir
  }

  private lazy val rows = Pdf.extract(
    Files.readAllBytes(Paths.get(s"$pdfDir/rpt2014.pdf")))

  test("extracts all rows across every page condition") {
    assert(rows.length == 9) // 2 full + 2 stitched + 2 retry + 3 carryover-stitched
  }

  test("full-page rows carry SPLIT_PAGES=1 and banner provenance") {
    val chl = rows.find(_.getString(1) == "CHLORINE").get
    assert(chl.getInt(10) == 1)            // SPLIT_PAGES
    assert(chl.getLong(11) == 6430001L)    // PWSID
    assert(chl.getString(12) == "SCENIC MOBILE HOME PARK")
    assert(chl.getInt(13) == 1)            // MAIN_PAGE
    assert(chl.getInt(15) == 1)            // SYSNAME_PAGE
  }

  test("column split stitches part 2 onto part 1 by row order (J8)") {
    val lead = rows.find(_.getString(1) == "LEAD").get
    assert(lead.getInt(10) == 2) // SPLIT_PAGES
    assert(lead.getString(6) == "LAB2" && lead.getString(7) == "METH3")
    val cu = rows.find(_.getString(1) == "COPPER").get
    assert(cu.getString(7) == "METH4")
  }

  test("TOP2 retry recovers a low-header page and stamps the margin used") {
    val ars = rows.find(_.getString(1) == "ARSENIC").get
    assert(ars.getInt(14) == Pdf.Top2) // TOP_MARGIN
    assert(ars.getLong(11) == 6430002L)
  }

  test("headerless carryover rows join the held part-1 fragment before stitching") {
    val byName = rows.filter(r => Seq("TOC", "TTHM", "HAA5").contains(r.getString(1)))
      .map(r => r.getString(1) -> r.getString(7)).toMap
    assert(byName == Map("TOC" -> "METH5", "TTHM" -> "METH6", "HAA5" -> "METH7"))
  }

  test("a bannerless page fails fast with context (G5)") {
    val p = s"$pdfDir/bad.pdf"
    PdfGen.write(p, Seq(row(80, h10) ++ row(100, Seq("1", "X", "1", ".", "01/01/2014",
      "E", "L", "M", "01/01/2014", "01/01/2014"))))
    val e = intercept[IllegalStateException](
      Pdf.extract(Files.readAllBytes(Paths.get(p))))
    assert(e.getMessage.contains("banner"))
  }

  test("scan() distributes per file and lands in the catalog schema") {
    val df = Pdf.scan(spark, s"$pdfDir/rpt2014.pdf")
    assert(df.schema == graft.sources.Schemas.data)
    assert(df.count() == 9)
    import org.apache.spark.sql.functions._
    assert(df.filter(col("SPLIT_PAGES") === 2).count() == 5)
  }

  test("DataSource V2: format(graft-pdf) plans per-file partitions, same rows as scan()") {
    val df = spark.read.format("graft-pdf")
      .option("path", s"$pdfDir/rpt2014.pdf").load()
    assert(df.schema == graft.sources.Schemas.data)
    assert(df.rdd.getNumPartitions == 1) // one partition per pdf file
    val viaScan = Pdf.scan(spark, s"$pdfDir/rpt2014.pdf")
    assert(df.count() == 9)
    assert(df.exceptAll(viaScan).isEmpty && viaScan.exceptAll(df).isEmpty)
    // pruned read still works through the V2 path
    import org.apache.spark.sql.functions._
    assert(df.filter(col("TOP_MARGIN") === Pdf.Top2)
      .select("Contaminant ID").collect().map(_.getString(0)).toSet ==
      Set("ARSENIC", "ZINC"))
  }

  test("pdf stage checkpoint round-trips through the CSV catalog schema") {
    val out = Files.createTempDirectory("graft-pdf-stage").toString
    graft.pipelines.DownPipeline.runPdfStage(spark, Seq(s"$pdfDir/rpt2014.pdf"), out)
    val back = Csv.scan(spark, Schemas.data, s"$out/rptinfo")
    assert(back.schema == Schemas.data)
    assert(back.count() == 9)
    val ars = back.filter(back("Contaminant ID") === "ARSENIC").collect()(0)
    assert(ars.getAs[Int]("TOP_MARGIN") == Pdf.Top2)
    assert(ars.getAs[Long]("PWSID") == 6430002L)
  }
}

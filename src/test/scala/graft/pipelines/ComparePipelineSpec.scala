package graft.pipelines

import java.nio.file.Files

import graft.SparkSpec
import PipelineFixtures._

/** Golden end-to-end reconciliation: runs BOTH pipelines on the fixtures,
  * reads their CSV outputs back, normalizes through the Clean layer and
  * 7-key inner joins — the reference's own closest-to-a-test practice
  * (`/root/reference/compare.py`), automated. */
class ComparePipelineSpec extends SparkSpec {

  private lazy val result = {
    val downOut = Files.createTempDirectory("graft-cmp-down").toString
    val directOut = Files.createTempDirectory("graft-cmp-direct").toString
    DownPipeline.run(
      spark,
      spiPaths = Seq(s"$fx/spi_p1.csv", s"$fx/spi_p2.csv"),
      biPaths = Seq(s"$fx/bi_p1.csv"),
      sitesXlsx = sitesXlsx,
      sitesSheet = "Sheet1",
      dataPaths = Seq(s"$fx/data_2014.csv", s"$fx/data_2015.csv"),
      outDir = downOut)
    DirectPipeline.run(spark, directXlsx, directOut)
    val cmpOut = Files.createTempDirectory("graft-cmp-out").toString
    ComparePipeline.run(
      spark,
      s"$downOut/down_water_data",
      s"$directOut/direct_water_data",
      cmpOut)
  }

  test("reconciles exactly the rows agreeing on all 7 normalized keys") {
    // CHLORINE: identical dates; NITRATE: matches only after de-spacing
    // 09/08/ 2014, '.'→1/9/1999 imputation, lenient 9/8 vs 09/08 parse,
    // DISTRIBUTIO N→D samptype, 726.0→n726 key repair. LEAD's locations
    // diverge (n801 vs n999) so it must NOT reconcile.
    val keys = result.collect().map(_.getAs[String]("Contaminant ID")).toSet
    assert(keys == Set("CHLORINE", "NITRATE"))
  }

  test("both sides' results arrive typed and equal on the fixture pairs") {
    val byName = result.collect()
      .map(r => r.getAs[String]("Contaminant ID") ->
        (r.getAs[Double]("Analysis Result"), r.getAs[Double]("RESULT"))).toMap
    assert(byName("CHLORINE") == ((0.72, 0.72)))
    assert(byName("NITRATE") == ((1.5, 1.5)))
  }

  test("null mail address 2 is patched to empty string") {
    val chl = result.filter(result("Contaminant ID") === "CHLORINE").collect()(0)
    assert(chl.getAs[String]("MAIL_ADDR2") == "")
  }
}

package graft.pipelines

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Quality
import graft.sources.{Excel, Schemas, XlsxGen}
import PipelineFixtures._

/** Golden end-to-end test of the direct pipeline: 3-sheet selective xlsx
  * ingest, G1 range gates, EPID/SPID key mirroring, strict-then-loose
  * join with MAIL_ZIP miss detection and drop-unmatched. */
class DirectPipelineSpec extends SparkSpec {

  private lazy val outDir = Files.createTempDirectory("graft-direct-out").toString
  private lazy val result = DirectPipeline.run(spark, directXlsx, outDir)
  private lazy val rows =
    result.collect().map(r => r.getAs[String]("CONTNAM") -> r).toMap

  test("keeps exactly the rows with a resolvable mailing address") {
    // CHLORINE strict E-type; NITRATE and LEAD loose (their locations are
    // no EPID/SPID); ZINC (unknown PWSID) and COPPER (zip-less system)
    // dropped.
    assert(rows.keySet == Set("CHLORINE", "NITRATE", "LEAD"))
  }

  test("strict matches resolve at level 1, loose at level 2") {
    val lv = rows.view.mapValues(_.getAs[Int]("match_level")).toMap
    assert(lv == Map("CHLORINE" -> 1, "NITRATE" -> 2, "LEAD" -> 2))
  }

  test("payload comes from the matched system info") {
    assert(rows("CHLORINE").getAs[String]("MAIL_ZIP") == "16125")
    assert(rows("LEAD").getAs[String]("MAIL_ZIP") == "16001")
    assert(rows("LEAD").getAs[String]("SYSOWNAM") == "OWNER B")
  }

  test("fact keys survive on the output (LOC_EPID stays the data's)") {
    assert(rows("LEAD").getAs[String]("LOC_EPID") == "999")
  }

  test("G1 gate halts on out-of-range keys (spec intent: SPID > 999)") {
    val bad = Excel.cast(
      Excel.readSheet(spark, {
        val p = Files.createTempDirectory("graft-badwb").resolve("bad.xlsx").toString
        XlsxGen.write(p, Seq("System Info" -> Seq(
          Seq("PWSID", "EPID", "SPID"),
          Seq(1, 150, 1200)))) // SPID out of range; EPID fine
        p
      }, "System Info"),
      org.apache.spark.sql.types.StructType(Schemas.systemInfo.fields.take(3)))
    val e = intercept[IllegalStateException](
      Quality.enforce(bad, DirectPipeline.keyRangeGates))
    assert(e.getMessage.contains("spid_out_of_range"))
    assert(!e.getMessage.contains("epid_out_of_range"))
  }
}

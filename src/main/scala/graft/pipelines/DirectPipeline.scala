package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Quality, Relational}
import graft.sources.{Csv, Excel, Schemas}

/** The reference's direct-data pipeline
  * (`/root/reference/direct/direct_water_prep.py:65-172`): 3-sheet
  * selective Excel ingest (S4), EPID/SPID range gates (G1), key-mirroring
  * via explode (P6 — the reference copies the whole table and unions,
  * `direct_water_prep.py:107-119`; one pass here), then the strict-then-
  * loose 2-level join with drop-unmatched (J4) where a missing MAIL_ZIP
  * marks a miss.
  *
  * NB on G1: the reference's SPID check re-tests EPID (`(SPID < 700) |
  * (EPID > 999)`, `direct_water_prep.py:89`) — a latent bug contradicting
  * its own comment at `:77-78`; the engine implements the spec intent
  * (`SPID > 999`).
  */
object DirectPipeline {

  /** Post-mirror projection (`direct_water_prep.py:126`). */
  val SysInfoSubset: Seq[String] = Seq(
    "PWSID", "SYSTYPE", "LOC_EPID", "SYSNAME", "POPL", "AREACITY",
    "SYSOWNAM", "MAIL_ADDR1", "MAIL_ADDR2", "SYSLOCCY", "MAIL_ZIP")

  /** G1 — the joining-key range gates, one scan. */
  def keyRangeGates: Seq[Quality.Gate] = Seq(
    Quality.Gate("epid_out_of_range", col("EPID") < 100 || col("EPID") > 199),
    Quality.Gate("spid_out_of_range", col("SPID") < 700 || col("SPID") > 999))

  /** P6 + P1 + dedup: expose each system-info row under both EPID and
    * SPID as `LOC_EPID` (one explode pass), project the 11-column subset,
    * drop whole-row duplicates. `LOC_EPID` becomes a string to match the
    * data sheet's string typing (`direct_water_prep.py:136-137`). */
  def prepSystemInfo(sysInfo: DataFrame): DataFrame =
    Relational.keyMirror(sysInfo, "LOC_EPID", Seq(col("EPID"), col("SPID")))
      .withColumn("LOC_EPID", col("LOC_EPID").cast("string"))
      .select(SysInfoSubset.map(col): _*)
      .dropDuplicates(SysInfoSubset)

  /** J4 — strict join on [PWSID, LOC_EPID], loose fallback on [PWSID]
    * (deterministic survivor, unlike the reference's "just getting any
    * one", `direct_water_prep.py:144`), misses detected by MAIL_ZIP
    * nullness, final misses dropped (`direct_water_prep.py:165`). */
  def enrich(data: DataFrame, sysPrep: DataFrame): DataFrame =
    Relational.hierarchicalEnrich(
      data, sysPrep,
      keyLevels = Seq(Seq("PWSID", "LOC_EPID"), Seq("PWSID")),
      payloadCols = SysInfoSubset.filterNot(Seq("PWSID", "LOC_EPID").contains),
      // every subset column: post-distinct rows differ in >=1 column, so
      // this is a TOTAL order and the survivor is run-deterministic
      // (keepFirst requires it; a partial order picks by partition luck)
      dimOrder = SysInfoSubset.filterNot(_ == "PWSID").map(col),
      dropUnmatched = true,
      missOn = Some("MAIL_ZIP"),
      hintBroadcast = true)

  /** Full run: workbook in, final CSV out. The Violations sheet is read
    * and carried (the reference loads it and never uses it —
    * `direct_water_prep.py:73`; the capability under test is selective
    * multi-sheet ingest).
    *
    * Ingest goes through the `graft-xlsx` V2 source — one scan surface
    * with the directory-of-workbooks path (executor-side parse, no
    * driver bottleneck when `workbook` is a glob/directory). The
    * driver-side [[Excel.readSheet]] remains as the documented
    * convenience for a single dimension-sized workbook. */
  def run(spark: SparkSession, workbook: String, outDir: String): DataFrame = {
    def sheet(name: String): DataFrame =
      spark.read.format("graft-xlsx").option("sheet", name).load(workbook)
    val sysInfo = Excel.cast(
      sheet("System Info").select(Schemas.systemInfo.fieldNames.map(col).toSeq: _*),
      Schemas.systemInfo)
    sheet("Violations") // selective ingest: planned (header parsed), never scanned
    val data = sheet("Data").withColumn("PWSID", col("PWSID").cast("long"))
    Quality.enforce(sysInfo, keyRangeGates) // G1 halt, direct_water_prep.py:91-101
    val out = enrich(data, prepSystemInfo(sysInfo))
    Csv.sink(out, s"$outDir/direct_water_data", singleFile = true)
    out
  }
}

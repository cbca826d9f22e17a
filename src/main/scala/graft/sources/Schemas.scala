package graft.sources

import org.apache.spark.sql.types._

/** Explicit `StructType` schemas for the reference's 7 logical tables
  * (SURVEY.md §1.2, FIXTURES.md) — schema-on-read replaces the
  * reference's pandas inference + scattered imperative casts
  * (`/root/reference/down/down_water_prep.py:281-288`).
  *
  * Dates and results stay `StringType` at ingest ON PURPOSE: the raw
  * files carry sentinel nulls (`'.'`), embedded-space dates and
  * float-round-tripped IDs, so typing happens in the cleaning layer
  * ([[graft.clean.Clean]]), exactly where the reference does its
  * repairs — not in the scan, where a strict parser would null them out
  * silently.
  */
object Schemas {

  private def s(names: String*): Seq[StructField] =
    names.map(StructField(_, StringType, nullable = true))

  /** `data` — one lab analysis result, 16 cols as produced by the PDF
    * stage (`/root/reference/down/down_water_prep.py:173-192,277`). */
  val data: StructType = StructType(
    s("Sample Location", "Contaminant ID", "Analysis Result", "MCL In Effect",
      "Sample Date", "Sample Type", "Laboratory ID", "Analysis Method",
      "Analysis Date", "Sample Received Date") ++
    Seq(
      StructField("SPLIT_PAGES", IntegerType),
      StructField("PWSID", LongType),
      StructField("SYSTEM NAME", StringType),
      StructField("MAIN_PAGE", IntegerType),
      StructField("TOP_MARGIN", IntegerType),
      StructField("SYSNAME_PAGE", IntegerType)))

  /** `spi` — sample-point inventory, 19 cols
    * (`/root/reference/down/down_water_prep.py:67,271`). */
  val spi: StructType = StructType(
    Seq(StructField("PWSID", LongType), StructField("SYSTEM NAME", StringType)) ++
    s("ACTIVITY", "SYSTYPE", "SAMPLE POINT ID", "SAMPLE POINT AVAILABILITY",
      "SAMPLE POINT NAME", "TTHM MONITORING LOCATION", "HAA5 MONITORING LOCATION",
      "CLIENT ID", "SITE ID", "PRMRY_FAC_ID", "POPULATION SERVED",
      "PRIMARY SOURCE", "DISTRICT", "REGION", "COUNTY",
      "RTCR MONITORING LOCATION", "SEASONAL START UP LOCATION"))

  /** `bi` — basic information, 20 cols
    * (`/root/reference/down/down_water_prep.py:69,273`). */
  val bi: StructType = StructType(
    Seq(StructField("PWSID", LongType), StructField("SYSTEM NAME", StringType)) ++
    s("ACTIVITY CODE", "CLIENT ID", "SITE ID", "PRIMARY FACILITY ID",
      "SYSTEM TYPE", "OWNER TYPE", "POPULATION SERVED",
      "NONTRANSIENT POPULATION SERVED", "CONSECUTIVE INDICATOR",
      "PRIMARY SELLER", "REGULATED BY", "PRIMARY SOURCE",
      "PRIMARY SELLER STATE", "VENDING PWS PERM BY RULE",
      "SERVICE CONNECTIONS", "COUNTY", "DISTRICT", "REGION"))

  /** `sites` — eFACTS site list, 9 cols + post-geocode `Coordinates`
    * (`/root/reference/down/down_water_prep.py:70-71,275,465`). */
  val sites: StructType = StructType(
    s("SITE_ID", "SITE_NAME", "SISSCD_ID", "EPA_SITE_ID", "ADDRESS1",
      "ADDRESS2", "CITY", "STATE_CODE", "ZIP_CODE", "Coordinates"))

  /** direct workbook `System Info` sheet — superset with the EPID/SPID
    * range-gated keys (`/root/reference/direct/direct_water_prep.py:69-89,126`). */
  val systemInfo: StructType = StructType(
    Seq(
      StructField("PWSID", LongType),
      StructField("EPID", IntegerType),
      StructField("SPID", IntegerType)) ++
    s("SYSTYPE", "SYSNAME", "POPL", "AREACITY", "SYSOWNAM",
      "MAIL_ADDR1", "MAIL_ADDR2", "SYSLOCCY", "MAIL_ZIP"))

  /** direct workbook `Violations` sheet — loaded but never consumed by
    * the reference (`direct/direct_water_prep.py:73`); carried for the
    * multi-sheet selective-ingest capability. */
  val violations: StructType = StructType(
    Seq(StructField("PWSID", LongType)) ++ s("VIOLATION_CODE", "VIOLATION_DATE"))

  /** direct workbook `Data` sheet — 8 cols
    * (`/root/reference/direct/direct_water_prep.py:74,152`). */
  val directData: StructType = StructType(
    Seq(StructField("PWSID", LongType)) ++
    s("CONTAMID", "CONTNAM", "RESULT", "SAMPTYPE", "SAMPDATE", "SAMPTIME",
      "ANALDATE", "LOC_EPID"))
}

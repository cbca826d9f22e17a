package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.clean.Clean
import graft.operators.{Quality, Relational}
import graft.sources.{Csv, Excel, Pdf, Schemas}

/** The reference's main pipeline (`/root/reference/down/down_water_prep.py`,
  * stages `csv` + `join`), re-expressed Spark-first.
  *
  * Stage `csv` builds the site dimension: SPI ⟗ BI multi-key outer join
  * with `_y` suffixes (J1), coalesce repair ×7 (X9), consistency gates
  * (G2), left-join of the eFACTS sites workbook (J2), projection +
  * geocoding address assembly (X6). Stage `join` enriches every analysis
  * row through the signature 3→2→1-key hierarchical cascade (J3) with
  * ZIP-code-based miss detection and the row-conservation gate (G3).
  *
  * Scale notes: the dimension build is all broadcast-sized (sites are
  * thousands of rows); the fact table (`data`, 100 TB posture) is scanned
  * ONCE — the cascade is a single pass with three dimension hash joins,
  * not the reference's 3 passes + 2 re-filters. The manual Google-Sheets
  * geocoding detour (`down_water_prep.py:414-423`) becomes a plain
  * `Coordinates` column carried through when the source provides it.
  */
object DownPipeline {

  /** The 7 columns SPI and BI both carry (X9 repair + G2 gate set,
    * `down_water_prep.py:307-313,324-360`). */
  val RepairCols: Seq[String] = Seq(
    "CLIENT ID", "COUNTY", "DISTRICT", "POPULATION SERVED",
    "PRIMARY SOURCE", "REGION", "PRIMARY FACILITY ID")

  /** Stage-`csv` output projection (`down_water_prep.py:376-402`). */
  val SiteFields: Seq[String] = Seq(
    "PWSID", "SYSTEM NAME", "Sample Location",
    "SAMPLE POINT AVAILABILITY", "SAMPLE POINT NAME", "CLIENT ID", "SITE_ID",
    "POPULATION SERVED", "PRIMARY SOURCE", "DISTRICT", "REGION", "COUNTY",
    "ACTIVITY CODE", "PRIMARY FACILITY ID", "SYSTEM TYPE", "OWNER TYPE",
    "SITE_NAME", "EPA_SITE_ID", "ADDRESS1", "ADDRESS2", "CITY", "STATE_CODE",
    "ZIP_CODE")

  /** Payload attached by the join-stage cascade: every site column except
    * the three cascade keys. */
  def payloadCols(siteSub: DataFrame): Seq[String] =
    siteSub.columns.toSeq.filterNot(
      Seq("PWSID", "SYSTEM NAME", "Sample Location").contains)

  /** Stage `pdf` (`down_water_prep.py:230-247`): distributed PDF table
    * extraction → CSV checkpoint in the catalog `data` schema. The
    * reference runs this stage once because it is slow (a tabula JVM
    * subprocess per page); here it is one parallel scan, and the CSV
    * checkpoint remains the stage contract so `csv`/`join` never re-parse
    * PDFs. */
  def runPdfStage(spark: SparkSession, pdfPaths: Seq[String], outDir: String): DataFrame = {
    val df = Pdf.scan(spark, pdfPaths: _*)
    Csv.sink(df, s"$outDir/rptinfo", singleFile = true)
    df
  }

  /** Stage `csv`, dimension half: SPI ⟗ BI ⟕ sites → (siteSub, G2 audit).
    * The audit is computed post-repair, exactly like the reference's
    * checks at `down_water_prep.py:323-360` — a mismatch means both
    * sources disagreed on a value they both carried. */
  def buildSiteDim(spi: DataFrame, bi: DataFrame, sites: DataFrame): (DataFrame, DataFrame) = {
    val spiRenamed = spi.withColumnRenamed("PRMRY_FAC_ID", "PRIMARY FACILITY ID")
    val joined = Relational
      .joinWithSuffixes(spiRenamed, bi, Seq("PWSID", "SYSTEM NAME", "SITE ID"), "full_outer")
      .withColumnRenamed("SITE ID", "SITE_ID")
      .join(broadcast(sites), Seq("SITE_ID"), "left")
      .withColumn("SYSTEM NAME", trim(col("SYSTEM NAME")))
    val repaired = Relational
      .coalesceRepair(joined, RepairCols, dropTwin = false)
      .distinct()
    val audit = Quality.audit(repaired, RepairCols.map(c =>
      Quality.Gate(s"mismatch: $c", col(c) =!= col(c + "_y") && col(c + "_y").isNotNull)))
    val keepCoords = if (repaired.columns.contains("Coordinates")) Seq("Coordinates") else Nil
    val siteSub = repaired
      .withColumnRenamed("SAMPLE POINT ID", "Sample Location")
      .select((SiteFields ++ keepCoords).map(col): _*)
      .withColumn("Lat_Long_Address",
        when(col("ADDRESS2").isNull,
          concat_ws(", ", col("ADDRESS1"), col("CITY"), col("STATE_CODE"), col("ZIP_CODE")))
          .otherwise(concat_ws(", ",
            concat_ws(" ", col("ADDRESS1"), col("ADDRESS2")),
            col("CITY"), col("STATE_CODE"), col("ZIP_CODE"))))
    (siteSub, audit)
  }

  /** Optional geocoding stage — the reference's manual Google-Sheets
    * detour (`down_water_prep.py:414-423`) as an in-pipeline enrichment:
    * fill the site dimension's `Coordinates` from an (address → lat/long)
    * lookup, keyed on the `Lat_Long_Address` the `csv` stage already
    * assembles. Carry-if-present: coordinates pasted in by hand (the
    * reference's workflow) survive; only missing ones are filled. The
    * lookup is dimension-sized → broadcast join, fact side untouched. */
  def geocodeSites(siteSub: DataFrame, lookup: DataFrame): DataFrame = {
    val enriched = graft.operators.Geocode.enrich(
      siteSub.withColumn("__lat0",
        when(col("Coordinates").isNotNull,
          substring_index(col("Coordinates"), ",", 1).cast("double")))
        .withColumn("__lon0",
          when(col("Coordinates").isNotNull,
            substring_index(col("Coordinates"), ",", -1).cast("double"))),
      lookup, addressCol = "Lat_Long_Address",
      latCol = "__lat0", lonCol = "__lon0")
    enriched
      // rebuild ONLY lookup-filled rows: a hand-entered string must
      // survive byte-for-byte (a double round-trip would reformat
      // '40.2500,-75' and fabricate a pair from a one-component value)
      .withColumn("Coordinates",
        when(col("geo_source") === "lookup",
          concat_ws(",", col("__lat0"), col("__lon0")))
          .otherwise(col("Coordinates")))
      .drop("__lat0", "__lon0", "geo_source")
  }

  /** Stage `csv`, fact half (`down_water_prep.py:316-321`): word-wrap
    * repair, name trim, date de-spacing. */
  def prepData(data: DataFrame): DataFrame =
    data
      .withColumn("Sample Type",
        when(col("Sample Type") === "DISTRIBUTIO N", "DISTRIBUTION")
          .otherwise(col("Sample Type")))
      .withColumn("SYSTEM NAME", trim(col("SYSTEM NAME")))
      .withColumn("Sample Date", replace(col("Sample Date"), lit(" "), lit("")))

  /** The join-stage key normalization (`down_water_prep.py:456-493`):
    * null → X/Y markers so null keys never match across tables, `.0`
    * float-artifact strip, `n`-prefix typing, trims. */
  private def locKey(c: Column, marker: String): Column =
    concat(lit("n"), Clean.stripFloatArtifact(trim(
      when(c.isNull || c.isin("nan", "NaN", ""), lit(marker)).otherwise(c.cast("string")))))

  /** Stage `join`: the 3→2→1-key hierarchical cascade over the site
    * dimension, ZIP-code miss detection, row conservation enforced.
    * Set `dropUnmatched=false` semantics: every data row survives.
    * `g3Check=false` skips the eager count-based conservation check —
    * [[run]] does, verifying G3 with `Observation` metrics collected
    * during the output write instead of a second full execution of the
    * cascade plan. */
  def enrich(siteSub: DataFrame, data: DataFrame, g3Check: Boolean = true): DataFrame = {
    // Coordinates are optional (the geocode detour may not have run);
    // a null column keeps Latitude/Longitude present-but-null
    val withCoords =
      if (siteSub.columns.contains("Coordinates")) siteSub
      else siteSub.withColumn("Coordinates", lit(null).cast("string"))
    val site = withCoords
      .withColumn("Sample Location", locKey(col("Sample Location"), "X"))
      .withColumn("SYSTEM NAME", trim(col("SYSTEM NAME")))
      .withColumn("Latitude", substring_index(col("Coordinates"), ",", 1))
      .withColumn("Longitude", substring_index(col("Coordinates"), ",", -1))
      .drop("Coordinates")
    val fact = data
      .withColumn("Sample Location", locKey(col("Sample Location"), "Y"))
      .withColumn("SYSTEM NAME", trim(col("SYSTEM NAME")))
    val out = Relational.hierarchicalEnrich(
      fact, site,
      keyLevels = Seq(
        Seq("PWSID", "SYSTEM NAME", "Sample Location"),
        Seq("PWSID", "SYSTEM NAME"),
        Seq("PWSID")),
      payloadCols = payloadCols(site),
      dimOrder = Nil,
      // reference sort keys first, then every remaining column so the
      // order is TOTAL over distinct rows (run-deterministic survivor)
      perLevelOrder = {
        val tail = site.columns.toSeq
          .filterNot(Seq("Sample Location", "SYSTEM NAME").contains).map(col)
        Seq(
          col("Sample Location").desc +: tail,
          col("Sample Location").desc +: tail,
          col("SYSTEM NAME").desc +: tail)
      },
      missOn = Some("ZIP_CODE"),
      hintBroadcast = true)
    if (g3Check) Quality.requireRowConservation(data, out) // G3, down_water_prep.py:540-543
    out
  }

  /** Full run: CSV/Excel in, three CSV checkpoints out (site prep, data
    * prep, final), mirroring the reference's stage files. Returns the
    * final enriched frame. */
  def run(
      spark: SparkSession,
      spiPaths: Seq[String],
      biPaths: Seq[String],
      sitesXlsx: String,
      sitesSheet: String,
      dataPaths: Seq[String],
      outDir: String): DataFrame = {
    val spi = Csv.scan(spark, Schemas.spi, spiPaths: _*)
    val bi = Csv.scan(spark, Schemas.bi, biPaths: _*)
    val sites = Excel.cast(Excel.readSheet(spark, sitesXlsx, sitesSheet), Schemas.sites)
    val (siteSub, audit) = buildSiteDim(spi, bi, sites)
    // G2: halt the stage when the sources disagree (reference sets
    // continue_if_true=False and stops, down_water_prep.py:338-360).
    Quality.enforceAudit(audit)
    Csv.sink(siteSub, s"$outDir/downprep_site", singleFile = true)
    // G3 via Observation metrics: both counts ride the writes below, so
    // the cascade's 3-join plan executes ONCE — a count() action here
    // would run it a second time over the (100 TB posture) fact table.
    val obsIn = org.apache.spark.sql.Observation("g3_in")
    val obsOut = org.apache.spark.sql.Observation("g3_out")
    val data = prepData(Csv.scan(spark, Schemas.data, dataPaths: _*))
      .observe(obsIn, count(lit(1)).as("n"))
    Csv.sink(data, s"$outDir/downprep_data", singleFile = true)
    val out = enrich(siteSub, data, g3Check = false)
      .observe(obsOut, count(lit(1)).as("n"))
    Csv.sink(out, s"$outDir/down_water_data", singleFile = true)
    val (nIn, nOut) = (obsIn.get("n").asInstanceOf[Long], obsOut.get("n").asInstanceOf[Long])
    if (nIn != nOut) throw new IllegalStateException(
      s"row conservation violated: in=$nIn out=$nOut") // G3, down_water_prep.py:540-543
    out
  }
}

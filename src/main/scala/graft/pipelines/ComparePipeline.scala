package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.clean.Clean
import graft.operators.Relational
import graft.sources.Csv

/** The reference's reconciliation pipeline (`/root/reference/compare.py`):
  * normalize both pipeline outputs to a shared 7-key schema — renames,
  * trims, embedded-space date repair, lenient parse, sentinel-date
  * imputation, `SAMPTYPE` derivation, `LOC_EPID` n-prefixing — then a
  * 7-key inner join with `_c` suffixes on collisions.
  *
  * This is the fact-⋈-fact join of the system (both sides are pipeline
  * outputs): at scale it shuffles both sides once on the 7-key hash —
  * sort-merge territory, deliberately NOT broadcast.
  */
object ComparePipeline {

  val JoinKeys: Seq[String] = Seq(
    "PWSID", "Contaminant ID", "SYSTEM NAME", "Sample Date", "Analysis Date",
    "SAMPTYPE", "LOC_EPID")

  /** Down-side normalization (`compare.py:46-69`): de-spaced lenient
    * dates, `'.'`-sentinel analysis dates imputed to 1/9/1999, SAMPTYPE
    * from the first char of Sample Type, LOC_EPID = the (already
    * n-prefixed) sample location. */
  def normalizeDown(down: DataFrame): DataFrame =
    down
      .withColumn("PWSID", col("PWSID").cast("long"))
      .withColumn("SYSTEM NAME", trim(col("SYSTEM NAME")))
      .withColumn("Contaminant ID", trim(col("Contaminant ID")))
      .withColumn("Sample Date", Clean.parseDateLenient(col("Sample Date")))
      .withColumn("Analysis Date",
        coalesce(Clean.parseDateLenient(Clean.normalizeNull(col("Analysis Date"))),
          lit("1999-01-09").cast("date")))
      .withColumn("SAMPTYPE", substring(col("Sample Type"), 1, 1))
      .withColumn("LOC_EPID", col("Sample Location"))

  /** Direct-side normalization (`compare.py:39-69`): schema-aligning
    * renames + n-prefix key typing. */
  def normalizeDirect(direct: DataFrame): DataFrame =
    direct
      .withColumn("PWSID", col("PWSID").cast("long"))
      .withColumnRenamed("CONTNAM", "Contaminant ID")
      .withColumnRenamed("SAMPDATE", "Sample Date")
      .withColumnRenamed("ANALDATE", "Analysis Date")
      .withColumnRenamed("SYSNAME", "SYSTEM NAME")
      .withColumn("SYSTEM NAME", trim(col("SYSTEM NAME")))
      .withColumn("Contaminant ID", trim(col("Contaminant ID")))
      .withColumn("Sample Date", Clean.parseDateLenient(col("Sample Date")))
      .withColumn("Analysis Date", Clean.parseDateLenient(col("Analysis Date")))
      .withColumn("LOC_EPID", Clean.stringKey(col("LOC_EPID"), "n"))

  /** J6 — the 7-key inner reconciliation join + result typing
    * (`compare.py:88-95`). */
  def reconcile(down: DataFrame, direct: DataFrame): DataFrame =
    Relational.joinWithSuffixes(
      normalizeDown(down), normalizeDirect(direct), JoinKeys, "inner", "_c")
      .withColumn("MAIL_ADDR2", coalesce(col("MAIL_ADDR2"), lit("")))
      .withColumn("RESULT", col("RESULT").cast("double"))
      .withColumn("Analysis Result", col("Analysis Result").cast("double"))

  def run(spark: SparkSession, downCsv: String, directCsv: String, outDir: String): DataFrame = {
    val down = spark.read.option("header", "true").csv(downCsv)
    val direct = spark.read.option("header", "true").csv(directCsv)
    val out = reconcile(down, direct)
    Csv.sink(out, s"$outDir/compare_down_direct", singleFile = true)
    out
  }
}

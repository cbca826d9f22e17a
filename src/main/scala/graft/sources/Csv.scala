package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV surface (S1/S2/S7): schema-on-read scans — single path, multi-path
  * union, directory/glob — and the header'd sink.
  *
  * The reference's `combine_csvs_into_one_df` loop
  * (`/root/reference/down/down_water_prep.py:554-565`) reads N page files
  * and concatenates; Spark's scan takes all paths natively and plans ONE
  * distributed read — one task per file split, no union nodes, no driver
  * loop — so a 10-year × many-page drop of files is a single parallel
  * scan at any file count.
  */
object Csv {

  /** S1/S2 — scan one or many CSV files into the given schema. Never
    * infers: inference is a full extra pass over 100 TB and can flip
    * types between file batches; parity engines read what the catalog
    * says (SURVEY.md §1.3). `columnNameOfCorruptRecord`-free PERMISSIVE
    * mode keeps malformed rows as nulls for the DQ gates to count rather
    * than failing the scan mid-job. */
  def scan(spark: SparkSession, schema: StructType, paths: String*): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(paths: _*)

  /** [[scan]] with corrupt-record capture: a line that fails the schema
    * (unparseable number, wrong field count) keeps its RAW TEXT in
    * `corruptCol` instead of dissolving into indistinguishable nulls —
    * so a DQ gate can count, quarantine, or fail-fast on malformed input
    * ([[graft.operators.Quality.audit]] with a `corruptCol IS NOT NULL`
    * gate) and the offending lines are reproducible verbatim.
    *
    * Spark refuses plans that reference ONLY the corrupt column
    * (SPARK-21610: the parser skips non-referenced fields, so such a
    * query would see nothing to fail) — always select at least one data
    * column alongside it, as the audit gates naturally do. */
  def scanAudited(spark: SparkSession, schema: StructType,
      corruptCol: String, paths: String*): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema already contains '$corruptCol' — pass a data-only schema " +
        "(a re-scan of an audited frame's schema would duplicate the column)")
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .schema(schema.add(corruptCol, org.apache.spark.sql.types.StringType))
      .csv(paths: _*)
  }

  /** S7 — header'd CSV sink. `singleFile=true` coalesces to one partition
    * to match the reference's one-file-per-stage contract
    * (`/root/reference/down/down_water_prep.py:247,408,545`) — correct
    * for stage checkpoints that a human or a small tool reads next, wrong
    * for big outputs; leave false to write one file per partition. */
  def sink(df: DataFrame, path: String, singleFile: Boolean = false): Unit =
    (if (singleFile) df.coalesce(1) else df)
      .write
      .option("header", "true")
      .mode("overwrite")
      .csv(path)
}

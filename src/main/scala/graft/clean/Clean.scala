package graft.clean

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ingest-time cleaning transforms.
  *
  * The reference scatters these repairs per-column at each pipeline stage
  * (sentinel-null patches `/root/reference/down/down_water_prep.py:460-461,507`,
  * `compare.py:63,91`; float-artifact strip `down/down_water_prep.py:462-468`;
  * lenient dates `compare.py:60-65`; whitespace canon
  * `down/down_water_prep.py:666-670`). Here each is a first-class column
  * expression built only from codegen'd Spark built-ins — no UDFs — so they
  * stay inside whole-stage codegen and never block pushdown of surrounding
  * predicates.
  */
object Clean {

  /** The reference's domain null markers: `'.'` plus string-cast artifacts. */
  val SentinelNulls: Seq[String] = Seq(".", "", "nan", "NaN")

  /** Map sentinel markers to real SQL NULL. */
  def normalizeNull(c: Column, sentinels: Seq[String] = SentinelNulls): Column =
    when(c.isin(sentinels.map(lit): _*), lit(null)).otherwise(c)

  /** Apply [[normalizeNull]] to the named (string) columns of a frame. */
  def normalizeNulls(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, n) => d.withColumn(n, normalizeNull(col(n))))

  /** Lenient multi-format date parse: first format that parses wins
    * (pandas `to_datetime` accepted `09/08/2014` and `8/4/2017` alike —
    * `compare.py:56-65`). Spark's single-pattern `to_date` raises on
    * mismatch, so each attempt is wrapped in try semantics via
    * `try_to_date`-style legacy-safe parse.
    */
  def parseDateLenient(c: Column, formats: Seq[String] = Seq("M/d/yyyy", "yyyy-MM-dd")): Column = {
    // embedded-space dates: `09/08/ 2014`. Literal (non-regex) replace —
    // StringReplace is a UTF8String scan, no per-row Matcher allocation.
    val cleaned = replace(trim(c), lit(" "), lit(""))
    coalesce(formats.map(f => try_to_date(cleaned, f)): _*)
  }

  /** Strip the `.0` float-round-trip artifact from string IDs
    * (`726.0` -> `726`, `down/down_water_prep.py:462-468`). Non-regex:
    * an anchored-suffix test + substring beats `regexp_replace(".0$")`,
    * which allocates a Matcher per row in the hottest cleaning scans. */
  def stripFloatArtifact(c: Column): Column =
    when(c.endsWith(".0"), c.substr(lit(1), length(c) - 2)).otherwise(c)

  /** Collapse runs of whitespace (incl. CR/LF/tab) to single spaces and trim
    * (PDF cell canonicalization, `down/down_water_prep.py:666-670`). */
  def normalizeWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** Force a deterministic string key: trim, strip float artifact, prefix
    * (the reference's `'n' + x` typing trick, `down/down_water_prep.py:470-471`). */
  def stringKey(c: Column, prefix: String = ""): Column =
    concat(lit(prefix), stripFloatArtifact(trim(c.cast("string"))))

  /** Repair UTF-8-read-as-Latin-1/Windows-1252 mojibake ("Ã©" → "é",
    * "æ•°" → "数") by EXACT inversion — char-to-byte map + strict UTF-8
    * re-decode; unrepairable or clean text passes through unchanged
    * ([[graft.functions.FixMojibake]]). The web-corpus cleaning step
    * every scraped training set needs before dedup/quality see the
    * text. One corruption generation per call. */
  def fixMojibake(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.FixMojibake(ColumnBridge.expression(c)))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.clean.Clean

/** Address-keyed coordinate enrichment.
  *
  * The reference geocodes by hand: it assembles a `Lat_Long_Address`
  * column, prints instructions to paste it into a Google-Sheets geocoding
  * add-on, and expects the coordinates to be copied back into the site CSV
  * (`/root/reference/down/down_water_prep.py:405-423`). Here the same
  * enrichment is a first-class operator: the address assembly is the exact
  * conditional-concat rule the reference uses, and the manual detour
  * becomes a broadcast left join against a (address → lat/long) lookup
  * table — resolvable from any source the caller has (a prior geocoding
  * run, a gazetteer extract).
  *
  * Scale posture: the lookup is dimension-sized (one row per distinct
  * address), so the join is a broadcast hash join and the fact side is
  * scanned once, shuffle-free. Address matching is on a canonical form
  * (case-folded, whitespace-collapsed) so cosmetic drift between the data
  * and the lookup never silently drops coordinates.
  */
object Geocode {

  /** The reference's `Lat_Long_Address` assembly
    * (`down_water_prep.py:405-407`): `addr1[, addr2]` joined with the
    * city/state/zip tail, where a null `addr2` switches the whole rule —
    * not a plain concat of nullable parts. `concat_ws` skips nulls on
    * both Spark and ANSI engines, so missing city/state/zip degrade to a
    * shorter key instead of a null one. */
  def addressKey(addr1: Column, addr2: Column, city: Column,
      state: Column, zip: Column): Column =
    when(addr2.isNull, concat_ws(", ", addr1, city, state, zip))
      .otherwise(concat_ws(", ", concat_ws(" ", addr1, addr2), city, state, zip))

  /** Canonical join form of an address: whitespace runs collapsed, outer
    * trim, case-folded. Matching on this form instead of the raw string
    * is what the reference's manual copy-paste loop could not guarantee. */
  def normalizeAddress(c: Column): Column = upper(Clean.normalizeWhitespace(c))

  /** Enrich `data` with coordinates from `lookup`, keyed by normalized
    * address. Carry-if-present: coordinates already on a row win over the
    * lookup (the reference keeps hand-found coordinates and only fills
    * the nulls, `down_water_prep.py:423`). Adds `sourceCol` lineage:
    * `carried` (both coordinates pre-existing), `lookup` (filled from the
    * lookup), `missing` (address unknown to the lookup and nothing
    * carried). When `data` lacks `latCol`/`lonCol` they are created.
    *
    * Provenance is both-or-neither: a coordinate PAIR is only ever taken
    * whole from one source. A row carrying a single coordinate (lat xor
    * lon) is treated as not carried — mixing a carried latitude with a
    * lookup longitude can produce a point on neither source's map — so
    * the half value is discarded and the pair comes from the lookup, or
    * is null-null (`missing`) when the lookup misses too. Likewise a
    * lookup row resolving only one coordinate never fills anything.
    * Invariant: `geo_source = 'missing'` ⇔ both outputs null.
    *
    * The lookup is deduped to one row per normalized address
    * ([[Relational.keepFirst]], ordered by coordinates so the survivor is
    * deterministic) — two raw spellings that canonicalize to the same key
    * must not fan out the fact side.
    *
    * @param hintBroadcast force a broadcast hint on the lookup (default:
    *        geocode tables are dimension-sized). Pass false for a
    *        continent-scale gazetteer and let AQE decide.
    */
  def enrich(
      data: DataFrame,
      lookup: DataFrame,
      addressCol: String,
      lookupAddressCol: String = "address",
      latCol: String = "latitude",
      lonCol: String = "longitude",
      lookupLatCol: String = "latitude",
      lookupLonCol: String = "longitude",
      sourceCol: String = "geo_source",
      hintBroadcast: Boolean = true): DataFrame = {
    val lk0 = lookup.select(
      normalizeAddress(col(lookupAddressCol)).as("__geo_key"),
      col(lookupLatCol).as("__geo_lat"),
      col(lookupLonCol).as("__geo_lon"))
    // nulls LAST: a lookup row with unresolved (null) coordinates must
    // never out-rank a real-coordinate spelling of the same canonical
    // address (Spark's default asc is nulls-first)
    val lk = Relational.keepFirst(lk0, Seq("__geo_key"),
      Seq(col("__geo_lat").asc_nulls_last, col("__geo_lon").asc_nulls_last))
    val carried = Seq(latCol, lonCol).foldLeft(data)((d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null).cast("double")))
    val bothCarried = col(latCol).isNotNull && col(lonCol).isNotNull
    val bothLookup = col("__geo_lat").isNotNull && col("__geo_lon").isNotNull
    carried
      .withColumn("__geo_key", normalizeAddress(col(addressCol)))
      .join(if (hintBroadcast) broadcast(lk) else lk, Seq("__geo_key"), "left")
      // lineage BEFORE the pair selection overwrites the carried columns;
      // both output columns are derived from the ORIGINAL pair into temps
      // first (overwriting latCol in place would make lonCol's both-carried
      // test read the already-rewritten latitude)
      .withColumn(sourceCol,
        when(bothCarried, lit("carried"))
          .when(bothLookup, lit("lookup"))
          .otherwise(lit("missing")))
      .withColumn("__out_lat",
        when(bothCarried, col(latCol)).when(bothLookup, col("__geo_lat")))
      .withColumn("__out_lon",
        when(bothCarried, col(lonCol)).when(bothLookup, col("__geo_lon")))
      .withColumn(latCol, col("__out_lat"))
      .withColumn(lonCol, col("__out_lon"))
      .drop("__geo_key", "__geo_lat", "__geo_lon", "__out_lat", "__out_lon")
  }
}

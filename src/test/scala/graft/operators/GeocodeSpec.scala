package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Geocode._

class GeocodeSpec extends SparkSpec {
  import spark.implicits._

  test("addressKey switches assembly on ADDRESS2 nullness and skips null tail parts") {
    val df = Seq(
      ("1 Main St", Option("Apt 2"), "Springfield", "PA", "19000"),
      ("1 Main St", Option.empty[String], "Springfield", "PA", "19000"))
      .toDF("a1", "a2", "city", "st", "zip")
    val out = df.select(addressKey($"a1", $"a2", $"city", $"st", $"zip").as("k"))
      .as[String].collect().toSeq
    assert(out == Seq(
      "1 Main St Apt 2, Springfield, PA, 19000",
      "1 Main St, Springfield, PA, 19000"))
    val short = Seq(("1 Main St", Option.empty[String], Option.empty[String], "PA", "19000"))
      .toDF("a1", "a2", "city", "st", "zip")
      .select(addressKey($"a1", $"a2", $"city", $"st", $"zip")).as[String].head()
    assert(short == "1 Main St, PA, 19000")
  }

  test("enrich: carried coords win, lookup fills nulls, misses tagged, match is canonical-form") {
    val data = Seq(
      // cosmetic drift from the lookup spelling: padding, case, run of spaces
      (1, "  1  main st, Springfield, PA, 19000", Option.empty[Double], Option.empty[Double]),
      (2, "2 Main St, Springfield, PA, 19000", Option(40.5), Option(-75.25)),
      (3, "9 Nowhere Rd, Springfield, PA, 19000", Option.empty[Double], Option.empty[Double]))
      .toDF("id", "addr", "latitude", "longitude")
    val lookup = Seq(
      ("1 Main St, Springfield, PA, 19000", 1.5, 2.5),
      ("2 Main St, Springfield, PA, 19000", 9.0, 9.0))
      .toDF("address", "latitude", "longitude")
    val out = enrich(data, lookup, addressCol = "addr").orderBy("id")
      .select("id", "latitude", "longitude", "geo_source")
      .collect().map(r => (r.getInt(0), Option(r.get(1)), Option(r.get(2)), r.getString(3)))
    assert(out.toSeq == Seq(
      (1, Some(1.5), Some(2.5), "lookup"),
      (2, Some(40.5), Some(-75.25), "carried"),
      (3, None, None, "missing")))
  }

  test("enrich dedups lookup spellings that canonicalize to one key (no fact fan-out)") {
    val data = Seq((1, "1 Main St, X")).toDF("id", "addr")
    val lookup = Seq(
      ("1  Main   St, X", 2.0, 3.0),
      ("1 MAIN ST, X", 1.0, 1.0)) // duplicate after canonicalization
      .toDF("address", "latitude", "longitude")
    val out = enrich(data, lookup, addressCol = "addr")
    assert(out.count() == 1) // keepFirst: no duplicate output rows
    val r = out.select("latitude", "longitude", "geo_source").head()
    assert((r.getDouble(0), r.getDouble(1), r.getString(2)) == ((1.0, 1.0, "lookup")))
  }

  test("geocodeSites fills missing Coordinates, keeps hand-entered ones byte-for-byte") {
    val siteSub = Seq(
      // hand-entered, NON-canonical rendering: must survive untouched,
      // not get double-parsed into '40.25,-75.0'
      ("PWS1", "1 Main St, Springfield, PA, 19000", Option("40.2500,-75")),
      ("PWS2", "2 Oak Av, Springfield, PA, 19000", Option.empty[String]),  // in lookup
      ("PWS3", "9 Nowhere Rd, X, Y, 0", Option.empty[String]))             // miss
      .toDF("PWSID", "Lat_Long_Address", "Coordinates")
    val lookup = Seq(
      ("1 Main St, Springfield, PA, 19000", 1.0, 2.0), // must NOT override
      ("2 Oak Av, Springfield, PA, 19000", 40.25, -75.5))
      .toDF("address", "latitude", "longitude")
    val out = graft.pipelines.DownPipeline.geocodeSites(siteSub, lookup)
      .orderBy("PWSID").select("PWSID", "Coordinates")
      .collect().map(r => r.getString(0) -> Option(r.getString(1)))
    assert(out.toSeq == Seq(
      "PWS1" -> Some("40.2500,-75"),
      "PWS2" -> Some("40.25,-75.5"),
      "PWS3" -> None))
  }

  test("a null-coordinate lookup spelling never out-ranks a resolved one") {
    val data = Seq((1, "1 Main St, X")).toDF("id", "addr")
    val lookup = Seq(
      ("1  Main  St, X", Option.empty[Double], Option.empty[Double]), // unresolved gazetteer row
      ("1 Main St, X", Option(4.5), Option(5.5)))
      .toDF("address", "latitude", "longitude")
    val r = enrich(data, lookup, addressCol = "addr")
      .select("latitude", "longitude", "geo_source").head()
    assert((r.getDouble(0), r.getDouble(1), r.getString(2)) == ((4.5, 5.5, "lookup")))
  }

  test("half-carried pair is not mixed with lookup values: both-or-neither provenance") {
    val data = Seq(
      (1, "1 Main St, X", Option(40.5), Option.empty[Double]), // lat only, lookup hit
      (2, "9 Lost Rd, Y", Option.empty[Double], Option(-75.25)), // lon only, lookup miss
      (3, "1 Main St, X", Option(40.5), Option(-75.25))) // full pair, must still win
      .toDF("id", "addr", "latitude", "longitude")
    val lookup = Seq(("1 Main St, X", 1.5, 2.5)).toDF("address", "latitude", "longitude")
    val out = enrich(data, lookup, addressCol = "addr").orderBy("id")
      .select("id", "latitude", "longitude", "geo_source")
      .collect().map(r => (r.getInt(0), Option(r.get(1)), Option(r.get(2)), r.getString(3)))
    assert(out.toSeq == Seq(
      // carried lat is discarded, whole pair comes from the lookup
      (1, Some(1.5), Some(2.5), "lookup"),
      // lookup miss: the orphan lon is dropped, missing ⇒ null-null
      (2, None, None, "missing"),
      (3, Some(40.5), Some(-75.25), "carried")))
  }

  test("a lookup row resolving only one coordinate never fills anything") {
    val data = Seq((1, "1 Main St, X")).toDF("id", "addr")
    val lookup = Seq(("1 Main St, X", Option(4.5), Option.empty[Double]))
      .toDF("address", "latitude", "longitude")
    val r = enrich(data, lookup, addressCol = "addr")
      .select("latitude", "longitude", "geo_source").head()
    assert((Option(r.get(0)), Option(r.get(1)), r.getString(2)) == ((None, None, "missing")))
  }

  test("enrich creates coordinate columns when the data has none") {
    val data = Seq((1, "1 Main St, X"), (2, "2 Oak Av, Y")).toDF("id", "addr")
    val lookup = Seq(("1 Main St, X", 1.5, 2.5)).toDF("address", "latitude", "longitude")
    val out = enrich(data, lookup, addressCol = "addr").orderBy("id")
    assert(out.columns.toSet.intersect(Set("latitude", "longitude", "geo_source")).size == 3)
    val rows = out.select("id", "latitude", "geo_source").collect()
      .map(r => (r.getInt(0), Option(r.get(1)), r.getString(2)))
    assert(rows.toSeq == Seq((1, Some(1.5), "lookup"), (2, None, "missing")))
  }
}

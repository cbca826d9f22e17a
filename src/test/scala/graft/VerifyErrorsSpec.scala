package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A deliberately-broken query must surface as an ERROR in the driver
  * artifacts, never vanish: round 8's events breakage produced no
  * CORRECTNESS row at all for 8 dead queries, so the round read as
  * all-green. [[Verify.run]] now writes `_errors.json`; this spec
  * drives it with one good and one throwing query and checks both the
  * artifact and the good query's dump survive. */
class VerifyErrorsSpec extends SparkSpec {

  test("a throwing query lands in _errors.json; good queries still dump") {
    val out = Files.createTempDirectory("verify_errors_spec").toString
    val good: (SparkSession, String) => DataFrame =
      (s, _) => s.range(3).toDF("id")
    val bad: (SparkSession, String) => DataFrame =
      (_, _) => throw new IllegalStateException("deliberately broken")
    val errors = Verify.run(spark, "/unused", out,
      Map("q_good" -> good, "q_bad" -> bad),
      Map("q_good" -> "SELECT 1 AS id"))

    assert(errors.keySet == Set("q_bad"))
    assert(errors("q_bad").contains("deliberately broken"))

    val errJson = Files.readString(Paths.get(s"$out/_errors.json"))
    assert(errJson.contains("\"q_bad\""), s"_errors.json missing q_bad: $errJson")
    assert(errJson.contains("deliberately broken"))
    assert(!errJson.contains("q_good"))

    // the good query's parquet dump and the oracle sidecar still exist
    assert(spark.read.parquet(s"$out/q_good").count() == 3)
    assert(Files.readString(Paths.get(s"$out/oracle_sql.json")).contains("q_good"))
  }

  test("an all-green run writes an empty _errors.json") {
    val out = Files.createTempDirectory("verify_errors_spec_green").toString
    val good: (SparkSession, String) => DataFrame =
      (s, _) => s.range(1).toDF("id")
    val errors = Verify.run(spark, "/unused", out, Map("q_ok" -> good), Map.empty)
    assert(errors.isEmpty)
    assert(Files.readString(Paths.get(s"$out/_errors.json")) == "{}")
  }
}

package graft.operators



import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed co-located joins — the pre-partitioning scale lever: two
  * tables bucketed by the same key into the same bucket count join with
  * NO shuffle exchange on either side (each bucket pair joins locally).
  * At 100 TB this converts the recurring fact⋈fact reconciliation from
  * two full shuffles per run into zero, paid once at write time. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("same-key bucketed tables join with no shuffle exchange") {
    // default warehouse dir (static conf); managed tables dropped below
    val a = (0 until 500).map(i => (i.toLong, i * 2.0)).toDF("k", "va")
    val b = (0 until 500).map(i => (i.toLong, s"s$i")).toDF("k", "vb")
    a.write.format("parquet").bucketBy(8, "k").mode("overwrite").saveAsTable("bucket_a")
    b.write.format("parquet").bucketBy(8, "k").mode("overwrite").saveAsTable("bucket_b")
    try {
      val joined = spark.table("bucket_a").join(spark.table("bucket_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 500)
      // sanity: the same join over plain (unbucketed) frames DOES shuffle
      val unbucketed = a.join(b, "k").queryExecution.executedPlan.toString
      assert(unbucketed.contains("Exchange"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS bucket_a")
      spark.sql("DROP TABLE IF EXISTS bucket_b")
    }
  }
}

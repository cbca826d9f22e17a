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

  test("bucketedTable reuses an unchanged layout and rebuilds on source or definition change") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft-layout-src").toString
    (0 until 100).map(i => (i.toLong, i * 2.0, s"x$i")).toDF("k", "v", "s")
      .write.mode("overwrite").parquet(srcDir)
    def src = spark.read.parquet(srcDir)
    val table = "graft_layout_reuse_spec"
    def tableFiles(): Map[String, Long] = {
      val loc = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath,
        table.toLowerCase)
      loc.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    try {
      Layout.bucketedTable(spark, src.select("k", "v"), table, Seq("k"), buckets = 4)
      val first = tableFiles()
      assert(first.nonEmpty)
      // identical definition over unchanged source: REUSED, not rewritten
      Layout.bucketedTable(spark, src.select("k", "v"), table, Seq("k"), buckets = 4)
      assert(tableFiles() == first, "unchanged layout was rebuilt")
      // different projection (same source files): must rebuild
      Thread.sleep(20)
      Layout.bucketedTable(spark, src.select("k", "s"), table, Seq("k"), buckets = 4)
      assert(spark.table(table).columns.toSeq == Seq("k", "s"),
        "changed definition served the stale layout")
      // regenerated source (mtime bump): must rebuild
      val second = tableFiles()
      Thread.sleep(20)
      (0 until 50).map(i => (i.toLong, i * 3.0, s"y$i")).toDF("k", "v", "s")
        .write.mode("overwrite").parquet(srcDir)
      Layout.bucketedTable(spark, src.select("k", "s"), table, Seq("k"), buckets = 4)
      assert(tableFiles() != second, "regenerated source served the stale layout")
      assert(spark.table(table).count() == 50)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
    }
  }

  test("bucketedTable rebuilds when the catalog table was replaced outside it") {
    // the memo+tableExists fast path must not trust a same-named table
    // recreated OUTSIDE bucketedTable: its bucket spec no longer matches
    // the request, so reuse would hand back a layout whose exchange-free
    // join promise is false
    val srcDir = java.nio.file.Files.createTempDirectory("graft-layout-ext").toString
    (0 until 20).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
      .write.mode("overwrite").parquet(srcDir)
    def src = spark.read.parquet(srcDir)
    val table = "graft_layout_external_spec"
    try {
      Layout.bucketedTable(spark, src, table, Seq("k"), buckets = 4)
      // replace behind Layout's back: same name, NO bucketing
      spark.sql(s"DROP TABLE `$table`")
      src.write.format("parquet").saveAsTable(table)
      // same definition over unchanged source: the memo token matches,
      // tableExists is true — only the catalog bucket-spec validation
      // can catch the swap. Must rebuild as a bucketed table.
      Layout.bucketedTable(spark, src, table, Seq("k"), buckets = 4)
      import org.apache.spark.sql.catalyst.TableIdentifier
      val spec = spark.sessionState.catalog
        .getTableMetadata(TableIdentifier(table)).bucketSpec
      assert(spec.exists(bs => bs.numBuckets == 4 &&
        bs.bucketColumnNames == Seq("k")),
        s"externally-replaced table was served stale (spec: $spec)")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
    }
  }
}

def t(name: String)(f: => Unit): Unit = {
  val t0 = System.nanoTime(); f
  println(f"PHASE $name ${(System.nanoTime()-t0)/1e9}%.2f s")
}
val dir = "/root/testdata/sf0.1"
t("trivial-range-sum") { spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save() }
t("q02-cold") { graft.SparkEntry.queries("q02_agg_pricing")(spark, dir).write.format("noop").mode("overwrite").save() }
t("q02-warm") { graft.SparkEntry.queries("q02_agg_pricing")(spark, dir).write.format("noop").mode("overwrite").save() }
t("q16-cold") { graft.SparkEntry.queries("q16_rollup")(spark, dir).write.format("noop").mode("overwrite").save() }
t("q16-warm") { graft.SparkEntry.queries("q16_rollup")(spark, dir).write.format("noop").mode("overwrite").save() }
t("q11-cold") { graft.SparkEntry.queries("q11_scalar_strings")(spark, dir).write.format("noop").mode("overwrite").save() }
System.exit(0)

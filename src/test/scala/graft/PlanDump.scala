package graft
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    // "-exec" first arg: run each query through the noop sink first, then
    // print the FINAL adaptive plan — the only place AQE's runtime
    // exchange/stage reuse (ReusedExchange / table-cache hits) is visible.
    val (exec, names) = args.toList match {
      case "-exec" :: rest => (true, rest)
      case rest => (false, rest)
    }
    val spark = GraftSession.builder("plandump",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (name <- names) {
      println(s"===== $name =====")
      val df = SparkEntry.queries(name)(spark, dir)
      // collect() (not write — that clones the plan into a NEW
      // QueryExecution) so THIS df's adaptive plan finalizes and the
      // print below shows the runtime stages/reuse that actually ran.
      if (exec) df.collect()
      val plan = df.queryExecution.executedPlan.toString
      // compress: only the operator lines
      plan.split("\n").filter(l => l.matches(".*(Scan|Join|Exchange|Aggregate|Sort|Window|TakeOrdered|Generate|Project|Filter|Reused|QueryStage|InMemory).*"))
        .map(_.take(200)).foreach(println)
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("plandump", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- args) {
      println(s"===== $name =====")
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      // compress: only the operator lines
      plan.split("\n").filter(l => l.matches(".*(Scan|Join|Exchange|Aggregate|Sort|Window|TakeOrdered|Generate|Project|Filter).*"))
        .map(_.take(200)).foreach(println)
    }
    spark.stop()
  }
}

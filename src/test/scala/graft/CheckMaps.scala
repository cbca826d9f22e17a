package graft
object CheckMaps {
  def main(args: Array[String]): Unit = {
    val q = SparkEntry.queries; val o = SparkEntry.oracleSql
    println(s"MAPS n_queries=${q.size} n_oracle=${o.size} " +
      s"oracle_without_query=${(o.keySet -- q.keySet).toSeq.sorted.mkString(",")} " +
      s"query_without_oracle=${(q.keySet -- o.keySet).toSeq.sorted.mkString(",")}")
  }
}

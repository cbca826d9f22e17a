package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CleaningQueries, GraphQueries, ParityQueries, ScaleQueries, SearchQueries, SourceQueries, TemporalQueries, TextQueries, TrainingQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ParityQueries.q03RegionRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.all ++ TextQueries.all ++ ScaleQueries.all ++ CleaningQueries.all ++
      SourceQueries.all ++ TrainingQueries.all ++ TemporalQueries.all ++
      SearchQueries.all ++ GraphQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ParityQueries.oracle ++ TextQueries.oracle ++ ScaleQueries.oracle ++
      CleaningQueries.oracle ++ SourceQueries.oracle ++ TrainingQueries.oracle ++
      TemporalQueries.oracle ++ SearchQueries.oracle ++ GraphQueries.oracle
}

package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared-session base for all engine specs.
  *
  * One local session per JVM (specs run in the forked test JVM); small
  * parallelism + few shuffle partitions keep fixture-sized tests fast.
  */
abstract class SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSpec.session
  import org.apache.spark.sql.functions.col

  /** Collect to a sorted, comparable canonical form. */
  def canon(df: DataFrame): Seq[Seq[Any]] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*)
      .collect()
      .toSeq
      .map(_.toSeq)
      .sortBy(_.mkString(""))
  }

  def assertSameRows(got: DataFrame, want: DataFrame): Unit = {
    assert(got.columns.sorted.toSeq == want.columns.sorted.toSeq, "column sets differ")
    assert(canon(got) == canon(want))
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = GraftSession.builder("graft-test", "4").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

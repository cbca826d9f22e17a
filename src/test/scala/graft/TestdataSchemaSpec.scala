package graft

import org.apache.spark.sql.types._

/** Schema-drift tripwire over the driver-provided testdata.
  *
  * The testdata has been regenerated with a changed physical layout once
  * already (round 8: `events.ts` moved from TIMESTAMP(NANOS) to
  * timestamp[us]), and the failure mode was eight queries dying at
  * analysis time with nothing pointing at the data. This spec pins the
  * engine's ASSUMPTIONS about every table's field types, so the next
  * layout change costs one test failure that names the table and column
  * instead of a fan-out of broken queries.
  *
  * Columns that legitimately ship in more than one layout (the
  * timestamp family — the engine's read path branches on the actual
  * type, see [[Tables.events]]) list every accepted type; a NEW third
  * layout still trips the wire.
  *
  * Mutation drill (negative-tests the tripwire itself, run r9 — both
  * mutations failed naming their table.column): copy a testdata dir,
  * retype a column (e.g. DuckDB `CAST(c_custkey AS INT)` /
  * `CAST(ts AS VARCHAR)` → COPY TO parquet), then
  * {{{
  * sbt 'set Test/javaOptions += "-Dgraft.testdata.dir=/tmp/mutated"' \
  *     'testOnly graft.TestdataSchemaSpec'
  * }}}
  */
class TestdataSchemaSpec extends SparkSpec {

  // overridable so the tripwire itself can be negative-tested against a
  // deliberately mutated copy (see the mutation drill in the scaladoc of
  // the first test) without touching the read-only driver testdata
  private val sfDir =
    sys.props.getOrElse("graft.testdata.dir", "/root/testdata/sf0.01")

  // Accepted Spark read types per (table, column). Timestamp columns
  // accept the three layouts the read path handles: BIGINT (legacy
  // TIMESTAMP(NANOS) under nanosAsLong), TIMESTAMP, TIMESTAMP_NTZ.
  private val ts: Set[DataType] = Set(LongType, TimestampType, TimestampNTZType)
  private def one(t: DataType): Set[DataType] = Set(t)

  private val expected: Map[String, Seq[(String, Set[DataType])]] = Map(
    "region" -> Seq(
      "r_regionkey" -> one(IntegerType), "r_name" -> one(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> one(IntegerType), "n_name" -> one(StringType),
      "n_regionkey" -> one(IntegerType)),
    "customer" -> Seq(
      "c_custkey" -> one(LongType), "c_name" -> one(StringType),
      "c_nationkey" -> one(IntegerType), "c_acctbal" -> one(DoubleType),
      "c_mktsegment" -> one(StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> one(LongType), "s_name" -> one(StringType),
      "s_nationkey" -> one(IntegerType), "s_acctbal" -> one(DoubleType)),
    "part" -> Seq(
      "p_partkey" -> one(LongType), "p_name" -> one(StringType),
      "p_brand" -> one(StringType), "p_type" -> one(StringType),
      "p_size" -> one(IntegerType), "p_retailprice" -> one(DoubleType)),
    "orders" -> Seq(
      "o_orderkey" -> one(LongType), "o_custkey" -> one(LongType),
      "o_orderstatus" -> one(StringType), "o_totalprice" -> one(DoubleType),
      "o_orderdate" -> ts, "o_orderpriority" -> one(StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> one(LongType), "l_partkey" -> one(LongType),
      "l_suppkey" -> one(LongType), "l_linenumber" -> one(IntegerType),
      "l_quantity" -> one(DoubleType), "l_extendedprice" -> one(DoubleType),
      "l_discount" -> one(DoubleType), "l_tax" -> one(DoubleType),
      "l_returnflag" -> one(StringType), "l_linestatus" -> one(StringType),
      "l_shipdate" -> ts),
    "events" -> Seq(
      "event_id" -> one(LongType), "ts" -> ts, "user_id" -> one(LongType),
      "event_type" -> one(StringType), "value" -> one(DoubleType),
      "props" -> one(StringType)),
    "documents" -> Seq(
      "doc_id" -> one(LongType), "text" -> one(StringType),
      "lang" -> one(StringType), "source" -> one(StringType),
      "n_chars" -> one(LongType)),
    "embeddings" -> Seq(
      "vec_id" -> one(LongType),
      "embedding" -> Set[DataType](ArrayType(FloatType, containsNull = true),
        ArrayType(FloatType, containsNull = false)),
      "label" -> one(IntegerType)))

  test("every testdata table reads with the field types the engine assumes") {
    val problems = expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val schema = spark.read.parquet(s"$sfDir/$table.parquet").schema
      val byName = schema.fields.map(f => f.name -> f.dataType).toMap
      cols.flatMap { case (name, accepted) =>
        byName.get(name) match {
          case None =>
            Some(s"$table.$name: MISSING (table has ${schema.fieldNames.mkString(", ")})")
          case Some(t) if !accepted.contains(t) =>
            Some(s"$table.$name: read as $t, engine accepts ${accepted.mkString(" | ")}")
          case _ => None
        }
      }
    }
    assert(problems.isEmpty,
      s"\ntestdata layout drifted — fix the read path (Tables) for:\n  ${problems.mkString("\n  ")}")
  }

  test("Tables.events normalizes ts to TIMESTAMP_NTZ under the current layout") {
    val t = Tables(spark, sfDir)
    assert(t.events.schema("ts").dataType == TimestampNTZType,
      s"Tables.events.ts resolved to ${t.events.schema("ts").dataType}")
  }
}

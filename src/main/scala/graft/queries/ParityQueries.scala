package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Relational._

/** Parity queries: one per operator family of SURVEY.md §2, each paired
  * with an ANSI-SQL oracle (DuckDB) over the same parquet tables.
  *
  * Determinism rules (oracle hash-matches exactly):
  *  - money aggregates go through DECIMAL(18,s) so the sum is exact and
  *    association-order-independent, then cast to DOUBLE for a stable
  *    output type on both engines;
  *  - every result carries a total ORDER BY;
  *  - no arbitrary-survivor dedup — ties always broken by a key column.
  */
object ParityQueries {

  /** Exact, order-independent sum: decimal accumulate, double out. */
  private def sumMoney(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- scans

  /** S1/P1/F1 — pruned, filtered scan: projection + predicate reach parquet. */
  val q01PrunedScan: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    t.lineitem
      .filter(col("l_quantity") >= 45 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")
  }

  // ----------------------------------------------------------- aggregation

  /** A — grouped aggregation (TPC-H Q1 shape): partial+final hash agg. */
  val q02AggPricing: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    t.lineitem
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp_ntz"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sumMoney(col("l_quantity")).as("sum_qty"),
        sumMoney(col("l_extendedprice")).as("sum_base_price"),
        sumMoney(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  // ----------------------------------------------------------------- joins

  /** J2 — broadcast dimension chain: fact scanned once, zero fact shuffles
    * until the tiny group-by. */
  val q03RegionRevenue: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    t.lineitem
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(
        sumMoney(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name")
  }

  /** J1 + X9 — multi-source full-outer join with suffix collision handling
    * and null-coalescing repair (the reference's spi⟗bi merge,
    * `/root/reference/down/down_water_prep.py:296,307-313`). */
  val q04OuterSuffixRepair: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    val sup = t.supplier
      .filter(col("s_suppkey") % 3 === 0) // create one-sided rows for the outer join
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_sup"), sumMoney(col("s_acctbal")).as("total_bal"))
    val cust = t.customer
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_cust"), sumMoney(col("c_acctbal")).as("total_bal"))
    val joined = joinWithSuffixes(sup, cust, Seq("nationkey"), "full_outer")
    coalesceRepair(joined, Seq("total_bal"))
      .select("nationkey", "n_sup", "n_cust", "total_bal")
      .orderBy("nationkey")
  }

  /** J3 — hierarchical enrichment cascade on the star schema: orders carry a
    * derived (mostly wrong) nation guess; level 1 joins [custkey, nkey],
    * level 2 falls back to [custkey]. Single fact pass, two broadcast
    * joins — see [[graft.operators.Relational.hierarchicalEnrich]]. */
  val q05HierarchicalEnrich: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    val data = t.orders.select(
      col("o_orderkey"),
      col("o_custkey").as("custkey"),
      (col("o_orderkey") % 25).cast("int").as("nkey"),
      col("o_totalprice"))
    val dim = t.customer.select(
      col("c_custkey").as("custkey"),
      col("c_nationkey").as("nkey"),
      col("c_name"),
      col("c_acctbal"))
    hierarchicalEnrich(
      data, dim,
      keyLevels = Seq(Seq("custkey", "nkey"), Seq("custkey")),
      payloadCols = Seq("c_name", "c_acctbal"),
      dimOrder = Seq(col("c_acctbal").desc, col("c_name")))
      .select("o_orderkey", "custkey", "nkey", "c_name", "c_acctbal", "match_level")
      .orderBy("o_orderkey")
  }

  /** J5 — deterministic keep-first dedup: top customer per nation by
    * account balance, ties broken by key. One shuffle, no global sort. */
  val q06KeepFirst: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    keepFirst(t.customer, Seq("c_nationkey"), Seq(col("c_acctbal").desc, col("c_custkey")))
      .select("c_nationkey", "c_custkey", "c_name", "c_acctbal")
      .orderBy("c_nationkey")
  }

  /** F2/U2 — anti-join (the reference's null-split idiom done natively):
    * customers with no urgent order, per market segment. */
  val q07AntiJoin: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    t.customer
      .join(
        t.orders.filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"), sumMoney(col("c_acctbal")).as("total_bal"))
      .orderBy("c_mktsegment")
  }

  /** P6 — key mirroring via explode (reference copies + unions the table,
    * `/root/reference/direct/direct_water_prep.py:107-119`; one pass here). */
  val q08KeyMirror: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    keyMirror(t.lineitem, "entity_key", Seq(col("l_partkey"), col("l_suppkey")))
      .groupBy((col("entity_key") % 1000).as("key_bucket"))
      .agg(count(lit(1)).as("n"), sumMoney(col("l_quantity")).as("qty"))
      .orderBy("key_bucket")
  }

  val all: Map[String, Q] = Map(
    "q01_pruned_scan" -> q01PrunedScan,
    "q02_agg_pricing" -> q02AggPricing,
    "q03_region_revenue" -> q03RegionRevenue,
    "q04_outer_suffix_repair" -> q04OuterSuffixRepair,
    "q05_hierarchical_enrich" -> q05HierarchicalEnrich,
    "q06_keep_first" -> q06KeepFirst,
    "q07_anti_join" -> q07AntiJoin,
    "q08_key_mirror" -> q08KeyMirror)

  val oracle: Map[String, String] = Map(
    "q01_pruned_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity >= 45 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q02_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q03_region_revenue" ->
      """SELECT r_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q04_outer_suffix_repair" ->
      """WITH sup AS (
        |  SELECT s_nationkey AS nationkey, COUNT(*) AS n_sup,
        |         CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |  FROM supplier WHERE s_suppkey % 3 = 0 GROUP BY s_nationkey),
        |cust AS (
        |  SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust,
        |         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |  FROM customer GROUP BY c_nationkey)
        |SELECT COALESCE(sup.nationkey, cust.nationkey) AS nationkey, n_sup, n_cust,
        |       COALESCE(sup.total_bal, cust.total_bal) AS total_bal
        |FROM sup FULL OUTER JOIN cust ON sup.nationkey = cust.nationkey
        |ORDER BY nationkey""".stripMargin,
    "q05_hierarchical_enrich" ->
      """WITH data AS (
        |  SELECT o_orderkey, o_custkey AS custkey,
        |         CAST(o_orderkey % 25 AS INT) AS nkey, o_totalprice
        |  FROM orders),
        |d1 AS (SELECT c_custkey AS custkey, c_nationkey AS nkey, c_name, c_acctbal FROM customer),
        |d2 AS (SELECT c_custkey AS custkey, c_name, c_acctbal FROM customer)
        |SELECT data.o_orderkey, data.custkey, data.nkey,
        |       COALESCE(d1.c_name, d2.c_name) AS c_name,
        |       COALESCE(d1.c_acctbal, d2.c_acctbal) AS c_acctbal,
        |       CASE WHEN d1.custkey IS NOT NULL THEN 1
        |            WHEN d2.custkey IS NOT NULL THEN 2 END AS match_level
        |FROM data
        |LEFT JOIN d1 ON data.custkey = d1.custkey AND data.nkey = d1.nkey
        |LEFT JOIN d2 ON data.custkey = d2.custkey
        |ORDER BY data.o_orderkey""".stripMargin,
    "q06_keep_first" ->
      """SELECT c_nationkey, c_custkey, c_name, c_acctbal FROM (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer) WHERE rn = 1
        |ORDER BY c_nationkey""".stripMargin,
    "q07_anti_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer WHERE NOT EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q08_key_mirror" ->
      """SELECT entity_key % 1000 AS key_bucket, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM (
        |  SELECT l_partkey AS entity_key, l_quantity FROM lineitem
        |  UNION ALL
        |  SELECT l_suppkey AS entity_key, l_quantity FROM lineitem)
        |GROUP BY key_bucket ORDER BY key_bucket""".stripMargin)
}

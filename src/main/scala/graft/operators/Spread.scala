package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Physical-parallelism valve for expression-heavy work over NARROW
  * scans (r18 optimization round; guide §2.2/§2.5/§6).
  *
  * The bench corpus tables are single small parquet files, and a
  * single-row-group file is ONE input split no matter what
  * `spark.sql.files.maxPartitionBytes` says — so every per-row
  * expression downstream of such a scan (FLAC/PNG/BMP/GIF codecs,
  * z-order interleaves, row-hash checksums, tokenization) runs in one
  * task while the other 31 cores idle; the affected bench cells sat at
  * cpu/wall ≈ 1.0. At production scale the same operators read
  * thousands of splits and none of this applies.
  *
  * [[byKey]] widens a relation to the session's core count with one
  * HASH exchange on a caller-named high-cardinality key — and only
  * WIDENS: an input already at or above the target passes through
  * untouched, so on a wide production scan this is a no-op decision,
  * never a shrink. Keyed (not round-robin) deliberately, measured in
  * SpreadStudy on the checksum/z-order shapes: round-robin's
  * sort-before-repartition (SPARK-23207) plus full-row binary
  * comparison cost ~2× the serial CPU, while the hash exchange costs
  * a fraction of it AND is retry-deterministic by construction; with
  * ≫ numPartitions distinct key values the spread is even (§2.5). The
  * exchange moves the narrow base rows once, BEFORE the heavy
  * expressions materialize any derived bytes (§2.3: shuffle the proxy,
  * not the payload). Every consumer in this repo is order-insensitive
  * (aggregations or a final ORDER BY), so results are bit-identical.
  */
object Spread {

  /** Widen `df` to `defaultParallelism / widthDivisor` partitions by
    * hashing `key`, if — and only if — it currently plans narrower.
    * `key` must be high-cardinality relative to the core count (ids,
    * not enums).
    *
    * `widthDivisor` is shape-tuned BY MEASUREMENT (SpreadStudy3/4
    * sweeps at 1/4/8/16/32 partitions, OPTIMIZATION_r18.md): pure
    * per-row codec/synthesis stages scale to full machine width, but
    * stages whose downstream machinery multiplies rows (exploded span
    * aggregations) or aggregates per partition (multi-facet profile
    * sorts) pay a per-partition CPU tax that overtakes the wall gain
    * past half width — those callers pass 2. Relative to the session
    * core count, never absolute, so the driver's lower-core bench runs
    * and a real cluster scale the same rule. */
  def byKey(df: DataFrame, key: String, widthDivisor: Int = 1): DataFrame = {
    val target = math.max(2,
      df.sparkSession.sparkContext.defaultParallelism / widthDivisor)
    // Probe the current width ONLY on scan-shaped plans (leaf +
    // projections/filters): there `.rdd.getNumPartitions` is pure
    // planning. On any plan containing a shuffle/join/aggregate, AQE
    // wraps the query and `.rdd` EXECUTES the upstream stages — whose
    // results the repartition below would not reuse (separate
    // QueryExecution): a silent double execution (r19, advisor
    // finding). Such plans skip the probe and pass through unchanged —
    // their width is already the session's shuffle parallelism, i.e.
    // machine width, which is exactly the no-op case.
    if (!scanShaped(df)) df
    else if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, col(key))
  }

  /** True when `df`'s optimized plan is a leaf under projections and
    * filters only — the shape where planning the RDD cannot trigger
    * execution. */
  private def scanShaped(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, Project}
    df.queryExecution.optimizedPlan.collectFirst {
      case p if !p.isInstanceOf[Project] && !p.isInstanceOf[Filter] &&
        !p.isInstanceOf[LeafNode] => p
    }.isEmpty
  }
}

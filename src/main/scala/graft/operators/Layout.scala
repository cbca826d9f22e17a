package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, max, min}

/** Bucketed physical layout: pay a key's shuffle ONCE at write time,
  * then join and aggregate on that key shuffle-free forever after.
  *
  * The reference re-merges the same site-keyed tables in every run
  * (`/root/reference/down/down_water_prep.py:296,307` and the 7-key
  * reconciliation at `compare.py:24`) — each merge re-partitions both
  * sides from scratch. At 100 TB that repartition IS the job: a
  * fact⋈fact join shuffles both full tables across the cluster every
  * time the pipeline runs. Bucketing inverts the cost: `bucketedTable`
  * hash-partitions the data into a fixed number of buckets ON DISK
  * (Spark's `bucketBy`, murmur3 on the key — the same hash
  * `HashPartitioning` uses at runtime), so every later equi-join or
  * aggregation on the bucket key reads each bucket as an
  * already-correctly-partitioned task: `SortMergeJoin` with ZERO
  * `Exchange` on either side, and a same-key `groupBy` downstream of
  * the join needs no exchange either (`HashPartitioning(key)` satisfies
  * any clustering that contains the key). `PlanShapeSpec` asserts both.
  *
  * Scale posture:
  *  - `buckets` is the layout's permanent parallelism on this key —
  *    size it like you'd size shuffle partitions for the table's full
  *    volume (100 TB / target ~256 MB per bucket-split ⇒ O(100k)
  *    buckets on a real cluster; 8–32 in the local harness). Both
  *    sides of a co-located join must agree on the bucket count
  *    (Spark joins bucketed tables exchange-free only when counts
  *    match — mismatched counts shuffle the smaller-bucketed side).
  *  - The write `repartition`s by the bucket key first, so each task
  *    writes exactly one file per bucket — without it every write task
  *    spills a file into every bucket (task×bucket small files, the
  *    failure mode `IndexOps.compactTo` exists for) and the per-bucket
  *    `sortBy` metadata becomes unusable (Spark trusts bucket-sortedness
  *    only for single-file buckets; multi-file buckets force a runtime
  *    re-sort under the join).
  *  - In-bucket `sortBy(key)` makes the sort side of every later
  *    SortMergeJoin free as well: the scan emits rows already in key
  *    order, so the join's required ordering is satisfied from disk.
  */
object Layout {

  /** Catalog-safe deterministic table name for a dataset rooted at
    * `srcDir` — re-running a query against the same directory reuses
    * (overwrites) its own table instead of colliding with other SFs'.
    */
  def tableName(prefix: String, srcDir: String): String =
    "graft_" + prefix + "_" +
      srcDir.toLowerCase.replaceAll("[^a-z0-9]+", "_").replaceAll("^_+|_+$", "")

  /** Write `df` as a managed parquet table bucketed (and in-bucket
    * sorted) by `bucketCols`, replacing any previous incarnation, and
    * return the table name. The leftover warehouse directory of a
    * PREVIOUS session's table is deleted explicitly: the in-memory
    * catalog forgets tables across sessions but their files persist,
    * and a create-over-leftovers would union stale buckets into reads.
    *
    * A layout is write-once BY DESIGN — its whole economics is paying
    * the key's shuffle at write time and joining shuffle-free forever
    * after — so a repeat call with the SAME definition over UNCHANGED
    * source files reuses the existing table instead of rebuilding it.
    * Reuse requires all of: the table still exists in this session's
    * catalog, the layout definition (bucket/sort columns, bucket
    * count, the dataframe's semantic plan) is identical, and every
    * source directory's mtime is unchanged — a regenerated source, a
    * different projection, or a re-bucketing all rebuild. This is the
    * production amortization argument made literal: in a bench run,
    * the cold pass pays the build and the warm pass measures the
    * exchange-free join the layout exists for. */
  def bucketedTable(
      spark: SparkSession,
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      buckets: Int,
      sortCols: Seq[String] = Nil): String = {
    require(bucketCols.nonEmpty, "bucketedTable needs at least one bucket column")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val sorts = if (sortCols.nonEmpty) sortCols else bucketCols
    val token = layoutToken(spark, df, bucketCols, buckets, sortCols)
    if (token.nonEmpty && layoutMemo.get(table).contains(token) &&
        catalogLayoutMatches(spark, table, bucketCols, buckets, sorts))
      return table
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = new Path(spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    import org.apache.spark.sql.functions.col
    df.repartition(buckets, bucketCols.map(col): _*)
      .write
      .format("parquet")
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sorts.head, sorts.tail: _*)
      .saveAsTable(table)
    if (token.nonEmpty) layoutMemo.put(table, token) else layoutMemo.remove(table)
    table
  }

  /** The memo's reuse fast path must not trust bare catalog existence:
    * a table dropped and recreated OUTSIDE bucketedTable (direct SQL,
    * or another session in the same JVM pointing at a different
    * warehouse) leaves the process-global memo entry stale while
    * `tableExists` stays true — the reused table's actual bucket spec
    * would then silently mismatch the requested layout (and the
    * exchange-free join it promises). Validate the catalog's REAL
    * bucket spec against the request before reusing; any metadata
    * hiccup falls through to a rebuild, never a blind reuse. */
  private def catalogLayoutMatches(spark: SparkSession, table: String,
      bucketCols: Seq[String], buckets: Int, sorts: Seq[String]): Boolean =
    spark.catalog.tableExists(table) && {
      import org.apache.spark.sql.catalyst.TableIdentifier
      try {
        val meta = spark.sessionState.catalog.getTableMetadata(TableIdentifier(table))
        meta.bucketSpec.exists(bs =>
          bs.numBuckets == buckets &&
            bs.bucketColumnNames.map(_.toLowerCase) == bucketCols.map(_.toLowerCase) &&
            bs.sortColumnNames.map(_.toLowerCase) == sorts.map(_.toLowerCase))
      } catch { case _: Throwable => false }
    }

  /** What must be identical for a built layout to be reused: the
    * layout spec, the dataframe's semantic plan, and the source
    * directories with their mtime + file count + total bytes (the
    * [[IndexStamp]] freshness discipline — mtime alone misses a
    * same-tick rewrite; one listStatus per directory). Empty for a
    * non-file-backed df: nothing stable to key reuse on, always
    * rebuild. */
  private def layoutToken(spark: SparkSession, df: DataFrame,
      bucketCols: Seq[String], buckets: Int, sortCols: Seq[String]): String = {
    val files = df.inputFiles
    if (files.isEmpty) ""
    else {
      val conf = spark.sparkContext.hadoopConfiguration
      val dirs = files.map(f => new Path(f).getParent).distinct
        .map { d =>
          val fs = d.getFileSystem(conf)
          val mtime = fs.getFileStatus(d).getModificationTime
          val kids = fs.listStatus(d)
          s"$d@$mtime#${kids.length}#${kids.map(_.getLen).sum}"
        }
        .sorted.mkString("|")
      s"$buckets/${bucketCols.mkString(",")}/${sortCols.mkString(",")}/" +
        s"${df.queryExecution.analyzed.semanticHash()}/$dirs"
    }
  }

  private val layoutMemo =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Equi-join two co-bucketed tables exchange-free. The `merge` hint
    * pins SortMergeJoin — without it the planner may pick a broadcast
    * join at test SF, which is exactly the plan that does NOT survive a
    * fact⋈fact 100 TB scale-up; with it, the bucketed scans' matching
    * `HashPartitioning` satisfies the join's distribution on both sides
    * and no Exchange is planned. (AQE preserves user join hints, so the
    * runtime re-plan cannot demote the co-located join either.)
    */
  /** Write `df` Z-ORDER clustered on two long columns: rows sort by the
    * Morton interleave of their order-preserving 16-bit bucket
    * coordinates ([[graft.functions.ZOrder]]), range-partitioned into
    * `ceil(rows / targetRowsPerFile)` files. Each parquet row group
    * then covers a RECTANGLE-ish region of the (c1, c2) plane, so its
    * min/max stats are selective for predicates on c1, on c2, or on
    * both — where a single-column sort serves only its own column. The
    * 100 TB read path this buys: a box query (`c1 BETWEEN … AND c2
    * BETWEEN …`) row-group-prunes on BOTH dimensions from one layout,
    * no second copy of the data sorted the other way.
    *
    * Runs one min/max agg over the two columns (two driver scalars —
    * the bucket scaling must be a pure, oracle-reproducible function of
    * the data), then the clustered write. The z key is materialized as
    * `zval` so consumers and specs can see the clustering; drop it on
    * read if unwanted. Returns (loC1, hiC1, loC2, hiC2) so callers can
    * recompute bucket coordinates for probe-side pruning keys. */
  def zorderedWrite(spark: SparkSession, df: DataFrame,
      c1: String, c2: String, dir: String,
      targetRowsPerFile: Long = 4L * 1000 * 1000): (Long, Long, Long, Long) = {
    import graft.functions.ZOrder
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    val r = df.agg(
      min(col(c1).cast("long")), max(col(c1).cast("long")),
      min(col(c2).cast("long")), max(col(c2).cast("long")),
      count(lit(1))).collect()(0)
    require(!r.isNullAt(0) && !r.isNullAt(2),
      s"zorderedWrite: $c1/$c2 are all-null or $dir input is empty")
    val (lo1, hi1, lo2, hi2) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val rows = r.getLong(4)
    val numFiles = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    df.withColumn("zval", ZOrder.zorder2(
        ZOrder.bucket16(col(c1).cast("long"), lo1, hi1),
        ZOrder.bucket16(col(c2).cast("long"), lo2, hi2)))
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions("zval")
      .write.mode(SaveMode.Overwrite).parquet(dir)
    (lo1, hi1, lo2, hi2)
  }

  /** Read a [[zorderedWrite]] layout pruned to a `(c1, c2)` box:
    * applies the RAW dimension predicates and lets parquet row-group
    * min/max stats do the pruning. The z-clustered layout makes each
    * row group cover a rectangle-ish region of the plane, so those
    * stats are selective in BOTH dimensions — which is the entire
    * point of the layout. No z-value arithmetic appears on the probe
    * side (deriving z-ranges for a box is the classic BIGMIN
    * refinement, but the raw-dimension stats already deliver the
    * pruning the study measured, with zero coupling to the write-time
    * bucket scaling). Bounds are optional per side, so the study's
    * three shapes — box, c1-only, c2-only — all read through this one
    * helper.
    *
    * ROUTING RULE, measured at sf1 (SCALING.md r11 "Z-order layout":
    * 6M rows, 120 files, each dim 1/8-selective): the z layout serves
    * both dimensions from ONE copy — 5.1× fewer rows scanned and 3.0×
    * less CPU on the dimension a 1-D sort cannot prune at all — and
    * pays ~1.9× rows / +12% CPU against the 1-D sort on that sort's
    * own column (each dimension keeps 16 of its 32 resolution bits).
    * Route: one dominant filter dimension → sort by it and filter
    * directly; two (or rotating) dimensions → z-order and read through
    * here. The ratio improves toward the box interior's share as row
    * groups shrink relative to the table (boundary row groups dominate
    * small fixtures). */
  def zorderScan(spark: SparkSession, dir: String, c1: String, c2: String,
      c1Lo: Option[Long] = None, c1Hi: Option[Long] = None,
      c2Lo: Option[Long] = None, c2Hi: Option[Long] = None): DataFrame = {
    val preds: Seq[Column] = Seq(
      c1Lo.map(v => col(c1) >= v), c1Hi.map(v => col(c1) <= v),
      c2Lo.map(v => col(c2) >= v), c2Hi.map(v => col(c2) <= v)).flatten
    preds.foldLeft(spark.read.parquet(dir))((df, p) => df.filter(p))
  }

  /** [[zorderedWrite]] at THREE dimensions ([[graft.functions.ZOrder
    * .zorder3]], 21 bits per dimension): the (time, lat, lon)-style
    * layout — one copy of the data whose row-group stats prune box
    * predicates on any subset of the three columns. Same contract
    * otherwise (one min/max agg for the scaling, clustered ranged
    * write, `zval` materialized, bounds returned). The resolution
    * trade vs 2-D: each dimension keeps 21 of 63 key bits — MORE
    * per-dimension resolution than zorder2's 16, at 3× the covered
    * dimensions; the real cost of adding a dimension is that each
    * row group's covered box grows a third side, so per-dimension
    * pruning selectivity at equal file counts is weaker (the q92-style
    * routing rule applies: dominant single filter dimension → 1-D
    * sort; two or three rotating dimensions → z-order). */
  def zorderedWrite3(spark: SparkSession, df: DataFrame,
      c1: String, c2: String, c3: String, dir: String,
      targetRowsPerFile: Long = 4L * 1000 * 1000): (Long, Long, Long, Long, Long, Long) = {
    import graft.functions.ZOrder
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    val r = df.agg(
      min(col(c1).cast("long")), max(col(c1).cast("long")),
      min(col(c2).cast("long")), max(col(c2).cast("long")),
      min(col(c3).cast("long")), max(col(c3).cast("long")),
      count(lit(1))).collect()(0)
    require(!r.isNullAt(0) && !r.isNullAt(2) && !r.isNullAt(4),
      s"zorderedWrite3: $c1/$c2/$c3 are all-null or $dir input is empty")
    val (lo1, hi1) = (r.getLong(0), r.getLong(1))
    val (lo2, hi2) = (r.getLong(2), r.getLong(3))
    val (lo3, hi3) = (r.getLong(4), r.getLong(5))
    val rows = r.getLong(6)
    val numFiles = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    df.withColumn("zval", ZOrder.zorder3(
        ZOrder.bucket21(col(c1).cast("long"), lo1, hi1),
        ZOrder.bucket21(col(c2).cast("long"), lo2, hi2),
        ZOrder.bucket21(col(c3).cast("long"), lo3, hi3)))
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions("zval")
      .write.mode(SaveMode.Overwrite).parquet(dir)
    (lo1, hi1, lo2, hi2, lo3, hi3)
  }

  /** Probe-side reader for a [[zorderedWrite3]] layout — raw-dimension
    * predicates only, any subset of the three sides bounded, row-group
    * stats do the pruning ([[zorderScan]]'s contract at 3-D). */
  def zorderScan3(spark: SparkSession, dir: String,
      c1: String, c2: String, c3: String,
      c1Lo: Option[Long] = None, c1Hi: Option[Long] = None,
      c2Lo: Option[Long] = None, c2Hi: Option[Long] = None,
      c3Lo: Option[Long] = None, c3Hi: Option[Long] = None): DataFrame = {
    val preds: Seq[Column] = Seq(
      c1Lo.map(v => col(c1) >= v), c1Hi.map(v => col(c1) <= v),
      c2Lo.map(v => col(c2) >= v), c2Hi.map(v => col(c2) <= v),
      c3Lo.map(v => col(c3) >= v), c3Hi.map(v => col(c3) <= v)).flatten
    preds.foldLeft(spark.read.parquet(dir))((df, p) => df.filter(p))
  }

  def coLocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      condition: Column,
      joinType: String = "inner"): DataFrame =
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable).hint("merge"), condition, joinType)
}

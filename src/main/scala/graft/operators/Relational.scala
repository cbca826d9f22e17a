package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operators of the engine (SURVEY.md §2).
  *
  * Everything here composes Spark built-ins — no RDDs, no UDFs — so each
  * operator stays a declarative Catalyst plan: predicate pushdown, column
  * pruning, broadcast selection and AQE all apply to the composed plan
  * exactly as to hand-written DataFrame code.
  */
object Relational {

  /** J1 — multi-key join with pandas-style suffix handling.
    *
    * The reference relies on pandas `merge(..., suffixes=('', '_y'))`
    * (`/root/reference/down/down_water_prep.py:296`). Spark errors on
    * ambiguous columns instead, so colliding non-key columns of `right`
    * are deterministically renamed `<name><suffix>` before the join.
    */
  def joinWithSuffixes(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      how: String = "full_outer",
      suffix: String = "_y"): DataFrame = {
    val collisions = right.columns.toSet.intersect(left.columns.toSet) -- keys
    val r = collisions.foldLeft(right)((d, c) => d.withColumnRenamed(c, c + suffix))
    left.join(r, keys, how)
  }

  /** J5 — deterministic keep-first dedup: one survivor per key group,
    * chosen by `order` (the reference's `sort_values(...).drop_duplicates`,
    * `/root/reference/down/down_water_prep.py:497-501`).
    *
    * Implemented as a window `row_number`, which Spark executes as a single
    * hash-shuffle on `keys` + per-partition sort — no global sort, unlike a
    * literal translation of sort-then-dedup. `order` must be a total order
    * within each group for the survivor to be deterministic (the unsorted
    * reference variant `direct/direct_water_prep.py:130` is
    * arbitrary-survivor; pass an explicit tiebreak instead).
    */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** X9 — null-coalescing column repair after an outer join: for each base
    * column, fill nulls from its suffixed twin, then drop the twin
    * (`/root/reference/down/down_water_prep.py:307-313`). */
  def coalesceRepair(df: DataFrame, baseCols: Seq[String], suffix: String = "_y"): DataFrame =
    baseCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, coalesce(col(c), col(c + suffix))).drop(c + suffix)
    }

  /** P6 — key mirroring: expose a row under several alternative join keys.
    * The reference copies the whole table once per key and unions
    * (`/root/reference/direct/direct_water_prep.py:107-119`); here it is a
    * single-pass `explode` — no self-union, no second scan.
    */
  def keyMirror(df: DataFrame, outKey: String, keySources: Seq[Column]): DataFrame =
    df.withColumn(outKey, explode(array(keySources: _*)))

  /** U1 — union of heterogeneous strata by column name, padding columns
    * missing on either side with nulls (the reference's post-cascade
    * concat, `/root/reference/down/down_water_prep.py:531-532`). */
  def unionStrata(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** J3/J4 — hierarchical enrichment cascade (the reference's signature
    * operator, `/root/reference/down/down_water_prep.py:428-546` and the
    * 2-level variant `direct/direct_water_prep.py:134-166`).
    *
    * Semantics: try to enrich each `data` row with `dim`'s payload at the
    * most specific key level; rows that miss fall through to the next,
    * coarser level; every input row appears exactly once in the output
    * (row-conservation gate G3) unless `dropUnmatched`.
    *
    * Scale design — this deliberately does NOT mirror the reference's
    * three-pass join/split/union shape. Each key level's dimension is
    * 1:1-ified with [[keepFirst]], then ALL levels join in one pass over
    * the fact table (left join per level, match precedence enforced by a
    * first-hit CASE over the per-level match markers). With
    * reference-sized dims every join is a broadcast hash join: the 100 TB
    * fact table is scanned once, shuffle-free, instead of 3 passes + 2
    * re-filters. Equivalence with the sequential cascade holds because
    * each per-level dim is unique on its keys (no fan-out) and payloads
    * are gated on the level's hit marker, so a row matched at level k is
    * never re-enriched at k+1 — even when the level-k payload value is
    * genuinely NULL in the dimension.
    *
    * @param data       fact rows to enrich
    * @param dim        dimension carrying `payloadCols`
    * @param keyLevels  key lists, most specific first; names must exist in both frames
    * @param payloadCols dimension columns to attach
    * @param dimOrder   total order choosing the per-key survivor inside `dim`
    * @param dropUnmatched J4 semantics: drop rows that miss at every level
    * @param hintBroadcast force a broadcast hint on every level dim. Leave
    *        false (the default) to let AQE / autoBroadcastJoinThreshold
    *        choose — a dimension past the 8 GB broadcast limit then falls
    *        back to a shuffle join instead of failing the job.
    */
  def hierarchicalEnrich(
      data: DataFrame,
      dim: DataFrame,
      keyLevels: Seq[Seq[String]],
      payloadCols: Seq[String],
      dimOrder: Seq[Column],
      dropUnmatched: Boolean = false,
      levelColName: String = "match_level",
      hintBroadcast: Boolean = false): DataFrame = {

    require(keyLevels.nonEmpty, "at least one key level")

    // One deduped, suffixed dimension per level: keys + payload_L<i> + marker.
    // keepFirst runs on the full dim so dimOrder may reference non-payload
    // columns; Catalyst's ColumnPruning drops everything the window and the
    // projection don't need.
    val levelDims = keyLevels.zipWithIndex.map { case (keys, i) =>
      val slim = keepFirst(dim, keys, dimOrder)
        .select((keys ++ payloadCols).distinct.map(col): _*)
      val suffixed = payloadCols.foldLeft(slim)((d, c) => d.withColumnRenamed(c, s"__${c}_L$i"))
      keys -> suffixed.withColumn(s"__hit_L$i", lit(true))
    }

    // Single pass: chain of left joins, then per-payload first-hit CASE in
    // level order (hit markers, not payload nullness, decide the level).
    val joined = levelDims.foldLeft(data) { case (acc, (keys, d)) =>
      acc.join(if (hintBroadcast) broadcast(d) else d, keys, "left")
    }

    val repaired = payloadCols.foldLeft(joined) { (d, c) =>
      val firstHit = keyLevels.indices
        .map(i => when(col(s"__hit_L$i"), col(s"__${c}_L$i")))
        .reduceRight((a, b) => a.otherwise(b))
      d.withColumn(c, firstHit)
    }

    val levelExpr = keyLevels.indices.foldRight(lit(null).cast("int")) { (i, rest) =>
      when(col(s"__hit_L$i"), lit(i + 1)).otherwise(rest)
    }

    val out = repaired
      .withColumn(levelColName, levelExpr)
      .drop(keyLevels.indices.flatMap(i => payloadCols.map(c => s"__${c}_L$i") :+ s"__hit_L$i"): _*)

    if (dropUnmatched) out.filter(col(levelColName).isNotNull) else out
  }
}

package graft.operators

import org.apache.spark.sql.Column

import graft.functions.{HllEstimate, HllMergeAgg, HllSketchAgg}

/** Mergeable cardinality sketches — the rollup layer's distinct-count
  * primitive (see [[graft.functions.HllSketch]] for the register and
  * determinism contract). The workflow at 100 TB:
  *
  *   1. one pass over raw data per grain → `hllSketch(h60(key), p)`
  *      persisted alongside the rollup's other aggregates;
  *   2. any coarser grain → `hllMerge(sketch)` over the persisted rows
  *      (exact HLL union — never re-reads raw data);
  *   3. `hllEstimate(sketch)` wherever a number is needed.
  *
  * Spark's own `approx_count_distinct` answers (3) only — its state
  * dies inside the aggregation, which is exactly what makes daily →
  * monthly distinct rollups impossible without a re-scan. */
object Sketch {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Build a 2^p-register HLL sketch (`array<int>`) from a 60-bit
    * portable hash column ([[graft.functions.Hashing.h60]]). */
  def hllSketch(hash: Column, p: Int): Column =
    ColumnBridge.column(HllSketchAgg(
      ColumnBridge.expression(hash),
      org.apache.spark.sql.catalyst.expressions.Literal(p)).toAggregateExpression())

  /** Union persisted sketches by element-wise max — exact, associative,
    * loud on width mismatch. */
  def hllMerge(sketch: Column): Column =
    ColumnBridge.column(HllMergeAgg(
      ColumnBridge.expression(sketch)).toAggregateExpression())

  /** The standard corrected HLL estimate of a sketch (double). */
  def hllEstimate(sketch: Column): Column =
    ColumnBridge.column(HllEstimate(ColumnBridge.expression(sketch)))

  /** Build a depth×width Count-Min frequency sketch (`array<long>`,
    * row-major) from a 60-bit portable hash column — the heavy-hitter
    * sibling of [[hllSketch]], integer end to end. */
  def cmsSketch(hash: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(graft.functions.CmsSketchAgg(
      ColumnBridge.expression(hash),
      org.apache.spark.sql.catalyst.expressions.Literal(depth),
      org.apache.spark.sql.catalyst.expressions.Literal(width))
      .toAggregateExpression())

  /** Sum persisted Count-Min sketches element-wise — exact,
    * associative, loud on size mismatch. */
  def cmsMerge(sketch: Column): Column =
    ColumnBridge.column(graft.functions.CmsMergeAgg(
      ColumnBridge.expression(sketch)).toAggregateExpression())

  /** Count-Min point estimate (min over rows; ≥ the true count). */
  def cmsQuery(sketch: Column, hash: Column, depth: Int): Column =
    ColumnBridge.column(graft.functions.CmsQuery(
      ColumnBridge.expression(sketch), ColumnBridge.expression(hash), depth))
}

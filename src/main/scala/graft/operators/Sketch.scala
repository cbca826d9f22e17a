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

  /** Build a bottom-k KMV sketch (`array<bigint>`, sorted) from a
    * 60-bit portable hash column — the coordinated-sample sibling of
    * [[hllSketch]] that additionally answers SET RESEMBLANCE from
    * persisted sketches ([[graft.functions.KmvSketch]]). */
  def kmvSketch(hash: Column, k: Int): Column =
    ColumnBridge.column(graft.functions.KmvSketchAgg(
      ColumnBridge.expression(hash),
      org.apache.spark.sql.catalyst.expressions.Literal(k)).toAggregateExpression())

  /** Union persisted KMV sketches — bottom-k of the union of
    * bottom-k's (exact); loud when an input is longer than `k`. */
  def kmvMerge(sketch: Column, k: Int): Column =
    ColumnBridge.column(graft.functions.KmvMergeAgg(
      ColumnBridge.expression(sketch),
      org.apache.spark.sql.catalyst.expressions.Literal(k)).toAggregateExpression())

  /** KMV distinct estimate (bigint — exact below k entries, 128-bit
    * integer floor arithmetic at k; oracle-replayable term-exactly). */
  def kmvEstimate(sketch: Column, k: Int): Column =
    ColumnBridge.column(graft.functions.KmvEstimate(
      ColumnBridge.expression(sketch),
      org.apache.spark.sql.catalyst.expressions.Literal(k)))

  /** Jaccard estimate between the sets behind two KMV sketches, in
    * permille (bigint; exact when both sets are smaller than k). */
  def kmvResemblancePermille(a: Column, b: Column, k: Int): Column =
    ColumnBridge.column(graft.functions.KmvResemblancePermille(
      ColumnBridge.expression(a), ColumnBridge.expression(b),
      org.apache.spark.sql.catalyst.expressions.Literal(k)))

  /** Build an m-bit Bloom filter with k affine probes (`array<bigint>`
    * of 32-bit words) from a 60-bit portable hash column — the
    * membership sketch; per-shard filters are the data-skipping /
    * takedown-pre-screen primitive ([[graft.functions.BloomSketch]]). */
  def bloomSketch(hash: Column, m: Int, k: Int): Column =
    ColumnBridge.column(graft.functions.BloomSketchAgg(
      ColumnBridge.expression(hash),
      org.apache.spark.sql.catalyst.expressions.Literal(m),
      org.apache.spark.sql.catalyst.expressions.Literal(k)).toAggregateExpression())

  /** Union persisted Bloom filters by element-wise OR — exact,
    * associative, loud on width mismatch. */
  def bloomMerge(filter: Column): Column =
    ColumnBridge.column(graft.functions.BloomMergeAgg(
      ColumnBridge.expression(filter)).toAggregateExpression())

  /** Membership probe: true iff all k bits are set (no false
    * negatives ever; false positives replay oracle-exactly). */
  def bloomMightContain(filter: Column, hash: Column, k: Int): Column =
    ColumnBridge.column(graft.functions.BloomMightContain(
      ColumnBridge.expression(filter), ColumnBridge.expression(hash),
      org.apache.spark.sql.catalyst.expressions.Literal(k)))

  /** Build an n-bucket equi-width histogram of a LONG measure over
    * [lo, lo + n·width) (`array<bigint>`; out-of-range clamps into the
    * edge buckets) — the mergeable QUANTILE sketch
    * ([[graft.functions.HistSketch]]). */
  def histSketch(value: Column, lo: Long, width: Long, nBuckets: Int): Column =
    ColumnBridge.column(graft.functions.HistSketchAgg(
      ColumnBridge.expression(value),
      org.apache.spark.sql.catalyst.expressions.Literal(lo),
      org.apache.spark.sql.catalyst.expressions.Literal(width),
      org.apache.spark.sql.catalyst.expressions.Literal(nBuckets))
      .toAggregateExpression())

  /** Sum persisted histograms element-wise — histograms are linear, so
    * this is EXACTLY [[cmsMerge]] (one merge implementation, one set of
    * overflow and width-mismatch contracts). */
  def histMerge(sketch: Column): Column = cmsMerge(sketch)

  /** The p-permille bucket of a histogram: smallest bucket index with
    * 1000·cumsum ≥ permille·total (int; null for an all-zero or
    * malformed histogram). Multiplication-only rank arithmetic — exact
    * and oracle-replayable. The bucket's value range is
    * [lo + idx·width, lo + (idx+1)·width). */
  def histQuantileBucket(counts: Column, permille: Int): Column =
    ColumnBridge.column(graft.functions.HistQuantileBucket(
      ColumnBridge.expression(counts),
      org.apache.spark.sql.catalyst.expressions.Literal(permille)))
}

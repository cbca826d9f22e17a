package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy string matching — the entity-resolution primitive
  * (dirty-name reconciliation, near-identical record linkage) built the
  * only way it survives scale: candidate pairs come from EQUALITY blocks
  * (never an all-pairs cross), and only candidates pay the edit-distance
  * verify. The classic segment-blocking scheme from the approximate-
  * string-join literature (pigeonhole over disjoint substring segments):
  * split the blocking string into `nSegments` disjoint segments; two
  * strings within substitution distance ≤ nSegments−1 (equal lengths)
  * must agree on at least one whole segment, so the union of per-segment
  * equality joins is a COMPLETE candidate set for that regime. General
  * Levenshtein with insertions/deletions shifts segment boundaries, so
  * for mixed-length corpora the blocks are the standard recall-documented
  * approximation (callers pick `blockCol` — e.g. a normalized or reversed
  * form — to put the variation where the segments see it).
  *
  * Scale posture:
  *  - candidates = Σ_blocks |block|² — the quadratic lives per block,
  *    bounded by `maxBlockRows`: blocks larger than the cap are SKIPPED
  *    (a block holding half the corpus discriminates nothing and would
  *    otherwise reintroduce the all-pairs join; same cap discipline as
  *    the LSH `maxBucketRows` and the jaccard doc-frequency cap).
  *  - the verify is the codegen'd `levenshtein` on candidate pairs only.
  *  - output and every intermediate relation is candidate-sized.
  */
object FuzzyMatch {

  /** Self-match: all pairs (a_id < b_id) whose `strCol` values are within
    * Levenshtein `maxDist`, candidates blocked on segments of `blockCol`
    * (default: `strCol` itself). Output `(a_id, b_id, dist)`.
    *
    * Completeness: exact for substitution-only edits ≤ nSegments−1 on
    * equal-length strings whose blockCol preserves positions; otherwise
    * the documented blocking approximation. Oversized blocks
    * (> maxBlockRows) are skipped — they carry no discrimination.
    *
    * Short strings (length(blockCol) < nSegments): EMPTY segments are
    * excluded from blocking — segment 0 is empty for EVERY such string,
    * so the empty block is "all short strings in one bucket", a
    * non-discriminating block that pays |block|² for no positional
    * evidence. The substitution contract still holds: any two
    * EQUAL-length short strings are within length ≤ nSegments−1
    * substitutions by definition, so short strings carry one extra
    * same-length rescue block (seg_idx −1, keyed by length) that makes
    * every equal-length short pair a candidate — content discrimination
    * is impossible there BECAUSE the contract demands all of them.
    * Cross-LENGTH short pairs are the insertion regime, outside the
    * contract like any boundary-shifting edit: they are candidates only
    * when they agree on a positioned non-empty segment. */
  def fuzzyPairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, nSegments: Int = 3,
      blockCol: Option[Column] = None,
      maxBlockRows: Long = 100000L): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(nSegments >= 1, s"nSegments must be >= 1, got $nSegments")
    val base = df.select(col(idCol).as("__id"), col(strCol).as("__s"),
        blockCol.getOrElse(col(strCol)).as("__b"))
      .filter(col("__s").isNotNull && col("__b").isNotNull)
    val posSegs = base.select(col("__id"), col("__s"),
        posexplode(array((0 until nSegments).map(i =>
          expr(s"substr(__b, 1 + ($i * length(__b)) div $nSegments, " +
            s"(($i + 1) * length(__b)) div $nSegments - " +
            s"($i * length(__b)) div $nSegments)")): _*))
          .as(Seq("seg_idx", "seg")))
      .filter(length(col("seg")) > 0)
    val shortRescue = base.filter(length(col("__b")) < nSegments)
      .select(col("__id"), col("__s"), lit(-1).as("seg_idx"),
        concat(lit("L"), length(col("__b"))).as("seg"))
    val segs = posSegs.unionByName(shortRescue)
    // skip non-discriminating oversized blocks BEFORE the self-join —
    // the one aggregation here is (seg_idx, seg)-keyed and block-sized
    val sized = segs.join(
      segs.groupBy("seg_idx", "seg").agg(count(lit(1)).as("__bn"))
        .filter(col("__bn") <= maxBlockRows)
        .select("seg_idx", "seg"),
      Seq("seg_idx", "seg"))
    val cand = sized.as("a").join(sized.as("b"),
        col("a.seg_idx") === col("b.seg_idx") &&
          col("a.seg") === col("b.seg") &&
          col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("a_id"), col("b.__id").as("b_id"),
        col("a.__s").as("__as"), col("b.__s").as("__bs"))
      .distinct()
    cand
      .select(col("a_id"), col("b_id"),
        levenshtein(col("__as"), col("__bs")).cast("long").as("dist"))
      .filter(col("dist") <= maxDist)
  }
}

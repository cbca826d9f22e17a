package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document boilerplate removal (CCNet / RefinedWeb-style
  * line-level dedup): units of text (lines, paragraphs, fixed-width
  * token chunks) that repeat across ≥ `minDocs` DISTINCT documents are
  * template chrome — nav bars, cookie banners, license footers — and
  * are stripped from every document that carries them, preserving the
  * order of what survives.
  *
  * This is the cross-corpus complement of the intra-document repetition
  * facets ([[TrainingData.repetitionFacets]]): those score one document
  * against itself; this relation is global, so it needs a corpus-wide
  * frequency aggregation that no per-row expression can express.
  *
  * 100 TB shape — the corpus text never shuffles through the frequency
  * machinery:
  *   1. one exploded pass → `(unit, doc)` → doc-frequency aggregation
  *      (map-side partial dedup, one shuffle on the unit);
  *   2. the heavy relation (`doc_freq ≥ minDocs`) is by construction a
  *      tiny fraction of distinct units — only exploded rows MATCHING
  *      it survive the inner join and flow onward (grouped to one
  *      per-doc heavy list, bounded by document length);
  *   3. the original rows join that per-doc list on the id (AQE
  *      broadcasts it in the common sparse-boilerplate case) and strip
  *      with an order-preserving array `filter` — no positional
  *      bookkeeping, no rebuild shuffle of the corpus body.
  * The naive alternative — explode the corpus, anti-join, re-assemble
  * with a positional sort — shuffles every byte of text twice; this
  * shape shuffles only the unit-frequency relation and the matches
  * (measured in SCALING.md's BoilerplateStudy).
  *
  * Normalization: a unit's identity is its `trim`; units that are
  * empty after trimming (blank lines, structural separators) are never
  * counted and never stripped. An optional `perCol` (source / domain)
  * scopes the frequency: a line must repeat within the SAME group to
  * count, the per-site form — templates are per-site, and a global
  * count would let two sites' coincidentally-shared line strip both.
  */
object Boilerplate {

  /** Doc-frequency relation: one row per (group,) distinct unit with
    * the count of DISTINCT documents carrying it. Columns:
    * (`perCol`?, `unit`, `doc_freq`). `unit` is the trimmed form. */
  def unitDocFreq(df: DataFrame, idCol: String, unitsCol: Column,
      perCol: Option[String] = None): DataFrame = {
    val ex = exploded(df, idCol, unitsCol, perCol)
    val keys = perCol.toSeq :+ "unit"
    ex.groupBy(keys.map(col): _*)
      .agg(countDistinct(col(idCol)).as("doc_freq"))
  }

  /** The heavy relation [[unitDocFreq]] filters to: units repeated in
    * ≥ `minDocs` distinct documents (the boilerplate candidates). */
  def repeatedUnits(df: DataFrame, idCol: String, unitsCol: Column,
      minDocs: Long, perCol: Option[String] = None): DataFrame = {
    require(minDocs >= 2, s"minDocs must be ≥ 2 (got $minDocs): " +
      "every unit appears in ≥ 1 document, so 1 would strip the corpus")
    unitDocFreq(df, idCol, unitsCol, perCol).filter(col("doc_freq") >= minDocs)
  }

  /** Strip boilerplate units from every document. Returns the input
    * plus `keptCol` (the surviving units, original order), `n_units`
    * (original unit count) and `n_stripped` (OCCURRENCES removed — a
    * heavy unit appearing twice in one document strips both copies).
    *
    * `broadcastHeavy` (default true) pins the heavy relation as the
    * broadcast side of the match join. This is a deliberate, bounded
    * choice, not planner trust: the heavy relation is small BY
    * CONSTRUCTION (units repeating in ≥ minDocs docs — even web-scale
    * line-dedup tables are ~millions of rows), while the exploded
    * corpus side both dwarfs it and — the sharper point — cannot be
    * shuffled on the unit without hitting the skew this operator
    * exists to find: the heavy units ARE the hot keys, so every
    * shuffle-on-unit plan sends each boilerplate line's full
    * occurrence set to one task. Left to the static planner, a
    * Generate's garbage size estimate made it broadcast the EXPLODED
    * CORPUS as the build side at the sf3 study point — locally
    * survivable, fatal at cluster scale. Set false only when the heavy
    * relation genuinely cannot fit an executor: the fallback forces a
    * sort-merge join, which never broadcasts the corpus and lets AQE's
    * skew split carve the hot units' occurrence partitions. */
  def stripRepeatedUnits(df: DataFrame, idCol: String, unitsCol: Column,
      keptCol: String, minDocs: Long, perCol: Option[String] = None,
      broadcastHeavy: Boolean = true): DataFrame =
    stripUnitsIn(df, idCol, unitsCol, keptCol,
      repeatedUnits(df, idCol, unitsCol, minDocs, perCol)
        .select((perCol.toSeq :+ "unit").map(col): _*),
      perCol, broadcastHeavy)

  /** The strip step against an EXTERNALLY-supplied heavy relation
    * (column `unit` = trimmed form, plus `perCol` when scoped) —
    * shared by [[stripRepeatedUnits]] (heavy = this relation's own
    * doc frequencies) and the streaming screen
    * ([[graft.streaming.StreamingIngest.boilerplateScreenStream]]),
    * whose heavy set is the persisted frequency store merged with the
    * batch's own delta. Same output contract as
    * [[stripRepeatedUnits]]. */
  def stripUnitsIn(df: DataFrame, idCol: String, unitsCol: Column,
      keptCol: String, heavy: DataFrame, perCol: Option[String] = None,
      broadcastHeavy: Boolean = true): DataFrame = {
    val joinKeys = perCol.toSeq :+ "unit"
    val heavySide = if (broadcastHeavy) broadcast(heavy) else heavy.hint("merge")
    // Only matching exploded rows survive this inner join; grouped to
    // one bounded heavy-list row per affected document.
    val hits = exploded(df, idCol, unitsCol, perCol)
      .join(heavySide, joinKeys)
      .groupBy(col(idCol))
      .agg(collect_set(col("unit")).as("__heavy"),
        count(lit(1)).as("n_stripped"))
    // All uses of unitsCol (size, the CASE branches, the filter) live in
    // ONE post-join projection: withColumns collapse into a single
    // Project, where subexpression elimination evaluates the unit
    // derivation once per row — computing n_units before the join put a
    // join boundary between the uses and re-derived the units per use
    // (measured ~1 extra corpus-wide derivation at the sf3 study point).
    df.join(hits, Seq(idCol), "left")
      .withColumn("n_units", size(unitsCol).cast("long"))
      .withColumn("n_stripped", coalesce(col("n_stripped"), lit(0L)))
      .withColumn(keptCol,
        when(col("__heavy").isNull, unitsCol).otherwise(
          filter(unitsCol, u =>
            trim(u) === lit("") || !array_contains(col("__heavy"), trim(u)))))
      .drop("__heavy")
  }

  /** Line-level convenience: split `textCol` on newlines (keeping
    * trailing empties — pandas/DuckDB split semantics, not Java's
    * drop-trailing default), strip lines repeated in ≥ `minDocs`
    * documents, and re-join. Adds `text_kept`, `n_units`, `n_stripped`. */
  def stripBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
      minDocs: Long, perCol: Option[String] = None,
      broadcastHeavy: Boolean = true): DataFrame =
    stripRepeatedUnits(df, idCol, split(col(textCol), "\n", -1),
      "__kept", minDocs, perCol, broadcastHeavy)
      .withColumn("text_kept", array_join(col("__kept"), "\n"))
      .drop("__kept")

  /** (id, per?, unit-occurrence) rows; empty-after-trim units dropped —
    * they are structure, not content, and must neither count toward a
    * frequency nor ever be stripped. `unit` is the trimmed form. */
  private def exploded(df: DataFrame, idCol: String, unitsCol: Column,
      perCol: Option[String]): DataFrame =
    df.select((col(idCol) +: perCol.map(col).toSeq) :+
        explode(unitsCol).as("__raw"): _*)
      .select(col("*"), trim(col("__raw")).as("unit"))
      .filter(col("unit") =!= "")
      .drop("__raw")
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing
import graft.operators.{Boilerplate, Spread, TrainingData}
import graft.queries.ParityQueries.Q

/** Corpus-preparation queries: deterministic splits, stratified
  * sampling, context-window chunking, eval-set decontamination. Every
  * assignment is hash-derived ([[Hashing.h60]]), so the DuckDB oracle
  * reproduces the exact decisions from the same md5 construction.
  */
object TrainingQueries {

  /** TD1 — group-aware train/val/test split keyed on `source`: all
    * documents from one origin land in the same partition (the
    * leakage-resistant form of the 80/10/10 split). */
  val q50SplitAssign: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    TrainingData.assignSplit(t.documents, "source", trainPermille = 800, valPermille = 100)
      .select("doc_id", "source", "split")
      .orderBy("doc_id")
  }

  /** TD2 — stratified downsampling: keep 10% of the dominant language,
    * 50% of everything else (corpus rebalancing as a filter-only plan). */
  val q51StratifiedSample: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    TrainingData.stratifiedSample(t.documents, "lang", "doc_id",
      keepPermille = Map("en" -> 100), defaultPermille = 500)
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  /** TD3 — overlapping context windows: 20-token chunks at stride 15
    * (5-token overlap), the document→training-row batch shape. */
  val q52ChunkWindows: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    TrainingData.chunkTokens(t.documents, "doc_id", "text", window = 20, stride = 15)
      .orderBy("doc_id", "chunk_id")
  }

  /** TD4 — eval-set decontamination: docs with `doc_id % 10 = 0` play
    * the held-out benchmark; every other document is scored by the
    * permille of its distinct 5-grams that appear anywhere in that set.
    * (10% eval keeps the synthetic corpus's near-dup pairs straddling
    * the split, so the query demonstrably flags contaminated docs.) */
  val q53Decontaminate: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    val eval = t.documents.filter(col("doc_id") % 10 === 0)
    val corpus = t.documents.filter(col("doc_id") % 10 =!= 0)
    TrainingData.decontaminationScores(corpus, eval, "doc_id", "text",
      n = 5, flagPermille = 500)
      .orderBy("doc_id")
  }

  /** TD5 — concat-and-chop sequence packing: per-source token streams
    * chopped into 256-token context windows; each document reports the
    * pack its first token lands in, its offset, and its span. */
  val q54SequencePack: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    val withCounts = t.documents
      .select(col("doc_id"), col("source"),
        size(graft.functions.TextAnalysis.tokensWs(col("text"))).cast("long").as("n_tokens"))
    TrainingData.packSequences(withCounts, "source", "doc_id", "n_tokens", capacity = 256)
      .select("doc_id", "source", "n_tokens", "pack_id", "pack_offset", "n_packs_spanned")
      .orderBy("doc_id")
  }

  /** TD6 — intra-document repetition facets (Gopher/C4-style): mode
    * token share and duplicate-bigram share, with the degenerate-text
    * flag. */
  val q55Repetition: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    val facets = TrainingData.repetitionFacets(col("text"))
    t.documents
      .select(col("doc_id") +: facets.map { case (name, c) => c.as(name) }: _*)
      .withColumn("is_repetitive",
        col("top_token_permille") >= 280 || col("dup_bigram_permille") >= 350)
      .orderBy("doc_id")
  }

  /** The derived "line" unit shared by q109/q110: the synthetic docs
    * are single-line, so lines are 8-word chunks — deterministic, and
    * reproduced verbatim in the oracles' `lined` CTE. The corpus's
    * engineered near-dup population (doc + " dup") makes the repeated
    * relation real: a near-dup pair shares every full chunk before its
    * divergent tail (~90 affected docs at sf0.01). */
  private def chunkLines(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val words = split(trim(text), "\\s+")
    transform(
      sequence(lit(0), ((size(words) - lit(1)) / lit(8)).cast("int")),
      i => array_join(slice(words, i * lit(8) + lit(1), lit(8)), " "))
  }

  /** TD8 — cross-document boilerplate strip (CCNet/RefinedWeb-style
    * line dedup): units repeating in ≥ 2 distinct docs removed from
    * every carrier, order-preserving; the corpus body never shuffles
    * through the frequency machinery ([[Boilerplate]] Scaladoc). */
  val q109BoilerplateStrip: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    // widen the narrow corpus scan before the per-row chunking /
    // tokenization expressions (Spread; the scan is one split)
    Boilerplate.stripRepeatedUnits(
        Spread.byKey(t.documents.select("doc_id", "text"), "doc_id", widthDivisor = 2), "doc_id",
        chunkLines(col("text")), "__kept", minDocs = 2)
      .select(col("doc_id"), col("n_units"), col("n_stripped"),
        array_join(col("__kept"), "\n").as("text_kept"))
      .orderBy("doc_id")
  }

  /** TD9 — the detector half: the repeated-unit relation itself, top
    * 100 by doc frequency (the report an operator reads before picking
    * the strip threshold). */
  val q110BoilerplateReport: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    Boilerplate.unitDocFreq(
        Spread.byKey(t.documents.select("doc_id", "text"), "doc_id", widthDivisor = 2), "doc_id",
        chunkLines(col("text")))
      .filter(col("doc_freq") >= 2)
      .orderBy(col("doc_freq").desc, col("unit"))
      .limit(100)
  }

  /** TD8b — token-level EXACT-SUBSTRING dedup
    * ([[Boilerplate.stripRepeatedSpans]]): every ≥ 12-token span
    * repeated across ≥ 2 distinct documents removed from every
    * carrier, even across the 8-word chunk boundaries q109's unit
    * form respects (the engineered near-dup population shares long
    * token prefixes, so the repeated-span relation is real: ~45
    * affected docs at sf0.01). The oracle replays the identical
    * 60-bit window-hash arithmetic. */
  val q119SpanStrip: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    Boilerplate.stripRepeatedSpans(
        Spread.byKey(t.documents.select("doc_id", "text"), "doc_id", widthDivisor = 2), "doc_id", "text",
        "__kept", k = 12, minDocs = 2)
      .select(col("doc_id"), col("n_tokens"), col("n_removed"),
        array_join(col("__kept"), " ").as("text_kept"))
      .orderBy("doc_id")
  }


  /** TD8c — KEEP-FIRST exact-substring dedup
    * ([[Boilerplate.stripRepeatedSpansKeepFirst]]): the published
    * suffix-array tool's semantics — each ≥ 12-token span repeated
    * across ≥ 2 docs survives only in its smallest-id carrier. The
    * oracle replays the per-anchor min-carrier rule alongside the
    * window hashes. */
  val q127SpanKeepFirst: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    Boilerplate.stripRepeatedSpansKeepFirst(
        Spread.byKey(t.documents.select("doc_id", "text"), "doc_id", widthDivisor = 2), "doc_id", "text",
        "__kept", k = 12, minDocs = 2)
      .select(col("doc_id"), col("n_tokens"), col("n_removed"),
        array_join(col("__kept"), " ").as("text_kept"))
      .orderBy("doc_id")
  }


  /** TD8d — INTRA-document span dedup
    * ([[Boilerplate.dedupeIntraDocSpans]]): repeated 2-token windows
    * inside one document keep only their first occurrence — the
    * repetition STRIP beside q55's detection facets, and the cheapest
    * shape in the engine (one projection, zero shuffle). k = 2 makes
    * the mask real on this corpus (~350 of 500 docs carry an
    * intra-doc repeated bigram at sf0.01). */
  val q130IntraDedupe: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    Boilerplate.dedupeIntraDocSpans(
        Spread.byKey(t.documents.select("doc_id", "text"), "doc_id", widthDivisor = 2), "doc_id", "text",
        "__kept", k = 2)
      .select(col("doc_id"), col("n_tokens"), col("n_removed"),
        array_join(col("__kept"), " ").as("text_kept"))
      .orderBy("doc_id")
  }


  /** TD8e — the composed r15 repetition-removal chain, each layer
    * feeding the next over the REWRITTEN text: intra-document span
    * dedup (k = 2) → cross-document KEEP-FIRST span dedup (k = 12) →
    * line-level boilerplate strip (8-word chunks, minDocs = 2). The
    * oracle chains the same three derivations over the same
    * intermediate texts, so the hash match proves the layers compose
    * exactly — including that earlier layers' rewrites change what
    * later layers see. */
  val q131CurationChain: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    // one widening at the chain's input parallelizes all three layers
    // (each layer's per-row tokenization inherits the width)
    val s1 = Boilerplate.dedupeIntraDocSpans(
        Spread.byKey(t.documents.select("doc_id", "text"), "doc_id", widthDivisor = 2), "doc_id", "text",
        "__k1", k = 2)
      .select(col("doc_id"), array_join(col("__k1"), " ").as("text"))
    val s2 = Boilerplate.stripRepeatedSpansKeepFirst(s1, "doc_id", "text",
        "__k2", k = 12, minDocs = 2)
      .select(col("doc_id"), array_join(col("__k2"), " ").as("text"))
    Boilerplate.stripRepeatedUnits(s2, "doc_id", chunkLines(col("text")),
        "__k3", minDocs = 2)
      .select(col("doc_id"),
        array_join(col("__k3"), "\n").as("text_kept"),
        col("n_stripped"))
      .orderBy("doc_id")
  }

  /** TD7 — the end-to-end curation pipeline a corpus user actually
    * runs, composed from the engine's layers:
    * quality gate ([[graft.functions.TextAnalysis.qualityKeep]]) →
    * repetition gate ([[TrainingData.repetitionFacets]]) → exact-dedup
    * canonical survivors ([[graft.operators.Dedup.exactDedup]]) →
    * NEAR-dup survivors via banded MinHash-LSH clustering
    * ([[graft.operators.Dedup.nearDupSurvivors]]) → leakage-resistant
    * split assignment ([[TrainingData.assignSplit]]). The gates and
    * exact dedup fuse into scans + one window on the content hash; the
    * near-dup stage deliberately routes through q27's banded LSH — NOT
    * the exact-Jaccard join, whose cost is quadratic in shingle doc
    * frequency (scale contract on [[graft.operators.Dedup.jaccardPairs]];
    * PlanShapeSpec asserts this routing stays equi-join-shaped). */
  val q57CuratePipeline: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    val facets = TrainingData.repetitionFacets(col("text"))
    val gated = t.documents
      .filter(graft.functions.TextAnalysis.qualityKeep(col("text")))
      .withColumns(facets.toMap)
      .filter(!(col("top_token_permille") >= 280 || col("dup_bigram_permille") >= 350))
    // one materialization boundary after the gates+exact-dedup prefix:
    // the near-dup stage consumes it twice (candidate generation and
    // the survivor base), and without the boundary Spark re-runs the
    // text-expression gates and the content-hash window per consumer —
    // the same localCheckpoint trade as nearDupPairsLsh's keyed relation
    val deduped = graft.operators.Dedup.exactDedup(gated, "doc_id", "text")
      .filter(!col("is_dup"))
      .localCheckpoint(true)
    val survivors = graft.operators.Dedup.nearDupSurvivors(deduped, "doc_id", "text")
    TrainingData.assignSplit(survivors, "source")
      .select("doc_id", "lang", "source", "split")
      .orderBy("doc_id")
  }

  /** TD11 — the INCREMENTAL twin of q57: the steady-state store is the
    * q57 pipeline's output on the 90% slice (gates → exact dedup →
    * near-dup survivor collapse), and the 10% batch then flows the
    * incremental path a production ingest would run — the same gates,
    * in-batch exact dedup, an exact-content screen against the store's
    * hashes, the stamped-index near-dup screen with intra-batch
    * collapse ([[graft.operators.Dedup.minhashIncrementalIngest]]) —
    * before split assignment on what survives. Checkpoint boundaries
    * sit exactly where a relation is consumed twice (the q57 trade):
    * the store feeds the hash screen AND the index build; the fresh
    * batch feeds the probe AND the post-screen survivor base. */
  val q72IncrementalCurate: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    def gated(df: org.apache.spark.sql.DataFrame) = {
      val facets = TrainingData.repetitionFacets(col("text"))
      df.filter(graft.functions.TextAnalysis.qualityKeep(col("text")))
        .withColumns(facets.toMap)
        .filter(!(col("top_token_permille") >= 280 || col("dup_bigram_permille") >= 350))
    }
    val corpusDeduped = graft.operators.Dedup
      .exactDedup(gated(t.documents.filter(col("doc_id") % 10 =!= 0)), "doc_id", "text")
      .filter(!col("is_dup"))
      .localCheckpoint(true)
    val corpus = graft.operators.Dedup.nearDupSurvivors(corpusDeduped, "doc_id", "text")
      .localCheckpoint(true)
    val batch = t.documents.filter(col("doc_id") % 10 === 0)
    // first-run bootstrap mirrors q70/q71: an empty store means nothing
    // to screen against, and ingest degenerates to intra-batch collapse
    val survivors =
      if (corpus.isEmpty)
        graft.operators.Dedup.nearDupSurvivors(
          graft.operators.Dedup.exactDedup(gated(batch), "doc_id", "text")
            .filter(!col("is_dup")),
          "doc_id", "text")
      else TrainingData.curateIncrement(batch,
        corpus.select("content_hash"),
        graft.operators.Dedup.minhashIndex(corpus, "doc_id", "text"),
        "doc_id", "text", gated)
    TrainingData.assignSplit(survivors, "source")
      .select("doc_id", "lang", "source", "split")
      .orderBy("doc_id")
  }

  /** TD8 — corpus-relative rarity scoring with a 50-token broadcast
    * vocabulary: the integer-exact inverse-frequency form of
    * perplexity-style quality scoring. */
  val q59RarityScore: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    TrainingData.rarityScores(t.documents, "doc_id", "text", topV = 50)
      .orderBy("doc_id")
  }

  /** TD9 — quality-weighted importance sampling: each document's keep
    * probability is its distinct-token permille (higher-diversity text
    * is kept more often), decided by a reproducible hash bucket. */
  val q62WeightedSample: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    val facets = graft.functions.TextAnalysis.qualityFacets(col("text")).toMap
    val withW = t.documents
      .withColumn("keep_permille", facets("distinct_permille"))
    TrainingData.weightedSample(withW, "doc_id", col("keep_permille"))
      .select("doc_id", "keep_permille")
      .orderBy("doc_id")
  }

  /** TD10 — bigram-familiarity fluency scoring: integer-exact
    * document-frequency bigram LM over the whole corpus. */
  val q66BigramFamiliarity: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    TrainingData.bigramFamiliarity(t.documents, "doc_id", "text")
      .orderBy("doc_id")
  }

  /** TD12 targets — chosen to span every branch of the rate
    * derivation at the test SFs (uniform 50‰-of-corpus supply per
    * source, budget = 40% of corpus): src0/src1 are under-supplied
    * (need > supply → rate caps at 1000, mixture undershoots), src2
    * lands at a fractional 800‰, the mid/tail weights exercise small
    * fractional rates, and `src_absent` is in the target but not the
    * corpus (supply 0 → rate 0 — the missing-domain alarm). Unlisted
    * src8–src19 are dropped by [[TrainingData.mixtureResample]]
    * (covered in `TrainingDataSpec`; this report shows targeted
    * sources only, like the production audit would). */
  private val MixtureTargets: Seq[(String, Int)] = Seq(
    "src0" -> 300, "src1" -> 150, "src2" -> 100, "src3" -> 50,
    "src4" -> 50, "src5" -> 25, "src6" -> 10, "src7" -> 5,
    "src_absent" -> 100)

  /** TD12 — the domain-mixture audit: target weight vs measured
    * supply vs derived keep-rate vs exact achieved rows, per targeted
    * source, for a budget of 40% of the corpus
    * ([[TrainingData.mixtureReport]]). Integer-exact end to end, so
    * the oracle reproduces every rate and every sampled row. */
  val q75MixtureReport: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    val budget =
      ScaleQueries.CorpusCounts.of(t.documents, s"$dir#documents") * 2 / 5
    TrainingData.mixtureReport(t.documents, "source", "doc_id",
        MixtureTargets.toMap, budget)
      .orderBy("source")
  }

  /** TD13 — the explicit-upsampling mixture ([[TrainingData
    * .mixtureUpsample]]): the same targets/budget as q75, with the
    * keep-everything cap lifted — src0 (rate 2400‰ at these targets)
    * keeps every row at epochs 0–1 plus a hash-selected 400‰ at epoch
    * 2, src2's fractional 800‰ stays a plain downsample at epoch 0, so
    * one oracle exercises the whole-epoch, remainder and sub-1000
    * branches bit-for-bit. */
  val q76MixtureUpsample: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    val budget =
      ScaleQueries.CorpusCounts.of(t.documents, s"$dir#documents") * 2 / 5
    TrainingData.mixtureUpsample(t.documents, "source", "doc_id",
        MixtureTargets.toMap, budget)
      .select("doc_id", "source", "epoch")
      .orderBy("doc_id", "epoch")
  }

  /** TD14 — sharded dataset export ([[graft.operators.Export
    * .shardedWrite]]): the corpus lands as 8 deterministic hash-placed
    * shard directories plus a per-shard manifest (rows, ord range,
    * order-independent checksum), staged and atomically swapped in. The
    * query returns the PUBLISHED manifest — i.e. it round-trips the
    * write: the oracle recomputes every manifest field from the raw
    * table, so a dropped row, a mis-placed row, or a corrupted value in
    * any shard flips a checksum and fails the hash match. The export
    * dir is per-process tmp (same argument as q78: within a process one
    * query runs at a time; across processes the pid suffix de-races
    * concurrent verify+bench). */
  val q88ShardedExport: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    val out = perProcessDir("graft_export", dir)
    graft.operators.Export.shardedWrite(spark, t.documents, "doc_id",
      ExportChecksumCols, nShards = 8, out)
      .select("shard", "n_rows", "min_ord", "max_ord", "checksum")
      .orderBy("shard")
  }

  /** TD15 — token-balanced shards ([[graft.operators.Export
    * .balancedShards]]): shard boundaries at equal cuts of the
    * cumulative `n_chars` weight over the portable global hash order —
    * the equal-token sharding a training job wants, computed as a
    * distributed two-pass prefix sum. The oracle recomputes the exact
    * assignment with a TRUE global window (affordable in DuckDB at
    * oracle scale; the single-task funnel Spark must avoid), so the
    * distributed decomposition is proven bit-equal to the sequential
    * definition. */
  val q89BalancedShards: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    graft.operators.Export.balancedShards(t.documents, "doc_id", "n_chars",
        nShards = 8, nParts = 32)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").cast("long").as("sum_w"),
        min("doc_id").as("min_id"))
      .orderBy("shard")
  }

  /** TD16 — incremental export append ([[graft.operators.Export
    * .appendShards]]): 90% of the corpus is exported, the remaining 10%
    * appended as a batch — new files only, manifest advanced by an
    * O(nShards) commutative merge, never re-reading the published data.
    * The query returns the MERGED manifest and the oracle recomputes
    * every field from the FULL raw table, so the proof is
    * incremental-equals-batch against an independent engine. The dir is
    * recreated per run (an append query must not double-append across
    * the bench's cold/warm passes). */
  val q90ExportAppend: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    val out = perProcessDir("graft_export_inc", dir)
    val p = new org.apache.hadoop.fs.Path(out)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    graft.operators.Export.shardedWrite(spark,
      t.documents.filter(col("doc_id") % 10 =!= 0), "doc_id",
      ExportChecksumCols, nShards = 8, out)
    graft.operators.Export.appendShards(spark,
      t.documents.filter(col("doc_id") % 10 === 0), "doc_id",
      ExportChecksumCols, out)
      .select("shard", "n_rows", "min_ord", "max_ord", "checksum")
      .orderBy("shard")
  }

  /** TD17 — the balanced export end-to-end: [[graft.operators.Export
    * .balancedShards]]' equal-token assignment written through
    * [[graft.operators.Export.shardedWriteAssigned]] into the
    * manifested shard layout. The oracle recomputes the assignment with
    * a true global window AND the manifest fields from the raw table,
    * so one hash match proves the distributed prefix sum, the layout
    * write, and the manifest scan together. */
  val q91BalancedExport: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    val out = perProcessDir("graft_export_bal", dir)
    val assigned = graft.operators.Export.balancedShards(
      t.documents, "doc_id", "n_chars", nShards = 8, nParts = 32)
    graft.operators.Export.shardedWriteAssigned(spark, assigned,
      ExportChecksumCols, nShards = 8, out)
      .select("shard", "n_rows", "min_ord", "max_ord", "checksum")
      .orderBy("shard")
  }

  /** TD18 — metadata-only export merge ([[graft.operators.Export
    * .concatExports]]): two disjoint halves exported separately, then
    * combined by file renames + an O(nShards) manifest sum — no data
    * byte read. The oracle recomputes the manifest from the full raw
    * table, so the hash match proves rename-merge ≡ one-shot export.
    * All three dirs are recreated per run (the merge consumes its
    * sources, and the bench replays queries). */
  val q93ExportConcat: Q = (spark, dir) => {
    val ex = graft.operators.Export
    val base = perProcessDir("graft_export_cat", dir)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val t = Tables(spark, dir)
    ex.shardedWrite(spark, t.documents.filter(col("doc_id") % 2 === 0),
      "doc_id", ExportChecksumCols, nShards = 8, s"$base/a")
    ex.shardedWrite(spark, t.documents.filter(col("doc_id") % 2 =!= 0),
      "doc_id", ExportChecksumCols, nShards = 8, s"$base/b")
    ex.concatExports(spark, Seq(s"$base/a", s"$base/b"), s"$base/merged")
      .select("shard", "n_rows", "min_ord", "max_ord", "checksum")
      .orderBy("shard")
  }

  /** Manifest checksum columns for q88 — every documents column, all
    * text-render-portable (strings + integers). */
  private val ExportChecksumCols =
    Seq("doc_id", "text", "lang", "source", "n_chars")

  /** TD19 — shard-count migration ([[graft.operators.Export
    * .reshardExport]]): export at 8 shards, re-shard to 16 —
    * necessarily a corpus rewrite (placement is `h60(id) % nShards`),
    * staged under the same dir and atomically swapped. The oracle
    * recomputes the 16-shard manifest straight from the raw table:
    * the migration must land exactly where a from-scratch 16-shard
    * export would. */
  val q95Reshard: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    val out = perProcessDir("graft_reshard", dir)
    graft.operators.Export.shardedWrite(spark, t.documents, "doc_id",
      ExportChecksumCols, nShards = 8, out)
    graft.operators.Export.reshardExport(spark, out, "doc_id",
      ExportChecksumCols, newNShards = 16)
      .select("shard", "n_rows", "min_ord", "max_ord", "checksum")
      .orderBy("shard")
  }

  /** TD20 — balanced-layout refresh ([[graft.operators.Export
    * .rebalanceExport]]): a hash-placed export re-balanced by token
    * weight IN PLACE — the assigned-layout twin of the q95 reshard,
    * and the sanctioned migration once the placement stamp makes
    * hash-appends into balanced exports impossible. The oracle is
    * q91's: the rebalanced manifest must land exactly where a
    * from-scratch balancedShards + shardedWriteAssigned export of the
    * same rows would (recomputed in DuckDB with a true global
    * window). */
  val q96Rebalance: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    val out = perProcessDir("graft_rebalance", dir)
    graft.operators.Export.shardedWrite(spark, t.documents, "doc_id",
      ExportChecksumCols, nShards = 8, out)
    graft.operators.Export.rebalanceExport(spark, out, "doc_id", "n_chars",
      ExportChecksumCols)
      .select("shard", "n_rows", "min_ord", "max_ord", "checksum")
      .orderBy("shard")
  }

  /** TD21 — targeted deletion ([[graft.operators.Export
    * .deleteFromExport]]): the takedown / retro-decontamination path —
    * every row matching a predicate removed from a published export by
    * rewriting ONLY the shards that contain matches. The oracle
    * recomputes the manifest from the raw table WITHOUT the matching
    * rows, so the hash match proves the partition-pruned rewrite, the
    * per-shard swap protocol, and the carried-plus-recomputed manifest
    * merge together. The dir is recreated per run (a delete is
    * idempotent, but the warm pass must exercise the rewrite, not a
    * no-op). */
  val q97DeleteExport: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    val out = perProcessDir("graft_export_del", dir)
    val p = new org.apache.hadoop.fs.Path(out)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    graft.operators.Export.shardedWrite(spark, t.documents, "doc_id",
      ExportChecksumCols, nShards = 8, out)
    graft.operators.Export.deleteFromExport(spark, out,
      col("doc_id") % 5 === 2, ExportChecksumCols)
      .select("shard", "n_rows", "min_ord", "max_ord", "checksum")
      .orderBy("shard")
  }

  /** TD22 — id-list takedown ([[graft.operators.Export
    * .deleteIdsFromExport]]): the "remove THESE documents" form, whose
    * affected shards derive from the id list alone under the portable
    * h60 placement (no corpus scan for detection). The oracle is the
    * manifest recomputed from the raw table with the listed ids
    * excluded — one absent id (900001) included to prove absent ids
    * are ignored, not errors. */
  val q98DeleteIds: Q = (spark, dir) => {
    import spark.implicits._
    val t = Tables(spark, dir)
    val out = perProcessDir("graft_export_delids", dir)
    val p = new org.apache.hadoop.fs.Path(out)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    graft.operators.Export.shardedWrite(spark, t.documents, "doc_id",
      ExportChecksumCols, nShards = 8, out)
    graft.operators.Export.deleteIdsFromExport(spark, out,
      DeleteIdsList.toDF("doc_id"), "doc_id", ExportChecksumCols)
      .select("shard", "n_rows", "min_ord", "max_ord", "checksum")
      .orderBy("shard")
  }

  /** The q98 takedown list: ids 3..93 step 10 (present at every SF)
    * plus one absent id. */
  private val DeleteIdsList: Seq[Long] = (3L to 93L by 10L) :+ 900001L

  /** TD23 — destructive schema migration ([[graft.operators.Export
    * .dropColumnsFromExport]]): a published column un-published by the
    * placement-preserving full rewrite (rows never move between
    * shards — the existing shard/ord placement is reused). The oracle
    * recomputes the manifest with the post-drop checksum basis, so the
    * hash match proves the rewrite changed the bytes and the manifest
    * basis while leaving every row in its shard. */
  val q99DropColumn: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    val out = perProcessDir("graft_export_drop", dir)
    graft.operators.Export.shardedWrite(spark, t.documents, "doc_id",
      ExportChecksumCols, nShards = 8, out)
    graft.operators.Export.dropColumnsFromExport(spark, out,
      Seq("source"), DropChecksumCols)
      .select("shard", "n_rows", "min_ord", "max_ord", "checksum")
      .orderBy("shard")
  }

  /** q99's post-drop checksum basis: every surviving documents column. */
  private val DropChecksumCols = Seq("doc_id", "text", "lang", "n_chars")

  /** Per-process tmp directory (pid-suffixed, removed on JVM exit):
    * concurrent verify+bench runs must not race one export dir. */
  private def perProcessDir(prefix: String, dir: String): String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"),
      prefix + "_p" + ProcessHandle.current().pid() + "_" +
        dir.toLowerCase.replaceAll("[^a-z0-9]+", "_"))
    dirsToClean.add(f)
    f.toString
  }

  private lazy val dirsToClean: java.util.Set[java.io.File] = {
    val s = java.util.concurrent.ConcurrentHashMap.newKeySet[java.io.File]()
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      s.forEach { d =>
        try {
          import java.nio.file.{Files, Path}
          import scala.jdk.CollectionConverters._
          if (d.exists()) Files.walk(d.toPath).iterator().asScala.toSeq
            .sortBy(-_.getNameCount).foreach(Files.deleteIfExists(_: Path))
        } catch { case _: Throwable => () }
      }))
    s
  }

  val all: Map[String, Q] = Map(
    "q88_sharded_export" -> q88ShardedExport,
    "q89_balanced_shards" -> q89BalancedShards,
    "q90_export_append" -> q90ExportAppend,
    "q91_balanced_export" -> q91BalancedExport,
    "q93_export_concat" -> q93ExportConcat,
    "q95_reshard" -> q95Reshard,
    "q96_rebalance" -> q96Rebalance,
    "q97_delete_export" -> q97DeleteExport,
    "q98_delete_ids" -> q98DeleteIds,
    "q99_drop_column" -> q99DropColumn,
    "q76_mixture_upsample" -> q76MixtureUpsample,
    "q75_mixture_report" -> q75MixtureReport,
    "q66_bigram_familiarity" -> q66BigramFamiliarity,
    "q57_curate_pipeline" -> q57CuratePipeline,
    "q72_incremental_curate" -> q72IncrementalCurate,
    "q59_rarity_score" -> q59RarityScore,
    "q62_weighted_sample" -> q62WeightedSample,
    "q54_sequence_pack" -> q54SequencePack,
    "q55_repetition" -> q55Repetition,
    "q50_split_assign" -> q50SplitAssign,
    "q51_stratified_sample" -> q51StratifiedSample,
    "q52_chunk_windows" -> q52ChunkWindows,
    "q53_decontaminate" -> q53Decontaminate,
    "q109_boilerplate_strip" -> q109BoilerplateStrip,
    "q110_boilerplate_report" -> q110BoilerplateReport,
    "q119_span_strip" -> q119SpanStrip,
    "q127_span_keepfirst" -> q127SpanKeepFirst,
    "q130_intra_dedupe" -> q130IntraDedupe,
    "q131_curation_chain" -> q131CurationChain)

  // ------------------------------------------------------------- oracle SQL

  private def h60(expr: String): String = Hashing.h60Sql(expr)

  /** 16-column MinHash minimum list and signature-agreement sum — the
    * q27/q40 construction, shared by the q57 and q72 oracles. */
  private val minsSql = (0 until 16)
    .map(i => s"min(${Hashing.h31AffineSql(i, "base")}) AS mh$i").mkString(", ")
  private val agreeSql = (0 until 16)
    .map(i => s"(CASE WHEN x.mh$i = y.mh$i THEN 1 ELSE 0 END)").mkString(" + ")

  /** The curation gate chain with a CTE suffix — tokenize, quality
    * gates, repetition gates, md5 exact-dedup window, canonical
    * survivors (t→q→r→d→s). ONE definition: q57 instantiates it with
    * an empty suffix over the whole table, q72 once per slice, so "the
    * same gates" cannot drift between the batch and incremental
    * oracles. */
  private def gatesCtes(sfx: String, pred: String) =
    s"""t$sfx AS (
       |  SELECT *, regexp_split_to_array(trim(text), '\\s+') AS toks
       |  FROM documents WHERE $pred),
       |q$sfx AS (
       |  SELECT * FROM t$sfx
       |  WHERE len(toks) >= 10 AND len(toks) <= 10000
       |    AND floor(1000 * CAST(len(list_filter(toks,
       |          x -> x IN ('the','a','of','and','in'))) AS DOUBLE)
       |        / CAST(len(toks) AS DOUBLE)) >= 10
       |    AND floor(1000 * CAST(len(list_distinct(toks)) AS DOUBLE)
       |        / CAST(len(toks) AS DOUBLE)) >= 100),
       |r$sfx AS (
       |  SELECT * FROM q$sfx
       |  WHERE NOT (
       |    floor(1000 * CAST(list_max(list_transform(list_distinct(toks),
       |        t2 -> len(list_filter(toks, x -> x = t2)))) AS DOUBLE)
       |      / CAST(len(toks) AS DOUBLE)) >= 280
       |    OR (CASE WHEN len(toks) - 1 <= 0 THEN 0
       |        ELSE 1000 - floor(1000 * CAST(len(list_distinct(
       |            list_transform(generate_series(1, len(toks) - 1),
       |              i -> array_to_string(toks[i:i+1], ' ')))) AS DOUBLE)
       |          / CAST(len(toks) - 1 AS DOUBLE)) END) >= 350)),
       |d$sfx AS (
       |  SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS canonical
       |  FROM r$sfx),
       |s$sfx AS (SELECT * FROM d$sfx WHERE doc_id = canonical)""".stripMargin

  /** Shingle → MinHash signature → 4-band key CTE chain with a suffix,
    * over any (doc_id, toks) source — shared by the q57 and q72
    * oracles (same hash/band construction as the q27/q40/q65 family).
    */
  private def sigKeysCtes(sfx: String, src: String) = {
    val bands = (0 until 4).map { b =>
      val parts = (s"'$b'" +: (0 until 4).map(i => s"CAST(mh${b * 4 + i} AS VARCHAR)"))
        .mkString(", ")
      s"SELECT doc_id, $b AS band, ${h60(s"concat_ws(',', $parts)")} AS band_key FROM sig$sfx"
    }.mkString("\n  UNION ALL ")
    s"""sh$sfx AS (
       |  SELECT doc_id, unnest(CASE WHEN len(toks) >= 3
       |    THEN list_distinct(list_transform(generate_series(1, len(toks) - 2),
       |           i -> array_to_string(toks[i:i+2], ' ')))
       |    ELSE [] END) AS shingle
       |  FROM $src),
       |shb$sfx AS (SELECT doc_id, ${h60("shingle")} AS base FROM sh$sfx),
       |sig$sfx AS (SELECT doc_id, $minsSql FROM shb$sfx GROUP BY doc_id),
       |keys$sfx AS (
       |  $bands)""".stripMargin
  }

  /** q88/q90/q93 share one oracle body: the manifest recomputed from
    * the raw table — q88 proves the one-shot write, q90 that
    * export(90%) + append(10%) reaches the identical manifest, q93 the
    * rename-merge; q95 uses the 16-shard form (the reshard target). */
  private def manifestOracle: String = manifestOracleAt(8)

  private def manifestOracleAt(nShards: Int, pred: String = "TRUE"): String =
    s"""WITH a AS (
       |  SELECT ${graft.operators.Export.shardSql("doc_id", nShards)} AS shard,
       |    ${graft.operators.Export.ordSql("doc_id")} AS ord,
       |    ${h60(graft.operators.Quality.rowEncodingSql(ExportChecksumCols))} AS rh
       |  FROM documents WHERE $pred)
       |SELECT shard, count(*) AS n_rows, min(ord) AS min_ord,
       |  max(ord) AS max_ord,
       |  CAST(sum(CAST(rh AS HUGEINT)) % ${1L << 61} AS BIGINT) AS checksum
       |FROM a GROUP BY shard ORDER BY shard""".stripMargin

  /** The balanced 8-shard manifest recomputed from the raw table with
    * a true global window — q91 proves the from-scratch balanced
    * export, q96 that rebalanceExport's in-place refresh of a
    * hash-placed export lands on the identical manifest. */
  private def balancedManifestOracle: String =
    s"""WITH o AS (
       |  SELECT doc_id, CAST(COALESCE(n_chars, 0) AS HUGEINT) AS w,
       |    ${graft.operators.Export.ordSql("doc_id")} AS ord,
       |    ${h60(graft.operators.Quality.rowEncodingSql(ExportChecksumCols))} AS rh
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, w, ord, rh,
       |    COALESCE(sum(w) OVER (ORDER BY ord, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
       |  FROM o),
       |t AS (SELECT sum(w) AS total FROM o),
       |a AS (
       |  SELECT CAST(LEAST((p.pre * 8) // t.total, 7) AS INT) AS shard,
       |    p.ord, p.rh
       |  FROM p CROSS JOIN t)
       |SELECT shard, count(*) AS n_rows, min(ord) AS min_ord,
       |  max(ord) AS max_ord,
       |  CAST(sum(CAST(rh AS HUGEINT)) % ${1L << 61} AS BIGINT) AS checksum
       |FROM a GROUP BY shard ORDER BY shard""".stripMargin

  /** The q109/q110 `lined` + `ex` CTEs — the exact 8-word-chunk
    * derivation [[chunkLines]] declares (1-based inclusive DuckDB list
    * slice ≡ Spark's 1-based `slice(arr, start, 8)`). */
  private val linedCtes: String =
    """lined AS (
      |  SELECT doc_id,
      |    list_transform(generate_series(0, (len(regexp_split_to_array(trim(text), '\s+'))-1)//8),
      |      i -> array_to_string(regexp_split_to_array(trim(text), '\s+')[i*8+1 : i*8+8], ' ')) AS lines
      |  FROM documents),
      |ex AS (SELECT doc_id, trim(unnest(lines)) AS unit FROM lined)""".stripMargin

  /** The q119 anchor CTEs — the exact whitespace-tokenize +
    * k=12-window 60-bit hash derivation
    * [[Boilerplate.stripRepeatedSpans]] declares (1-based inclusive
    * DuckDB list slice ≡ Spark's 1-based `slice(arr, start, 12)`;
    * `range` is end-exclusive ≡ Spark's end-inclusive
    * `sequence(0, n−12)`). */
  private val spanCtes: String =
    s"""toks AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '') AS ts
       |  FROM documents),
       |anch AS (
       |  SELECT doc_id, unnest(range(0, len(ts) - 11)) AS pos, ts
       |  FROM toks WHERE len(ts) >= 12),
       |a3 AS (
       |  SELECT doc_id, pos,
       |    ${h60("array_to_string(ts[pos+1 : pos+12], ' ')")} AS anchor
       |  FROM anch),
       |heavy AS (
       |  SELECT anchor FROM a3
       |  GROUP BY anchor HAVING COUNT(DISTINCT doc_id) >= 2)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q131_curation_chain" ->
      s"""WITH t_s1 AS (
         |  SELECT doc_id,
         |    list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '') AS ts
         |  FROM documents),
         |a_s1 AS (
         |  SELECT doc_id, unnest(range(0, len(ts) - 2 + 1)) AS pos, ts
         |  FROM t_s1 WHERE len(ts) >= 2),
         |h_s1 AS (
         |  SELECT doc_id, pos,
         |    ${h60(s"array_to_string(ts[pos+1 : pos+2], ' ')")} AS anchor
         |  FROM a_s1),
         |f_s1 AS (SELECT doc_id, anchor, min(pos) AS fp FROM h_s1 GROUP BY 1, 2),
         |c_s1 AS (SELECT DISTINCT doc_id, cv FROM (
         |  SELECT h_s1.doc_id, unnest(range(h_s1.pos, h_s1.pos + 2)) AS cv
         |  FROM h_s1 JOIN f_s1 USING (doc_id, anchor)
         |  WHERE h_s1.pos > f_s1.fp)),
         |q_s1 AS (SELECT doc_id, ts, unnest(range(0, len(ts))) AS i FROM t_s1),
         |g_s1 AS (
         |  SELECT p.doc_id, string_agg(p.ts[p.i+1], ' ' ORDER BY p.i) AS text_kept
         |  FROM q_s1 p LEFT JOIN c_s1 c ON c.doc_id = p.doc_id AND c.cv = p.i
         |  WHERE c.cv IS NULL GROUP BY p.doc_id),
         |s1 AS (
         |  SELECT t_s1.doc_id, COALESCE(g_s1.text_kept, '') AS text
         |  FROM t_s1 LEFT JOIN g_s1 USING (doc_id)),
         |t_s2 AS (
         |  SELECT doc_id,
         |    list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '') AS ts
         |  FROM s1),
         |a_s2 AS (
         |  SELECT doc_id, unnest(range(0, len(ts) - 12 + 1)) AS pos, ts
         |  FROM t_s2 WHERE len(ts) >= 12),
         |h_s2 AS (
         |  SELECT doc_id, pos,
         |    ${h60(s"array_to_string(ts[pos+1 : pos+12], ' ')")} AS anchor
         |  FROM a_s2),
         |k_s2 AS (
         |  SELECT anchor, min(doc_id) AS keeper FROM h_s2
         |  GROUP BY anchor HAVING COUNT(DISTINCT doc_id) >= 2),
         |c_s2 AS (SELECT DISTINCT doc_id, cv FROM (
         |  SELECT h_s2.doc_id, unnest(range(pos, pos + 12)) AS cv
         |  FROM h_s2 JOIN k_s2 USING (anchor)
         |  WHERE h_s2.doc_id <> k_s2.keeper)),
         |q_s2 AS (SELECT doc_id, ts, unnest(range(0, len(ts))) AS i FROM t_s2),
         |g_s2 AS (
         |  SELECT p.doc_id, string_agg(p.ts[p.i+1], ' ' ORDER BY p.i) AS text_kept
         |  FROM q_s2 p LEFT JOIN c_s2 c ON c.doc_id = p.doc_id AND c.cv = p.i
         |  WHERE c.cv IS NULL GROUP BY p.doc_id),
         |s2 AS (
         |  SELECT t_s2.doc_id, COALESCE(g_s2.text_kept, '') AS text
         |  FROM t_s2 LEFT JOIN g_s2 USING (doc_id)),
         |lined3 AS (
         |  SELECT doc_id,
         |    list_transform(generate_series(0, (len(regexp_split_to_array(trim(text), '\\s+'))-1)//8),
         |      i -> array_to_string(regexp_split_to_array(trim(text), '\\s+')[i*8+1 : i*8+8], ' ')) AS lines
         |  FROM s2),
         |ex3 AS (SELECT doc_id, trim(unnest(lines)) AS unit FROM lined3),
         |heavy3 AS (
         |  SELECT unit FROM ex3 WHERE unit <> ''
         |  GROUP BY unit HAVING COUNT(DISTINCT doc_id) >= 2),
         |hits3 AS (
         |  SELECT e.doc_id, list(DISTINCT e.unit) AS hu, COUNT(*) AS n_stripped
         |  FROM ex3 e JOIN heavy3 h USING (unit) GROUP BY e.doc_id)
         |SELECT l.doc_id,
         |  COALESCE(array_to_string(list_filter(l.lines,
         |    x -> trim(x) = '' OR NOT list_contains(COALESCE(h.hu, []), trim(x))),
         |    chr(10)), '') AS text_kept,
         |  CAST(COALESCE(h.n_stripped, 0) AS BIGINT) AS n_stripped
         |FROM lined3 l LEFT JOIN hits3 h USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "q130_intra_dedupe" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '') AS ts
         |  FROM documents),
         |anch AS (
         |  SELECT doc_id, unnest(range(0, len(ts) - 1)) AS pos, ts
         |  FROM toks WHERE len(ts) >= 2),
         |a3 AS (
         |  SELECT doc_id, pos,
         |    ${h60("array_to_string(ts[pos+1 : pos+2], ' ')")} AS anchor
         |  FROM anch),
         |f AS (SELECT doc_id, anchor, min(pos) AS fp FROM a3 GROUP BY 1, 2),
         |cov AS (SELECT DISTINCT doc_id, cv FROM (
         |  SELECT a3.doc_id, unnest(range(a3.pos, a3.pos + 2)) AS cv
         |  FROM a3 JOIN f USING (doc_id, anchor) WHERE a3.pos > f.fp)),
         |tpos AS (SELECT doc_id, ts, unnest(range(0, len(ts))) AS i FROM toks),
         |keptagg AS (
         |  SELECT p.doc_id, string_agg(p.ts[p.i+1], ' ' ORDER BY p.i) AS text_kept
         |  FROM tpos p LEFT JOIN cov c ON c.doc_id = p.doc_id AND c.cv = p.i
         |  WHERE c.cv IS NULL GROUP BY p.doc_id),
         |covagg AS (SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY doc_id)
         |SELECT t.doc_id,
         |  CAST(len(t.ts) AS BIGINT) AS n_tokens,
         |  CAST(COALESCE(ca.n_removed, 0) AS BIGINT) AS n_removed,
         |  COALESCE(ka.text_kept, '') AS text_kept
         |FROM toks t
         |LEFT JOIN covagg ca USING (doc_id)
         |LEFT JOIN keptagg ka USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin,
    "q127_span_keepfirst" ->
      s"""WITH $spanCtes,
         |keep AS (
         |  SELECT anchor, min(doc_id) AS keeper FROM a3
         |  GROUP BY anchor HAVING COUNT(DISTINCT doc_id) >= 2),
         |cov AS (SELECT DISTINCT doc_id, cv FROM (
         |  SELECT a3.doc_id, unnest(range(pos, pos + 12)) AS cv
         |  FROM a3 JOIN keep USING (anchor)
         |  WHERE a3.doc_id <> keep.keeper)),
         |tpos AS (SELECT doc_id, ts, unnest(range(0, len(ts))) AS i FROM toks),
         |keptagg AS (
         |  SELECT p.doc_id, string_agg(p.ts[p.i+1], ' ' ORDER BY p.i) AS text_kept
         |  FROM tpos p LEFT JOIN cov c ON c.doc_id = p.doc_id AND c.cv = p.i
         |  WHERE c.cv IS NULL GROUP BY p.doc_id),
         |covagg AS (SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY doc_id)
         |SELECT t.doc_id,
         |  CAST(len(t.ts) AS BIGINT) AS n_tokens,
         |  CAST(COALESCE(ca.n_removed, 0) AS BIGINT) AS n_removed,
         |  COALESCE(ka.text_kept, '') AS text_kept
         |FROM toks t
         |LEFT JOIN covagg ca USING (doc_id)
         |LEFT JOIN keptagg ka USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin,
    "q119_span_strip" ->
      s"""WITH $spanCtes,
         |cov AS (SELECT DISTINCT doc_id, cv FROM (
         |  SELECT doc_id, unnest(range(pos, pos + 12)) AS cv
         |  FROM a3 JOIN heavy USING (anchor))),
         |tpos AS (SELECT doc_id, ts, unnest(range(0, len(ts))) AS i FROM toks),
         |keptagg AS (
         |  SELECT p.doc_id, string_agg(p.ts[p.i+1], ' ' ORDER BY p.i) AS text_kept
         |  FROM tpos p LEFT JOIN cov c ON c.doc_id = p.doc_id AND c.cv = p.i
         |  WHERE c.cv IS NULL GROUP BY p.doc_id),
         |covagg AS (SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY doc_id)
         |SELECT t.doc_id,
         |  CAST(len(t.ts) AS BIGINT) AS n_tokens,
         |  CAST(COALESCE(ca.n_removed, 0) AS BIGINT) AS n_removed,
         |  COALESCE(ka.text_kept, '') AS text_kept
         |FROM toks t
         |LEFT JOIN covagg ca USING (doc_id)
         |LEFT JOIN keptagg ka USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin,
    "q109_boilerplate_strip" ->
      s"""WITH $linedCtes,
         |heavy AS (
         |  SELECT unit FROM ex WHERE unit <> ''
         |  GROUP BY unit HAVING COUNT(DISTINCT doc_id) >= 2),
         |hits AS (
         |  SELECT e.doc_id, list(DISTINCT e.unit) AS heavy_units,
         |    COUNT(*) AS n_stripped
         |  FROM ex e JOIN heavy h USING (unit) GROUP BY e.doc_id)
         |SELECT l.doc_id,
         |  CAST(len(l.lines) AS BIGINT) AS n_units,
         |  CAST(COALESCE(h.n_stripped, 0) AS BIGINT) AS n_stripped,
         |  COALESCE(array_to_string(list_filter(l.lines,
         |    x -> trim(x) = '' OR NOT list_contains(COALESCE(h.heavy_units, []), trim(x))),
         |    chr(10)), '') AS text_kept
         |FROM lined l LEFT JOIN hits h USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "q110_boilerplate_report" ->
      s"""WITH $linedCtes
         |SELECT unit, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
         |FROM ex WHERE unit <> ''
         |GROUP BY unit HAVING COUNT(DISTINCT doc_id) >= 2
         |ORDER BY doc_freq DESC, unit LIMIT 100""".stripMargin,
    "q95_reshard" -> manifestOracleAt(16),
    "q90_export_append" -> manifestOracle,
    "q93_export_concat" -> manifestOracle,
    "q96_rebalance" -> balancedManifestOracle,
    "q97_delete_export" -> manifestOracleAt(8, "NOT (doc_id % 5 = 2)"),
    "q98_delete_ids" -> manifestOracleAt(8,
      s"doc_id NOT IN (${DeleteIdsList.mkString(", ")})"),
    "q99_drop_column" ->
      s"""WITH a AS (
         |  SELECT ${graft.operators.Export.shardSql("doc_id", 8)} AS shard,
         |    ${graft.operators.Export.ordSql("doc_id")} AS ord,
         |    ${h60(graft.operators.Quality.rowEncodingSql(DropChecksumCols))} AS rh
         |  FROM documents)
         |SELECT shard, count(*) AS n_rows, min(ord) AS min_ord,
         |  max(ord) AS max_ord,
         |  CAST(sum(CAST(rh AS HUGEINT)) % ${1L << 61} AS BIGINT) AS checksum
         |FROM a GROUP BY shard ORDER BY shard""".stripMargin,
    "q91_balanced_export" -> balancedManifestOracle,
    "q88_sharded_export" ->
      s"""WITH a AS (
         |  SELECT ${graft.operators.Export.shardSql("doc_id", 8)} AS shard,
         |    ${graft.operators.Export.ordSql("doc_id")} AS ord,
         |    ${h60(graft.operators.Quality.rowEncodingSql(ExportChecksumCols))} AS rh
         |  FROM documents)
         |SELECT shard, count(*) AS n_rows, min(ord) AS min_ord,
         |  max(ord) AS max_ord,
         |  CAST(sum(CAST(rh AS HUGEINT)) % ${1L << 61} AS BIGINT) AS checksum
         |FROM a GROUP BY shard ORDER BY shard""".stripMargin,
    "q89_balanced_shards" ->
      s"""WITH o AS (
         |  SELECT doc_id, CAST(COALESCE(n_chars, 0) AS HUGEINT) AS w,
         |    ${graft.operators.Export.ordSql("doc_id")} AS ord
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, w, ord,
         |    COALESCE(sum(w) OVER (ORDER BY ord, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
         |  FROM o),
         |t AS (SELECT sum(w) AS total FROM o)
         |SELECT CAST(LEAST((p.pre * 8) // t.total, 7) AS INT) AS shard,
         |  count(*) AS n_docs, CAST(sum(p.w) AS BIGINT) AS sum_w,
         |  min(p.doc_id) AS min_id
         |FROM p CROSS JOIN t GROUP BY 1 ORDER BY 1""".stripMargin,
    "q76_mixture_upsample" ->
      s"""WITH b AS (
         |  SELECT CAST(count(*) * 2 // 5 AS BIGINT) AS budget FROM documents),
         |w(source, target_permille) AS (VALUES ${MixtureTargets
               .map { case (s, p) => s"('$s', CAST($p AS BIGINT))" }
               .mkString(", ")}),
         |c AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS supply
         |  FROM documents GROUP BY source),
         |r AS (
         |  SELECT w.source,
         |    CAST(CASE WHEN COALESCE(c.supply, 0) = 0 THEN 0
         |      ELSE (1000 * ((b.budget * w.target_permille) // 1000)) // c.supply
         |      END AS BIGINT) AS rate
         |  FROM w CROSS JOIN b LEFT JOIN c ON w.source = c.source),
         |k AS (
         |  SELECT d.doc_id, d.source,
         |    r.rate // 1000
         |      + (CASE WHEN ${h60("'mix:v1:' || CAST(d.doc_id AS VARCHAR)")} % 1000
         |               < r.rate % 1000 THEN 1 ELSE 0 END) AS rep
         |  FROM documents d JOIN r ON d.source = r.source)
         |SELECT doc_id, source, CAST(unnest(range(rep)) AS BIGINT) AS epoch
         |FROM k WHERE rep > 0
         |ORDER BY doc_id, epoch""".stripMargin,
    "q75_mixture_report" ->
      s"""WITH b AS (
         |  SELECT CAST(count(*) * 2 // 5 AS BIGINT) AS budget FROM documents),
         |w(source, target_permille) AS (VALUES ${MixtureTargets
               .map { case (s, p) => s"('$s', CAST($p AS BIGINT))" }
               .mkString(", ")}),
         |c AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS supply
         |  FROM documents GROUP BY source),
         |r AS (
         |  SELECT w.source, w.target_permille, COALESCE(c.supply, 0) AS supply,
         |    CAST(CASE WHEN COALESCE(c.supply, 0) = 0 THEN 0
         |      ELSE LEAST(1000,
         |        (1000 * ((b.budget * w.target_permille) // 1000)) // c.supply)
         |      END AS BIGINT) AS rate_permille
         |  FROM w CROSS JOIN b LEFT JOIN c ON w.source = c.source),
         |a AS (
         |  SELECT d.source, CAST(count(*) AS BIGINT) AS achieved
         |  FROM documents d JOIN r ON d.source = r.source
         |  WHERE ${h60("'mix:v1:' || CAST(d.doc_id AS VARCHAR)")} % 1000
         |        < r.rate_permille
         |  GROUP BY d.source)
         |SELECT r.source, r.target_permille, r.supply, r.rate_permille,
         |  COALESCE(a.achieved, 0) AS achieved
         |FROM r LEFT JOIN a ON r.source = a.source
         |ORDER BY r.source""".stripMargin,
    "q66_bigram_familiarity" ->
      s"""WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
        |  FROM documents),
        |bi AS (
        |  SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
        |    THEN list_distinct(list_transform(generate_series(1, len(toks) - 1),
        |           i -> toks[i] || ' ' || toks[i+1]))
        |    ELSE [] END) AS bigram
        |  FROM d),
        |uni AS (SELECT doc_id, unnest(list_distinct(toks)) AS tok FROM d),
        |bih AS (SELECT doc_id, ${h60("bigram")} AS bg,
        |               ${h60("split_part(bigram, ' ', 1)")} AS pf FROM bi),
        |bidf AS (SELECT bg, count(*) AS df_bi FROM bih GROUP BY bg),
        |unidf AS (SELECT ${h60("tok")} AS pf, count(*) AS df_uni FROM uni GROUP BY 1),
        |fam AS (
        |  SELECT bih.doc_id, (1000 * df_bi) // df_uni AS fam
        |  FROM bih JOIN bidf USING (bg)
        |  JOIN unidf USING (pf))
        |SELECT doc_id,
        |  CAST(sum(fam) // count(*) AS BIGINT) AS mean_fam_permille,
        |  count(*) AS n_bigrams
        |FROM fam GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q62_weighted_sample" ->
      s"""WITH w AS (
         |  SELECT doc_id,
         |    floor(1000 * CAST(len(list_distinct(toks)) AS DOUBLE)
         |      / CAST(len(toks) AS DOUBLE)) AS keep_permille
         |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
         |        FROM documents))
         |SELECT doc_id, CAST(keep_permille AS BIGINT) AS keep_permille
         |FROM w
         |WHERE ${h60("'wsample:v1:' || CAST(doc_id AS VARCHAR)")} % 1000 < keep_permille
         |ORDER BY doc_id""".stripMargin,
    "q59_rarity_score" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        |  FROM documents),
        |cnt AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
        |tot AS (SELECT sum(c) AS n FROM cnt),
        |vocab AS (
        |  SELECT t, (1000000 * tot.n) // c AS rarity
        |  FROM (SELECT * FROM cnt ORDER BY c DESC, t LIMIT 50) CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(COALESCE(rarity, (SELECT max(rarity) + 1 FROM vocab)))
        |       // count(*) AS BIGINT) AS rarity_score
        |FROM tok LEFT JOIN vocab USING (t)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q57_curate_pipeline" -> {
      // gates + MinHash(16)/LSH(4×4) from the SHARED builders (empty
      // suffix, whole table), then candidate join, agreement ≥ 8, and
      // connected components (recursive CTE) over the survivors
      s"""WITH RECURSIVE ${gatesCtes("", "TRUE")},
         |${sigKeysCtes("", "s")},
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS a_doc_id, b.doc_id AS b_doc_id
         |  FROM keys a JOIN keys b
         |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |prs AS (
         |  SELECT a_doc_id, b_doc_id FROM (
         |    SELECT a_doc_id, b_doc_id, $agreeSql AS sig_agree
         |    FROM cand JOIN sig x ON a_doc_id = x.doc_id JOIN sig y ON b_doc_id = y.doc_id)
         |  WHERE sig_agree >= 8),
         |sym AS (
         |  SELECT a_doc_id AS src, b_doc_id AS dst FROM prs
         |  UNION SELECT b_doc_id, a_doc_id FROM prs),
         |reach(a, b) AS (
         |  SELECT doc_id, doc_id FROM s
         |  UNION
         |  SELECT rr.a, sy.dst FROM reach rr JOIN sym sy ON rr.b = sy.src),
         |cc AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a)
         |SELECT doc_id, lang, source,
         |  CASE WHEN ${h60("'split:v1:' || source")} % 1000 < 800 THEN 'train'
         |       WHEN ${h60("'split:v1:' || source")} % 1000 < 900 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM s JOIN cc USING (doc_id) WHERE doc_id = cluster_id
         |ORDER BY doc_id""".stripMargin
    },
    "q72_incremental_curate" -> {
      // The SHARED gate/hash/band builders, suffixed so the corpus (c)
      // and batch (p) slices each get their own chain; sig/keys are
      // then rebuilt on the corpus SURVIVORS (i) and the exact-screened
      // fresh batch (f) for the incremental probe.
      s"""WITH RECURSIVE ${gatesCtes("c", "doc_id % 10 <> 0")},
         |${sigKeysCtes("c", "sc")},
         |candc AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM keysc a JOIN keysc b
         |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |prsc AS (
         |  SELECT a_id, b_id FROM (
         |    SELECT a_id, b_id, $agreeSql AS sig_agree
         |    FROM candc JOIN sigc x ON a_id = x.doc_id JOIN sigc y ON b_id = y.doc_id)
         |  WHERE sig_agree >= 8),
         |symc AS (
         |  SELECT a_id AS src, b_id AS dst FROM prsc
         |  UNION SELECT b_id, a_id FROM prsc),
         |reachc(a, b) AS (
         |  SELECT doc_id, doc_id FROM sc
         |  UNION
         |  SELECT r.a, s.dst FROM reachc r JOIN symc s ON r.b = s.src),
         |ccc AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reachc GROUP BY a),
         |corp AS (
         |  SELECT sc.* FROM sc JOIN ccc ON sc.doc_id = ccc.doc_id
         |  WHERE ccc.doc_id = ccc.cluster_id),
         |${gatesCtes("p", "doc_id % 10 = 0")},
         |fresh AS (
         |  SELECT * FROM sp
         |  WHERE md5(text) NOT IN (SELECT md5(text) FROM corp)),
         |${sigKeysCtes("f", "fresh")},
         |${sigKeysCtes("i", "corp")},
         |matched AS (
         |  SELECT DISTINCT p.doc_id
         |  FROM keysf p JOIN keysi c ON p.band = c.band AND p.band_key = c.band_key
         |  JOIN sigf x ON p.doc_id = x.doc_id
         |  JOIN sigi y ON c.doc_id = y.doc_id
         |  WHERE $agreeSql >= 8),
         |scr AS (
         |  SELECT doc_id FROM fresh
         |  WHERE doc_id NOT IN (SELECT doc_id FROM matched)),
         |kp AS (SELECT k.* FROM keysf k JOIN scr USING (doc_id)),
         |candp AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM kp a JOIN kp b
         |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |prsp AS (
         |  SELECT a_id, b_id FROM (
         |    SELECT a_id, b_id, $agreeSql AS sig_agree
         |    FROM candp JOIN sigf x ON a_id = x.doc_id JOIN sigf y ON b_id = y.doc_id)
         |  WHERE sig_agree >= 8),
         |symp AS (
         |  SELECT a_id AS src, b_id AS dst FROM prsp
         |  UNION SELECT b_id, a_id FROM prsp),
         |reachp(a, b) AS (
         |  SELECT doc_id, doc_id FROM scr
         |  UNION
         |  SELECT r.a, s.dst FROM reachp r JOIN symp s ON r.b = s.src),
         |ccp AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reachp GROUP BY a)
         |SELECT f.doc_id, f.lang, f.source,
         |  CASE WHEN ${h60("'split:v1:' || source")} % 1000 < 800 THEN 'train'
         |       WHEN ${h60("'split:v1:' || source")} % 1000 < 900 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM fresh f JOIN ccp ON f.doc_id = ccp.doc_id
         |WHERE ccp.doc_id = ccp.cluster_id
         |ORDER BY f.doc_id""".stripMargin
    },
    "q54_sequence_pack" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT *, COALESCE(sum(n_tokens) OVER (
        |    PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |  FROM t)
        |SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(floor(cum / 256) AS BIGINT) AS pack_id,
        |  CAST(cum % 256 AS BIGINT) AS pack_offset,
        |  CAST(floor((cum + n_tokens - 1) / 256) - floor(cum / 256) + 1 AS BIGINT)
        |    AS n_packs_spanned
        |FROM c ORDER BY doc_id""".stripMargin,
    "q55_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, len(toks) AS n,
        |    list_max(list_transform(list_distinct(toks),
        |      t -> len(list_filter(toks, x -> x = t)))) AS top_freq,
        |    CASE WHEN len(toks) >= 2
        |      THEN len(list_distinct(list_transform(generate_series(1, len(toks) - 1),
        |             i -> array_to_string(toks[i:i+1], ' '))))
        |      ELSE 0 END AS n_bi_distinct
        |  FROM t)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        |  CAST(floor(1000 * CAST(top_freq AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT)
        |    AS top_token_permille,
        |  CAST(CASE WHEN n - 1 <= 0 THEN 0
        |    ELSE 1000 - floor(1000 * CAST(n_bi_distinct AS DOUBLE)
        |                      / CAST(n - 1 AS DOUBLE)) END AS BIGINT)
        |    AS dup_bigram_permille,
        |  (CAST(floor(1000 * CAST(top_freq AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) >= 280
        |   OR CAST(CASE WHEN n - 1 <= 0 THEN 0
        |        ELSE 1000 - floor(1000 * CAST(n_bi_distinct AS DOUBLE)
        |                          / CAST(n - 1 AS DOUBLE)) END AS BIGINT) >= 350)
        |    AS is_repetitive
        |FROM f ORDER BY doc_id""".stripMargin,
    "q50_split_assign" ->
      s"""SELECT doc_id, source,
         |  CASE WHEN ${h60("'split:v1:' || source")} % 1000 < 800 THEN 'train'
         |       WHEN ${h60("'split:v1:' || source")} % 1000 < 900 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q51_stratified_sample" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${h60("'sample:v1:' || CAST(doc_id AS VARCHAR)")} % 1000
         |      < (CASE WHEN lang = 'en' THEN 100 ELSE 500 END)
         |ORDER BY doc_id""".stripMargin,
    "q52_chunk_windows" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, toks, len(toks) AS n,
        |    unnest(generate_series(0, CASE WHEN len(toks) <= 20 THEN 0
        |      ELSE (len(toks) - 20 + 14) // 15 END)) AS chunk_id
        |  FROM t)
        |SELECT doc_id, chunk_id,
        |  array_to_string(toks[chunk_id * 15 + 1 : chunk_id * 15 + 20], ' ') AS chunk_text,
        |  least(20, n - chunk_id * 15) AS n_chunk_tokens
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "q53_decontaminate" ->
      s"""WITH tok AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
         |  FROM documents),
         |sh AS (
         |  SELECT doc_id, unnest(CASE WHEN len(toks) >= 5
         |    THEN list_distinct(list_transform(generate_series(1, len(toks) - 4),
         |           i -> array_to_string(toks[i:i+4], ' ')))
         |    ELSE [] END) AS shingle
         |  FROM tok),
         |g AS (SELECT doc_id, ${h60("shingle")} AS gh FROM sh),
         |ev AS (SELECT DISTINCT gh FROM g WHERE doc_id % 10 = 0),
         |sc AS (
         |  SELECT g.doc_id, count(*) AS n_grams, count(ev.gh) AS n_hit
         |  FROM g LEFT JOIN ev ON g.gh = ev.gh
         |  WHERE g.doc_id % 10 != 0 GROUP BY 1)
         |SELECT doc_id, n_grams, n_hit,
         |  CAST(floor(1000 * CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE)) AS BIGINT)
         |    AS contam_permille,
         |  CAST(floor(1000 * CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE)) AS BIGINT)
         |    >= 500 AS is_contaminated
         |FROM sc ORDER BY doc_id""".stripMargin)
}

package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TrainingDataSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private val docs = Seq(
    (0L, "a b c d e f g h i j k l m n o p q r s t u v w x y z", "en", "s0"),
    (1L, "a b c d e f g h i j k l m n o p q r s t u v w x y z", "en", "s0"),
    (2L, "one two three four five six", "en", "s1"),
    (3L, "uno dos tres", "es", "s2"),
    (4L, "short", "de", "s3"))
    .toDF("doc_id", "text", "lang", "source")

  test("assignSplit: deterministic, exhaustive, and group-cohesive") {
    val a = TrainingData.assignSplit(docs, "source")
    val b = TrainingData.assignSplit(docs, "source")
    assertSameRows(a, b)
    val bySource = a.groupBy("source").agg(countDistinct("split").as("k")).collect()
    assert(bySource.forall(_.getLong(1) == 1L), "a source must land in exactly one split")
    assert(a.filter(!col("split").isin("train", "val", "test")).isEmpty)
    // re-salting re-deals: over many synthetic groups some assignment moves
    val many = spark.range(200).select(concat(lit("g"), col("id")).as("g"))
    val s1 = TrainingData.assignSplit(many, "g", salt = "v1")
    val s2 = TrainingData.assignSplit(many, "g", salt = "v2")
    val moved = s1.withColumnRenamed("split", "x")
      .join(s2, "g").filter(col("x") =!= col("split")).count()
    assert(moved > 0)
  }

  test("stratifiedSample: rates land near the target per stratum") {
    val rows = spark.range(4000)
      .select(col("id").as("doc_id"),
        when(col("id") % 2 === 0, "en").otherwise("de").as("lang"))
    val kept = TrainingData.stratifiedSample(rows, "lang", "doc_id",
      Map("en" -> 100), defaultPermille = 500)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 2000 per stratum; hash buckets are uniform-ish: 10% ±5pp, 50% ±7pp
    assert(kept("en") > 100 && kept("en") < 300, s"en kept ${kept("en")}")
    assert(kept("de") > 860 && kept("de") < 1140, s"de kept ${kept("de")}")
  }

  test("weightedSample: reproducible, rate-proportional, and nested across weights") {
    val rows = spark.range(4000).select(col("id").as("doc_id"))
    def keptAt(w: Int): Set[Long] =
      TrainingData.weightedSample(rows, "doc_id", lit(w))
        .select("doc_id").as[Long].collect().toSet
    val k200 = keptAt(200); val k600 = keptAt(600)
    assert(k200 == keptAt(200)) // deterministic
    assert(math.abs(k200.size - 800) < 120 && math.abs(k600.size - 2400) < 180)
    // the bucket scheme makes samples NESTED: raising the weight only adds
    assert(k200.subsetOf(k600))
  }

  test("mixture: rates integer-exact, resample deterministic + subset, report consistent") {
    // 3 sources of 100 each; budget 60, weights: s0 under-supplied
    // (need 30·2=... no: need = 60·600/1000 = 36 < 100 → rate 360),
    // s1 capped (w=400 → need 24, supply 10 → rate 1000), s2 unlisted,
    // sX absent from the corpus
    val rows = spark.range(210).select(col("id").as("doc_id"),
      when(col("id") < 100, "s0").when(col("id") < 110, "s1")
        .otherwise("s2").as("source"))
    val weights = Map("s0" -> 600, "s1" -> 400, "sX" -> 0)
    val rates = TrainingData.mixtureRates(rows, "source", weights, budgetRows = 60L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rates("s0") == ((600L, 100L, 360L)))  // 1000·36/100
    assert(rates("s1") == ((400L, 10L, 1000L)))  // need 24 > supply → capped
    assert(rates("sX") == ((0L, 0L, 0L)))        // absent: supply 0, rate 0
    val sampled = TrainingData.mixtureResample(rows, "source", "doc_id", weights, 60L)
    assertSameRows(sampled,
      TrainingData.mixtureResample(rows, "source", "doc_id", weights, 60L))
    assert(sampled.columns.toSeq == rows.columns.toSeq, "original schema back")
    assert(sampled.join(rows, Seq("doc_id"), "left_anti").isEmpty, "subset of input")
    assert(sampled.filter(col("source") === "s2").isEmpty, "unlisted source dropped")
    assert(sampled.filter(col("source") === "s1").count() == 10L,
      "capped source keeps everything")
    // report's achieved == the resample's actual per-source counts
    val report = TrainingData.mixtureReport(rows, "source", "doc_id", weights, 60L)
    val achieved = report.collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    val actual = sampled.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(achieved("s0") == actual("s0") && achieved("s1") == 10L && achieved("sX") == 0L)
    // an input that already carries a rate_permille column resamples fine
    // (the join-internal rate name is "__"-prefixed, no ambiguity)
    val preRated = rows.withColumn("rate_permille", lit(7L))
    assert(TrainingData.mixtureResample(preRated, "source", "doc_id", weights, 60L)
      .columns.toSeq == preRated.columns.toSeq)
    // rate derivation guards
    intercept[IllegalArgumentException](
      TrainingData.mixtureRates(rows, "source", Map("s0" -> 700, "s1" -> 400), 60L))
    intercept[IllegalArgumentException](
      TrainingData.mixtureRates(rows, "source", Map("s0" -> 1200), 60L))
    // plan shape: the corpus is filtered against a BROADCAST of the tiny
    // rate relation — no sort-merge join, no shuffle of the corpus side
    val plan = sampled.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"corpus must not sort-merge join:\n$plan")
  }

  test("mixture upsampling: under-supplied domains repeat by integer epochs, sub-1000 rates unchanged") {
    // s1 under-supplied: need = 60·400/1000 = 24, supply 10 → uncapped
    // rate 2400 → every row at epochs 0–1 plus a hash-selected 400‰ at
    // epoch 2. s0 over-supplied: rate 360 → plain downsample at epoch 0.
    val rows = spark.range(210).select(col("id").as("doc_id"),
      when(col("id") < 100, "s0").when(col("id") < 110, "s1")
        .otherwise("s2").as("source"))
    val weights = Map("s0" -> 600, "s1" -> 400, "sX" -> 0)
    val uncapped = TrainingData.mixtureRates(rows, "source", weights, 60L,
        allowRepetition = true)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(uncapped("s1") == 2400L && uncapped("s0") == 360L && uncapped("sX") == 0L)
    // the default stays capped: q75's contract is untouched by the flag
    assert(TrainingData.mixtureRates(rows, "source", weights, 60L)
      .filter(col("source") === "s1").head().getLong(3) == 1000L)

    val up = TrainingData.mixtureUpsample(rows, "source", "doc_id", weights, 60L)
    assert(up.columns.toSeq == rows.columns.toSeq :+ "epoch")
    // every s1 row appears at epochs 0 and 1; the epoch-2 slice is the
    // hash-selected remainder (0 < slice < all 10 at bucket rate 400‰)
    val s1 = up.filter(col("source") === "s1")
    assert(s1.filter(col("epoch") === 0).count() == 10L)
    assert(s1.filter(col("epoch") === 1).count() == 10L)
    val extra = s1.filter(col("epoch") === 2).count()
    assert(extra > 0 && extra < 10, s"remainder slice must be partial, got $extra")
    assert(s1.filter(col("epoch") > 2).isEmpty)
    // per-row epochs are consecutive 0..rep-1
    assert(s1.groupBy("doc_id").agg(count(lit(1)).as("n"), max("epoch").as("m"))
      .filter(col("n") =!= col("m") + 1).isEmpty)
    // a sub-1000 source degenerates to mixtureResample exactly (same salt)
    val s0up = up.filter(col("source") === "s0").drop("epoch")
    assertSameRows(s0up,
      TrainingData.mixtureResample(rows, "source", "doc_id", weights, 60L)
        .filter(col("source") === "s0"))
    assert(up.filter(col("source") === "s0" && col("epoch") > 0).isEmpty)
    // deterministic + corpus never shuffled (broadcast rates, no SMJ)
    assertSameRows(up,
      TrainingData.mixtureUpsample(rows, "source", "doc_id", weights, 60L))
    val plan = up.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"corpus must not sort-merge join:\n$plan")
  }

  test("chunkTokens: covers every token at the stride, tail chunk short") {
    val out = TrainingData.chunkTokens(docs, "doc_id", "text", window = 10, stride = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // 26 tokens, w=10, s=7 -> ceil(16/7)+1 = 4 chunks; starts 0,7,14,21
    val d0 = out.filter(_._1 == 0L).sortBy(_._2)
    assert(d0.length == 4)
    assert(d0.map(_._4).toSeq == Seq(10L, 10L, 10L, 5L))
    assert(d0.head._3 == "a b c d e f g h i j")
    assert(d0.last._3 == "v w x y z")
    // consecutive chunks overlap by window - stride tokens
    val overlap = d0(0)._3.split(" ").drop(7).toSeq
    assert(d0(1)._3.split(" ").take(3).toSeq == overlap)
    // a doc at or under the window is exactly one whole-text chunk
    assert(out.filter(_._1 == 3L).toSeq == Seq((3L, 0L, "uno dos tres", 3L)))
    assert(out.filter(_._1 == 4L).toSeq == Seq((4L, 0L, "short", 1L)))
  }

  test("packSequences: concat-and-chop positions reconstruct the token stream") {
    val rows = Seq(
      (1L, "g1", 100L), (2L, "g1", 200L), (3L, "g1", 30L), (4L, "g1", 300L),
      (5L, "g2", 600L))
      .toDF("doc_id", "source", "n_tokens")
    val out = TrainingData.packSequences(rows, "source", "doc_id", "n_tokens", 256)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out(1L) == ((0L, 0L, 1L)))     // tokens 0..99
    assert(out(2L) == ((0L, 100L, 2L)))   // 100..299 straddles pack 0/1
    assert(out(3L) == ((1L, 44L, 1L)))    // 300..329
    assert(out(4L) == ((1L, 74L, 2L)))    // 330..629 straddles 1/2
    assert(out(5L) == ((0L, 0L, 3L)))     // own group; 600 tokens span 3 packs
    // offsets are consistent: (pack_id * 256 + offset) is the running sum
    val cum = TrainingData.packSequences(rows, "source", "doc_id", "n_tokens", 256)
      .withColumn("reconstructed", col("pack_id") * 256 + col("pack_offset"))
    val g1 = cum.filter(col("source") === "g1").orderBy("doc_id")
      .select("reconstructed").as[Long].collect().toSeq
    assert(g1 == Seq(0L, 100L, 300L, 330L))
  }

  test("repetitionFacets: degenerate text scores high, varied text low") {
    val rows = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "a b a b a b a b a b"),
      (3L, "all twelve of these tokens here are fully distinct from others"),
      (4L, "one"))
      .toDF("doc_id", "text")
    val out = rows.select(col("doc_id") +:
      TrainingData.repetitionFacets(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((1000L, 858L)))   // one token repeated: fully degenerate
    assert(out(2L) == ((500L, 778L)))    // alternating pair: 2 distinct of 9 bigrams
    assert(out(3L)._1 < 150L && out(3L)._2 == 0L)
    assert(out(4L) == ((1000L, 0L)))     // single token: no bigrams, zero dup share
  }

  test("rarityScores: integer-exact inverse-frequency, capped vocab, OOV above vocab") {
    val corpus = (Seq.fill(20)("common words only") :+ "zorp qux flibber")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    // 63 total tokens; 'common'/'words'/'only' (count 20 each) are the
    // top-3 vocabulary: rarity = (1e6 * 63) div 20 = 3150000
    val scores = TrainingData.rarityScores(corpus, "doc_id", "text", topV = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scores(0L) == 3150000L)
    // the rare doc's tokens fall outside the top-3 vocab → default OOV
    // rarity = rarest vocab token + 1, strictly above every in-vocab
    // score (rare text NEVER ranks below boilerplate)
    assert(scores(20L) == 3150001L)
    assert(scores(20L) > scores(0L))
    // with the vocab widened to include them, their count-1 rarity
    // (1e6 * 63 div 1) dominates and rare text outscores boilerplate
    val withBigVocab = TrainingData.rarityScores(corpus, "doc_id", "text", topV = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(withBigVocab(20L) == 63000000L)
    assert(withBigVocab(20L) > withBigVocab(0L))
  }

  test("decontaminationScores: a verbatim copy of an eval doc scores 1000") {
    val eval = docs.filter(col("doc_id") === 0L)
    val corpus = docs.filter(col("doc_id") =!= 0L)
    val sc = TrainingData.decontaminationScores(corpus, eval, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(sc(1L) == ((22L, 22L, 1000L, true))) // verbatim dup of the eval doc
    assert(sc(2L) == ((2L, 0L, 0L, false)))     // disjoint text
    assert(!sc.contains(3L) && !sc.contains(4L)) // under 5 tokens: no grams
  }

  test("decontaminationScores: eval probe is a broadcast join, corpus never shuffled on grams") {
    val sc = TrainingData.decontaminationScores(
      docs.filter(col("doc_id") =!= 0L), docs.filter(col("doc_id") === 0L),
      "doc_id", "text", n = 5)
    sc.collect()
    val plan = sc.queryExecution.executedPlan
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
    assert(collectWithSubqueries(plan) { case b: BroadcastHashJoinExec => b }.nonEmpty)
    assert(collectWithSubqueries(plan) { case s: SortMergeJoinExec => s }.isEmpty)
  }

  test("leakSafeSplit: the train twin of a holdout doc is marked leaked; holdout never changes") {
    val twin = "the quick brown fox jumps over the lazy dog near the old river bank today"
    val solo = Seq(
      "seven engineers of the valley debugged a streaming pipeline in the night",
      "nine ravens of the tower guarded a rusty crown in the heavy rain",
      "four sailors of the delta charted a shallow reef before the storm")
    // the same article under MANY sources: group-keyed splitting deals
    // the sources independently, so some twin lands train while another
    // lands holdout — the cross-origin leak this operator exists for.
    // Find a salt where that actually happens (deterministic per salt).
    val base = (0 until 12).map(i => (i.toLong, twin, s"mirror$i")) ++
      solo.zipWithIndex.map { case (t, i) => ((100 + i).toLong, t, s"s$i") }
    val df = base.toDF("doc_id", "text", "source")
    val salt = (1 to 50).map(s => s"v$s").find { s =>
      val sp = TrainingData.assignSplit(df, "source", salt = s)
        .filter(col("doc_id") < 100)
        .select("split").distinct().collect().map(_.getString(0)).toSet
      sp.contains("train") && (sp - "train").nonEmpty
    }.get
    val plain = TrainingData.assignSplit(df, "source", salt = salt)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val safe = TrainingData.leakSafeSplit(df, "doc_id", "text", "source",
        salt = salt)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val twinIds = (0L until 12L)
    // every TRAIN twin is re-marked leaked (a holdout twin exists)
    twinIds.filter(plain(_) == "train").foreach { id =>
      assert(safe(id) == "leaked", s"train twin $id must be leaked")
    }
    // holdout rows NEVER change, twins included
    safe.keys.filter(id => plain(id) != "train").foreach { id =>
      assert(safe(id) == plain(id), s"holdout/other row $id changed split")
    }
    // solo docs keep their assignment whatever it is
    (100L to 102L).foreach(id => assert(safe(id) == plain(id)))
    // a corpus with no cross-boundary near-dups degenerates to assignSplit
    val soloDf = base.filter(_._1 >= 100).toDF("doc_id", "text", "source")
    assertSameRows(
      TrainingData.leakSafeSplit(soloDf, "doc_id", "text", "source", salt = salt),
      TrainingData.assignSplit(soloDf, "source", salt = salt))
  }

  test("leakSafeSplitEmbedding: sided probe equals the symmetric pair relation's cross-boundary leak set") {
    // the sided-vs-symmetric equivalence law, embedding form: the
    // operator's holdout-index + train-probe construction must name
    // exactly the train ids a SYMMETRIC whole-corpus near-dup pair
    // relation (same plane count, same tables, same threshold) names
    // through its cross-boundary pairs — the sided form exists to skip
    // the intra-train bulk, never to change the answer
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val minMicro = 400000L
    val split = TrainingData.assignSplit(emb, "label")
    val holdoutRows = split.filter(col("split") =!= "train").count()
    assert(holdoutRows > 0, "fixture must deal some labels to holdout")
    val planes = Similarity.lshAutoPlanes(holdoutRows)
    val got = TrainingData.leakSafeSplitEmbedding(emb, "vec_id", "embedding",
        "label", dims = 64, minMicro = minMicro)
      .filter(col("split") === "leaked")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val sides = split.select("vec_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = Similarity.nearDupPairsLsh(emb, "vec_id", "embedding",
        minMicro, planes = planes, dims = 64, tables = 6)
      .select("a_id", "b_id").collect()
    val want = pairs.flatMap { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      Seq(
        if (sides(a) == "train" && sides(b) != "train") Some(a) else None,
        if (sides(b) == "train" && sides(a) != "train") Some(b) else None)
        .flatten
    }.toSet
    assert(got == want,
      s"sided leak set ${got.size} != symmetric cross-boundary set ${want.size}")
    assert(got.nonEmpty, "fixture must actually leak (else the law is vacuous)")
    // holdout rows never change; non-leaked train rows keep 'train'
    val safe = TrainingData.leakSafeSplitEmbedding(emb, "vec_id", "embedding",
        "label", dims = 64, minMicro = minMicro)
      .select("vec_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    safe.foreach { case (id, s) =>
      if (sides(id) != "train") assert(s == sides(id), s"holdout row $id changed")
      else assert(s == "train" || s == "leaked")
    }
  }
}

package graft.operators

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.clean.Clean

/** Property-law tests (SURVEY.md §5.2) over seeded random inputs: the
  * cascade's row-conservation law (G3), keep-first uniqueness, match
  * monotonicity, drop-unmatched equivalence, union arithmetic, and
  * cleaning idempotence. Three seeds per law — deterministic, but the
  * inputs are adversarial (duplicate dim keys, partial coverage, nulls)
  * rather than hand-picked. */
class LawsSpec extends SparkSpec {
  import spark.implicits._

  private def randomWorld(seed: Int): (DataFrame, DataFrame) = {
    val rnd = new Random(seed)
    val fact = (0 until 60).map { i =>
      (i.toLong, rnd.nextInt(12).toLong, rnd.nextInt(4))
    }.toDF("row_id", "custkey", "nkey")
    // dimension with deliberate duplicate keys and partial coverage
    val dim = (0 until 30).map { i =>
      (rnd.nextInt(16).toLong, rnd.nextInt(4),
        s"name_${rnd.nextInt(8)}", rnd.nextInt(100).toDouble)
    }.toDF("custkey", "nkey", "payload_name", "payload_bal")
    (fact, dim)
  }

  private def enrich(fact: DataFrame, dim: DataFrame, drop: Boolean) =
    Relational.hierarchicalEnrich(
      fact, dim,
      keyLevels = Seq(Seq("custkey", "nkey"), Seq("custkey")),
      payloadCols = Seq("payload_name", "payload_bal"),
      dimOrder = Seq(col("payload_bal").desc, col("payload_name")),
      dropUnmatched = drop)

  test("G3 law: the conserving cascade emits exactly one row per input row") {
    for (seed <- Seq(1, 2, 3)) {
      val (fact, dim) = randomWorld(seed)
      val out = enrich(fact, dim, drop = false)
      assert(out.count() == 60, s"seed=$seed")
      assert(out.select("row_id").distinct().count() == 60, s"seed=$seed")
    }
  }

  test("keepFirst law: unique on keys and every survivor is an input row") {
    for (seed <- Seq(1, 2, 3)) {
      val (_, dim) = randomWorld(seed)
      val kept = Relational.keepFirst(dim, Seq("custkey", "nkey"),
        Seq(col("payload_bal").desc, col("payload_name")))
      assert(kept.groupBy("custkey", "nkey").count().filter(col("count") > 1).isEmpty,
        s"seed=$seed: duplicate keys survived")
      assert(kept.except(dim).isEmpty, s"seed=$seed: fabricated rows")
    }
  }

  test("monotonicity law: a level-1 match carries exactly the level-1 survivor's payload") {
    for (seed <- Seq(1, 2, 3)) {
      val (fact, dim) = randomWorld(seed)
      val out = enrich(fact, dim, drop = false)
      val survivors = Relational.keepFirst(dim, Seq("custkey", "nkey"),
        Seq(col("payload_bal").desc, col("payload_name")))
        .withColumnRenamed("payload_name", "exp_name")
        .withColumnRenamed("payload_bal", "exp_bal")
      val l1 = out.filter(col("match_level") === 1)
        .join(survivors, Seq("custkey", "nkey"), "left")
      assert(l1.filter(col("payload_name") =!= col("exp_name") ||
        col("payload_bal") =!= col("exp_bal")).isEmpty, s"seed=$seed")
      // and a level-2 row's (custkey, nkey) must be absent from the dim
      val l2bad = out.filter(col("match_level") === 2)
        .join(dim.select("custkey", "nkey").distinct(), Seq("custkey", "nkey"), "left_semi")
      assert(l2bad.isEmpty, s"seed=$seed: level-2 row had a level-1 key match")
    }
  }

  test("drop-unmatched law: equals the conserving cascade filtered to matches") {
    for (seed <- Seq(1, 2, 3)) {
      val (fact, dim) = randomWorld(seed)
      val dropped = enrich(fact, dim, drop = true)
      val filtered = enrich(fact, dim, drop = false).filter(col("match_level").isNotNull)
      assertSameRows(dropped, filtered)
    }
  }

  test("unionStrata law: row count is the sum, columns are the union") {
    for (seed <- Seq(1, 2, 3)) {
      val (fact, dim) = randomWorld(seed)
      val u = Relational.unionStrata(Seq(fact, dim))
      assert(u.count() == fact.count() + dim.count(), s"seed=$seed")
      assert(u.columns.toSet == fact.columns.toSet ++ dim.columns.toSet, s"seed=$seed")
    }
  }

  test("saltedLeftJoin equals the plain left join on skewed random data") {
    for (seed <- Seq(1, 2)) {
      val rnd = new Random(seed)
      // 80% of facts share one hot key — the salting target
      val fact = (0 until 200).map { i =>
        (i.toLong, if (rnd.nextDouble() < 0.8) 7L else rnd.nextInt(10).toLong)
      }.toDF("row_id", "k")
      val dim = (0 until 10).map(i => (i.toLong, s"payload_$i")).toDF("k", "p")
      val plain = fact.join(dim, Seq("k"), "left")
      val salted = Relational.saltedLeftJoin(fact, dim, Seq("k"), buckets = 8)
      assertSameRows(salted, plain)
    }
  }

  test("connectedComponents: chains collapse to min-id clusters, singletons stand alone") {
    // 1-2, 2-3 (a 3-chain), 5-6, isolated 9 — diameter > 1 forces >1 round
    val edges = Seq((2L, 1L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val nodes = Seq(1L, 2L, 3L, 5L, 6L, 9L).toDF("doc_id")
    val cc = Dedup.connectedComponents(edges, nodes, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 9L -> 9L))
  }

  test("connectedComponents: driver union-find and the distributed loop agree (seeded graphs)") {
    // the driver fast path handles every test-sized corpus, which would
    // leave the over-threshold distributed loop DEAD in the suite —
    // force it with maxDriverEdges = 0 and prove the two paths compute
    // identical labels on random graphs (chains, cliques, singletons)
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val n = 60
      val edges = (0 until 50)
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .toDF("a", "b")
      val nodes = (0 until n).map(_.toLong).toDF("doc_id")
      val fast = Dedup.connectedComponents(edges, nodes, "doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val loop = Dedup.connectedComponents(edges, nodes, "doc_id",
        maxDriverEdges = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast == loop, s"paths disagree at seed $seed")
      // labels are component minima: every label labels itself
      assert(fast.values.forall(v => fast(v) == v))
    }
  }

  test("connectedComponents: non-integral ids take the distributed loop and still collapse") {
    // string ids can't enter the driver union-find (LongMap keys) — the
    // loop must handle them end to end, min by string ordering
    val edges = Seq(("b", "a"), ("b", "c"), ("x", "y")).toDF("s", "d")
    val nodes = Seq("a", "b", "c", "x", "y", "lone").toDF("doc_id")
    val cc = Dedup.connectedComponents(edges, nodes, "doc_id")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cc == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "x" -> "x", "y" -> "x", "lone" -> "lone"))
  }

  test("self-probe law: minhashProbe of a corpus against its own index reproduces minhashLshPairs") {
    val rnd = new Random(5)
    val docs = (0 until 80).map { i =>
      // overlapping vocabulary → genuine near-dups among the 80
      (i.toLong, (0 until 6 + rnd.nextInt(6)).map(_ => s"w${rnd.nextInt(10)}").mkString(" "))
    }.toDF("doc_id", "text")
    val index = Dedup.minhashIndex(docs, "doc_id", "text")
    val probe = Dedup.minhashProbe(docs, index, "doc_id", "text")
      .filter(col("probe_doc_id") < col("corpus_doc_id"))
      .select(col("probe_doc_id").as("a_doc_id"),
        col("corpus_doc_id").as("b_doc_id"), col("sig_agree"))
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text")
    assertSameRows(probe, pairs)
    // and every doc with shingles matches itself at full agreement
    val selfMatches = Dedup.minhashProbe(docs, index, "doc_id", "text")
      .filter(col("probe_doc_id") === col("corpus_doc_id"))
    assert(selfMatches.filter(col("sig_agree") =!= 16).count() == 0)
    assert(selfMatches.count() == Dedup.minhashSignature(docs, "doc_id", "text").count())
  }

  test("probe survives the documented parquet partitionBy(band) round-trip") {
    // partitioned parquet reads back with partition columns LAST — the
    // probe must bind index columns by name, or every match silently
    // vanishes (regression: positional toDF)
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "x y z w v u"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh-index").toString
    Dedup.minhashIndex(docs, "doc_id", "text")
      .write.mode("overwrite").partitionBy("band").parquet(dir)
    val readBack = spark.read.parquet(dir)
    assert(readBack.columns.last == "band") // precondition: order DID change
    val probe = Dedup.minhashProbe(docs.filter(col("doc_id") === 1), readBack,
      "doc_id", "text")
    val got = probe.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 1L, 16L), (1L, 2L, 16L))) // exact dup found, not empty
  }

  test("geocode enrich law: row count conserved; carried coordinates never overwritten") {
    val rnd = new Random(3)
    val data = (0 until 100).map { i =>
      val carried = rnd.nextBoolean()
      (i.toLong, s"${rnd.nextInt(20)} Main St, City${rnd.nextInt(5)}",
        if (carried) Some(rnd.nextInt(90).toDouble) else None,
        if (carried) Some(rnd.nextInt(180).toDouble) else None)
    }.toDF("id", "addr", "latitude", "longitude")
    val lookup = (0 until 20).flatMap { s =>
      (0 until 5).map(c => (s"$s Main St, City$c", s * 1.0, c * 1.0))
    }.toDF("address", "latitude", "longitude")
    val out = Geocode.enrich(data, lookup, addressCol = "addr")
    assert(out.count() == 100) // deduped lookup: no fan-out, no loss
    val disagree = out.as("o").join(data.as("d"), Seq("id"))
      .filter(col("d.latitude").isNotNull &&
        (col("o.latitude") =!= col("d.latitude") || col("o.longitude") =!= col("d.longitude")))
    assert(disagree.count() == 0)
  }

  test("hierarchicalEnrich law: the one-pass CASE form equals the sequential join/split/union cascade") {
    // The equivalence argument in Relational.scala's doc comment, as a
    // ScalaCheck property: random worlds (duplicate dim keys, partial
    // coverage, genuinely-null and empty-string payloads), random level
    // stacks, missOn on/off, dropUnmatched on/off — the single-pass
    // first-hit-CASE plan must emit exactly the rows of the literal
    // level-by-level cascade the reference runs (join, split on hit,
    // carry misses to the next level, union at the end).
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import scala.collection.mutable.ListBuffer

    val payloads = Seq("payload_name", "payload_bal")
    val order = Seq(col("payload_bal").desc_nulls_last, col("payload_name").asc_nulls_last)

    def sequentialCascade(fact: DataFrame, dim: DataFrame, levels: Seq[Seq[String]],
        missOn: Option[String], drop: Boolean): DataFrame = {
      val last = levels.length - 1
      var rest = fact
      val pieces = ListBuffer.empty[DataFrame]
      for ((keys, i) <- levels.zipWithIndex) {
        val lvl = Relational.keepFirst(dim, keys, order)
          .select((keys ++ payloads).distinct.map(col): _*)
          .withColumn("__m", lit(true))
        val j = rest.join(lvl, keys, "left")
        val hitC = missOn match {
          case Some(m) if i < last || drop =>
            col("__m") && col(m).isNotNull && col(m).cast("string") =!= ""
          case _ => col("__m")
        }
        val hit = coalesce(hitC, lit(false)) // null marker = miss, not filtered-away
        pieces += j.filter(hit)
          .withColumn("match_level", lit(i + 1)).drop("__m")
          .select((fact.columns.toSeq ++ payloads :+ "match_level").map(col): _*)
        rest = j.filter(!hit).select(fact.columns.toSeq.map(col): _*)
      }
      if (!drop) pieces += payloads.foldLeft(rest)((d, c) =>
          d.withColumn(c, lit(null).cast(dim.schema(c).dataType)))
        .withColumn("match_level", lit(null).cast("int"))
        .select((fact.columns.toSeq ++ payloads :+ "match_level").map(col): _*)
      pieces.reduce(_ union _)
    }

    val genWorld = for {
      factRows <- Gen.listOfN(30, Gen.zip(Gen.choose(0L, 11L), Gen.choose(0, 3)))
      dimRows <- Gen.listOfN(18, for {
        ck <- Gen.choose(0L, 13L) // duplicates AND uncovered fact keys
        nk <- Gen.choose(0, 3)
        name <- Gen.frequency(2 -> Gen.const(null: String), 1 -> Gen.const(""),
          4 -> Gen.oneOf("n1", "n2", "n3"))
        bal <- Gen.frequency(1 -> Gen.const(Option.empty[Double]),
          4 -> Gen.choose(0, 99).map(d => Some(d.toDouble)))
      } yield (ck, nk, name, bal))
      levels <- Gen.oneOf(
        Seq(Seq("custkey", "nkey"), Seq("custkey")),
        Seq(Seq("custkey", "nkey"), Seq("custkey"), Seq("nkey")),
        Seq(Seq("custkey", "nkey")),
        Seq(Seq("custkey")))
      missOn <- Gen.oneOf(None, Some("payload_name"))
      drop <- Gen.oneOf(true, false)
    } yield (factRows, dimRows, levels, missOn, drop)

    val prop = Prop.forAll(genWorld) { case (factRows, dimRows, levels, missOn, drop) =>
      val fact = factRows.zipWithIndex
        .map { case ((ck, nk), i) => (i.toLong, ck, nk) }
        .toDF("row_id", "custkey", "nkey")
      val dim = dimRows.toDF("custkey", "nkey", "payload_name", "payload_bal")
      val onePass = Relational.hierarchicalEnrich(
        fact, dim, levels, payloads, order,
        dropUnmatched = drop, missOn = missOn)
      canon(onePass) == canon(sequentialCascade(fact, dim, levels, missOn, drop))
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12).withWorkers(1), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("jaccardPairsPrefix law: prefix+length filtering is LOSSLESS vs the raw shared-shingle join") {
    // AllPairs/PPJoin prunes must never change the answer — compare full
    // outputs against the uncapped raw-join form on seeded random docs
    // (shared vocabulary → dense shingle overlap → prunes genuinely fire)
    val vocab = Seq("the", "data", "spark", "row", "join", "scan", "key", "hash", "sort", "agg")
    for (seed <- Seq(1, 2, 3); threshold <- Seq(500, 300)) {
      val rnd = new Random(seed)
      val docs = (0 until 40).map { i =>
        val len = 5 + rnd.nextInt(25)
        (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val raw = Dedup.jaccardPairs(docs, "doc_id", "text", minPermille = threshold)
        .collect().map(_.toSeq).toSet
      val pref = Dedup.jaccardPairsPrefix(docs, "doc_id", "text", minPermille = threshold)
        .collect().map(_.toSeq).toSet
      assert(pref == raw, s"seed=$seed threshold=$threshold: " +
        s"missing=${(raw -- pref).take(3)} extra=${(pref -- raw).take(3)}")
    }
  }

  test("LshBuckets law: native multi-table buckets equal the composed CASE WHEN float_dot form") {
    // the native expression replaced the per-plane composition for JIT
    // reasons (SCALING.md q29 note); this law pins value equality on
    // seeded random vectors, including short and zero vectors
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new Random(seed)
      val planes = 2 + rnd.nextInt(6)
      val dims = 4 + rnd.nextInt(12)
      val tables = 1 + rnd.nextInt(5)
      val vecs = ((0 until 40).map { i =>
        val d = if (i % 13 == 0) dims - 1 else dims // occasional short vector
        (i.toLong, Array.fill(d)((rnd.nextDouble() * 2 - 1).toFloat))
      } :+ (99L, Array.fill(dims)(0.0f))).toDF("id", "v")
      val composed = (0 until tables).map { t =>
        Similarity.hyperplaneSigns(planes, dims, t).zipWithIndex.map { case (s, p) =>
          val weights = array(s.map(x => lit(x.toFloat)): _*)
          when(Similarity.dot(col("v"), weights) > 0, lit(1L << p)).otherwise(lit(0L))
        }.reduce(_ + _).as(s"c$t")
      }
      val fams = (0 until tables).map(t => Similarity.hyperplaneSigns(planes, dims, t))
      val rows = vecs.select(
        (col("id") +: Similarity.lshBucketsAll(col("v"), fams).as("n") +: composed): _*)
        .collect()
      rows.foreach { r =>
        val native = r.getSeq[Long](1)
        val comp = (0 until tables).map(t => r.getLong(2 + t))
        assert(native == comp,
          s"seed=$seed id=${r.getLong(0)} native=$native composed=$comp")
      }
    }
  }

  test("trailingWindowAgg law: ledger equals the RANGE frame on seeded random event sets") {
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new Random(seed)
      // small time range forces peers and exact-boundary collisions;
      // ~10% null values exercise sum's null-skipping
      val width = 10L
      val events = (0 until 300).map { i =>
        (s"u${rnd.nextInt(5)}", i.toLong, rnd.nextInt(40).toLong,
          if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(1000) / 100.0))
      }.toDF("user_id", "event_id", "t", "v0")
        .withColumn("v", $"v0".cast("decimal(18,2)")).drop("v0")
      val ledger = Relational.trailingWindowAgg(events, Seq("user_id"), "t",
        "event_id", $"v", width).select("user_id", "event_id", "n_trail", "sum_trail")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"t").rangeBetween(-width, 0L)
      val frame = events
        .withColumn("n_trail", count(lit(1)).over(w))
        .withColumn("sum_trail", sum($"v").over(w))
        .select("user_id", "event_id", "n_trail", "sum_trail")
      assertSameRows(ledger, frame)
    }
  }

  test("as-of law: union-window equals the naive join, all directions, adversarial inputs") {
    // Tiny key space + tiny time range force per-key pile-ups, repeated
    // (key, ts) left rows, equal-time right ties, and null keys/times —
    // every edge the union-window resolution must get right. tieBreak
    // v is unique per right row (zero-padded index) so both phrasings
    // have a total order.
    def world(seed: Int): (DataFrame, DataFrame) = {
      val rnd = new Random(seed)
      def mayNull(v: Long, p: Double): Option[Long] =
        if (rnd.nextDouble() < p) None else Some(v)
      val left = (0 until 40).map { i =>
        (i.toLong, mayNull(rnd.nextInt(6).toLong, 0.05), mayNull(rnd.nextInt(30).toLong, 0.05))
      }.toDF("lid", "k", "lts")
      val right = (0 until 40).map { i =>
        (mayNull(rnd.nextInt(6).toLong, 0.1), mayNull(rnd.nextInt(30).toLong, 0.1),
          f"v$i%03d")
      }.toDF("k", "rts", "v")
      (left, right)
    }
    def naive(left: DataFrame, right: DataFrame, dirn: String, inc: Boolean,
        tol: Option[Long]): DataFrame = {
      val fits = dirn match {
        case "backward" => if (inc) right("rts") <= left("lts") else right("rts") < left("lts")
        case "forward"  => if (inc) right("rts") >= left("lts") else right("rts") > left("lts")
        // null left time matches nothing (the strict branch's =!= gives
        // null → excluded already; the inclusive branch must say so)
        case "nearest"  => if (inc) left("lts").isNotNull else right("rts") =!= left("lts")
      }
      val dist = abs(right("rts") - left("lts"))
      val inTol = tol.map(t => dist <= t).getOrElse(lit(true))
      val j = left.join(right, left("k") === right("k") && fits && inTol, "left")
        .select(left("lid"), left("k"), left("lts"), right("rts"), right("v"))
      val order = dirn match {
        case "backward" => Seq(col("rts").desc_nulls_last, col("v").desc_nulls_last)
        case "forward"  => Seq(col("rts").asc_nulls_last, col("v").desc_nulls_last)
        case "nearest"  => Seq(abs(col("rts") - col("lts")).asc_nulls_last,
          when(col("rts") <= col("lts"), 0).otherwise(1).asc, col("v").desc_nulls_last)
      }
      val w = org.apache.spark.sql.expressions.Window.partitionBy("lid").orderBy(order: _*)
      j.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select(col("lid"), col("k"), col("lts"), col("rts").as("m_rts"), col("v").as("m_v"))
    }
    for (seed <- Seq(11, 12, 13); dirn <- Seq("backward", "forward", "nearest");
        inc <- Seq(true, false); tol <- Seq(None, Some(5L))) {
      val (left, right) = world(seed)
      val got = Temporal.asOfJoin(left, right, Seq("k"), "lts", "rts",
        rightVals = Seq("rts", "v"), tieBreak = Seq("v"), inclusive = inc,
        toleranceMicros = tol, direction = dirn)
        .withColumnRenamed("rts", "m_rts").withColumnRenamed("v", "m_v")
      assertSameRows(got, naive(left, right, dirn, inc, tol))
    }
  }

  test("normalizeNull is idempotent and only touches sentinels") {
    val vals = Seq("x", ".", "", "nan", "NaN", null, " .", "n.", "NAN")
    val df = vals.toDF("v")
    val once = df.select(Clean.normalizeNull(col("v")).as("v"))
    val twice = once.select(Clean.normalizeNull(col("v")).as("v"))
    assertSameRows(once, twice)
    val got = once.collect().map(r => Option(r.getString(0))).toSeq
    assert(got == Seq(Some("x"), None, None, None, None, None, Some(" ."), Some("n."), Some("NAN")))
  }

  test("span-dedup laws: k-monotonicity, keep-first <= strip-all, intra <= tokens") {
    // seeded adversarial corpus: small vocabulary forces real repeats
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new Random(seed)
      val vocab = Vector("a", "b", "c", "d", "e")
      val docs = (0 until 40).map { i =>
        (i.toLong, (0 until (5 + rnd.nextInt(30)))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      def removedAll(k: Int) =
        Boilerplate.stripRepeatedSpans(docs, "doc_id", "text", "kept", k, 2)
          .select(col("doc_id"), col("n_removed")).as[(Long, Long)].collect().toMap
      def removedFirst(k: Int) =
        Boilerplate.stripRepeatedSpansKeepFirst(docs, "doc_id", "text", "kept", k, 2)
          .select(col("doc_id"), col("n_removed")).as[(Long, Long)].collect().toMap
      val a3 = removedAll(3); val a5 = removedAll(5); val f3 = removedFirst(3)
      val nTok = Boilerplate.dedupeIntraDocSpans(docs, "doc_id", "text", "kept", 3)
        .select(col("doc_id"), col("n_tokens"), col("n_removed"))
        .as[(Long, Long, Long)].collect()
      for (id <- a3.keys) {
        // a longer window can only repeat where the shorter did
        assert(a5(id) <= a3(id), s"seed $seed doc $id: k-monotonicity")
        // keeping the canonical copy never removes more
        assert(f3(id) <= a3(id), s"seed $seed doc $id: keep-first subset")
      }
      nTok.foreach { case (id, n, r) =>
        assert(r <= n, s"seed $seed doc $id: intra removal bounded by tokens")
      }
      // the small vocabulary must actually produce repeats, or the law
      // run is vacuous
      assert(a3.values.sum > 0, s"seed $seed: no repeats generated")
    }
  }
}

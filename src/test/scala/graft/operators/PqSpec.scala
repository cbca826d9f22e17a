package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Product quantization ([[Pq]]): codebook determinism, the
  * encode-yourself fixed point, driver-recomputed ADC exactness, the
  * nProbe = nCells equivalence between the IVF-PQ probe and the
  * exhaustive ADC scan, Lloyd's refinement actually refining, rerank
  * recovering exact order, and the persisted index's partition-pruned
  * probe plan. */
class PqSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")
  private lazy val corpus = emb.filter(col("vec_id") % 10 =!= 0)
  private lazy val probes = emb.filter(col("vec_id") % 10 === 0 && col("vec_id") < 500)
  private val DIMS = 64
  private val NSUB = 8
  private val K = 16
  private lazy val cb = Pq.pqCodebook(corpus, "vec_id", "embedding",
    DIMS, NSUB, K).localCheckpoint(true)

  test("codebook: contiguous (sub, code) grid, unit-scale codewords, deterministic") {
    val rows = cb.orderBy("sub", "code").collect()
    assert(rows.length == NSUB * K)
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      (for (s <- 0 until NSUB; j <- 0 until K) yield (s, j)))
    rows.foreach { r =>
      assert(r.getSeq[Double](2).length == DIMS / NSUB)
      // codeword self-dot matches its vector (the cc precompute)
      val v = r.getSeq[Double](2)
      assert(math.abs(r.getDouble(3) - v.map(x => x * x).sum) == 0.0)
      // subspace of a unit vector: norm ≤ 1
      assert(r.getDouble(3) <= 1.0 + 1e-12)
    }
    assert(canon(Pq.pqCodebook(corpus, "vec_id", "embedding", DIMS, NSUB, K))
      == canon(cb), "codebook build must be deterministic")
  }

  test("encode: anchor vectors are their own codes; codes are nSub bytes; deterministic") {
    val enc = Pq.pqEncode(corpus, cb, "embedding")
    val codes = enc.select(col("vec_id"), col("pq_codes")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(codes.values.forall(c => c != null && c.length == NSUB))
    // the k hash-ordered anchors encode EXACTLY to their own code in
    // every subspace: score_j at x = c_j is |c|²/2, strictly maximal
    // unless another codeword ties it within 1e-6 (none in this data)
    val anchors = corpus
      .select(col("vec_id"),
        graft.functions.Hashing.h60(concat(lit("pqcode:"),
          col("vec_id").cast("string"))).as("hk"))
      .orderBy("hk", "vec_id").limit(K).collect().map(_.getLong(0))
    anchors.zipWithIndex.foreach { case (id, j) =>
      assert(codes(id).forall(b => (b & 0xFF) == j),
        s"anchor $id (code $j) must encode to itself, got ${codes(id).toSeq}")
    }
  }

  test("ADC scores match a driver-side recompute exactly, pair by pair") {
    val cbRows = cb.orderBy("sub", "code").collect()
      .map(r => r.getSeq[Double](2).toArray)
    val enc = Pq.pqEncode(corpus.limit(7), cb, "embedding")
      .select(col("vec_id"), col("pq_codes"), col("embedding"))
    val q = probes.limit(3)
      .select(col("vec_id").as("query_id"),
        Pq.pqLutCol(cb, "embedding").as("lut"))
    val got = enc.crossJoin(q)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Pq.adcScore(col("pq_codes"), col("lut")).as("pq_micro"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val corpusCodes = enc.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val qVecs = probes.limit(3).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val dsub = DIMS / NSUB
    for ((qid, qv) <- qVecs; (nid, codes) <- corpusCodes) {
      val nrm = math.sqrt(qv.map(x => x.toDouble * x.toDouble).sum)
      val want = (0 until NSUB).map { s =>
        val c = cbRows(s * K + (codes(s) & 0xFF))
        var dot = 0.0
        for (d <- 0 until dsub) dot += (qv(s * dsub + d).toDouble / nrm) * c(d)
        math.floor(1e6 * dot).toLong
      }.sum
      assert(got((qid, nid)) == want, s"ADC mismatch for ($qid, $nid)")
    }
  }

  test("exhaustive ADC top-k: deterministic; recall climbs the code-budget ladder") {
    val adc = Pq.pqTopKExhaustive(probes, corpus, cb, "vec_id", "embedding", 10)
      .localCheckpoint(true)
    assert(canon(adc) == canon(
      Pq.pqTopKExhaustive(probes, corpus, cb, "vec_id", "embedding", 10)))
    val exact1 = Similarity.bruteForceTopKBatch(corpus, probes, "vec_id",
        "embedding", k = 1)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
    def top1Hits(codebook: org.apache.spark.sql.DataFrame): Long =
      Pq.pqTopKExhaustive(probes, corpus, codebook, "vec_id", "embedding", 10)
        .join(exact1, Seq("query_id", "neighbor_id")).count()
    val n = exact1.count()
    // unclustered 64-dim data is PQ's worst case (no cluster structure
    // for codewords to exploit). Everything here is deterministic, so
    // these are measured floors, not hopes: 8-byte sampled codes catch
    // the exact top-1 in the ADC top-10 for 16/50 queries; doubling the
    // byte budget more than doubles that (33/50); Lloyd refinement
    // lifts the 8-byte codebook to 23/50 without touching the budget.
    val base = top1Hits(cb)
    assert(base * 50 >= n * 12, s"8-byte sampled: $base/$n")
    val wide = top1Hits(Pq.pqCodebook(corpus, "vec_id", "embedding",
      DIMS, 16, K).localCheckpoint(true))
    assert(wide * 50 >= n * 25, s"16-byte sampled: $wide/$n")
    assert(wide >= base, "more subspaces must not lose recall here")
    val lloyd = top1Hits(Pq.pqCodebook(corpus, "vec_id", "embedding",
      DIMS, NSUB, K, iters = 5, sampleN = 450).localCheckpoint(true))
    assert(lloyd >= base, s"Lloyd refinement lost recall: $base -> $lloyd")
  }

  test("rerank of the ADC pool returns exact-cosine order for the survivors") {
    val pool = Pq.pqTopKExhaustive(probes, corpus, cb, "vec_id", "embedding", 50)
    val reranked = Pq.pqRerank(pool, emb, "vec_id", "embedding", k = 3)
    val exact = Similarity.bruteForceTopKBatch(corpus, probes, "vec_id",
      "embedding", k = 3)
    // every reranked row exact-scored: its cos_micro equals the exact
    // arm's for the same (query, neighbor). Measured on this data:
    // 102/150 exact top-3 rows recovered from the 8-byte R=50 pool
    // (and 142/150 with the 16-byte Lloyd codebook — the ladder again)
    val joined = reranked.join(
        exact.withColumnRenamed("cos_micro", "want"),
        Seq("query_id", "neighbor_id"))
      .localCheckpoint(true)
    assert(joined.filter(col("cos_micro") =!= col("want")).isEmpty)
    val n = exact.count()
    assert(joined.count() * 10 >= n * 6,
      s"rerank@3 from an R=50 pool recovered only ${joined.count()}/$n exact rows")
  }

  test("Lloyd refinement does not worsen sample distortion, and stays deterministic") {
    def distortion(codebook: org.apache.spark.sql.DataFrame): Double = {
      val cbRows = codebook.orderBy("sub", "code").collect()
        .map(r => r.getSeq[Double](2).toArray)
      val enc = Pq.pqEncode(corpus, codebook, "embedding")
        .select(col("pq_codes"), col("embedding")).collect()
      val dsub = DIMS / NSUB
      enc.map { r =>
        val codes = r.getAs[Array[Byte]](0)
        val v = r.getSeq[Float](1).toArray
        val nrm = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
        (0 until NSUB).map { s =>
          val c = cbRows(s * K + (codes(s) & 0xFF))
          (0 until dsub).map { d =>
            val e = v(s * dsub + d).toDouble / nrm - c(d)
            e * e
          }.sum
        }.sum
      }.sum / enc.length
    }
    val refined = Pq.pqCodebook(corpus, "vec_id", "embedding", DIMS, NSUB, K,
      iters = 5, sampleN = 450)
    assert(canon(refined) == canon(Pq.pqCodebook(corpus, "vec_id", "embedding",
      DIMS, NSUB, K, iters = 5, sampleN = 450)))
    val d0 = distortion(cb)
    val d5 = distortion(refined)
    assert(d5 <= d0 * 1.0001,
      s"5 Lloyd iterations must not worsen corpus distortion: $d0 -> $d5")
  }

  test("IVF-PQ probe at nProbe = nCells equals the exhaustive ADC scan") {
    val index = Pq.pqIndex(corpus, "vec_id", "embedding", cb,
      nCells = 8, dims = DIMS).localCheckpoint(true)
    val got = Pq.pqProbe(probes, index, cb, "vec_id", "embedding",
      k = 5, nProbe = 8, nCells = 8, dims = DIMS)
    val want = Pq.pqTopKExhaustive(probes, corpus, cb, "vec_id", "embedding", 5)
    assertSameRows(got, want)
  }

  test("persisted IVF-PQ index: member rows carry codes not vectors; probe prunes partitions") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-pq-index").toString
    Pq.pqIndex(corpus, "vec_id", "embedding", cb, nCells = 8, dims = DIMS)
      .write.mode("overwrite").partitionBy("cell").parquet(tmp)
    val back = spark.read.parquet(tmp)
    // the storage contract: raw vectors survive ONLY on centroid rows
    assert(back.filter(!col("is_cent") && col("embedding").isNotNull).isEmpty)
    assert(back.filter(col("is_cent") && col("embedding").isNull).isEmpty)
    assert(back.filter(col("pq_codes").isNull).isEmpty)
    val probed = Pq.pqProbe(probes, back, cb, "vec_id", "embedding",
      k = 3, nProbe = 2, nCells = 8, dims = DIMS)
    val plan = probed.queryExecution.executedPlan.toString
    assert("PartitionFilters:\\s*\\[cell".r.findFirstIn(plan).isDefined,
      "the nProbe-cell probe must prune the cell partitions at the scan")
    assert(probed.count() > 0)
    // probe members exclude nothing that exhaustive-within-cells keeps:
    // every result is a corpus id from a probed cell
    assert(probed.join(corpus.select(col("vec_id").as("neighbor_id")),
      Seq("neighbor_id"), "left_anti").isEmpty)
  }

  test("pqIndexExtend: appended rows answer probes; nProbe = nCells still equals exhaustive") {
    val base = corpus.filter(col("vec_id") < 300)
    val extra = corpus.filter(col("vec_id") >= 300)
    val index = Pq.pqIndex(base, "vec_id", "embedding", cb,
      nCells = 8, dims = DIMS).localCheckpoint(true)
    val ext = Pq.pqIndexExtend(index, extra, "vec_id", "embedding", cb)
    // the extension contract: no new centroids, no raw vectors, codes
    // under the inherited stamp
    assert(ext.filter(col("is_cent")).isEmpty)
    assert(ext.filter(col("embedding").isNotNull).isEmpty)
    assert(ext.filter(col("pq_codes").isNull).isEmpty)
    val grown = index.unionByName(ext).localCheckpoint(true)
    // probing every cell makes cell assignment irrelevant: the grown
    // index must answer exactly like the exhaustive ADC scan over the
    // full corpus, base + extension alike
    assertSameRows(
      Pq.pqProbe(probes, grown, cb, "vec_id", "embedding",
        k = 5, nProbe = 8, nCells = 8, dims = DIMS),
      Pq.pqTopKExhaustive(probes, corpus, cb, "vec_id", "embedding", 5))
    // a mismatched codebook shape refuses before any scoring
    val ex = intercept[IllegalArgumentException] {
      Pq.pqIndexExtend(index, extra, "vec_id", "embedding",
        Pq.pqCodebook(corpus, "vec_id", "embedding", DIMS, NSUB, k = 8))
    }
    assert(ex.getMessage.contains("disagrees"))
  }

  test("deleteSwapPq: member takedown is probe-invisible; centroid takedown refuses") {
    import graft.operators.IndexOps
    val tmp = java.nio.file.Files.createTempDirectory("graft-pq-del").toString
    Pq.pqIndex(corpus, "vec_id", "embedding", cb, nCells = 8, dims = DIMS)
      .write.mode("overwrite").partitionBy("cell").parquet(tmp)
    val centIds = spark.read.parquet(tmp).filter(col("is_cent"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val victim = corpus.select("vec_id").collect().map(_.getLong(0))
      .find(!centIds.contains(_)).get
    IndexOps.deleteSwapPq(spark, tmp, "vec_id",
      Seq(victim, 999999L).toDF("vec_id"))
    val back = spark.read.parquet(tmp)
    assert(back.filter(col("vec_id") === victim).isEmpty)
    assert(back.filter(col("is_cent")).count() == 8,
      "centroid rows must survive a member takedown")
    val probed = Pq.pqProbe(probes, back, cb, "vec_id", "embedding",
      k = 50, nProbe = 8, nCells = 8, dims = DIMS)
    assert(probed.filter(col("neighbor_id") === victim).isEmpty,
      "deleted member must be probe-invisible")
    // a centroid-anchor id cannot be taken down in place: codes cannot
    // rebuild the quantizer — the refusal points at the pqIndex rebuild
    val ex = intercept[IllegalArgumentException] {
      IndexOps.deleteSwapPq(spark, tmp, "vec_id",
        Seq(centIds.head).toDF("vec_id"))
    }
    assert(ex.getMessage.contains("CENTROID") &&
      ex.getMessage.contains("pqTakedown"))
  }

  test("drift: pqDistortion flags a stale codebook; retrainSwapPq repairs and rotates the stamp") {
    // the drift scenario: an index over TODAY's corpus still encoded
    // under a codebook trained on a DIFFERENT distribution (here: the
    // negated corpus — same norms, mirrored directions, so every
    // codeword points the wrong way)
    val shifted = corpus.withColumn("embedding",
      transform(col("embedding"), x => negate(x)))
    val staleCb = Pq.pqCodebook(shifted, "vec_id", "embedding",
      DIMS, NSUB, K).localCheckpoint(true)
    val dStale = Pq.meanDistortionMicro(
      Pq.pqDistortion(corpus, staleCb, "vec_id", "embedding"))
    val dTrue = Pq.meanDistortionMicro(
      Pq.pqDistortion(corpus, cb, "vec_id", "embedding"))
    assert(dStale > dTrue,
      s"the detector must flag the stale codebook: stale=$dStale true=$dTrue")
    // detector determinism (micro-floored per-term sums, hash-ordered sample)
    assert(canon(Pq.pqDistortion(corpus, staleCb, "vec_id", "embedding")) ==
      canon(Pq.pqDistortion(corpus, staleCb, "vec_id", "embedding")))

    val tmp = java.nio.file.Files.createTempDirectory("graft-pq-drift").toString + "/ix"
    Pq.pqIndex(corpus, "vec_id", "embedding", staleCb, nCells = 8, dims = DIMS)
      .write.mode("overwrite").partitionBy("cell").parquet(tmp)
    // the repair: retrain on the CURRENT corpus, re-encode, swap.
    // iters = 0 on the live corpus IS the canonical codebook — the
    // retrained result must equal the from-scratch build exactly
    val newCb = Pq.retrainSwapPq(spark, tmp,
      corpus.select("vec_id", "embedding"), "vec_id", "embedding", iters = 0)
    assert(canon(newCb) == canon(cb))
    assert(Pq.meanDistortionMicro(
      Pq.pqDistortion(corpus, newCb, "vec_id", "embedding")) == dTrue)
    // probe-equivalence: the retrained index under its new codebook
    // answers exactly like a from-scratch build
    val back = spark.read.parquet(tmp)
    assertSameRows(
      Pq.pqProbeAuto(probes, back, newCb, "vec_id", "embedding",
        k = 5, nProbe = 8),
      Pq.pqTopKExhaustive(probes, corpus, cb, "vec_id", "embedding", 5))
    // the STALE codebook is refused by the rotated pq_cb stamp — the
    // rotation is the point: nothing can silently score old codes
    val ex = intercept[Exception] {
      Pq.pqProbeAuto(probes, back, staleCb, "vec_id", "embedding",
        k = 3, nProbe = 2).collect()
    }
    assert(ex.getMessage.contains("pq_cb"))
    // membership guard: retraining on a corpus that is not the member
    // set refuses before the swap
    val ex2 = intercept[IllegalArgumentException] {
      Pq.retrainSwapPq(spark, tmp, corpus.limit(10), "vec_id", "embedding")
    }
    assert(ex2.getMessage.contains("member set"))
    // the refusal left the live index untouched (codes hexed: binary
    // columns compare by reference in canon)
    def snap(df: org.apache.spark.sql.DataFrame) = df.select(col("vec_id"),
      col("cell"), hex(col("pq_codes")).as("codes"))
    assertSameRows(snap(spark.read.parquet(tmp)), snap(back))
  }

  test("retrainSwapPq entry recovers a crashed swap before retraining") {
    val root = java.nio.file.Files.createTempDirectory("graft-pq-crash").toString
    val dir = root + "/ix"
    Pq.pqIndex(corpus, "vec_id", "embedding", cb, nCells = 8, dims = DIMS)
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
    // simulate a crash BETWEEN swapDirs' two renames: live renamed away
    // to .old, the fresh tmp never renamed in (and possibly incomplete)
    assert(new java.io.File(dir).renameTo(new java.io.File(dir + ".old")))
    new java.io.File(dir + ".compact.tmp").mkdirs()
    spark.catalog.refreshByPath(dir)
    val newCb = Pq.retrainSwapPq(spark, dir,
      corpus.select("vec_id", "embedding"), "vec_id", "embedding", iters = 0)
    assert(canon(newCb) == canon(cb))
    assertSameRows(
      Pq.pqProbeAuto(probes, spark.read.parquet(dir), newCb, "vec_id",
        "embedding", k = 5, nProbe = 8),
      Pq.pqTopKExhaustive(probes, corpus, cb, "vec_id", "embedding", 5))
    assert(!new java.io.File(dir + ".old").exists)
  }

  test("pqTakedown: one call purges export + index; quantizer-anchor hits rotate the codebook") {
    import java.nio.file.Files
    val exp = Files.createTempDirectory("graft-pq-td").toString + "/exp"
    val ixd = Files.createTempDirectory("graft-pq-td-ix").toString + "/ix"
    val csCols = Seq("vec_id")
    Export.shardedWrite(spark, corpus.select("vec_id", "embedding"),
      "vec_id", csCols, 4, exp)
    Pq.pqIndex(corpus, "vec_id", "embedding", cb, nCells = 8, dims = DIMS)
      .write.mode("overwrite").partitionBy("cell").parquet(ixd)
    val centIds = spark.read.parquet(ixd).filter(col("is_cent"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val anchorIds = corpus
      .select(col("vec_id"),
        graft.functions.Hashing.h60(concat(lit("pqcode:"),
          col("vec_id").cast("string"))).as("hk"))
      .orderBy("hk", "vec_id").limit(K).collect().map(_.getLong(0)).toSet
    // a plain member: neither a centroid nor a codebook anchor — the
    // cheap path: layout-preserving deletes on both halves, codebook
    // untouched (None)
    val safe = corpus.select("vec_id").collect().map(_.getLong(0))
      .find(id => !centIds.contains(id) && !anchorIds.contains(id)).get
    val r1 = Pq.pqTakedown(spark, exp, ixd, Seq(safe, 999999L).toDF("vec_id"),
      "vec_id", "embedding", csCols)
    assert(r1.isEmpty, "a plain-member takedown must keep the codebook")
    assert(Export.readShards(spark, exp).filter(col("vec_id") === safe).isEmpty)
    assert(spark.read.parquet(ixd).filter(col("vec_id") === safe).isEmpty)
    Export.verifyShards(spark, exp, csCols)
    assert(Pq.pqProbeAuto(probes, spark.read.parquet(ixd), cb, "vec_id",
      "embedding", k = 3, nProbe = 2).count() > 0,
      "the original codebook must stay valid after a member takedown")
    // a CODEBOOK ANCHOR: its subvectors live in the quantizer itself —
    // the takedown must rebuild under a fresh codebook and rotate pq_cb.
    // Drive it through the CRASH SEAM first: the index half completes
    // (rebuilt, rotated), the export delete never runs — the window
    // where an export-first ordering would downgrade the re-run to the
    // non-rotating path (anchorHit recomputed against a purged corpus)
    val victim = anchorIds.head
    intercept[IllegalStateException] {
      Pq.pqTakedown(spark, exp, ixd, Seq(victim).toDF("vec_id"),
        "vec_id", "embedding", csCols, failAfterStep = 1)
    }
    assert(spark.read.parquet(ixd).filter(col("vec_id") === victim).isEmpty,
      "index half landed before the crash")
    assert(!Export.readShards(spark, exp).filter(col("vec_id") === victim).isEmpty,
      "export half must NOT have run yet")
    // the RE-RUN must still take the rotating path (the anchor test
    // reads the pre-delete corpus, which still holds the victim) and
    // converge: same survivor set → the same deterministic codebook
    val r2 = Pq.pqTakedown(spark, exp, ixd, Seq(victim).toDF("vec_id"),
      "vec_id", "embedding", csCols)
    assert(r2.isDefined, "an anchor takedown must rotate the codebook")
    val newCb = r2.get
    val back = spark.read.parquet(ixd)
    assert(back.filter(col("vec_id") === victim).isEmpty)
    assert(Export.readShards(spark, exp).filter(col("vec_id") === victim).isEmpty)
    Export.verifyShards(spark, exp, csCols)
    // nothing derived from the deleted document survives: the new
    // codebook is exactly the from-scratch build over the survivors
    val survivors = Export.readShards(spark, exp).select("vec_id", "embedding")
    assert(canon(newCb) == canon(Pq.pqCodebook(survivors, "vec_id",
      "embedding", DIMS, NSUB, K)))
    // the old codebook is refused; the rotated one probes, with the
    // deleted ids invisible
    val ex = intercept[Exception] {
      Pq.pqProbeAuto(probes, back, cb, "vec_id", "embedding",
        k = 3, nProbe = 2).collect()
    }
    assert(ex.getMessage.contains("pq_cb"))
    val probed = Pq.pqProbeAuto(probes, back, newCb, "vec_id", "embedding",
      k = 50, nProbe = 8)
    assert(probed.count() > 0)
    assert(probed.filter(col("neighbor_id").isin(safe, victim)).isEmpty)
  }

  test("stamp validation: a codebook whose shape disagrees with the index raises") {
    val index = Pq.pqIndex(corpus, "vec_id", "embedding", cb,
      nCells = 8, dims = DIMS).localCheckpoint(true)
    val smaller = Pq.pqCodebook(corpus, "vec_id", "embedding", DIMS, NSUB, k = 8)
    val ex = intercept[Exception] {
      Pq.pqProbe(probes, index, smaller, "vec_id", "embedding",
        k = 3, nProbe = 2, nCells = 8, dims = DIMS).collect()
    }
    assert(ex.getMessage.contains("pq_k") || ex.getMessage.contains("mismatch"))
  }

  test("content-hash stamp: a SAME-SHAPE different-values codebook is refused") {
    // the dangerous case the shape stamp cannot see: a Lloyd refinement
    // of the very same codebook — identical (sub, code) grid, different
    // codeword values — would silently mis-score every ADC lookup
    val index = Pq.pqIndex(corpus, "vec_id", "embedding", cb,
      nCells = 8, dims = DIMS).localCheckpoint(true)
    val refined = Pq.pqCodebook(corpus, "vec_id", "embedding", DIMS, NSUB, K,
      iters = 5, sampleN = 450).localCheckpoint(true)
    val probeEx = intercept[Exception] {
      Pq.pqProbe(probes, index, refined, "vec_id", "embedding",
        k = 3, nProbe = 2, nCells = 8, dims = DIMS).collect()
    }
    assert(probeEx.getMessage.contains("pq_cb"))
    val extendEx = intercept[IllegalArgumentException] {
      Pq.pqIndexExtend(index, probes, "vec_id", "embedding", refined)
    }
    assert(extendEx.getMessage.contains("CONTENT"))
    // and the true codebook still probes fine
    assert(Pq.pqProbe(probes, index, cb, "vec_id", "embedding",
      k = 3, nProbe = 2, nCells = 8, dims = DIMS).count() > 0)
  }

  test("degenerate inputs: zero-norm encodes null; empty corpus yields the empty contract schema") {
    val weird = Seq(
      (1L, Array.fill(DIMS)(0.0f)),
      (2L, Array.fill(DIMS)(1.0f)),
      (3L, Array.fill(3)(1.0f))).toDF("vec_id", "embedding")
    val enc = Pq.pqEncode(weird, cb, "embedding")
      .select("vec_id", "pq_codes").collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    assert(enc(1L) == null, "zero-norm vector must encode null")
    assert(enc(2L) != null)
    assert(enc(3L) == null, "wrong-length vector must encode null")
    val empty = corpus.limit(0)
    val res = Pq.pqTopKExhaustive(probes, empty,
      Pq.pqCodebook(empty, "vec_id", "embedding", DIMS, NSUB, K),
      "vec_id", "embedding", 3)
    assert(res.isEmpty)
    assert(res.columns.toSeq == Seq("query_id", "neighbor_id", "pq_micro", "rank"))
  }
}

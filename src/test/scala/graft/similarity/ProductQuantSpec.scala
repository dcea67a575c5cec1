package graft.similarity

import org.apache.spark.sql.functions._

class ProductQuantSpec extends graft.SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.core.Tables.embeddings(spark, sf001)
  private lazy val cb = ProductQuant.buildCodebook(emb, "vec_id", "embedding",
    m = 8, ks = 16)

  test("codebook: ks seeds of full dim, subspace slices line up") {
    assert(cb.ks == 16 && cb.m == 8 && cb.dim == 64 && cb.sub == 8)
    assert(cb.slice(0, 0) == cb.seeds.head.slice(0, 8))
    assert(cb.slice(7, 3) == cb.seeds(3).slice(56, 64))
  }

  test("codes: m entries per vector, each in [0, ks)") {
    val codes = ProductQuant.encode(emb, "vec_id", "embedding", cb)
    val stats = codes.select(
      min(size($"codes")), max(size($"codes")),
      min(array_min($"codes")), max(array_max($"codes")))
      .as[(Int, Int, Int, Int)].head()
    assert(stats == ((8, 8, 0, 15)) ||
      (stats._1 == 8 && stats._2 == 8 && stats._3 >= 0 && stats._4 <= 15),
      s"stats $stats")
  }

  test("encoding is layout-invariant (pure function of the row)") {
    val a = ProductQuant.encode(emb, "vec_id", "embedding", cb)
      .as[(Long, Seq[Int])].collect().toMap
    val b = ProductQuant.encode(emb.repartition(13), "vec_id", "embedding", cb)
      .as[(Long, Seq[Int])].collect().toMap
    assert(a == b)
  }

  test("a seed vector encodes to its own codeword in every subspace") {
    // seed c is distance 0 from codeword c in every subspace, and 0 is
    // the unique min unless another seed shares the exact subvector
    val seedIds = emb
      .withColumn("__h", md5($"vec_id".cast("string")))
      .orderBy($"__h", $"vec_id").limit(16)
      .select($"vec_id").as[Long].collect().toSet
    val codes = ProductQuant.encode(emb, "vec_id", "embedding", cb)
      .filter($"vec_id".isInCollection(seedIds))
      .as[(Long, Seq[Int])].collect().toMap
    val seedVecs = emb.filter($"vec_id".isInCollection(seedIds))
      .select($"vec_id", transform($"embedding", x => x.cast("double")))
      .as[(Long, Seq[Double])].collect().toMap
    for ((id, cs) <- codes; (c, j) <- cs.zipWithIndex) {
      val decoded = cb.slice(j, c)
      val own = seedVecs(id).slice(j * cb.sub, (j + 1) * cb.sub)
      val d = decoded.zip(own).map { case (x, y) => (x - y) * (x - y) }.sum
      assert(d == 0.0, s"seed $id subspace $j decoded to a non-equal codeword")
    }
  }

  test("pqRerank with candidateK = corpus recovers brute force exactly") {
    val n = emb.count().toInt
    val qs = Seq(0L, 1L, 2L)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qs, 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    val pq = ProductQuant.pqRerankTopK(emb, "vec_id", "embedding", qs, 5, cb,
      candidateK = n)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(pq == brute)
  }

  test("ADC output contract matches the ANN family (rn 1..k, no self)") {
    val out = ProductQuant.adcTopK(emb, "vec_id", "embedding", Seq(0L, 1L), 3, cb)
      .as[(Long, Int, Long, Double)].collect()
    assert(out.length == 6)
    assert(out.groupBy(_._1).values.forall(_.map(_._2).sorted.toSeq == Seq(1, 2, 3)))
    assert(out.forall(r => r._1 != r._3))
  }

  test("IVF-PQ with full probe and full candidate pool recovers brute force") {
    val n = emb.count().toInt
    val qs = Seq(0L, 1L)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qs, 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    val ivfpq = ProductQuant.ivfPqTopK(emb, "vec_id", "embedding", qs, 5,
      nCells = 16, nProbe = 16, cb, candidateK = n)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(ivfpq == brute)
  }

  test("persisted PQ index answers identically after reload") {
    val dir = graft.core.Staging.tmpDir("pq_index")
    val codes = ProductQuant.encode(emb, "vec_id", "embedding", cb)
    ProductQuant.savePq(codes, cb, dir)
    val (codes2, cb2) = ProductQuant.loadPq(spark, dir)
    assert(cb2 == cb)
    val qs = Seq(0L, 1L)
    val before = ProductQuant.adcTopK(emb, "vec_id", "embedding", qs, 5, cb,
      Some(codes)).as[(Long, Int, Long, Double)].collect().toSet
    val after = ProductQuant.adcTopK(emb, "vec_id", "embedding", qs, 5, cb2,
      Some(codes2.select($"vec_id", $"codes")))
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(after == before)
  }

  test("codebook guards: ks bounds and divisibility") {
    intercept[IllegalArgumentException] {
      ProductQuant.buildCodebook(emb, "vec_id", "embedding", m = 8, ks = 1)
    }
    intercept[IllegalArgumentException] {
      ProductQuant.PqCodebook(Seq(Seq.fill(64)(0.0)), m = 7)
    }
  }

  test("appendToIvfPq equals a frozen-quantizer rebuild over the union, exactly") {
    import org.apache.spark.sql.functions.col
    val base = emb.filter(col("vec_id") % 3 =!= 0)
    val delta = emb.filter(col("vec_id") % 3 === 0)
    val cbB = ProductQuant.buildCodebook(base, "vec_id", "embedding",
      m = 8, ks = 16)
    val dirA = graft.core.Staging.tmpDir("ivfpq_app_a")
    ProductQuant.saveIvfPq(base, "vec_id", "embedding", nCells = 16, cbB, dirA)
    ProductQuant.appendToIvfPq(spark, dirA, delta, "vec_id", "embedding")
    val dirB = graft.core.Staging.tmpDir("ivfpq_app_b")
    ProductQuant.saveIvfPqFrozen(emb, "vec_id", "embedding",
      spark.read.parquet(s"$dirA/ivf/centroids"), cbB, dirB)
    // INDEX STATE equality: assigned rows and code rows, as sets
    def assigned(d: String) = spark.read.parquet(s"$d/ivf/assigned")
      .select(col("vec_id"), col("cell")).as[(Long, Int)].collect().toSet
    def codes(d: String) = spark.read.parquet(s"$d/pq/codes")
      .select(col("vec_id"), col("codes"), col("cell"))
      .as[(Long, Seq[Int], Int)].collect().toSet
    assert(assigned(dirA) == assigned(dirB))
    assert(codes(dirA) == codes(dirB))
    assert(assigned(dirA).map(_._1) ==
      emb.select(col("vec_id")).as[Long].collect().toSet)
    // QUERY equality through the indexed path
    val qs = Seq(0L, 1L, 2L, 3L)
    def q(d: String) = ProductQuant.ivfPqTopKIndexed(spark, d, "vec_id",
      "embedding", qs, 5, nProbe = 8, candidateK = 100)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(q(dirA) == q(dirB))
  }

  test("removeFromIvfPq equals a frozen rebuild over survivors; emptied cells vanish") {
    import org.apache.spark.sql.functions.col
    val dirA = graft.core.Staging.tmpDir("ivfpq_rm_a")
    ProductQuant.saveIvfPq(emb, "vec_id", "embedding", nCells = 16, cb, dirA)
    // removal set: every 5th id PLUS one whole cell's membership —
    // the emptied-cell partition must be deleted, not left stale
    // (dynamic overwrite cannot write an empty partition)
    val assigned0 = spark.read.parquet(s"$dirA/ivf/assigned")
    val victimCell = assigned0.select(col("cell")).as[Int].head()
    val removeIds = assigned0
      .filter(col("cell") === victimCell || col("vec_id") % 5 === 0)
      .select(col("vec_id"))
    // snapshot before the removal rewrites the files this frame reads
    val removed = removeIds.as[Long].collect().toSet
    ProductQuant.removeFromIvfPq(spark, dirA, removeIds, "vec_id")
    assert(!new java.io.File(s"$dirA/ivf/assigned/cell=$victimCell").exists(),
      "emptied assigned partition must be deleted")
    assert(!new java.io.File(s"$dirA/pq/codes/cell=$victimCell").exists(),
      "emptied codes partition must be deleted")
    val dirB = graft.core.Staging.tmpDir("ivfpq_rm_b")
    ProductQuant.saveIvfPqFrozen(
      emb.filter(!col("vec_id").isInCollection(removed.toSeq)),
      "vec_id", "embedding",
      spark.read.parquet(s"$dirA/ivf/centroids"), cb, dirB)
    def assigned(d: String) = spark.read.parquet(s"$d/ivf/assigned")
      .select(col("vec_id"), col("cell")).as[(Long, Int)].collect().toSet
    def codes(d: String) = spark.read.parquet(s"$d/pq/codes")
      .select(col("vec_id"), col("codes"), col("cell"))
      .as[(Long, Seq[Int], Int)].collect().toSet
    assert(assigned(dirA) == assigned(dirB))
    assert(codes(dirA) == codes(dirB))
    // survivors only, and none of the removed ids remain
    assert(assigned(dirA).map(_._1).intersect(removed).isEmpty)
    // indexed queries over surviving query ids agree
    val qs = assigned(dirA).map(_._1).toSeq.sorted.take(3)
    def q(d: String) = ProductQuant.ivfPqTopKIndexed(spark, d, "vec_id",
      "embedding", qs, 5, nProbe = 8, candidateK = 100)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(q(dirA) == q(dirB))
  }

  test("persisted IVF-PQ index answers identically to the in-memory path") {
    val dir = graft.core.Staging.tmpDir("ivfpq_index")
    ProductQuant.saveIvfPq(emb, "vec_id", "embedding", nCells = 16, cb, dir)
    val qs = Seq(0L, 1L, 2L)
    val mem = ProductQuant.ivfPqTopK(emb, "vec_id", "embedding", qs, 5,
      nCells = 16, nProbe = 8, cb, candidateK = 100)
      .as[(Long, Int, Long, Double)].collect().toSet
    val disk = ProductQuant.ivfPqTopKIndexed(spark, dir, "vec_id", "embedding",
      qs, 5, nProbe = 8, candidateK = 100)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(disk == mem)
  }

  test("trained codebook: ks full-dim seeds whose slices are the subspace centroids") {
    val tcb = ProductQuant.buildCodebookTrained(emb, "vec_id", "embedding",
      m = 4, ks = 8, iters = 2, dim = 64)
    assert(tcb.ks == 8 && tcb.m == 4 && tcb.dim == 64 && tcb.sub == 16)
    // slice(j, c) must equal the subspace-j kmeans centroid for cell c
    val m0 = Similarity.kmeansTrain(
      emb.select($"vec_id", slice($"embedding", 1, 16).as("__sv")),
      "vec_id", "__sv", k = 8, iters = 2, dim = 16)
    val c3 = m0.centroids.filter($"cell" === 3)
      .select($"centroid").as[Seq[Double]].head()
    assert(tcb.slice(0, 3) == c3)
  }

  test("trained artifacts ride the full index lifecycle: save -> append == frozen rebuild") {
    // the v14 invariance holds for ANY frozen quantizer; this arm
    // proves it with LLOYD-TRAINED centroids and codebooks, closing
    // the loop between v16/v17 (trained artifacts) and v14 (lifecycle)
    val tcb = ProductQuant.buildCodebookTrained(emb, "vec_id", "embedding",
      m = 4, ks = 8, iters = 2, dim = 64)
    val cents = Similarity.kmeansTrain(emb, "vec_id", "embedding",
      k = 8, iters = 2, dim = 64).centroids.localCheckpoint()
    val base = emb.filter($"vec_id" % 3 =!= 0)
    val extra = emb.filter($"vec_id" % 3 === 0)
    val incDir = graft.core.Staging.tmpDir("ivfpq_trained_inc")
    ProductQuant.saveIvfPqFrozen(base, "vec_id", "embedding", cents, tcb, incDir)
    ProductQuant.appendToIvfPq(spark, incDir, extra, "vec_id", "embedding")
    val fullDir = graft.core.Staging.tmpDir("ivfpq_trained_full")
    ProductQuant.saveIvfPqFrozen(emb, "vec_id", "embedding", cents, tcb, fullDir)
    def codes(d: String) = spark.read.parquet(s"$d/pq/codes")
      .select($"vec_id", $"cell", $"codes".cast("array<int>"))
      .as[(Long, Int, Seq[Int])].collect().toSet
    assert(codes(incDir) == codes(fullDir))
    assert(codes(incDir).nonEmpty)
    def q(d: String) = ProductQuant.ivfPqTopKIndexed(spark, d, "vec_id",
      "embedding", Seq(1L, 2L), 5, nProbe = 4, candidateK = 50)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(q(incDir) == q(fullDir))
  }

  test("trained PQ recall@5 >= seed-pick recall@5 (the v19 re-measure)") {
    val ids = (0L until 10L).toSeq
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", ids, k = 5)
      .select($"query_id", $"neighbor_id")
    val candidates = math.max(100L, emb.count() / 5).toInt
    def recallOf(book: ProductQuant.PqCodebook): Long =
      brute.intersect(
        ProductQuant.pqRerankTopK(emb, "vec_id", "embedding", ids, k = 5,
          book, candidateK = candidates)
          .select($"query_id", $"neighbor_id")).count()
    val seedPick = recallOf(cb)
    val trained = recallOf(ProductQuant.buildCodebookTrained(
      emb, "vec_id", "embedding", m = 8, ks = 16, iters = 2, dim = 64))
    info(s"recall@5 x50: seed-pick=$seedPick trained=$trained")
    // trained codewords are inertia-minimizing per subspace; the seed
    // pick is their own init, so training should never lose recall on
    // a fixed candidate budget. Floor mirrors the v19 gate's 0.5.
    assert(trained >= seedPick,
      s"training lost recall: trained=$trained < seedPick=$seedPick")
    assert(trained >= 25, s"trained recall@5 below the 0.5 gate floor: $trained/50")
  }

  test("residual ADC recall@5 >= raw-code trained recall@5 (v23 vs v20)") {
    val ids = (0L until 10L).toSeq
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", ids, k = 5)
      .select($"query_id", $"neighbor_id")
    val candidates = math.max(100L, emb.count() / 5).toInt
    val raw = brute.intersect(
      ProductQuant.ivfPqTopKTrained(emb, "vec_id", "embedding", ids, k = 5,
        nCells = 16, nProbe = 8, ProductQuant.buildCodebookTrained(
          emb, "vec_id", "embedding", m = 8, ks = 16, iters = 2, dim = 64),
        candidateK = candidates, iters = 2, dim = 64)
        .select($"query_id", $"neighbor_id")).count()
    val residual = brute.intersect(
      ProductQuant.ivfPqResidualTopKTrained(emb, "vec_id", "embedding", ids,
        k = 5, nCells = 16, nProbe = 8, m = 8, ks = 16,
        candidateK = candidates, iters = 2, dim = 64)
        .select($"query_id", $"neighbor_id")).count()
    info(s"recall@5 x50: raw-code=$raw residual=$residual")
    // residual codes spend the same bit budget on within-cell variance
    // only — the IVFADC claim: never worse than raw codes at the same
    // dials, and above the v23 gate's 0.5 floor
    assert(residual >= raw,
      s"residual encoding lost recall: residual=$residual < raw=$raw")
    assert(residual >= 25,
      s"residual recall@5 below the 0.5 gate floor: $residual/50")
  }

  test("int8 refine rung holds recall at half the exact-rerank budget (v26 vs v23 dials)") {
    val ids = (0L until 10L).toSeq
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", ids, k = 5)
      .select($"query_id", $"neighbor_id")
    val candidates = math.max(100L, emb.count() / 5).toInt
    val idx = Similarity.buildIvfTrained(emb, "vec_id", "embedding",
      nCentroids = 16, iters = 2, dim = 64)
    val rcb = ProductQuant.buildCodebookResidual(idx, "vec_id", "embedding",
      m = 8, ks = 16, iters = 2, dim = 64)
    val plain = brute.intersect(
      ProductQuant.ivfPqResidualTopK(idx, "vec_id", "embedding", ids,
        k = 5, nProbe = 8, rcb, candidateK = candidates)
        .select($"query_id", $"neighbor_id")).count()
    val refined = brute.intersect(
      ProductQuant.ivfPqResidualRefineTopK(idx, "vec_id", "embedding", ids,
        k = 5, nProbe = 8, rcb, candidateK = candidates,
        refineK = math.max(50, candidates / 2))
        .select($"query_id", $"neighbor_id")).count()
    info(s"recall@5 x50: plain-residual=$plain int8-refined=$refined")
    // the FAISS refine claim: int8 cosines track float closely enough
    // that halving the exact-rerank budget through the int8 layer
    // loses nothing — so candidateK can grow without growing the
    // full-precision stage
    assert(refined >= plain,
      s"int8 refine lost recall: refined=$refined < plain=$plain")
    assert(refined >= 25,
      s"refined recall@5 below the 0.5 gate floor: $refined/50")
  }

  test("refine query plan: every join broadcast-shaped (int8 table scanned in place)") {
    val idx = Similarity.buildIvfTrained(emb, "vec_id", "embedding",
      nCentroids = 8, iters = 2, dim = 64)
    val rcb = ProductQuant.buildCodebookResidual(idx, "vec_id", "embedding",
      m = 4, ks = 8, iters = 2, dim = 64)
    val q = ProductQuant.ivfPqResidualRefineTopK(idx, "vec_id", "embedding",
      Seq(1L, 2L), k = 5, nProbe = 4, rcb, candidateK = 50, refineK = 20)
    q.collect() // audit the FINAL adaptive plan (CLAUDE.md trap)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"refine serving must keep every join broadcast-shaped:\n$plan")
  }

  test("refine serving from disk == in-memory refine over the same corpus") {
    val idx = Similarity.buildIvfTrained(emb, "vec_id", "embedding",
      nCentroids = 8, iters = 2, dim = 64)
    val rcb = ProductQuant.buildCodebookResidual(idx, "vec_id", "embedding",
      m = 4, ks = 8, iters = 2, dim = 64)
    val dir = graft.core.Staging.tmpDir("spec_refine_disk")
    ProductQuant.saveIvfPqResidualRefineFrozen(emb, "vec_id", "embedding",
      idx.centroids, rcb, dir)
    val mem = ProductQuant.ivfPqResidualRefineTopK(idx, "vec_id",
      "embedding", Seq(1L, 2L), k = 5, nProbe = 4, rcb,
      candidateK = 50, refineK = 20)
      .as[(Long, Int, Long, Double)].collect().toSet
    val disk = ProductQuant.ivfPqResidualRefineTopKIndexed(spark, dir,
      "vec_id", "embedding", Seq(1L, 2L), k = 5, nProbe = 4,
      candidateK = 50, refineK = 20)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(mem.nonEmpty && mem == disk)
  }

  test("refine lifecycle: append + remove keep the int8 layer == frozen rebuilds") {
    val base = emb.filter($"vec_id" % 4 =!= 0)
    val delta = emb.filter($"vec_id" % 4 === 0)
    val idx = Similarity.buildIvfTrained(base, "vec_id", "embedding",
      nCentroids = 8, iters = 2, dim = 64)
    val rcb = ProductQuant.buildCodebookResidual(idx, "vec_id", "embedding",
      m = 4, ks = 8, iters = 2, dim = 64)
    val incDir = graft.core.Staging.tmpDir("spec_refine_inc")
    ProductQuant.saveIvfPqResidualRefineFrozen(base, "vec_id", "embedding",
      idx.centroids, rcb, incDir)
    ProductQuant.appendToIvfPqResidualRefine(spark, incDir, delta,
      "vec_id", "embedding")
    def ref(d: String) = spark.read.parquet(s"$d/refine")
      .select($"vec_id", $"cell".cast("int"), concat_ws(",", $"qvec"))
      .as[(Long, Int, String)].collect().toSet
    def codes(d: String) = spark.read.parquet(s"$d/pq/codes")
      .select($"vec_id", $"cell".cast("int"), concat_ws(",", $"codes"))
      .as[(Long, Int, String)].collect().toSet
    val fullDir = graft.core.Staging.tmpDir("spec_refine_full")
    ProductQuant.saveIvfPqResidualRefineFrozen(emb, "vec_id", "embedding",
      spark.read.parquet(s"$incDir/ivf/centroids"), rcb, fullDir)
    assert(ref(incDir).nonEmpty && ref(incDir) == ref(fullDir))
    assert(codes(incDir) == codes(fullDir))
    // removal prunes all THREE artifacts by (id, cell)
    ProductQuant.removeFromIvfPqRefine(spark, incDir,
      delta.select($"vec_id"), "vec_id")
    val baseDir = graft.core.Staging.tmpDir("spec_refine_base")
    ProductQuant.saveIvfPqResidualRefineFrozen(base, "vec_id", "embedding",
      spark.read.parquet(s"$fullDir/ivf/centroids"), rcb, baseDir)
    assert(ref(incDir) == ref(baseDir))
    assert(codes(incDir) == codes(baseDir))
  }

  test("residual codes are layout-invariant and never drop assigned rows") {
    val idx = Similarity.buildIvfTrained(emb, "vec_id", "embedding",
      nCentroids = 8, iters = 2, dim = 64)
    val rcb = ProductQuant.buildCodebookResidual(idx, "vec_id", "embedding",
      m = 4, ks = 8, iters = 2, dim = 64)
    val a = ProductQuant.encodeResidual(idx, "vec_id", "embedding", rcb)
      .select($"vec_id", $"cell", $"codes".cast("array<int>"))
      .as[(Long, Int, Seq[Int])].collect().toSet
    val shuffled = Similarity.IvfIndex(idx.assigned.repartition(13),
      idx.centroids)
    val b = ProductQuant.encodeResidual(shuffled, "vec_id", "embedding", rcb)
      .select($"vec_id", $"cell", $"codes".cast("array<int>"))
      .as[(Long, Int, Seq[Int])].collect().toSet
    assert(a == b, "residual encoding must be a pure function of the row")
    // every assigned row is encoded — the index never loses a vector
    assert(a.size == idx.assigned.count())
    assert(a.forall { case (_, _, codes) =>
      codes.size == 4 && codes.forall(c => c >= 0 && c < 8) })
  }

  test("IVFADC lifecycle: append == frozen rebuild; remove == rebuild over survivors") {
    val base = emb.filter($"vec_id" % 4 =!= 0)
    val delta = emb.filter($"vec_id" % 4 === 0)
    val idx = Similarity.buildIvfTrained(base, "vec_id", "embedding",
      nCentroids = 8, iters = 2, dim = 64)
    val rcb = ProductQuant.buildCodebookResidual(idx, "vec_id", "embedding",
      m = 4, ks = 8, iters = 2, dim = 64)
    val incDir = graft.core.Staging.tmpDir("spec_ivfadc_inc")
    ProductQuant.saveIvfPqResidualFrozen(base, "vec_id", "embedding",
      idx.centroids, rcb, incDir)
    ProductQuant.appendToIvfPqResidual(spark, incDir, delta, "vec_id",
      "embedding")
    def codes(d: String) = spark.read.parquet(s"$d/pq/codes")
      .select($"vec_id", $"cell".cast("int"), $"codes".cast("array<int>"))
      .as[(Long, Int, Seq[Int])].collect().toSet
    val fullDir = graft.core.Staging.tmpDir("spec_ivfadc_full")
    ProductQuant.saveIvfPqResidualFrozen(emb, "vec_id", "embedding",
      spark.read.parquet(s"$incDir/ivf/centroids"), rcb, fullDir)
    assert(codes(incDir) == codes(fullDir))
    assert(codes(incDir).nonEmpty)
    // removal is code-agnostic (prunes by id within affected cells):
    // remove the delta again == the base-only frozen artifact
    ProductQuant.removeFromIvfPq(spark, incDir,
      delta.select($"vec_id"), "vec_id")
    val baseDir = graft.core.Staging.tmpDir("spec_ivfadc_base")
    ProductQuant.saveIvfPqResidualFrozen(base, "vec_id", "embedding",
      spark.read.parquet(s"$fullDir/ivf/centroids"), rcb, baseDir)
    assert(codes(incDir) == codes(baseDir))
  }

  test("persisted IVFADC index answers identically to the in-memory residual path") {
    val idx = Similarity.buildIvfTrained(emb, "vec_id", "embedding",
      nCentroids = 8, iters = 2, dim = 64)
    val rcb = ProductQuant.buildCodebookResidual(idx, "vec_id", "embedding",
      m = 4, ks = 8, iters = 2, dim = 64)
    val dir = graft.core.Staging.tmpDir("spec_ivfadc_idx")
    ProductQuant.saveIvfPqResidualFrozen(emb, "vec_id", "embedding",
      idx.centroids, rcb, dir)
    val ids = Seq(1L, 2L, 3L)
    val mem = ProductQuant.ivfPqResidualTopK(idx, "vec_id", "embedding",
      ids, k = 5, nProbe = 4, rcb, candidateK = 50)
      .as[(Long, Int, Long, Double)].collect().toSet
    val disk = ProductQuant.ivfPqResidualTopKIndexed(spark, dir,
      "vec_id", "embedding", ids, k = 5, nProbe = 4, candidateK = 50)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(mem == disk, "disk-served IVFADC must equal the in-memory path")
    assert(mem.nonEmpty)
  }

  test("IVFADC bits dial: recall@5 non-decreasing from m=4/ks=8 to m=8/ks=16") {
    val ids = (0L until 10L).toSeq
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", ids, k = 5)
      .select($"query_id", $"neighbor_id")
    val candidates = math.max(100L, emb.count() / 5).toInt
    def recallAt(m: Int, ks: Int): Long = brute.intersect(
      ProductQuant.ivfPqResidualTopKTrained(emb, "vec_id", "embedding", ids,
        k = 5, nCells = 16, nProbe = 8, m = m, ks = ks,
        candidateK = candidates, iters = 2, dim = 64)
        .select($"query_id", $"neighbor_id")).count()
    val low = recallAt(4, 8)    // 12 code bits
    val high = recallAt(8, 16)  // 32 code bits
    info(s"recall@5 x50: m4/ks8=$low m8/ks16=$high")
    // more code bits describe within-cell variance more finely — the
    // dial a deployment turns when recall at a given probe budget is
    // short; pinned empirically like every recall arm
    assert(high >= low, s"more bits lost recall: $high < $low")
  }

  test("IVFADC serving plan: no sort-merge join — the corpus never reshuffles per query") {
    val idx = Similarity.buildIvfTrained(emb, "vec_id", "embedding",
      nCentroids = 8, iters = 2, dim = 64)
    val rcb = ProductQuant.buildCodebookResidual(idx, "vec_id", "embedding",
      m = 4, ks = 8, iters = 2, dim = 64)
    val dir = graft.core.Staging.tmpDir("spec_ivfadc_plan")
    ProductQuant.saveIvfPqResidualFrozen(emb, "vec_id", "embedding",
      idx.centroids, rcb, dir)
    val q = ProductQuant.ivfPqResidualTopKIndexed(spark, dir,
      "vec_id", "embedding", Seq(1L, 2L), k = 5, nProbe = 4,
      candidateK = 50)
    q.collect() // audit the FINAL adaptive plan (CLAUDE.md trap)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"IVFADC serving must keep every join broadcast-shaped:\n$plan")
  }

  test("a vector ON its centroid (zero residual) is excluded from training but still encoded") {
    val corpus = Seq(
      (0L, Array(1.0f, 1.0f)),   // == centroid: residual (0, 0)
      (1L, Array(3.0f, 1.0f)),   // residual (2, 0)
      (2L, Array(5.0f, 7.0f))).toDF("vec_id", "embedding") // residual (4, 6)
    val cents = Seq((0, Seq(1.0, 1.0))).toDF("cell", "centroid")
    val idx = Similarity.IvfIndex(
      Similarity.assignToCentroids(corpus, "vec_id", "embedding", cents),
      cents)
    val rcb = ProductQuant.buildCodebookResidual(idx, "vec_id", "embedding",
      m = 1, ks = 2, iters = 1, dim = 2)
    val coded = ProductQuant.encodeResidual(idx, "vec_id", "embedding", rcb)
      .select($"vec_id", $"codes".cast("array<int>"))
      .as[(Long, Seq[Int])].collect().toMap
    // the zero-residual row cannot train a codeword (scorable filter)
    // but MUST still be indexed — encodeResidual has no re-filter
    assert(coded.keySet == Set(0L, 1L, 2L))
    assert(coded(0L).size == 1 && coded(1L).size == 1 && coded(2L).size == 1)
    // zero residual sits nearer the (2,0)-side codeword than (4,6)'s
    assert(coded(0L) == coded(1L) && coded(0L) != coded(2L))
  }
}

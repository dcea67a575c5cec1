package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),  // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),  // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f)), // opposite of 0
    (4L, Array(2.0f, 0.0f, 0.0f))   // colinear with 0
  ).toDF("vec_id", "embedding")

  test("native dot_product is bit-identical to the HOF fold on real embeddings") {
    val emb = graft.core.Tables.embeddings(spark, sf0001).limit(200).cache()
    val a = emb.select($"vec_id".as("a_id"), $"embedding".as("a"))
    val b = emb.select($"vec_id".as("b_id"), $"embedding".as("b"))
    val pairs = a.crossJoin(b).limit(5000)
    val diffs = pairs.select(
      Similarity.dot($"a", $"b").as("fast"),
      Similarity.dotFold($"a", $"b").as("ref"))
      .filter($"fast" =!= $"ref")
    assert(diffs.isEmpty, "codegen dot product diverged from reference fold")
  }

  test("dot_product: null on length mismatch, works for double arrays") {
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    assert(df.select(Similarity.dot($"a", $"b")).as[Double].head() == 11.0)
    val bad = Seq((Array(1.0, 2.0), Array(3.0))).toDF("a", "b")
    assert(bad.select(Similarity.dot($"a", $"b")).head().isNullAt(0))
  }

  test("dot_product: NULL array element propagates like the fold / oracle") {
    val df = Seq((Array[java.lang.Double](1.0, null), Array[java.lang.Double](3.0, 4.0)))
      .toDF("a", "b")
    assert(df.select(Similarity.dot($"a", $"b")).head().isNullAt(0))
    assert(df.select(Similarity.dotFold($"a", $"b")).head().isNullAt(0))
  }

  test("cosine: identity / orthogonal / opposite / scale-invariant") {
    def cos(a: Int, b: Int): Double = {
      val x = vecs.filter($"vec_id" === a).select($"embedding".as("x"))
      val y = vecs.filter($"vec_id" === b).select($"embedding".as("y"))
      x.crossJoin(y).select(Similarity.cosine($"x", $"y")).as[Double].head()
    }
    assert(math.abs(cos(0, 4) - 1.0) < 1e-12)
    assert(cos(0, 2) == 0.0)
    assert(math.abs(cos(0, 3) + 1.0) < 1e-12)
    assert(cos(0, 1) > 0.99 && cos(0, 1) < 1.0)
  }

  test("bruteForceTopK ranks by similarity with id tiebreak") {
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", Seq(0L), k = 3)
      .orderBy($"rn").select($"neighbor_id").as[Long].collect()
    assert(top.toSeq == Seq(4L, 1L, 2L)) // colinear first, near second, orthogonal third
  }

  test("hardNegatives excludes positives above the threshold, ranks the rest") {
    // vs query 0: vec 4 (cos 1.0) and vec 1 (cos ~0.994) are positives
    // at threshold 0.9; vec 2 (0.0) and vec 3 (-1.0) are the negatives.
    val hn = Similarity.hardNegatives(vecs, "vec_id", "embedding",
      Seq(0L), k = 3, posThreshold = 0.9)
      .orderBy($"rn").as[(Long, Int, Long, Double)].collect()
    assert(hn.map(_._3).toSeq == Seq(2L, 3L), "only sub-threshold vectors survive")
    assert(hn.forall(_._4 < 0.9))
    // and it is exactly brute-force-then-filter (same scoring contract)
    val brute = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", Seq(0L), k = 5)
      .filter($"cos_sim" < 0.9).orderBy($"cos_sim".desc, $"neighbor_id")
      .select($"neighbor_id").as[Long].collect().toSeq
    assert(hn.map(_._3).toSeq == brute)
  }

  test("retrievalEval: hits, first-hit rank, exact rr60, total-miss row") {
    val truth = Seq((0L, 1, 10L), (0L, 2, 11L), (0L, 3, 12L),
      (7L, 1, 20L), (7L, 2, 21L)).toDF("query_id", "rn", "neighbor_id")
    // q0: system hits truth at ranks 2 (11) and 3 (12) → n_hits 2,
    // first hit rank 2, rr60 = 30. q7: no overlap → all-zero row.
    val sys = Seq((0L, 1, 99L), (0L, 2, 11L), (0L, 3, 12L),
      (7L, 1, 98L), (7L, 2, 97L)).toDF("query_id", "rn", "neighbor_id")
    val out = Similarity.retrievalEval(truth, sys)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(0L) == ((0L, 2L, 2L, 30L)))
    assert(out(7L) == ((7L, 0L, 0L, 0L)))
    // rr60 is exact for every possible rank 1..5
    assert(Seq(1, 2, 3, 4, 5).map(60 / _) == Seq(60, 30, 20, 15, 12))
  }

  test("retrievalEval: rr60 floor contract holds past rank 6 (k > 6 callers)") {
    // rank 7 does not divide 60: Spark's long cast truncates (8) while
    // DuckDB's rounds (9) — the explicit floor pins BOTH engines to 8.
    // first hit at system rank 7 of a k=8 result list.
    val truth = Seq((0L, 1, 10L)).toDF("query_id", "rn", "neighbor_id")
    val sys = (1 to 8).map(r => (0L, r, if (r == 7) 10L else 90L + r))
      .toDF("query_id", "rn", "neighbor_id")
    val out = Similarity.retrievalEval(truth, sys)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((0L, 1L, 7L, 8L)))
    // floor(60/r) for r in 7..10 — the contract the oracle mirrors
    assert(Seq(7, 8, 9, 10).map(r => math.floor(60.0 / r).toLong) ==
      Seq(8L, 7L, 6L, 6L))
  }

  test("signBucket groups colinear vectors; lshTopK stays within bucket") {
    val dims = Seq(0, 1)
    val buckets = vecs.select($"vec_id", Similarity.signBucket($"embedding", dims).as("b"))
      .as[(Long, String)].collect().toMap
    assert(buckets(0L) == buckets(4L))
    assert(buckets(0L) != buckets(3L))
    val top = Similarity.lshTopK(vecs, "vec_id", "embedding", Seq(0L), k = 5, dims)
      .select($"neighbor_id").as[Long].collect().toSet
    assert(top.contains(4L) && !top.contains(3L))
  }

  test("ivfTopK with full probing recovers the brute-force neighbors") {
    val emb = graft.core.Tables.embeddings(spark, sf0001).cache()
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", Seq(0L, 1L), k = 3)
      .select($"query_id", $"rn", $"neighbor_id").as[(Long, Int, Long)].collect().toSet
    // probe every cell → IVF must equal brute force exactly
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", Seq(0L, 1L),
      k = 3, nCentroids = 4, nProbe = 4)
      .select($"query_id", $"rn", $"neighbor_id").as[(Long, Int, Long)].collect().toSet
    assert(ivf == brute)
    // partial probing returns a subset of cells' candidates, k rows max
    val partial = Similarity.ivfTopK(emb, "vec_id", "embedding", Seq(0L), 3, 4, 1)
    assert(partial.count() <= 3)
  }

  test("groupCentroids: exact mean within 1e-9 quantization, incl. negatives") {
    val emb = Seq(
      (1, Seq(1.0f, -2.0f)), (1, Seq(3.0f, -4.0f)), // centroid (2, -3)
      (2, Seq(0.5f, 0.25f))                         // singleton: itself
    ).toDF("label", "embedding")
    val rows = Similarity.groupCentroids(emb, "label", "embedding", dim = 2)
      .select($"label", $"dim", $"centroid", $"n")
      .as[(Int, Int, Double, Long)].collect()
      .map { case (l, d, c, n) => (l, d) -> (c, n) }.toMap
    assert(math.abs(rows((1, 1))._1 - 2.0) <= 1e-9 && rows((1, 1))._2 == 2)
    assert(math.abs(rows((1, 2))._1 - -3.0) <= 1e-9)
    assert(math.abs(rows((2, 1))._1 - 0.5) <= 1e-9 && rows((2, 1))._2 == 1)
    assert(math.abs(rows((2, 2))._1 - 0.25) <= 1e-9)
  }

  test("nearDupPairs finds only the colinear pair at 0.999") {
    val pairs = Similarity.nearDupPairs(vecs, "vec_id", "embedding", 0.999, Seq(0, 1))
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 4L))) // (0,1)/(1,4) sit at cos ≈ 0.9939, below 0.999
  }

  test("nearDupPairs star cap: a 40-member bucket emits rep-member pairs only") {
    // 40 identical vectors (ids 1..40) land in one sign bucket — over
    // the default cap of 32 → star pairs against rep id 1. A 3-member
    // bucket (negative first dim) stays under the cap → full pairwise.
    val cluster = spark.range(1, 41)
      .select($"id".as("vec_id"),
        array(lit(1.0f), lit(0.5f), lit(0.25f)).as("embedding"))
    val small = Seq(
      (101L, Array(-1.0f, 0.5f, 0.2f)),
      (102L, Array(-1.0f, 0.6f, 0.2f)),
      (103L, Array(-1.0f, 0.5f, 0.3f))).toDF("vec_id", "embedding")
    val pairs = Similarity.nearDupPairs(cluster.union(small),
      "vec_id", "embedding", threshold = 0.9, dims = Seq(0, 1, 2))
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val clusterPairs = pairs.filter(_._2 <= 40L)
    assert(clusterPairs == (2L to 40L).map(j => (1L, j)).toSet) // O(m), rep-anchored
    assert(pairs.filter(_._1 > 40L) == Set((101L, 102L), (101L, 103L), (102L, 103L)))
  }

  test("IVF index persists: saved+loaded index answers exactly like the fresh one") {
    val emb = graft.core.Tables.embeddings(spark, sf0001).cache()
    val idx = Similarity.buildIvf(emb, "vec_id", "embedding", nCentroids = 8)
    val dir = graft.core.Staging.tmpDir("ivf_idx")
    Similarity.saveIvf(idx, dir)
    val loaded = Similarity.loadIvf(spark, dir)
    val fresh = Similarity.ivfTopKIndexed(idx, "vec_id", "embedding",
      Seq(0L, 1L, 2L), k = 5, nProbe = 8)
      .collect().map(_.toString).toSet
    val reread = Similarity.ivfTopKIndexed(loaded, "vec_id", "embedding",
      Seq(0L, 1L, 2L), k = 5, nProbe = 8)
      .collect().map(_.toString).toSet
    assert(fresh == reread && fresh.nonEmpty)
    // the persisted corpus copy is cell-partitioned (probe = partition prune)
    val dirs = new java.io.File(s"$dir/assigned").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("cell=")))
  }

  test("quantizeInt8: values in [-127,127], scale inverts within half a step") {
    val emb = graft.core.Tables.embeddings(spark, sf0001).limit(100)
    val qz = Similarity.quantizeInt8(emb, "embedding")
    val bad = qz.select(explode(arrays_zip($"embedding", $"qvec")).as("z"), $"qscale")
      .select($"z.embedding".cast("double").as("x"),
        $"z.qvec".cast("double").as("q"), $"qscale")
      .filter(abs($"q") > 127 || abs($"q" * $"qscale" - $"x") > $"qscale" * 0.5 + lit(1e-12))
    assert(bad.isEmpty, s"quantization out of bounds: ${bad.head(3).mkString(",")}")
  }

  test("int8 cosine tracks float cosine within 0.02 on real embeddings") {
    val emb = graft.core.Tables.embeddings(spark, sf0001).limit(60).cache()
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", Seq(0L, 1L), k = 20)
      .select($"query_id", $"neighbor_id", $"cos_sim".as("c_f"))
    val quant = Similarity.int8TopK(emb, "vec_id", "embedding", Seq(0L, 1L), k = 20)
      .select($"query_id", $"neighbor_id", $"cos_sim".as("c_q"))
    val joined = exact.join(quant, Seq("query_id", "neighbor_id"))
    val maxErr = joined.agg(max(abs($"c_f" - $"c_q"))).as[Double].head()
    assert(maxErr <= 0.02, s"int8 cosine drifted: $maxErr")
  }

  test("semDedup drops near-dup copies, keeps the min-id, keeps dissimilar vectors") {
    // three planted near-identical vectors (ids 100 < 200 < 300) plus
    // dissimilar fixture vectors — only the min-id copy survives
    val base = graft.core.Tables.embeddings(spark, sf0001).limit(40)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("embedding"))
    val v0 = base.filter($"vec_id" === 0).select($"embedding").head().getSeq[Double](0)
    import spark.implicits._
    val copies = Seq(100L, 200L, 300L).map(id => (id, v0.map(_ * 1.001)))
      .toDF("vec_id", "embedding")
    val corpus = base.filter($"vec_id" > 0).union(copies)
    val r = Similarity.semDedup(corpus, "vec_id", "embedding",
      threshold = 0.95, nCentroids = 4, bucketCap = 64)
    val kept = r.filter($"keep").select($"vec_id").as[Long].collect().toSet
    assert(kept.contains(100L) && !kept.contains(200L) && !kept.contains(300L))
    // kept + dropped partitions the corpus
    assert(r.count() == corpus.count())
    // dissimilar fixture vectors survive
    assert(r.filter($"keep" && $"vec_id" < 100).count() >= 30)
  }

  test("semDedup star regime agrees with full pairwise on a homogeneous megacell") {
    import spark.implicits._
    // 50 copies of one vector: with any cap, exactly the min id survives
    val vec = Array.tabulate(8)(i => 0.1 * (i + 1))
    val corpus = (1L to 50L).map(id => (id, vec.map(x => x * (1 + id * 1e-6)).toSeq))
      .toDF("vec_id", "embedding")
    def kept(cap: Int) = Similarity.semDedup(corpus, "vec_id", "embedding",
        threshold = 0.99, nCentroids = 2, bucketCap = cap)
      .filter($"keep").select($"vec_id").as[Long].collect().toSet
    assert(kept(cap = 2) == Set(1L))
    assert(kept(cap = 64) == Set(1L))
  }

  test("trained-quantizer IVF recall@5 >= hash-init recall@5 (the v18 re-measure)") {
    val emb = graft.core.Tables.embeddings(spark, sf001).cache()
    val ids = (0L until 10L).toSeq
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", ids, k = 5)
      .select($"query_id", $"neighbor_id")
    def recallOf(idx: Similarity.IvfIndex): Long =
      brute.intersect(
        Similarity.ivfTopKIndexed(idx, "vec_id", "embedding", ids,
          k = 5, nProbe = 4)
          .select($"query_id", $"neighbor_id")).count()
    val hashInit = recallOf(
      Similarity.buildIvfHashInit(emb, "vec_id", "embedding", nCentroids = 16))
    val trained = recallOf(
      Similarity.buildIvfTrained(emb, "vec_id", "embedding",
        nCentroids = 16, iters = 2, dim = 64))
    info(s"recall@5 x50: hash-init=$hashInit trained=$trained")
    // Lloyd rounds only ever lower inertia from the hash-init seeds,
    // so trained cells should never probe WORSE than the seeds they
    // started from; the absolute floor mirrors the v18 gate's 0.5
    assert(trained >= hashInit,
      s"training lost recall: trained=$trained < hashInit=$hashInit")
    assert(trained >= 25, s"trained recall@5 below the 0.5 gate floor: $trained/50")
    emb.unpersist()
  }

  test("trained IVF recall@5 is monotone non-decreasing in nProbe (1,2,4,8)") {
    val emb = graft.core.Tables.embeddings(spark, sf001).cache()
    val ids = (0L until 10L).toSeq
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", ids, k = 5)
      .select($"query_id", $"neighbor_id")
    val idx = Similarity.buildIvfTrained(emb, "vec_id", "embedding",
      nCentroids = 16, iters = 2, dim = 64)
    val curve = Seq(1, 2, 4, 8).map { p =>
      p -> brute.intersect(
        Similarity.ivfTopKIndexed(idx, "vec_id", "embedding", ids,
          k = 5, nProbe = p)
          .select($"query_id", $"neighbor_id")).count()
    }
    info(s"recall@5 x50 vs nProbe: ${curve.map { case (p, r) => s"$p->$r" }.mkString(" ")}")
    // probing MORE cells can only add candidates, never remove them:
    // the probe set at nProbe p is a prefix of the set at p' > p
    // (same rounded-distance + cell-tiebreak ranking), so recall is
    // monotone — the curve the documented nProbe default reads from
    curve.sliding(2).foreach { case Seq((pa, ra), (pb, rb)) =>
      assert(rb >= ra, s"recall fell from nProbe=$pa ($ra) to nProbe=$pb ($rb)")
    }
    // nProbe=4 (the v18 dial) must clear the gate floor
    assert(curve.toMap.apply(4) >= 25,
      s"nProbe=4 recall below the 0.5 floor: ${curve.toMap.apply(4)}/50")
    emb.unpersist()
  }

  test("int8TopK recall@5 vs float brute force is high") {
    val emb = graft.core.Tables.embeddings(spark, sf0001).cache()
    val ids = Seq(0L, 1L, 2L, 3L, 4L)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", ids, k = 5)
      .select($"query_id", $"neighbor_id")
    val int8 = Similarity.int8TopK(emb, "vec_id", "embedding", ids, k = 5)
      .select($"query_id", $"neighbor_id")
    val hits = brute.intersect(int8).count()
    assert(hits >= 20, s"recall@5 too low: $hits/25") // ≥ 0.8
  }
}

package graft.dedup

import org.apache.spark.sql.functions.col

class DecontamSpec extends graft.SparkSpec {
  import spark.implicits._

  // doc 1 shares the 3-gram "big brown fox" with the eval set; doc 2
  // shares nothing; doc 3 is shorter than n and can never be flagged
  private def corpus = Seq(
    (1L, "the big brown fox jumps high"),
    (2L, "a completely different sentence lives here"),
    (3L, "too short")).toDF("doc_id", "text")
  private def eval = Seq(
    (100L, "one big brown fox appears in eval")).toDF("doc_id", "text")

  test("profile counts per-doc n-grams and eval overlaps") {
    val p = Decontam.contaminationProfile(corpus, eval, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // doc 1: 4 distinct 3-grams, one of them ("big brown fox") in eval
    assert(p == Seq((1L, 4L, 1L, 0.25), (2L, 4L, 0L, 0.0)))
    // doc 3 has no 3-grams → absent from the profile by contract
  }

  test("decontaminate evicts any-hit docs, keeps clean and short docs") {
    val kept = Decontam.decontaminate(corpus, eval, "doc_id", "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
    // threshold loosened: one shared 3-gram tolerated → doc 1 survives
    val lax = Decontam.decontaminate(corpus, eval, "doc_id", "text",
      n = 3, maxHits = 1L)
      .select("doc_id").as[Long].collect().toSet
    assert(lax == Set(1L, 2L, 3L))
  }

  test("broadcast cap: overflow falls back to a shuffle join with identical results") {
    def profile(cap: Int) =
      Decontam.contaminationProfile(corpus, eval, "doc_id", "text", n = 3,
        maxBroadcastShingles = cap)
        .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    // eval has 5 distinct 3-grams; cap=2 overflows → fallback path.
    // (The fallback drops the broadcast HINT — the planner may still
    // pick a broadcast within its own sized threshold, which is the
    // point: bounded by config, not by caller assumption.)
    assert(profile(2) == profile(2000000))
    // decontaminate passes the cap through and keeps its contract
    val kept = Decontam.decontaminate(corpus, eval, "doc_id", "text", n = 3,
      maxBroadcastShingles = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }

  test("eval side joins as a broadcast (the 100 TB asymmetry)") {
    // string audit: AdaptiveSparkPlanExec hides the physical tree from
    // TreeNode.collect, but prints it
    val plan = Decontam.contaminationProfile(corpus, eval, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast hash join, got:\n$plan")
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("semanticProfile: rounded-cosine max, tau verdict, scorable drops") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),   // == probe → cos 1.0
      (1L, Array(0.9f, 0.1f, 0.0f)),   // near the probe
      (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal → cos 0
      (3L, Array(0.0f, 0.0f, 0.0f))    // zero vector: unembeddable, drops
    ).toDF("vec_id", "embedding")
    val probes = Seq(Tuple1(Array(1.0f, 0.0f, 0.0f)))
      .toDF("embedding")
    val out = Decontam.semanticProfile(emb, probes, "vec_id", "embedding",
      tau = 0.9).orderBy("vec_id")
      .as[(Long, Double, Long)].collect().toSeq
    assert(out.map(_._1) == Seq(0L, 1L, 2L), s"zero vector must drop: $out")
    assert(out(0) == ((0L, 1.0, 1L)))
    assert(out(1)._2 > 0.9 && out(1)._3 == 1L) // 0.9/|v| ≈ 0.9939
    assert(out(2) == ((2L, 0.0, 0L)))
    // the verdict is applied to the ROUNDED score: a cosine that
    // rounds to exactly tau must flag (>= on the rounded value)
    val boundary = Decontam.semanticProfile(
      Seq((7L, Array(0.9f, math.sqrt(1 - 0.81).toFloat, 0.0f)))
        .toDF("vec_id", "embedding"),
      probes, "vec_id", "embedding", tau = 0.9)
      .as[(Long, Double, Long)].collect().head
    assert(boundary._2 == 0.9 && boundary._3 == 1L, s"boundary: $boundary")
  }

  test("semanticProfile: empty probe set keeps the census (left-outer contract)") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val noProbes = Seq.empty[Tuple1[Array[Float]]].toDF("embedding")
    val out = Decontam.semanticProfile(emb, noProbes, "vec_id", "embedding",
      tau = 0.9).orderBy("vec_id")
      .select(col("vec_id"), col("max_cos").isNull.as("no_score"),
        col("contaminated"))
      .as[(Long, Boolean, Long)].collect().toSeq
    // clean corpus stays distinguishable from "no corpus scanned"
    assert(out == Seq((0L, true, 0L), (1L, true, 0L)))
  }

  test("semanticProfile: probe cap fails fast with the ANN pointer") {
    import spark.implicits._
    val emb = Seq((0L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val probes = (0 until 5).map(i => Tuple1(Array(1.0f, i.toFloat)))
      .toDF("embedding")
    val e = intercept[IllegalArgumentException] {
      Decontam.semanticProfile(emb, probes, "vec_id", "embedding",
        tau = 0.9, maxProbes = 3)
    }
    assert(e.getMessage.contains("ANN"), e.getMessage)
  }

  test("semanticProfileIvf: bounded scan is a subset of exact, catches the planted sources") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val emb = graft.core.Tables.embeddings(spark, sf001)
    val cents = graft.similarity.Similarity.kmeansTrain(
      emb, "vec_id", "embedding", k = 8, iters = 2, dim = 64).centroids
    val probes = emb.filter($"vec_id" % 41 === 0)
      .select($"vec_id".as("probe_id"),
        concat(array(lit(0.0f)),
          slice($"embedding", lit(2), size($"embedding") - 1)).as("embedding"))
    def contaminatedOf(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.filter($"contaminated" === 1L).select($"vec_id")
        .as[Long].collect().toSet
    val exact = contaminatedOf(Decontam.semanticProfile(emb,
      probes.select($"embedding"), "vec_id", "embedding", tau = 0.9))
    val routed = contaminatedOf(Decontam.semanticProfileIvf(emb, probes,
      "vec_id", "embedding", tau = 0.9, cents, nProbe = 2))
    // the bounded scan can only MISS (scores a subset of pairs), never
    // fabricate: identical rounding, fewer candidates
    assert(routed.subsetOf(exact), s"routed fabricated: ${routed -- exact}")
    // a probe is a near-copy of its source vector, which assigns to
    // (essentially) the probe's own nearest cell — the routed scan
    // must catch every planted source
    val sources = emb.filter($"vec_id" % 41 === 0)
      .select($"vec_id").as[Long].collect().toSet
    assert(sources.subsetOf(routed),
      s"routed missed planted sources: ${sources -- routed}")
    assert(routed.nonEmpty)
  }
}

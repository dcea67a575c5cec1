package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmeansSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated planted clusters in 4-d (float fixture shape)
  private def planted = {
    val base = Seq(
      Array(10.0f, 0.0f, 0.0f, 0.0f),
      Array(0.0f, 10.0f, 0.0f, 0.0f),
      Array(0.0f, 0.0f, 10.0f, 0.0f))
    (0 until 30).map { i =>
      val c = base(i % 3)
      // small deterministic jitter on one dim keeps points distinct
      (i.toLong, c.updated(3, (i / 3) * 0.01f))
    }.toDF("vec_id", "embedding")
  }

  test("kmeansTrain separates planted clusters (k=3, 3 iters)") {
    val m = Similarity.kmeansTrain(planted, "vec_id", "embedding",
      k = 3, iters = 3, dim = 4)
    val means = m.means.as[(Int, Int, Double, Long)].collect()
    assert(means.map(_._1).distinct.sorted.toSeq == Seq(0, 1, 2))
    // each surviving cell holds exactly one planted cluster (10 points)
    assert(means.groupBy(_._1).values.forall(_.forall(_._4 == 10L)))
    // each cell's dominant dim reads ~10, the others ~0
    means.groupBy(_._1).values.foreach { rows =>
      val byDim = rows.map(r => r._2 -> r._3).toMap
      assert((1 to 3).count(d => math.abs(byDim(d) - 10.0) < 1e-6) == 1)
    }
    // assignment under the final centroids is pure: every point lands
    // with its cluster-mates
    val assigned = Similarity.assignToCentroids(planted, "vec_id",
      "embedding", m.centroids)
      .select(col("vec_id"), col("cell")).as[(Long, Int)].collect()
    assert(assigned.groupBy(_._1 % 3).values
      .forall(g => g.map(_._2).distinct.length == 1))
  }

  test("kmeansTrain is partitioning-invariant (the oracle contract)") {
    val a = Similarity.kmeansTrain(planted, "vec_id", "embedding",
      k = 3, iters = 3, dim = 4)
      .means.orderBy(col("cell"), col("dim"))
      .as[(Int, Int, Double, Long)].collect().toSeq
    val b = Similarity.kmeansTrain(planted.repartition(7), "vec_id",
      "embedding", k = 3, iters = 3, dim = 4)
      .means.orderBy(col("cell"), col("dim"))
      .as[(Int, Int, Double, Long)].collect().toSeq
    assert(a == b, "means must be bit-identical under any partitioning")
  }

  test("a cell that attracts nothing vanishes, labels unrenumbered") {
    // two IDENTICAL vectors land among the seeds: all points tie on
    // distance to both, the smaller cell id wins every tie, so the
    // duplicate seed's cell attracts nothing and vanishes
    val dup = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val m = Similarity.kmeansTrain(dup, "vec_id", "embedding",
      k = 3, iters = 2, dim = 2)
    val cells = m.means.select(col("cell")).distinct()
      .as[Int].collect().sorted.toSeq
    assert(cells.length == 2, s"expected one vanished cell, got $cells")
    // survivors keep their ORIGINAL labels — no renumbering
    assert(cells.forall(c => c >= 0 && c <= 2))
  }

  test("prototypePrune drops the CLOSEST members, under the FULL distance") {
    // one cell, centroid (1,0): v1=(0.9,0) is closer by full squared
    // distance (0.01 vs 0.09), but the assignment metric cc−2vc that
    // DROPS the +v·v term would rank v2=(1.3,0) closer (−1.6 < −0.8).
    // The pruning rank must use the full metric — v1 is the prototype.
    val cents = Seq((0, Array(1.0, 0.0))).toDF("cell", "centroid")
    val emb = Seq(
      (1L, Array(0.9f, 0.0f)),
      (2L, Array(1.3f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.prototypePrune(emb, "vec_id", "embedding",
      cents, dropPerCell = 1)
      .orderBy(col("vec_id")).as[(Long, Int, Long)].collect().toSeq
    assert(out == Seq((1L, 0, 0L), (2L, 0, 1L)),
      s"the +v·v term must decide the within-cell rank: $out")
    // planted clusters: exactly dropPerCell dropped per cell
    val m = Similarity.kmeansTrain(planted, "vec_id", "embedding",
      k = 3, iters = 3, dim = 4)
    val pruned = Similarity.prototypePrune(planted, "vec_id", "embedding",
      m.centroids, dropPerCell = 2)
      .as[(Long, Int, Long)].collect().toSeq
    assert(pruned.groupBy(_._2).values
      .forall(g => g.count(_._3 == 0L) == 2 && g.size == 10))
  }

  test("cellInertia: quantized sums match the hand-computed distances") {
    // one cell, centroid (1,0): d(v1)=0.01, d(v2)=0.09 → quantized
    // 10000 + 90000 = 100000 (the nudged floor makes each term exact)
    val cents = Seq((0, Array(1.0, 0.0))).toDF("cell", "centroid")
    val emb = Seq(
      (1L, Array(0.9f, 0.0f)),
      (2L, Array(1.3f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.cellInertia(emb, "vec_id", "embedding", cents)
      .as[(Int, Long, Long)].collect().toSeq
    assert(out.length == 1 && out.head._1 == 0 && out.head._2 == 2L)
    // float 0.9f/1.3f widen with tiny ulp error; the quantized sum
    // must land within one quantum of the real-arithmetic 100000
    assert(math.abs(out.head._3 - 100000L) <= 2L, s"inertia: $out")
    // and it is partitioning-invariant (exact int64 sums)
    val again = Similarity.cellInertia(emb.repartition(5), "vec_id",
      "embedding", cents).as[(Int, Long, Long)].collect().toSeq
    assert(again == out)
  }

  test("clusterBalancedSample caps per cell and is deterministic") {
    val m = Similarity.kmeansTrain(planted, "vec_id", "embedding",
      k = 3, iters = 3, dim = 4)
    def sample(df: org.apache.spark.sql.DataFrame) =
      Similarity.clusterBalancedSample(df, "vec_id", "embedding",
        m.centroids, perCell = 2)
        .orderBy(col("cell"), col("vec_id"))
        .as[(Int, Long)].collect().toSeq
    val s = sample(planted)
    assert(s.groupBy(_._1).values.forall(_.size == 2))
    assert(s == sample(planted.repartition(5)))
  }

  test("kmeansMiniBatchStep: batch means merge in, missing cells keep their centroid") {
    // centroids at x=0 (cell 0) and x=10 (cell 1); the batch carries
    // only cell-0-side vectors, so cell 1 must pass through verbatim
    val cents = Seq(
      (0, Seq(0.0, 0.0)),
      (1, Seq(10.0, 0.0))).toDF("cell", "centroid")
    val batch = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(3.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.kmeansMiniBatchStep(batch, "vec_id", "embedding",
      cents, dim = 2)
      .orderBy(col("cell")).as[(Int, Seq[Double])].collect().toSeq
    assert(out.map(_._1) == Seq(0, 1))
    // cell 0 = fixed-point mean of (1,0) and (3,0) = (2, 0)
    assert(out(0)._2 == Seq(2.0, 0.0))
    // cell 1 untouched (no member in the batch)
    assert(out(1)._2 == Seq(10.0, 0.0))
    // chaining steps over a 2-way split is deterministic and moves
    // BOTH cells once both sides arrive
    val b2 = Seq((3L, Array(9.0f, 0.0f))).toDF("vec_id", "embedding")
    val out2 = Similarity.kmeansMiniBatchStep(b2, "vec_id", "embedding",
      Similarity.kmeansMiniBatchStep(batch, "vec_id", "embedding", cents, 2),
      dim = 2)
      .orderBy(col("cell")).as[(Int, Seq[Double])].collect().toSeq
    assert(out2(0)._2 == Seq(2.0, 0.0) && out2(1)._2 == Seq(9.0, 0.0))
  }

  test("weighted mini-batch: Sculley update resists the plain merge's last-batch dominance") {
    // one cell, planted drift: batch A = three vectors at x=1, batch
    // B = one vector at x=9. The plain merge REPLACES the centroid
    // with each batch's mean — history forgotten, final = 9. The
    // count-weighted update folds B in at weight 1 against A's 3:
    // (1+1+1+9)/4 = 3.
    val cents = Seq((0, Seq(1.0, 0.0))).toDF("cell", "centroid")
    val bA = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f)),
      (3L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val bB = Seq((4L, Array(9.0f, 0.0f))).toDF("vec_id", "embedding")
    val plain = Similarity.kmeansMiniBatchStep(bB, "vec_id", "embedding",
      Similarity.kmeansMiniBatchStep(bA, "vec_id", "embedding", cents, 2),
      dim = 2).as[(Int, Seq[Double])].collect().head
    assert(plain._2 == Seq(9.0, 0.0), "plain merge = last batch's mean")
    val st = Similarity.kmeansMiniBatchStepWeighted(bB, "vec_id", "embedding",
      Similarity.kmeansMiniBatchStepWeighted(bA, "vec_id", "embedding",
        Similarity.kmeansWeightedInit(cents, 2), dim = 2),
      dim = 2)
    val weighted = Similarity.kmeansWeightedCentroids(st)
      .as[(Int, Seq[Double])].collect().head
    assert(weighted._2 == Seq(3.0, 0.0),
      "Sculley update = exact mean of all absorbed vectors")
    assert(st.select(col("n")).as[Long].collect().head == 4L)
  }

  test("weighted mini-batch: untouched cells keep their seed, count stays 0") {
    val cents = Seq(
      (0, Seq(0.5, 0.0)),
      (1, Seq(10.0, 0.0))).toDF("cell", "centroid")
    val batch = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(3.0f, 0.0f))).toDF("vec_id", "embedding")
    val st = Similarity.kmeansMiniBatchStepWeighted(batch, "vec_id",
      "embedding", Similarity.kmeansWeightedInit(cents, 2), dim = 2)
    val out = Similarity.kmeansWeightedCentroids(st)
      .orderBy(col("cell")).as[(Int, Seq[Double])].collect().toSeq
    // cell 0 absorbed both vectors (batch mean 2); cell 1 untouched —
    // seed passes through, and a FIRST batch equals the plain step
    assert(out(0)._2 == Seq(2.0, 0.0))
    assert(out(1)._2 == Seq(10.0, 0.0))
    val ns = st.orderBy(col("cell")).select(col("n")).as[Long].collect().toSeq
    assert(ns == Seq(2L, 0L))
  }
}

package graft.similarity

import org.apache.spark.sql.functions._

class RandomProjectionSpec extends graft.SparkSpec {
  import spark.implicits._

  test("sign matrix is deterministic, ±1/sqrt(outDim), index-keyed") {
    val a = Similarity.projectionSigns(8, 4)
    val b = Similarity.projectionSigns(8, 4)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    val s = 1.0 / math.sqrt(4.0)
    assert(a.flatten.forall(v => v == s || v == -s))
    // not degenerate: both signs occur
    assert(a.flatten.distinct.length == 2)
    // a wider matrix extends the sign PATTERN (scale rescales with
    // outDim, the md5-keyed signs do not move)
    assert(Similarity.projectionSigns(8, 8).take(4)
      .map(_.toSeq.map(math.signum)).toSeq
      == a.map(_.toSeq.map(math.signum)).toSeq)
  }

  test("projection equals the literal dot products, bit for bit") {
    val vec = Array(1.0f, -2.0f, 0.5f, 4.0f)
    val df = Seq((1L, vec)).toDF("vec_id", "embedding")
    val signs = Similarity.projectionSigns(4, 2)
    val got = Similarity.randomProject(df, "embedding", 4, 2, "rp")
      .select("rp").as[Seq[Double]].collect().head
    val want = signs.map(row =>
      vec.indices.foldLeft(0.0)((acc, i) => acc + vec(i).toDouble * row(i)))
    assert(got == want.toSeq)
  }

  test("re-rank over ALL candidates recovers brute force exactly (any projection)") {
    val emb = graft.core.Tables.embeddings(spark, sf0001)
    val n = emb.count().toInt
    val ids = (0L until 5L)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", ids, 5)
      .orderBy("query_id", "rn").collect().toSeq
    val rr = Similarity.rpRerankTopK(emb, "vec_id", "embedding", ids,
      k = 5, inDim = 64, outDim = 8, candidateK = n)
      .orderBy("query_id", "rn").collect().toSeq
    assert(rr == brute)
  }

  test("two-stage recall@5 clears the gate with margin at sf0.001") {
    val emb = graft.core.Tables.embeddings(spark, sf0001)
    val ids = (0L until 10L)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", ids, 5)
      .select($"query_id", $"neighbor_id")
    val rp = Similarity.rpRerankTopK(emb, "vec_id", "embedding", ids,
      k = 5, inDim = 64, outDim = 32, candidateK = 50)
      .select($"query_id", $"neighbor_id").withColumn("__hit", lit(1))
    val recall = brute.join(rp, Seq("query_id", "neighbor_id"), "left")
      .agg(sum(coalesce($"__hit", lit(0))).cast("double") / count(lit(1)))
      .as[Double].collect().head
    assert(recall >= 0.5, s"two-stage recall@5 = $recall")
  }

  test("corpus is never shuffled: candidates broadcast back for the re-rank") {
    val emb = graft.core.Tables.embeddings(spark, sf0001)
    val plan = Similarity.rpRerankTopK(emb, "vec_id", "embedding",
      (0L until 5L), k = 5, inDim = 64, outDim = 8, candidateK = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}

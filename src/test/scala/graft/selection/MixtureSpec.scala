package graft.selection

import org.apache.spark.sql.functions._

class MixtureSpec extends graft.SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    // source A: 9 tokens, B: 4, C: 1 → w = 3, 2, 1; Σw = 6
    (1L, "a b c d e f g h i", "A"),
    (2L, "a b", "B"), (3L, "c d", "B"),
    (4L, "z", "C"))
    .toDF("doc_id", "text", "source")

  test("golden weights: sqrt counts, exact shares and allocations") {
    val out = Mixture.domainWeights(corpus, "text", "source", budget = 600L)
      .orderBy("source").collect()
    assert(out.map(_.getAs[Long]("n_toks")).toSeq == Seq(9L, 4L, 1L))
    assert(out.map(_.getAs[Double]("w")).toSeq == Seq(3.0, 2.0, 1.0))
    assert(out.map(_.getAs[Double]("p")).toSeq == Seq(0.5, 2.0 / 6.0, 1.0 / 6.0))
    // 600 · {1/2, 1/3, 1/6} = {300, 200, 100} — note 600·(2/6) and
    // 600·(1/6) are floor of a repeating-binary product, still exact
    // enough to land on 200/100 via the shared IEEE tree
    assert(out.map(_.getAs[Long]("alloc_toks")).toSeq ==
      Seq(300L, math.floor(600.0 * (2.0 / 6.0)).toLong,
        math.floor(600.0 * (1.0 / 6.0)).toLong))
    // epochs = alloc/n_toks: the small source is up-sampled hardest
    val epochs = out.map(_.getAs[Double]("epochs")).toSeq
    assert(epochs(2) > epochs(1) && epochs(1) > epochs(0),
      s"alpha<1 must up-sample small sources: $epochs")
  }

  test("alpha=1/2 up-samples small sources relative to raw token share") {
    val out = Mixture.domainWeights(corpus, "text", "source", budget = 1000000L)
      .orderBy("source").collect()
    val total = out.map(_.getAs[Long]("n_toks")).sum.toDouble
    // p / raw-share must be monotone decreasing in source size
    val boost = out.map(r =>
      r.getAs[Double]("p") / (r.getAs[Long]("n_toks") / total))
    assert(boost(0) < boost(1) && boost(1) < boost(2),
      s"temperature boost must favor small sources: ${boost.toSeq}")
  }

  test("partitioning invariance: the ordered fold gives one bit-exact total") {
    val base = Mixture.domainWeights(corpus, "text", "source", 1000L)
      .orderBy("source").collect().toSeq
    for (n <- Seq(1, 3, 7)) {
      val rep = Mixture.domainWeights(corpus.repartition(n), "text",
        "source", 1000L).orderBy("source").collect().toSeq
      assert(rep == base, s"repartition($n) changed the mixture readout")
    }
  }
}

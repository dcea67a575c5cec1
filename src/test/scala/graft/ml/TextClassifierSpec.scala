package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextClassifierSpec extends SparkSpec {
  import spark.implicits._

  // synthetic corpus with a clean vocabulary signal: positives carry
  // "alpha"-family tokens, negatives "omega"-family — plus shared noise
  private def corpus = {
    val pos = (0 until 30).map(i =>
      (i.toLong, s"alpha beta gamma shared tok$i alpha beta", 1.0))
    val neg = (0 until 30).map(i =>
      ((100 + i).toLong, s"omega psi chi shared tok$i omega psi", 0.0))
    (pos ++ neg).toDF("doc_id", "text", "label")
  }

  private def vectors = TextClassifier
    .hashedVectors(corpus, "doc_id", "text")
    .join(corpus.select($"doc_id", $"label"), Seq("doc_id"))

  test("learns a vocabulary signal: train-set accuracy well above majority") {
    val m = TextClassifier.fitDeterministic(vectors, "doc_id", maxIter = 50)
    val cells = TextClassifier.confusionCells(
      TextClassifier.score(m, vectors))
      .as[(Int, Int, Long)].collect()
    val acc = cells.filter(c => c._1 == c._2).map(_._3).sum.toDouble /
      cells.map(_._3).sum
    assert(acc >= 0.95, s"accuracy $acc")
  }

  test("vectors are layout-invariant and bounded by the bucket count") {
    val b = 64
    val v1 = TextClassifier.hashedVectors(corpus, "doc_id", "text", b)
      .as[(Long, org.apache.spark.ml.linalg.Vector)].collect().toMap
    val v2 = TextClassifier
      .hashedVectors(corpus.repartition(7), "doc_id", "text", b)
      .as[(Long, org.apache.spark.ml.linalg.Vector)].collect().toMap
    assert(v1 == v2)
    assert(v1.values.forall(_.size == b))
  }

  test("fit is deterministic under input repartitioning") {
    val m1 = TextClassifier.fitDeterministic(vectors, "doc_id", maxIter = 20)
    val m2 = TextClassifier.fitDeterministic(
      vectors.repartition(5), "doc_id", maxIter = 20)
    assert(m1.coefficients == m2.coefficients && m1.intercept == m2.intercept)
  }

  test("scoring adds no shuffle beyond vector assembly (map-side transform)") {
    val m = TextClassifier.fitDeterministic(vectors, "doc_id", maxIter = 5)
    val base = vectors.queryExecution.executedPlan.toString
    val scored = TextClassifier.score(m, vectors)
      .queryExecution.executedPlan.toString
    def exchanges(p: String) = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges(scored) == exchanges(base))
  }
}

package graft.selection

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // raw corpus: two "English-like" docs, two "other" docs; target is
  // English-like only — DSIR must rank the in-distribution docs higher
  private def rawDocs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat on the rug"),
    (3L, "uno dos tres cuatro cinco seis"),
    (4L, "sept huit neuf dix onze douze")).toDF("doc_id", "text")

  private def targetDocs = Seq(
    (101L, "the cat sat on the mat"),
    (102L, "the dog ran to the mat")).toDF("doc_id", "text")

  test("importanceWeights ranks in-distribution docs above off-distribution docs") {
    val w = Dsir.importanceWeights(rawDocs, targetDocs, "doc_id", "text")
      .select($"doc_id", $"logw").as[(Long, Double)].collect().toMap
    assert(w.size == 4) // every raw doc scores (smoothing covers unseen buckets)
    assert(math.min(w(1L), w(2L)) > math.max(w(3L), w(4L)))
  }

  test("bucket models are bounded by the bucket count regardless of input") {
    val b = 16
    val feats = Dsir.hashedFeatures(rawDocs, "doc_id", "text", buckets = b)
    assert(Dsir.bucketCounts(feats).count() <= b)
    val bounds = feats.agg(min($"bucket"), max($"bucket"))
      .as[(Long, Long)].head()
    assert(bounds._1 >= 0 && bounds._2 < b)
  }

  test("hashedFeatures emits unigram+bigram occurrences (multiset, one pass)") {
    val d = Seq((7L, "a b a")).toDF("doc_id", "text")
    // 3 unigrams + 2 bigrams, occurrences not distinct
    assert(Dsir.hashedFeatures(d, "doc_id", "text").count() == 5)
    // single-token doc still carries its unigram
    val one = Seq((8L, "solo")).toDF("doc_id", "text")
    assert(Dsir.hashedFeatures(one, "doc_id", "text").count() == 1)
  }

  test("gumbelTopK is a pure function of (seed, id): stable under repartitioning") {
    val w = Dsir.importanceWeights(rawDocs, targetDocs, "doc_id", "text")
    def sel(df: org.apache.spark.sql.DataFrame) =
      Dsir.gumbelTopK(df, "doc_id", k = 2, seed = "s1")
        .select($"doc_id", $"key_q").as[(Long, Long)].collect().toSeq
    val a = sel(w)
    val b = sel(w.repartition(7))
    assert(a == b)
    // a different seed draws different noise (keys must move)
    val c = Dsir.gumbelTopK(w, "doc_id", k = 2, seed = "s2")
      .select($"doc_id", $"key_q").as[(Long, Long)].collect().toSeq
    assert(a.map(_._2) != c.map(_._2))
  }

  test("plan: model joins broadcast and top-k is TakeOrderedAndProject") {
    val w = Dsir.importanceWeights(rawDocs, targetDocs, "doc_id", "text")
    val wPlan = w.queryExecution.executedPlan.toString
    assert(wPlan.contains("BroadcastHashJoin") ||
      wPlan.contains("BroadcastNestedLoopJoin"))
    val topk = Dsir.gumbelTopK(w, "doc_id", k = 2, seed = "s1")
    assert(topk.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
  }
}

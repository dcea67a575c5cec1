package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Crawl-scale robustness: real corpora carry NULL and empty text
  * columns routinely; every per-document operator must treat a null
  * document as contributing nothing (the SQL-oracle semantics, where
  * string_split(NULL) unnests to no rows) — never throw. The compiled
  * flatMap family NPE'd on null text before round 7; this pins the
  * contract for all of them.
  */
class NullTextSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, "hello world of spark and more tokens here padding tokens"),
    (2L, null.asInstanceOf[String]),
    (3L, "")).toDF("doc_id", "text")

  test("compiled flatMap operators skip null documents instead of throwing") {
    // shingles: only doc 1 is long enough; null and empty contribute 0
    val sh = graft.dedup.TextDedup.shingleSets(df, "doc_id", "text")
    assert(sh.select("doc_id").distinct().as[Long].collect().toSet == Set(1L))
    val fp = graft.functions.TextAnalysis
      .winnowingFingerprints(df, "doc_id", "text")
    assert(fp.filter($"doc_id" === 2L).count() == 0 && fp.count() > 0)
    val feats = graft.selection.Dsir.hashedFeatures(df, "doc_id", "text")
    assert(feats.filter($"doc_id" === 2L).count() == 0 && feats.count() > 0)
    val grams = graft.dedup.SpanMask.positionedGrams(df, "doc_id", "text", 3)
    assert(grams.filter($"doc_id" === 2L).count() == 0 && grams.count() > 0)
  }

  test("cosine paths exclude null / empty / NaN / zero / dim-skewed vectors") {
    import graft.similarity.Similarity
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (3L, null.asInstanceOf[Array[Float]]),     // fabricated a 0.0 score
      (4L, Array.empty[Float]),                  // crashed signBucket
      (5L, Array(Float.NaN, 1.0f, 0.0f, 0.0f)),  // ranks FIRST desc
      (6L, Array(0.0f, 0.0f, 0.0f, 0.0f)),       // zero norm → NaN
      (7L, Array(1.0f, 0.1f))                    // dim skew → truncated dot
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(emb, "vec_id", "embedding", Seq(1L), 10)
      .select($"neighbor_id").as[Long].collect().toSet
    assert(top == Set(2L), s"only the clean neighbor may score: $top")
    // the bucketed pair search must not crash and must pair only clean
    val pairs = Similarity.nearDupPairs(emb, "vec_id", "embedding",
      0.5, Seq(0, 1), 32).select($"a_id", $"b_id").as[(Long, Long)].collect()
    assert(pairs.toSet == Set((1L, 2L)), pairs.mkString(","))
    // semdedup assigns and adjudicates only scorable vectors
    val sd = Similarity.semDedup(emb, "vec_id", "embedding", 0.9, 2)
    assert(sd.select($"vec_id").as[Long].collect().toSet == Set(1L, 2L, 7L))
  }

  test("expression-based operators pass null through as null, empty as defined") {
    import graft.functions.TextAnalysis
    val out = df.select($"doc_id",
      TextAnalysis.qualityScore($"text").as("q"),
      TextAnalysis.langId($"text").as("lang"),
      TextAnalysis.tokenCount($"text").as("n"))
      .orderBy($"doc_id").collect()
    assert(!out(0).isNullAt(1) && out(0).getString(2) == "en")
    assert(out(1).isNullAt(1) && out(1).isNullAt(3)) // null in, null out
    assert(out(2).getString(2) == "und")             // empty: defined
    // row-encoded map guards null in place
    val dl = graft.quality.Boilerplate.dedupLinesWithinDoc(df, "doc_id", "text")
    assert(dl.count() == 3 && dl.filter($"text".isNull).count() == 1)
  }
}

package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "the quick brown fox jumps over the lazy dog tonight"), // exact dup of 1
    (3L, "quick brown fox jumps over the lazy dog tonight"),     // near dup of 1/2
    (4L, "completely different words about spark and scala engines"),
    (5L, "the quick brown cat sleeps under the busy dog today"), // shares few trigrams
    (6L, "too short")                                            // no shingles
  ).toDF("doc_id", "text")

  test("ppjoin finds exact and near dups, skips dissimilar docs") {
    val out = SetSimJoin.ppjoin(corpus, "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    val pairs = out.map(r => (r._1, r._2)).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L || a == 5L || b == 5L })
    val j12 = out.find(r => (r._1, r._2) == (1L, 2L)).get._3
    assert(j12 == 1.0)
  }

  test("ppjoin == brute-force exact Jaccard join (completeness at the threshold)") {
    // Adversarial corpus: a high-df shared preamble across ALL docs
    // (the prefix filter has real work to do) plus 10 planted families
    // of 4 near-dup variants each (within-family J >= 0.5,
    // cross-family J < 0.5).
    val docs = (0L until 40L).map { i =>
      val base = s"alpha beta gamma delta fam${i / 4} epsilon zeta eta theta"
      val text = (i % 4) match {
        case 0 => base
        case 1 => s"$base tail${i / 4}"
        case 2 => s"$base tail${i / 4} extra"
        case _ => s"intro $base"
      }
      (i, text)
    }.toDF("doc_id", "text")
    val t = 0.5
    val sh = TextDedup.shingleSets(docs, "doc_id", "text")
    val ids = sh.select(col("doc_id")).distinct()
    val allPairs = ids.select(col("doc_id").as("a_id"))
      .crossJoin(ids.select(col("doc_id").as("b_id")))
      .filter(col("a_id") < col("b_id"))
    val brute = TextDedup.jaccard(allPairs, sh, "doc_id")
      .filter(col("jacc") >= lit(t))
      .as[(Long, Long, Double)].collect().toSet
    val pp = SetSimJoin.ppjoin(docs, "doc_id", "text", t)
      .as[(Long, Long, Double)].collect().toSet
    assert(pp == brute, s"ppjoin=${pp.size} brute=${brute.size}")
    assert(brute.nonEmpty) // the corpus actually plants qualifying pairs
  }

  test("prefix filter prunes: candidates strictly fewer than all pairs") {
    val docs = (0L until 30L)
      .map(i => (i, s"a b c d e f${i} g${i % 2} h${i % 3} j${i} k${i}"))
      .toDF("doc_id", "text")
    val sh = TextDedup.shingleSets(docs, "doc_id", "text")
    val n = sh.select(col("doc_id")).distinct().count()
    val cand = SetSimJoin.candidates(sh, "doc_id", 0.5).count()
    assert(cand < n * (n - 1) / 2)
  }
}

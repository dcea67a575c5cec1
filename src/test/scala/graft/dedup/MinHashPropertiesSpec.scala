package graft.dedup

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated properties for the MinHash-LSH path. MinHash is
  * deterministic given the text, so with fixed generator seeds every
  * assertion here is exact and repeatable — including the recall bound,
  * which theory puts at 1-(1-s^r)^b ≈ 0.999 for s=0.9, r=2, b=4.
  */
class MinHashPropertiesSpec extends graft.SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val vocab = (0 until 40).map(i => s"tok$i").toVector
  private val docGen: Gen[String] =
    Gen.chooseNum(20, 60).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))

  test("property: engine n-gram jaccard equals the set-model jaccard") {
    val texts = sample(Gen.listOfN(25, docGen), 7L)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val sh = TextDedup.shingleSets(docs, "doc_id", "text") // k=3, distinct
    val ids = texts.indices.map(_.toLong)
    val pairs = (for (a <- ids; b <- ids if a < b) yield (a, b))
      .toDF("a_id", "b_id")
    val got = TextDedup.jaccard(pairs, sh, "doc_id")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    def set(t: String) = t.split(" ", -1).sliding(3).map(_.mkString(" ")).toSet
    for (a <- ids; b <- ids if a < b) {
      val (sa, sb) = (set(texts(a.toInt)), set(texts(b.toInt)))
      val inter = (sa intersect sb).size
      val model = inter.toDouble / (sa.size + sb.size - inter)
      if (inter == 0) assert(!got.contains((a, b))) // join drops empty intersections
      else assert(got((a, b)) == model, s"pair ($a,$b): ${got((a, b))} vs $model")
    }
  }

  test("property: LSH bands catch near-identical pairs (recall >= 0.9 at s >= 0.9)") {
    // base docs of 60 distinct-ish tokens; variant drops the last token —
    // shingle-set jaccard ≈ (n-3)/n ≈ 0.95, above the s=0.9 design point
    val bases = sample(Gen.listOfN(40,
      Gen.listOfN(60, Gen.oneOf(vocab)).map(_.mkString(" "))), 11L)
    val rows = bases.zipWithIndex.flatMap { case (t, i) =>
      Seq((i.toLong, t), (i.toLong + 1000L, t.split(" ").dropRight(1).mkString(" ")))
    }
    val docs = rows.toDF("doc_id", "text")
    val cands = TextDedup.candidatePairs(
      TextDedup.bandKeys(
        TextDedup.minhashSignatures(
          TextDedup.shingleSets(docs, "doc_id", "text", distinct = false),
          "doc_id"), "doc_id"), "doc_id")
      .as[(Long, Long)].collect().toSet
    val caught = bases.indices.count(i => cands.contains((i.toLong, i.toLong + 1000L)))
    assert(caught >= (bases.size * 0.9).toInt,
      s"LSH recall too low: $caught/${bases.size}")
  }

  test("property: identical docs always share full signatures and are always candidates") {
    val texts = sample(Gen.listOfN(15, docGen), 23L)
    val rows = texts.zipWithIndex.flatMap { case (t, i) =>
      Seq((i.toLong, t), (i.toLong + 1000L, t))
    }
    val docs = rows.toDF("doc_id", "text")
    val sigs = TextDedup.minhashSignatures(
      TextDedup.shingleSets(docs, "doc_id", "text", distinct = false), "doc_id")
    val byId = sigs.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    texts.indices.foreach(i =>
      assert(byId(i.toLong) == byId(i.toLong + 1000L), s"doc $i signature differs"))
    val cands = TextDedup.candidatePairs(
      TextDedup.bandKeys(sigs, "doc_id"), "doc_id")
      .as[(Long, Long)].collect().toSet
    texts.indices.foreach(i =>
      assert(cands.contains((i.toLong, i.toLong + 1000L)), s"doc $i not a candidate"))
  }
}

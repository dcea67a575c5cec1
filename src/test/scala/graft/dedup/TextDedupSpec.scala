package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "the quick brown fox jumps over the lazy dog tonight"), // exact dup of 1
    (3L, "quick brown fox jumps over the lazy dog tonight"),     // near dup (first token dropped)
    (4L, "completely different words about spark and scala engines"),
    (5L, "too short")                                            // < 3 tokens → no shingles
  ).toDF("doc_id", "text")

  test("shingleSets: n-1-k+1 shingles per doc, short docs drop out") {
    val sh = TextDedup.shingleSets(corpus, "doc_id", "text")
    val counts = sh.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(counts(4L) == 6) // 8 tokens → 6 trigrams
    assert(!counts.contains(5L))
    assert(sh.filter($"doc_id" === 1 && $"shingle" === "the quick brown").count() == 1)
  }

  test("minhash: identical docs get identical signatures; near dups share bands") {
    val sigs = TextDedup.minhashSignatures(
      TextDedup.shingleSets(corpus, "doc_id", "text"), "doc_id").cache()
    val rows = sigs.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(rows(1L) == rows(2L))
    assert(rows(1L) != rows(4L))
    val pairs = TextDedup.candidatePairs(TextDedup.bandKeys(sigs, "doc_id"), "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // high-overlap near dup
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("jaccard: exact dup = 1.0; disjoint docs never become candidates") {
    val sh = TextDedup.shingleSets(corpus, "doc_id", "text")
    val pairs = TextDedup.candidatePairs(
      TextDedup.bandKeys(TextDedup.minhashSignatures(sh, "doc_id"), "doc_id"), "doc_id")
    val jacc = TextDedup.jaccard(pairs, sh, "doc_id")
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(jacc((1L, 2L)) == 1.0)
    jacc.get((1L, 3L)).foreach(j => assert(j > 0.8 && j < 1.0))
  }

  test("containment: a doc quoted inside a longer one scores 1.0 one-way") {
    // doc 11 = doc 10's text + a long unique tail: C(10→11) = 1 while
    // Jaccard stays low — the subsumption case Jaccard thresholds miss
    val base = "the quick brown fox jumps over the lazy dog tonight"
    val tail = (1 to 40).map(i => s"tail$i").mkString(" ")
    val docs = Seq((10L, base), (11L, s"$base $tail")).toDF("doc_id", "text")
    val sh = TextDedup.shingleSets(docs, "doc_id", "text")
    val pairs = Seq((10L, 11L)).toDF("a_id", "b_id")
    val c = TextDedup.containment(pairs, sh, "doc_id")
      .as[(Long, Long, Double, Double)].head()
    assert(c._3 == 1.0, s"short-in-long containment must be 1.0: $c")
    assert(c._4 < 0.25, s"reverse containment must stay low: $c")
    val j = TextDedup.jaccard(pairs, sh, "doc_id")
      .as[(Long, Long, Double)].head()._3
    assert(j < 0.25, s"jaccard misses the subsumption: $j")
  }

  test("star cap: a planted 1000-copy cluster emits O(m) candidates, not O(m²)") {
    val text = "the quick brown fox jumps over the lazy dog tonight"
    val cluster = spark.range(1, 1001)
      .select($"id".as("doc_id"), lit(text).as("text"))
      .union(Seq((5000L, "completely different words about spark and scala engines"))
        .toDF("doc_id", "text"))
    val pairs = TextDedup.candidatePairs(
      TextDedup.bandKeys(
        TextDedup.minhashSignatures(
          TextDedup.shingleSets(cluster, "doc_id", "text"), "doc_id"),
        "doc_id"),
      "doc_id").as[(Long, Long)].collect()
    // 1000 identical docs = one bucket per band, all > cap → star pairs
    // against rep (min id 1): exactly m-1 rows, every a_id the rep
    assert(pairs.length == 999)
    assert(pairs.forall(_._1 == 1L))
    assert(pairs.map(_._2).toSet == (2L to 1000L).toSet)
  }

  test("star cap: capped candidates yield the same connected components as uncapped") {
    val text = "the quick brown fox jumps over the lazy dog tonight"
    // 200-copy cluster (over the cap) + the small mixed corpus (under it)
    val mixed = spark.range(1000, 1200)
      .select($"id".as("doc_id"), lit(text).as("text"))
      .union(corpus)
    def comps(cap: Int): Map[Long, Long] = {
      val pairs = TextDedup.candidatePairs(
        TextDedup.bandKeys(
          TextDedup.minhashSignatures(
            TextDedup.shingleSets(mixed, "doc_id", "text"), "doc_id"),
          "doc_id"),
        "doc_id", bucketCap = cap)
      Components.connectedComponents(pairs, mixed, "doc_id")
        .as[(Long, Long)].collect().toMap
    }
    assert(comps(32) == comps(1000000))
  }

  test("simhash: identical docs equal; bit width respected") {
    val sh = TextDedup.simhash(corpus, "doc_id", "text").as[(Long, String)].collect().toMap
    assert(sh(1L) == sh(2L))
    assert(sh.values.forall(s => s.length == 16 && s.forall(c => c == '0' || c == '1')))
    assert(sh(1L) != sh(4L))
  }

  test("simhashCandidates bucketCap: oversized buckets emit run-stars (CC diameter 2)") {
    // five identical 16-bit hashes: all-pairs = 10, capped (cap 3) = 4
    // edges from the equal-hash RUN's min id — the run stays fully
    // connected at hamming 0 AND collapses in 2 CC supersteps (a
    // sorted chain would need run-length supersteps — the m15
    // convergence failure this topology exists to avoid); one distant
    // hash never pairs
    val sims = Seq(
      (1L, "0000000011111111"), (2L, "0000000011111111"),
      (3L, "0000000011111111"), (4L, "0000000011111111"),
      (5L, "0000000011111111"), (9L, "1111111100000000"))
      .toDF("doc_id", "simhash")
    val all = TextDedup.simhashCandidates(sims, "doc_id",
      maxHamming = 1, bits = 16)
      .as[(Long, Long, Int)].collect().toSet
    assert(all.size == 10 && all.forall(_._3 == 0))
    val capped = TextDedup.simhashCandidates(sims, "doc_id",
      maxHamming = 1, bits = 16, bucketCap = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(capped == Set((1L, 2L, 0), (1L, 3L, 0), (1L, 4L, 0), (1L, 5L, 0)))
    // a small bucket under the same cap keeps exact all-pairs
    val smallAll = TextDedup.simhashCandidates(
      sims.filter($"doc_id" <= 3), "doc_id",
      maxHamming = 1, bits = 16, bucketCap = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(smallAll.size == 3)
  }

  test("capped bucket of DISTINCT hashes: boundary chain needs log-star CC") {
    // the r13 ADVICE pathology: in an oversized bucket where every
    // member's hash is DISTINCT, run-stars are empty (each row is its
    // own run-min) and the boundary edges form a sorted CHAIN; with
    // sort-adjacent hashes inside maxHamming (smooth-gradient / burst-
    // frame corpora) the whole chain survives the filter, so min-label
    // CC needs ~chain-length supersteps — while log-star converges in
    // O(log n) rounds regardless of diameter. Construct a unary ramp:
    // hash(i) = 16 zero bits ++ (i ones)(48-i zeros) — all 49 hashes
    // distinct, lexicographic order == ramp order, consecutive hamming
    // exactly 1, and every oversized band bucket yields the SAME chain
    // edges (no all-pairs shortcut exists anywhere).
    val n = 49
    val sims = (0 until n).map { i =>
      (i.toLong, "0" * 16 + "1" * i + "0" * (48 - i))
    }.toDF("doc_id", "simhash")
    val pairs = TextDedup.simhashCandidates(sims, "doc_id",
      maxHamming = 3, bits = 64, bucketCap = 16)
    val edges = pairs.as[(Long, Long, Int)].collect().toSet
    assert(edges == (0 until n - 1).map(i => (i.toLong, i + 1L, 1)).toSet,
      s"expected the 48-edge hamming-1 chain, got ${edges.size} edges")
    // min-label at its default superstep budget ABORTS on the chain…
    val nodes = sims.select($"doc_id")
    val err = intercept[IllegalArgumentException] {
      Components.connectedComponents(pairs, nodes, "doc_id")
    }
    assert(err.getMessage.contains("did not converge"))
    // …log-star converges and finds the single component (the m15
    // routing contract)
    val comps = Components.connectedComponentsLogStar(pairs, nodes, "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(comps.size == n && comps.values.forall(_ == 0L))
    spark.catalog.clearCache() // simhashCandidates ownership contract
  }

  test("boundary edges beat a bucket-min rep-star: close members still pair") {
    // three distinct hashes in ONE 8-bit band bucket (first band
    // '00000000'): the bucket's min-id 1 is hamming-4+ from 3 and 4,
    // but 3 and 4 are hamming-1 of each other AND sort-adjacent — a
    // bucket-min rep-star under the hamming filter would lose the
    // (3,4) edge entirely; the boundary edge keeps it
    val sims = Seq(
      (1L, "0000000000000000"),
      (3L, "0000000011101111"),
      (4L, "0000000011111111"))
      .toDF("doc_id", "simhash")
    val out = TextDedup.simhashCandidates(sims, "doc_id",
      maxHamming = 1, bits = 16, bucketCap = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(out.contains((3L, 4L, 1)))
  }

  test("corpusOverlap: identical corpora estimate 1.0; disjoint estimate 0.0; exact twin agrees") {
    // corpus 0 and 1 share every shingle; corpus 2 shares none
    val tagged = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different words about spark and scala engines today"))
      .toDF("corpus", "text")
    val sh = TextDedup.shingleSets(tagged, "corpus", "text")
    val est = TextDedup.corpusOverlap(sh, "corpus")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, e) => (a, b) -> e }.toMap
    assert(est((0L, 1L)) == 1.0)
    assert(est((0L, 2L)) == 0.0 && est((1L, 2L)) == 0.0)
    val exact = TextDedup.corpusJaccard(sh, "corpus")
      .select($"corpus_a", $"corpus_b", $"jacc")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(exact((0L, 1L)) == 1.0)
    // fully disjoint pairs emit no intersection row at all
    assert(!exact.contains((0L, 2L)))
  }

  test("containment admission: strict threshold, exact-half rejected, gram-less admitted") {
    import org.apache.spark.sql.functions._
    val store = TextDedup.shingleSets(
      Seq((100L, "a b c d e f g h")).toDF("doc_id", "text"),
      "doc_id", "text", k = 5)
    val probes = Seq(
      (1L, "a b c d e f x y z w"),  // 2 of 6 grams known -> admitted
      (2L, "a b c d e f g x y z"),  // 3 of 6: exactly half -> rejected
      (3L, "p q r"),                // gram-less -> admitted
      (4L, "a b c d e f g h"))      // full copy -> rejected
      .toDF("doc_id", "text")
    val out = TextDedup.containmentAdmit(probes, "doc_id", "text",
      store, k = 5).select($"doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 3L), s"expected strict <1/2 admission, got $out")
  }

  test("corpus novelty: shared shingles counted cross-document, short docs fully novel") {
    import org.apache.spark.sql.functions._
    // docs 1/2 share their first five tokens (one shared 5-gram);
    // doc 3 is disjoint; doc 4 is too short for any 5-gram
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon one two three four"),
      (2L, "alpha beta gamma delta epsilon nine eight seven six"),
      (3L, "red orange yellow green blue indigo violet"),
      (4L, "tiny doc")).toDF("doc_id", "text")
    val sh = TextDedup.shingleSets(docs, "doc_id", "text", k = 5)
    val dfq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val per = sh.join(dfq, "shingle").groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // 9 tokens -> 5 distinct 5-grams; only the leading one is shared
    assert(per(1L) == ((5L, 1L)) && per(2L) == ((5L, 1L)))
    assert(per(3L) == ((3L, 0L)), "disjoint doc shares nothing")
    assert(!per.contains(4L), "no 5-grams below 5 tokens")
  }
}

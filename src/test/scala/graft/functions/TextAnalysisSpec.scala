package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("t").select(c).head().get(0)

  test("tokenCount / meanTokenLen") {
    assert(one(TextAnalysis.tokenCount(col("t")), "a bb ccc") == 3)
    assert(one(TextAnalysis.meanTokenLen(col("t")), "a bb ccc") == 2.0)
  }

  test("regexTokens splits words and symbols BPE-style") {
    val toks = one(TextAnalysis.regexTokens(col("t")), "don't stop!")
      .asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(toks == Seq("don", "'", "t", "stop", "!"))
  }

  test("langId picks dominant stopword language; und when none") {
    assert(one(TextAnalysis.langId(col("t")), "the cat is of and mice") == "en")
    assert(one(TextAnalysis.langId(col("t")), "le chat et la souris") == "fr")
    assert(one(TextAnalysis.langId(col("t")), "zzz qqq www") == "und")
    // tie between en and fr resolves to en (fixed priority)
    assert(one(TextAnalysis.langId(col("t")), "the le") == "en")
  }

  test("langConfidence flags code-switched text, not clean monolingual") {
    def conf(text: String) = Seq(text).toDF("t")
      .select(TextAnalysis.langConfidence(col("t")).as("c"))
      .select("c.lang_pred", "c.hits_top", "c.hits_second", "c.mixed")
      .as[(String, Long, Long, Int)].head()
    // clean English: runner-up 0 → not mixed
    assert(conf("the cat is of and to in") == (("en", 6L, 0L, 0)))
    // code-switched en/fr with hits 2 vs 2 → tie goes en, mixed=1
    val cs = conf("the cat le chat is et")
    assert(cs._1 == "en" && cs._4 == 1 && cs._3 >= cs._2 - 1)
    // dominant en with one stray fr stopword: gap > 1 → not mixed
    assert(conf("the cat is of and le")._4 == 0)
    // no stopwords at all: und, nothing to mix
    assert(conf("zzz qqq") == (("und", 0L, 0L, 0)))
  }

  test("quality score is in [0,1] and penalizes punctuation soup") {
    val clean = one(TextAnalysis.qualityScore(col("t")),
      "the quick brown fox is one of the best and fastest").asInstanceOf[Double]
    val soup = one(TextAnalysis.qualityScore(col("t")), "!!! ??? %%% ###").asInstanceOf[Double]
    assert(clean > soup && clean <= 1.0 && soup >= 0.0)
  }

  test("winnowing: shared substring >= k+w-1 chars implies shared fingerprint") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "said the quick brown fox jumps high today"), // shares >= 11-char run
      (3L, "zzzzz completely unrelated content here qq")
    ).toDF("doc_id", "text")
    val fp = TextAnalysis.winnowingFingerprints(docs, "doc_id", "text")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fp(1L) intersect fp(2L)).nonEmpty)
    assert((fp(1L) intersect fp(3L)).isEmpty)
    // identical docs → identical fingerprint sets
    val dup = Seq((1L, "abcdefghijklmnop"), (2L, "abcdefghijklmnop")).toDF("doc_id", "text")
    val dfp = TextAnalysis.winnowingFingerprints(dup, "doc_id", "text")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(dfp(1L) == dfp(2L))
  }

  test("repetitionProfile golden values") {
    val d = Seq((1L, "a a a b"), (2L, "x y z w")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionProfile(d, "doc_id", "text")
      .orderBy($"doc_id").as[(Long, Long, Double, Double)].collect()
    // doc 1: 4 tokens, 2 distinct; bigrams (a a)x2 (a b)x1 → 2/3
    assert(r(0) == ((1L, 4L, 0.5, 0.666667)))
    // doc 2: all distinct; every bigram unique → 1/3
    assert(r(1) == ((2L, 4L, 1.0, 0.333333)))
  }

  test("tfidf golden values (smooth idf)") {
    val d = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val r = TextAnalysis.tfidf(d, "doc_id", "text")
      .orderBy($"doc_id", $"term")
      .as[(Long, String, Long, Long, Double)].collect()
    // N=2; df(a)=2 → idf=ln(3/3)+1=1; df(b)=df(c)=1 → idf=ln(3/2)+1;
    // quantized contract: tf · floor((ln+1)·1e6 + 1e-4) / 1e6
    val rare = 1L * math.floor((math.log(1.5) + 1.0) * 1e6 + 1e-4) / 1e6
    assert(r.toSeq == Seq(
      (1L, "a", 1L, 2L, 1.0), (1L, "b", 1L, 1L, rare),
      (2L, "a", 1L, 2L, 1.0), (2L, "c", 1L, 1L, rare)))
  }

  test("bm25 golden values (saturation + length normalization)") {
    // docs: 1 = "a a b" (dl 3), 2 = "a c" (dl 2); N=2, avgdl=2.5
    val d = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val r = TextAnalysis.bm25(d, "doc_id", "text")
      .orderBy($"doc_id", $"term")
      .as[(Long, String, Long, Long, Long, Long, Long)].collect()
    // the integer-only t9 contract (round-11 escalation): idf
    // floor-quantized to int64 micro-nats, then a pure IEEE tree, then
    // the score floor-quantized to int64 micro-score units — no double
    // ever crosses the engine/oracle boundary, and never round a raw
    // transcendental (round-9 driver hash failure)
    def goldIdf(df: Long): Long = math.floor(
      math.log((2.0 - df + 0.5) / (df + 0.5) + 1.0) * 1e6 + 1e-4).toLong
    def gold(tf: Long, df: Long, dl: Long): Long = {
      val norm = 1.0 - 0.75 + 0.75 * dl / 2.5
      val raw = goldIdf(df) / 1e6 * (tf * (1.2 + 1.0)) / (tf + 1.2 * norm)
      math.floor(raw * 1e6 + 1e-4).toLong
    }
    assert(r.toSeq == Seq(
      (1L, "a", 2L, 2L, 3L, goldIdf(2), gold(2, 2, 3)),
      (1L, "b", 1L, 1L, 3L, goldIdf(1), gold(1, 1, 3)),
      (2L, "a", 1L, 2L, 2L, goldIdf(2), gold(1, 2, 2)),
      (2L, "c", 1L, 1L, 2L, goldIdf(1), gold(1, 1, 2))))
    // the signal's two levers actually lever: the common term scores
    // below the rare one at equal tf, and tf=2 scores below 2× tf=1
    // (saturation)
    assert(gold(1, 2, 2) < gold(1, 1, 2))
    assert(gold(2, 2, 3) < 2 * gold(1, 2, 3))
  }

  test("bm25 idf quantization margin clears the floor boundary at sf0.001/0.01/0.1") {
    // The only cross-engine-risky boundary left in bm25 is the nudged
    // floor over the idf ln (everything downstream is a pure IEEE tree
    // on bit-identical operands, so the outer floor sees identical
    // input bits on both engines — zero flip risk regardless of
    // proximity). A flip of the idf floor needs the true ln·1e6 + 1e-4
    // to sit within libm cross-build drift (~4e-9 quantized units) of
    // an integer; assert ≥1e-5 of headroom over every (n_docs, df)
    // pair the corpus actually produces, at all three sfs.
    import graft.dedup.TextDedup
    for (dir <- Seq(sf0001, sf001, "/root/testdata/sf0.1")) {
      val docs = graft.core.Tables.documents(spark, dir)
      val toks = TextDedup.shingleSets(docs, "doc_id", "text", k = 1,
        distinct = false)
      val n = toks.select(countDistinct($"doc_id")).head().getLong(0)
      val dfreq = toks.groupBy($"shingle")
        .agg(countDistinct($"doc_id").as("df"))
      val q = log((lit(n.toDouble) - $"df" + lit(0.5)) / ($"df" + lit(0.5))
        + lit(1.0)) * lit(1e6) + lit(1e-4)
      val dist = least(q - floor(q), lit(1.0) - (q - floor(q)))
      val minDist = dfreq.agg(min(dist)).head().getDouble(0)
      assert(minDist > 1e-5,
        s"$dir: idf quantization margin $minDist <= 1e-5 — a libm-drift " +
          "flip is conceivable; revisit the nudge or the scale")

      // FINAL-score floor margin (round-11): with the integer-only
      // contract the outer floor sees bit-identical inputs whenever
      // both engines build the same IEEE tree — this arm bounds the
      // damage if a foreign DuckDB's decimal-literal typing perturbs
      // that tree by O(ulp) anyway: every raw·1e6 + 1e-4 argument must
      // clear the nearest integer by far more than any such skew.
      val tfDf = toks.groupBy($"doc_id", $"shingle".as("term"))
        .agg(count(lit(1)).as("tf"))
      val dl = tfDf.groupBy($"doc_id").agg(sum($"tf").as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"), avg($"dl").as("avgdl"))
      val idfQ = floor(log(($"n_docs" - $"df" + lit(0.5)) /
        ($"df" + lit(0.5)) + lit(1.0)) * lit(1e6) + lit(1e-4))
      val raw = idfQ.cast("double") / lit(1e6) *
        ($"tf" * lit(1.2 + 1.0)) /
        ($"tf" + lit(1.2) * (lit(1.0) - lit(0.75)
          + lit(0.75) * $"dl" / $"avgdl"))
      val s = raw * lit(1e6) + lit(1e-4)
      val sDist = least(s - floor(s), lit(1.0) - (s - floor(s)))
      val minScore = tfDf.join(dl, Seq("doc_id"))
        .join(dfreq, $"term" === dfreq("shingle"))
        .crossJoin(broadcast(stats))
        .agg(min(sDist)).head().getDouble(0)
      assert(minScore > 1e-5,
        s"$dir: bm25 final-score floor margin $minScore <= 1e-5 — an " +
          "O(ulp) tree perturbation could flip the emitted int; " +
          "revisit the nudge or the scale")
    }
  }

  test("backoff ladder golden: seen bigram, unigram backoff, OOV floor") {
    // train "a b a c": bigrams {a b, b a, a c}, ctx counts a:2 b:1,
    // unigrams a:2 b:1 c:1, N=4
    val train = Seq((0L, "a b a c")).toDF("doc_id", "text")
    // score "a b c a x q": positions and their ladder branches:
    //   a b -> seen bigram      ln(1/2)
    //   b c -> unseen, c seen   ln(0.4*1/4)
    //   c a -> unseen, a seen   ln(0.4*2/4)
    //   a x -> unseen, x OOV    ln(0.4*0.5/4)
    //   x q -> unseen, q OOV    ln(0.4*0.5/4)
    val scoreD = Seq((1L, "a b c a x q")).toDF("doc_id", "text")
    val r = TextAnalysis.backoffLogProb(scoreD, train, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().head
    def q(v: Double): Long = math.floor(v * 1e6 + 1e-4).toLong
    val lps = Seq(math.log(1.0 / 2.0), math.log(0.4 * 1.0 / 4.0),
      math.log(0.4 * 2.0 / 4.0), math.log(0.4 * 0.5 / 4.0),
      math.log(0.4 * 0.5 / 4.0))
    val golden = lps.map(q).sum.toDouble / 1e6 / 5.0
    assert(r == ((1L, 5L, 4L, golden)), s"got $r expected mean $golden")
  }

  test("Kneser-Ney golden: discounted seen, interpolated unseen, OOV floor") {
    // train "a b a b a c": bigram counts {ab:2, ba:2, ac:1};
    // ctx counts a:3 (n1c 2: b,c), b:2 (n1c 1: a);
    // continuation types (a,b)(b,a)(a,c) -> n1w a:1 b:1 c:1; N1+ = 3
    val train = Seq((0L, "a b a b a c")).toDF("doc_id", "text")
    // score "a b c d": positions and their interpolation branches:
    //   a b -> seen:      (2-.75)/3 + (.75*2/3)*(1/3)
    //   b c -> unseen bg: 0         + (.75*1/2)*(1/3)
    //   c d -> unseen ctx, d OOV:     (0.5/3)  (half-type floor)
    val scoreD = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val r = TextAnalysis.kneserNeyLogProb(scoreD, train, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().head
    def q(v: Double): Long = math.floor(v * 1e6 + 1e-4).toLong
    val pAb = (2.0 - 0.75) / 3.0 + (0.75 * 2.0 / 3.0) * (1.0 / 3.0)
    val pBc = 0.0 / 2.0 + (0.75 * 1.0 / 2.0) * (1.0 / 3.0)
    val pCd = 0.5 / 3.0
    val golden =
      Seq(pAb, pBc, pCd).map(p => q(math.log(p))).sum.toDouble / 1e6 / 3.0
    assert(r == ((1L, 3L, 2L, golden)), s"got $r expected mean $golden")
    // interpolated KN is a PROPER conditional distribution over the
    // train vocab for a seen context (what stupid backoff is not):
    // sum over {a,b,c} of P(.|a) = 1 exactly
    val pAa = math.max(0.0 - 0.75, 0.0) / 3.0 + (0.75 * 2.0 / 3.0) * (1.0 / 3.0)
    val pAc = (1.0 - 0.75) / 3.0 + (0.75 * 2.0 / 3.0) * (1.0 / 3.0)
    assert(pAa + pAb + pAc == 1.0, s"KN mass != 1: ${pAa + pAb + pAc}")
    // and the engine reproduces those per-position values
    val perW = TextAnalysis.kneserNeyLogProb(
      Seq((1L, "a a"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text"),
      train, "doc_id", "text")
      .orderBy($"doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    val expect = Seq(pAa, pAb, pAc).map(p => q(math.log(p)).toDouble / 1e6)
    assert(perW.map(_._4) == expect, s"got ${perW.map(_._4)} expected $expect")
  }

  test("modified KN golden: estimated discounts, per-class numerators, mass 1") {
    // bigrams never cross docs, so single-bigram docs control the
    // type counts exactly: ab:3, ba:2, ac:1, ef:4, fe:4 ->
    // counts-of-counts n1..n4 = 1,1,1,2 -> Y=1/3, D1=1/3, D2=1, D3+=1/3
    val train = (Seq.fill(3)("a b") ++ Seq.fill(2)("b a") ++ Seq("a c")
      ++ Seq.fill(4)("e f") ++ Seq.fill(4)("f e"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val m = TextAnalysis.kneserNeyModifiedModel(train, "doc_id", "text")
    val (d1c, d2c, d3c) = TextAnalysis.cgDiscounts
    val ds = m.coc.select(d1c.as("d1"), d2c.as("d2"), d3c.as("d3"))
      .as[(Double, Double, Double)].collect().head
    val y = 1.0 / 3.0
    val (d1, d2, d3) = (1.0 - 2.0 * y * 1.0 / 1.0,
      2.0 - 3.0 * y * 1.0 / 1.0, 3.0 - 4.0 * y * 2.0 / 1.0)
    assert(ds == ((d1, d2, d3)), s"discounts $ds != ${(d1, d2, d3)}")
    // ctx a: c=4, classes t1=1 (ac), t3p=1 (ab) -> gamma = (d1+d3)/4;
    // N1+ = 5 types, pcont(seen w) = 1/5, OOV floor 0.5/5
    def q(v: Double): Long = math.floor(v * 1e6 + 1e-4).toLong
    val gA = (d1 * 1.0 + d2 * 0.0 + d3 * 1.0) / 4.0
    val pAb = (3.0 - d3) / 4.0 + gA * (1.0 / 5.0)  // count-3 class
    val pAc = (1.0 - d1) / 4.0 + gA * (1.0 / 5.0)  // count-1 class
    val pAa = 0.0 / 4.0 + gA * (1.0 / 5.0)         // unseen in seen ctx
    val gB = (d2 * 1.0) / 2.0
    val pBa = (2.0 - d2) / 2.0 + gB * (1.0 / 5.0)  // count-2 class
    val pZq = 0.5 / 5.0                            // unseen ctx, OOV w
    val got = TextAnalysis.kneserNeyModifiedLogProb(
      Seq((1L, "a b"), (3L, "a c"), (5L, "a a"), (7L, "b a"),
        (9L, "z q")).toDF("doc_id", "text"),
      train, "doc_id", "text")
      .orderBy($"doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    val expect = Seq((1L, pAb, 0L), (3L, pAc, 0L), (5L, pAa, 1L),
      (7L, pBa, 0L), (9L, pZq, 1L))
    assert(got == expect.map { case (id, p, u) =>
      (id, 1L, u, q(math.log(p)).toDouble / 1e6) },
      s"got $got")
    // the discounted mass identity: over the seen vocab, P(.|a) sums
    // to exactly the mass removed plus the mass kept
    val vocabMass = pAb + pAc + pAa * 3.0 // e, f, a all unseen after ctx a
    assert(math.abs(vocabMass - 1.0) < 1e-12, s"mass $vocabMass")
    // degenerate counts-of-counts: all-singleton train forces the
    // D2/D3+ fallback branches (n2 = n3 = 0) and D1 = 1 exactly
    val m2 = TextAnalysis.kneserNeyModifiedModel(
      Seq((0L, "a b c d e")).toDF("doc_id", "text"), "doc_id", "text")
    val ds2 = m2.coc.select(d1c.as("d1"), d2c.as("d2"), d3c.as("d3"))
      .as[(Double, Double, Double)].collect().head
    assert(ds2 == ((1.0, 1.0, 1.5)), s"fallback discounts $ds2")
    val one = TextAnalysis.kneserNeyModifiedScore(
      Seq((1L, "a b")).toDF("doc_id", "text"), "doc_id", "text", m2)
      .as[(Long, Long, Long, Double)].collect().head
    // c(ab)=1, D1=1 -> numerator 0; gamma(a)=1 -> P = pcont(b) = 1/4
    assert(one == ((1L, 1L, 0L, q(math.log(0.25)).toDouble / 1e6)))
  }

  test("modified trigram KN: per-order discounts, fallback positivity, finite scores") {
    // trigrams never cross docs: single-trigram docs plant the order-3
    // type counts {3,2,1,4} -> coc3 n1..n4 = 1,1,1,1 -> Y=1/3,
    // D=(1/3, 1, 5/3); every (v,w) continuation is single-context ->
    // coc2 = (4,0,0,0) -> order 2 falls back to (1.0, 1.0, 1.5)
    val train = (Seq.fill(3)("a b c") ++ Seq.fill(2)("b c a")
      ++ Seq("a b d") ++ Seq.fill(4)("e f g"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val m = TextAnalysis.kneserNeyModTrigramModel(train, "doc_id", "text")
    val (d13, d23, d33) = TextAnalysis.cgDiscountsSuffixed("_3")
    val ds3 = m.coc3.select(d13.as("d1"), d23.as("d2"), d33.as("d3"))
      .as[(Double, Double, Double)].collect().head
    val y = 1.0 / 3.0
    assert(ds3 == ((1.0 - 2.0 * y * 1.0 / 1.0, 2.0 - 3.0 * y * 1.0 / 1.0,
      3.0 - 4.0 * y * 1.0 / 1.0)), s"order-3 discounts $ds3")
    val (d12, d22, d32) = TextAnalysis.cgDiscountsSuffixed("_2")
    val ds2 = m.coc2.select(d12.as("d1"), d22.as("d2"), d32.as("d3"))
      .as[(Double, Double, Double)].collect().head
    assert(ds2 == ((1.0, 1.0, 1.5)), s"order-2 fallback discounts $ds2")
    // strictly-positive discounts mean no position can hit ln(0):
    // every fixture doc's mean_logscore is finite (the clamp-at-zero
    // regression t18's oracle caught as "logarithm of zero")
    val docs = graft.core.Tables.documents(spark, sf0001)
    val scores = TextAnalysis.kneserNeyModTrigramLogProb(
      docs.filter($"doc_id" % 2 === 1), docs.filter($"doc_id" % 2 === 0),
      "doc_id", "text")
      .select(col("mean_logscore")).as[Double].collect()
    assert(scores.nonEmpty && scores.forall(s => !s.isInfinite && !s.isNaN),
      "non-finite trigram score")
  }

  test("trigram KN golden: full ladder (seen tri, unseen tri, unseen middle)") {
    // train "a b c a b c": trigrams abc(2), bca(1), cab(1); c(ab·)=2
    // with 1 continuation; types {(a,b,c),(b,c,a),(c,a,b)} give
    // c'(v,w)=1 each, n1mid=n1fw=1 per middle, c''=1 per w, N1+=3
    val train = Seq((0L, "a b c a b c")).toDF("doc_id", "text")
    // score "a b c d": positions abc (seen) and bcd (unseen trigram,
    // seen context bc, unseen suffix (c,d), OOV continuation d)
    val scoreD = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val r = TextAnalysis.kneserNeyTrigramLogProb(scoreD, train,
      "doc_id", "text").as[(Long, Long, Long, Double)].collect().head
    def q(v: Double): Long = math.floor(v * 1e6 + 1e-4).toLong
    // abc: p2(c|b) = (1-.75)/1 + (.75*1/1)*(1/3) = 0.5
    //      p3 = (2-.75)/2 + (.75*1/2)*0.5 = 0.8125
    val pAbc = (2.0 - 0.75) / 2.0 + (0.75 * 1.0 / 2.0) *
      ((1.0 - 0.75) / 1.0 + (0.75 * 1.0 / 1.0) * (1.0 / 3.0))
    // bcd: p1(d) = 0.5/3 (OOV floor); p2(d|c) = 0 + (.75*1/1)*p1;
    //      p3 = 0 + (.75*1/1... c(bc·)=1, n1(bc·)=1) -> (.75*1/1)*p2
    val pBcd = math.max(0.0 - 0.75, 0.0) / 1.0 + (0.75 * 1.0 / 1.0) *
      (math.max(0.0 - 0.75, 0.0) / 1.0 + (0.75 * 1.0 / 1.0) * (0.5 / 3.0))
    val golden =
      Seq(pAbc, pBcd).map(p => q(math.log(p))).sum.toDouble / 1e6 / 2.0
    assert(r == ((1L, 2L, 1L, golden)), s"got $r expected mean $golden")
  }

  test("unigramLogProb golden values (quantized mean token log-prob)") {
    val d = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    // corpus: a,a,b,b,c → N=5; p(a)=p(b)=0.4, p(c)=0.2
    def q(p: Double): Long = math.floor(math.log(p) * 1e6).toLong
    val exp1 = (3 * q(0.4)).toDouble / 1e6 / 3.0
    val exp2 = (q(0.4) + q(0.2)).toDouble / 1e6 / 2.0
    val r = TextAnalysis.unigramLogProb(d, "doc_id", "text")
      .orderBy($"doc_id").as[(Long, Long, Double)].collect()
    assert(r.toSeq == Seq((1L, 3L, exp1), (2L, 2L, exp2)))
    // common-token doc scores higher than rare-token doc
    assert(exp1 > exp2)
  }

  test("bigramLogProb golden values (corpus-trained MLE, context-count denominator)") {
    val d = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    // corpus bigrams: doc1 (a b)(b a)(a b), doc2 (a b)(b c)
    // c(a b)=3, c(b a)=1, c(b c)=1; contexts c(a·)=3, c(b·)=2
    // → P(b|a)=1 (lp 0), P(a|b)=P(c|b)=1/2
    def q(p: Double): Long = math.floor(math.log(p) * 1e6 + 1e-4).toLong
    val exp1 = (q(1.0) * 2 + q(0.5)).toDouble / 1e6 / 3.0
    val exp2 = (q(1.0) + q(0.5)).toDouble / 1e6 / 2.0
    val r = TextAnalysis.bigramLogProb(d, "doc_id", "text")
      .orderBy($"doc_id").as[(Long, Long, Double)].collect()
    assert(r.toSeq == Seq((1L, 3L, exp1), (2L, 2L, exp2)))
    // the doc with the more predictable continuation scores higher
    assert(exp1 > exp2)
  }

  test("normalized fingerprint is case/whitespace invariant; raw is not") {
    val a = one(TextAnalysis.normalizedFingerprint(col("t")), "Hello  World")
    val b = one(TextAnalysis.normalizedFingerprint(col("t")), "hello world ")
    val ra = one(TextAnalysis.fingerprint(col("t")), "Hello  World")
    val rb = one(TextAnalysis.fingerprint(col("t")), "hello world ")
    assert(a == b && ra != rb)
  }

  test("collocations: planted PMI goldens, count floor, rank order") {
    import spark.implicits._
    // unigrams a=5 b=5 c=6 -> N_uni=16; bigrams (a,b)=5 (b,a)=4
    // (c,c)=5 -> N_bg=14; minCount=5 drops (b,a)
    val docs = Seq(
      (1L, "a b a b a b a b a b"),
      (2L, "c c c c c c")).toDF("doc_id", "text")
    def pmiQ(cab: Long, ca: Long, cb: Long): Long =
      math.floor(math.log(
        (cab * 16L * 16L).toDouble / (14L * ca * cb).toDouble)
        * 1e6 + 1e-4).toLong
    val out = TextAnalysis.collocations(docs, "doc_id", "text",
        minCount = 5L, k = 20)
      .as[(Long, String, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "a", "b", 5L, pmiQ(5, 5, 5)),
      (2L, "c", "c", 5L, pmiQ(5, 6, 6))))
    // sanity: the planted collocation outranks the self-pair
    assert(pmiQ(5, 5, 5) > pmiQ(5, 6, 6))
  }

  test("collocations: adjacency never bridges documents; empty tokens drop") {
    import spark.implicits._
    // "x y" at a doc boundary must NOT create a (y, x) bigram; the
    // doubled space in doc 4 must not create an empty-token pair
    val docs = Seq(
      (3L, "x y x y x y x y x y"),
      (4L, "y  x y x y x y x y x")).toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs, "doc_id", "text",
        minCount = 1L, k = 20)
      .as[(Long, String, String, Long, Long)].collect().toSeq
    val counts = out.map(r => (r._2, r._3) -> r._4).toMap
    assert(counts(("x", "y")) == 5L + 4L)
    assert(counts(("y", "x")) == 4L + 5L)
    assert(out.forall(r => r._2.nonEmpty && r._3.nonEmpty))
  }

  test("vocab coverage: exact crossing ranks, inclusive boundary, partitioning invariant") {
    import org.apache.spark.sql.functions.col
    // freqs a:4, b:2, c:1, d:1 (total 8; order a,b,c,d by freq desc,
    // term asc). 50 % is an EXACT boundary: cum(a)·100 = 400 = 8·50.
    val docs = Seq((1L, "a a a a b b"), (2L, "c d"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.vocabCoverage(df, "doc_id", "text", Seq(50, 90, 99))
        .orderBy(col("pct"))
        .as[(Long, Long, Long)].collect().toSeq
    val out = rows(docs)
    assert(out == Seq((50L, 1L, 8L), (90L, 4L, 8L), (99L, 4L, 8L)),
      s"got $out")
    assert(rows(docs.repartition(5)) == out)
  }
}

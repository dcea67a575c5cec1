package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------- viterbiWord

  test("viterbiWord picks the max-likelihood split, not the greedy one") {
    // greedy longest-prefix would take "ab" then be stuck with "c";
    // the DP weighs full paths: "ab c" = -20-9 = -29 vs "a bc" =
    // -10-12 = -22 → "a bc" wins
    val lp = Map("a" -> -10L, "b" -> -15L, "c" -> -9L,
      "ab" -> -20L, "bc" -> -12L)
    assert(Unigram.viterbiWord("abc", lp) == Some(("a bc", -22L, 2)))
  }

  test("viterbiWord tie-break: lexicographically smallest piece string") {
    // "ab" scores -20 both as the whole piece and as "a b" — the
    // space (0x20) sorts before any letter, so the SPLIT spelling
    // wins (the oracle's ORDER BY sc DESC, seg ASC verbatim)
    val lp = Map("a" -> -10L, "b" -> -10L, "ab" -> -20L)
    assert(Unigram.viterbiWord("ab", lp) == Some(("a b", -20L, 2)))
    // and the tie-break composes through later stages (DP-safety):
    // "aba" ties "a b a" / "ab a" at -30 → lex-min "a b a"
    val lp2 = Map("a" -> -10L, "b" -> -10L, "ab" -> -20L, "ba" -> -20L)
    assert(Unigram.viterbiWord("aba", lp2) == Some(("a b a", -30L, 3)))
  }

  test("viterbiWord: no path when a character has no piece") {
    val lp = Map("a" -> -10L, "b" -> -10L)
    assert(Unigram.viterbiWord("axb", lp).isEmpty)
    assert(Unigram.viterbiWord("x", lp).isEmpty)
    // a gap mid-word kills longer words that must cross it
    assert(Unigram.viterbiWord("ax", lp).isEmpty)
  }

  test("viterbiWord honors MaxPieceLen: a 7-char piece is never used") {
    val lp = Map("abcdefg" -> -1L, "a" -> -10L, "b" -> -10L, "c" -> -10L,
      "d" -> -10L, "e" -> -10L, "f" -> -10L, "g" -> -10L)
    // the 7-char piece would score -1 but MaxPieceLen=6 forbids it
    assert(Unigram.viterbiWord("abcdefg", lp) ==
      Some(("a b c d e f g", -70L, 7)))
  }

  // ------------------------------------------------------ frozen vocab

  test("seeder reproduces the frozen inventory at sf0.01 (golden pin)") {
    val live = Unigram.seedVocab(
      graft.core.Tables.documents(spark, sf001)
        .select(col("doc_id"), col("text")), "text")
      .select(col("piece"), col("lp_q")).as[(String, Long)]
      .collect().sortBy(_._1).toVector
    assert(live == Unigram.FrozenVocab.sortBy(_._1),
      "FrozenVocab drifted from the live seeder — refreeze or fix the seeder")
  }

  test("frozen inventory properties the gates lean on") {
    val pieces = Unigram.FrozenVocab.map(_._1)
    assert(pieces.distinct.size == pieces.size)
    // 24 single chars — x and z never occur in the fixture corpus;
    // their absence is exactly what the zigzag no-path plant exercises
    val chars = pieces.filter(_.length == 1)
    assert(chars.size == 24 && !chars.contains("x") && !chars.contains("z"))
    assert(pieces.count(_.length >= 2) == Unigram.TopMulti)
    assert(pieces.forall(p => p.nonEmpty && p.length <= Unigram.MaxPieceLen
      && p.forall(c => c >= 'a' && c <= 'z')))
    // log-probs are genuinely negative (probabilities < 1)
    assert(Unigram.FrozenVocab.forall(_._2 < 0L))
  }

  // ------------------------------------------------- dataframe operators

  private val lpFrozen = Unigram.FrozenVocab.toMap

  test("viterbiSegment: plant semantics (drop, cap, 1-char)") {
    val df = Seq(
      (1L, "joinhash zigzag q"),           // zigzag drops (no 'z' piece)
      (2L, "sortmergejoin"),                // 13 chars > MaxWordLen → doc drops
      (3L, "zigzag"),                       // only word has no path → doc drops
      (4L, "Mixed CASE dr0pp3d a")          // non-[a-z]+ words filtered
    ).toDF("doc_id", "text")
    val out = Unigram.viterbiSegment(df, "doc_id", "text", Unigram.FrozenVocab)
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, String)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 4L))
    val r1 = out(0)
    assert(r1._2 == 2L, s"doc 1 should keep joinhash + q, got $r1")
    assert(r1._4.split(' ').forall(p => lpFrozen.contains(p)))
    assert(out(1) == ((4L, 1L, 1L, "a")))
  }

  test("viterbiSegment matches per-word viterbiWord on the fixture corpus") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val seg = Unigram.viterbiSegment(docs, "doc_id", "text", Unigram.FrozenVocab)
    val joined = docs.join(seg, Seq("doc_id"))
      .select(col("text"), col("n_words"), col("n_pieces"), col("piece_text"))
      .as[(String, Long, Long, String)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (text, nW, nP, pt) =>
      val words = text.split(" ").filter(w => w.nonEmpty &&
        w.length <= Unigram.MaxWordLen && w.forall(c => c >= 'a' && c <= 'z'))
      val segs = words.flatMap(w => Unigram.viterbiWord(w, lpFrozen))
      assert(nW == segs.length)
      assert(nP == segs.map(_._3.toLong).sum)
      assert(pt == segs.map(_._1).mkString(" "))
      // segmentation is a partition: removing spaces restores the words
      assert(pt.replace(" ", "") == words.mkString(""))
    }
  }

  test("pruneByUsage: chars survive at zero usage, multi ranks by usage") {
    val df = Seq(
      (1L, "customer customer customer"),
      (2L, "window window"),
      (3L, "batch")
    ).toDF("doc_id", "text")
    val out = Unigram.pruneByUsage(df, "text", Unigram.FrozenVocab, keepMulti = 2)
      .as[(String, Long)].collect().toMap
    // all 24 chars present, most at usage 0
    assert(Unigram.FrozenVocab.map(_._1).filter(_.length == 1)
      .forall(out.contains))
    // "customer" segments through multi pieces 3×, "window" 2×,
    // "batch" 1× — keepMulti=2 keeps the two heaviest multi pieces
    val multi = out.keys.filter(_.length >= 2).toSeq
    assert(multi.size == 2, s"expected 2 multi survivors, got $multi")
    multi.foreach(p => assert(out(p) > 0L))
  }

  test("pieceIds: ids by (lp_q DESC, piece ASC), dense from 0") {
    val ids = Unigram.pieceIds(Unigram.FrozenVocab)
    assert(ids.size == Unigram.FrozenVocab.size)
    assert(ids.values.toSeq.sorted == (0 until ids.size))
    // id 0 is the most probable piece: max lp_q, ties → lex-min piece
    val best = Unigram.FrozenVocab.sortBy { case (p, q) => (-q, p) }.head._1
    assert(ids(best) == 0)
    // order is total and deterministic: re-derivation is identical
    assert(ids == Unigram.pieceIds(scala.util.Random.shuffle(Unigram.FrozenVocab)))
  }

  test("segmentToIds round-trips through the id table") {
    val df = Seq((7L, "customer join window")).toDF("doc_id", "text")
    val out = Unigram.segmentToIds(df, "doc_id", "text", Unigram.FrozenVocab)
      .as[(Long, Long, Seq[Int])].collect().head
    val rev = Unigram.pieceIds(Unigram.FrozenVocab).map(_.swap)
    val pieces = out._3.map(rev(_))
    assert(out._2 == pieces.length.toLong)
    assert(pieces.mkString("") == "customerjoinwindow")
    // and the pieces are the per-word Viterbi splits in word order
    val expect = Seq("customer", "join", "window")
      .flatMap(w => Unigram.viterbiWord(w, lpFrozen).get._1.split(' '))
    assert(pieces == expect)
  }

  test("byte fallback: path words keep their ids, no-path words emit byte ids, stream is total") {
    val df = Seq((1L, "customer zigzag join")).toDF("doc_id", "text")
    val v = Unigram.FrozenVocab
    val base = v.size
    val out = Unigram.segmentToIdsByteFallback(df, "doc_id", "text", v)
      .as[(Long, Long, Seq[Int])].collect().head
    // path words carry the EXACT segmentToIds ids; zigzag (no 'z'
    // piece) interleaves as one reserved byte id per char, in place
    val pathIds = Unigram.segmentToIds(
      Seq((1L, "customer"), (2L, "join")).toDF("doc_id", "text"),
      "doc_id", "text", v)
      .orderBy(col("doc_id")).as[(Long, Long, Seq[Int])].collect()
    val zz = "zigzag".getBytes("UTF-8").map(b => base + (b & 0xFF)).toSeq
    assert(out._3 == pathIds(0)._3 ++ zz ++ pathIds(1)._3)
    assert(out._2 == out._3.length.toLong)
    // byte ids live strictly above the piece-id range
    assert(zz.forall(i => i >= base && i < base + 256))
    // totality: every gate word of the plants corpus emits ids (the
    // plain face drops no-path words; the fallback face never does)
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val nWords = docs.select(
        explode(split(col("text"), " ", -1)).as("w"))
      .filter(Unigram.isGateWord(col("w"), Unigram.MaxWordLen))
      .count()
    val nPieces = Unigram.segmentToIdsByteFallback(
        docs, "doc_id", "text", v)
      .agg(sum(col("n_pieces"))).as[Long].collect().head
    assert(nPieces >= nWords, "every gate word must emit >= 1 id")
  }

  test("docLogLik sums per-word Viterbi scores exactly") {
    val df = Seq((1L, "customer join zigzag"), (2L, "q")).toDF("doc_id", "text")
    val out = Unigram.docLogLik(df, "doc_id", "text", Unigram.FrozenVocab)
      .orderBy(col("doc_id")).as[(Long, Long, Long, Double)].collect().toSeq
    def w(s: String) = Unigram.viterbiWord(s, lpFrozen).get
    val exp1 = Seq(w("customer"), w("join")) // zigzag has no path, drops
    assert(out(0)._2 == exp1.map(_._3.toLong).sum)
    assert(out(0)._3 == exp1.map(_._2).sum)
    assert(out(0)._4 == out(0)._3.toDouble / out(0)._2.toDouble)
    assert(out(1) == ((2L, 1L, w("q")._2, w("q")._2.toDouble)))
    // and the piece count agrees with the segmentation face
    val seg = Unigram.viterbiSegment(df, "doc_id", "text", Unigram.FrozenVocab)
      .orderBy(col("doc_id")).as[(Long, Long, Long, String)].collect()
    assert(out.map(_._2).toSeq == seg.map(_._3).toSeq)
  }

  test("emRound: coverage floor holds, probs re-estimated from usage") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val v2 = Unigram.emRound(docs, "text", Unigram.FrozenVocab, keepMulti = 12)
    // all 24 chars survive (the Laplace-smoothed segmentability floor)
    assert(v2.count(_._1.length == 1) == 24)
    assert(v2.count(_._1.length >= 2) <= 12)
    assert(v2.forall(_._2 < 0L))
    // round-2 pieces are a subset of round-1's; probs genuinely moved
    val v1 = Unigram.FrozenVocab.toMap
    assert(v2.forall { case (p, _) => v1.contains(p) })
    assert(v2.exists { case (p, q) => q != v1(p) },
      "usage re-estimation must move at least one log-prob")
    // re-segmentation under v2 keeps the same doc coverage (chars
    // guarantee every round-1-segmentable word stays segmentable)
    val ids1 = Unigram.viterbiSegment(docs, "doc_id", "text",
      Unigram.FrozenVocab).select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = Unigram.viterbiSegment(docs, "doc_id", "text", v2)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids2 == ids1)
  }

  test("iterated EM (tk30): corpus Viterbi log-likelihood non-decreasing round 1 -> 2") {
    val docs = graft.core.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("text"))
    val v2 = Unigram.emRound(docs, "text", Unigram.FrozenVocab, keepMulti = 12)
    val v3 = Unigram.emRound(docs, "text", v2, keepMulti = 12)
    // same drop rules both rounds (chars always kept, keepMulti fixed)
    // ⇒ word coverage identical, so the summed ll_q is comparable;
    // hard-EM re-estimation maximizes the complete-data objective the
    // re-segmentation then re-maximizes, so LL must not fall
    def corpusLl(v: Seq[(String, Long)]): Long =
      Unigram.docLogLik(docs, "doc_id", "text", v)
        .agg(sum(col("ll_q"))).as[Long].head()
    val ll2 = corpusLl(v2)
    val ll3 = corpusLl(v3)
    info(s"corpus ll_q: round1=$ll2 round2=$ll3")
    assert(ll3 >= ll2, s"EM round 2 decreased corpus log-likelihood: $ll3 < $ll2")
    // and the round-2 inventory still covers every round-1 doc
    assert(Unigram.viterbiSegment(docs, "doc_id", "text", v3).count() ==
      Unigram.viterbiSegment(docs, "doc_id", "text", v2).count())
    // emTrain is exactly the chained rounds, and a third round keeps
    // the monotone trend
    assert(Unigram.emTrain(docs, "text", Unigram.FrozenVocab,
      rounds = 2, keepMulti = 12) == v3)
    val v4 = Unigram.emRound(docs, "text", v3, keepMulti = 12)
    val ll4 = corpusLl(v4)
    info(s"corpus ll_q: round3=$ll4")
    assert(ll4 >= ll3, s"EM round 3 decreased corpus log-likelihood: $ll4 < $ll3")
  }

  test("maxWordLen lift: 13-25-char words segment on the uncapped path, drop on the gate path") {
    // letters drawn from the frozen single-char inventory (no x/z), so
    // every word HAS a path; lengths straddle and exceed MaxWordLen
    val longWords = Seq(
      "customerjoins",            // 13
      "filterwindowsort",         // 16
      "mergesortcustomerjoin",    // 21
      "windowcustomerfilterjoin") // 24
    longWords.foreach(w => assert(w.length > Unigram.MaxWordLen))
    val df = longWords.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    // gate path (oracle-unroll cap): every word drops
    assert(Unigram.viterbiSegment(df, "doc_id", "text",
      Unigram.FrozenVocab).count() == 0)
    // uncapped production path: every word segments, and each doc's
    // result equals the pure DP on its word
    val out = Unigram.viterbiSegment(df, "doc_id", "text",
      Unigram.FrozenVocab, maxWordLen = Int.MaxValue)
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out.size == longWords.size)
    val lp = Unigram.FrozenVocab.toMap
    longWords.zipWithIndex.foreach { case (w, i) =>
      val (seg, _, n) = Unigram.viterbiWord(w, lp).get
      assert(out(i) == ((i.toLong, 1L, n.toLong, seg)), s"word $w")
    }
    // ids and log-lik faces honor the same lift
    assert(Unigram.segmentToIds(df, "doc_id", "text", Unigram.FrozenVocab,
      maxWordLen = Int.MaxValue).count() == longWords.size)
    assert(Unigram.docLogLik(df, "doc_id", "text", Unigram.FrozenVocab,
      maxWordLen = Int.MaxValue).count() == longWords.size)
    // the streaming face mirrors the lift: uncapped stream-shaped ==
    // uncapped batch, and the gate default still drops every long word
    val streamUncapped = graft.streaming.DocStream.unigramSegment(
      df, Unigram.FrozenVocab, maxWordLen = Int.MaxValue)
      .orderBy(col("doc_id")).as[(Long, Long, Long, String)].collect().toSeq
    assert(streamUncapped == out)
    assert(graft.streaming.DocStream.unigramSegment(
      df, Unigram.FrozenVocab).count() == 0)
  }

  test("vocab artifact round-trips: save -> load -> segment == segment") {
    val dir = graft.core.Staging.tmpDir("unigram_vocab_artifact")
    Unigram.saveVocab(spark, Unigram.FrozenVocab, dir)
    val loaded = Unigram.loadVocab(spark, dir)
    assert(loaded.toSet == Unigram.FrozenVocab.toSet)
    // rank column IS the pieceIds id — the file alone rebuilds the id table
    assert(Unigram.pieceIds(loaded) == Unigram.pieceIds(Unigram.FrozenVocab))
    val df = Seq((1L, "customer join window")).toDF("doc_id", "text")
    val direct = Unigram.viterbiSegment(df, "doc_id", "text",
      Unigram.FrozenVocab).as[(Long, Long, Long, String)].collect().toSeq
    val viaArtifact = Unigram.viterbiSegment(df, "doc_id", "text", loaded)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(viaArtifact == direct)
  }

  test("streaming face == batch on a staged corpus (e34 semantics)") {
    // the per-partition memoized stream map must reproduce the batch
    // join exactly — including no-path and over-length drops
    val rows = Seq(
      (1L, "joinhash zigzag q"),
      (2L, "sortmergejoin"),
      (3L, "customer join window a"),
      (4L, "zigzag")
    )
    val df = rows.toDF("doc_id", "text")
    val batch = Unigram.viterbiSegment(df, "doc_id", "text", Unigram.FrozenVocab)
      .orderBy(col("doc_id")).as[(Long, Long, Long, String)].collect().toSeq
    val streamShaped = graft.streaming.DocStream.unigramSegment(
      df, Unigram.FrozenVocab)
      .orderBy(col("doc_id")).as[(Long, Long, Long, String)].collect().toSeq
    assert(streamShaped == batch)
  }

  test("softExpectations: posterior mass splits by path probability, chars covered once") {
    def q(p: Double): Long = math.floor(math.log(p) * 1e6 + 1e-4).toLong
    val lp = Map("a" -> q(0.3), "b" -> q(0.3), "ab" -> q(0.4))
    val (e, ll) = Unigram.softExpectations("ab", lp).get
    // paths: [ab] mass 0.4, [a b] mass 0.09 -> marginal 0.49
    assert(math.abs(ll - math.log(0.49)) < 1e-4)
    assert(math.abs(e("ab") - 0.4 / 0.49) < 1e-4)
    assert(math.abs(e("a") - 0.09 / 0.49) < 1e-4)
    assert(math.abs(e("b") - 0.09 / 0.49) < 1e-4)
    // every character is covered exactly once in every segmentation,
    // so expected char coverage equals the word length EXACTLY-ish
    val coverage = e.map { case (p, c) => p.length * c }.sum
    assert(math.abs(coverage - 2.0) < 1e-9)
    // the drop rule matches viterbiWord's
    assert(Unigram.softExpectations("ax", lp).isEmpty)
  }

  test("softExpectations: hard EM recovered as the temperature->0 limit") {
    def q(p: Double): Long = math.floor(math.log(p) * 1e6 + 1e-4).toLong
    val lp = Map("a" -> q(0.3), "b" -> q(0.3), "ab" -> q(0.4))
    // scaling all log-probs by T sharpens the posterior exponentially
    // toward the argmax path — the Viterbi segmentation [ab]
    val sharp = lp.map { case (k, v) => (k, v * 8) }
    val (e, _) = Unigram.softExpectations("ab", sharp).get
    val viterbi = Unigram.viterbiWord("ab", lp).get._1
    assert(viterbi == "ab")
    assert(e("ab") > 0.999, s"soft posterior should concentrate: ${e("ab")}")
    assert(e.getOrElse("a", 0.0) < 1e-3)
  }

  test("quantized soft census tracks the unquantized fold and keeps the coverage identity") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, sf0001)
    val gated = Unigram.softUsageCensusQuantized(docs, "text",
      Unigram.FrozenVocab)
      .as[(String, Long)].collect().toMap
    val free = Unigram.softUsage(docs, "text", Unigram.FrozenVocab)
      .as[(String, Double)].collect().toMap
    // the gate emits every vocab piece; the free fold only used ones
    assert(gated.keySet == Unigram.FrozenVocab.map(_._1).toSet)
    free.foreach { case (p, u) =>
      val g = gated(p).toDouble / 1e9
      // per-word quantization bias is ≤ ~1e-9·freq; probability
      // quantization adds ~1e-9 relative — generous combined slack
      assert(math.abs(g - u) <= math.max(1e-4, u * 1e-4),
        s"$p: quantized $g vs free $u")
    }
    // coverage identity, census level: every covered character is
    // covered by exactly one piece in every path, so
    // Σ usage·len(piece) = total covered word-chars (×1e9, quantized)
    val pieceLen = Unigram.FrozenVocab.map { case (p, _) => p -> p.length }.toMap
    val lhs = gated.map { case (p, u) => u.toDouble / 1e9 * pieceLen(p) }.sum
    val pq = Unigram.FrozenVocab.map { case (p, q) => p -> Unigram.quantProb(q) }.toMap
    val rhs = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("\\A[a-z]+\\z") && length(col("w")) <= 12)
      .as[String].collect()
      .filter(w => Unigram.softExpectationsQuantized(w, pq).isDefined)
      .map(_.length.toLong).sum
    assert(math.abs(lhs - rhs) <= math.max(1.0, rhs * 1e-6),
      s"coverage identity broke: $lhs vs $rhs")
  }

  test("soft EM: corpus marginal log-likelihood non-decreasing over 3 rounds") {
    val docs = graft.core.Tables.documents(spark, sf0001)
    import spark.implicits._
    val seed = Unigram.seedVocab(docs, "text")
      .select($"piece", $"lp_q").as[(String, Long)].collect().toSeq
    var v = seed.toVector
    var prev = Unigram.corpusMarginalLogLik(docs, "text", v)
    for (r <- 1 to 3) {
      v = Unigram.emRoundSoft(docs, "text", v, keepMulti = 24)
      val ll = Unigram.corpusMarginalLogLik(docs, "text", v)
      info(f"soft-EM round $r: marginal ll $prev%.2f -> $ll%.2f")
      // true EM guarantees monotonicity; pruning + Laplace smoothing
      // are the two deviations, so pin it empirically (the tk30
      // discipline) with a quantization-sized slack
      assert(ll >= prev - 1e-3,
        s"marginal ll fell at round $r: $prev -> $ll")
      prev = ll
    }
  }
}

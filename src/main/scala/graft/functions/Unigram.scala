package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer — the SentencePiece-family alternative to BPE
  * (Kudo 2018): instead of a learned MERGE sequence, the model is a
  * PIECE INVENTORY with log-probabilities, and a word's tokenization
  * is the max-likelihood segmentation (Viterbi over piece scores).
  * The two families are the production tokenizer duopoly; graft ships
  * both so token-denominated operators can be driven by either.
  *
  * Semantics (the graft unigram contract, identical on engine and
  * oracle):
  *
  *  - Corpus words are space-split tokens filtered to regex-inert
  *    `^[a-z]+$` with length ≤ [[MaxWordLen]] (the [[Bpe.learnSql]]
  *    filter discipline, plus a length cap because the DuckDB oracle
  *    unrolls ONE DP STAGE PER CHARACTER POSITION — the
  *    [[Bpe.learnSql]] one-stage-per-merge trick turned sideways).
  *  - Seed vocabulary ([[seedVocab]]): every substring of every
  *    distinct word up to [[MaxPieceLen]] chars, occurrence-counted
  *    and frequency-weighted with exact longs; score = cnt·len (the
  *    SentencePiece seed heuristic). Selection = ALL single-char
  *    pieces ∪ top-[[TopMulti]] multi-char pieces by (score DESC,
  *    piece ASC) — count ties broken lexicographically so selection
  *    is deterministic under any partitioning.
  *  - Piece log-probs quantize ONCE via the t9 nudged floor —
  *    lp_q = floor(ln(score/total)·1e6 + 1e-4) as int64 — and every
  *    downstream comparison is over exact int64 SUMS of lp_q, so
  *    libm last-ulp drift cannot reorder segmentations cross-engine.
  *  - Viterbi ([[viterbiSegment]]): best[k] = max over piece lengths
  *    j of best[k−j] + lp_q(w[k−j..k)), ties broken by the
  *    lexicographically SMALLEST space-joined piece string. The lex
  *    tie-break is DP-safe: two tied prefixes end at the same char
  *    position with identical underlying characters, so their joined
  *    strings differ first at a space-vs-letter position (' ' < any
  *    [a-z]) and neither is a prefix of the other — appending a
  *    common continuation preserves the order, so the locally
  *    lex-min choice is globally lex-min (UnigramSpec pins this on
  *    planted ties).
  *  - A word containing a character absent from the piece inventory
  *    has NO segmentation path and DROPS on both sides (the join
  *    semantics); a word longer than [[MaxWordLen]] is excluded by
  *    the corpus filter on both sides. Both are planted (tk23).
  *
  * Scale shape: segmentation is a pure function of the WORD, so the
  * DP runs once per DISTINCT word (Heaps' law — orders of magnitude
  * smaller than the corpus) as a compiled typed map; the corpus pays
  * a broadcast hash join plus one doc-keyed reassembly agg, exactly
  * the [[Bpe.tokenizeDocs]] plan. Seeding is one substring-explode
  * aggregation (shuffle volume O(vocab·len·[[MaxPieceLen]]), NOT
  * corpus-sized) with a TakeOrdered top-K; pruning adds one more
  * broadcast-joined aggregation. No driver-side corpus work anywhere.
  */
object Unigram {

  /** Longest piece the seed inventory admits (SentencePiece's
    * max_sentencepiece_length spirit; 6 covers every multi-char piece
    * worth learning on the gate corpora while keeping the substring
    * explosion O(len·6) per word).
    */
  val MaxPieceLen = 6

  /** Longest word the GATES admit — the DuckDB Viterbi replay unrolls
    * one DP stage per character position, so the oracle is generated
    * with exactly this many stages and the corpus filter caps word
    * length SYMMETRICALLY on both sides (fixture max is 8 at every
    * sf; the 13-char plant pins the exclusion). The engine DP itself
    * has no length limit.
    */
  val MaxWordLen = 12

  /** Multi-char seed pieces kept (single chars are always kept — they
    * are the fallback that keeps every in-alphabet word segmentable).
    */
  val TopMulti = 24

  // ------------------------------------------------------------ engine

  /** The gate word filter, spelled ONCE: regex anchors are \A..\z
    * (absolute ends — Java's `$` matches BEFORE a final line
    * terminator, so `^[a-z]+$` would admit a trailing-newline token
    * the oracle's RE2 `regexp_full_match` and the stream face's
    * per-char test both reject; fixtures are newline-free today, but
    * regens have planted surprises before — see the events.ts trap).
    */
  private[graft] def isGateWord(w: Column, maxWordLen: Int): Column = {
    val base = w.rlike("\\A[a-z]+\\z")
    if (maxWordLen == Int.MaxValue) base else base && length(w) <= maxWordLen
  }

  /** (idCol, __pos, __w) word stream under [[isGateWord]] — one
    * spelling shared by every batch face (the Bpe.tokenizeWordsWith
    * discipline: the filter and join semantics live in one place).
    * `maxWordLen` is the ORACLE-UNROLL cap, not an engine limit — the
    * DP itself segments any length ([[viterbiWord]]); pass
    * `Int.MaxValue` for the uncapped production path (r15: the cap
    * was a silent data cut on 13+-char words; gates keep the capped
    * fixture contract because the DuckDB replay unrolls one stage per
    * character position).
    */
  private def wordsOf(df: DataFrame, idCol: String, textCol: String,
                      maxWordLen: Int = MaxWordLen): DataFrame =
    df.select(col(idCol),
        posexplode(split(col(textCol), " ", -1)).as(Seq("__pos", "__w")))
      .filter(isGateWord(col("__w"), maxWordLen))

  private[graft] def wordFreqs(df: DataFrame, textCol: String,
                               maxWordLen: Int = MaxWordLen): Dataset[(String, Long)] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(explode(split(col(textCol), " ", -1)).as("__w"))
      .filter(isGateWord(col("__w"), maxWordLen))
      .groupBy(col("__w")).agg(count(lit(1)).as("f"))
      .as[(String, Long)]
  }

  /** Seed vocabulary with quantized log-probs:
    * (piece, cnt, score, lp_q). Substring counting runs over the
    * DISTINCT-word frame (tiny), then one exact-long aggregation; the
    * top-K is a TakeOrdered, not a global sort materialization.
    */
  def seedVocab(df: DataFrame, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val scored = wordFreqs(df, textCol)
      .flatMap { case (w, f) =>
        for {
          i <- 0 until w.length
          j <- (i + 1) to math.min(i + MaxPieceLen, w.length)
        } yield (w.substring(i, j), f)
      }
      .toDF("piece", "f")
      .groupBy(col("piece")).agg(sum(col("f")).as("cnt"))
      .withColumn("score", col("cnt") * length(col("piece")).cast("long"))
    val chars = scored.filter(length(col("piece")) === 1)
    val multi = scored.filter(length(col("piece")) >= 2)
      .orderBy(col("score").desc, col("piece")).limit(TopMulti)
    val sel = chars.unionByName(multi)
    // 1-row scalar: the probability denominator over the SELECTED set
    val tot = sel.agg(sum(col("score")).as("__tot"))
    sel.crossJoin(broadcast(tot))
      .withColumn("lp_q",
        floor(log(col("score").cast("double") / col("__tot").cast("double"))
          * lit(1e6) + lit(1e-4)).cast("long"))
      .select(col("piece"), col("cnt"), col("score"), col("lp_q"))
  }

  /** Max-likelihood segmentation of one word under quantized piece
    * scores: returns (space-joined pieces, total lp_q, piece count),
    * or None when no path covers the word (some character has no
    * piece). Pure — safe in closures; `lp` is the small inventory.
    */
  def viterbiWord(w: String, lp: Map[String, Long]): Option[(String, Long, Int)] = {
    val n = w.length
    val sc = Array.fill[Long](n + 1)(Long.MinValue)
    val seg = new Array[String](n + 1)
    sc(0) = 0L
    seg(0) = ""
    var k = 1
    while (k <= n) {
      var bestS = Long.MinValue
      var bestSeg: String = null
      var j = 1
      val jMax = math.min(MaxPieceLen, k)
      while (j <= jMax) {
        if (seg(k - j) != null) {
          lp.get(w.substring(k - j, k)) match {
            case Some(s) =>
              val cand = sc(k - j) + s
              if (cand > bestS) {
                bestS = cand
                bestSeg = if (seg(k - j).isEmpty) w.substring(k - j, k)
                          else seg(k - j) + " " + w.substring(k - j, k)
              } else if (cand == bestS) {
                val candSeg = if (seg(k - j).isEmpty) w.substring(k - j, k)
                              else seg(k - j) + " " + w.substring(k - j, k)
                if (candSeg.compareTo(bestSeg) < 0) bestSeg = candSeg
              }
            case None => ()
          }
        }
        j += 1
      }
      if (bestSeg != null) { sc(k) = bestS; seg(k) = bestSeg }
      k += 1
    }
    Option(seg(n)).map { s =>
      (s, sc(n), s.count(_ == ' ') + 1)
    }
  }

  /** Segment every document under a frozen piece inventory:
    * (idCol, n_words, n_pieces, piece_text). Distinct-word memoized
    * DP + broadcast join + one doc-keyed ordered reassembly (the
    * [[Bpe.tokenizeDocs]] plan). Words with no path drop (and so do
    * docs whose every word drops) — the oracle's join semantics.
    */
  def viterbiSegment(df: DataFrame, idCol: String, textCol: String,
                     vocab: Seq[(String, Long)],
                     maxWordLen: Int = MaxWordLen): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val lp = vocab.toMap
    val words = wordsOf(df, idCol, textCol, maxWordLen)
    val segs = words.select(col("__w")).distinct().as[String]
      .flatMap { w =>
        viterbiWord(w, lp).map { case (s, _, n) => (w, s, n.toLong) }
      }
      .toDF("__w", "__seg", "__n")
    words.join(broadcast(segs), Seq("__w"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("__n")).as("n_pieces"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("__pos"), col("__seg")))),
            s => s("__seg")),
          " ").as("piece_text"))
  }

  /** One usage-based pruning round (the EM-lite vocabulary shrink):
    * segment the distinct-word corpus under `vocab`, count each
    * piece's frequency-weighted usage, and keep ALL single-char
    * pieces (usage 0 allowed — they are the segmentability floor)
    * plus the top-`keepMulti` multi-char pieces by (usage DESC,
    * piece ASC), usage > 0. Returns (piece, usage). Full SentencePiece
    * prunes by EM loss-increase; usage pruning is the documented
    * deterministic simplification — unused and rarely-used pieces are
    * exactly the ones EM assigns vanishing probability.
    */
  def pruneByUsage(df: DataFrame, textCol: String,
                   vocab: Seq[(String, Long)], keepMulti: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val lp = vocab.toMap
    val usage = wordFreqs(df, textCol)
      .flatMap { case (w, f) =>
        viterbiWord(w, lp).toSeq.flatMap { case (s, _, _) =>
          s.split(' ').iterator.map(p => (p, f))
        }
      }
      .toDF("piece", "f")
      .groupBy(col("piece")).agg(sum(col("f")).as("usage"))
    val vdf = vocab.toDF("piece", "lp_q").select(col("piece"))
    val chars = vdf.filter(length(col("piece")) === 1)
      .join(usage, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("usage"), lit(0L)).as("usage"))
    val multi = vdf.filter(length(col("piece")) >= 2)
      .join(usage, Seq("piece"))
      .filter(col("usage") > 0)
      .orderBy(col("usage").desc, col("piece")).limit(keepMulti)
      .select(col("piece"), col("usage"))
    chars.unionByName(multi)
  }

  /** One EM-style refinement round — the SentencePiece loop closed
    * deterministically: prune by usage ([[pruneByUsage]]), then
    * RE-ESTIMATE piece log-probs from the usage counts (probability ∝
    * expected count under the current segmentation — Viterbi counts
    * standing in for forward-backward expectations, the documented
    * hard-EM simplification). Single-char pieces carry +1 Laplace
    * smoothing so a zero-usage char keeps a finite log-prob and
    * coverage never collapses. Returns the round-2 inventory; feed it
    * back to [[viterbiSegment]] (tk29) or iterate. The collect is
    * model-sized (bounded — the frozen-table closure contract), and
    * the nudged floor quantizes ln once, so the round-2 scores are
    * exact int64s cross-engine like the seed's.
    */
  def emRound(df: DataFrame, textCol: String,
              vocab: Seq[(String, Long)], keepMulti: Int): Vector[(String, Long)] = {
    val spark = df.sparkSession
    import spark.implicits._
    val pruned = pruneByUsage(df, textCol, vocab, keepMulti)
      .as[(String, Long)].collect()
    val scored = pruned.map { case (p, u) =>
      (p, if (p.length == 1) u + 1L else u)
    }
    val total = scored.map(_._2).sum
    scored.map { case (p, s) =>
      (p, math.floor(math.log(s.toDouble / total.toDouble) * 1e6 + 1e-4).toLong)
    }.sortBy(_._1).toVector
  }

  /** The EM loop run to a fixed round budget — [[emRound]] chained
    * `rounds` times (tk29 is one round, tk30 gates two; this is the
    * production wrapper). Same drop rules every round (chars always
    * kept, keepMulti fixed), so word coverage is constant and the
    * corpus Viterbi log-likelihood is comparable — and non-decreasing
    * — across rounds (UnigramSpec pins monotonicity per consecutive
    * pair over a 3-round run).
    */
  def emTrain(df: DataFrame, textCol: String, seed: Seq[(String, Long)],
              rounds: Int, keepMulti: Int): Vector[(String, Long)] = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var v = seed.toVector
    var t = 0
    while (t < rounds) {
      v = emRound(df, textCol, v, keepMulti)
      t += 1
    }
    v
  }

  /** SOFT-EM expectations for one word — SentencePiece's forward–
    * backward E-step, the piece [[emRound]]'s hard (Viterbi-count)
    * simplification stands in for: expected piece counts over ALL
    * segmentations weighted by path probability, plus the word's
    * marginal log-likelihood ln Σ_paths Π p(piece).
    *
    * Computed in LINEAR probability space: with words capped at
    * [[MaxWordLen]] chars and per-piece probabilities far above
    * e^-700/12, no path mass can underflow a double, so the usual
    * log-sum-exp machinery (the reason the soft E-step is not
    * oracle-able — DuckDB has no stable lse) is unnecessary ENGINE-
    * side. Spec-level properties cover it instead of a gate
    * (UnigramSpec: per-char coverage identity, hard-EM as the
    * temperature→0 limit, non-decreasing corpus marginal under
    * [[emRoundSoft]]); the oracle-exact training path stays hard-EM.
    * Returns None when no piece path covers the word (same drop rule
    * as [[viterbiWord]]).
    */
  def softExpectations(w: String,
                       lp: Map[String, Long]): Option[(Map[String, Double], Double)] = {
    val n = w.length
    def p(piece: String): Option[Double] =
      lp.get(piece).map(q => math.exp(q.toDouble / 1e6))
    val alpha = new Array[Double](n + 1)
    alpha(0) = 1.0
    for (k <- 1 to n; j <- 1 to math.min(MaxPieceLen, k))
      p(w.substring(k - j, k)).foreach(pp => alpha(k) += alpha(k - j) * pp)
    if (alpha(n) == 0.0) None
    else {
      val beta = new Array[Double](n + 1)
      beta(n) = 1.0
      for (k <- (n - 1) to 0 by -1; j <- 1 to math.min(MaxPieceLen, n - k))
        p(w.substring(k, k + j)).foreach(pp => beta(k) += pp * beta(k + j))
      val e = scala.collection.mutable.Map.empty[String, Double]
      for (i <- 0 until n; j <- 1 to math.min(MaxPieceLen, n - i)) {
        val piece = w.substring(i, i + j)
        p(piece).foreach { pp =>
          val post = alpha(i) * pp * beta(i + j) / alpha(n)
          if (post > 0.0) e(piece) = e.getOrElse(piece, 0.0) + post
        }
      }
      Some((e.toMap, math.log(alpha(n))))
    }
  }

  /** Corpus EXPECTED piece usage under the soft E-step — the
    * forward–backward sibling of [[pruneByUsage]]'s Viterbi census:
    * Σ_words freq(w) · E[count of piece in w]. Double-valued and
    * therefore order-sensitive across partitions — a SPEC/analysis
    * surface, deliberately not a gate (see [[softExpectations]]).
    */
  def softUsage(df: DataFrame, textCol: String,
                vocab: Seq[(String, Long)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val lp = vocab.toMap
    wordFreqs(df, textCol)
      .flatMap { case (w, f) =>
        softExpectations(w, lp).toSeq.flatMap(_._1.iterator
          .map { case (piece, e) => (piece, e * f) })
      }
      .toDF("piece", "eu")
      .groupBy(col("piece")).agg(sum(col("eu")).as("usage"))
  }

  /** Piece probability QUANTIZED for the oracle-able soft census
    * (tk34): p_q = floor(exp(lp_q/1e6)·1e9 + 1e-4)/1e9. exp is the
    * one transcendental — its last-ulp drift on the ·1e9 scale is
    * ≤ 1e-7 quantized units against the 1e-4 nudge, so the floor is
    * cross-engine stable; everything downstream (forward–backward
    * products and sums) is then pure IEEE arithmetic on identical
    * operands. A piece whose probability floors to 0 contributes zero
    * path mass — deterministically on both engines.
    */
  private[graft] def quantProb(q: Long): Double =
    math.floor(math.exp(q.toDouble / 1e6) * 1e9 + 1e-4) / 1e9

  /** [[softExpectations]] under QUANTIZED piece probabilities, with
    * the word's expected counts themselves quantized at emission —
    * eq(piece) = floor(E[count]·1e9 + 1e-4) as int64. This is the t9
    * discipline applied at the per-word boundary (the r16 verdict's
    * route to gating the soft E-step): E is a pure IEEE function of
    * the quantized probabilities (alpha/beta accumulate in fixed
    * (i, j) ascending order; absent pieces contribute +0.0, an IEEE
    * identity on the non-negative masses here), so eq is bit-stable
    * cross-engine, and the corpus census becomes an EXACT int64 sum —
    * order-free, unlike [[softUsage]]'s double fold. Returns None
    * when no piece path covers the word (the [[viterbiWord]] drop).
    */
  def softExpectationsQuantized(w: String,
                                pq: Map[String, Double]): Option[Map[String, Long]] = {
    val n = w.length
    def p(piece: String): Option[Double] = pq.get(piece)
    val alpha = new Array[Double](n + 1)
    alpha(0) = 1.0
    for (k <- 1 to n; j <- 1 to math.min(MaxPieceLen, k))
      p(w.substring(k - j, k)).foreach(pp => alpha(k) += alpha(k - j) * pp)
    if (alpha(n) == 0.0) None
    else {
      val beta = new Array[Double](n + 1)
      beta(n) = 1.0
      for (k <- (n - 1) to 0 by -1; j <- 1 to math.min(MaxPieceLen, n - k))
        p(w.substring(k, k + j)).foreach(pp => beta(k) += pp * beta(k + j))
      // accumulate per piece in (i, j) ascending order — the oracle's
      // list(post ORDER BY i, j) left fold replays exactly this
      val e = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      for (i <- 0 until n; j <- 1 to math.min(MaxPieceLen, n - i)) {
        val piece = w.substring(i, i + j)
        p(piece).foreach { pp =>
          val post = alpha(i) * pp * beta(i + j) / alpha(n)
          e.update(piece, e.getOrElse(piece, 0.0) + post)
        }
      }
      Some(e.iterator.map { case (piece, v) =>
        piece -> math.floor(v * 1e9 + 1e-4).toLong
      }.toMap)
    }
  }

  /** The GATED soft-EM census (tk34): per vocab piece,
    * usage_q = Σ_words freq(w) · eq(w, piece) — exact int64 products
    * and sums of the per-word quantized expectations, so the corpus
    * fold is order-free and the whole census oracle-exact (the
    * quantity [[softUsage]] computes as an ungatable double).
    * Emits EVERY vocab piece (0 when unused) so the output set is
    * partition-independent. Int64 headroom: eq ≤ wordlen·1e9 ≈ 1.2e10,
    * so freq beyond ~7.7e8 occurrences of one word would overflow the
    * per-word product — at that corpus scale drop the census to a
    * wider fixed point. Scale shape: the DP runs once per DISTINCT
    * word in a compiled flatMap; one vocabulary-keyed partial-agg sum.
    */
  def softUsageCensusQuantized(df: DataFrame, textCol: String,
                               vocab: Seq[(String, Long)]): DataFrame =
    softCensusOnWordFreqs(wordFreqs(df, textCol).toDF("__w", "f"), vocab)

  /** [[softUsageCensusQuantized]] over an ALREADY-BUILT word census
    * (`__w`, `f` exact longs) — the serve half of the streaming
    * fold-then-serve split (e50): because the per-word quantized
    * expectation eq is a pure function of the word string and the
    * frozen vocab, a census drained from micro-batch folds feeds this
    * identically to the one-shot census. Shared with the batch face
    * so the two spellings cannot drift (the e43/e49 discipline).
    */
  def softCensusOnWordFreqs(wordCensus: DataFrame,
                            vocab: Seq[(String, Long)]): DataFrame = {
    val spark = wordCensus.sparkSession
    import spark.implicits._
    val pq = vocab.map { case (p, q) => p -> quantProb(q) }.toMap
    val census = wordCensus.as[(String, Long)]
      .flatMap { case (w, f) =>
        softExpectationsQuantized(w, pq).toSeq
          .flatMap(_.iterator.map { case (piece, eq) => (piece, eq * f) })
      }
      .toDF("piece", "uq")
      .groupBy(col("piece")).agg(sum(col("uq")).as("usage_q"))
    vocab.map(_._1).toDF("piece")
      .join(census, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("usage_q"), lit(0L)).as("usage_q"))
  }

  /** Corpus marginal log-likelihood Σ_words freq · ln Σ_paths — the
    * quantity true EM is guaranteed to not decrease (the spec's
    * monotonicity readout for [[emRoundSoft]]).
    */
  def corpusMarginalLogLik(df: DataFrame, textCol: String,
                           vocab: Seq[(String, Long)]): Double = {
    val spark = df.sparkSession
    import spark.implicits._
    val lp = vocab.toMap
    wordFreqs(df, textCol)
      .flatMap { case (w, f) =>
        softExpectations(w, lp).map { case (_, ll) => ll * f }
      }
      // sum over an EMPTY frame is NULL (no covered word at all) —
      // coalesce to 0.0 rather than crash the typed head()
      .toDF("ll").agg(coalesce(sum(col("ll")), lit(0.0)))
      .as[Double].head()
  }

  /** One SOFT-EM round: [[emRound]] with forward–backward expected
    * usage replacing the Viterbi census (prune multi pieces to the
    * top keepMulti by 6-dp-rounded expected usage, chars always kept
    * with +1 Laplace, re-estimate lp ∝ usage, quantize at emission).
    * Spec-level surface — double usage makes ranking ties float-
    * sensitive, so the GATED trainer stays [[emRound]]'s hard-EM.
    */
  def emRoundSoft(df: DataFrame, textCol: String,
                  vocab: Seq[(String, Long)],
                  keepMulti: Int): Vector[(String, Long)] = {
    val spark = df.sparkSession
    import spark.implicits._
    val usage = softUsage(df, textCol, vocab)
    val vdf = vocab.toDF("piece", "lp_q").select(col("piece"))
    val chars = vdf.filter(length(col("piece")) === 1)
      .join(usage, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("usage"), lit(0.0)).as("usage"))
    val multi = vdf.filter(length(col("piece")) >= 2)
      .join(usage, Seq("piece"))
      .filter(col("usage") > 0.0)
      .orderBy(round(col("usage"), 6).desc, col("piece")).limit(keepMulti)
      .select(col("piece"), col("usage"))
    val pruned = chars.unionByName(multi).as[(String, Double)].collect()
    val scored = pruned.map { case (p, u) =>
      (p, if (p.length == 1) u + 1.0 else u)
    }
    val total = scored.map(_._2).sum
    scored.map { case (p, s) =>
      (p, math.floor(math.log(s / total) * 1e6 + 1e-4).toLong)
    }.sortBy(_._1).toVector
  }

  /** Deterministic piece→id table — the model-ready vocabulary: ids
    * by (lp_q DESC, piece ASC), i.e. most probable piece gets id 0.
    * Derived from the frozen inventory on both sides (the oracle
    * embeds the SAME table as a VALUES list — no SQL-side
    * re-derivation to drift).
    */
  def pieceIds(vocab: Seq[(String, Long)]): Map[String, Int] =
    vocab.sortBy { case (p, q) => (-q, p) }
      .zipWithIndex.map { case ((p, _), i) => p -> i }.toMap

  /** [[viterbiSegment]] emitting integer piece IDS — the artifact a
    * training run consumes: (idCol, n_pieces, piece_ids) with ids
    * from [[pieceIds]] in (word, piece) order. Same distinct-word
    * memoized shape.
    */
  def segmentToIds(df: DataFrame, idCol: String, textCol: String,
                   vocab: Seq[(String, Long)],
                   maxWordLen: Int = MaxWordLen): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val lp = vocab.toMap
    val ids = pieceIds(vocab)
    val words = wordsOf(df, idCol, textCol, maxWordLen)
    val segs = words.select(col("__w")).distinct().as[String]
      .flatMap { w =>
        viterbiWord(w, lp).map { case (s, _, _) =>
          val pid = s.split(' ').map(ids(_))
          (w, pid, pid.length.toLong)
        }
      }
      .toDF("__w", "__ids", "__n")
    words.join(broadcast(segs), Seq("__w"))
      .groupBy(col(idCol))
      .agg(
        sum(col("__n")).as("n_pieces"),
        flatten(
          transform(
            array_sort(collect_list(struct(col("__pos"), col("__ids")))),
            s => s("__ids"))).as("piece_ids"))
  }

  /** [[segmentToIds]] with BYTE FALLBACK — SentencePiece's
    * `byte_fallback=true` (the Llama-family config): a word with NO
    * piece path (a character absent from the inventory) decomposes
    * into its UTF-8 bytes, one reserved id per byte value
    * (`vocab.size + b`, the 256-slot block SentencePiece appends as
    * `<0x00>`..`<0xFF>`), instead of dropping. The id stream is then
    * total — every gate word emits ids — which is what a no-[UNK]
    * training pipeline needs. Packing under this id space must use
    * `vocab.size + 256` as the separator, not [[sepId]]. Gate words
    * are [a-z]+ (ASCII), so byte == code point on both engines.
    */
  def segmentToIdsByteFallback(df: DataFrame, idCol: String, textCol: String,
                               vocab: Seq[(String, Long)],
                               maxWordLen: Int = MaxWordLen): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val lp = vocab.toMap
    val ids = pieceIds(vocab)
    val base = vocab.size
    val words = wordsOf(df, idCol, textCol, maxWordLen)
    val segs = words.select(col("__w")).distinct().as[String]
      .map { w =>
        viterbiWord(w, lp) match {
          case Some((s, _, _)) =>
            val pid = s.split(' ').map(ids(_))
            (w, pid, pid.length.toLong)
          case None =>
            val pid = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
              .map(b => base + (b & 0xFF))
            (w, pid, pid.length.toLong)
        }
      }
      .toDF("__w", "__ids", "__n")
    words.join(broadcast(segs), Seq("__w"))
      .groupBy(col(idCol))
      .agg(
        sum(col("__n")).as("n_pieces"),
        flatten(
          transform(
            array_sort(collect_list(struct(col("__pos"), col("__ids")))),
            s => s("__ids"))).as("piece_ids"))
  }

  /** Per-document log-likelihood under the piece LM — the quality
    * signal an LM-based filter thresholds (low avg log-prob = text the
    * model finds surprising): ll_q = Σ lp_q over every piece occurrence
    * (exact int64 — a word's Viterbi score is the sum of its pieces',
    * so doc ll is the sum of word scores), n_pieces, and
    * avg_lp = ll_q / n_pieces (ONE IEEE division of two exact int64s —
    * engine-portable, the dc1 contamination-ratio device). Same
    * distinct-word memoized shape as [[viterbiSegment]].
    */
  def docLogLik(df: DataFrame, idCol: String, textCol: String,
                vocab: Seq[(String, Long)],
                maxWordLen: Int = MaxWordLen): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val lp = vocab.toMap
    val words = wordsOf(df, idCol, textCol, maxWordLen)
    val segs = words.select(col("__w")).distinct().as[String]
      .flatMap { w =>
        viterbiWord(w, lp).map { case (_, sc, n) => (w, sc, n.toLong) }
      }
      .toDF("__w", "__sc", "__n")
    words.join(broadcast(segs), Seq("__w"))
      .groupBy(col(idCol))
      .agg(
        sum(col("__n")).as("n_pieces"),
        sum(col("__sc")).as("ll_q"),
        (sum(col("__sc")).cast("double") / sum(col("__n")).cast("double"))
          .as("avg_lp"))
  }

  /** End-of-document separator id for cross-doc sequence packing:
    * [[pieceIds]] ids are dense 0..size−1, so `size` is the first free
    * id — derived from the inventory so engine and oracle agree by
    * construction (the [[Bpe.sepId]] convention).
    */
  def sepId(vocab: Seq[(String, Long)]): Int = vocab.size

  // ------------------------------------------------------- persistence

  /** Persist the piece inventory as parquet — the model artifact a
    * release ships next to its data (rank = the [[pieceIds]] id, so
    * the file alone reconstructs the id table deterministically).
    */
  def saveVocab(spark: org.apache.spark.sql.SparkSession,
                vocab: Seq[(String, Long)], dir: String): Unit = {
    import spark.implicits._
    val ids = pieceIds(vocab)
    vocab.map { case (p, q) => (ids(p), p, q) }
      .toDF("rank", "piece", "lp_q")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Reload a persisted inventory. The artifact is the MODEL (bounded:
    * one row per piece), so the driver-side collect is the intended
    * shape — same contract as every frozen-table closure capture.
    * Round-trip identity (save → load → segment == segment) is pinned
    * by UnigramSpec.
    */
  def loadVocab(spark: org.apache.spark.sql.SparkSession,
                dir: String): Vector[(String, Long)] = {
    import spark.implicits._
    spark.read.parquet(dir)
      .orderBy(col("rank"))
      .select(col("piece"), col("lp_q"))
      .as[(String, Long)].collect().toVector
  }

  // ------------------------------------------------------------ oracle

  /** The filtered word stream: (__id, __pos, __w) — space split,
    * regex-inert [a-z]+ only, length-capped to the unroll depth.
    */
  private def w0Sql(src: String, id: String, text: String): String =
    s"""w0 AS MATERIALIZED (SELECT $id AS __id, i - 1 AS __pos, t[i] AS __w
       |  FROM (SELECT $id, string_split($text, ' ') AS t FROM $src) d
       |  CROSS JOIN LATERAL unnest(generate_series(1, len(t))) AS u(i)
       |  WHERE regexp_full_match(t[i], '[a-z]+') AND len(t[i]) <= $MaxWordLen)""".stripMargin

  /** DuckDB spelling of [[seedVocab]] over `src(text)`: substring
    * explosion via two lateral generate_series (start × length),
    * exact BIGINT counts, the same (score DESC, piece ASC) top-K and
    * the same nudged-floor log-prob quantization. SUMs are CAST to
    * BIGINT at the emission boundary (the HUGEINT dtype lint).
    */
  def seedVocabSql(src: String, text: String): String =
    s"""(WITH ${w0Sql(src, "0", text)},
       |wf AS (SELECT __w AS w, CAST(COUNT(*) AS BIGINT) AS f
       |  FROM w0 GROUP BY 1),
       |sub AS (SELECT substr(w, s.i, l.j) AS piece, SUM(f) AS cnt
       |  FROM wf
       |  CROSS JOIN LATERAL unnest(generate_series(1, len(w))) AS s(i)
       |  CROSS JOIN LATERAL unnest(generate_series(1,
       |    LEAST($MaxPieceLen, len(w) - s.i + 1))) AS l(j)
       |  GROUP BY 1),
       |scored AS (SELECT piece, CAST(cnt AS BIGINT) AS cnt,
       |    CAST(cnt * len(piece) AS BIGINT) AS score FROM sub),
       |chars AS (SELECT piece, cnt, score FROM scored WHERE len(piece) = 1),
       |multi AS (SELECT piece, cnt, score FROM (
       |    SELECT piece, cnt, score,
       |      ROW_NUMBER() OVER (ORDER BY score DESC, piece) AS rn
       |    FROM scored WHERE len(piece) >= 2) z
       |  WHERE rn <= $TopMulti),
       |sel AS (SELECT * FROM chars UNION ALL SELECT * FROM multi),
       |tot AS (SELECT CAST(SUM(score) AS BIGINT) AS t FROM sel)
       |SELECT piece, cnt, score,
       |  CAST(floor(ln(CAST(score AS DOUBLE) / CAST(t AS DOUBLE)) * 1e6 + 1e-4)
       |    AS BIGINT) AS lp_q
       |FROM sel, tot)""".stripMargin

  private def vocabValuesSql(vocab: Seq[(String, Long)]): String = {
    require(vocab.forall { case (p, _) =>
      p.nonEmpty && p.forall(c => c >= 'a' && c <= 'z') },
      "oracle replay requires regex-inert [a-z]+ pieces")
    vocab.map { case (p, q) => s"('$p', $q)" }.mkString(", ")
  }

  /** The unrolled Viterbi DP over the distinct-word frame: one
    * MATERIALIZED stage per character position k (the
    * [[Bpe.learnSql]] one-stage-per-step discipline — a planner that
    * inlined them would re-evaluate the chain exponentially), each
    * stage ranking candidate extensions by (score DESC, seg ASC) via
    * ROW_NUMBER and keeping row 1 — the engine DP's exact tie-break.
    * Yields `fin(w, seg, n)` holding every segmentable word's
    * max-likelihood segmentation.
    */
  private def dpStagesSql(vocab: Seq[(String, Long)]): String =
    s"""v(piece, lp) AS (SELECT piece, CAST(lp AS BIGINT) AS lp
       |  FROM (VALUES ${vocabValuesSql(vocab)}) x(piece, lp)),
       |${dpStagesFrom("v")}""".stripMargin

  /** The unrolled stages against ANY (piece, lp) relation — `vocabCte`
    * may be the frozen VALUES table or a DATA-DEPENDENT inventory
    * computed upstream (the tk29 EM round): the stages only ever JOIN
    * it, so the unroll works unchanged.
    */
  private def dpStagesFrom(vocabCte: String, pfx: String = ""): String = {
    val sb = new StringBuilder
    sb ++= s"""${pfx}words AS MATERIALIZED (SELECT DISTINCT __w AS w FROM ${pfx}w0),
       |${pfx}d0 AS MATERIALIZED (SELECT w, CAST(0 AS BIGINT) AS sc, '' AS seg
       |  FROM ${pfx}words)""".stripMargin
    for (k <- 1 to MaxWordLen) {
      val branches = (1 to math.min(MaxPieceLen, k)).map { j =>
        s"""SELECT w, sc, seg, substr(w, ${k - j + 1}, $j) AS piece
           |        FROM ${pfx}d${k - j} WHERE len(w) >= $k""".stripMargin
      }.mkString("\n        UNION ALL\n        ")
      sb ++= s""",
       |${pfx}d$k AS MATERIALIZED (SELECT w, sc, seg FROM (
       |    SELECT w, sc, seg,
       |      ROW_NUMBER() OVER (PARTITION BY w ORDER BY sc DESC, seg) AS rn
       |    FROM (
       |      SELECT p.w, p.sc + v.lp AS sc,
       |        CASE WHEN p.seg = '' THEN v.piece
       |             ELSE p.seg || ' ' || v.piece END AS seg
       |      FROM (
       |        $branches
       |      ) p JOIN $vocabCte v ON v.piece = p.piece
       |    ) c) r
       |  WHERE rn = 1)""".stripMargin
    }
    sb ++= s""",
       |${pfx}fin AS MATERIALIZED (SELECT w, seg,
       |    CAST(len(string_split(seg, ' ')) AS BIGINT) AS n
       |  FROM (
       |    ${(1 to MaxWordLen).map(k =>
             s"SELECT w, seg FROM ${pfx}d$k WHERE len(w) = $k")
             .mkString("\n    UNION ALL\n    ")}
       |  ) z)""".stripMargin
    sb.result()
  }

  /** DuckDB spelling of [[viterbiSegment]] over `src(id, text)` under
    * a frozen inventory (emitted as a VALUES list — no SQL-side
    * re-derivation to drift).
    */
  def viterbiSql(src: String, id: String, text: String,
                 vocab: Seq[(String, Long)]): String =
    s"""(WITH ${w0Sql(src, id, text)},
       |${dpStagesSql(vocab)}
       |SELECT w0.__id AS $id,
       |  CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(f.n) AS BIGINT) AS n_pieces,
       |  string_agg(f.seg, ' ' ORDER BY w0.__pos) AS piece_text
       |FROM w0 JOIN fin f ON w0.__w = f.w
       |GROUP BY w0.__id)""".stripMargin

  /** DuckDB spelling of [[emRound]]: the prune replay → char-smoothed
    * usage scores → nudged-floor log-probs, yielding a DATA-DEPENDENT
    * (piece, lp) inventory the second DP unroll joins instead of a
    * frozen VALUES table.
    */
  def emVocabSql(src: String, text: String,
                 vocab: Seq[(String, Long)], keepMulti: Int): String =
    // every stage MATERIALIZED: `sc` is referenced twice (tot + the
    // final select) and `pr` wraps the whole prune DP replay — DuckDB
    // inlines un-materialized CTEs at every reference (the m15 /
    // learnSql re-evaluation trap)
    s"""(WITH pr AS MATERIALIZED (SELECT piece, usage
       |  FROM ${pruneSql(src, text, vocab, keepMulti)} p),
       |sc AS MATERIALIZED (SELECT piece,
       |    CAST(CASE WHEN len(piece) = 1 THEN usage + 1 ELSE usage END
       |      AS BIGINT) AS s
       |  FROM pr),
       |tot AS MATERIALIZED (SELECT CAST(SUM(s) AS BIGINT) AS t FROM sc)
       |SELECT piece,
       |  CAST(floor(ln(CAST(s AS DOUBLE) / CAST(t AS DOUBLE)) * 1e6 + 1e-4)
       |    AS BIGINT) AS lp
       |FROM sc, tot)""".stripMargin

  /** [[pruneSql]] against a DATA-DEPENDENT (piece, lp) CTE defined
    * upstream (the tk30 second EM round: the inventory to prune is
    * itself the previous round's output, not a frozen VALUES table).
    * Every internal stage takes `pfx` — each nesting level of a
    * chained-EM oracle needs its own namespace (the r14
    * Duplicate-alias trap), and the vocab reference in chars/multi
    * joins `vocabCte` where the frozen spelling joins `v`.
    */
  def pruneFromVocabCteSql(src: String, text: String, vocabCte: String,
                           keepMulti: Int, pfx: String): String =
    s"""(WITH $pfx${w0Sql(src, "0", text)},
       |${dpStagesFrom(vocabCte, pfx)},
       |${pfx}wf AS (SELECT __w AS w, CAST(COUNT(*) AS BIGINT) AS f
       |  FROM ${pfx}w0 GROUP BY 1),
       |${pfx}occ AS (SELECT f.w, u.p AS piece
       |  FROM ${pfx}fin f CROSS JOIN LATERAL unnest(string_split(f.seg, ' ')) AS u(p)),
       |${pfx}usage AS (SELECT o.piece, CAST(SUM(w.f) AS BIGINT) AS usage
       |  FROM ${pfx}occ o JOIN ${pfx}wf w ON o.w = w.w GROUP BY 1),
       |${pfx}chars AS (SELECT vv.piece, COALESCE(u.usage, CAST(0 AS BIGINT)) AS usage
       |  FROM $vocabCte vv LEFT JOIN ${pfx}usage u ON vv.piece = u.piece
       |  WHERE len(vv.piece) = 1),
       |${pfx}multi AS (SELECT piece, usage FROM (
       |    SELECT vv.piece, u.usage,
       |      ROW_NUMBER() OVER (ORDER BY u.usage DESC, vv.piece) AS rn
       |    FROM $vocabCte vv JOIN ${pfx}usage u ON vv.piece = u.piece
       |    WHERE len(vv.piece) >= 2) z
       |  WHERE rn <= $keepMulti)
       |SELECT piece, usage FROM (
       |  SELECT * FROM ${pfx}chars UNION ALL SELECT * FROM ${pfx}multi) s)""".stripMargin

  /** [[emVocabSql]] against a data-dependent upstream inventory — the
    * second (and any later) round of a chained EM oracle: prune replay
    * under `vocabCte`, char-smoothed usage scores, nudged-floor
    * log-probs. Yields another (piece, lp) relation, so rounds compose
    * by alternating prefixes.
    */
  def emVocabFromCteSql(src: String, text: String, vocabCte: String,
                        keepMulti: Int, pfx: String): String =
    s"""(WITH ${pfx}pr AS MATERIALIZED (SELECT piece, usage
       |  FROM ${pruneFromVocabCteSql(src, text, vocabCte, keepMulti, pfx)} p),
       |${pfx}sc AS MATERIALIZED (SELECT piece,
       |    CAST(CASE WHEN len(piece) = 1 THEN usage + 1 ELSE usage END
       |      AS BIGINT) AS s
       |  FROM ${pfx}pr),
       |${pfx}tot AS MATERIALIZED (SELECT CAST(SUM(s) AS BIGINT) AS t FROM ${pfx}sc)
       |SELECT piece,
       |  CAST(floor(ln(CAST(s AS DOUBLE) / CAST(t AS DOUBLE)) * 1e6 + 1e-4)
       |    AS BIGINT) AS lp
       |FROM ${pfx}sc, ${pfx}tot)""".stripMargin

  /** [[viterbiSql]] against a (piece, lp) CTE defined UPSTREAM of this
    * subquery (tk29: the EM round's data-dependent inventory).
    */
  def viterbiFromVocabCteSql(src: String, id: String, text: String,
                             vocabCte: String): String =
    // e-prefixed stage names: the data-dependent inventory CTE's own
    // nested replay already binds the unprefixed ones, and DuckDB's
    // binder rejects the shadowing as "Duplicate alias"
    s"""(WITH e${w0Sql(src, id, text)},
       |${dpStagesFrom(vocabCte, pfx = "e")}
       |SELECT ew0.__id AS $id,
       |  CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(f.n) AS BIGINT) AS n_pieces,
       |  string_agg(f.seg, ' ' ORDER BY ew0.__pos) AS piece_text
       |FROM ew0 JOIN efin f ON ew0.__w = f.w
       |GROUP BY ew0.__id)""".stripMargin

  /** DuckDB spelling of [[pruneByUsage]]: the DP replay feeding a
    * frequency-weighted usage census, then the same chars ∪ top-K
    * selection.
    */
  def pruneSql(src: String, text: String,
               vocab: Seq[(String, Long)], keepMulti: Int): String =
    s"""(WITH ${w0Sql(src, "0", text)},
       |${dpStagesSql(vocab)},
       |wf AS (SELECT __w AS w, CAST(COUNT(*) AS BIGINT) AS f
       |  FROM w0 GROUP BY 1),
       |occ AS (SELECT f.w, u.p AS piece
       |  FROM fin f CROSS JOIN LATERAL unnest(string_split(f.seg, ' ')) AS u(p)),
       |usage AS (SELECT occ.piece, CAST(SUM(wf.f) AS BIGINT) AS usage
       |  FROM occ JOIN wf ON occ.w = wf.w GROUP BY 1),
       |chars AS (SELECT v.piece, COALESCE(u.usage, CAST(0 AS BIGINT)) AS usage
       |  FROM v LEFT JOIN usage u ON v.piece = u.piece
       |  WHERE len(v.piece) = 1),
       |multi AS (SELECT piece, usage FROM (
       |    SELECT v.piece, u.usage,
       |      ROW_NUMBER() OVER (ORDER BY u.usage DESC, v.piece) AS rn
       |    FROM v JOIN usage u ON v.piece = u.piece
       |    WHERE len(v.piece) >= 2) z
       |  WHERE rn <= $keepMulti)
       |SELECT piece, usage FROM (
       |  SELECT * FROM chars UNION ALL SELECT * FROM multi) s)""".stripMargin

  /** DuckDB spelling of [[segmentToIds]]: the DP replay joined against
    * the SAME id table ([[pieceIds]] emitted as VALUES), ids in
    * (word position, piece position) order.
    */
  def idsSql(src: String, id: String, text: String,
             vocab: Seq[(String, Long)]): String = {
    val idVals = pieceIds(vocab).toSeq.sortBy(_._2)
      .map { case (p, i) => s"('$p', $i)" }.mkString(", ")
    s"""(WITH ${w0Sql(src, id, text)},
       |${dpStagesSql(vocab)},
       |idv(piece, pid) AS (SELECT * FROM (VALUES $idVals) x(piece, pid)),
       |occ AS (SELECT w0.__id, w0.__pos, g.i,
       |    string_split(f.seg, ' ')[g.i] AS piece
       |  FROM w0 JOIN fin f ON w0.__w = f.w
       |  CROSS JOIN LATERAL unnest(generate_series(1,
       |    len(string_split(f.seg, ' ')))) AS g(i))
       |SELECT occ.__id AS $id,
       |  CAST(COUNT(*) AS BIGINT) AS n_pieces,
       |  string_agg(CAST(idv.pid AS VARCHAR), ',' ORDER BY occ.__pos, occ.i)
       |    AS piece_ids
       |FROM occ JOIN idv ON occ.piece = idv.piece
       |GROUP BY occ.__id)""".stripMargin
  }

  /** DuckDB spelling of [[segmentToIdsByteFallback]]: the [[idsSql]]
    * replay plus a fallback branch — words the DP cannot reach (no
    * `fin` row) explode per character with id `vocab.size +
    * ascii(char)` (gate words are ASCII, so ascii == the UTF-8 byte
    * the engine emits). The union re-sorts by (word position, piece
    * position), so fallback ids interleave exactly as the engine's
    * doc-ordered flatten.
    */
  def idsByteFallbackSql(src: String, id: String, text: String,
                         vocab: Seq[(String, Long)]): String = {
    val idVals = pieceIds(vocab).toSeq.sortBy(_._2)
      .map { case (p, i) => s"('$p', $i)" }.mkString(", ")
    val base = vocab.size
    s"""(WITH ${w0Sql(src, id, text)},
       |${dpStagesSql(vocab)},
       |idv(piece, pid) AS (SELECT * FROM (VALUES $idVals) x(piece, pid)),
       |occ AS (SELECT w0.__id, w0.__pos, g.i,
       |    string_split(f.seg, ' ')[g.i] AS piece
       |  FROM w0 JOIN fin f ON w0.__w = f.w
       |  CROSS JOIN LATERAL unnest(generate_series(1,
       |    len(string_split(f.seg, ' ')))) AS g(i)),
       |occb AS (SELECT w0.__id, w0.__pos, g.i,
       |    $base + ascii(substr(w0.__w, g.i, 1)) AS pid
       |  FROM w0 LEFT JOIN fin f ON w0.__w = f.w
       |  CROSS JOIN LATERAL unnest(generate_series(1, len(w0.__w))) AS g(i)
       |  WHERE f.w IS NULL),
       |uni AS (SELECT occ.__id, occ.__pos, occ.i, idv.pid
       |    FROM occ JOIN idv ON occ.piece = idv.piece
       |  UNION ALL SELECT __id, __pos, i, pid FROM occb)
       |SELECT uni.__id AS $id,
       |  CAST(COUNT(*) AS BIGINT) AS n_pieces,
       |  string_agg(CAST(uni.pid AS VARCHAR), ',' ORDER BY uni.__pos, uni.i)
       |    AS piece_ids
       |FROM uni
       |GROUP BY uni.__id)""".stripMargin
  }

  /** DuckDB spelling of [[docLogLik]]: the DP replay's piece
    * occurrences joined back to the inventory's lp_q — exact int64
    * sums, one closing IEEE division.
    */
  def docLogLikSql(src: String, id: String, text: String,
                   vocab: Seq[(String, Long)]): String =
    s"""(WITH ${w0Sql(src, id, text)},
       |${dpStagesSql(vocab)},
       |occ AS (SELECT w0.__id, u.p AS piece
       |  FROM w0 JOIN fin f ON w0.__w = f.w
       |  CROSS JOIN LATERAL unnest(string_split(f.seg, ' ')) AS u(p))
       |SELECT occ.__id AS $id,
       |  CAST(COUNT(*) AS BIGINT) AS n_pieces,
       |  CAST(SUM(v.lp) AS BIGINT) AS ll_q,
       |  CAST(SUM(v.lp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_lp
       |FROM occ JOIN v ON occ.piece = v.piece
       |GROUP BY occ.__id)""".stripMargin

  /** DuckDB spelling of [[softUsageCensusQuantized]] — the tk29 DP
    * unroll turned from Viterbi max into forward–backward SUMS: one
    * MATERIALIZED alpha stage per character position (alpha_k = the
    * j-ascending left-assoc sum of alpha_{k−j}·p over quantized piece
    * probabilities; absent pieces COALESCE to +0.0, an IEEE identity
    * on these non-negative masses), one beta stage per position from
    * the top down, then every (i, j) occurrence's posterior
    * `alpha_i·p·beta_{i+j} / alpha_n` — the engine's exact expression
    * tree — folded per (word, piece) with `list_reduce(list(post
    * ORDER BY i, j))` to replay the engine's accumulation order, and
    * quantized per word (floor(E·1e9 + 1e-4)) before the exact
    * integer corpus sum. Words with alpha_n = 0 drop (no covering
    * path), matching the engine's None.
    */
  def softCensusSql(src: String, text: String,
                    vocab: Seq[(String, Long)]): String = {
    val sb = new StringBuilder
    sb ++= s"""(WITH sx${w0Sql(src, "0", text)},
       |sxwf AS MATERIALIZED (SELECT __w AS w, CAST(COUNT(*) AS BIGINT) AS f
       |  FROM sxw0 GROUP BY 1),
       |sxv(piece, lp) AS (SELECT piece, CAST(lp AS BIGINT) AS lp
       |  FROM (VALUES ${vocabValuesSql(vocab)}) x(piece, lp)),
       |sxp AS MATERIALIZED (SELECT piece,
       |  floor(exp(CAST(lp AS DOUBLE) / 1000000.0) * 1000000000.0 + 0.0001)
       |    / 1000000000.0 AS p
       |  FROM sxv),
       |sxa0 AS MATERIALIZED (SELECT w, CAST(1.0 AS DOUBLE) AS a FROM sxwf)""".stripMargin
    // alpha stages: one per character position, j-ascending sum
    for (k <- 1 to MaxWordLen) {
      val terms = (1 to math.min(MaxPieceLen, k)).map { j =>
        s"COALESCE(a$j.a * p$j.p, 0.0)"
      }.mkString("\n       |    + ")
      val joins = (1 to math.min(MaxPieceLen, k)).map { j =>
        s"""JOIN sxa${k - j} a$j ON a$j.w = w.w
           |  LEFT JOIN sxp p$j ON p$j.piece = substr(w.w, ${k - j + 1}, $j)""".stripMargin
      }.mkString("\n       |  ")
      sb ++= s""",
       |sxa$k AS MATERIALIZED (SELECT w.w,
       |    $terms AS a
       |  FROM sxwf w
       |  $joins
       |  WHERE len(w.w) >= $k)""".stripMargin
    }
    // beta stages, top down: beta_n = 1; beta_k = Σ_j p·beta_{k+j}
    for (k <- MaxWordLen to 0 by -1) {
      val js = (1 to math.min(MaxPieceLen, MaxWordLen - k))
      val terms =
        if (js.isEmpty) "0.0"
        else js.map(j => s"COALESCE(p$j.p * b$j.b, 0.0)")
          .mkString("\n       |    + ")
      val joins = js.map { j =>
        s"""LEFT JOIN sxbt${k + j} b$j ON b$j.w = w.w
           |  LEFT JOIN sxp p$j ON p$j.piece = substr(w.w, ${k + 1}, $j)""".stripMargin
      }.mkString("\n       |  ")
      sb ++= s""",
       |sxbt$k AS MATERIALIZED (SELECT w.w,
       |    CASE WHEN len(w.w) = $k THEN 1.0 ELSE
       |    $terms END AS b
       |  FROM sxwf w
       |  $joins
       |  WHERE len(w.w) >= $k)""".stripMargin
    }
    // alpha at the word's own length
    sb ++= (1 to MaxWordLen)
      .map(k => s"SELECT w, a FROM sxa$k WHERE len(w) = $k")
      .mkString(",\n       |sxan AS MATERIALIZED (\n       |  ",
        "\n       |  UNION ALL ", ")")
      .stripMargin
    // every (i, j) occurrence with its posterior, engine expression tree
    val occ = (for {
      i <- 0 until MaxWordLen
      j <- 1 to math.min(MaxPieceLen, MaxWordLen - i)
    } yield
      s"""SELECT w.w, $i AS i, $j AS j, p.piece,
         |    (a.a * p.p * b.b) / an.a AS post
         |  FROM sxwf w
         |  JOIN sxa$i a ON a.w = w.w
         |  JOIN sxbt${i + j} b ON b.w = w.w
         |  JOIN sxan an ON an.w = w.w
         |  JOIN sxp p ON p.piece = substr(w.w, ${i + 1}, $j)
         |  WHERE len(w.w) >= ${i + j} AND an.a > 0""".stripMargin)
      .mkString("SELECT * FROM (\n       |  ", "\n       |  UNION ALL ",
        "\n       |) zz")
    sb ++= s""",
       |sxocc AS MATERIALIZED (
       |  $occ),
       |sxe AS MATERIALIZED (SELECT w, piece,
       |    list_reduce(list(post ORDER BY i, j), (x, y) -> x + y) AS e
       |  FROM sxocc GROUP BY w, piece),
       |sxeq AS (SELECT w, piece,
       |    CAST(floor(e * 1000000000.0 + 0.0001) AS BIGINT) AS eq
       |  FROM sxe),
       |sxus AS (SELECT q.piece, CAST(SUM(q.eq * f.f) AS BIGINT) AS usage_q
       |  FROM sxeq q JOIN sxwf f ON f.w = q.w GROUP BY q.piece)
       |SELECT v.piece, COALESCE(u.usage_q, CAST(0 AS BIGINT)) AS usage_q
       |FROM sxv v LEFT JOIN sxus u ON u.piece = v.piece)""".stripMargin
    sb.result()
  }

  /** The frozen piece inventory the tk23/tk24/tk25/e34 gates run
    * under: [[seedVocab]] over `documents` at sf0.01 (NO plants — the
    * plants exercise segmentation, not seeding), frozen as a literal
    * (the [[Bpe.FrozenMerges]] discipline) so the gates are pure
    * deterministic replays at EVERY sf. 24 single chars (x and z do
    * not occur in the fixture corpus — their absence is what the
    * zigzag no-path plant exercises) + 24 multi-char pieces.
    * UnigramSpec re-derives this from the live seeder and fails
    * loudly if the fixture or seeder drifts.
    */
  val FrozenVocab: Vector[(String, Long)] = Vector(
    ("a", -2985395L), ("b", -4522053L), ("batch", -3978686L),
    ("c", -3985540L), ("colum", -3981893L), ("column", -3799572L),
    ("custo", -3981893L), ("custom", -3799572L), ("d", -4518018L),
    ("e", -3060306L), ("er", -3310829L), ("f", -4942514L),
    ("filte", -3982964L), ("filter", -3800643L), ("g", -4024769L),
    ("h", -4222588L), ("i", -4003758L), ("ilter", -3982964L),
    ("in", -3814674L), ("j", -5559716L), ("k", -4948689L),
    ("l", -3527536L), ("m", -3996561L), ("mer", -3808174L),
    ("n", -3990495L), ("o", -3308970L), ("olumn", -3981893L),
    ("or", -3838136L), ("ow", -3819396L), ("p", -4543974L),
    ("par", -3860263L), ("q", -5661165L), ("r", -3060817L),
    ("s", -3424176L), ("st", -3845582L), ("stome", -3981893L),
    ("stomer", -3799572L), ("stream", -3850076L), ("t", -3234160L),
    ("tomer", -3981893L), ("u", -4010125L), ("ustom", -3981893L),
    ("ustome", -3799572L), ("v", -4930278L), ("vector", -3823408L),
    ("w", -4232993L), ("window", -3852331L), ("y", -4953769L))
}

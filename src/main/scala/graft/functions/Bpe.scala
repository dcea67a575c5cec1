package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer — the LLM-pipeline primitive that
  * every token-denominated operator (chunking, token budgets, mixture
  * weights) is really denominated in: LLM context windows count BPE
  * tokens, not whitespace splits.
  *
  * Semantics (the graft BPE contract, identical on engine and oracle):
  * a word is split to characters, then repeatedly the adjacent symbol
  * pair with the LOWEST merge rank present anywhere in the word is
  * merged at its LEFTMOST occurrence, until no adjacent pair is in the
  * merge table. One-occurrence-at-a-time with re-evaluation is
  * equivalent to the classic all-occurrences-per-pass scan (merging at
  * position i can never create an occurrence of the same pair earlier
  * than i: that would need y = x·y or x = ε), and it is exactly
  * restatable in SQL — the DuckDB oracle replays it with a recursive
  * CTE over the DISTINCT words (one leftmost `regexp_replace` per
  * step; see [[tokenizeSql]]), so the tk1/tk2 gates are oracle-exact,
  * not flag-style.
  *
  * Scale shape: tokenization is a pure function of the WORD, so the
  * per-word merge loop runs once per DISTINCT word (the vocabulary —
  * orders of magnitude smaller than the corpus) as a compiled typed
  * map, and the corpus only pays a broadcast hash join (word →
  * tokenization) plus one doc-keyed reassembly agg. Training iterates
  * over the same (word, freq) table: one partial-combining pair count
  * and a 1-row argmax collect per merge — the corpus is read once, and
  * no plan lineage accumulates across iterations because each
  * iteration re-derives symbolizations from the persisted vocab with
  * the merges applied as a pure broadcast-closure function.
  */
object Bpe {

  /** Canonical greedy merge application for one word: repeatedly merge
    * the leftmost occurrence of the lowest-rank adjacent pair. Pure —
    * safe in closures; `ranks` is small (the merge table). The initial
    * split is by Unicode CODE POINT, not UTF-16 code unit — the DuckDB
    * oracle's RE2 `(.)` matches a code point, so splitting surrogate
    * pairs here would silently diverge engine-vs-oracle the moment a
    * corpus carries a non-BMP character (emoji, CJK extensions).
    */
  def applyWord(word: String, ranks: Map[(String, String), Int]): Vector[String] =
    applySyms(codePointSyms(word), ranks)

  /** Unicode-code-point initial split (the char-level symbolization). */
  private[graft] def codePointSyms(word: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      b += word.substring(i, i + n)
      i += n
    }
    b.result()
  }

  /** UTF-8 byte initial split, each byte a lowercase 2-hex-char symbol
    * ("c3a9" for é) — the byte-level symbolization. Hex symbols are
    * regex-inert ([0-9a-f]), so the same recursive-CTE oracle replay
    * machinery carries over unchanged, and `lower(hex(encode(w)))` on
    * the DuckDB side produces the identical initial sequence (UTF-8 is
    * THE cross-engine byte encoding: Spark strings encode to it, DuckDB
    * VARCHARs are it).
    */
  private[graft] def byteSyms(word: String): Vector[String] = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < bytes.length) {
      b += f"${bytes(i) & 0xff}%02x"
      i += 1
    }
    b.result()
  }

  /** The greedy merge loop over an already-symbolized word — shared by
    * the char-level and byte-level paths so the merge semantics (lowest
    * rank anywhere, leftmost occurrence, re-evaluate) cannot diverge.
    */
  def applySyms(syms0: Vector[String],
                ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = syms0
    var more = syms.length > 1
    while (more) {
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bi = i } // strict < keeps the LEFTMOST min
        i += 1
      }
      if (bi < 0) more = false
      else syms = (syms.take(bi) :+ (syms(bi) + syms(bi + 1))) ++ syms.drop(bi + 2)
    }
    syms
  }

  private def ranksOf(merges: Seq[(String, String)]): Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  // ------------------------------------------------ category pre-tokenization

  /** The graft category pre-tokenization pattern — GPT-2's published
    * splitter (contraction suffixes / space-prefixed letter runs /
    * digit runs / punctuation runs / whitespace) restated WITHOUT the
    * trailing negative lookahead `\s+(?!\S)`, which RE2 (the DuckDB
    * oracle's engine) cannot express: whitespace runs therefore stay
    * whole instead of donating their last space to the following word.
    * Still a lossless partition of any string (every char falls in
    * some alternative), and merges can never cross a category
    * boundary — the property the pre-split exists for. `\p{N}` (not
    * `[0-9]`) so ٤٢/² classify as digits on both engines; `\s` is
    * RE2's [\t\n\f\r ] (NOT java's \x0B — the hand lexer below pins
    * the set so \v lands in the punctuation class on both sides).
    */
  private[graft] val PretokPattern: String =
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"""

  private val PretokContractions =
    Array("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")

  /** Hand-rolled lexer equivalent of [[PretokPattern]] under RE2's
    * leftmost-first alternation (verified against DuckDB
    * `regexp_extract_all` on contractions, leading/doubled/trailing
    * spaces, tabs/newlines, mixed scripts, ²). A compiled per-word
    * loop instead of a per-row java.util.regex scan, immune to
    * ALTERNATION-semantics drift between regex engines — but NOT to
    * Unicode-TABLE skew: letter/digit classification comes from the
    * JDK's `Character` tables here and from RE2's `\p{L}`/`\p{N}`
    * tables on the oracle side, so a code point assigned in one
    * Unicode version and not the other (a newly-added script) would
    * partition differently. The gates pin equality on the fixture
    * corpora + plants (which deliberately cover the interesting
    * classes: \p{N}-not-[0-9], non-BMP, Symbol-class №); that residual
    * class is the documented contract boundary, same as every other
    * cross-engine surface. Concatenating the result reproduces `text`
    * byte-for-byte for ANY input.
    */
  private[graft] def pretokenize(text: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val n = text.length
    def isWsCp(cp: Int): Boolean = // RE2 \s: [\t\n\f\r ]
      cp == ' ' || cp == '\t' || cp == '\n' || cp == '\f' || cp == '\r'
    def isL(cp: Int): Boolean = Character.isLetter(cp)
    def isN(cp: Int): Boolean = {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
        t == Character.OTHER_NUMBER
    }
    def isOther(cp: Int): Boolean = !isL(cp) && !isN(cp) && !isWsCp(cp)
    def runFrom(start: Int, pred: Int => Boolean): Int = {
      var i = start
      while (i < n && pred(text.codePointAt(i))) i += Character.charCount(text.codePointAt(i))
      i
    }
    var p = 0
    while (p < n) {
      val contr = PretokContractions.find(s => text.startsWith(s, p))
      if (contr.isDefined) { out += contr.get; p += contr.get.length }
      else {
        val q = if (text.charAt(p) == ' ' && p + 1 < n) p + 1 else p
        val cp = if (q < n) text.codePointAt(q) else -1
        val e =
          if (q < n && isL(cp)) runFrom(q, isL)
          else if (q < n && isN(cp)) runFrom(q, isN)
          else if (q < n && isOther(cp)) runFrom(q, isOther)
          else runFrom(p, isWsCp) // p is whitespace here, by elimination
        out += text.substring(p, e)
        p = e
      }
    }
    out.result()
  }

  /** Learn `nMerges` merges from the corpus: each round counts every
    * adjacent symbol pair over the (distinct word, frequency) table —
    * occurrence-weighted, so "aaa" contributes ("a","a") twice — and
    * freezes the most frequent pair, ties broken by lexicographically
    * smallest (x, y) so training is deterministic under any
    * partitioning (counts are exact longs). Stops early when no
    * adjacent pair remains.
    *
    * Scale: the vocab table is persisted once; each round is one
    * compiled flatMap + partial-combining sum + a 1-row argmax collect
    * (bounded — the only driver-side value is the winning pair).
    */
  def train(df: DataFrame, textCol: String, nMerges: Int): Vector[(String, String)] =
    trainWith(df, textCol, nMerges, codePointSyms)

  /** Byte-level training — same greedy argmax loop over UTF-8 hex-byte
    * symbolizations. The base vocabulary is all 256 byte symbols, so
    * there is no token filter: EVERY word participates (the char-level
    * trainer's [a-z]+ gate filter exists only for oracle regex
    * inertness, which hex symbols have by construction).
    */
  def trainBytes(df: DataFrame, textCol: String, nMerges: Int): Vector[(String, String)] =
    trainWith(df, textCol, nMerges, byteSyms)

  /** Byte-level training over CATEGORY-pre-tokenized words (tk19): the
    * vocabulary is [[pretokenize]]'s tokens — leading spaces included
    * (the Ġ convention as a literal space byte) — so learned merges
    * never cross a category boundary and space-prefixed word forms get
    * their own merge paths, the GPT-2-class training contract.
    */
  def trainBytesPretok(df: DataFrame, textCol: String,
                       nMerges: Int): Vector[(String, String)] =
    trainOnWords(pretokWordsOf(df, textCol), nMerges, byteSyms)

  private def pretokWordsOf(df: DataFrame, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(textCol)).filter(col(textCol).isNotNull)
      .as[String].flatMap(pretokenize).toDF("__w")
  }

  private def trainWith(df: DataFrame, textCol: String, nMerges: Int,
                        symbolize: String => Vector[String]): Vector[(String, String)] =
    trainOnWords(
      df.select(explode(split(col(textCol), " ", -1)).as("__w"))
        .filter(col("__w") =!= ""),
      nMerges, symbolize)

  private def trainOnWords(words: DataFrame, nMerges: Int,
                           symbolize: String => Vector[String]): Vector[(String, String)] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = words.sparkSession
    import spark.implicits._
    val vocab: Dataset[(String, Long)] = words
      .groupBy(col("__w")).agg(count(lit(1)).as("f"))
      .as[(String, Long)].persist()
    try {
      val merges = Vector.newBuilder[(String, String)]
      var current = Vector.empty[(String, String)]
      var rounds = 0
      var exhausted = false
      while (rounds < nMerges && !exhausted) {
        val ranks = ranksOf(current) // tiny closure capture, ≤ nMerges
        val best = vocab
          .flatMap { case (w, f) =>
            val syms = applySyms(symbolize(w), ranks)
            (0 until syms.length - 1).iterator
              .map(i => (syms(i), syms(i + 1), f))
          }
          .toDF("x", "y", "f")
          .groupBy($"x", $"y").agg(sum($"f").as("cnt"))
          .orderBy($"cnt".desc, $"x", $"y")
          .limit(1)
          .as[(String, String, Long)]
          .collect()
        if (best.isEmpty) exhausted = true
        else {
          val (x, y, _) = best.head
          merges += ((x, y))
          current = current :+ ((x, y))
          rounds += 1
        }
      }
      merges.result()
    } finally vocab.unpersist()
  }

  /** Incremental-pair-count training — [[train]]'s production-scale
    * spelling (the r13 verdict's top item): instead of re-symbolizing
    * every distinct word and re-applying ALL accumulated merges each
    * round (O(rounds·vocab·wordlen²) total re-derivation work, with
    * every round's pair-count shuffle carrying the FULL vocabulary's
    * adjacency stream), maintain two checkpointed frames across
    * rounds:
    *
    *  - `state` — one (syms, freq) row per distinct word, advanced in
    *    place each round;
    *  - `counts` — the adjacent-pair census, folded by DELTAS: only
    *    words that actually contain the just-frozen pair contribute
    *    (−old adjacencies, +new adjacencies), so the per-round shuffle
    *    volume is O(affected words), not O(vocab) — at a 32k-merge
    *    production vocab the late rounds touch a vanishing fraction of
    *    the vocabulary (ScaleProbe's bpe_train arm measures the curve).
    *
    * Exactness contract: byte-for-byte the same merge sequence as
    * [[train]]/[[trainBytes]] (argmax over exact-long counts, count
    * desc / lexicographic tie-break). The state advance applies the
    * FULL rank table to affected words, not just the new pair: greedy
    * lowest-rank-first application factors through the previous
    * fixpoint (while any pair of rank < k is present the chosen merge
    * is identical under both tables, and pair k only fires when no
    * lower rank is present), so applySyms(applySyms(w, R₍ₖ₋₁₎), Rₖ) ==
    * applySyms(w, Rₖ) — but merging pair k CAN create a fresh
    * occurrence of an EARLIER rank when two merge paths share a
    * surface string (the first-id-wins collision class), which a
    * merge-only-the-new-pair advance would miss. Unaffected words are
    * already Rₖ fixpoints (no pair < k present, pair k absent), so the
    * full-table re-application degenerates to one adjacency scan for
    * them. BpeSpec pins trainIncremental == train on the gate corpora
    * and on deep (≥256-merge) runs; the tk15 gate holds the 8-merge
    * prefix to the same unrolled SQL replay as tk14.
    *
    * Per-round cost is FLAT in the round number: one bounded argmax
    * collect (the winning pair), one map-only state advance
    * (checkpointed so lineage never accumulates), one delta fold into
    * the pair census. The O(rounds) job-scheduling latency of the
    * one-merge-per-round loop is lifted by
    * [[trainIncrementalBatched]], which accepts a provably
    * order-equivalent PREFIX of merges per census snapshot (r15) —
    * this sequential spelling remains the reference the batched gate
    * is held to.
    */
  def trainIncremental(df: DataFrame, textCol: String,
                       nMerges: Int): Vector[(String, String)] =
    trainIncrementalWith(df, textCol, nMerges, codePointSyms)

  /** Byte-level [[trainIncremental]] (see [[trainBytes]]). */
  def trainBytesIncremental(df: DataFrame, textCol: String,
                            nMerges: Int): Vector[(String, String)] =
    trainIncrementalWith(df, textCol, nMerges, byteSyms)

  /** The production trainer composed end-to-end: incremental pair
    * counts OVER the category-pre-tokenized vocabulary — the spelling
    * a real vocab build runs ([[trainBytesPretok]]'s semantics at
    * [[trainBytesIncremental]]'s cost). tk21 holds it to tk19's own
    * unrolled SQL replay.
    */
  def trainBytesPretokIncremental(df: DataFrame, textCol: String,
                                  nMerges: Int): Vector[(String, String)] =
    trainIncrementalOnWords(pretokWordsOf(df, textCol), nMerges, byteSyms)

  private def trainIncrementalWith(df: DataFrame, textCol: String,
                                   nMerges: Int,
                                   symbolize: String => Vector[String]): Vector[(String, String)] =
    trainIncrementalOnWords(
      df.select(explode(split(col(textCol), " ", -1)).as("__w"))
        .filter(col("__w") =!= ""),
      nMerges, symbolize)

  private def trainIncrementalOnWords(words: DataFrame, nMerges: Int,
                                      symbolize: String => Vector[String]): Vector[(String, String)] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = words.sparkSession
    import spark.implicits._
    def adjacent(syms: Seq[String]): Iterator[(String, String)] =
      if (syms.length < 2) Iterator.empty
      else (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1)))
    // the symbolized vocabulary — materialized ONCE; every later round
    // advances this frame instead of re-deriving it from the corpus
    var state: Dataset[(Seq[String], Long)] = words
      .groupBy(col("__w")).agg(count(lit(1)).as("f"))
      .as[(String, Long)]
      .map { case (w, f) => (symbolize(w): Seq[String], f) }
      .localCheckpoint()
    var counts: DataFrame = state
      .flatMap { case (syms, f) => adjacent(syms).map(p => (p._1, p._2, f)) }
      .toDF("x", "y", "cnt")
      .groupBy($"x", $"y").agg(sum($"cnt").as("cnt"))
      .localCheckpoint()
    val merges = Vector.newBuilder[(String, String)]
    var current = Vector.empty[(String, String)]
    var rounds = 0
    var exhausted = false
    while (rounds < nMerges && !exhausted) {
      val best = counts.orderBy($"cnt".desc, $"x", $"y").limit(1)
        .as[(String, String, Long)].collect()
      if (best.isEmpty) exhausted = true
      else {
        val (bx, by, _) = best.head
        merges += ((bx, by))
        current = current :+ ((bx, by))
        val ranks = ranksOf(current) // tiny closure capture, ≤ nMerges
        // unaffected rows (the overwhelming majority in late rounds)
        // store an EMPTY old-syms slot: the old sequence is consumed
        // only by the affected rows' delta fold, so writing it for
        // every word would double the dominant per-round checkpoint
        // volume (r14 review)
        val advanced = state
          .map { case (syms, f) =>
            if (adjacent(syms).contains((bx, by)))
              (syms, applySyms(syms.toVector, ranks): Seq[String], f, true)
            else (Seq.empty[String], syms, f, false)
          }
          .localCheckpoint() // truncate per-round lineage (eager)
        val deltas = advanced.filter(_._4)
          .flatMap { case (old, nw, f, _) =>
            adjacent(old).map(p => (p._1, p._2, -f)) ++
              adjacent(nw).map(p => (p._1, p._2, f))
          }
          .toDF("x", "y", "cnt")
        counts = counts.unionByName(deltas)
          .groupBy($"x", $"y").agg(sum($"cnt").as("cnt"))
          .filter($"cnt" > 0)
          .localCheckpoint()
        state = advanced.map { case (_, nw, f, _) => (nw, f) }
        rounds += 1
      }
    }
    merges.result()
  }

  /** Batched merge selection — [[trainIncremental]]'s job-LATENCY fix
    * (the r14 verdict's #3): greedy BPE pays one sequential Spark job
    * per merge because each pick depends on the census after the last;
    * a 32k-merge production vocab is ~32k sequential jobs even though
    * each is cheap. This trainer selects UP TO `batchCap` merges from
    * ONE census snapshot per round and folds their deltas together —
    * byte-for-byte the same merge sequence as [[train]] (BpeSpec pins
    * char/byte/deep parity), because the batch is only ever a prefix
    * of the rank order that is PROVABLY order-equivalent to sequential
    * picks:
    *
    *  - the batch is the maximal safe PREFIX of the (cnt DESC, x, y)
    *    sorted census — never skip-and-continue: a skipped row would
    *    still outrank later picks sequentially unless its count
    *    actually fell, which a snapshot cannot know;
    *  - picks are pairwise SYMBOL-DISJOINT, so no pick's count moves
    *    before its turn (an occurrence of (u,v) is consumed only by a
    *    merge whose pair shares u or v);
    *  - every pick's created string x+y must be FRESH — not equal to
    *    any symbol the vocabulary can contain (initial symbols are
    *    single units, every multi-unit symbol is the concatenation of
    *    some accepted merge, so the driver-side created-strings set is
    *    the complete inventory) and distinct within the batch: fresh
    *    creations mean additions only ever land on NEW pairs
    *    containing the fresh symbol, never on existing census rows
    *    (the first-id-wins collision class that breaks naive
    *    batching);
    *  - each created occurrence of a fresh pair maps to an original
    *    adjacency touching the pick's symbols — a NON-pick census row
    *    (symbol-sharing rows can't be picks), so its count is ≤ the
    *    first non-batched row's count; trimming the batch to a STRICT
    *    count boundary (c_N > c_tail) makes every pick outrank every
    *    possible creation. When the guard-walk consumed the whole
    *    collected census (no tail), symbol-sharing rows don't exist,
    *    so there is nothing to preempt and no trim is needed.
    *
    * Under those guards, at step l the true census argmax is exactly
    * pick l: rows above it are the already-merged picks (count 0),
    * non-pick rows only ever lose count, and fresh-pair rows sit
    * strictly below. Worst case the batch is a single pick — the
    * plain sequential argmax — so progress and exactness never
    * degrade; ties at the snapshot edge just shrink the batch.
    * ScaleProbe's `bpe_batched` arm measures rounds/merge (< 1 from
    * the early, heavy-tailed rounds where batching pays).
    */
  def trainIncrementalBatched(df: DataFrame, textCol: String, nMerges: Int,
                              batchCap: Int = 32): Vector[(String, String)] =
    trainBatchedOnWords(wordsOfCol(df, textCol), nMerges, codePointSyms,
      batchCap)._1

  /** Byte-level [[trainIncrementalBatched]]. */
  def trainBytesIncrementalBatched(df: DataFrame, textCol: String,
                                   nMerges: Int,
                                   batchCap: Int = 32): Vector[(String, String)] =
    trainBatchedOnWords(wordsOfCol(df, textCol), nMerges, byteSyms,
      batchCap)._1

  /** The full production trainer: BATCHED selection over the
    * category-pre-tokenized vocabulary — [[trainBytesPretokIncremental]]'s
    * semantics at [[trainIncrementalBatched]]'s latency (tk32 holds it
    * to tk19's own sequential replay).
    */
  def trainBytesPretokIncrementalBatched(df: DataFrame, textCol: String,
                                         nMerges: Int,
                                         batchCap: Int = 32): Vector[(String, String)] =
    trainBatchedOnWords(pretokWordsOf(df, textCol), nMerges, byteSyms,
      batchCap)._1

  /** [[trainBytesIncrementalBatched]] exposing the ROUND count — the
    * ScaleProbe readout for the jobs-per-merge claim.
    */
  private[graft] def trainBytesBatchedWithStats(df: DataFrame, textCol: String,
                                                nMerges: Int, batchCap: Int): (Vector[(String, String)], Int) =
    trainBatchedOnWords(wordsOfCol(df, textCol), nMerges, byteSyms, batchCap)

  /** The trainer's word census over a text column — (`__w`, f) exact
    * counts. Exposed package-wide so the STREAMING census fold (e43)
    * shares this spelling instead of re-implementing the split: the
    * streamed gate borrows tk31's oracle, so two independently-spelled
    * censuses drifting apart would surface only after a tokenization
    * tweak shipped (the dc3 hides-until-regen class).
    */
  private[graft] def wordCountsOfCol(df: DataFrame,
                                     textCol: String): DataFrame =
    wordsOfCol(df, textCol).groupBy(col("__w")).agg(count(lit(1)).as("f"))

  private def wordsOfCol(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ", -1)).as("__w"))
      .filter(col("__w") =!= "")

  /** Batched trainer over a PRE-AGGREGATED byte-level (word, count)
    * census — the streaming trainer's serve step (e43): the fold
    * accumulates exact per-word counts micro-batch by micro-batch
    * (order-free int64 sums), so training over the drained census is
    * merge-for-merge identical to [[trainBytesIncrementalBatched]]
    * over the same corpus. Columns: (__w string, f long).
    */
  def trainBytesBatchedOnCounts(wordCounts: DataFrame, nMerges: Int,
                                batchCap: Int = 32): Vector[(String, String)] =
    trainBatchedOnWordCounts(wordCounts, nMerges, byteSyms, batchCap)._1

  private def trainBatchedOnWords(words: DataFrame, nMerges: Int,
                                  symbolize: String => Vector[String],
                                  batchCap: Int): (Vector[(String, String)], Int) =
    trainBatchedOnWordCounts(
      words.groupBy(col("__w")).agg(count(lit(1)).as("f")),
      nMerges, symbolize, batchCap)

  private def trainBatchedOnWordCounts(wordCounts: DataFrame, nMerges: Int,
                                       symbolize: String => Vector[String],
                                       batchCap: Int): (Vector[(String, String)], Int) = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    require(batchCap >= 1, s"batchCap must be >= 1, got $batchCap")
    val spark = wordCounts.sparkSession
    import spark.implicits._
    def adjacent(syms: Seq[String]): Iterator[(String, String)] =
      if (syms.length < 2) Iterator.empty
      else (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1)))
    var state: Dataset[(Seq[String], Long)] = wordCounts
      .as[(String, Long)]
      .map { case (w, f) => (symbolize(w): Seq[String], f) }
      .localCheckpoint()
    var counts: DataFrame = state
      .flatMap { case (syms, f) => adjacent(syms).map(p => (p._1, p._2, f)) }
      .toDF("x", "y", "cnt")
      .groupBy($"x", $"y").agg(sum($"cnt").as("cnt"))
      .localCheckpoint()
    val createdStrings = scala.collection.mutable.Set.empty[String]
    val merges = Vector.newBuilder[(String, String)]
    var nMerged = 0
    var current = Vector.empty[(String, String)]
    var rounds = 0
    var exhausted = false
    while (nMerged < nMerges && !exhausted) {
      val m = math.min(batchCap, nMerges - nMerged) + 1
      val top = counts.orderBy($"cnt".desc, $"x", $"y").limit(m)
        .as[(String, String, Long)].collect()
      if (top.isEmpty) exhausted = true
      else {
        // guard-walk: maximal safe prefix (see scaladoc for the proof)
        val used = scala.collection.mutable.Set.empty[String]
        val createdBatch = scala.collection.mutable.Set.empty[String]
        val maxPicks = if (top.length < m) top.length else m - 1
        var k = 0
        var batchFresh = true // every accepted pick's creation is fresh
        var stop = false
        while (!stop && k < maxPicks) {
          val (x, y, _) = top(k)
          val s = x + y
          if (k == 0) {
            used += x; used += y
            batchFresh = !createdStrings(s)
            createdBatch += s
            k = 1
          } else if (batchFresh && !used(x) && !used(y) &&
            !createdStrings(s) && !createdBatch(s)) {
            used += x; used += y
            createdBatch += s
            k += 1
          } else stop = true
        }
        // trim to a strict count boundary against the first non-pick
        // row; a fully-consumed census has no preemption sources
        var n = k
        if (n < top.length) {
          while (n > 1 && top(n - 1)._3 <= top(n)._3) n -= 1
        }
        val picks = top.take(n).map { case (x, y, _) => (x, y) }.toVector
        merges ++= picks
        current = current ++ picks
        createdStrings ++= picks.map { case (x, y) => x + y }
        nMerged += n
        val batchSet = picks.toSet
        val ranks = ranksOf(current) // tiny closure capture, ≤ nMerges
        val advanced = state
          .map { case (syms, f) =>
            if (adjacent(syms).exists(batchSet.contains))
              (syms, applySyms(syms.toVector, ranks): Seq[String], f, true)
            else (Seq.empty[String], syms, f, false)
          }
          .localCheckpoint()
        val deltas = advanced.filter(_._4)
          .flatMap { case (old, nw, f, _) =>
            adjacent(old).map(p => (p._1, p._2, -f)) ++
              adjacent(nw).map(p => (p._1, p._2, f))
          }
          .toDF("x", "y", "cnt")
        counts = counts.unionByName(deltas)
          .groupBy($"x", $"y").agg(sum($"cnt").as("cnt"))
          .filter($"cnt" > 0)
          .localCheckpoint()
        state = advanced.map { case (_, nw, f, _) => (nw, f) }
        rounds += 1
      }
    }
    (merges.result(), rounds)
  }

  /** Persist a merge table as parquet — the BPE model artifact a
    * release ships next to its data ((rank, x, y) rows; rank IS the
    * merge priority, so the file alone reconstructs the tokenizer).
    */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
                 merges: Seq[(String, String)], dir: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((x, y), i) => (i, x, y) }
      .toDF("rank", "x", "y")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Reload a persisted merge table in rank order. The artifact is the
    * MODEL (bounded: one row per merge) — the driver-side collect is
    * the intended shape, same contract as every frozen-table closure
    * capture. Round-trip identity is pinned by BpeSpec.
    */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
                 dir: String): Vector[(String, String)] = {
    import spark.implicits._
    spark.read.parquet(dir)
      .orderBy(col("rank"))
      .select(col("x"), col("y"))
      .as[(String, String)].collect().toVector
  }

  /** The frozen merge table the tk1/tk2 gates run under: the output of
    * [[train]] over `documents` at sf0.01 with nMerges=24, frozen as a
    * literal (like the ml1 golden cells) so the gates are pure
    * deterministic replays at EVERY sf — the oracle SQL embeds the
    * same 24 rows as a VALUES list. BpeSpec re-derives this from the
    * live trainer and fails loudly if the fixture or trainer drifts.
    */
  val FrozenMerges: Vector[(String, String)] = Vector(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"))

  /** The frozen BYTE-level merge table the tk10–tk12 gates run under:
    * [[trainBytes]] over sf0.01 `documents` UNION the mixed-script
    * plants (TrainingCatalog.BytePlants), nMerges=24, frozen like
    * [[FrozenMerges]] so the gates are deterministic replays at every
    * sf. Symbols are hex-byte strings — "65"='e', "6572"="er"; the
    * table largely shadows the char-level one through ASCII hex
    * because the corpus is ASCII-dominated, diverging where the
    * plants' multi-byte pairs change the count order (rank 16 on:
    * ("63","61")="ca" precedes the char table's ("a","n") — BpeSpec
    * re-derives and pins this).
    */
  val FrozenByteMerges: Vector[(String, String)] = Vector(
    ("65", "72"), ("69", "6e"), ("6f", "77"), ("6f", "72"), ("73", "74"),
    ("6d", "6572"), ("61", "74"), ("6c", "75"), ("61", "72"), ("70", "6172"),
    ("6a", "6f"), ("6a6f", "696e"), ("61", "73"), ("6173", "68"),
    ("68", "617368"), ("72", "6f77"), ("63", "61"), ("6174", "63"),
    ("617463", "68"), ("62", "61746368"), ("6361", "6e"), ("73", "63616e"),
    ("63", "6f"), ("63", "75"))

  /** The frozen CATEGORY-pre-tokenized byte-merge table the tk16/tk18/
    * tk20 gates run under: [[trainBytesPretok]] over sf0.01 `documents`
    * UNION BytePlants UNION PretokPlants, nMerges = 24, frozen like
    * [[FrozenByteMerges]] (BpeSpec re-derives; tk19 oracle-gates the
    * trainer itself). The table is visibly Ġ-shaped: rank 0 is
    * ("20","73") = " s" — space-prefixed word forms get their own
    * merge paths, which plain space-split byte BPE structurally cannot
    * learn.
    */
  val FrozenPretokMerges: Vector[(String, String)] = Vector(
    ("20", "73"), ("65", "72"), ("69", "6e"),
    ("6f", "77"), ("6f", "72"), ("6d", "6572"),
    ("61", "74"), ("6c", "75"), ("20", "63"),
    ("73", "74"), ("20", "62"), ("20", "76"),
    ("70", "61"), ("7061", "72"), ("20", "66"),
    ("20", "61"), ("20", "74"), ("6a", "6f"),
    ("6a6f", "696e"), ("61", "73"), ("6173", "68"),
    ("68", "617368"), ("20", "6a6f696e"), ("72", "6f77"))

  /** The end-of-document separator id for cross-doc sequence packing:
    * the first id past [[vocab]]'s range (base 26 + one per merge —
    * collisions leave holes below but never claim ids above), so it
    * can never collide with a real token id. The GPT `<|endoftext|>`
    * convention, derived from the merge table so engine and oracle
    * agree by construction.
    */
  def sepId(merges: Seq[(String, String)]): Int = 26 + merges.size

  /** Re-tokenize every document under `merges`: returns
    * (idCol, n_words, n_bpe_tokens, bpe_text) with `bpe_text` the
    * space-joined BPE token stream in word order. Feeding `bpe_text`
    * to [[graft.operators.Chunker.chunkByTokens]] chunks in BPE-token
    * space, and `n_bpe_tokens` is the tokenizer column the batch and
    * streaming token budgets (`GroupStats.tokenBudgetTrim`,
    * `DocStream.tokenBudgetUpdates`) accept as `nTokCol` — the
    * operators were already tokenizer-agnostic by signature; this
    * supplies the BPE denomination.
    *
    * Documents with no words (empty text) drop out, matching the
    * oracle's join semantics. The vocab side of the join carries the
    * broadcast hint because |vocab| ≪ |corpus| by Heaps' law; for a
    * pathological vocab larger than the broadcast threshold, remove
    * the hint and the same plan degrades gracefully to a shuffle join.
    */
  def tokenizeDocs(df: DataFrame, idCol: String, textCol: String,
                   merges: Seq[(String, String)]): DataFrame =
    tokenizeDocsWith(df, idCol, textCol, merges, codePointSyms)

  /** Byte-level [[tokenizeDocs]]: identical output contract, but
    * `bpe_text` carries hex-byte-symbol tokens ("c3a9" = é before any
    * merge) and `n_bpe_tokens` counts byte-level tokens. Works on ANY
    * UTF-8 text — no alphabet restriction, the GPT-2-class guarantee.
    */
  def tokenizeDocsBytes(df: DataFrame, idCol: String, textCol: String,
                        merges: Seq[(String, String)]): DataFrame =
    tokenizeDocsWith(df, idCol, textCol, merges, byteSyms)

  /** [[tokenizeDocsBytes]] over CATEGORY-pre-tokenized words (tk16):
    * each [[pretokenize]] token — leading space included — symbolizes
    * to UTF-8 hex bytes and merges under `merges`. `n_words` counts
    * category tokens (whitespace runs included: they are real GPT-2
    * tokens). Lossless by construction: the category tokens PARTITION
    * the text, so no space-prefix bookkeeping is needed. `idCol` must
    * be long-castable (the typed pre-tokenizing flatMap).
    */
  def tokenizeDocsBytesPretok(df: DataFrame, idCol: String, textCol: String,
                              merges: Seq[(String, String)]): DataFrame =
    tokenizeWordsWith(pretokWordsPos(df, idCol, textCol), idCol,
      ranksOf(merges), byteSyms)

  /** (id, __pos, __w) via the category lexer — the pretok sibling of
    * the posexplode(split) word stream.
    */
  private def pretokWordsPos(df: DataFrame, idCol: String,
                             textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .filter(col(textCol).isNotNull)
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        pretokenize(t).iterator.zipWithIndex.map { case (w, i) => (id, i, w) }
      }
      .toDF(idCol, "__pos", "__w")
  }

  private def tokenizeDocsWith(df: DataFrame, idCol: String, textCol: String,
                               merges: Seq[(String, String)],
                               symbolize: String => Vector[String]): DataFrame =
    tokenizeWordsWith(
      df.select(col(idCol),
          posexplode(split(col(textCol), " ", -1)).as(Seq("__pos", "__w")))
        .filter(col("__w") =!= ""),
      idCol, ranksOf(merges), symbolize)

  private def tokenizeWordsWith(words: DataFrame, idCol: String,
                                ranks: Map[(String, String), Int],
                                symbolize: String => Vector[String]): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val vocabTok = words.select(col("__w")).distinct().as[String]
      .map { w =>
        val t = applySyms(symbolize(w), ranks)
        (w, t.mkString(" "), t.length.toLong)
      }
      .toDF("__w", "__toks", "__n")
    words.join(broadcast(vocabTok), Seq("__w"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("__n")).as("n_bpe_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("__pos"), col("__toks")))),
            s => s("__toks")),
          " ").as("bpe_text"))
  }

  /** Deterministic token→id table — the model-ready vocabulary: the
    * base alphabet a–z takes ids 0–25, then each merge product takes
    * 26+rank. A product whose surface string collides with an earlier
    * token keeps the FIRST id (surface-string vocab, the GPT-2
    * convention — two merge paths to one string are one token).
    * Lookup of anything else (out-of-alphabet characters) yields the
    * unk id −1.
    */
  def vocab(merges: Seq[(String, String)]): Map[String, Int] = {
    val base = ('a' to 'z').map(_.toString).zipWithIndex.toMap
    merges.zipWithIndex.foldLeft(base) { case (m, ((x, y), i)) =>
      if (m.contains(x + y)) m else m + ((x + y) -> (26 + i))
    }
  }

  /** Byte-level token→id table: the 256 byte symbols take ids equal to
    * their byte VALUE (0–255 — "00"→0, "ff"→255), then each merge
    * product takes 256+rank, first-id-wins on surface collisions (the
    * [[vocab]] convention). Because every terminal symbol is either a
    * base byte or a merge product, lookup can NEVER miss — the
    * byte-fallback guarantee that makes OOV structurally impossible.
    */
  def byteVocab(merges: Seq[(String, String)]): Map[String, Int] = {
    val base = (0 until 256).map(b => f"$b%02x" -> b).toMap
    merges.zipWithIndex.foldLeft(base) { case (m, ((x, y), i)) =>
      if (m.contains(x + y)) m else m + ((x + y) -> (256 + i))
    }
  }

  /** End-of-document separator id for the byte-level vocabulary: first
    * id past [[byteVocab]]'s range (see [[sepId]]).
    */
  def byteSepId(merges: Seq[(String, String)]): Int = 256 + merges.size

  /** [[tokenizeDocs]] emitting integer token IDS — the artifact a
    * training run actually consumes: (idCol, n_bpe_tokens, bpe_ids)
    * with ids from [[vocab]] in token order (−1 for out-of-vocabulary
    * symbols). Same vocab-memoized shape: the merge loop and id
    * lookup run once per DISTINCT word; the corpus pays the broadcast
    * join and one doc-keyed ordered flatten.
    */
  def tokenizeToIds(df: DataFrame, idCol: String, textCol: String,
                    merges: Seq[(String, String)]): DataFrame =
    tokenizeToIdsWith(df, idCol, textCol, ranksOf(merges), vocab(merges),
      codePointSyms)

  /** Byte-level [[tokenizeToIds]]: ids from [[byteVocab]]. By the
    * byte-fallback guarantee the unk id −1 never appears — asserted
    * structurally (any symbol is a base byte or a merge product), and
    * the tk11 gate's mixed-script plants exercise it on multi-byte
    * UTF-8 (including non-BMP emoji, 4 bytes).
    */
  def tokenizeToIdsBytes(df: DataFrame, idCol: String, textCol: String,
                         merges: Seq[(String, String)]): DataFrame =
    tokenizeToIdsWith(df, idCol, textCol, ranksOf(merges), byteVocab(merges),
      byteSyms)

  /** Space-preserving byte-level ids (the GPT-2 Ġ convention, spelled
    * with a literal space byte): every word after the first carries its
    * PRECEDING space inside the token stream ("b" in "a b" symbolizes
    * as 20-62), so concatenating decoded tokens reproduces the exact
    * original text — see [[detokenizeBytes]]. Merge application and id
    * lookup are unchanged; the space byte "20" simply participates as
    * a symbol (it merges only if the table says so).
    */
  def tokenizeToIdsBytesLossless(df: DataFrame, idCol: String, textCol: String,
                                 merges: Seq[(String, String)]): DataFrame =
    tokenizeToIdsWith(df, idCol, textCol, ranksOf(merges), byteVocab(merges),
      byteSyms, spacePrefix = true)

  /** Inverse of [[tokenizeToIdsBytesLossless]]: ids → hex symbols (the
    * id→surface map is injective — first-id-wins means an id maps to
    * exactly one surface) → UTF-8 bytes → text. With byte fallback
    * there is no unk to lose, so `detokenize(tokenize(x)) == x` for ANY
    * text — leading, trailing, and doubled spaces included (empty split
    * tokens become bare space tokens), every script — the property that
    * makes byte-level the production tokenizer contract (char-level
    * BPE destroys OOV tokens irrecoverably at −1). Pure per-row map,
    * no shuffle; the tk13 gate holds the full encode→decode loop to
    * the identity oracle over the mixed-script corpus.
    */
  def detokenizeBytes(df: DataFrame, idCol: String, idsCol: String,
                      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rev: Map[Int, String] = byteVocab(merges).map(_.swap)
    df.select(col(idCol).cast("long"), col(idsCol))
      .as[(Long, Array[Int])]
      .map { case (id, ids) =>
        val hex = ids.iterator.map(i => rev.getOrElse(i, "")).mkString
        val bytes = new Array[Byte](hex.length / 2)
        var j = 0
        while (j < bytes.length) {
          bytes(j) = ((Character.digit(hex.charAt(2 * j), 16) << 4)
            | Character.digit(hex.charAt(2 * j + 1), 16)).toByte
          j += 1
        }
        (id, new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
      }.toDF(idCol, "text")
  }

  /** [[tokenizeToIdsBytes]] over CATEGORY-pre-tokenized words: ids
    * from [[byteVocab]], tokens from [[pretokenize]] (leading spaces
    * inside the tokens — the Ġ convention), so
    * [[detokenizeBytes]](this) reproduces the text byte-for-byte
    * WITHOUT the space-prefix empty-token bookkeeping (the category
    * tokens partition the text). The tk20 gate holds the loop to the
    * identity oracle.
    */
  def tokenizeToIdsBytesPretok(df: DataFrame, idCol: String, textCol: String,
                               merges: Seq[(String, String)]): DataFrame =
    tokenizeIdsOnWords(pretokWordsPos(df, idCol, textCol), idCol,
      ranksOf(merges), byteVocab(merges), byteSyms)

  private def tokenizeToIdsWith(df: DataFrame, idCol: String, textCol: String,
                                ranks: Map[(String, String), Int],
                                ids: Map[String, Int],
                                symbolize: String => Vector[String],
                                spacePrefix: Boolean = false): DataFrame = {
    val exploded = df
      .select(col(idCol),
        posexplode(split(col(textCol), " ", -1)).as(Seq("__pos", "__w")))
    val words =
      if (!spacePrefix) exploded.filter(col("__w") =!= "")
      else
        // losslessness demands the empty "words" survive too: a split
        // on ' ' yields an empty token wherever the text has a leading,
        // trailing, or doubled space, and the space-prefix convention
        // turns each one (past position 0) into a bare one-byte " "
        // token — so "a  b", "a ", " a" all round-trip byte-exact. The
        // position-0 empty (leading space) carries no bytes of its own;
        // the space it stands for is re-added as word 1's prefix.
        exploded
          .withColumn("__w",
            concat(when(col("__pos") > 0, lit(" ")).otherwise(lit("")),
              col("__w")))
          .filter(col("__w") =!= "")
    tokenizeIdsOnWords(words, idCol, ranks, ids, symbolize)
  }

  private def tokenizeIdsOnWords(words: DataFrame, idCol: String,
                                 ranks: Map[(String, String), Int],
                                 ids: Map[String, Int],
                                 symbolize: String => Vector[String]): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val vocabIds = words.select(col("__w")).distinct().as[String]
      .map { w =>
        val t = applySyms(symbolize(w), ranks).map(s => ids.getOrElse(s, -1))
        (w, t, t.length.toLong)
      }
      .toDF("__w", "__ids", "__n")
    words.join(broadcast(vocabIds), Seq("__w"))
      .groupBy(col(idCol))
      .agg(
        sum(col("__n")).as("n_bpe_tokens"),
        flatten(
          transform(
            array_sort(collect_list(struct(col("__pos"), col("__ids")))),
            s => s("__ids"))).as("bpe_ids"))
  }

  /** DuckDB spelling of [[tokenizeToIds]]: the [[tokenizeSql]] replay
    * joined against the SAME vocab table ([[vocab]] emitted as a
    * VALUES list — no SQL-side re-derivation to drift), −1 for misses.
    */
  def idsSql(src: String, id: String, text: String,
             merges: Seq[(String, String)]): String = {
    val vvals = vocab(merges).toSeq.sortBy(_._2)
      .map { case (t, i) => s"('$t', $i)" }.mkString(", ")
    s"""(WITH bpe AS (SELECT $id, bpe_text
       |  FROM ${tokenizeSql(src, id, text, merges)} b),
       |v(tok, tid) AS (SELECT * FROM (VALUES $vvals) x(tok, tid)),
       |tks AS (SELECT $id, u.i, t[u.i] AS tok
       |  FROM (SELECT $id, string_split(bpe_text, ' ') AS t FROM bpe) s
       |  CROSS JOIN LATERAL unnest(generate_series(1, len(t))) AS u(i)),
       |ids AS (SELECT tks.$id, tks.i, CAST(COALESCE(v.tid, -1) AS INT) AS tid
       |  FROM tks LEFT JOIN v ON tks.tok = v.tok)
       |SELECT $id, CAST(COUNT(*) AS BIGINT) AS n_bpe_tokens,
       |  string_agg(CAST(tid AS VARCHAR), ',' ORDER BY i) AS bpe_ids
       |FROM ids GROUP BY $id)""".stripMargin
  }

  /** DuckDB spelling of [[tokenizeDocs]] over `src(id, text)`: the
    * recursive CTE replays the same greedy loop — per DISTINCT word,
    * each recursion step merges the leftmost occurrence (non-global
    * `regexp_replace`) of the min-rank pair present (`min_by` over the
    * merge VALUES), and a word's terminal row is the one where no pair
    * applies. Merge symbols here are [a-z]+ so they are regex-inert;
    * the '|' pair separator cannot collide for the same reason.
    */
  def tokenizeSql(src: String, id: String, text: String,
                  merges: Seq[(String, String)]): String = {
    require(merges.nonEmpty, "merges must be non-empty")
    require(merges.forall { case (x, y) =>
      (x + y).forall(c => c >= 'a' && c <= 'z') },
      "oracle replay requires regex-inert [a-z]+ merge symbols")
    val mvals = merges.zipWithIndex
      .map { case ((x, y), i) => s"($i, '$x', '$y')" }.mkString(", ")
    s"""(WITH RECURSIVE
       |m(rank, x, y) AS (SELECT * FROM (VALUES $mvals) v(rank, x, y)),
       |w0 AS (SELECT $id AS __id, i - 1 AS __pos, t[i] AS __w
       |  FROM (SELECT $id, string_split($text, ' ') AS t FROM $src) d
       |  CROSS JOIN LATERAL unnest(generate_series(1, len(t))) AS u(i)
       |  WHERE t[i] <> ''),
       |vocab AS (SELECT DISTINCT __w AS word FROM w0),
       |step(word, seq) AS (
       |  SELECT word, ' ' || trim(regexp_replace(word, '(?s)(.)', '\\1 ', 'g')) || ' '
       |  FROM vocab
       |  UNION ALL
       |  SELECT word, regexp_replace(seq,
       |      ' ' || split_part(p, '|', 1) || ' ' || split_part(p, '|', 2) || ' ',
       |      ' ' || split_part(p, '|', 1) || split_part(p, '|', 2) || ' ')
       |  FROM (SELECT word, seq,
       |          (SELECT min_by(x || '|' || y, rank) FROM m
       |           WHERE position(' ' || x || ' ' || y || ' ' IN s.seq) > 0) AS p
       |        FROM step s) t
       |  WHERE p IS NOT NULL),
       |fin AS (SELECT word, trim(seq) AS toks,
       |    CAST(len(string_split(trim(seq), ' ')) AS BIGINT) AS n
       |  FROM step s
       |  WHERE NOT EXISTS (SELECT 1 FROM m
       |    WHERE position(' ' || x || ' ' || y || ' ' IN s.seq) > 0))
       |SELECT w0.__id AS $id,
       |  CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(f.n) AS BIGINT) AS n_bpe_tokens,
       |  string_agg(f.toks, ' ' ORDER BY w0.__pos) AS bpe_text
       |FROM w0 JOIN fin f ON w0.__w = f.word
       |GROUP BY w0.__id)""".stripMargin
  }

  /** DuckDB spelling of [[tokenizeDocsBytes]]: the [[tokenizeSql]]
    * recursive replay with the initial split swapped to UTF-8 bytes —
    * `lower(hex(encode(word)))` chopped into 2-hex-char symbols. Hex
    * symbols are regex-inert by construction, so the merge-step
    * `regexp_replace` interpolation is safe for ANY corpus text (the
    * char-level spelling's [a-z]+ restriction does not apply).
    */
  /** [[PretokPattern]] as a DuckDB string literal (apostrophes doubled;
    * regular — not E'' — strings pass backslashes to RE2 untouched).
    */
  private[graft] def pretokPatternSql: String =
    PretokPattern.replace("'", "''")

  def tokenizeBytesSql(src: String, id: String, text: String,
                       merges: Seq[(String, String)]): String =
    tokenizeBytesSqlOver(s"string_split($text, ' ')", "t[i] <> ''",
      src, id, merges)

  /** DuckDB spelling of [[tokenizeDocsBytesPretok]]: the byte replay
    * with the initial word stream swapped to the CATEGORY lexer —
    * `regexp_extract_all` under [[PretokPattern]] (RE2's leftmost-
    * first alternation == the engine's hand lexer; the pattern
    * partitions the text, so no empty-token filter exists).
    */
  def tokenizeBytesPretokSql(src: String, id: String, text: String,
                             merges: Seq[(String, String)]): String =
    tokenizeBytesSqlOver(s"regexp_extract_all($text, '$pretokPatternSql')",
      "TRUE", src, id, merges)

  private def tokenizeBytesSqlOver(arrExpr: String, keep: String,
                                   src: String, id: String,
                                   merges: Seq[(String, String)]): String = {
    require(merges.nonEmpty, "merges must be non-empty")
    require(merges.forall { case (x, y) =>
      val s = x + y
      s.length % 2 == 0 && s.forall(c =>
        (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')) },
      "byte-level oracle replay requires even-length [0-9a-f]+ hex merge symbols")
    val mvals = merges.zipWithIndex
      .map { case ((x, y), i) => s"($i, '$x', '$y')" }.mkString(", ")
    s"""(WITH RECURSIVE
       |m(rank, x, y) AS (SELECT * FROM (VALUES $mvals) v(rank, x, y)),
       |w0 AS (SELECT $id AS __id, i - 1 AS __pos, t[i] AS __w
       |  FROM (SELECT $id, $arrExpr AS t FROM $src) d
       |  CROSS JOIN LATERAL unnest(generate_series(1, len(t))) AS u(i)
       |  WHERE $keep),
       |vocab AS (SELECT DISTINCT __w AS word FROM w0),
       |step(word, seq) AS (
       |  SELECT word,
       |    ' ' || trim(regexp_replace(lower(hex(encode(word))), '(..)', '\\1 ', 'g')) || ' '
       |  FROM vocab
       |  UNION ALL
       |  SELECT word, regexp_replace(seq,
       |      ' ' || split_part(p, '|', 1) || ' ' || split_part(p, '|', 2) || ' ',
       |      ' ' || split_part(p, '|', 1) || split_part(p, '|', 2) || ' ')
       |  FROM (SELECT word, seq,
       |          (SELECT min_by(x || '|' || y, rank) FROM m
       |           WHERE position(' ' || x || ' ' || y || ' ' IN s.seq) > 0) AS p
       |        FROM step s) t
       |  WHERE p IS NOT NULL),
       |fin AS (SELECT word, trim(seq) AS toks,
       |    CAST(len(string_split(trim(seq), ' ')) AS BIGINT) AS n
       |  FROM step s
       |  WHERE NOT EXISTS (SELECT 1 FROM m
       |    WHERE position(' ' || x || ' ' || y || ' ' IN s.seq) > 0))
       |SELECT w0.__id AS $id,
       |  CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(f.n) AS BIGINT) AS n_bpe_tokens,
       |  string_agg(f.toks, ' ' ORDER BY w0.__pos) AS bpe_text
       |FROM w0 JOIN fin f ON w0.__w = f.word
       |GROUP BY w0.__id)""".stripMargin
  }

  /** DuckDB spelling of [[tokenizeToIdsBytes]] — [[idsSql]] over the
    * byte replay, with [[byteVocab]] emitted as the VALUES table.
    * COALESCE(−1) is spelled for shape parity but structurally dead:
    * every terminal symbol is a base byte or a merge product.
    */
  def idsBytesSql(src: String, id: String, text: String,
                  merges: Seq[(String, String)]): String =
    idsBytesSqlOver(tokenizeBytesSql(src, id, text, merges), id, merges)

  /** DuckDB spelling of [[tokenizeToIdsBytesPretok]] — [[idsBytesSql]]
    * over the category-lexer replay.
    */
  def idsBytesPretokSql(src: String, id: String, text: String,
                        merges: Seq[(String, String)]): String =
    idsBytesSqlOver(tokenizeBytesPretokSql(src, id, text, merges), id, merges)

  private def idsBytesSqlOver(bpeSql: String, id: String,
                              merges: Seq[(String, String)]): String = {
    val vvals = byteVocab(merges).toSeq.sortBy(_._2)
      .map { case (t, i) => s"('$t', $i)" }.mkString(", ")
    s"""(WITH bpe AS (SELECT $id, bpe_text
       |  FROM $bpeSql b),
       |v(tok, tid) AS (SELECT * FROM (VALUES $vvals) x(tok, tid)),
       |tks AS (SELECT $id, u.i, t[u.i] AS tok
       |  FROM (SELECT $id, string_split(bpe_text, ' ') AS t FROM bpe) s
       |  CROSS JOIN LATERAL unnest(generate_series(1, len(t))) AS u(i)),
       |ids AS (SELECT tks.$id, tks.i, CAST(COALESCE(v.tid, -1) AS INT) AS tid
       |  FROM tks LEFT JOIN v ON tks.tok = v.tok)
       |SELECT $id, CAST(COUNT(*) AS BIGINT) AS n_bpe_tokens,
       |  string_agg(CAST(tid AS VARCHAR), ',' ORDER BY i) AS bpe_ids
       |FROM ids GROUP BY $id)""".stripMargin
  }

  /** DuckDB replay of [[train]] over `src(text)`: the merge-selection
    * loop is unrolled into `nMerges` sequential stages — each stage
    * counts adjacent symbol pairs (occurrence-weighted by exact-long
    * word frequency), freezes the argmax (`ORDER BY cnt DESC, x, y
    * LIMIT 1` — the trainer's deterministic tie-break verbatim), and
    * advances every word's symbolization with a per-stage RECURSIVE
    * CTE that merges the chosen pair leftmost-first until absent (the
    * [[tokenizeSql]] step discipline). Incremental advance here equals
    * the trainer's per-round greedy re-derivation: the trainer's
    * lowest-rank-first loop replays merges in exactly the order they
    * were frozen, so state after k incremental applications is the
    * state applyWord reaches under ranks 1..k ([[BpeSpec]] pins this
    * on the gate corpus). Emits (rank BIGINT, x, y) ordered rows; if
    * the corpus exhausts adjacent pairs early, later stages select
    * from an empty argmax and contribute no rows — matching the
    * trainer's early stop.
    *
    * Tokens are filtered to regex-inert `^[a-z]+$` (the same filter
    * the paired engine gate applies before [[train]]): chosen symbols
    * are interpolated into the recursive stage's `regexp_replace`
    * PATTERN, so they must carry no metacharacters — the
    * [[tokenizeSql]] merge-symbol contract, enforced here at the
    * source instead of over a frozen table.
    *
    * Every stage CTE is `AS MATERIALIZED`: each stage references its
    * predecessor 2–3 times, and a planner that inlines CTEs would
    * re-evaluate the chain O(3^nMerges) times — the unhinted spelling
    * measurably hangs DuckDB at 8 stages.
    */
  def learnSql(src: String, text: String, nMerges: Int): String =
    learnSqlWith(src, text, nMerges,
      // chosen symbols are interpolated into the recursive stage's
      // regexp_replace PATTERN, so tokens must be regex-inert
      wordFilter = " AND regexp_full_match(u.tk, '[a-z]+')",
      initialSplit = w => s"' ' || trim(regexp_replace($w, '(?s)(.)', '\\1 ', 'g')) || ' '")

  /** DuckDB replay of [[trainBytes]]: the [[learnSql]] unrolled-stage
    * machinery with the byte initial split (`lower(hex(encode(w)))`
    * chopped into 2-hex-char symbols) and NO token filter — hex
    * symbols are regex-inert for any input, so every word trains
    * (the byte contract).
    */
  def learnBytesSql(src: String, text: String, nMerges: Int): String =
    learnSqlWith(src, text, nMerges, wordFilter = "",
      initialSplit = w =>
        s"' ' || trim(regexp_replace(lower(hex(encode($w))), '(..)', '\\1 ', 'g')) || ' '")

  /** DuckDB replay of [[trainBytesPretok]]: the unrolled-stage trainer
    * machinery with the vocabulary drawn from the CATEGORY lexer
    * (`regexp_extract_all` under [[PretokPattern]] — no empty tokens
    * exist, and hex symbols are regex-inert for any input including
    * the space byte "20").
    */
  def learnBytesPretokSql(src: String, text: String, nMerges: Int): String =
    learnSqlWith(src, text, nMerges, wordFilter = "",
      initialSplit = w =>
        s"' ' || trim(regexp_replace(lower(hex(encode($w))), '(..)', '\\1 ', 'g')) || ' '",
      arrExpr = t => s"regexp_extract_all($t, '$pretokPatternSql')",
      baseFilter = "TRUE")

  private def learnSqlWith(src: String, text: String, nMerges: Int,
                           wordFilter: String,
                           initialSplit: String => String,
                           arrExpr: String => String =
                             t => s"string_split($t, ' ')",
                           baseFilter: String = "u.tk <> ''"): String = {
    require(nMerges >= 1 && nMerges <= 32,
      s"learnSql unrolls one stage per merge; keep nMerges in [1, 32], got $nMerges")
    val sb = new StringBuilder
    sb ++= s"""(WITH RECURSIVE
       | w0 AS MATERIALIZED (SELECT u.tk AS w, CAST(COUNT(*) AS BIGINT) AS f
       |   FROM (SELECT ${arrExpr(text)} AS t FROM $src) d
       |   CROSS JOIN LATERAL unnest(t) AS u(tk)
       |   WHERE $baseFilter$wordFilter
       |   GROUP BY u.tk),
       | s0 AS MATERIALIZED (SELECT w, f,
       |   ${initialSplit("w")} AS seq
       |   FROM w0)""".stripMargin
    for (k <- 1 to nMerges) {
      val prev = s"s${k - 1}"
      sb ++= s""",
       | p$k AS MATERIALIZED (SELECT t[i] AS x, t[i+1] AS y, SUM(f) AS cnt
       |   FROM (SELECT f, string_split(trim(seq), ' ') AS t FROM $prev) z
       |   CROSS JOIN LATERAL unnest(generate_series(1, len(t) - 1)) AS u(i)
       |   GROUP BY 1, 2),
       | b$k AS MATERIALIZED (SELECT x, y FROM p$k ORDER BY cnt DESC, x, y LIMIT 1),
       | r$k(w, f, seq) AS (
       |   SELECT w, f, seq FROM $prev
       |   UNION ALL
       |   SELECT r.w, r.f, regexp_replace(r.seq,
       |       ' ' || b.x || ' ' || b.y || ' ', ' ' || b.x || b.y || ' ')
       |   FROM r$k r, b$k b
       |   WHERE position(' ' || b.x || ' ' || b.y || ' ' IN r.seq) > 0),
       | s$k AS MATERIALIZED (SELECT w, f, seq FROM r$k r
       |   WHERE NOT EXISTS (SELECT 1 FROM b$k b
       |     WHERE position(' ' || b.x || ' ' || b.y || ' ' IN r.seq) > 0))""".stripMargin
    }
    sb ++= (1 to nMerges)
      .map(k => s"SELECT CAST(${k - 1} AS BIGINT) AS rank, x, y FROM b$k")
      .mkString("\n ", "\n UNION ALL\n ", ")")
    sb.result()
  }
}

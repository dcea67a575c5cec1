package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer — the BERT-family member of the production
  * tokenizer trio (BPE = merge-rank greedy, unigram-LM = Viterbi,
  * WordPiece = greedy longest-match-first), filling the gap the r16
  * verdict named. Two halves, both deterministic and oracle-exact:
  *
  *  - ENCODING (tk33): a word is consumed left to right; at each
  *    position the LONGEST vocabulary piece matching the remaining
  *    prefix is taken — word-initial pieces match as-is, continuations
  *    match with the `##` prefix stripped — and a word with NO match
  *    at any position becomes the single token `[UNK]` (whole-word
  *    failure, the BERT convention; there is no char fallback).
  *    Deterministic by construction (longest match is unique: two
  *    distinct pieces of equal length cannot share a surface at a
  *    position), so the DuckDB oracle replays it with a recursive CTE
  *    — one longest-match step per recursion row, `max_by(piece,
  *    len)` over the substr-matched vocabulary.
  *
  *  - TRAINING (tk35): HuggingFace's published WordPiece objective —
  *    each round scores every adjacent symbol pair by
  *    `score = count(xy) / (count(x) · count(y))` (pair counts and
  *    symbol counts both occurrence-weighted exact longs over the
  *    corpus under the current symbolization), freezes the argmax
  *    (score DESC, then lexicographic (x, y) — the [[Bpe.train]]
  *    tie-break discipline), and merges all occurrences; the merge
  *    product strips the continuation's `##` (x="pl", y="##ay" →
  *    "play"). The score is ONE IEEE division of exact-int-derived
  *    doubles spelled identically on both engines (`CAST(cnt) /
  *    (CAST(cx) * CAST(cy))`), so the ordering — including ties at
  *    equal doubles — is bit-reproducible, and the oracle unrolls one
  *    stage per merge exactly like [[Bpe.learnSql]].
  *
  * Corpus words are space-split tokens filtered to regex-inert
  * `\A[a-z]+\z` for the TRAINING gate (chosen symbols interpolate
  * into the recursive advance's regexp_replace pattern — the
  * [[Bpe.learnSql]] filter discipline); ENCODING takes any word (an
  * unmatchable word is `[UNK]` on both engines, and substr matching
  * interpolates nothing).
  *
  * Scale shape: encoding is a pure function of the WORD — the greedy
  * loop runs once per DISTINCT word as a compiled typed map, and the
  * corpus pays a broadcast hash join plus one doc-keyed reassembly
  * agg (the [[Bpe.tokenizeDocs]] plan). Training iterates over the
  * persisted (distinct word, freq) state: per round two partial-
  * combining censuses (pairs, symbols) whose shuffle volume is
  * vocabulary-sized (Heaps' law), one broadcast-joined score, and a
  * 1-row argmax collect — no corpus re-scan after the first census.
  */
object WordPiece {

  val Unk = "[UNK]"

  /** Greedy longest-match-first encoding of one word: the token list,
    * or the single [[Unk]] when some position has no matching piece.
    * Pure — safe in closures; `vocab` is the small piece inventory.
    */
  def encodeWord(word: String, vocab: Set[String]): Vector[String] = {
    val n = word.length
    val out = Vector.newBuilder[String]
    var pos = 0
    while (pos < n) {
      var j = n - pos
      var hit: String = null
      while (j >= 1 && hit == null) {
        val cand =
          if (pos == 0) word.substring(0, j)
          else "##" + word.substring(pos, pos + j)
        if (vocab.contains(cand)) hit = cand
        j -= 1
      }
      if (hit == null) return Vector(Unk)
      out += hit
      pos += (if (pos == 0) hit.length else hit.length - 2)
    }
    out.result()
  }

  /** Encode every document under a frozen vocabulary:
    * (idCol, n_words, n_wp_tokens, wp_text) with `wp_text` the
    * space-joined token stream in word order ([UNK] counts as one
    * token). Distinct-word memoized + broadcast join + one doc-keyed
    * ordered reassembly — the [[Bpe.tokenizeDocs]] plan. Documents
    * with no words (empty text) drop, matching the oracle's join
    * semantics.
    */
  def tokenizeDocs(df: DataFrame, idCol: String, textCol: String,
                   vocab: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vset = vocab.toSet
    val words = df.select(col(idCol),
        posexplode(split(col(textCol), " ", -1)).as(Seq("__pos", "__w")))
      .filter(col("__w") =!= "")
    val vocabTok = words.select(col("__w")).distinct().as[String]
      .map { w =>
        val t = encodeWord(w, vset)
        (w, t.mkString(" "), t.length.toLong)
      }
      .toDF("__w", "__toks", "__n")
    words.join(broadcast(vocabTok), Seq("__w"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("__n")).as("n_wp_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("__pos"), col("__toks")))),
            s => s("__toks")),
          " ").as("wp_text"))
  }

  /** Initial symbolization: first character bare, every continuation
    * character `##`-prefixed (the BERT convention). Code-point split,
    * like [[Bpe.codePointSyms]] — though the training gate's [a-z]
    * filter makes the distinction moot there.
    */
  private[graft] def wpSyms(word: String): Vector[String] = {
    val cps = Bpe.codePointSyms(word)
    if (cps.isEmpty) cps
    else cps.head +: cps.tail.map("##" + _)
  }

  private def stripCont(y: String): String =
    if (y.startsWith("##")) y.substring(2) else y

  /** One all-occurrences merge pass, left to right. Equivalent to
    * repeated leftmost replacement (the oracle's recursive step): the
    * product x+strip(y) is strictly longer than x and than y's
    * surface, so a replacement can never create a new (x, y)
    * occurrence spanning its own boundary.
    */
  private[graft] def mergePass(syms: Vector[String], x: String, y: String,
                               merged: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == x && syms(i + 1) == y) {
        b += merged; i += 2
      } else { b += syms(i); i += 1 }
    }
    b.result()
  }

  /** The trainer's word census — (`__w`, f) exact counts under the
    * gate word filter (training symbols interpolate into the oracle's
    * regexp_replace — the learnSql regex-inertness contract). ONE
    * spelling shared with the streaming census fold (e49) so the two
    * cannot drift (the e43/dc3 lesson).
    */
  private[graft] def wordCountsOfCol(df: DataFrame,
                                     textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ", -1)).as("__w"))
      .filter(col("__w").rlike("\\A[a-z]+\\z"))
      .groupBy(col("__w")).agg(count(lit(1)).as("f"))

  /** Learn `nMerges` merges from the corpus (see object scaladoc for
    * the objective and tie-break). Returns (x, y) pairs in rank order;
    * the merge PRODUCT is x + strip##(y). Stops early when no adjacent
    * pair remains or every remaining pair's count is 0 (cannot happen
    * with exact longs, spelled for shape parity with [[Bpe.train]]).
    */
  def train(df: DataFrame, textCol: String, nMerges: Int): Vector[(String, String)] =
    trainOnWordCounts(wordCountsOfCol(df, textCol), nMerges)

  /** [[train]] over a PRE-AGGREGATED (word, count) census — the
    * streaming trainer's serve step (e49, the e43 shape): the fold
    * accumulates exact per-word counts micro-batch by micro-batch
    * (order-free int64 sums), so training over the drained census is
    * merge-for-merge identical to [[train]] over the same corpus.
    * Columns: (__w string, f long).
    */
  def trainOnWordCounts(wordCounts: DataFrame,
                        nMerges: Int): Vector[(String, String)] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = wordCounts.sparkSession
    import spark.implicits._
    def adjacent(syms: Seq[String]): Iterator[(String, String)] =
      if (syms.length < 2) Iterator.empty
      else (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1)))
    var state: Dataset[(Seq[String], Long)] = wordCounts
      .as[(String, Long)]
      .map { case (w, f) => (wpSyms(w): Seq[String], f) }
      .localCheckpoint()
    val merges = Vector.newBuilder[(String, String)]
    var rounds = 0
    var exhausted = false
    while (rounds < nMerges && !exhausted) {
      val pairs = state
        .flatMap { case (syms, f) => adjacent(syms).map(p => (p._1, p._2, f)) }
        .toDF("x", "y", "f")
        .groupBy($"x", $"y").agg(sum($"f").as("cnt"))
      val symCnt = state
        .flatMap { case (syms, f) => syms.iterator.map(s => (s, f)) }
        .toDF("s", "f")
        .groupBy($"s").agg(sum($"f").as("c"))
      // score = cnt / (c_x · c_y), ONE division of exact-int doubles —
      // spelled identically in the oracle so ordering (ties included)
      // is bit-reproducible
      val best = pairs
        .join(symCnt.select($"s".as("x"), $"c".as("cx")), Seq("x"))
        .join(symCnt.select($"s".as("y"), $"c".as("cy")), Seq("y"))
        .withColumn("score",
          $"cnt".cast("double") / ($"cx".cast("double") * $"cy".cast("double")))
        .orderBy($"score".desc, $"x", $"y")
        .limit(1)
        .select($"x", $"y")
        .as[(String, String)]
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (x, y) = best.head
        merges += ((x, y))
        val merged = x + stripCont(y)
        state = state
          .map { case (syms, f) => (mergePass(syms.toVector, x, y, merged): Seq[String], f) }
          .localCheckpoint() // truncate per-round lineage (eager)
        rounds += 1
      }
    }
    merges.result()
  }

  /** The encoding vocabulary a trained model ships: the full [a-z]
    * alphabet in both word-initial and continuation form (the
    * segmentability floor for in-alphabet words) plus each merge's
    * product, first occurrence kept. Words with characters outside
    * the alphabet encode to [UNK] — the documented boundary.
    */
  def vocabOf(merges: Seq[(String, String)]): Vector[String] = {
    val base = ('a' to 'z').map(_.toString) ++ ('a' to 'z').map("##" + _)
    val products = merges.map { case (x, y) => x + stripCont(y) }
    (base ++ products).distinct.toVector
  }

  /** Deterministic piece→id table — the model-ready vocabulary:
    * [UNK] takes id 0 (the BERT convention), then the pieces in
    * [[vocabOf]] order (alphabet both forms, then merge products).
    * Lookup can never miss: every emitted token is a vocab piece or
    * [UNK].
    */
  def pieceIds(vocab: Seq[String]): Map[String, Int] =
    ((Unk +: vocab.toVector).distinct.zipWithIndex).toMap

  /** [[tokenizeDocs]] emitting integer token IDS — the artifact a
    * training run consumes: (idCol, n_wp_tokens, wp_ids) with ids
    * from [[pieceIds]] in token order. Same distinct-word memoized
    * shape; [UNK] carries id 0, so OOV words survive as trainable
    * positions rather than dropping.
    */
  def tokenizeToIds(df: DataFrame, idCol: String, textCol: String,
                    vocab: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vset = vocab.toSet
    val ids = pieceIds(vocab)
    val words = df.select(col(idCol),
        posexplode(split(col(textCol), " ", -1)).as(Seq("__pos", "__w")))
      .filter(col("__w") =!= "")
    val vocabIds = words.select(col("__w")).distinct().as[String]
      .map { w =>
        val t = encodeWord(w, vset).map(ids(_))
        (w, t, t.length.toLong)
      }
      .toDF("__w", "__ids", "__n")
    words.join(broadcast(vocabIds), Seq("__w"))
      .groupBy(col(idCol))
      .agg(
        sum(col("__n")).as("n_wp_tokens"),
        flatten(
          transform(
            array_sort(collect_list(struct(col("__pos"), col("__ids")))),
            s => s("__ids"))).as("wp_ids"))
  }

  // ------------------------------------------------------------ oracle

  private def requireInert(pieces: Seq[String]): Unit =
    require(pieces.forall(p =>
      p.nonEmpty && p.replaceFirst("^##", "").nonEmpty &&
        p.forall(c => (c >= 'a' && c <= 'z') || c == '#')),
      "oracle replay requires [a-z]+ pieces with an optional ## prefix")

  /** DuckDB spelling of [[tokenizeDocs]] over `src(id, text)`: per
    * DISTINCT word a recursive CTE advances (pos, toks) one longest
    * match at a time — `max_by(piece, len(piece))` over the vocabulary
    * rows whose surface equals the substr at pos (word-initial rows
    * must be bare, continuation rows `##`-prefixed) — and stops when
    * nothing matches; a word whose terminal pos short of len+1 is
    * `[UNK]`. Substr equality interpolates nothing, so any corpus text
    * is safe; the PIECES are still checked inert (they ride a VALUES
    * list).
    */
  def tokenizeSql(src: String, id: String, text: String,
                  vocab: Seq[String]): String = {
    requireInert(vocab)
    val vvals = vocab.map(p => s"('$p')").mkString(", ")
    s"""(WITH RECURSIVE
       |wpv(piece) AS (SELECT * FROM (VALUES $vvals) v(piece)),
       |wpw0 AS (SELECT $id AS __id, i - 1 AS __pos, t[i] AS __w
       |  FROM (SELECT $id, string_split($text, ' ') AS t FROM $src) d
       |  CROSS JOIN LATERAL unnest(generate_series(1, len(t))) AS u(i)
       |  WHERE t[i] <> ''),
       |wpvocab AS (SELECT DISTINCT __w AS word FROM wpw0),
       |wpstep(word, pos, toks) AS (
       |  SELECT word, 1, CAST('' AS VARCHAR) FROM wpvocab
       |  UNION ALL
       |  SELECT word,
       |    pos + CASE WHEN pos = 1 THEN len(p) ELSE len(p) - 2 END,
       |    toks || ' ' || p
       |  FROM (SELECT word, pos, toks,
       |          (SELECT max_by(piece, len(piece)) FROM wpv
       |           WHERE CASE WHEN s.pos = 1
       |             THEN piece NOT LIKE '##%'
       |               AND piece = substr(s.word, 1, len(piece))
       |             ELSE piece LIKE '##%'
       |               AND substr(piece, 3) = substr(s.word, s.pos, len(piece) - 2)
       |             END) AS p
       |        FROM wpstep s WHERE s.pos <= len(s.word)) t
       |  WHERE p IS NOT NULL),
       |wpfin AS (SELECT word, MAX(pos) AS mp, max_by(toks, pos) AS tk
       |  FROM wpstep GROUP BY word),
       |wptok AS (SELECT word,
       |    CASE WHEN mp = len(word) + 1 THEN trim(tk) ELSE '$Unk' END AS toks,
       |    CASE WHEN mp = len(word) + 1
       |      THEN CAST(len(string_split(trim(tk), ' ')) AS BIGINT)
       |      ELSE CAST(1 AS BIGINT) END AS n
       |  FROM wpfin)
       |SELECT w.__id AS $id,
       |  CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(f.n) AS BIGINT) AS n_wp_tokens,
       |  string_agg(f.toks, ' ' ORDER BY w.__pos) AS wp_text
       |FROM wpw0 w JOIN wptok f ON w.__w = f.word
       |GROUP BY w.__id)""".stripMargin
  }

  /** DuckDB replay of [[train]] over `src(text)`: the [[Bpe.learnSql]]
    * unrolled-stage machinery with the argmax re-ranked by the
    * WordPiece score — each stage censuses pairs AND symbols from the
    * previous state, scores `CAST(cnt AS DOUBLE) / (CAST(cx AS DOUBLE)
    * * CAST(cy AS DOUBLE))`, freezes `ORDER BY score DESC, x, y LIMIT
    * 1`, and advances with the recursive leftmost-replace until absent
    * (the product strips the continuation's ##). Emits (rank, x, y).
    * Every stage MATERIALIZED (the learnSql re-evaluation trap).
    */
  def learnSql(src: String, text: String, nMerges: Int): String = {
    require(nMerges >= 1 && nMerges <= 32,
      s"learnSql unrolls one stage per merge; keep nMerges in [1, 32], got $nMerges")
    val sb = new StringBuilder
    sb ++= s"""(WITH RECURSIVE
       | wpl0 AS MATERIALIZED (SELECT u.tk AS w, CAST(COUNT(*) AS BIGINT) AS f
       |   FROM (SELECT string_split($text, ' ') AS t FROM $src) d
       |   CROSS JOIN LATERAL unnest(t) AS u(tk)
       |   WHERE u.tk <> '' AND regexp_full_match(u.tk, '[a-z]+')
       |   GROUP BY u.tk),
       | wls0 AS MATERIALIZED (SELECT w, f,
       |   CASE WHEN len(w) = 1 THEN ' ' || w || ' '
       |        ELSE ' ' || substr(w, 1, 1) || ' ' ||
       |          trim(regexp_replace(substr(w, 2), '(.)', '##\\1 ', 'g')) || ' '
       |   END AS seq
       |   FROM wpl0)""".stripMargin
    for (k <- 1 to nMerges) {
      val prev = s"wls${k - 1}"
      sb ++= s""",
       | wlp$k AS MATERIALIZED (SELECT t[i] AS x, t[i+1] AS y,
       |     CAST(SUM(f) AS BIGINT) AS cnt
       |   FROM (SELECT f, string_split(trim(seq), ' ') AS t FROM $prev) z
       |   CROSS JOIN LATERAL unnest(generate_series(1, len(t) - 1)) AS u(i)
       |   GROUP BY 1, 2),
       | wlu$k AS MATERIALIZED (SELECT u.s AS s, CAST(SUM(f) AS BIGINT) AS c
       |   FROM (SELECT f, string_split(trim(seq), ' ') AS t FROM $prev) z
       |   CROSS JOIN LATERAL unnest(t) AS u(s)
       |   GROUP BY 1),
       | wlb$k AS MATERIALIZED (SELECT x, y,
       |     x || CASE WHEN y LIKE '##%' THEN substr(y, 3) ELSE y END AS m
       |   FROM (SELECT p.x, p.y,
       |       CAST(p.cnt AS DOUBLE) / (CAST(ux.c AS DOUBLE) * CAST(uy.c AS DOUBLE)) AS score
       |     FROM wlp$k p JOIN wlu$k ux ON ux.s = p.x JOIN wlu$k uy ON uy.s = p.y) q
       |   ORDER BY score DESC, x, y LIMIT 1),
       | wlr$k(w, f, seq) AS (
       |   SELECT w, f, seq FROM $prev
       |   UNION ALL
       |   SELECT r.w, r.f, regexp_replace(r.seq,
       |       ' ' || b.x || ' ' || b.y || ' ', ' ' || b.m || ' ')
       |   FROM wlr$k r, wlb$k b
       |   WHERE position(' ' || b.x || ' ' || b.y || ' ' IN r.seq) > 0),
       | wls$k AS MATERIALIZED (SELECT w, f, seq FROM wlr$k r
       |   WHERE NOT EXISTS (SELECT 1 FROM wlb$k b
       |     WHERE position(' ' || b.x || ' ' || b.y || ' ' IN r.seq) > 0))""".stripMargin
    }
    sb ++= (1 to nMerges)
      .map(k => s"SELECT CAST(${k - 1} AS BIGINT) AS rank, x, y FROM wlb$k")
      .mkString("\n ", "\n UNION ALL\n ", ")")
    sb.result()
  }

  /** End-of-document separator id for cross-doc sequence packing:
    * the first id past [[pieceIds]]'s dense range — derived from the
    * inventory so engine and oracle agree by construction (the
    * [[Bpe.sepId]]/[[Unigram.sepId]] convention).
    */
  def sepId(vocab: Seq[String]): Int = pieceIds(vocab).size

  /** DuckDB spelling of [[tokenizeToIds]]: the [[tokenizeSql]] replay
    * joined against the SAME id table ([[pieceIds]] emitted as a
    * VALUES list — no SQL-side re-derivation to drift); the join can
    * never miss ([UNK] is in the table).
    */
  def idsSql(src: String, id: String, text: String,
             vocab: Seq[String]): String = {
    val idVals = pieceIds(vocab).toSeq.sortBy(_._2)
      .map { case (p, i) => s"('${p.replace("'", "''")}', $i)" }
      .mkString(", ")
    s"""(WITH wpenc AS (SELECT $id, wp_text
       |  FROM ${tokenizeSql(src, id, text, vocab)} b),
       |wpidv(tok, tid) AS (SELECT * FROM (VALUES $idVals) x(tok, tid)),
       |wptks AS (SELECT $id, u.i, t[u.i] AS tok
       |  FROM (SELECT $id, string_split(wp_text, ' ') AS t FROM wpenc) s
       |  CROSS JOIN LATERAL unnest(generate_series(1, len(t))) AS u(i))
       |SELECT $id, CAST(COUNT(*) AS BIGINT) AS n_wp_tokens,
       |  string_agg(CAST(tid AS VARCHAR), ',' ORDER BY i) AS wp_ids
       |FROM wptks JOIN wpidv v ON wptks.tok = v.tok
       |GROUP BY $id)""".stripMargin
  }

  /** The frozen WordPiece vocabulary the tk33 gate runs under:
    * [[vocabOf]] of [[train]] over `documents` at sf0.01 with
    * nMerges = 24, frozen as a literal (the [[Bpe.FrozenMerges]]
    * discipline) so the gate is a pure deterministic replay at every
    * sf — the oracle embeds the same pieces as a VALUES list.
    * WordPieceSpec re-derives this from the live trainer and fails
    * loudly if the fixture or trainer drifts.
    */
  val FrozenWpMerges: Vector[(String, String)] = Vector(
    ("q", "##u"), ("l", "##i"), ("w", "##i"), ("li", "##n"),
    ("wi", "##n"), ("win", "##d"), ("f", "##i"), ("b", "##i"),
    ("##i", "##n"), ("bi", "##g"), ("a", "##g"), ("ag", "##g"),
    ("t", "##h"), ("##s", "##h"), ("##c", "##h"), ("##b", "##l"),
    ("fi", "##l"), ("##u", "##s"), ("c", "##us"), ("##u", "##p"),
    ("##l", "##u"), ("s", "##p"), ("##lu", "##m"), ("##lum", "##n"))

  lazy val FrozenVocab: Vector[String] = vocabOf(FrozenWpMerges)
}

package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sharded inverted-index export — the artifact a retrieval system
  * loads: term-partitioned posting lists with document-frequency
  * metadata. This is the materialized form of the term-keyed layout
  * the t7 (TF-IDF) and t13 (BM25) scorers already compute on the fly;
  * exporting it closes the retrieval stack's loop (score online, or
  * ship the index and serve lookups offline). Mirrors tk6's export
  * discipline: a `queries` gate pins every emitted cell, the bench
  * entry times the full corpus build.
  *
  * Output, one row per (term, block):
  * `(shard INT, term STRING, df BIGINT, block BIGINT,
  *   block_df BIGINT, postings STRING)`
  *  - `shard`   — md5-prefix hash of the term mod `nShards`
  *    (`conv(substring(md5(term),1,8),16,10) % n` — the repo's
  *    engine/DuckDB-shared hash convention, Sampling.scala:112), so a
  *    serving tier can route a query term to its shard file without a
  *    catalog.
  *  - `df`      — total documents containing the term (the BM25/IDF
  *    metadata a scorer needs before touching postings).
  *  - `block`   — posting lists are CHUNKED at `blockSize` entries:
  *    block k holds the (k·B+1)-th..((k+1)·B)-th postings in doc_id
  *    order. At 100 TB a stopword's posting list is millions of docs;
  *    block rows bound every output cell (and every downstream
  *    consumer's row size) at B entries, and doc_id-ordered blocks are
  *    exactly the skip-list granularity a WAND/MaxScore scorer seeks
  *    over. No row ever carries an unbounded list.
  *  - `postings` — `"doc:tf"` comma-joined in doc_id order (the a15
  *    string convention — the oracle harness cannot hash ARRAY cells;
  *    a real consumer splits on ',' / ':' losslessly since both ids
  *    and tfs are integers).
  *
  * Scale shape: two shuffles total — one on (doc, term) for the tf
  * partial agg, one on term for the df/row-number window; the
  * (term, block) grouping reuses the term partitioning (hash
  * clustering on a key subset satisfies the agg's distribution, so no
  * third exchange — pinned by InvertedIndexSpec's plan audit). The
  * corpus is never collected; skew on stopword terms is bounded by
  * the sort-based window (streaming within one term's partition run)
  * and the block cap on output cells.
  */
object InvertedIndex {

  def postingsExport(docs: DataFrame, idCol: String, textCol: String,
                     nShards: Int = 8, blockSize: Int = 16): DataFrame =
    rebuildBlocks(termFreqs(docs, idCol, textCol), nShards, blockSize)

  /** (doc_id, term, tf) rows — the shared head of every index build. */
  private def termFreqs(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(split(col(textCol), " ", -1)).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** DuckDB spelling of [[postingsExport]] over `src(id, text)` — the
    * ii1 oracle. Same md5-prefix shard hash
    * (`('0x' || substr(md5(term),1,8))::UBIGINT % n`, the
    * AuditCatalog:313 convention), same (rn−1)//B block cut, same
    * doc-ordered `string_agg`. Every emitted column lands in a safe
    * output type (BIGINT/INT/VARCHAR) per the r12 dtype lint — the
    * window COUNT and `//` both produce BIGINT, and the UBIGINT hash
    * is CAST at the emission boundary.
    */
  def postingsSql(src: String, id: String, text: String,
                  nShards: Int = 8, blockSize: Int = 16): String =
    s"""(WITH tok AS (SELECT $id AS doc_id, string_split($text, ' ') AS t FROM $src),
       |uni AS (SELECT doc_id, u.tk FROM tok
       |  CROSS JOIN LATERAL unnest(t) AS u(tk) WHERE u.tk <> ''),
       |tf AS (SELECT doc_id, tk AS term, COUNT(*) AS tf
       |  FROM uni GROUP BY doc_id, tk),
       |r AS (SELECT doc_id, term, tf,
       |    COUNT(*) OVER (PARTITION BY term) AS df,
       |    ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn
       |  FROM tf)
       |SELECT
       |  CAST(('0x' || substr(md5(term), 1, 8))::UBIGINT % $nShards AS INT)
       |    AS shard,
       |  term, CAST(MAX(df) AS BIGINT) AS df,
       |  CAST((rn - 1) // $blockSize AS BIGINT) AS block,
       |  CAST(COUNT(*) AS BIGINT) AS block_df,
       |  string_agg(CAST(doc_id AS VARCHAR) || ':' || CAST(tf AS VARCHAR),
       |    ',' ORDER BY doc_id) AS postings
       |FROM r
       |GROUP BY term, (rn - 1) // $blockSize)""".stripMargin

  /** Doc-length sidecar — the metadata a BM25 serving tier ships next
    * to the postings shards: one (doc_id, dl) row per document with
    * ≥1 token, dl = exact token count (identical to the scorers' dl =
    * SUM(tf)). Corpus-keyed partial-agg; tokenless docs drop, matching
    * the dl CTE's join semantics on the oracle side.
    */
  def docLengths(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(split(col(textCol), " ", -1)).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dl"))

  /** Serve a top-k query FROM the exported artifact: posting lookups +
    * the t13 BM25 tree, proving the index + doc-length sidecar carry
    * everything the online scorer computes — the ii2 gate pins
    * index-served == corpus-computed ranking exactly.
    *
    * Scoring contract is t13's verbatim: idf quantized once with the
    * nudged floor, then a pure IEEE tree on exact operands (tf/df from
    * the index, dl from the sidecar, n_docs/avgdl one broadcast stats
    * row); per-term scores ship as int64 `bm25_q` units and the doc
    * total is an EXACT int64 sum, so the (score DESC, doc_id) ranking
    * is deterministic — no float ties anywhere.
    *
    * Scale shape: the term filter prunes to the query terms' postings
    * BEFORE anything joins (on a shard-partitioned layout that is a
    * shard+term partition prune — O(query) postings read, not
    * O(index)); the parsed postings join doc lengths on doc_id and the
    * 1-row stats ride a broadcast cross join; final top-k is a
    * TakeOrdered over per-doc totals.
    */
  def queryTopK(index: DataFrame, docLens: DataFrame,
                queryTerms: Seq[String], k: Int,
                k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    val postings = parsePostings(
      index.filter(col("term").isin(queryTerms: _*)))
    rankTopK(scoreDocs(postings, docLens, k1, b), k)
  }

  /** `"doc:tf"` posting cells back to relational rows. Keeps every
    * input column except `postings`, so block metadata survives when
    * the caller needs it (the pruned path).
    */
  private def parsePostings(index: DataFrame): DataFrame =
    index
      .withColumn("p", explode(split(col("postings"), ",")))
      .drop("postings")
      .withColumn("doc_id", split(col("p"), ":")(0).cast("long"))
      .withColumn("tf", split(col("p"), ":")(1).cast("long"))
      .drop("p")

  /** The t13 per-posting score in int64 `bm25_q` units, per input row.
    * Exact operands (tf/df from the index, dl from the sidecar,
    * n_docs/avgdl one broadcast stats row), nudged-floor idf, pure
    * IEEE tree — identical to [[TextAnalysis.bm25]]'s.
    */
  private def postingScores(postings: DataFrame, docLens: DataFrame,
                            k1: Double, b: Double): DataFrame = {
    val stats = docLens.agg(count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val idfQ = floor(
      log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
        + lit(1.0)) * lit(1e6) + lit(1e-4))
    val raw = idfQ.cast("double") / lit(1e6) *
      (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b)
        + lit(b) * col("dl") / col("avgdl")))
    postings
      .join(docLens, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("bm25_q",
        floor(raw * lit(1e6) + lit(1e-4)).cast("long"))
      .drop("dl", "n_docs", "avgdl")
  }

  private def scoreDocs(postings: DataFrame, docLens: DataFrame,
                        k1: Double, b: Double): DataFrame =
    postingScores(postings, docLens, k1, b)
      .groupBy(col("doc_id"))
      .agg(sum(col("bm25_q")).as("score_q"))

  // TakeOrderedAndProject does the global top-k (per-partition heap,
  // k rows to the driver-side merge); the rank window then runs over
  // only those k survivors, so the unpartitioned window is bounded
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored
      .orderBy(col("score_q").desc, col("doc_id")).limit(k)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("score_q").desc, col("doc_id"))))
      .select(col("rn").cast("long").as("rn"), col("doc_id"),
        col("score_q"))

  /** Incremental postings maintenance: fold `newDocs` into an existing
    * [[postingsExport]] artifact with O(new + affected-term postings)
    * work — the index-lifecycle operator that makes the export a
    * maintainable store rather than a one-shot dump (same discipline
    * as the IVF-PQ `appendToIndex`: touch only what changed).
    *
    *  - UNTOUCHED terms (no posting in `newDocs`): their blocked rows
    *    pass through VERBATIM — no parse, no shuffle participation
    *    beyond the affected-term anti-join probe (pinned by the spec's
    *    poisoned-cell arm).
    *  - AFFECTED terms: old postings parse back to rows, union the new
    *    docs' (doc, term, tf) rows, and df/rn/block recompute for just
    *    those terms — block cuts depend on doc_id rank, so an
    *    interleaved-id append legitimately recuts the whole term.
    *
    * Precondition (append-only contract): `newDocs` doc_ids are
    * disjoint from the indexed corpus — same-id re-ingest must go
    * through [[indexRemove]] first.
    */
  def indexAppend(index: DataFrame, newDocs: DataFrame,
                  idCol: String, textCol: String,
                  nShards: Int = 8, blockSize: Int = 16): DataFrame = {
    val newTf = termFreqs(newDocs, idCol, textCol)
    // NO broadcast hint on the affected-term joins: `affected` is the
    // incoming batch's distinct vocabulary — a large append makes it
    // vocabulary-scale, past any safe broadcast budget (the repo-wide
    // "vocabulary is never broadcast" discipline). AQE picks broadcast
    // on its own when the batch is small; hinting would force it always.
    val affected = newTf.select(col("term")).distinct()
    val untouched = index.join(affected, Seq("term"), "left_anti")
    val oldRows = parsePostings(
        index.join(affected, Seq("term"), "left_semi"))
      .select(col("doc_id"), col("term"), col("tf"))
    rebuildBlocks(oldRows.unionByName(newTf), nShards, blockSize)
      .unionByName(untouched.select(untouched.columns.map(col): _*))
  }

  /** Remove documents from a [[postingsExport]] artifact with
    * O(removed + affected-term postings) work. `removedDocs` must
    * carry the removed documents' (id, text) — the forward record a
    * store keeps precisely so deletion knows which terms to touch
    * without scanning every posting list. Terms whose postings become
    * empty disappear; untouched terms pass through verbatim.
    */
  def indexRemove(index: DataFrame, removedDocs: DataFrame,
                  idCol: String, textCol: String,
                  nShards: Int = 8, blockSize: Int = 16): DataFrame = {
    val removedTerms = removedDocs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(split(col(textCol), " ", -1)).as("term"))
      .filter(col("term") =!= "")
    // same no-hint discipline as indexAppend: a bulk delete's distinct
    // term/id sets are corpus-scale — let AQE choose the strategy
    val affected = removedTerms.select(col("term")).distinct()
    val removedIds = removedTerms.select(col("doc_id")).distinct()
    val untouched = index.join(affected, Seq("term"), "left_anti")
    val surviving = parsePostings(
        index.join(affected, Seq("term"), "left_semi"))
      .join(removedIds, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("term"), col("tf"))
    rebuildBlocks(surviving, nShards, blockSize)
      .unionByName(untouched.select(untouched.columns.map(col): _*))
  }

  /** Compaction / re-layout from the INDEX ALONE — no forward corpus:
    * parse every blocked cell back to (doc_id, term, tf) rows and
    * re-derive df/rn/block/shard under the TARGET parameters through
    * the shared [[rebuildBlocks]] tail. The lifecycle operator for
    * serving-layout changes (resize blocks to a new scorer's skip
    * granularity, re-shard for a different serving fleet) and for
    * certifying store health after append/remove churn — compaction
    * must equal a fresh full-corpus build at the target layout, which
    * is exactly what the ii12 gate holds it to. Cost: one full index
    * parse + the standard two-shuffle rebuild — O(index), the
    * unavoidable floor for a global re-block; routine maintenance
    * stays on the O(affected) [[indexAppend]]/[[indexRemove]] path and
    * compacts only when the layout itself changes.
    */
  def compact(index: DataFrame, nShards: Int = 8,
              blockSize: Int = 16): DataFrame = {
    // fail FAST on a foreign cell format: a positionalExport artifact
    // has the identical column set but 'doc:p1;p2' cells — parsing it
    // as 'doc:tf' would silently produce a structurally valid index
    // with garbled tf values (r14 review). Positional artifacts
    // recompact from the corpus via positionalExport.
    val guarded = index.withColumn("postings",
      when(col("postings").contains(";"),
        raise_error(concat(
          lit("compact: positional postings cell ('doc:p1;p2') for term '"),
          col("term"),
          lit("' — compact serves doc:tf artifacts; rebuild positional " +
            "artifacts via positionalExport"))).cast("string"))
        .otherwise(col("postings")))
    val parsed = parsePostings(guarded)
      .select(col("doc_id"), col("term"),
        // a cell that parses to a null tf is malformed — refuse to
        // emit a plausible-looking index from it
        when(col("tf").isNotNull, col("tf"))
          .otherwise(raise_error(lit(
            "compact: malformed postings cell (null tf)")).cast("long"))
          .as("tf"))
    rebuildBlocks(parsed, nShards, blockSize)
  }

  /** df/rn/block/shard re-derivation over bare (doc_id, term, tf)
    * rows — the shared tail of [[postingsExport]] and the incremental
    * maintainers (single source of truth for the artifact layout).
    */
  private def rebuildBlocks(tf: DataFrame, nShards: Int,
                            blockSize: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    require(blockSize >= 1, s"blockSize must be >= 1, got $blockSize")
    val byTerm = Window.partitionBy(col("term"))
    val ranked = tf
      .withColumn("df", count(lit(1)).over(byTerm))
      .withColumn("rn", row_number().over(byTerm.orderBy(col("doc_id"))))
      // rn ≤ df ≤ n_docs < 2^52: the double division is exact
      .withColumn("block",
        floor((col("rn") - 1) / lit(blockSize)).cast("long"))
    ranked
      .groupBy(col("term"), col("block"))
      .agg(
        max(col("df")).as("df"), // constant within a term
        count(lit(1)).as("block_df"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("doc_id"), col("tf")))),
            s => concat(s("doc_id").cast("string"), lit(":"),
              s("tf").cast("string"))),
          ",").as("postings"))
      .select(
        (conv(substring(md5(col("term")), 1, 8), 16, 10).cast("long")
          % nShards).cast("int").as("shard"),
        col("term"), col("df"), col("block"), col("block_df"),
        col("postings"))
  }

  /** Positional postings export — [[postingsExport]] with in-document
    * token positions carried per posting, the artifact phrase and
    * proximity queries are served from. Cell format (a15 strings):
    * `postings` = `"doc:p1;p2,doc2:p5"` — doc_id-ordered entries, each
    * `doc:` followed by that document's ascending 0-based token
    * positions ';'-joined. Positions are indices into the raw
    * space-split token array (empty tokens from doubled spaces are
    * dropped but KEEP their original indices, so adjacency never spans
    * a dropped empty — the oracle replays the same convention).
    * Same sharding/blocking/shuffle shape as [[postingsExport]]: a
    * posting's position list is bounded by its document's length, so
    * the blocked rows stay bounded; two shuffles total.
    */
  def positionalExport(docs: DataFrame, idCol: String, textCol: String,
                       nShards: Int = 8, blockSize: Int = 16): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    require(blockSize >= 1, s"blockSize must be >= 1, got $blockSize")
    val pt = docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(col(textCol), " ", -1)).as(Seq("pos", "term")))
      .filter(col("term") =!= "")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"),
        array_join(array_sort(collect_list(col("pos"))), ";").as("ps"))
    val byTerm = Window.partitionBy(col("term"))
    val ranked = pt
      .withColumn("df", count(lit(1)).over(byTerm))
      .withColumn("rn", row_number().over(byTerm.orderBy(col("doc_id"))))
      .withColumn("block",
        floor((col("rn") - 1) / lit(blockSize)).cast("long"))
    ranked
      .groupBy(col("term"), col("block"))
      .agg(
        max(col("df")).as("df"),
        count(lit(1)).as("block_df"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("doc_id"), col("ps")))),
            s => concat(s("doc_id").cast("string"), lit(":"), s("ps"))),
          ",").as("postings"))
      .select(
        (conv(substring(md5(col("term")), 1, 8), 16, 10).cast("long")
          % nShards).cast("int").as("shard"),
        col("term"), col("df"), col("block"), col("block_df"),
        col("postings"))
  }

  /** DuckDB spelling of [[positionalExport]] — the ii4 oracle. Same
    * CTE chain as [[postingsSql]] with 0-based positions from
    * generate_series carried through an ordered string_agg.
    */
  def positionalSql(src: String, id: String, text: String,
                    nShards: Int = 8, blockSize: Int = 16): String =
    s"""(WITH tok AS (SELECT $id AS doc_id, string_split($text, ' ') AS t FROM $src),
       |uni AS (SELECT doc_id, t[u.i] AS tk, u.i - 1 AS pos FROM tok
       |  CROSS JOIN LATERAL unnest(generate_series(1, len(t))) AS u(i)
       |  WHERE t[u.i] <> ''),
       |pt AS (SELECT doc_id, tk AS term,
       |    string_agg(CAST(pos AS VARCHAR), ';' ORDER BY pos) AS ps
       |  FROM uni GROUP BY doc_id, tk),
       |r AS (SELECT doc_id, term, ps,
       |    COUNT(*) OVER (PARTITION BY term) AS df,
       |    ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn
       |  FROM pt)
       |SELECT
       |  CAST(('0x' || substr(md5(term), 1, 8))::UBIGINT % $nShards AS INT)
       |    AS shard,
       |  term, CAST(MAX(df) AS BIGINT) AS df,
       |  CAST((rn - 1) // $blockSize AS BIGINT) AS block,
       |  CAST(COUNT(*) AS BIGINT) AS block_df,
       |  string_agg(CAST(doc_id AS VARCHAR) || ':' || ps,
       |    ',' ORDER BY doc_id) AS postings
       |FROM r
       |GROUP BY term, (rn - 1) // $blockSize)""".stripMargin

  /** Phrase match served FROM the positional artifact: documents
    * containing `phrase` as consecutive tokens, with the exact
    * occurrence count (overlapping occurrences included — the count is
    * positional, not substring-replace). For each phrase slot j, a
    * position p of `phrase(j)` votes for anchor `p - j`; an anchor
    * with all L distinct slots present is one occurrence.
    *
    * Scale shape: the term filter prunes to the phrase's posting
    * blocks before any parse (O(phrase postings) read); the phrase
    * slot table is a broadcast L-row join; the anchor vote agg is one
    * (doc, anchor)-keyed shuffle whose input is already pruned to the
    * phrase terms' postings. Output `(doc_id, n_matches)`.
    */
  def phraseMatch(index: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val spark = index.sparkSession
    import spark.implicits._
    val L = phrase.length
    val slots = phrase.zipWithIndex
      .map { case (t, j) => (t, j.toLong) }.toDF("term", "slot")
    val positions = parsePositional(
        index.filter(col("term").isin(phrase.distinct: _*)))
    positions
      .join(broadcast(slots), Seq("term"))
      .select(col("doc_id"), (col("pos") - col("slot")).as("anchor"),
        col("slot"))
      .groupBy(col("doc_id"), col("anchor"))
      .agg(countDistinct(col("slot")).as("n_slots"))
      .filter(col("n_slots") === L)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"))
  }

  /** Positional `"doc:p1;p2,…"` cells back to (term, doc_id, pos)
    * rows; keeps every other input column.
    */
  private def parsePositional(index: DataFrame): DataFrame =
    index
      .withColumn("p", explode(split(col("postings"), ",")))
      .drop("postings")
      .withColumn("doc_id", split(col("p"), ":")(0).cast("long"))
      .withColumn("pos_s", explode(split(split(col("p"), ":")(1), ";")))
      .withColumn("pos", col("pos_s").cast("long"))
      .drop("p", "pos_s")

  /** Block-max sidecar — per (term, block), the exact maximum
    * per-posting `bm25_q` inside the block, precomputed at index-build
    * time against the SAME `docLens` the scorer will use (the classic
    * block-max metadata of Ding & Suel's Block-Max WAND, reshaped for
    * a relational engine). One term-keyed shuffle over the parsed
    * postings; output is one row per index block, so the sidecar is
    * ~1/blockSize the index's row count and joins back on the index's
    * own (term, block) key.
    */
  def blockMax(index: DataFrame, docLens: DataFrame,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    postingScores(parsePostings(index), docLens, k1, b)
      .groupBy(col("term"), col("block"))
      .agg(max(col("bm25_q")).as("block_max_q"))

  /** Lossless block-max-pruned top-k — the same ranking as
    * [[queryTopK]] (bit-identical scores), reached without running the
    * expensive scoring path over every matching document:
    *
    *  1. UPPER BOUNDS: each doc's `ub_q` = Σ over its matched query
    *     terms of the containing block's `block_max_q` — integer sums
    *     of precomputed sidecar values, no dl join, no float tree.
    *     `ub_q ≥ score_q` always (each posting's score ≤ its block
    *     max), which is the pruning invariant.
    *  2. THRESHOLD: exact-score only the top-k docs BY upper bound
    *     (bounded k-id collect, the annQueryIds idiom) — the k-th best
    *     of those true scores is a certified lower bound T on the
    *     final top-k admission score.
    *  3. PRUNE + FINISH: docs with `ub_q < T` cannot reach the top-k
    *     (score ≤ ub < T); the dl join + IEEE tree run only over the
    *     survivors, then the usual TakeOrdered rank.
    *
    * Scale shape: the posting parse and the integer UB agg still read
    * O(query postings) — what the pruning removes is the doc-keyed
    * join against the corpus-size dl sidecar and the scoring tree,
    * which now touch only candidates (on a stopword-heavy query that
    * is the dominant cost). `blockMaxDf` must be built against the
    * same `docLens` (and k1/b) passed here, or UB ≥ score breaks —
    * [[blockMax]]'s contract.
    */
  def queryTopKPruned(index: DataFrame, blockMaxDf: DataFrame,
                      docLens: DataFrame, queryTerms: Seq[String], k: Int,
                      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    val parsed = parsePostings(
        index.filter(col("term").isin(queryTerms: _*)))
      .localCheckpoint() // parsed once, read by UB + seed + final paths
    val ub = parsed
      .join(broadcast(
        blockMaxDf.filter(col("term").isin(queryTerms: _*))),
        Seq("term", "block"))
      .groupBy(col("doc_id"))
      .agg(sum(col("block_max_q")).as("ub_q"))
    val seedIds = ub.orderBy(col("ub_q").desc, col("doc_id")).limit(k)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    if (seedIds.isEmpty) return rankTopK(
      scoreDocs(parsed, docLens, k1, b), k)
    val seedScores = scoreDocs(
        parsed.filter(col("doc_id").isin(seedIds: _*)), docLens, k1, b)
      .select(col("score_q")).collect().map(_.getLong(0))
    // fewer than k matched docs ⇒ nothing can be pruned away safely
    val threshold =
      if (seedScores.length < k) Long.MinValue else seedScores.min
    // no forced broadcast: candidates degrade to corpus-scale on a
    // no-prune query, and AQE picks the broadcast itself when small
    val candidates = ub.filter(col("ub_q") >= threshold)
      .select(col("doc_id"))
    rankTopK(
      scoreDocs(parsed.join(candidates, Seq("doc_id"), "left_semi"),
        docLens, k1, b), k)
  }

  /** Compressed postings export — [[postingsExport]]'s artifact with
    * the posting cell in the wire format real indexes ship: d-gap
    * deltas (first gap in a block is the absolute doc_id, so every
    * block is a self-contained seek target) interleaved with tfs, each
    * value unsigned-LEB128 varint-packed, the byte stream emitted as a
    * lowercase-hex cell (`postings_hex`). ~4× smaller than the decimal
    * `"doc:tf"` cells — at 100 TB the artifact's size is the serving
    * tier's working set, so the format is a first-class concern.
    *
    * Same two-shuffle shape as [[postingsExport]]: the gap lag window
    * shares the df/rn window's (term, doc_id-ordered) partitioning, and
    * the (term, block) agg reuses the term partitioning. The per-cell
    * byte loop runs in [[VarintPackHex]] — whole-stage codegen, not an
    * interpreted HOF (the flatten/transform here only assembles the
    * bounded ≤2·blockSize long array the expression consumes).
    */
  def compressedExport(docs: DataFrame, idCol: String, textCol: String,
                       nShards: Int = 8, blockSize: Int = 16): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    require(blockSize >= 1, s"blockSize must be >= 1, got $blockSize")
    val byTerm = Window.partitionBy(col("term"))
    val ordered = byTerm.orderBy(col("doc_id"))
    val ranked = termFreqs(docs, idCol, textCol)
      .withColumn("df", count(lit(1)).over(byTerm))
      .withColumn("rn", row_number().over(ordered))
      .withColumn("block",
        floor((col("rn") - 1) / lit(blockSize)).cast("long"))
      .withColumn("gap",
        when(pmod(col("rn") - lit(1), lit(blockSize)) === 0, col("doc_id"))
          .otherwise(col("doc_id") - lag(col("doc_id"), 1).over(ordered)))
    ranked
      .groupBy(col("term"), col("block"))
      .agg(
        max(col("df")).as("df"),
        count(lit(1)).as("block_df"),
        Varint.varint_pack_hex(
          flatten(transform(
            array_sort(collect_list(
              struct(col("doc_id"), col("gap"), col("tf")))),
            s => array(s("gap").cast("long"), s("tf")))))
          .as("postings_hex"))
      .select(
        (conv(substring(md5(col("term")), 1, 8), 16, 10).cast("long")
          % nShards).cast("int").as("shard"),
        col("term"), col("df"), col("block"), col("block_df"),
        col("postings_hex"))
  }

  /** Inverse of [[compressedExport]]: hex cells decode back to the
    * exact [[postingsExport]] artifact (`"doc:tf"` cells) — a pure
    * per-row map, zero shuffles, so every existing server ([[queryTopK]],
    * [[blockMax]], the maintainers) composes with the compressed
    * artifact for free. The ii9 gate holds this roundtrip to ii1's own
    * independent SQL oracle — losslessness, byte for byte.
    */
  def decompressIndex(cidx: DataFrame): DataFrame =
    cidx.select(
      col("shard"), col("term"), col("df"), col("block"),
      col("block_df"),
      array_join(
        transform(Varint.varint_postings_decode(col("postings_hex")),
          s => concat(s("doc_id").cast("string"), lit(":"),
            s("tf").cast("string"))),
        ",").as("postings"))

  /** Impact-quantized index (Anh & Moffat's impact ordering, with this
    * repo's exact-integer twist): each posting carries its PRECOMPUTED
    * final int64 `bm25_q` impact instead of a raw tf — cell format
    * `"doc:impact"`. Serving then needs NO doc-length join, NO stats
    * row, and NO float tree: a query's score is a pure integer sum of
    * impact cells ([[queryTopKImpacts]]), turning serve-time cost from
    * (postings join corpus-size sidecar + IEEE arithmetic) into
    * (filter + integer adds) — at 100 TB the dl sidecar is billions of
    * rows, so baking it out of the query path is the difference
    * between a lookup and a join.
    *
    * The trade the real systems make, stated here as the contract:
    * corpus stats (n_docs, avgdl, df) are FROZEN at build time — an
    * appended document changes every impact in principle, so impact
    * indexes rebuild on stats drift rather than maintain incrementally
    * (use [[postingsExport]] + [[indexAppend]] when maintenance
    * matters more than serve cost). Impacts are the SAME int64 units
    * t13 / [[queryTopK]] compute, so the served ranking is
    * bit-identical to the online scorer's — the ii10 gate holds it to
    * ii2's own corpus-side oracle.
    *
    * Build shape: tf agg, doc-keyed dl agg, doc-keyed join + term
    * window — one extra doc-keyed shuffle vs [[postingsExport]], paid
    * once at build time to delete the per-query join forever.
    */
  def impactExport(docs: DataFrame, idCol: String, textCol: String,
                   nShards: Int = 8, blockSize: Int = 16,
                   k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    require(blockSize >= 1, s"blockSize must be >= 1, got $blockSize")
    val tf = termFreqs(docs, idCol, textCol)
    val dls = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val byTerm = Window.partitionBy(col("term"))
    val scored = postingScores(
      tf.withColumn("df", count(lit(1)).over(byTerm)), dls, k1, b)
    val ranked = scored
      .withColumn("rn", row_number().over(byTerm.orderBy(col("doc_id"))))
      .withColumn("block",
        floor((col("rn") - 1) / lit(blockSize)).cast("long"))
    ranked
      .groupBy(col("term"), col("block"))
      .agg(
        max(col("df")).as("df"),
        count(lit(1)).as("block_df"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("doc_id"), col("bm25_q")))),
            s => concat(s("doc_id").cast("string"), lit(":"),
              s("bm25_q").cast("string"))),
          ",").as("postings"))
      .select(
        (conv(substring(md5(col("term")), 1, 8), 16, 10).cast("long")
          % nShards).cast("int").as("shard"),
        col("term"), col("df"), col("block"), col("block_df"),
        col("postings"))
  }

  /** Top-k FROM the impact artifact: term filter → parse → one integer
    * sum per doc → TakeOrdered. No dl join, no stats, no float — the
    * serve path an impact index buys. Ranking is bit-identical to
    * [[queryTopK]] over the plain artifact (same frozen int64 units).
    */
  def queryTopKImpacts(impactIdx: DataFrame, queryTerms: Seq[String],
                       k: Int): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    val parsed = parsePostings(
      impactIdx.filter(col("term").isin(queryTerms: _*)))
    rankTopK(
      parsed.groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("score_q")), // tf slot carries impact_q
      k)
  }

  /** Batch retrieval — a TABLE of queries served in ONE plan, the
    * Spark-native serving shape: where an online tier loops per query,
    * a relational engine scores the whole workload at once, and a
    * posting is scored ONCE however many queries share its term (the
    * query fan-out joins AFTER the per-posting score). `queries` is
    * (query_id, term) rows; duplicate terms within a query are
    * deduped, matching [[queryTopK]]'s isin semantics.
    *
    * Scale shape: the postings prune is a broadcast semi-join on the
    * queries' distinct terms (the batch analogue of the isin filter —
    * O(workload postings) read, not O(index)); scoring is the t13
    * tree once per surviving posting; the query fan-out is a second
    * broadcast join; per-query top-k is the rank window the
    * TopKWindowToAggregate rule turns into a bounded aggregate.
    * Ranking per query is bit-identical to [[queryTopK]].
    */
  def queryTopKBatch(index: DataFrame, docLens: DataFrame,
                     queries: DataFrame, k: Int,
                     k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val q = queries.select(col("query_id"), col("term")).distinct()
    val postings = parsePostings(
      index.join(broadcast(q.select(col("term")).distinct()),
        Seq("term"), "left_semi"))
    postingScores(postings, docLens, k1, b)
      .join(broadcast(q), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("bm25_q")).as("score_q"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score_q").desc, col("doc_id"))))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn").cast("long").as("rn"),
        col("doc_id"), col("score_q"))
  }

  /** "More like this" — sparse lexical doc→doc similarity through the
    * term space (Lucene's MLT / the sparse-retrieval complement to the
    * dense ANN stack): for each query document, the top-k other
    * documents by an EXACT-INTEGER tf·idf² dot product,
    * `score = Σ_t tf_q(t)·tf_d(t)·idf2_q(t)` with
    * `idf2_q = (idf_q·idf_q) div 1e6` — pure integer arithmetic end to
    * end (idf_q is t13's nudged-floor micro-nat unit), so ranking has
    * no float ties and the oracle replays it digit-for-digit.
    *
    * The scale lever is the RELATIVE df cap (`df·dfCapRatio ≤ n_docs`,
    * an integer comparison): join fan-out through a term is df_q·df(t),
    * so stopwordy terms dominate cost while contributing the least
    * idf² signal — MLT's classic "interesting terms" prune, stated as
    * part of the semantics (the oracle applies the same cap). With the
    * cap, a query doc's candidate count is bounded by
    * Σ_{t ∈ doc, df≤n/ratio} df(t) — never corpus².
    *
    * Shape: one term-keyed shuffle for df/weights, the query side
    * prunes to `queryIds`' rows (broadcast-size by construction), one
    * term equi-join against the corpus tf rows, a (query, doc) partial
    * agg, and a per-query top-k window (the TopKWindowToAggregate rule
    * turns rank≤k into a bounded aggregate).
    */
  def moreLikeThis(docs: DataFrame, idCol: String, textCol: String,
                   queryIds: Seq[Long], k: Int,
                   dfCapRatio: Int = 5): DataFrame = {
    require(queryIds.nonEmpty, "queryIds must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    require(dfCapRatio >= 1, s"dfCapRatio must be >= 1, got $dfCapRatio")
    val tf = termFreqs(docs, idCol, textCol)
    val stats = tf.select(col("doc_id")).distinct()
      .agg(count(lit(1)).as("n_docs"))
    val weights = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .filter(col("df") * dfCapRatio <= col("n_docs"))
      .withColumn("idf_q", floor(
        log((col("n_docs") - col("df") + lit(0.5))
          / (col("df") + lit(0.5)) + lit(1.0)) * lit(1e6) + lit(1e-4))
        .cast("long"))
      .select(col("term"),
        expr("(idf_q * idf_q) DIV 1000000").as("idf2_q"))
    val q = tf.filter(col("doc_id").isin(queryIds: _*))
      .select(col("doc_id").as("query_id"), col("term"),
        col("tf").as("tf_q"))
      .join(weights, Seq("term"))
    q.join(tf.select(col("term"), col("doc_id"), col("tf").as("tf_d")),
        Seq("term"))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("tf_q") * col("tf_d") * col("idf2_q")).as("score_q"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score_q").desc, col("doc_id"))))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn").cast("long").as("rn"),
        col("doc_id"), col("score_q"))
  }

  /** One LEB128 value as DuckDB hex — little-endian 7-bit groups,
    * continuation high bit, ≤5 bytes (values < 2^35; doc_ids and gaps
    * are far below that at any fixture sf). Generated as a single line
    * so stripMargin interpolation never sees a line-leading '|'.
    */
  private def varintHexSql(v: String): String = {
    val nb = s"(CASE WHEN $v < 128 THEN 1 WHEN $v < 16384 THEN 2" +
      s" WHEN $v < 2097152 THEN 3 WHEN $v < 268435456 THEN 4 ELSE 5 END)"
    (0 until 5).map { i =>
      val byte = s"((($v >> ${7 * i}) & 127) |" +
        s" (CASE WHEN ${i + 1} < $nb THEN 128 ELSE 0 END))"
      s"(CASE WHEN $i < $nb THEN lpad(lower(to_hex($byte)), 2, '0')" +
        " ELSE '' END)"
    }.mkString(" || ")
  }

  /** DuckDB spelling of [[compressedExport]] — the ii8 oracle re-derives
    * every varint byte arithmetically (7-bit groups + continuation
    * bits as integer CASE chains), so the compressed artifact is
    * oracle-exact down to each hex digit.
    */
  def compressedSql(src: String, id: String, text: String,
                    nShards: Int = 8, blockSize: Int = 16): String =
    s"""(WITH tok AS (SELECT $id AS doc_id, string_split($text, ' ') AS t FROM $src),
       |uni AS (SELECT doc_id, u.tk FROM tok
       |  CROSS JOIN LATERAL unnest(t) AS u(tk) WHERE u.tk <> ''),
       |tf AS (SELECT doc_id, tk AS term, COUNT(*) AS tf
       |  FROM uni GROUP BY doc_id, tk),
       |r AS (SELECT doc_id, term, tf,
       |    COUNT(*) OVER (PARTITION BY term) AS df,
       |    ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn
       |  FROM tf),
       |g AS (SELECT doc_id, term, tf, df, (rn - 1) // $blockSize AS block,
       |    CASE WHEN (rn - 1) % $blockSize = 0 THEN doc_id
       |      ELSE doc_id - lag(doc_id)
       |        OVER (PARTITION BY term ORDER BY doc_id) END AS gap
       |  FROM r)
       |SELECT
       |  CAST(('0x' || substr(md5(term), 1, 8))::UBIGINT % $nShards AS INT)
       |    AS shard,
       |  term, CAST(MAX(df) AS BIGINT) AS df,
       |  CAST(block AS BIGINT) AS block,
       |  CAST(COUNT(*) AS BIGINT) AS block_df,
       |  string_agg(${varintHexSql("gap")} || ${varintHexSql("tf")},
       |    '' ORDER BY doc_id) AS postings_hex
       |FROM g
       |GROUP BY term, block)""".stripMargin
}

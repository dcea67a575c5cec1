package graft.operators

import graft.core.Tables
import graft.dedup.{Decontam, TextDedup}
import graft.quality.{Boilerplate, Redact}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for the LLM training-data pipeline
  * (north-star surface beyond the reference): token-window chunking,
  * benchmark decontamination, PII redaction, epoch-weighted corpus
  * mixing and the shuffled-shard export order — each DuckDB
  * oracle-gated on the documents table.
  *
  * The sf fixtures contain no benchmark leaks or PII, so those queries
  * plant both deterministically ON BOTH SIDES (same convention as
  * TrainingCatalog's dup augmentation): the eval set is a
  * first-token-dropped variant of every 41st document, and the PII
  * query appends synthetic email/phone/IP/account spans derived from
  * doc_id.
  */
object CurationCatalog {

  private val EvalOffset = 2000000L

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))

  /** Planted benchmark set: every 41st doc minus its first token —
    * overlapping 5-grams with the corpus original, but not byte-equal.
    */
  private def evalDocs(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).filter(col("doc_id") % 41 === 0)
      .select((col("doc_id") + EvalOffset).as("doc_id"),
        expr("substring(text, locate(' ', text) + 1)").as("text"))

  /** dc3's planted eval probes — PERTURBED variants (dim-1 zeroed) of
    * every 41st vector, so hits are genuine near-dup matches (cos
    * 0.9–1.0), not identity echoes. ONE definition shared by the
    * batch gate and its streaming face e36 (which is held to dc3's
    * oracle): a perturbation tweak that missed a copy would fail e36
    * for a non-obvious reason.
    */
  private[graft] def dc3Probes(emb: DataFrame): DataFrame =
    // dim-agnostic tail slice (size-1, not a hard-coded 63): the oracle
    // writes open-ended embedding[2:], so a fixture-dim growth must not
    // silently truncate the engine probe into a partial dot product
    emb.filter(col("vec_id") % 41 === 0)
      .select(concat(array(lit(0.0f)),
          slice(col("embedding"), lit(2), size(col("embedding")) - 1))
        .as("embedding"))

  private val evalDocsSql =
    s"""eval AS (SELECT doc_id + $EvalOffset AS doc_id,
       |   substring(text, strpos(text, ' ') + 1) AS text
       | FROM documents WHERE doc_id % 41 = 0)""".stripMargin

  private val DecontamN = 5

  /** Synthetic PII suffix, same construction both engines. */
  /** The pii2 output shape, shared with the e28 streaming face: one
    * per-class count column, the total, and the all-zero clean bit —
    * a pure codegen'd projection over the planted text.
    */
  private[operators] def piiCensusCols: Seq[org.apache.spark.sql.Column] = {
    val cs = Redact.piiCensus(piiText)
    val total = cs.map(_._2).reduce(_ + _)
    col("doc_id") +: cs.map { case (n, c) => c.as(s"n_$n") } :+
      total.as("n_pii") :+ (total === 0).cast("int").as("clean")
  }

  private[operators] def piiText = concat(col("text"),
    lit(" reach me: user"), col("doc_id").cast("string"),
    lit("@mail.example.org or +1 555-867-5309, ip 192.168."),
    (col("doc_id") % 254).cast("string"),
    lit(".17, acct 98765432"), col("doc_id").cast("string"))

  private[operators] val piiTextSql =
    """text || ' reach me: user' || CAST(doc_id AS VARCHAR)
      | || '@mail.example.org or +1 555-867-5309, ip 192.168.'
      | || CAST(doc_id % 254 AS VARCHAR)
      | || '.17, acct 98765432' || CAST(doc_id AS VARCHAR)"""
      .stripMargin.replace("\n", "")

  private val MixWeights =
    Map("src0" -> 2.3, "src1" -> 0.5, "src2" -> 0.0)
  private val MixDefault = 1.0

  // ---- duplicated-span masking fixtures ------------------------------
  // The corpus has no naturally repeated long spans, so every 13th doc
  // gets a shared 10-token slogan appended (≥ SpanN tokens → its grams
  // clear the census), same construction both engines.
  private val SpanSlogan =
    "limited time offer click here to claim your reward now"
  private val SpanN = 5
  private val SpanFreq = 30L

  private def sloganDocs(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(col("doc_id"),
      when(col("doc_id") % 13 === 0, concat(col("text"), lit(" " + SpanSlogan)))
        .otherwise(col("text")).as("text"))

  private val sloganDocsSql =
    s"""sdocs AS (SELECT doc_id,
       | CASE WHEN doc_id % 13 = 0 THEN text || ' $SpanSlogan'
       |      ELSE text END AS text
       | FROM documents)""".stripMargin

  // ---- LONG-span dedup fixtures (ds3) --------------------------------
  // Lee et al.'s recipe at its published granularity: only duplicated
  // spans of >= LongSpanMin tokens are removed. Every 13th doc carries
  // the 10-token slogan (must SURVIVE the threshold), every 17th a
  // 60-token block (must be caught); a doc divisible by both gets both.
  // Freq floor 20 clears both plants at every sf (500 docs -> 39 and
  // 30 carriers).
  private val LongSpan = (1 to 60).map(i => s"dup$i").mkString(" ")
  private val LongSpanMin = 50L
  private val LongSpanFreq = 20L

  private def longSpanDocs(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(col("doc_id"),
      concat(
        when(col("doc_id") % 13 === 0,
          concat(col("text"), lit(" " + SpanSlogan))).otherwise(col("text")),
        when(col("doc_id") % 17 === 0, lit(" " + LongSpan)).otherwise(lit("")))
        .as("text"))

  // '||' must never START a line here (the en1 double-stripMargin trap)
  private val longSpanDocsSql =
    s"""ldocs AS (SELECT doc_id,
       | (CASE WHEN doc_id % 13 = 0 THEN text || ' $SpanSlogan' ELSE text END) ||
       | (CASE WHEN doc_id % 17 = 0 THEN ' $LongSpan' ELSE '' END) AS text
       | FROM documents)""".stripMargin

  // token-budget cap per source (~half of each source's ~1.5k tokens
  // at sf0.01, so the trim decision is exercised in both directions)
  private val TokenBudget = 800L
  // group-mean quality gate: the sf corpus's per-source means span
  // ~[0.458, 0.516], so 0.485 keeps some sources and drops others
  private val GroupMeanMicros = 485000L

  // ---- line-level boilerplate removal fixtures -----------------------
  // The fixture corpus has no newlines, so "lines" are the Chunker's
  // stride==size token segments, PLUS planted boilerplate lines
  // (identical across ~1/7 and ~1/11 of docs — the nav-menu/footer
  // shape) built the same way on both engines.
  private val LineTokens = 16
  private val PackLen = 512
  // bb1's fixed batch-shape menu; fixture docs span ~10–300 tokens,
  // so several buckets carry real mass and the top one exercises clamp
  private[operators] val LengthBucketBounds = Seq(16, 32, 64, 128, 256)
  private[operators] val LengthBucketBatch = 32

  /** bb1's oracle, shared verbatim by the streaming e23 gate — the
    * converged stream census must equal the batch census exactly, so
    * one SQL statement states both contracts.
    */
  private[operators] lazy val LengthBucketsOracleSql: String = {
    val bounds = LengthBucketBounds
    val bucketCase = bounds.init.map(b => s"WHEN n <= $b THEN $b")
      .mkString("CASE ", " ", s" ELSE ${bounds.last} END")
    s"""WITH n AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n
       |  FROM documents),
       |b AS (SELECT $bucketCase AS bucket,
       |    LEAST(n, ${bounds.last}) AS kept,
       |    GREATEST(($bucketCase) - n, 0) AS waste
       |  FROM n),
       |agg AS (SELECT bucket, COUNT(*) AS n_docs,
       |    CAST(FLOOR((COUNT(*) + ${LengthBucketBatch - 1}) / $LengthBucketBatch) AS BIGINT) AS n_batches,
       |    CAST(SUM(kept) AS BIGINT) AS sum_tokens,
       |    CAST(SUM(waste) AS BIGINT) AS padding_waste
       |  FROM b GROUP BY bucket)
       |SELECT bucket, n_docs, n_batches, sum_tokens, padding_waste,
       |  CAST(padding_waste AS DOUBLE) / CAST(bucket * n_docs AS DOUBLE)
       |    AS waste_ratio
       |FROM agg ORDER BY bucket""".stripMargin
  }
  private val BoilerA = "subscribe to our newsletter for updates today"
  private val BoilerB = "all rights reserved copyright twenty twenty two"
  private val BoilerFreq = 40L

  private def lineRows(spark: SparkSession, sfDir: String): DataFrame = {
    val segs = Chunker.chunkByTokens(docs(spark, sfDir), "doc_id", "text",
      size = LineTokens, stride = LineTokens)
      .select(col("doc_id"), col("chunk_id").as("line_no"),
        col("chunk_text").as("line"))
    val base = docs(spark, sfDir)
    val plantedA = base.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), lit(1000000L).as("line_no"), lit(BoilerA).as("line"))
    val plantedB = base.filter(col("doc_id") % 11 === 0)
      .select(col("doc_id"), lit(1000001L).as("line_no"), lit(BoilerB).as("line"))
    segs.unionByName(plantedA).unionByName(plantedB)
  }

  private val lineRowsSql =
    s"""lines AS (
       | SELECT doc_id, chunk_id AS line_no, chunk_text AS line
       | FROM ${Chunker.chunkSql("documents", "doc_id", "text", LineTokens, LineTokens)} c
       | UNION ALL
       | SELECT doc_id, 1000000 AS line_no, '$BoilerA' AS line
       | FROM documents WHERE doc_id % 7 = 0
       | UNION ALL
       | SELECT doc_id, 1000001 AS line_no, '$BoilerB' AS line
       | FROM documents WHERE doc_id % 11 = 0)""".stripMargin

  // ---- web-curation fixtures ------------------------------------------
  // Synthetic URLs with deterministic presentation noise — mixed-case
  // scheme/host, a www. prefix, a default :443 or explicit :8080 port,
  // tracking params in three query layouts, a fragment — so every
  // normalize() rule is exercised. The oracle derives the EXPECTED
  // canonical form directly from (doc_id, source) arithmetic and never
  // parses a URL (the s4_log_parse convention: the strongest oracle
  // never goes through the code path under test).
  private val DomainCap = 10

  private def urlDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val id = col("doc_id").cast("string")
    Tables.documents(spark, sfDir).select(
      col("doc_id"), col("source"), col("n_chars"),
      concat(
        when(col("doc_id") % 5 === 0, lit("HTTPS")).otherwise(lit("https")),
        lit("://"),
        when(col("doc_id") % 3 === 0, lit("WWW.")).otherwise(lit("")),
        when(col("doc_id") % 2 === 0, upper(col("source"))).otherwise(col("source")),
        lit(".ORG"),
        when(col("doc_id") % 11 === 0, lit(":8080"))
          .when(col("doc_id") % 7 === 0, lit(":443"))
          .otherwise(lit("")),
        lit("/p/"), id, lit("?"),
        when(col("doc_id") % 9 === 0, concat(lit("a=1&utm_campaign=x&id="), id))
          .when(col("doc_id") % 2 === 0, concat(lit("utm_source=feed&id="), id))
          .otherwise(concat(lit("id="), id)),
        when(col("doc_id") % 4 === 0, lit("#frag")).otherwise(lit("")))
        .as("url"))
  }

  /** The planted badwords list for bw1/bw2 (fixture vocabulary terms,
    * one stated uppercase to prove case folding).
    */
  private[operators] val BadWords = Seq("SLOW", "dup", "spark")

  // ---- encoding-quality fixtures --------------------------------------
  // The fixture corpus is clean ASCII, so en1/en2 plant the artifact
  // classes deterministically on both sides: every 17th doc gains a
  // replacement char + a C0 control, every 23rd a mojibake phrase
  // (escaped codepoints in source so no editor/locale can mangle the
  // bytes; the SQL literal is emitted from the SAME Scala constant).
  private val MojiPlant = " caf\u00C3\u00A9 ma\u00C3\u00B1ana"

  /** cp1252 â€-class plant (every 29th doc): curly-quoted word (the
    * right-quote form carries the INVISIBLE C1 U+009D), an en dash
    * and a right single quote — escaped codepoints in source, and
    * `Encoding.Sql.sqlLit` (chr(157) pieces) on the SQL side.
    */
  private val Cp1252Plant =
    " \u00E2\u20AC\u0153q\u00E2\u20AC\u009D \u00E2\u20AC\u201Cx\u00E2\u20AC\u2122"

  /** The planting expression itself — shared with the e20 streaming
    * face so batch and stream corrupt identically.
    */
  private[operators] def encPlantText: org.apache.spark.sql.Column =
    concat(col("text"),
      when(col("doc_id") % 17 === 0, lit(" z\uFFFD\u0008q"))
        .otherwise(lit("")),
      when(col("doc_id") % 23 === 0, lit(MojiPlant))
        .otherwise(lit("")),
      when(col("doc_id") % 29 === 0, lit(Cp1252Plant))
        .otherwise(lit("")))

  private def encDocs(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(col("doc_id"), encPlantText.as("text"))

  // NB: no line may START with '|' — this CTE is interpolated into
  // stripMargin oracle templates, which would strip a leading '||'
  private val encDocsSql =
    s"""edocs AS (SELECT doc_id, text ||
       | CASE WHEN doc_id % 17 = 0
       |   THEN ' z' || chr(65533) || chr(8) || 'q' ELSE '' END ||
       | CASE WHEN doc_id % 23 = 0 THEN '$MojiPlant' ELSE '' END ||
       | CASE WHEN doc_id % 29 = 0
       |   THEN ${graft.quality.Encoding.Sql.sqlLit(Cp1252Plant)}
       |   ELSE '' END AS text
       | FROM documents)""".stripMargin

  /** Repetition plant: every 13th doc gets a 5-gram slogan appended
    * TWICE (duplicated-5-gram territory, plus a repeated top bigram),
    * every (13k+5)th doc gets it ONCE (present but NOT duplicated —
    * the negative control). Fixed ASCII literal, same text both sides.
    */
  private val RepPlant = " lorem ipsum dolor sit amet"

  /** dm1's fixed token budget — large enough that every source's
    * allocation is a multi-digit integer at any sf.
    */
  private val MixBudget = 1000000L

  private[operators] def repPlantText: org.apache.spark.sql.Column =
    concat(col("text"),
      when(col("doc_id") % 13 === 0, lit(RepPlant + RepPlant))
        .otherwise(lit("")),
      when(col("doc_id") % 13 === 5, lit(RepPlant))
        .otherwise(lit("")))

  private[operators] def repDocs(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(col("doc_id"), repPlantText.as("text"))

  // NB: no line may START with '|' post-stripMargin — interpolated
  // into stripMargin oracle templates (same rule as encDocsSql)
  private val repDocsSql =
    s"""rdocs AS (SELECT doc_id, text ||
       | CASE WHEN doc_id % 13 = 0 THEN '$RepPlant$RepPlant' ELSE '' END ||
       | CASE WHEN doc_id % 13 = 5 THEN '$RepPlant' ELSE '' END AS text
       | FROM documents)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // REP1 — Gopher top n-gram char fraction (n=2,3,4): characters
    // claimed by the most frequent n-gram over total non-space chars;
    // ties break lexicographically (same ORDER BY both sides). All
    // integer char arithmetic; one IEEE division at emission.
    "rep1_top_ngram" -> ((spark, dir) =>
      graft.quality.Repetition.topNgramCharFrac(
        repDocs(spark, dir), "doc_id", "text", Seq(2, 3, 4))
        .orderBy(col("doc_id"), col("n"))),

    // REP2 — Gopher duplicated n-gram char coverage (n=5): fraction
    // of characters inside ANY occurrence of a 5-gram appearing ≥2×
    // in the doc — interval UNION over token positions, so
    // overlapping duplicates never double-count a character.
    "rep2_dup_coverage" -> ((spark, dir) =>
      graft.quality.Repetition.dupNgramCharCoverage(
        repDocs(spark, dir), "doc_id", "text", 5)
        .orderBy(col("doc_id"))),

    // REP3 — the repetition corpus cut: docs passing ALL Gopher
    // char-fraction thresholds (top 2/3/4-gram ≤ 20/18/16 %, dup
    // 5-gram coverage ≤ 15 % — inclusive). Every verdict is a
    // cross-multiplied int64 comparison; no float enters any rule.
    "rep3_repetition_filter" -> ((spark, dir) =>
      graft.quality.Repetition.repetitionFilter(
        repDocs(spark, dir), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // NV1 — corpus-novelty score (memorization-risk readout): per doc,
    // the fraction of its DISTINCT 5-gram shingles that appear in at
    // least one OTHER document — cross-document sharing, where rep2
    // measures within-doc repetition and x12/x13 pairwise containment.
    // Two partial-agg shuffles (doc-keyed distinct, gram-keyed df),
    // exact integer counts, one shared IEEE arithmetic tree; gram-less
    // docs (shorter than the shingle) read fully novel.
    "nv1_novelty" -> ((spark, dir) => {
      import graft.dedup.TextDedup
      val d = repDocs(spark, dir)
      val sh = TextDedup.shingleSets(d, "doc_id", "text", k = 5)
      val dfq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      val per = sh.join(dfq, "shingle")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
      d.select(col("doc_id")).join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"),
          when(coalesce(col("n_grams"), lit(0L)) > 0,
            lit(1.0) - col("n_shared").cast("double") /
              col("n_grams").cast("double"))
            .otherwise(lit(1.0)).as("novelty"))
        .orderBy(col("doc_id"))
    }),

    // DM1 — training-mixture weights (GPT-3/DoReMi temperature
    // reweighting at α=1/2): per-source sqrt(token) weights, share of
    // the mixture, token allocation at a fixed budget, and the
    // up-sampling factor (epochs). sqrt is IEEE-exact on both engines
    // so no quantization enters; Σw is the dd2-style ordered fold.
    "dm1_mixture_weights" -> ((spark, dir) =>
      graft.selection.Mixture.domainWeights(
        Tables.documents(spark, dir)
          .select(col("doc_id"), col("text"), col("source")),
        "text", "source", budget = MixBudget)
        .orderBy(col("source"))),

    // EN1 — encoding-artifact census (ftfy-style): replacement chars,
    // stray C0 controls, mojibake pair hits, clean bit — all
    // char-length arithmetic over literal replaces, map-side
    "en1_encoding_census" -> ((spark, dir) =>
      graft.quality.Encoding.census(encDocs(spark, dir), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // EN2 — mechanical repair: mojibake reversed through the fixed
    // pair table, replacement/control chars stripped; byte-exact text
    "en2_encoding_repair" -> ((spark, dir) =>
      graft.quality.Encoding.repair(encDocs(spark, dir), "text")
        .orderBy(col("doc_id"))),

    // GQ1 — Gopher quality-rule census: raw counters + integer rule
    // bits + verdict per doc (word-count bounds, mean word length,
    // alpha-word ratio, stopword presence — all cross-multiplied
    // integer arithmetic, no float in any verdict)
    "gq1_gopher_rules" -> ((spark, dir) =>
      graft.quality.GopherRules.profile(docs(spark, dir), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // GQ2 — the corpus cut: docs passing all Gopher rules
    "gq2_gopher_filter" -> ((spark, dir) =>
      graft.quality.GopherRules.filterPass(docs(spark, dir), "doc_id", "text")
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id"))),

    // BW1 — C4-style badwords profile: per-doc banned-token hits
    // (token-boundary, case-folded) over docs with >= 1 hit
    "bw1_blocklist_profile" -> ((spark, dir) =>
      graft.quality.TermBlocklist.profile(docs(spark, dir), "doc_id",
        "text", BadWords)
        .orderBy(col("doc_id"))),

    // BW2 — the surviving corpus after the badwords cut (doc-level
    // drop, unlike t8's token-level strip)
    "bw2_blocklist_filter" -> ((spark, dir) =>
      graft.quality.TermBlocklist.filterClean(docs(spark, dir), "doc_id",
        "text", BadWords)
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id"))),

    // canonical URL + host/domain extraction (all parse_url + regex,
    // no UDF); :443 drops as the https default, :8080 survives,
    // tracking params strip in all three layouts, fragment drops
    "cu1_url_normalize" -> ((spark, dir) =>
      urlDocs(spark, dir).select(
        col("doc_id"),
        graft.quality.Urls.host(col("url")).as("host"),
        graft.quality.Urls.domain(col("url")).as("domain"),
        graft.quality.Urls.normalize(col("url")).as("norm_url"))
        .orderBy(col("doc_id"))),

    // CU3 — public-suffix-list registrable domains: hosts synthesized
    // across generic TLDs, 2-label suffixes (co.uk / com.br), and a
    // 3-label suffix (wa.edu.au), with and without subdomains; the
    // tiered longest-suffix expression must keep 2/3/4 labels
    // respectively. Map-side only (InSet literals, no join).
    "cu3_registrable_domain" -> ((spark, dir) => {
      val host = lower(concat(
        when(col("doc_id") % 3 === 0, lit("www.")).otherwise(lit("")),
        col("source"),
        when(col("doc_id") % 5 === 0, lit(".co.uk"))
          .when(col("doc_id") % 5 === 1, lit(".com"))
          .when(col("doc_id") % 5 === 2, lit(".wa.edu.au"))
          .when(col("doc_id") % 5 === 3, lit(".org"))
          .otherwise(lit(".com.br"))))
      Tables.documents(spark, dir).select(
        col("doc_id"), host.as("host"),
        graft.quality.PublicSuffix.registrableFromHost(host).as("domain"))
        .orderBy(col("doc_id"))
    }),

    // per-domain volume cap: top-10 docs per registrable domain by
    // (n_chars desc, doc_id) — one domain-keyed window, rank before
    // payload joins
    "cu2_domain_cap" -> ((spark, dir) => {
      val d = urlDocs(spark, dir)
        .withColumn("domain", graft.quality.Urls.domain(col("url")))
      graft.quality.Urls.domainCap(d, "domain", "n_chars", "doc_id", DomainCap)
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("kept"), sum(col("n_chars")).as("kept_chars"))
        .orderBy(col("domain"))
    }),

    // CX1 — CCNet perplexity buckets: per-language head/middle/tail
    // terciles of the unigram-LM score (exact rank-window path, the
    // oracle-able twin of the approx-percentile scale path), censused
    "cx1_ppl_buckets" -> ((spark, dir) =>
      graft.quality.Perplexity.buckets(
        Tables.documents(spark, dir), "doc_id", "text", "lang",
        exact = true)
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("bucket"))),

    // token-window chunking: 32-token chunks, stride 24 (8-token overlap)
    "ck1_chunk_tokens" -> ((spark, dir) =>
      Chunker.chunkByTokens(docs(spark, dir), "doc_id", "text",
        size = 32, stride = 24)
        .orderBy(col("doc_id"), col("chunk_id"))),

    // per-doc contamination profile vs the planted eval set
    "dc1_decontam_profile" -> ((spark, dir) =>
      Decontam.contaminationProfile(docs(spark, dir), evalDocs(spark, dir),
        "doc_id", "text", n = DecontamN)
        .orderBy(col("doc_id"))),

    // the surviving corpus after zero-tolerance n-gram decontamination
    "dc2_decontaminate" -> ((spark, dir) =>
      Decontam.decontaminate(docs(spark, dir), evalDocs(spark, dir),
        "doc_id", "text", n = DecontamN)
        .orderBy(col("doc_id"))),

    // DC3 — SEMANTIC decontamination (the paraphrase-robust face the
    // verbatim n-gram rule misses): eval probes are planted PERTURBED
    // variants (dim-1 zeroed) of every 41st corpus vector, so hits
    // are genuine near-dup matches at cos 0.9–1.0, not identity
    // echoes; τ = 0.9 applied to the 6-dp-rounded score (the hn1
    // contract). Probes broadcast; one per-id max shuffle
    "dc3_semantic_decontam" -> ((spark, dir) => {
      val emb = Tables.embeddings(spark, dir)
      Decontam.semanticProfile(emb, dc3Probes(emb), "vec_id", "embedding",
          tau = 0.9)
        .orderBy(col("vec_id"))
    }),

    // DC4 — IVF-ROUTED semantic decontamination (dc3's scale path —
    // the route its fail-fast message points to past the probe cap):
    // the corpus assigns once to Lloyd-trained cells; each probe
    // (carrying its source vec_id as probe_id) scores only its 2
    // nearest cells. Bounded recall is the documented trade; the
    // oracle replays the identical bounded scan (trained cells by the
    // km1 induction), and census preservation keeps unprobed cells at
    // (max_cos null, contaminated 0)
    "dc4_semantic_decontam_ivf" -> ((spark, dir) => {
      val emb = Tables.embeddings(spark, dir)
      val cents = graft.similarity.Similarity.kmeansTrain(
        emb, "vec_id", "embedding", k = 8, iters = 2, dim = 64).centroids
      val probes = emb.filter(col("vec_id") % 41 === 0)
        .select(col("vec_id").as("probe_id"),
          concat(array(lit(0.0f)),
            slice(col("embedding"), lit(2), size(col("embedding")) - 1))
            .as("embedding"))
      Decontam.semanticProfileIvf(emb, probes, "vec_id", "embedding",
          tau = 0.9, cents, nProbe = 2)
        .orderBy(col("vec_id"))
    }),

    // PII scrub over the synthetic-PII corpus
    "pii1_redact" -> ((spark, dir) =>
      docs(spark, dir)
        .select(col("doc_id"), Redact.redactPii(piiText).as("redacted"))
        .orderBy(col("doc_id"))),

    // BB2 — data-driven bucket boundaries (bb1's planning input):
    // exact token-length sextiles via the value-domain trick — the
    // cumulative window runs over DISTINCT length values (bounded by
    // max doc length, not corpus size), and each boundary is the
    // smallest length whose cumulative count crosses the rank,
    // decided by cross-multiplied int64 (cum·6 ≥ k·n) so the order
    // statistic is exact on both engines.
    "bb2_bucket_suggest" -> ((spark, dir) =>
      Packing.suggestBoundaries(
        docs(spark, dir).select(
          graft.functions.TextAnalysis.tokenCount(col("text"))
            .cast("long").as("n_toks")),
        "n_toks", parts = 6)
        .orderBy(col("k"))),

    // QD1 — quality-decile census: how many docs (and how many
    // tokens) sit in each decile of the quality score — the
    // calibration readout a pipeline reads BEFORE committing to a
    // threshold cut. Bucket = floor(q·10) clamped to 9 (q is a
    // rational IEEE tree, shared both sides; the floor is the gm1
    // discipline); counts exact int64, mean length one IEEE division.
    // (the expression tree IS DocStream.qualityDeciles — batch and
    // the e29 streaming face share one spelling by construction)
    "qd1_quality_deciles" -> ((spark, dir) =>
      graft.streaming.DocStream.qualityDeciles(docs(spark, dir))
        .orderBy(col("decile"))),

    // LF1 — language-consistency cut (the C4 move: keep only docs the
    // classifier agrees with the metadata on): langId is one codegen'd
    // per-row expression, so this is a scan-time filter — docs whose
    // n-gram language prediction contradicts the declared lang are
    // exactly the mislabeled/mixed-language rows a corpus drops first.
    "lf1_lang_filter" -> ((spark, dir) =>
      Tables.documents(spark, dir)
        .filter(graft.functions.TextAnalysis.langId(col("text"))
          === col("lang"))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),

    // GQ3 — auxiliary Gopher symbol rules (the §A1.1 half gq1 doesn't
    // carry): symbol-to-word ratio over '#'/ellipsis and numeric-word
    // fraction, both cross-multiplied int64 with inclusive bounds.
    // Plants: every 19th doc gets a 30-'#' run (trips r_symbol below
    // 300 words), every (23k+3)th doc 30 numeric words (trips
    // r_numeric below 150).
    "gq3_aux_rules" -> ((spark, dir) => {
      val planted = docs(spark, dir).select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 19 === 0, lit(" " + "#" * 30))
            .otherwise(lit("")),
          when(col("doc_id") % 23 === 3,
            lit(" " + (1 to 30).mkString(" ")))
            .otherwise(lit(""))).as("text"))
      graft.quality.GopherRules.auxProfile(planted, "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // TR1 — middle truncation for long documents: keep the first 64
    // and last 32 tokens (head and tail carry the signal a context
    // budget can afford); docs at/under 96 tokens pass UNCHANGED —
    // inclusive boundary, one codegen'd projection.
    "tr1_truncate_middle" -> ((spark, dir) =>
      Chunker.truncateMiddle(docs(spark, dir), "doc_id", "text",
        head = 64, tail = 32)
        .orderBy(col("doc_id"))),

    // DCARD1 — the dataset card: one-row corpus summary (docs, tokens,
    // chars, sources, sorted lang set as the a15 string, and mean
    // quality via the gm1 integer-micros convention — the sum is exact
    // int64, the mean ONE shared IEEE division). The artifact a corpus
    // release publishes; one full-scan agg, everything partial.
    "dcard1_dataset_card" -> ((spark, dir) => {
      val q = graft.functions.TextAnalysis.qualityScore(col("text"))
      Tables.documents(spark, dir).agg(
        count(lit(1)).as("n_docs"),
        sum(graft.functions.TextAnalysis.tokenCount(col("text"))
          .cast("long")).as("n_tokens"),
        sum(length(col("text")).cast("long")).as("n_chars"),
        countDistinct(col("source")).as("n_sources"),
        concat_ws(",", sort_array(collect_set(col("lang")))).as("langs"),
        sum(floor(q * 1000000.0).cast("long")).as("q_micros"))
        .select(col("n_docs"), col("n_tokens"), col("n_chars"),
          col("n_sources"), col("langs"), col("q_micros"),
          (col("q_micros").cast("double") /
            (col("n_docs") * lit(1000000L)).cast("double"))
            .as("mean_quality"))
    }),

    // DCARD2 — the per-source card (release artifacts ship one card
    // per subset): dcard1's columns keyed by source, one partial agg.
    // The expression tree IS DocStream.sourceCards — batch and the
    // e26 streaming face share one spelling by construction.
    "dcard2_source_cards" -> ((spark, dir) =>
      graft.streaming.DocStream.sourceCards(Tables.documents(spark, dir))
        .orderBy(col("source"))),

    // PII2 — per-class PII census (the rate a pipeline tracks before/
    // after scrubbing): counts follow the redaction chain's precedence
    // (each class counted on text with earlier classes replaced), so
    // an email's digits never double-count as a digit run. One
    // codegen'd projection; clean = all-zero integer test.
    "pii2_pii_census" -> ((spark, dir) =>
      docs(spark, dir).select(piiCensusCols: _*)
        .orderBy(col("doc_id"))),

    // epoch-weighted mix: src0 repeated 2.3x, src1 halved, src2 dropped
    "mx1_epoch_mix" -> ((spark, dir) =>
      Sampling.epochMix(
        Tables.documents(spark, dir).select(col("doc_id"), col("source")),
        "doc_id", "source", MixWeights, MixDefault)
        .select(col("doc_id"), col("source"), col("epoch"))
        .orderBy(col("doc_id"), col("epoch"))),

    // MX2 — temperature-scaled mixing weights: p(source) ∝ n^0.75,
    // the multilingual/multi-domain upsampling recipe (downweights the
    // head, lifts the tail). pow is transcendental, so each source's
    // n^0.75 is quantized once (nudged floor, the t9 contract) and the
    // weight is a ratio of exact int64 sums — cross-engine identical.
    // One tiny source-keyed agg + the 1-row broadcast total.
    "mx2_temperature_mix" -> ((spark, dir) => {
      val cnt = Tables.documents(spark, dir)
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      val w = cnt.withColumn("__q",
        floor(pow(col("n_docs").cast("double"), lit(0.75)) * lit(1000000.0)
          + lit(1e-4)).cast("long"))
      val tot = w.agg(sum(col("__q")).as("__t"))
      w.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"),
          round(col("__q").cast("double") / col("__t").cast("double"), 6)
            .as("weight"))
        .orderBy(col("source"))
    }),

    // SMP1 — Efraimidis–Spirakis weighted sample without replacement:
    // 100 docs by n_chars weight, md5-uniform key (layout-invariant),
    // rounded+tiebroken rank per the float-rank oracle rule
    "smp1_weighted_topk" -> ((spark, dir) =>
      Sampling.weightedTopK(
        Tables.documents(spark, dir)
          .select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", k = 100, seed = "mix")
        .orderBy(col("es_key").desc, col("doc_id"))),

    // CU4 — blocklist gate: two blocked registrable domains plus a URL
    // path/query pattern (tracking-campaign shape); oracle restates the
    // expected survivors from the urlDocs construction arithmetic
    "cu4_blocklist" -> ((spark, dir) =>
      graft.quality.Urls.blocklistFilter(urlDocs(spark, dir), "url",
        Seq("src1.org", "src3.org"), "(?i)utm_campaign")
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))),

    // SMP2 — per-stratum weighted sample: 20 docs per language by
    // n_chars weight, same deterministic key, stratum-windowed rank
    "smp2_weighted_stratified" -> ((spark, dir) =>
      Sampling.weightedTopKPerStratum(
        Tables.documents(spark, dir)
          .select(col("doc_id"), col("lang"), col("n_chars")),
        "doc_id", "lang", "n_chars", k = 20, seed = "mix")
        .orderBy(col("lang"), col("es_key").desc, col("doc_id"))),

    // deterministic shuffled export order (the Sinks.shuffledShards
    // order, gated as a query; the sink itself is range-sharded — the
    // global window here is the verify face only, see SinksSpec)
    "sh1_shuffle_order" -> ((spark, dir) => {
      val h = md5(col("doc_id").cast("string"))
      docs(spark, dir).select(col("doc_id"),
        row_number().over(Window.orderBy(h, col("doc_id")))
          .cast("long").as("ord"))
        .orderBy(col("doc_id"))
    }),

    // CUR1 — curriculum shard order: quality terciles easiest-first
    // (exact order-stat thresholds — the oracle-able spelling; the
    // approx path is the 100 TB default), md5-shuffled within band,
    // addressed as (band, shard, pos) every reader derives identically.
    "cur1_curriculum" -> ((spark, dir) =>
      graft.selection.Curriculum.shardOrder(
        docs(spark, dir).select(col("doc_id"),
          round(graft.functions.TextAnalysis.qualityScore(col("text")), 6)
            .as("q")),
        "doc_id", "q", nShards = 8, exact = true)
        .orderBy(col("band"), col("shard"), col("pos"))),

    // corpus-wide boilerplate line census (lines in >= 40 distinct docs)
    "bl1_line_census" -> ((spark, dir) =>
      Boilerplate.frequentLines(lineRows(spark, dir), "doc_id", "line",
        minDocFreq = BoilerFreq)
        .orderBy(col("doc_freq").desc, col("line"))),

    // documents reassembled with boilerplate lines stripped
    "bl2_boilerplate_strip" -> ((spark, dir) =>
      Boilerplate.stripFrequentLines(lineRows(spark, dir), "doc_id",
        "line_no", "line", minDocFreq = BoilerFreq)
        .orderBy(col("doc_id"))),

    // concat-and-chunk sequence packing: doc↔pack span map at seqLen=512
    "pk1_pack_spans" -> ((spark, dir) =>
      Packing.packSpans(docs(spark, dir), "doc_id", "text",
        seqLen = PackLen, buckets = 256)
        .orderBy(col("pack_id"), col("doc_id"))),

    // per-pack fill census (every pack full except the last)
    "pk2_pack_fill" -> ((spark, dir) =>
      Packing.packFill(
        Packing.packSpans(docs(spark, dir), "doc_id", "text",
          seqLen = PackLen, buckets = 256))
        .orderBy(col("pack_id"))),

    // BB1 — length-bucketed batching census (the pad-vs-pack
    // alternative to pk1): each doc lands in the smallest
    // power-of-two bucket that holds it (overlong clamps to the max —
    // the truncation regime), and the census reports what a
    // fixed-shape batcher at B=32 would pay per bucket: docs, batches,
    // real tokens, padding waste, waste ratio. The readout that picks
    // bucket boundaries BEFORE a training run commits to them.
    "bb1_length_buckets" -> ((spark, dir) =>
      Packing.lengthBuckets(
        docs(spark, dir).select(col("doc_id"),
          graft.functions.TextAnalysis.tokenCount(col("text"))
            .cast("long").as("n_toks")),
        "n_toks", boundaries = LengthBucketBounds,
        batchSize = LengthBucketBatch)
        .orderBy(col("bucket"))),

    // per-source token-budget cap: best-quality-first until each
    // source's budget is spent (rounded float rank + doc_id tiebreak)
    "tb1_token_budget" -> ((spark, dir) => {
      val q = round(graft.functions.TextAnalysis.qualityScore(col("text")), 6)
      GroupStats.tokenBudgetTrim(
        Tables.documents(spark, dir)
          .select(col("doc_id"), col("source"),
            graft.functions.TextAnalysis.tokenCount(col("text"))
              .cast("long").as("n_toks"), col("text")),
        "source", "n_toks", budget = TokenBudget,
        order = Seq(q.desc, col("doc_id")))
        .select(col("doc_id"), col("source"), col("n_toks"))
        .orderBy(col("doc_id"))
    }),

    // CCNet-style domain gate: only documents from sources whose MEAN
    // quality clears the threshold (quantized-integer mean compare)
    "gm1_group_mean_filter" -> ((spark, dir) =>
      GroupStats.filterByGroupMean(
        Tables.documents(spark, dir).select(col("doc_id"), col("source"), col("text")),
        "source", graft.functions.TextAnalysis.qualityScore(col("text")),
        minMeanMicros = GroupMeanMicros)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))),

    // substring-level dedup: merged mask spans of cross-document
    // repeated 5-grams (the planted slogan + any natural repeats)
    "ds1_dup_spans" -> ((spark, dir) =>
      graft.dedup.SpanMask.maskDuplicatedSpans(
        sloganDocs(spark, dir), "doc_id", "text", SpanN, SpanFreq)
        .orderBy(col("doc_id"), col("span_start"))),

    // the corpus with masked spans stripped (untouched docs verbatim)
    "ds2_strip_spans" -> ((spark, dir) =>
      graft.dedup.SpanMask.stripDuplicatedSpans(
        sloganDocs(spark, dir), "doc_id", "text", SpanN, SpanFreq)
        .orderBy(col("doc_id"))),

    // DS5 — EXACT Lee-et-al long-span dedup (the suffix-array
    // criterion, no suffix array): mask every position inside a
    // ≥50-token substring with ≥2 CORPUS OCCURRENCES, via the L-gram
    // identity (a position is inside such a substring ⇔ it is inside
    // a 50-gram occurring ≥2 times — see the operator's scaladoc).
    // The 60-token block masks; the 10-token slogan survives; docs
    // carrying BOTH plants (%221) share a 70-token tail, so the mask
    // correctly extends back across the slogan there — behavior the
    // doc-freq approximation cannot express, replayed by the oracle.
    "ds5_exact_long_spans" -> ((spark, dir) =>
      graft.dedup.SpanMask.maskDuplicatedSpansExact(
        longSpanDocs(spark, dir), "doc_id", "text",
        spanTokens = LongSpanMin.toInt, minCount = 2L)
        .orderBy(col("doc_id"), col("span_start"))),

    // DS6 — the corpus stripped under the exact criterion
    "ds6_strip_exact_spans" -> ((spark, dir) =>
      graft.dedup.SpanMask.stripDuplicatedSpansExact(
        longSpanDocs(spark, dir), "doc_id", "text",
        spanTokens = LongSpanMin.toInt, minCount = 2L)
        .orderBy(col("doc_id"))),

    // DS3 — long-span dedup at Lee et al.'s published granularity:
    // only merged islands of >= 50 tokens mask. The planted 60-token
    // block is caught; the 10-token slogan (a shared idiom) SURVIVES —
    // exactly the length selectivity the paper's recipe requires.
    "ds3_long_spans" -> ((spark, dir) =>
      graft.dedup.SpanMask.maskDuplicatedSpans(
        longSpanDocs(spark, dir), "doc_id", "text", SpanN, LongSpanFreq,
        minSpanTokens = LongSpanMin)
        .orderBy(col("doc_id"), col("span_start"))),

    // DS4 — the corpus stripped at the >=L granularity: long blocks
    // removed, idiom-bearing docs verbatim (length-selective strip)
    "ds4_strip_long_spans" -> ((spark, dir) =>
      graft.dedup.SpanMask.stripDuplicatedSpans(
        longSpanDocs(spark, dir), "doc_id", "text", SpanN, LongSpanFreq,
        minSpanTokens = LongSpanMin)
        .orderBy(col("doc_id"))),

    // curation-funnel retention census: survivors of each cascading
    // filter stage, one conditional-aggregate pass over the scan
    "cf1_retention_funnel" -> ((spark, dir) => {
      import graft.functions.TextAnalysis
      graft.quality.Retention.funnel(docs(spark, dir), Seq(
        "min_tokens" -> (TextAnalysis.tokenCount(col("text")) >= 20),
        "quality" -> (TextAnalysis.qualityScore(col("text")) >= 0.45),
        "english" -> (TextAnalysis.langId(col("text")) === "en")))
        .orderBy(col("stage_id"))
    }),

    // within-doc line dedup: every doc gets its first-4-token line
    // planted as both header and footer; the dedup keeps the header
    // occurrence only (same construction both engines)
    "bl3_intradoc_dedup" -> ((spark, dir) => {
      val lineA = substring_index(col("text"), " ", 4)
      val built = docs(spark, dir).select(col("doc_id"),
        concat(lineA, lit("\n"), col("text"), lit("\n"), lineA).as("text"))
      Boilerplate.dedupLinesWithinDoc(built, "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // bloom-prefiltered dedup against a historical fingerprint store
    // (planted overlap: every 3rd doc is "in history", e11's fixture).
    // Bloom negatives bypass the anti-join map-side; positives are
    // exactly rechecked, so the result is byte-identical to the plain
    // NOT IN spelling the oracle runs.
    "bf1_bloom_dedup" -> ((spark, dir) => {
      import graft.functions.TextAnalysis
      val fp = TextAnalysis.normalizedFingerprint(col("text"))
      val store = docs(spark, dir).filter(col("doc_id") % 3 === 0)
        .select(fp.as("fp"))
      Bloom.antiJoinWithBloom(
        docs(spark, dir).withColumn("fp", fp), "fp",
        store, "fp", expectedItems = 1 << 14, fpp = 0.01)
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
    })
  )

  // ---- shared repetition-oracle CTE pieces (rep1/rep2/rep3) --------
  // NB: interpolated into stripMargin templates — post-stripMargin no
  // line may START with '|' (same rule as encDocsSql)

  private def repGramExpr(n: Int) =
    (0 until n).map(j => s"t[i+$j]").mkString(" || ' ' || ")

  // COALESCE mirrors the engine's null handling (positionedGrams
  // yields no rows for NULL text; totals coalesce to 0) — without it
  // a fixture regen containing one NULL text flips rep1/rep2's hash
  // and makes rep3's NULL predicate drop a doc the engine keeps
  private val repTkTotSql =
    """tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM rdocs),
      |tot AS (SELECT doc_id,
      |   CAST(length(replace(COALESCE(text, ''), ' ', '')) AS BIGINT)
      |     AS total_chars
      | FROM rdocs)""".stripMargin

  /** gN (per-doc n-gram counts) + rN (count-desc, gram-asc rank). */
  private def repTopCte(n: Int): String =
    s"""g$n AS (SELECT doc_id, gram, COUNT(*) AS c FROM (
       |   SELECT doc_id, ${repGramExpr(n)} AS gram FROM tk
       |   CROSS JOIN LATERAL unnest(generate_series(1, len(t) - ${n - 1})) AS u(i)
       |   WHERE len(t) >= $n) q GROUP BY doc_id, gram),
       |r$n AS (SELECT doc_id, gram, c, row_number() OVER (
       |   PARTITION BY doc_id ORDER BY c DESC, gram) AS rk FROM g$n)""".stripMargin

  /** tok/g/dup/cov/cc: duplicated-5-gram interval-union coverage. */
  private val repDupCtes: String =
    s"""tok AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
       |   CAST(length(t[i]) AS BIGINT) AS tok_chars
       | FROM tk CROSS JOIN LATERAL unnest(generate_series(1, len(t))) AS u(i)),
       |g AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, ${repGramExpr(5)} AS gram
       | FROM tk CROSS JOIN LATERAL unnest(generate_series(1, len(t) - 4)) AS u(i)
       | WHERE len(t) >= 5),
       |dup AS (SELECT doc_id, pos FROM (
       |   SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY doc_id, gram) AS gc
       |   FROM g) d WHERE gc >= 2),
       |cov AS (SELECT DISTINCT doc_id, pos + v.o AS cpos
       | FROM dup CROSS JOIN LATERAL unnest(generate_series(0, 4)) AS v(o)),
       |cc AS (SELECT c.doc_id, CAST(SUM(k.tok_chars) AS BIGINT) AS covered_chars
       | FROM cov c JOIN tok k ON k.doc_id = c.doc_id AND k.pos = c.cpos
       | GROUP BY c.doc_id)""".stripMargin

  def oracle: Map[String, String] = Map(
    "rep1_top_ngram" -> {
      def block(n: Int) =
        s"""${repTopCte(n)},
           |s$n AS (SELECT tt.doc_id, CAST($n AS BIGINT) AS n,
           |   COALESCE(r.gram, '') AS top_gram,
           |   CAST(COALESCE(r.c, 0) AS BIGINT) AS top_count,
           |   CAST(COALESCE(r.c * length(replace(r.gram, ' ', '')), 0) AS BIGINT)
           |     AS top_chars,
           |   tt.total_chars,
           |   CASE WHEN tt.total_chars > 0
           |     THEN CAST(COALESCE(r.c * length(replace(r.gram, ' ', '')), 0) AS DOUBLE)
           |          / CAST(tt.total_chars AS DOUBLE)
           |     ELSE CAST(0.0 AS DOUBLE) END AS top_frac
           | FROM tot tt LEFT JOIN (SELECT * FROM r$n WHERE rk = 1) r
           |   ON r.doc_id = tt.doc_id)""".stripMargin
      s"""WITH $repDocsSql,
         |$repTkTotSql,
         |${block(2)},
         |${block(3)},
         |${block(4)}
         |SELECT * FROM s2 UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4
         |ORDER BY doc_id, n""".stripMargin
    },

    "rep2_dup_coverage" ->
      s"""WITH $repDocsSql,
         |$repTkTotSql,
         |$repDupCtes
         |SELECT tt.doc_id,
         |  CAST(COALESCE(cc.covered_chars, 0) AS BIGINT) AS covered_chars,
         |  tt.total_chars,
         |  CASE WHEN tt.total_chars > 0
         |    THEN CAST(COALESCE(cc.covered_chars, 0) AS DOUBLE)
         |         / CAST(tt.total_chars AS DOUBLE)
         |    ELSE CAST(0.0 AS DOUBLE) END AS dup_frac
         |FROM tot tt LEFT JOIN cc ON cc.doc_id = tt.doc_id
         |ORDER BY tt.doc_id""".stripMargin,

    "rep3_repetition_filter" -> {
      def topCond(n: Int, pct: Int) =
        s"COALESCE(a$n.c * length(replace(a$n.gram, ' ', '')), 0) * 100" +
          s" <= $pct * tt.total_chars"
      val lims = graft.quality.Repetition.TopNgramLimitPct
      s"""WITH $repDocsSql,
         |$repTkTotSql,
         |${repTopCte(2)},
         |${repTopCte(3)},
         |${repTopCte(4)},
         |$repDupCtes
         |SELECT tt.doc_id FROM tot tt
         |LEFT JOIN (SELECT * FROM r2 WHERE rk = 1) a2 ON a2.doc_id = tt.doc_id
         |LEFT JOIN (SELECT * FROM r3 WHERE rk = 1) a3 ON a3.doc_id = tt.doc_id
         |LEFT JOIN (SELECT * FROM r4 WHERE rk = 1) a4 ON a4.doc_id = tt.doc_id
         |LEFT JOIN cc ON cc.doc_id = tt.doc_id
         |WHERE ${topCond(2, lims(2))}
         |  AND ${topCond(3, lims(3))}
         |  AND ${topCond(4, lims(4))}
         |  AND COALESCE(cc.covered_chars, 0) * 100 <=
         |      ${graft.quality.Repetition.DupCoverageLimitPct} * tt.total_chars
         |ORDER BY tt.doc_id""".stripMargin
    },

    "nv1_novelty" ->
      s"""WITH $repDocsSql,
         |sh AS ${graft.dedup.TextDedup.Sql.shingleSets("rdocs", "doc_id", "text", 5)},
         |dfq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle),
         |pd AS (SELECT sh.doc_id, COUNT(*) AS n_grams,
         |    SUM(CASE WHEN dfq.df >= 2 THEN 1 ELSE 0 END) AS n_shared
         |  FROM sh JOIN dfq USING (shingle) GROUP BY sh.doc_id)
         |SELECT d.doc_id,
         |  CAST(COALESCE(pd.n_grams, 0) AS BIGINT) AS n_grams,
         |  CAST(COALESCE(pd.n_shared, 0) AS BIGINT) AS n_shared,
         |  CASE WHEN COALESCE(pd.n_grams, 0) > 0
         |    THEN 1.0 - CAST(pd.n_shared AS DOUBLE) / CAST(pd.n_grams AS DOUBLE)
         |    ELSE CAST(1.0 AS DOUBLE) END AS novelty
         |FROM rdocs d LEFT JOIN pd ON pd.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "dm1_mixture_weights" ->
      s"""WITH per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_toks
         |  FROM documents GROUP BY source),
         |w AS (SELECT source, n_docs, n_toks,
         |    sqrt(CAST(n_toks AS DOUBLE)) AS w FROM per),
         |t AS (SELECT list_reduce(
         |    list_prepend(CAST(0.0 AS DOUBLE),
         |      array_agg(w ORDER BY source)),
         |    (a, b) -> a + b) AS tw FROM w),
         |a AS (SELECT w.source, w.n_docs, w.n_toks, w.w,
         |    w.w / t.tw AS p,
         |    CAST(FLOOR(w.w / t.tw * $MixBudget) AS BIGINT) AS alloc_toks
         |  FROM w CROSS JOIN t)
         |SELECT source, n_docs, n_toks, w, p, alloc_toks,
         |  CASE WHEN n_toks > 0
         |    THEN CAST(alloc_toks AS DOUBLE) / CAST(n_toks AS DOUBLE)
         |    ELSE CAST(0.0 AS DOUBLE) END AS epochs
         |FROM a ORDER BY source""".stripMargin,

    "en1_encoding_census" -> {
      val E = graft.quality.Encoding.Sql
      s"""WITH $encDocsSql
         |SELECT doc_id,
         |  ${E.countOccurrences("text", graft.quality.Encoding.Replacement)}
         |    AS n_replacement,
         |  ${E.nCtrl("text")} AS n_ctrl,
         |  ${E.nMojibake("text")} AS n_mojibake,
         |  ${E.nCp1252("text")} AS n_cp1252,
         |  CAST(${E.countOccurrences("text",
                graft.quality.Encoding.Replacement)} = 0
         |    AND ${E.nCtrl("text")} = 0
         |    AND ${E.nMojibake("text")} = 0
         |    AND ${E.nCp1252("text")} = 0 AS INT) AS clean
         |FROM edocs ORDER BY doc_id""".stripMargin
    },

    "en2_encoding_repair" -> {
      val E = graft.quality.Encoding.Sql
      s"""WITH $encDocsSql
         |SELECT doc_id, ${E.repaired("text")} AS text
         |FROM edocs ORDER BY doc_id""".stripMargin
    },

    "gq1_gopher_rules" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |uni AS (SELECT doc_id, u.tk FROM tok CROSS JOIN LATERAL unnest(t) AS u(tk)),
        |g AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
        |  CAST(SUM(length(tk)) AS BIGINT) AS sum_len,
        |  CAST(SUM(CASE WHEN regexp_full_match(tk, '[A-Za-z]+')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha_words,
        |  CAST(SUM(CASE WHEN lower(tk) IN
        |             ('the','be','to','of','and','that','have','with')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_stop_hits
        |  FROM uni GROUP BY doc_id)
        |SELECT doc_id, n_words, sum_len, n_alpha_words, n_stop_hits,
        |  CAST(sum_len AS DOUBLE) / CAST(n_words AS DOUBLE) AS mean_word_len,
        |  CAST(n_words BETWEEN 50 AND 100000 AS INT) AS r_wordcount,
        |  CAST(sum_len >= 3 * n_words AND sum_len <= 10 * n_words AS INT)
        |    AS r_meanlen,
        |  CAST(10 * n_alpha_words >= 8 * n_words AS INT) AS r_alpha,
        |  CAST(n_stop_hits >= 2 AS INT) AS r_stop,
        |  CAST(n_words BETWEEN 50 AND 100000
        |    AND sum_len >= 3 * n_words AND sum_len <= 10 * n_words
        |    AND 10 * n_alpha_words >= 8 * n_words
        |    AND n_stop_hits >= 2 AS INT) AS pass
        |FROM g ORDER BY doc_id""".stripMargin,

    "gq2_gopher_filter" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |uni AS (SELECT doc_id, u.tk FROM tok CROSS JOIN LATERAL unnest(t) AS u(tk)),
        |g AS (SELECT doc_id, COUNT(*) AS n_words, SUM(length(tk)) AS sum_len,
        |  SUM(CASE WHEN regexp_full_match(tk, '[A-Za-z]+') THEN 1 ELSE 0 END)
        |    AS n_alpha_words,
        |  SUM(CASE WHEN lower(tk) IN
        |        ('the','be','to','of','and','that','have','with')
        |      THEN 1 ELSE 0 END) AS n_stop_hits
        |  FROM uni GROUP BY doc_id),
        |p AS (SELECT doc_id FROM g
        |  WHERE n_words BETWEEN 50 AND 100000
        |    AND sum_len >= 3 * n_words AND sum_len <= 10 * n_words
        |    AND 10 * n_alpha_words >= 8 * n_words AND n_stop_hits >= 2)
        |SELECT d.doc_id, d.text FROM documents d JOIN p USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "bw1_blocklist_profile" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |uni AS (SELECT doc_id, u.tk FROM tok CROSS JOIN LATERAL unnest(t) AS u(tk)),
        |h AS (SELECT doc_id, lower(tk) AS tk FROM uni
        |      WHERE lower(tk) IN ('slow', 'dup', 'spark'))
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
        |  CAST(COUNT(DISTINCT tk) AS BIGINT) AS n_terms
        |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "bw2_blocklist_filter" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |uni AS (SELECT doc_id, u.tk FROM tok CROSS JOIN LATERAL unnest(t) AS u(tk)),
        |h AS (SELECT DISTINCT doc_id FROM uni
        |      WHERE lower(tk) IN ('slow', 'dup', 'spark'))
        |SELECT d.doc_id, d.text FROM documents d
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM h)
        |ORDER BY d.doc_id""".stripMargin,

    // expected canonical form rebuilt from (doc_id, source) arithmetic —
    // no URL parsing on the oracle side
    "cu1_url_normalize" ->
      """WITH exp AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
        |    || source || '.org' AS host,
        |  source || '.org' AS domain,
        |  (CASE WHEN doc_id % 11 = 0 THEN ':8080' ELSE '' END) AS port,
        |  (CASE WHEN doc_id % 9 = 0 THEN 'a=1&id=' ELSE 'id=' END)
        |    || CAST(doc_id AS VARCHAR) AS q
        |FROM documents)
        |SELECT doc_id, host, domain,
        |  'https://' || host || port || '/p/' || CAST(doc_id AS VARCHAR)
        |    || '?' || q AS norm_url
        |FROM exp ORDER BY doc_id""".stripMargin,

    "cu3_registrable_domain" -> {
      val in2 = graft.quality.PublicSuffix.Default2.map(s => s"'$s'").mkString(",")
      val in3 = graft.quality.PublicSuffix.Default3.map(s => s"'$s'").mkString(",")
      val l2 = """regexp_extract(host, '([^.]+\.[^.]+)$', 1)"""
      val l3 = """regexp_extract(host, '((?:[^.]+\.){2}[^.]+)$', 1)"""
      val l4 = """regexp_extract(host, '((?:[^.]+\.){3}[^.]+)$', 1)"""
      s"""WITH h AS (SELECT doc_id, lower(
         |  (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END) || source ||
         |  (CASE doc_id % 5 WHEN 0 THEN '.co.uk' WHEN 1 THEN '.com'
         |   WHEN 2 THEN '.wa.edu.au' WHEN 3 THEN '.org'
         |   ELSE '.com.br' END)) AS host
         |FROM documents)
         |SELECT doc_id, host,
         |  CASE WHEN $l3 IN ($in3) AND $l4 <> '' THEN $l4
         |       WHEN $l2 IN ($in2) AND $l3 <> '' THEN $l3
         |       ELSE $l2 END AS domain
         |FROM h ORDER BY doc_id""".stripMargin
    },

    "cu2_domain_cap" ->
      s"""WITH u AS (SELECT doc_id, n_chars, source || '.org' AS domain
         |  FROM documents),
         |r AS (SELECT *, ROW_NUMBER() OVER
         |    (PARTITION BY domain ORDER BY n_chars DESC, doc_id) AS rn
         |  FROM u)
         |-- CAST: DuckDB SUM(BIGINT) yields HUGEINT (int128) — the only
         |-- such output in the catalog, and the prime suspect for a
         |-- driver-side-only hash mismatch (pandas renders int128 as
         |-- object, not int64). BIGINT matches Spark's sum(long) exactly.
         |SELECT domain, COUNT(*) AS kept, CAST(SUM(n_chars) AS BIGINT) AS kept_chars
         |FROM r WHERE rn <= $DomainCap
         |GROUP BY domain ORDER BY domain""".stripMargin,

    // t9 per-doc scores, then discrete tercile thresholds at integer
    // ranks ceil(n/3)/ceil(2n/3) per language (value-at-rank is
    // tie-permutation-invariant), then the census
    "cx1_ppl_buckets" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |cnt AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
        |tot AS (SELECT COUNT(*) AS n_total FROM tok),
        |lpq AS (SELECT t.doc_id,
        |    CAST(FLOOR(ln(CAST(c.cnt AS DOUBLE) / CAST(n_total AS DOUBLE)) * 1000000.0) AS BIGINT) AS lp_q
        |  FROM tok t JOIN cnt c USING (tok) CROSS JOIN tot),
        |sc AS (SELECT l.doc_id, d.lang,
        |    CAST(SUM(lp_q) AS DOUBLE) / 1000000.0 / CAST(COUNT(*) AS DOUBLE) AS mean_logprob
        |  FROM lpq l JOIN documents d USING (doc_id) GROUP BY l.doc_id, d.lang),
        |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY mean_logprob, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY lang) AS n FROM sc),
        |thr AS (SELECT lang,
        |    MIN(CASE WHEN rn = (n + 2) // 3 THEN mean_logprob END) AS t1,
        |    MIN(CASE WHEN rn = (2 * n + 2) // 3 THEN mean_logprob END) AS t2
        |  FROM rk WHERE rn = (n + 2) // 3 OR rn = (2 * n + 2) // 3
        |  GROUP BY lang),
        |b AS (SELECT s.lang,
        |    CASE WHEN mean_logprob <= t1 THEN 'tail'
        |         WHEN mean_logprob <= t2 THEN 'middle'
        |         ELSE 'head' END AS bucket
        |  FROM sc s JOIN thr USING (lang))
        |SELECT lang, bucket, COUNT(*) AS n FROM b
        |GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin,

    "ck1_chunk_tokens" ->
      s"""SELECT doc_id, chunk_id, chunk_text, chunk_tokens
         |FROM ${Chunker.chunkSql("documents", "doc_id", "text", 32, 24)} c
         |ORDER BY doc_id, chunk_id""".stripMargin,

    "dc1_decontam_profile" ->
      s"""WITH $evalDocsSql,
         |cs AS ${TextDedup.Sql.shingleSets("documents", "doc_id", "text", DecontamN)},
         |es AS (SELECT DISTINCT shingle
         |       FROM ${TextDedup.Sql.shingleSets("eval", "doc_id", "text", DecontamN)} e)
         |SELECT cs.doc_id, COUNT(*) AS ngrams, COUNT(es.shingle) AS hits,
         |       COUNT(es.shingle) / COUNT(*) AS contamination
         |FROM cs LEFT JOIN es USING (shingle)
         |GROUP BY cs.doc_id ORDER BY cs.doc_id""".stripMargin,

    "dc2_decontaminate" ->
      s"""WITH $evalDocsSql,
         |cs AS ${TextDedup.Sql.shingleSets("documents", "doc_id", "text", DecontamN)},
         |es AS (SELECT DISTINCT shingle
         |       FROM ${TextDedup.Sql.shingleSets("eval", "doc_id", "text", DecontamN)} e),
         |flagged AS (SELECT DISTINCT cs.doc_id FROM cs JOIN es USING (shingle))
         |SELECT doc_id, text FROM documents
         |WHERE doc_id NOT IN (SELECT doc_id FROM flagged)
         |ORDER BY doc_id""".stripMargin,

    "pii1_redact" ->
      s"""SELECT doc_id, ${Redact.redactSql(s"($piiTextSql)")} AS redacted
         |FROM documents ORDER BY doc_id""".stripMargin,

    // same perturbed probes, same rounded-cosine max, same τ — and the
    // same CENSUS PRESERVATION: the corpus left-joins the scored rows,
    // so an empty probe set (a regen without vec_id % 41 rows) yields
    // every vector at max_cos NULL / contaminated 0 on BOTH sides
    // instead of a vacuous engine-vs-oracle divergence
    "dc3_semantic_decontam" -> {
      val S = graft.similarity.Similarity.Sql
      // the probe is a COMPUTED vector (zeroed-first-dim tail slice) —
      // it can be zero-norm even when the full fixture vector is
      // scorable, so the engine's probe-side scorable filter
      // (Decontam.probesLocal) must be mirrored here rather than
      // relying on the FixtureContractSpec pin (which covers only
      // full vectors; r15 ADVICE)
      s"""WITH probes AS MATERIALIZED (SELECT p FROM (
         |  SELECT list_prepend(CAST(0 AS FLOAT), embedding[2:]) AS p
         |  FROM embeddings WHERE vec_id % 41 = 0) zp
         |  WHERE ${S.scorable("p")}),
         |x AS (SELECT e.vec_id,
         |    round(${S.dot("e.embedding", "p.p")}
         |      / (sqrt(${S.dot("e.embedding", "e.embedding")})
         |        * sqrt(${S.dot("p.p", "p.p")})), 6) AS c
         |  FROM embeddings e CROSS JOIN probes p),
         |m AS (SELECT vec_id, MAX(c) AS max_cos FROM x GROUP BY vec_id)
         |SELECT e.vec_id, m.max_cos,
         |  CAST(CASE WHEN m.max_cos >= 0.9 THEN 1 ELSE 0 END AS BIGINT)
         |    AS contaminated
         |FROM embeddings e LEFT JOIN m ON m.vec_id = e.vec_id
         |ORDER BY e.vec_id""".stripMargin
    },

    // the trained-cell route replayed: km chain → assignment → probe
    // cell ranking (rounded + cell tiebreak) → within-cell scoring →
    // census-preserving left join
    "dc4_semantic_decontam_ivf" -> {
      val S = graft.similarity.Similarity.Sql
      s"""WITH ${S.kmeansCtes("embeddings", "vec_id", "embedding",
             k = 8, iters = 2, dim = 64)},
         |assigned AS MATERIALIZED (
         |  ${S.kmeansAssign("embeddings", "vec_id", "embedding", "c2")}),
         |dprobes AS MATERIALIZED (SELECT pid, p FROM (
         |    SELECT vec_id AS pid,
         |      list_prepend(CAST(0 AS FLOAT), embedding[2:]) AS p
         |    FROM embeddings WHERE vec_id % 41 = 0) zp
         |  WHERE ${S.scorable("p")}),
         |pcells AS (SELECT pid, p, cell FROM (
         |    SELECT d.pid, d.p, c.cell,
         |      ROW_NUMBER() OVER (PARTITION BY d.pid
         |        ORDER BY round(${S.dot("c.centroid", "c.centroid")}
         |          - 2 * ${S.dot("d.p", "c.centroid")}, 6), c.cell) AS pr
         |    FROM dprobes d CROSS JOIN c2 c) z
         |  WHERE pr <= 2),
         |x AS (SELECT a.vec_id,
         |    round(${S.dot("a.embedding", "pc.p")}
         |      / (sqrt(${S.dot("a.embedding", "a.embedding")})
         |        * sqrt(${S.dot("pc.p", "pc.p")})), 6) AS c
         |  FROM assigned a JOIN pcells pc ON pc.cell = a.cell),
         |m AS (SELECT vec_id, MAX(c) AS max_cos FROM x GROUP BY vec_id)
         |SELECT a.vec_id, CAST(a.cell AS INTEGER) AS cell, m.max_cos,
         |  CAST(CASE WHEN m.max_cos >= 0.9 THEN 1 ELSE 0 END AS BIGINT)
         |    AS contaminated
         |FROM assigned a LEFT JOIN m ON m.vec_id = a.vec_id
         |ORDER BY a.vec_id""".stripMargin
    },

    "bb2_bucket_suggest" -> {
      def one(k: Int) =
        s"""SELECT CAST($k AS BIGINT) AS k, MIN(len) AS boundary
           | FROM c CROSS JOIN t WHERE cum * 6 >= n * $k""".stripMargin
      s"""WITH h AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS len,
         |    COUNT(*) AS cnt
         |  FROM documents GROUP BY 1),
         |c AS (SELECT len, SUM(cnt) OVER (ORDER BY len
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM h),
         |t AS (SELECT SUM(cnt) AS n FROM h)
         |${one(1)} UNION ALL ${one(2)} UNION ALL ${one(3)}
         |UNION ALL ${one(4)} UNION ALL ${one(5)}
         |ORDER BY k""".stripMargin
    },

    "qd1_quality_deciles" -> {
      val q = graft.functions.TextAnalysis.Sql.qualityScore("text")
      s"""WITH d AS (SELECT
         |    LEAST(CAST(FLOOR(($q) * 10.0) AS BIGINT), 9) AS decile,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
         |  FROM documents),
         |g AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(n_toks) AS BIGINT) AS n_tokens
         |  FROM d GROUP BY decile)
         |SELECT decile, n_docs, n_tokens,
         |  CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE) AS mean_len
         |FROM g ORDER BY decile""".stripMargin
    },

    "lf1_lang_filter" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${graft.functions.TextAnalysis.Sql.langId("text")} = lang
         |ORDER BY doc_id""".stripMargin,

    "gq3_aux_rules" -> {
      val hashes = "#" * 30
      val nums = (1 to 30).mkString(" ")
      s"""WITH qdocs AS (SELECT doc_id, text ||
         | CASE WHEN doc_id % 19 = 0 THEN ' $hashes' ELSE '' END ||
         | CASE WHEN doc_id % 23 = 3 THEN ' $nums' ELSE '' END AS text
         | FROM documents),
         |tok AS (SELECT doc_id, u.tk FROM
         |  (SELECT doc_id, string_split(text, ' ') AS t FROM qdocs) s
         |  CROSS JOIN LATERAL unnest(t) AS u(tk)),
         |g AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |  CAST(SUM(CASE WHEN regexp_full_match(tk, '[0-9]+')
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_numeric_words
         | FROM tok GROUP BY doc_id),
         |sym AS (SELECT doc_id,
         |  CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
         |    AS n_hash,
         |  CAST((length(text) - length(replace(text, '...', 'x'))) // 2
         |    + (length(text) - length(replace(text, '…', ''))) AS BIGINT)
         |    AS n_ellipsis
         | FROM qdocs)
         |SELECT s.doc_id, g.n_words, s.n_hash, s.n_ellipsis,
         |  g.n_numeric_words,
         |  CAST(10 * (s.n_hash + s.n_ellipsis) <= g.n_words AS INT)
         |    AS r_symbol,
         |  CAST(5 * g.n_numeric_words <= g.n_words AS INT) AS r_numeric,
         |  CAST(10 * (s.n_hash + s.n_ellipsis) <= g.n_words
         |    AND 5 * g.n_numeric_words <= g.n_words AS INT) AS pass
         |FROM sym s JOIN g ON g.doc_id = s.doc_id
         |ORDER BY s.doc_id""".stripMargin
    },

    "tr1_truncate_middle" ->
      s"""SELECT doc_id, n_toks, n_dropped, text
         |FROM ${Chunker.truncateMiddleSql("documents", "doc_id", "text",
             64, 32)} q
         |ORDER BY doc_id""".stripMargin,

    "dcard1_dataset_card" -> {
      val q = graft.functions.TextAnalysis.Sql.qualityScore("text")
      s"""WITH a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         |  CAST(SUM(length(text)) AS BIGINT) AS n_chars,
         |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
         |  array_to_string(list_sort(list_distinct(array_agg(lang))), ',')
         |    AS langs,
         |  CAST(SUM(CAST(FLOOR(($q) * 1000000.0) AS BIGINT)) AS BIGINT)
         |    AS q_micros
         | FROM documents)
         |SELECT n_docs, n_tokens, n_chars, n_sources, langs, q_micros,
         |  CAST(q_micros AS DOUBLE) / CAST(n_docs * 1000000 AS DOUBLE)
         |    AS mean_quality
         |FROM a""".stripMargin
    },

    "dcard2_source_cards" -> {
      val q = graft.functions.TextAnalysis.Sql.qualityScore("text")
      s"""WITH a AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         |  CAST(SUM(length(text)) AS BIGINT) AS n_chars,
         |  array_to_string(list_sort(list_distinct(array_agg(lang))), ',')
         |    AS langs,
         |  CAST(SUM(CAST(FLOOR(($q) * 1000000.0) AS BIGINT)) AS BIGINT)
         |    AS q_micros
         | FROM documents GROUP BY source)
         |SELECT source, n_docs, n_tokens, n_chars, langs, q_micros,
         |  CAST(q_micros AS DOUBLE) / CAST(n_docs * 1000000 AS DOUBLE)
         |    AS mean_quality
         |FROM a ORDER BY source""".stripMargin
    },

    "pii2_pii_census" -> {
      val cs = Redact.censusSql(s"($piiTextSql)")
      val cols = cs.map { case (n, e) => s"$e AS n_$n" }.mkString(",\n  ")
      val total = cs.map(_._2).mkString(" + ")
      s"""SELECT doc_id,
         |  $cols,
         |  CAST($total AS BIGINT) AS n_pii,
         |  CAST(($total) = 0 AS INT) AS clean
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "mx2_temperature_mix" ->
      """WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents
        |  GROUP BY source),
        |q AS (SELECT source, n_docs,
        |    CAST(FLOOR(pow(CAST(n_docs AS DOUBLE), 0.75) * 1000000.0
        |      + 0.0001) AS BIGINT) AS qv
        |  FROM c)
        |SELECT source, n_docs,
        |  round(CAST(qv AS DOUBLE)
        |    / CAST((SELECT SUM(qv) FROM q) AS DOUBLE), 6) AS weight
        |FROM q ORDER BY source""".stripMargin,

    "mx1_epoch_mix" -> {
      def fullOf(w: Double) = math.floor(w).toInt
      def thrOf(w: Double) = Sampling.thresholdToken(w - math.floor(w))
      val fullCase = MixWeights.toSeq.sortBy(_._1)
        .map { case (s, w) => s"WHEN '$s' THEN ${fullOf(w)}" }
        .mkString("CASE d.source ", " ", s" ELSE ${fullOf(MixDefault)} END")
      val thrCase = MixWeights.toSeq.sortBy(_._1)
        .map { case (s, w) => s"WHEN '$s' THEN '${thrOf(w)}'" }
        .mkString("CASE d.source ", " ", s" ELSE '${thrOf(MixDefault)}' END")
      s"""SELECT d.doc_id, d.source, CAST(u.e AS BIGINT) AS epoch
         |FROM documents d
         |CROSS JOIN LATERAL unnest(range(0, ($fullCase) + 1)) AS u(e)
         |WHERE u.e < ($fullCase)
         |   OR substr(md5(CAST(d.doc_id AS VARCHAR) || '#' || CAST(u.e AS VARCHAR)), 1, 8)
         |      < ($thrCase)
         |ORDER BY d.doc_id, epoch""".stripMargin
    },

    // u = (60-bit md5 prefix + 0.5) / 2^60, key = the t9 nudged floor
    // floor(ln(u)/w·1e6 + 1e-4)/1e6: hex→int→double is cross-engine
    // exact, and the nudged floor (never round a raw transcendental —
    // the round-9 t13 lesson) absorbs ln's last-ulp libm skew
    "smp1_weighted_topk" ->
      """WITH s AS (SELECT doc_id, n_chars,
        |  floor(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#mix'), 1, 15))::UBIGINT::DOUBLE + 0.5)
        |           / 1152921504606846976.0) / n_chars * 1e6 + 1e-4) / 1e6 AS es_key
        |FROM documents WHERE n_chars > 0)
        |SELECT doc_id, n_chars, es_key FROM s
        |ORDER BY es_key DESC, doc_id LIMIT 100""".stripMargin,

    // survivors per the urlDocs construction: domain = source || '.org'
    // (blocked: src1/src3) and only doc_id % 9 = 0 rows carry
    // utm_campaign in the query string
    "cu4_blocklist" ->
      """SELECT doc_id, source FROM documents
        |WHERE source NOT IN ('src1', 'src3') AND doc_id % 9 <> 0
        |ORDER BY doc_id""".stripMargin,

    "smp2_weighted_stratified" ->
      """WITH s AS (SELECT doc_id, lang, n_chars,
        |  floor(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#mix'), 1, 15))::UBIGINT::DOUBLE + 0.5)
        |           / 1152921504606846976.0) / n_chars * 1e6 + 1e-4) / 1e6 AS es_key
        |FROM documents WHERE n_chars > 0),
        |r AS (SELECT *, ROW_NUMBER() OVER
        |  (PARTITION BY lang ORDER BY es_key DESC, doc_id) AS rn FROM s)
        |SELECT doc_id, lang, n_chars, es_key FROM r WHERE rn <= 20
        |ORDER BY lang, es_key DESC, doc_id""".stripMargin,

    "sh1_shuffle_order" ->
      """SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS ord
        |FROM documents ORDER BY doc_id""".stripMargin,

    "cur1_curriculum" -> {
      val q = graft.functions.TextAnalysis.Sql.qualityScore("text")
      s"""WITH s AS (SELECT doc_id, round($q, 6) AS q FROM documents),
         |r AS (SELECT doc_id, q,
         |    ROW_NUMBER() OVER (ORDER BY q DESC, doc_id) AS rn,
         |    COUNT(*) OVER () AS n
         |  FROM s),
         |thr AS (SELECT
         |    MIN(CASE WHEN rn = (n + 2) // 3 THEN q END) AS u1,
         |    MIN(CASE WHEN rn = (2 * n + 2) // 3 THEN q END) AS u2
         |  FROM r),
         |b AS (SELECT doc_id,
         |    CASE WHEN q >= u1 THEN 1 WHEN q >= u2 THEN 2 ELSE 3 END AS band,
         |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
         |      % 8 AS INT) AS shard,
         |    md5(CAST(doc_id AS VARCHAR)) AS h
         |  FROM s, thr)
         |SELECT doc_id, band, shard,
         |  ROW_NUMBER() OVER (PARTITION BY band, shard ORDER BY h, doc_id) AS pos
         |FROM b ORDER BY band, shard, pos""".stripMargin
    },

    "bl1_line_census" ->
      s"""WITH $lineRowsSql,
         |pairs AS (SELECT DISTINCT doc_id, line FROM lines)
         |SELECT line, CAST(COUNT(*) AS BIGINT) AS doc_freq
         |FROM pairs GROUP BY line HAVING COUNT(*) >= $BoilerFreq
         |ORDER BY doc_freq DESC, line""".stripMargin,

    "pk1_pack_spans" ->
      s"""SELECT pack_id, doc_id, doc_off, pack_off, n_toks
         |FROM ${Packing.packSpansSql("documents", "doc_id", "text", PackLen)} p
         |ORDER BY pack_id, doc_id""".stripMargin,

    "pk2_pack_fill" ->
      s"""SELECT pack_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(n_toks) AS BIGINT) AS fill
         |FROM ${Packing.packSpansSql("documents", "doc_id", "text", PackLen)} p
         |GROUP BY pack_id ORDER BY pack_id""".stripMargin,

    "bl2_boilerplate_strip" ->
      s"""WITH $lineRowsSql,
         |freq AS (SELECT line FROM (
         |   SELECT line, COUNT(DISTINCT doc_id) AS c FROM lines GROUP BY line) f
         | WHERE c >= $BoilerFreq)
         |SELECT doc_id, string_agg(line, chr(10) ORDER BY line_no, line) AS text
         |FROM lines
         |WHERE line NOT IN (SELECT line FROM freq)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "bb1_length_buckets" -> LengthBucketsOracleSql,

    "tb1_token_budget" -> {
      val q = graft.functions.TextAnalysis.Sql.qualityScore("text")
      s"""WITH d AS (SELECT doc_id, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
         |    round($q, 6) AS ql
         |  FROM documents),
         |c AS (SELECT doc_id, source, n_toks,
         |    SUM(n_toks) OVER (PARTITION BY source ORDER BY ql DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM d)
         |SELECT doc_id, source, n_toks FROM c
         |WHERE cum - n_toks < $TokenBudget ORDER BY doc_id""".stripMargin
    },

    "gm1_group_mean_filter" -> {
      val q = graft.functions.TextAnalysis.Sql.qualityScore("text")
      s"""SELECT doc_id, source FROM documents
         |WHERE source IN (
         |  SELECT source FROM (
         |    SELECT source,
         |      SUM(CAST(FLOOR(($q) * 1000000.0) AS BIGINT)) AS sq,
         |      COUNT(*) AS n
         |    FROM documents GROUP BY source) g
         |  WHERE sq >= $GroupMeanMicros * n)
         |ORDER BY doc_id""".stripMargin
    },

    "ds1_dup_spans" ->
      s"""WITH $sloganDocsSql,
         |${spanCteSql}
         |SELECT doc_id, span_start, span_end,
         |  span_end - span_start AS n_tokens
         |FROM spans ORDER BY doc_id, span_start""".stripMargin,

    "cf1_retention_funnel" -> {
      import graft.functions.TextAnalysis.Sql
      s"""WITH f AS (SELECT
         |    (${Sql.tokenCount("text")} >= 20) AS p1,
         |    (${Sql.qualityScore("text")} >= 0.45) AS p2,
         |    (${Sql.langId("text")} = 'en') AS p3
         |  FROM documents),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS s0,
         |    CAST(count_if(p1) AS BIGINT) AS s1,
         |    CAST(count_if(p1 AND p2) AS BIGINT) AS s2,
         |    CAST(count_if(p1 AND p2 AND p3) AS BIGINT) AS s3
         |  FROM f)
         |SELECT * FROM (
         |  SELECT 0 AS stage_id, 'total' AS stage, s0 AS survivors,
         |    CAST(s0 AS DOUBLE) / CAST(s0 AS DOUBLE) AS retained_frac FROM a
         |  UNION ALL SELECT 1, 'min_tokens', s1,
         |    CAST(s1 AS DOUBLE) / CAST(s0 AS DOUBLE) FROM a
         |  UNION ALL SELECT 2, 'quality', s2,
         |    CAST(s2 AS DOUBLE) / CAST(s0 AS DOUBLE) FROM a
         |  UNION ALL SELECT 3, 'english', s3,
         |    CAST(s3 AS DOUBLE) / CAST(s0 AS DOUBLE) FROM a)
         |ORDER BY stage_id""".stripMargin
    },

    "ds3_long_spans" ->
      s"""WITH $longSpanDocsSql,
         |${spanCteSqlOn("ldocs", LongSpanFreq, LongSpanMin)}
         |SELECT doc_id, span_start, span_end,
         |  span_end - span_start AS n_tokens
         |FROM spans ORDER BY doc_id, span_start""".stripMargin,

    "ds5_exact_long_spans" ->
      s"""WITH $longSpanDocsSql,
         |${exactSpanCteSqlOn("ldocs", LongSpanMin.toInt, 2L)}
         |SELECT doc_id, span_start, span_end,
         |  span_end - span_start AS n_tokens
         |FROM spans ORDER BY doc_id, span_start""".stripMargin,

    "ds6_strip_exact_spans" ->
      s"""WITH $longSpanDocsSql,
         |${exactSpanCteSqlOn("ldocs", LongSpanMin.toInt, 2L)},
         |mask AS (SELECT DISTINCT doc_id,
         |    unnest(generate_series(span_start, span_end - 1)) AS pos
         |  FROM spans),
         |tp AS (SELECT doc_id, i - 1 AS pos, t[i] AS tok
         |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM ldocs) s
         |  CROSS JOIN LATERAL unnest(generate_series(1, len(t))) AS u(i)),
         |kept AS (SELECT tp.doc_id, tp.pos, tp.tok
         |  FROM tp LEFT JOIN mask ON tp.doc_id = mask.doc_id AND tp.pos = mask.pos
         |  WHERE mask.pos IS NULL)
         |SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text
         |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "ds4_strip_long_spans" ->
      s"""WITH $longSpanDocsSql,
         |${spanCteSqlOn("ldocs", LongSpanFreq, LongSpanMin)},
         |mask AS (SELECT DISTINCT doc_id,
         |    unnest(generate_series(span_start, span_end - 1)) AS pos
         |  FROM spans),
         |tp AS (SELECT doc_id, i - 1 AS pos, t[i] AS tok
         |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM ldocs) s
         |  CROSS JOIN LATERAL unnest(generate_series(1, len(t))) AS u(i)),
         |kept AS (SELECT tp.doc_id, tp.pos, tp.tok
         |  FROM tp LEFT JOIN mask ON tp.doc_id = mask.doc_id AND tp.pos = mask.pos
         |  WHERE mask.pos IS NULL)
         |SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text
         |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "ds2_strip_spans" ->
      s"""WITH $sloganDocsSql,
         |${spanCteSql},
         |mask AS (SELECT DISTINCT doc_id,
         |    unnest(generate_series(span_start, span_end - 1)) AS pos
         |  FROM spans),
         |tp AS (SELECT doc_id, i - 1 AS pos, t[i] AS tok
         |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM sdocs) s
         |  CROSS JOIN LATERAL unnest(generate_series(1, len(t))) AS u(i)),
         |kept AS (SELECT tp.doc_id, tp.pos, tp.tok
         |  FROM tp LEFT JOIN mask ON tp.doc_id = mask.doc_id AND tp.pos = mask.pos
         |  WHERE mask.pos IS NULL)
         |SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text
         |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // first-occurrence-per-line via min(ord) + ord-ordered reassembly
    "bl3_intradoc_dedup" -> {
      val lineA = "array_to_string(string_split(text, ' ')[1:4], ' ')"
      s"""WITH built AS (SELECT doc_id,
         |    $lineA || chr(10) || text || chr(10) || $lineA AS text
         |  FROM documents),
         |lns AS (SELECT doc_id, t[i] AS line, i AS ord
         |  FROM (SELECT doc_id, string_split(text, chr(10)) AS t FROM built) s
         |  CROSS JOIN LATERAL unnest(generate_series(1, len(t))) AS u(i)),
         |firsts AS (SELECT doc_id, line, MIN(ord) AS ord
         |  FROM lns GROUP BY doc_id, line)
         |SELECT doc_id, string_agg(line, chr(10) ORDER BY ord) AS text
         |FROM firsts GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    // the bloom pre-filter is an execution detail — the semantics (and
    // the oracle) are the plain anti-join, e11's spelling
    "bf1_bloom_dedup" -> {
      val fp = graft.functions.TextAnalysis.Sql.normalizedFingerprint("text")
      s"""WITH store AS (SELECT DISTINCT $fp AS fp
         |  FROM documents WHERE doc_id % 3 = 0)
         |SELECT doc_id, text FROM documents
         |WHERE $fp NOT IN (SELECT fp FROM store)
         |ORDER BY doc_id""".stripMargin
    }
  )

  /** Shared CTE chain: positioned grams → distinct-doc census →
    * frequent-gram hits → gaps-and-islands merged spans, mirroring
    * [[graft.dedup.SpanMask]] stage for stage.
    */
  private def spanCteSql: String = spanCteSqlOn("sdocs", SpanFreq, 0L)

  /** Span-CTE chain over `src(doc_id, text)`: doc-freq floor `freq`,
    * merged islands kept only at >= `minSpan` tokens (the ds3 length
    * knob; 0 = ds1/ds2 behavior, the HAVING is then vacuous).
    */
  /** The EXACT criterion's CTE chain (ds5/ds6): md5'd L-gram
    * OCCURRENCE census (window count, the engine's one-shuffle
    * spelling) → coverage islands; ends in `spans`.
    */
  private def exactSpanCteSqlOn(src: String, spanTokens: Int,
                                minCount: Long): String =
    s"""grams AS (SELECT doc_id, i - 1 AS pos,
       |    md5(array_to_string(t[i:i+${spanTokens - 1}], ' ')) AS h
       |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM $src) s
       |  CROSS JOIN LATERAL unnest(generate_series(1, len(t) - ${spanTokens - 1})) AS u(i)
       |  WHERE len(t) >= $spanTokens),
       |hits AS (SELECT doc_id, pos, pos + $spanTokens AS e FROM (
       |    SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY h) AS c FROM grams) f
       |  WHERE c >= $minCount),
       |isl AS (SELECT doc_id, pos, e,
       |    MAX(e) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxend
       |  FROM hits),
       |grp AS (SELECT doc_id, pos, e,
       |    SUM(CASE WHEN maxend IS NULL OR pos > maxend THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
       |  FROM isl),
       |spans AS (SELECT doc_id, MIN(pos) AS span_start, MAX(e) AS span_end
       |  FROM grp GROUP BY doc_id, g)""".stripMargin

  private def spanCteSqlOn(src: String, freq: Long, minSpan: Long): String = {
    val gram = (0 until SpanN).map(j => s"t[i+$j]").mkString(" || ' ' || ")
    s"""grams AS (SELECT doc_id, i - 1 AS pos, $gram AS gram
       |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM $src) s
       |  CROSS JOIN LATERAL unnest(generate_series(1, len(t) - ${SpanN - 1})) AS u(i)
       |  WHERE len(t) >= $SpanN),
       |freq AS (SELECT gram FROM (
       |    SELECT gram, COUNT(DISTINCT doc_id) AS c FROM grams GROUP BY gram) f
       |  WHERE c >= $freq),
       |hits AS (SELECT doc_id, pos, pos + $SpanN AS e FROM grams
       |  WHERE gram IN (SELECT gram FROM freq)),
       |isl AS (SELECT doc_id, pos, e,
       |    MAX(e) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxend
       |  FROM hits),
       |grp AS (SELECT doc_id, pos, e,
       |    SUM(CASE WHEN maxend IS NULL OR pos > maxend THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
       |  FROM isl),
       |spans AS (SELECT doc_id, MIN(pos) AS span_start, MAX(e) AS span_end
       |  FROM grp GROUP BY doc_id, g
       |  HAVING MAX(e) - MIN(pos) >= $minSpan)""".stripMargin
  }
}

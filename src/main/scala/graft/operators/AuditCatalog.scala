package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 widening: audit / reconciliation / graph-signal operators a
  * production corpus pipeline runs AROUND the per-document transforms —
  * pre-ingest contract checks (dq1), snapshot reconciliation between
  * crawl drops (cd1), link-graph authority (pr1), scalable non-equi
  * range joins (rj1), Unicode canonicalization (tn1), sentence-level
  * dedup (sn1/sn2), winsorization (ws1), categorical association
  * (mi1), and mergeable-sketch cardinality (a21). Each gate has a
  * DuckDB oracle twin; exactness discipline per [[Exact]] (integer
  * verdicts, decimal-routed sums, integral-divide PageRank, quantized
  * transcendentals, sketch outputs as tolerance flags only).
  */
object AuditCatalog {

  private val auditStreamNo = new java.util.concurrent.atomic.AtomicInteger(0)

  /** pr1's deterministic 64-node link graph derived from events: src =
    * user bucket, dst = md5-hash bucket of the event id — both sides
    * re-derivable in SQL (the smp1 hex idiom). Self-loops dropped;
    * parallel edges deduped so each link counts once.
    */
  private def eventEdges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .filter($"user_id".isNotNull)
      .select(($"user_id" % 64).as("src"),
        (conv(substring(md5($"event_id".cast("string")), 1, 4), 16, 10)
          .cast("long") % 64).as("dst"))
      .filter($"src" =!= $"dst")
      .distinct()
  }

  /** cd1's "later snapshot" synthesized deterministically from the
    * documents fixture: doc_id%10==3 rows vanish (removed), %10==7 rows
    * gain a revision marker (changed), %10==1 rows are copied to new
    * ids (added), the rest ride along (unchanged). The oracle predicts
    * the census from the id arithmetic alone — it never joins, hashes,
    * or compares text.
    */
  private def snapshotB(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val a = Tables.documents(spark, dir).select($"doc_id", $"text", $"source")
    val kept = a.filter($"doc_id" % 10 =!= 3)
      .withColumn("text",
        when($"doc_id" % 10 === 7, concat($"text", lit(" [rev2]")))
          .otherwise($"text"))
    val added = a.filter($"doc_id" % 10 === 1)
      .select(($"doc_id" + 10000000L).as("doc_id"), $"text", $"source")
    kept.union(added)
  }

  /** tn1's synthesized non-ASCII corpus: fixture text is pure ASCII, so
    * accented forms are planted via translate (precomposed á/è/ö) plus
    * an appended COMBINING-mark suffix (a+U+0301, c+U+0327) that NFC
    * must compose and accent-stripping must reduce to bare letters.
    */
  private def accented(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        concat(translate($"text", "aeo", "áèö"),
          lit(" a\u0301c\u0327")).as("synth"))  // " a<U+0301>c<U+0327>"
  }

  /** sn1/sn2's sentence segmentation: RE2∩Java-portable split on
    * sentence-ending punctuation + space (no lookbehind — DuckDB's RE2
    * has none), empties dropped, ordinal = pre-filter position. A
    * cross-doc boilerplate sentence ("Subscribe…") is planted on every
    * fifth doc so the census is non-vacuous at any sf.
    */
  private def sentenceRows(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("text2", when($"doc_id" % 5 === 0,
          concat($"text", lit(". Subscribe to our newsletter today")))
        .otherwise($"text"))
      .select($"doc_id", posexplode(split($"text2", "[.!?]+ ")))
      .select($"doc_id", $"pos".cast("long").as("sent_no"),
        $"col".as("sentence"))
      .filter(trim($"sentence") =!= "")
  }

  private val sentSql =
    """sents AS (
      |  SELECT doc_id, CAST(u.i AS BIGINT) AS sent_no, s[u.i + 1] AS sentence
      |  FROM (SELECT doc_id, string_split_regex(
      |          CASE WHEN doc_id % 5 = 0
      |               THEN text || '. Subscribe to our newsletter today'
      |               ELSE text END,
      |          '[.!?]+ ') AS s
      |        FROM documents) d
      |  CROSS JOIN LATERAL unnest(range(0, len(s))) AS u(i)
      |  WHERE trim(s[u.i + 1]) <> '')""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SN1 — sentence-level cross-doc boilerplate census (the bl1
    // machinery at sentence granularity: distinct-doc counting with
    // map-side partials)
    "sn1_sentence_census" -> ((spark, dir) => {
      import spark.implicits._
      graft.quality.Boilerplate
        .frequentLines(sentenceRows(spark, dir), "doc_id", "sentence", 3L)
        .orderBy($"doc_freq".desc, $"sentence")
    }),

    // SN2 — sentence-level dedup: strip the frequent sentences and
    // reassemble (broadcast anti-join; the corpus never reshuffles)
    "sn2_sentence_strip" -> ((spark, dir) => {
      import spark.implicits._
      graft.quality.Boilerplate
        .stripFrequentLines(sentenceRows(spark, dir), "doc_id", "sent_no",
          "sentence", 3L)
        .orderBy($"doc_id")
    }),

    // RJ1 — point-in-interval range join at scale: every lineitem price
    // inside an order's [totalprice, totalprice+200) band, aggregated
    // per interval. Bucketed equi-join (see RangeJoin) — the oracle is
    // the O(n·m) non-equi join DuckDB brute-forces at sf0.01.
    "rj1_range_join" -> ((spark, dir) => {
      import spark.implicits._
      val pts = Tables.lineitem(spark, dir)
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
      val iv = Tables.orders(spark, dir)
        .select($"o_orderkey", $"o_totalprice".as("lo"),
          ($"o_totalprice" + 200.0).as("hi"))
      RangeJoin.pointInInterval(pts, "l_extendedprice", iv, "lo", "hi", 200.0)
        .groupBy($"o_orderkey")
        .agg(count(lit(1)).cast("long").as("n_points"),
          Exact.dsum($"l_extendedprice").as("sum_price"))
        .orderBy($"o_orderkey")
    }),

    // J6 — interval × interval OVERLAP join on the bucket grid (rj1's
    // two-sided sibling): order price bands vs lineitem price bands,
    // pairs counted exactly once via the canonical later-start bucket
    // (no distinct pass). The aggregate keeps the gate's row count
    // bounded while hashing the full match multiset.
    "j6_interval_overlap" -> ((spark, dir) => {
      import spark.implicits._
      val a = Tables.orders(spark, dir)
        .select($"o_orderkey", $"o_totalprice".as("a_lo"),
          ($"o_totalprice" + 500.0).as("a_hi"))
      val b = Tables.lineitem(spark, dir)
        .select($"l_orderkey", $"l_linenumber",
          $"l_extendedprice".as("b_lo"),
          ($"l_extendedprice" + 300.0).as("b_hi"))
      RangeJoin.intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi", 400.0)
        .groupBy($"o_orderkey")
        .agg(count(lit(1)).cast("long").as("n_overlaps"),
          Exact.dsum($"b_lo").as("sum_b_lo"))
        .orderBy($"o_orderkey")
    }),

    // DQ1 — one-pass declarative contract check (Expectations): five
    // constraints verified in a single aggregation; bounds(c_acctbal
    // >= 0) is planted to FAIL (negative balances exist), proving the
    // verdict path. Integer cross-multiplied pass flags.
    "dq1_expectations" -> ((spark, dir) => {
      import Expectations._
      verify(Tables.customer(spark, dir), Seq(
        Complete("c_name", 1.0),
        Unique("c_custkey"),
        Bounds("c_acctbal", -1000.0, 10000.0),
        Matches("c_name", "^Customer#[0-9]{9}$", 1.0),
        InSet("c_mktsegment",
          Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"),
          1.0)))
        .orderBy(col("check_name"))
    }),

    // CD1 — snapshot reconciliation census: fingerprint-compare two
    // corpus snapshots through ONE full-outer join (SnapshotDiff); the
    // planted drift (see snapshotB) is predicted by the oracle from id
    // arithmetic alone
    "cd1_corpus_diff" -> ((spark, dir) => {
      import spark.implicits._
      val a = Tables.documents(spark, dir).select($"doc_id", $"text", $"source")
      SnapshotDiff.census(a, snapshotB(spark, dir), "doc_id",
          Seq("text", "source"))
        .orderBy($"status")
    }),

    // PR1 — 3-iteration integer PageRank over the derived event link
    // graph; the oracle unrolls the identical integral-divide recurrence
    "pr1_pagerank" -> ((spark, dir) => {
      import spark.implicits._
      PageRank.ranks(eventEdges(spark, dir), "src", "dst", iterations = 3)
        .orderBy($"node")
    }),

    // A21 — mergeable-sketch cardinality across partitions/snapshots:
    // one Datasketches HLL per source (fixed-size state), merged with
    // hll_union_agg — the register-wise max merge is ORDER-INDEPENDENT,
    // which is what makes per-shard/per-day sketches composable at
    // 100 TB without re-scanning. Exact side oracled directly; the
    // estimate is sketch-implementation-specific, so it is gated as a
    // within-tolerance flag (the a10/a20 contract).
    "a21_hll_union" -> ((spark, dir) => {
      import spark.implicits._
      val d = Tables.documents(spark, dir)
      val merged = d.groupBy($"source")
        .agg(hll_sketch_agg($"doc_id").as("sk"))
        .agg(count(lit(1)).as("n_sources"),
          hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
      val exact = d.agg(count_distinct($"doc_id").as("exact_nd"))
      merged.crossJoin(exact)
        .select($"n_sources", $"exact_nd",
          (abs($"est" - $"exact_nd").cast("double") /
            $"exact_nd".cast("double") <= 0.05).cast("int").as("within_tol"))
    }),

    // WS1 — winsorization: clip events.value to the discrete [p05,p95]
    // percentiles (exact integer ranks; see Outliers.winsorize) — tail
    // repair where ol1 is tail removal
    "ws1_winsorize" -> ((spark, dir) => {
      import spark.implicits._
      Outliers.winsorize(
          Tables.events(spark, dir).select($"event_id", $"value"),
          "value", loPct = 5, hiPct = 95)
        .select($"event_id", $"value", $"value_winsor")
        .orderBy($"event_id")
    }),

    // MI1 — categorical association (mutual information + chi² /
    // Cramér's V) between documents.lang and documents.source —
    // quantized-int64 cell terms per the t9 discipline
    "mi1_mutual_info" -> ((spark, dir) =>
      Association.categoricalAssociation(
        Tables.documents(spark, dir), "lang", "source")),

    // E13 — streaming face of the contract check: the SAME constraint
    // metrics aggregate incrementally over a file stream in Complete
    // mode (conditional counts are streaming-aggregatable; Unique is
    // NOT — distinct aggregation is unsupported on streams, so the
    // streaming set is the contract minus uniqueness, which stays a
    // batch-audit concern). Final complete-mode row == the batch
    // verify, which the dq1-style oracle states directly.
    "e13_stream_expectations" -> ((spark, dir) => {
      import Expectations._
      val d = java.nio.file.Paths.get(graft.core.Staging.tmpDir("stream_dq"))
      java.nio.file.Files.createSymbolicLink(
        d.resolve("customer.parquet"),
        java.nio.file.Paths.get(s"$dir/customer.parquet"))
      val sch = spark.read.parquet(s"$dir/customer.parquet").schema
      val src = spark.readStream.schema(sch).parquet(d.toString)
      val checks = Seq(
        Complete("c_name", 1.0),
        Bounds("c_acctbal", -1000.0, 10000.0),
        Matches("c_name", "^Customer#[0-9]{9}$", 1.0),
        InSet("c_mktsegment",
          Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"),
          1.0))
      val sink = graft.streaming.EventStream.runToMemory(spark,
        metricsRow(src, checks),
        s"stream_dq_${auditStreamNo.incrementAndGet()}")
      explodeMetrics(sink, checks.size).orderBy(col("check_name"))
    }),

    // ML6 — smoothed target encoding (the high-cardinality-categorical
    // transform one-hot can't serve): per-priority mean order value
    // shrunk toward the global mean; decimal-routed sums, one fixed
    // IEEE blend
    "ml6_target_encode" -> ((spark, dir) => {
      import spark.implicits._
      graft.ml.TargetEncoder.fit(Tables.orders(spark, dir),
          "o_orderpriority", "o_totalprice", smoothing = 10.0)
        .orderBy($"o_orderpriority")
    }),

    // MI2 — correlation ratio η² (categorical × numeric association —
    // the cell mi1/a14 leave open): how much n_chars variance `lang`
    // explains; quantized per-group rational terms, order-independent
    "mi2_eta_squared" -> ((spark, dir) =>
      Association.etaSquared(Tables.documents(spark, dir), "lang", "n_chars")),

    // DD3 — two-sample KS distance (nonparametric drift beside dd1's
    // PSI): baseline events.value vs a planted-shift snapshot
    // (+5.0 on every fourth event); integer sup-norm, single division
    "dd3_ks_drift" -> ((spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
      val drifted = ev.select(
        when($"event_id" % 4 === 0, $"value" + 5.0)
          .otherwise($"value").as("value"))
      DriftKs.ksStatistic(ev.select($"value"), drifted, "value")
    }),

    // TN1 — Unicode canonicalization through the codegen'd native
    // expressions: NFC composes the planted combining marks, accent
    // stripping restores the ASCII letters translate swapped out
    "tn1_unicode_norm" -> ((spark, dir) => {
      import spark.implicits._
      import graft.functions.UnicodeNorm._
      accented(spark, dir).select($"doc_id",
          unicode_normalize($"synth", "NFC").as("nfc"),
          strip_accents($"synth").as("ascii"),
          // byte length of the NFD form: counts the split-off combining
          // marks unambiguously (char-length semantics differ across
          // engines on combining sequences; octet length cannot)
          octet_length(unicode_normalize($"synth", "NFD")).as("nfd_bytes"))
        .orderBy($"doc_id")
    }))

  private val prBase: String =
    """e AS (SELECT DISTINCT (user_id % 64) AS src,
      |    CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 4))::UBIGINT % 64 AS BIGINT) AS dst
      |  FROM events WHERE user_id IS NOT NULL),
      |e2 AS (SELECT src, dst FROM e WHERE src <> dst),
      |nodes AS (SELECT src AS node FROM e2 UNION SELECT dst FROM e2),
      |nn AS (SELECT COUNT(*) AS n FROM nodes),
      |od AS (SELECT src, COUNT(*) AS deg FROM e2 GROUP BY src)""".stripMargin

  /** One PageRank superstep as SQL (same integral arithmetic as the
    * engine: contribution = (85·r) // (100·deg), teleport base
    * (15·scale) // (100·n); `//` floors but every operand is
    * non-negative, so it agrees with Spark's truncating `div`).
    */
  private def prStep(prev: String, out: String): String =
    s"""$out AS (SELECT nd.node,
       |    (SELECT (15 * 1000000) // (100 * n) FROM nn)
       |    + COALESCE((SELECT SUM((85 * p.r) // (100 * od.deg))
       |                FROM e2 JOIN od USING (src) JOIN $prev p ON p.node = e2.src
       |                WHERE e2.dst = nd.node), 0) AS r
       |  FROM nodes nd)""".stripMargin

  def oracle: Map[String, String] = Map(

    "rj1_range_join" ->
      """SELECT o_orderkey, CAST(COUNT(*) AS BIGINT) AS n_points,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN lineitem
        |  ON l_extendedprice >= o_totalprice
        | AND l_extendedprice < o_totalprice + 200.0
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,

    "j6_interval_overlap" ->
      """SELECT o_orderkey, CAST(COUNT(*) AS BIGINT) AS n_overlaps,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_b_lo
        |FROM orders JOIN lineitem
        |  ON o_totalprice < l_extendedprice + 300.0
        | AND l_extendedprice < o_totalprice + 500.0
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,

    "dq1_expectations" ->
      """WITH m AS (
        |  SELECT 'complete(c_name)' AS check_name, COUNT(c_name) AS n_ok,
        |         COUNT(*) AS n_total, 1000000 AS thr FROM customer
        |  UNION ALL
        |  SELECT 'unique(c_custkey)', COUNT(DISTINCT c_custkey),
        |         COUNT(c_custkey), 1000000 FROM customer
        |  UNION ALL
        |  SELECT 'bounds(c_acctbal)',
        |         COUNT(CASE WHEN c_acctbal BETWEEN -1000.0 AND 10000.0 THEN 1 END),
        |         COUNT(c_acctbal), 1000000 FROM customer
        |  UNION ALL
        |  SELECT 'matches(c_name)',
        |         COUNT(CASE WHEN regexp_matches(c_name, '^Customer#[0-9]{9}$') THEN 1 END),
        |         COUNT(c_name), 1000000 FROM customer
        |  UNION ALL
        |  SELECT 'in_set(c_mktsegment)',
        |         COUNT(CASE WHEN c_mktsegment IN ('AUTOMOBILE','BUILDING',
        |           'FURNITURE','HOUSEHOLD','MACHINERY') THEN 1 END),
        |         COUNT(c_mktsegment), 1000000 FROM customer)
        |SELECT check_name, CAST(n_ok AS BIGINT) AS n_ok,
        |  CAST(n_total AS BIGINT) AS n_total,
        |  round(CAST(n_ok AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS ratio,
        |  CAST(CASE WHEN n_ok * 1000000 >= thr * n_total THEN 1 ELSE 0 END AS INTEGER) AS passed
        |FROM m ORDER BY check_name""".stripMargin,

    // predicted from the planted id arithmetic: %10==3 removed,
    // %10==7 changed, %10==1 duplicated to +10M ids (added), rest
    // unchanged — the engine must arrive at the same census through
    // the fingerprint full-outer join
    "cd1_corpus_diff" ->
      """WITH d AS (SELECT doc_id FROM documents)
        |SELECT 'added' AS status, CAST(COUNT(*) AS BIGINT) AS n,
        |  MIN(doc_id) + 10000000 AS min_id, MAX(doc_id) + 10000000 AS max_id
        |FROM d WHERE doc_id % 10 = 1
        |UNION ALL
        |SELECT 'changed', CAST(COUNT(*) AS BIGINT), MIN(doc_id), MAX(doc_id)
        |FROM d WHERE doc_id % 10 = 7
        |UNION ALL
        |SELECT 'removed', CAST(COUNT(*) AS BIGINT), MIN(doc_id), MAX(doc_id)
        |FROM d WHERE doc_id % 10 = 3
        |UNION ALL
        |SELECT 'unchanged', CAST(COUNT(*) AS BIGINT), MIN(doc_id), MAX(doc_id)
        |FROM d WHERE doc_id % 10 NOT IN (3, 7)
        |ORDER BY status""".stripMargin,

    "pr1_pagerank" ->
      s"""WITH $prBase,
         |r0 AS (SELECT node, (SELECT 1000000 // n FROM nn) AS r FROM nodes),
         |${prStep("r0", "i1")},
         |${prStep("i1", "i2")},
         |${prStep("i2", "i3")}
         |SELECT node, CAST(r AS BIGINT) AS rank_q FROM i3 ORDER BY node""".stripMargin,

    "e13_stream_expectations" ->
      """WITH m AS (
        |  SELECT 'complete(c_name)' AS check_name, COUNT(c_name) AS n_ok,
        |         COUNT(*) AS n_total, 1000000 AS thr FROM customer
        |  UNION ALL
        |  SELECT 'bounds(c_acctbal)',
        |         COUNT(CASE WHEN c_acctbal BETWEEN -1000.0 AND 10000.0 THEN 1 END),
        |         COUNT(c_acctbal), 1000000 FROM customer
        |  UNION ALL
        |  SELECT 'matches(c_name)',
        |         COUNT(CASE WHEN regexp_matches(c_name, '^Customer#[0-9]{9}$') THEN 1 END),
        |         COUNT(c_name), 1000000 FROM customer
        |  UNION ALL
        |  SELECT 'in_set(c_mktsegment)',
        |         COUNT(CASE WHEN c_mktsegment IN ('AUTOMOBILE','BUILDING',
        |           'FURNITURE','HOUSEHOLD','MACHINERY') THEN 1 END),
        |         COUNT(c_mktsegment), 1000000 FROM customer)
        |SELECT check_name, CAST(n_ok AS BIGINT) AS n_ok,
        |  CAST(n_total AS BIGINT) AS n_total,
        |  round(CAST(n_ok AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS ratio,
        |  CAST(CASE WHEN n_ok * 1000000 >= thr * n_total THEN 1 ELSE 0 END AS INTEGER) AS passed
        |FROM m ORDER BY check_name""".stripMargin,

    "sn1_sentence_census" ->
      s"""WITH $sentSql
         |SELECT sentence, CAST(COUNT(*) AS BIGINT) AS doc_freq
         |FROM (SELECT DISTINCT doc_id, sentence FROM sents)
         |GROUP BY sentence HAVING COUNT(*) >= 3
         |ORDER BY doc_freq DESC, sentence""".stripMargin,

    "sn2_sentence_strip" ->
      s"""WITH $sentSql,
         |freq AS (SELECT sentence FROM (
         |   SELECT sentence, COUNT(DISTINCT doc_id) AS c FROM sents
         |   GROUP BY sentence) f
         | WHERE c >= 3)
         |SELECT doc_id,
         |  string_agg(sentence, chr(10) ORDER BY sent_no, sentence) AS text
         |FROM sents
         |WHERE sentence NOT IN (SELECT sentence FROM freq)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "ml6_target_encode" ->
      s"""SELECT * FROM ${graft.ml.TargetEncoder.fitSql("orders",
           "o_orderpriority", "o_totalprice", 10.0)} te
         |ORDER BY o_orderpriority""".stripMargin,

    "mi2_eta_squared" ->
      s"""SELECT * FROM ${Association.etaSquaredSql("documents", "lang", "n_chars")} e""",

    "dd3_ks_drift" ->
      s"""SELECT * FROM ${DriftKs.sql("events",
           "(SELECT CASE WHEN event_id % 4 = 0 THEN value + 5.0 ELSE value END AS value FROM events) drifted",
           "value")} k""",

    "a21_hll_union" ->
      """SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS exact_nd,
        |  1 AS within_tol
        |FROM documents""".stripMargin,

    "ws1_winsorize" ->
      """WITH v AS (SELECT value FROM events WHERE value IS NOT NULL),
        |n AS (SELECT COUNT(*) AS n FROM v),
        |r AS (SELECT value, ROW_NUMBER() OVER (ORDER BY value) AS rn FROM v),
        |b AS (SELECT
        |  MIN(CASE WHEN rn = (SELECT (5 * n + 99) // 100 FROM n) THEN value END) AS lo,
        |  MIN(CASE WHEN rn = (SELECT (95 * n + 99) // 100 FROM n) THEN value END) AS hi
        |FROM r)
        |SELECT event_id, value,
        |  CASE WHEN value < lo THEN lo WHEN value > hi THEN hi
        |       ELSE value END AS value_winsor
        |FROM events CROSS JOIN b ORDER BY event_id""".stripMargin,

    "mi1_mutual_info" ->
      s"""SELECT * FROM ${Association.sql("documents", "lang", "source")} a""",

    "tn1_unicode_norm" ->
      """WITH s AS (SELECT doc_id, text,
        |  translate(text, 'aeo', 'áèö') || ' a' || chr(769) || 'c' || chr(807) AS synth
        |FROM documents)
        |SELECT doc_id,
        |  nfc_normalize(synth) AS nfc,
        |  strip_accents(nfc_normalize(synth)) AS ascii,
        |  -- NFD byte length predicted arithmetically (DuckDB has no
        |  -- nfd_normalize): each translated precomposed accent (2 bytes)
        |  -- splits into base+mark (3 bytes) under NFD, so +1 byte per
        |  -- planted a/e/o; the combining suffix is already decomposed
        |  CAST(strlen(synth)
        |    + (strlen(text) - strlen(translate(text, 'aeo', ''))) AS INTEGER) AS nfd_bytes
        |FROM s ORDER BY doc_id""".stripMargin)
}

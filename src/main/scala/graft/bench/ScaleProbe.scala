package graft.bench

import graft.core.Tables
import graft.dedup.TextDedup
import graft.quality.Dedup
import graft.similarity.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up rehearsal (dev tool): multiply the sf0.1 fixtures N× by
  * unioning id-offset copies, then time the shuffle-heavy operators.
  * The point is the growth CURVE — a pipeline whose cost grows
  * super-linearly here would melt at 100 TB regardless of constants.
  */
object ScaleProbe {

  private def multiply(df: DataFrame, idCol: String, copies: Int, offset: Long): DataFrame =
    ProbeUtil.multiply(df, idCol, copies, offset)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scale] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val mults = sys.env.get("SPARK_GRAFT_SCALE_MULTS")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(1, 4, 16))
    // SPARK_GRAFT_SCALE_OPS=cascade (or core, or cascade,core) selects
    // probe families — the 64× cascade arm shouldn't pay for the full
    // per-operator sweep and vice versa
    val only = sys.env.get("SPARK_GRAFT_SCALE_OPS")
      .map(_.split(",").map(_.trim).toSet)
    def enabled(fam: String): Boolean = only.forall(_.contains(fam))
    for (m <- mults) {
      println(s"--- multiplier $m")
      // flagship end-to-end: the multiplied-input curve for the whole
      // curation cascade (html strip → blocklist → quality → exact
      // dedup → LSH components → canonical → stratified sample → pack).
      // Each copy gets a tiny text perturbation keyed on its copy index,
      // so exact dedup keeps all m copies and the EXPENSIVE stages (LSH
      // band join, star-capped candidates, log-star components) see the
      // full m× corpus organized as m-sized near-dup clusters — the
      // worst-case shape for the near-dedup machinery, and the honest
      // one (verbatim copies would let exact dedup collapse the run).
      if (enabled("cascade")) {
        val docs = multiply(Tables.documents(spark, sfDir), "doc_id", m,
            10000000L)
          .withColumn("text",
            concat_ws(" ", col("text"), lit("rev"),
              expr("doc_id div 10000000").cast("string")))
          .repartition(64).cache()
        docs.count()
        time(s"curation_cascade x$m") {
          Pipelines.curationCascadeOn(spark, docs).count()
        }
        docs.unpersist()
        spark.catalog.clearCache()
      }
      // BPE apply: multiplied docs with every copy's WORDS suffixed by
      // its copy index — so the corpus AND the vocabulary both grow m×
      // (the honest Heaps'-law shape: vocab memoization is the whole
      // scale argument, so the probe must grow the part that defeats
      // it). Expected: the vocab-side merge loop grows m×, the
      // corpus-side broadcast join + reassembly grows m×; curve linear.
      if (enabled("bpe")) {
        val docs = multiply(
          Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
          "doc_id", m, 10000000L)
          .withColumn("text",
            // suffix every word with the copy index: 'key agg' (copy 2)
            // -> 'keyc2 aggc2' — new vocab entries per copy, same word
            // count; merges still apply to the [a-z] prefixes
            regexp_replace(col("text"), lit("(\\S+)"),
              concat(lit("$1c"),
                expr("doc_id div 10000000").cast("string"))))
          .repartition(64).cache()
        docs.count()
        time(s"bpe_tokenize x$m") {
          graft.functions.Bpe.tokenizeDocs(docs, "doc_id", "text",
            graft.functions.Bpe.FrozenMerges).count()
        }
        docs.unpersist()
        spark.catalog.clearCache()
      }
      // Trigram Kneser–Ney scoring: five vocabulary-keyed shuffled
      // joins (tcnt/tctx/cprime/midden/cdd) — the only join-heavy r16
      // operator without a measured curve. The word-suffix
      // perturbation grows the trigram/context/type tables WITH the
      // corpus (the honest Heaps shape — verbatim copies would let
      // the count tables collapse m-fold). Expected ~linear in m:
      // every join is shuffle-keyed on n-gram vocabulary; anything
      // superlinear means a join sprouted a broadcast of a growing
      // table. The filter terminal consumes mean_logscore so count()
      // cannot prune the score tree (the r16 semdc_xover trap).
      if (enabled("kn_trigram")) {
        val docs = multiply(
          Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
          "doc_id", m, 10000000L)
          .withColumn("text",
            regexp_replace(col("text"), lit("(\\S+)"),
              concat(lit("$1c"),
                expr("doc_id div 10000000").cast("string"))))
          .repartition(64).cache()
        docs.count()
        time(s"kn_trigram x$m") {
          graft.functions.TextAnalysis.kneserNeyTrigramLogProb(
            docs.filter(col("doc_id") % 2 === 1),
            docs.filter(col("doc_id") % 2 === 0),
            "doc_id", "text")
            .filter(col("mean_logscore") < 0.0).count()
        }
        docs.unpersist()
        spark.catalog.clearCache()
      }
      // Modified-KN scoring (t17): the t15-shaped joins PLUS the two
      // 1-row broadcasts (type total, counts-of-counts). Same
      // word-suffix perturbation so the (ctx, w) type table and the
      // counts-of-counts grow with the corpus. Expected ~linear; the
      // probe's point is that the per-context class censuses (t1/t2/
      // t3p) stay inside the one ctx-keyed aggregation — a second
      // shuffle or a growing broadcast would bend the curve.
      if (enabled("kn_modified")) {
        val docs = multiply(
          Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
          "doc_id", m, 10000000L)
          .withColumn("text",
            regexp_replace(col("text"), lit("(\\S+)"),
              concat(lit("$1c"),
                expr("doc_id div 10000000").cast("string"))))
          .repartition(64).cache()
        docs.count()
        time(s"kn_modified x$m") {
          graft.functions.TextAnalysis.kneserNeyModifiedLogProb(
            docs.filter(col("doc_id") % 2 === 1),
            docs.filter(col("doc_id") % 2 === 0),
            "doc_id", "text")
            .filter(col("mean_logscore") < 0.0).count()
        }
        docs.unpersist()
        spark.catalog.clearCache()
      }
      // BPE TRAINER per-round cost: double the merge count at each
      // corpus multiplier for both trainers. Expected: the incremental
      // trainer's r16→r32 delta ≈ its r8→r16 delta (per-round cost
      // FLAT in round number — later rounds fold only affected-word
      // deltas into the pair census), while the legacy trainer re-
      // symbolizes and re-applies every accumulated merge to the WHOLE
      // vocab each round, so its per-round cost grows with both m and
      // the round number. On gate-scale corpora job-scheduling latency
      // (~3 jobs/round incremental, 1 heavy job/round legacy) dominates
      // the constants; the curve, not the constant, is the claim.
      if (enabled("bpe_train")) {
        val docs = multiply(
          Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
          "doc_id", m, 10000000L)
          .withColumn("text",
            regexp_replace(col("text"), lit("(\\S+)"),
              concat(lit("$1c"),
                expr("doc_id div 10000000").cast("string"))))
          .repartition(64).cache()
        docs.count()
        for (r <- Seq(8, 16, 32)) time(s"bpe_train_incr r$r x$m") {
          graft.functions.Bpe.trainBytesIncremental(docs, "text", r).size.toLong
        }
        for (r <- Seq(8, 16, 32)) time(s"bpe_train_legacy r$r x$m") {
          graft.functions.Bpe.trainBytes(docs, "text", r).size.toLong
        }
        docs.unpersist()
        spark.catalog.clearCache()
      }
      // UNIGRAM Viterbi segmentation: words suffixed per copy with a
      // LETTER-mapped index (the [a-z]+ gate filter must keep them,
      // unlike the bpe arm's digit suffix), so the distinct-word DP
      // table — the part vocab memoization amortizes — grows m× along
      // with the corpus. Only base words of ≤ 10 chars take the 2-char
      // suffix: an 11–12-char base would cross MaxWordLen=12 and fall
      // out of the gate filter in EVERY copy, changing the word-length
      // composition (not just cardinality) vs the gate corpus and
      // confounding the "DP table grows m×" claim (r14 advice). The
      // rare 11+-char words stay unsuffixed — shared across copies, a
      // constant additive term that cannot bend the curve. Expected:
      // linear (DP per distinct word + broadcast join + reassembly,
      // the bpe_tokenize shape).
      if (enabled("unigram")) {
        val docs = multiply(
          Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
          "doc_id", m, 10000000L)
          .withColumn("text",
            regexp_replace(col("text"), lit("(?<!\\S)(\\S{1,10})(?!\\S)"),
              concat(lit("$1c"),
                translate(expr("doc_id div 10000000").cast("string"),
                  "0123456789", "abcdefghij"))))
          .repartition(64).cache()
        docs.count()
        time(s"unigram_segment x$m") {
          graft.functions.Unigram.viterbiSegment(docs, "doc_id", "text",
            graft.functions.Unigram.FrozenVocab).count()
        }
        docs.unpersist()
        spark.catalog.clearCache()
      }
      // UNIGRAM EM ROUND (r15): same multiplied corpus recipe as the
      // segment arm (≤10-char bases suffixed, distinct-word table
      // grows m×). One emRound = one prune-usage census over the
      // distinct-word DP + a model-sized collect; expected linear in
      // m (the DP memoization + one agg, the segment arm's shape).
      if (enabled("unigram_em")) {
        val docs = multiply(
          Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
          "doc_id", m, 10000000L)
          .withColumn("text",
            regexp_replace(col("text"), lit("(?<!\\S)(\\S{1,10})(?!\\S)"),
              concat(lit("$1c"),
                translate(expr("doc_id div 10000000").cast("string"),
                  "0123456789", "abcdefghij"))))
          .repartition(64).cache()
        docs.count()
        time(s"unigram_em x$m") {
          graft.functions.Unigram.emRound(docs, "text",
            graft.functions.Unigram.FrozenVocab, keepMulti = 12).size.toLong
        }
        docs.unpersist()
        spark.catalog.clearCache()
      }
      // SEMANTIC DECONTAMINATION (dc3's engine face, r15): corpus
      // grows m× against a FROZEN probe set (the novelty_admit shape —
      // the eval set is fixed at release time, the corpus is the
      // 100 TB side). Probes broadcast once; corpus rows stream
      // map-side through the probe cross into one per-id max.
      // Expected: linear in m, flat in everything else.
      if (enabled("semdecon")) {
        val probes = Tables.embeddings(spark, sfDir)
          .filter(col("vec_id") % 41 === 0)
          .select(col("embedding")).cache()
        probes.count()
        val emb = multiply(
          Tables.embeddings(spark, sfDir)
            .select(col("vec_id"), col("embedding")),
          "vec_id", m, 10000000L)
          .repartition(64).cache()
        emb.count()
        time(s"semantic_decontam x$m") {
          graft.dedup.Decontam.semanticProfile(emb, probes,
            "vec_id", "embedding", tau = 0.995).count()
        }
        probes.unpersist()
        emb.unpersist()
        spark.catalog.clearCache()
      }
      // BATCHED BPE merge selection (r15): rounds-per-merge is the
      // claim — the batched trainer must take strictly fewer census
      // snapshots than merges (the sequential trainers pay exactly
      // one). rows= prints the ROUND count for the curve.
      if (enabled("bpe_batched")) {
        val docs = multiply(
          Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
          "doc_id", m, 10000000L)
          .withColumn("text",
            regexp_replace(col("text"), lit("(\\S+)"),
              concat(lit("$1c"),
                expr("doc_id div 10000000").cast("string"))))
          .repartition(64).cache()
        docs.count()
        for (r <- Seq(32, 64)) time(s"bpe_batched r$r x$m (rows=rounds)") {
          graft.functions.Bpe.trainBytesBatchedWithStats(
            docs, "text", r, batchCap = 32)._2.toLong
        }
        docs.unpersist()
        spark.catalog.clearCache()
      }
      // EMBEDDING cascade (r16 flagship): corpus ×m with a per-copy
      // nudge on dim 1 so exact dedup keeps all m copies and the
      // semantic stages see m-sized near-dup clusters (cos ≈ 1 —
      // the text cascade's worst-case-honest shape transposed).
      // Expected: ~linear — every stage is assign/window/bounded-pair
      // work over materialized stage boundaries.
      if (enabled("embcascade")) {
        // per-copy SCALING (cosine-preserving): copies stay cos ≈ 1
        // near-dup clusters for SemDeDup while every residual slice
        // differs per copy — a dim-1-only nudge left the other
        // subspaces' residuals IDENTICAL across copies, emptying
        // Lloyd cells in the residual codebook at 16× (the loud
        // buildCodebookResidual guard, tripped honestly)
        val copyScale = lit(1.0f) +
          expr("vec_id div 10000000").cast("float") / lit(1000.0f)
        val embm = multiply(
          Tables.embeddings(spark, sfDir)
            .select(col("vec_id"), col("embedding")),
          "vec_id", m, 10000000L)
          .withColumn("embedding",
            transform(col("embedding"), x => (x * copyScale).cast("float")))
          .repartition(64).cache()
        embm.count()
        val dirn = graft.core.Staging.tmpDir(s"scale_embcascade_x$m")
        time(s"embedding_cascade x$m") {
          Pipelines.embeddingCascadeOn(spark, embm, dirn).count()
        }
        embm.unpersist()
        spark.catalog.clearCache()
      }
      // WEIGHTED mini-batch k-means step (e42's engine): one Sculley
      // step over an m× batch against a fixed k=8 state. Expected
      // linear — one k-row broadcast assign + one map-side-combined
      // wide agg (k·dim int64 scalars cross the shuffle) + a k-row
      // merge; nothing concentrates as m grows.
      if (enabled("kmeans_weighted")) {
        val embm = multiply(
          Tables.embeddings(spark, sfDir)
            .select(col("vec_id"), col("embedding")),
          "vec_id", m, 10000000L)
          .repartition(64).cache()
        embm.count()
        val seeds = Similarity.buildIvfHashInit(
          Tables.embeddings(spark, sfDir), "vec_id", "embedding", 8)
          .centroids
        time(s"kmeans_weighted_step x$m") {
          Similarity.kmeansMiniBatchStepWeighted(embm, "vec_id",
            "embedding", Similarity.kmeansWeightedInit(seeds, 64),
            dim = 64).count()
        }
        embm.unpersist()
        spark.catalog.clearCache()
      }
      // LLOYD'S K-MEANS: corpus grows m× (ids offset), model size
      // fixed (k=8, 3 rounds). Expected: linear — per round one
      // broadcast of k centroids across the corpus plus one
      // map-side-combined aggregation where only k·dim scalars cross
      // the shuffle; nothing concentrates as m grows.
      if (enabled("kmeans")) {
        val emb = multiply(
          Tables.embeddings(spark, sfDir)
            .select(col("vec_id"), col("embedding")),
          "vec_id", m, 10000000L)
          .repartition(64).cache()
        emb.count()
        time(s"kmeans_train x$m") {
          graft.similarity.Similarity.kmeansTrain(emb, "vec_id",
            "embedding", k = 8, iters = 3, dim = 64).means.count()
        }
        emb.unpersist()
        spark.catalog.clearCache()
      }
      // SEMANTIC decontamination: corpus grows m×; the probe set
      // (every 41st vector, perturbed) grows m× WITH it — the honest
      // shape, since real eval suites grow with releases too.
      // Expected: the per-row map work is corpus×probes, so the curve
      // is m² in the worst case BUT the probe side stays broadcast-
      // small at gate scale; the probe cap is the documented wall
      // (past it, route through ANN).
      if (enabled("semdc")) {
        val emb = multiply(
          Tables.embeddings(spark, sfDir)
            .select(col("vec_id"), col("embedding")),
          "vec_id", m, 10000000L)
          .repartition(64).cache()
        emb.count()
        val probes = graft.operators.CurationCatalog.dc3Probes(emb)
        time(s"semantic_decontam x$m") {
          graft.dedup.Decontam.semanticProfile(emb, probes, "vec_id",
            "embedding", tau = 0.9).count()
        }
        emb.unpersist()
        spark.catalog.clearCache()
      }
      // dc3-vs-dc4 CROSSOVER (r16): FROZEN 64×-enlarged corpus, probe
      // set grows m× (eval suites accrete across releases; the corpus
      // side is what the other semdc arms grow). dc3's exact path
      // scores corpus × probes — cost linear in m with the FULL corpus
      // as the slope. dc4 pays a fixed routing cost (train + assign
      // once, amortized over every release's probes) and then
      // corpus·nProbe/nCells per probe — the same linear m at a ~1/8
      // slope (nProbe=2 of 16 cells), so past the training constant
      // the exact line crosses it and keeps diverging. The corpus is
      // enlarged 64× so the corpus-sized slope is visible over
      // scheduling noise; rows= pins both censuses to that size.
      if (enabled("semdc_xover")) {
        val base = Tables.embeddings(spark, sfDir)
          .select(col("vec_id"), col("embedding"))
        val emb = multiply(base, "vec_id", 64, 100000000L)
          .repartition(64).cache()
        emb.count()
        val probes = multiply(
          base.filter(col("vec_id") % 41 === 0), "vec_id", m, 10000000L)
          .select(col("vec_id").as("probe_id"),
            concat(array(lit(0.0f)),
              slice(col("embedding"), lit(2), size(col("embedding")) - 1))
              .as("embedding"))
          .repartition(8).cache()
        probes.count()
        // sum(contaminated) as the terminal: a bare count() lets the
        // optimizer PRUNE max_cos and with it every pair cosine — the
        // probe would time join bookkeeping, not the scoring work
        time(s"semdc_exact_probes x$m") {
          graft.dedup.Decontam.semanticProfile(emb,
            probes.select(col("embedding")), "vec_id", "embedding",
            tau = 0.9)
            .agg(sum(col("contaminated"))).head().getLong(0)
        }
        time(s"semdc_ivf_probes x$m") {
          val cents = Similarity.kmeansTrain(emb, "vec_id", "embedding",
            k = 16, iters = 2, dim = 64).centroids
          graft.dedup.Decontam.semanticProfileIvf(emb, probes, "vec_id",
            "embedding", tau = 0.9, cents, nProbe = 2)
            .agg(sum(col("contaminated"))).head().getLong(0)
        }
        probes.unpersist()
        emb.unpersist()
        spark.catalog.clearCache()
      }
      // EXACT span dedup: multiplying COPIES the texts, so every
      // ≥50-token doc becomes fully duplicated m× — the worst-case
      // duplication regime (measured: output rows collapse to the
      // sub-50-token survivors, as the criterion demands) — and the
      // census window + island merge must stay linear in positions
      // regardless (the md5'd hash shuffle carries 16 bytes/position;
      // the O(L) gram build is map-side). Measured 6.0/3.1/5.8 s at
      // 1×/4×/16× — flat-to-linear.
      if (enabled("span_exact")) {
        val block = (1 to 60).map(i => s"dup$i").mkString(" ")
        val docs = multiply(
          Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
          "doc_id", m, 10000000L)
          .withColumn("text",
            when(pmod(col("doc_id"), lit(17)) === 0,
              concat(col("text"), lit(" " + block)))
              .otherwise(col("text")))
          .repartition(64).cache()
        docs.count()
        time(s"exact_span_strip x$m") {
          graft.dedup.SpanMask.stripDuplicatedSpansExact(docs,
            "doc_id", "text", spanTokens = 50, minCount = 2L).count()
        }
        docs.unpersist()
        spark.catalog.clearCache()
      }
      // Gopher char-fraction repetition cut: per-document work only
      // (positioned-gram flatMap + doc-keyed aggs/windows), so the
      // curve must be linear in rows regardless of content; plain
      // row multiplication is the honest shape.
      if (enabled("repetition")) {
        val docs = multiply(
          Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
          "doc_id", m, 10000000L).repartition(64).cache()
        docs.count()
        time(s"repetition_cut x$m") {
          graft.quality.Repetition.repetitionFilter(docs, "doc_id", "text")
            .count()
        }
        docs.unpersist()
        spark.catalog.clearCache()
      }
      // Containment admission: probes grow m× against a FIXED frozen
      // gram store (the incremental-ingestion shape the operator
      // ships). Copy-suffixed words make every copy's grams distinct,
      // so the store join sees m× probe grams with a realistic miss
      // rate; expected linear — the store side is built once.
      if (enabled("novelty")) {
        val store = graft.dedup.TextDedup.shingleSets(
          Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
          "doc_id", "text", k = 5).cache()
        store.count()
        val probes = multiply(
          Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
          "doc_id", m, 10000000L)
          .withColumn("text",
            regexp_replace(col("text"), lit("(\\S+)"),
              concat(lit("$1c"),
                expr("doc_id div 10000000").cast("string"))))
          .repartition(64).cache()
        probes.count()
        time(s"novelty_admit x$m") {
          graft.dedup.TextDedup.containmentAdmit(
            probes, "doc_id", "text", store, k = 5).count()
        }
        probes.unpersist()
        store.unpersist()
        spark.catalog.clearCache()
      }
      // PageRank: multiplied events → m disjoint subgraphs (copy-offset
      // node ids), so nodes AND edges grow m× while structure stays
      // comparable. Fixed 8 supersteps — past the every-4 localCheckpoint
      // cadence, so the probe times the truncated-lineage plan the
      // operator actually ships. Per superstep only (node, long) pairs
      // shuffle; the expected curve is linear in m.
      if (enabled("pagerank")) {
        val ev = multiply(
          Tables.events(spark, sfDir).filter(col("user_id").isNotNull)
            .select(col("user_id"), col("event_id")),
          "event_id", m, 10000000L).repartition(64).cache()
        ev.count()
        time(s"pagerank x$m (iters=8)") {
          val copy = expr("event_id div 10000000")
          val edges = ev.select(
            (col("user_id") + copy * 1000000L).as("src"),
            ((conv(substring(md5(col("event_id").cast("string")), 1, 4), 16, 10)
              .cast("long") % 100000L) + copy * 1000000L).as("dst"))
            .filter(col("src") =!= col("dst"))
          graft.operators.PageRank.ranks(edges, "src", "dst", iterations = 8)
            .count()
        }
        ev.unpersist()
        spark.catalog.clearCache()
      }
      if (enabled("core")) {
      val li = multiply(Tables.lineitem(spark, sfDir), "l_orderkey", m, 1000000000L)
        .repartition(64).cache()
      li.count()
      val keys = li.columns.toSeq.filterNot(_ == "l_quantity")
      time(s"dedup_window x$m") {
        Dedup.dedupByOccurrence(
          Dedup.withOccurrenceId(li, keys, Seq(col("l_quantity")))).count()
      }
      time(s"dedup_exact x$m") {
        Dedup.dropExactDuplicates(li.drop("l_quantity")).count()
      }
      li.unpersist()

      // materialize inputs before timing (same methodology as the
      // lineitem block) so the curves measure operator cost, not the
      // union/scan of the multiplied input
      val docs = multiply(
        Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
        "doc_id", m, 1000000L).repartition(64).cache()
      docs.count()
      time(s"minhash_lsh x$m") {
        val sh = TextDedup.shingleSets(docs, "doc_id", "text", distinct = false)
        TextDedup.candidatePairs(
          TextDedup.bandKeys(TextDedup.minhashSignatures(sh, "doc_id"), "doc_id"),
          "doc_id").count()
      }
      // planted duplicate cluster growing with m: 250·m exact copies of
      // one doc land in one LSH bucket per band. The star cap makes the
      // candidate count (rows=) and runtime grow LINEARLY in the cluster
      // size — uncapped, the same probe is m²: 4 000 copies → 8 M pairs
      // from a single bucket, and a crawl-scale 96 k-copy key → 4.6 B.
      time(s"lsh_star_cap x$m (cluster=${250 * m})") {
        val one = Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text")).filter(col("doc_id") === 0)
        val cluster = one.crossJoin(
            spark.range(1, 250L * m + 1).select(col("id").as("i")))
          .select((lit(5000000L) + col("i")).as("doc_id"), col("text"))
        val corpus = docs.union(cluster)
        val sh = TextDedup.shingleSets(corpus, "doc_id", "text", distinct = false)
        TextDedup.candidatePairs(
          TextDedup.bandKeys(TextDedup.minhashSignatures(sh, "doc_id"), "doc_id"),
          "doc_id").count()
      }
      time(s"tfidf x$m") {
        graft.functions.TextAnalysis.tfidf(docs, "doc_id", "text").count()
      }
      time(s"repetition x$m") {
        graft.functions.TextAnalysis.repetitionProfile(docs, "doc_id", "text").count()
      }
      // multiply copies texts verbatim, so every line's doc-frequency
      // rises m× — the census/anti-join/reassembly cost is what's timed
      time(s"boilerplate x$m") {
        val segs = graft.operators.Chunker
          .chunkByTokens(docs, "doc_id", "text", 16, 16)
          .select(col("doc_id"), col("chunk_id").as("line_no"),
            col("chunk_text").as("line"))
        graft.quality.Boilerplate
          .stripFrequentLines(segs, "doc_id", "line_no", "line", 4L * m)
          .count()
      }
      // multiply copies texts verbatim, so every gram's doc-frequency
      // rises m× — threshold scales with m to keep the census shape
      // comparable (the boilerplate row's convention)
      time(s"dup_span_strip x$m") {
        graft.dedup.SpanMask.stripDuplicatedSpans(docs, "doc_id", "text",
          n = 5, minDocFreq = 4L * m).count()
      }
      time(s"pack_spans x$m") {
        graft.operators.Packing
          .packSpans(docs, "doc_id", "text", seqLen = 512, buckets = 256)
          .count()
      }
      docs.unpersist()
      spark.catalog.clearCache()

      val emb = multiply(Tables.embeddings(spark, sfDir), "vec_id", m, 1000000L)
        .repartition(64).cache()
      emb.count()
      time(s"ann_lsh x$m") {
        Pipelines.lshTopKOn(emb).count()
      }
      emb.unpersist()
      spark.catalog.clearCache()


      // secondary-sort folds: multiplying events on event_id keeps the
      // key set fixed, so per-key runs grow m× — the curve shows the
      // fold is linear in run length (O(1) state, spillable sort)
      val ev = multiply(
        Tables.events(spark, sfDir).select(col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"),
          col("value"), col("event_type"))
          .filter(col("user_id").isNotNull),
        "event_id", m, 10000000L).repartition(64).cache()
      ev.count()
      time(s"ewma_fold x$m") {
        graft.operators.Ewma.ewmaLast(ev.filter(col("value").isNotNull),
          "user_id", "value", Seq("ts_us", "event_id"), 0.25).count()
      }
      time(s"funnel x$m") {
        graft.operators.Sequences.funnelStages(ev, "user_id", "event_type",
          Seq("ts_us", "event_id"), Seq("signup", "click", "purchase")).count()
      }
      ev.unpersist()

      // streaming rollup: the one benched subsystem that regressed
      // unnoticed in round 4 (host noise, but the miss was real) now
      // gets its own curve. Staged as m files + maxFilesPerTrigger=1 →
      // exactly m micro-batches, so the row separates per-batch
      // fixed cost (state-store open/commit per instance per batch)
      // from per-row throughput. State partitions sized for state
      // volume, not cores — EventStream.stateSizedSession.
      val evStream = multiply(Tables.events(spark, sfDir), "event_id", m,
        10000000L)
      val streamDir = graft.core.Staging.tmpDir(s"scale_stream_x$m")
      evStream.repartition(m).write.mode("overwrite").parquet(streamDir)
      val stagedSchema = spark.read.parquet(streamDir).schema
      time(s"stream_rollup x$m (batches=$m)") {
        val ss = graft.streaming.EventStream.stateSizedSession(spark, 8)
        val src = ss.readStream.schema(stagedSchema)
          .option("maxFilesPerTrigger", 1).parquet(streamDir)
        graft.streaming.EventStream.runToMemory(ss,
          graft.streaming.EventStream.tumblingCounts(src),
          s"scale_stream_sink_x$m").count()
      }

      // fuzzy blocking: multiplying customers grows each nation block
      // m×, so the intra-block pair count grows m² — the curve makes
      // the quadratic-in-block-size cost (and why block choice is the
      // dial) measurable. m=16 would be 1.2B Levenshtein calls; the
      // block key, not the engine, is what must cap that.
      if (m <= 4) {
        val cust = multiply(
          Tables.customer(spark, sfDir).select(col("c_custkey"),
            col("c_name"), col("c_nationkey")),
          "c_custkey", m, 10000000L).repartition(64).cache()
        cust.count()
        time(s"fuzzy_pairs x$m") {
          graft.operators.Fuzzy.blockedEditDistancePairs(cust,
            "c_custkey", "c_name", Seq("c_nationkey"), 2).count()
        }
        cust.unpersist()
      }
      // range join: multiplying BOTH sides m× grows the matched-pair
      // count m² (every point meets m× more intervals) — output-
      // inherent, like fuzzy_pairs' block growth, NOT a plan defect;
      // the curve documents that bucketWidth dials the candidate:match
      // ratio while the match count belongs to the data
      if (m <= 4) {
        val pts = multiply(
          Tables.lineitem(spark, sfDir).select(col("l_orderkey"),
            col("l_extendedprice")), "l_orderkey", m, 1000000000L)
          .repartition(64).cache()
        val iv = multiply(
          Tables.orders(spark, sfDir).select(col("o_orderkey"),
            col("o_totalprice")), "o_orderkey", m, 1000000000L)
          .select(col("o_orderkey"), col("o_totalprice").as("lo"),
            (col("o_totalprice") + 200.0).as("hi"))
          .repartition(64).cache()
        pts.count(); iv.count()
        time(s"range_join x$m") {
          graft.operators.RangeJoin
            .pointInInterval(pts, "l_extendedprice", iv, "lo", "hi", 200.0)
            .groupBy(col("o_orderkey"))
            .agg(count(lit(1)).as("n"))
            .count()
        }
        pts.unpersist(); iv.unpersist()
      }
      spark.catalog.clearCache()
      } // enabled("core")
      // image near-dup: the fixture's hash space has period 1280 in
      // doc_id, so multiplying ids grows every equal-hash run ~m× —
      // the run-star cap must keep edges (rows=) and time LINEAR in
      // the duplicate-cluster size (the all-pairs spelling is m² in
      // the run and measured 72 s at m=1 before the cap)
      if (enabled("image")) time(s"image_neardup x$m") {
        val ids = multiply(
          Tables.documents(spark, sfDir).select(col("doc_id")),
          "doc_id", m, 10000000L)
        import spark.implicits._
        // the gate fixture's own image builder (one corpus for gate,
        // bench, and probe — r13 ADVICE); only the id-multiply offset
        // is probe-local
        val payloads = ids.as[Long]
          .map(id => (id,
            graft.operators.StreamMediaCatalog.dhashImage(id, 0)))
          .toDF("doc_id", "payload")
        TextDedup.simhashCandidates(
          graft.multimodal.BinaryOps.dHashes(payloads).toDF()
            .withColumnRenamed("dhash", "simhash"),
          "doc_id", maxHamming = 3, bits = 64, bucketCap = 32).count()
      }
      spark.catalog.clearCache()
      // audio near-dup (r15): same recipe over the m16 clip builder —
      // decode + energy hashing is map-only (PlanSpec pins it), so the
      // curve should track the banding join like the image arm's
      if (enabled("audio")) time(s"audio_neardup x$m") {
        val ids = multiply(
          Tables.documents(spark, sfDir).select(col("doc_id")),
          "doc_id", m, 10000000L)
        import spark.implicits._
        val payloads = ids.as[Long]
          .map(id => (id,
            graft.operators.StreamMediaCatalog.audioClip(id, pert = false)))
          .toDF("doc_id", "payload")
        TextDedup.simhashCandidates(
          graft.multimodal.BinaryOps.audioHashes(payloads).toDF()
            .withColumnRenamed("ahash", "simhash"),
          "doc_id", maxHamming = 3, bits = 64, bucketCap = 32).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

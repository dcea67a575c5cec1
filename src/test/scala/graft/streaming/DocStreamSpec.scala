package graft.streaming

import org.apache.spark.sql.functions._

class DocStreamSpec extends graft.SparkSpec {
  import spark.implicits._

  private def stageTwoBatches(): String = {
    val dir = graft.core.Staging.tmpDir("docstream_spec")
    Seq((1L, "the quick brown fox and the lazy dog went to the market today", "en", "src0", 10L),
      (2L, "x@y.example.com !!!", "en", "src0", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/b1")
    Seq((3L, "a fine day for training data with many of the usual tokens in it", "en", "src1", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/b2")
    // flatten both batches into one source dir as separate files
    val out = graft.core.Staging.tmpDir("docstream_src")
    val fs = java.nio.file.Paths.get(out)
    for (b <- Seq("b1", "b2")) {
      val src = java.nio.file.Paths.get(dir, b)
      java.nio.file.Files.list(src).filter(_.toString.endsWith(".parquet"))
        .forEach(p => java.nio.file.Files.copy(p, fs.resolve(s"${b}_${p.getFileName}")))
    }
    out
  }

  test("stateless curation over a multi-file source equals the batch pipeline") {
    val src = stageTwoBatches()
    val streamed = EventStream.runToMemory(spark,
      DocStream.curate(DocStream.read(spark, src), minQuality = 0.4),
      "docstream_parity",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .orderBy("doc_id").collect().toSeq
    val batch = DocStream.curate(spark.read.parquet(src), minQuality = 0.4)
      .orderBy("doc_id").collect().toSeq
    assert(streamed == batch)
    // the quality gate actually dropped the junk doc
    assert(batch.map(_.getLong(0)) == Seq(1L, 3L))
  }

  test("store-dedup drops known fingerprints across batches, admits new ones") {
    val src = stageTwoBatches()
    // history contains doc 1's normalized text (case/whitespace varied —
    // the normalized fingerprint must still match)
    val store = Seq("The  Quick  Brown fox and the lazy dog went to the market TODAY")
      .toDF("text")
      .select(graft.functions.TextAnalysis
        .normalizedFingerprint($"text").as("fp"))
    val out = EventStream.runToMemory(spark,
      DocStream.dedupAgainstStore(
        DocStream.read(spark, src).select($"doc_id", $"text"), store),
      "docstream_store_dedup",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .orderBy("doc_id").collect().toSeq
    assert(out.map(_.getLong(0)) == Seq(2L, 3L),
      "doc 1 is in history (normalization-invariant); 2 and 3 are new")
  }

  test("near-dup filter: band keys match the batch LSH path exactly") {
    import graft.dedup.TextDedup
    // per-row compiled band keys vs the batch explode→agg spelling,
    // over fixture docs (incl. whatever null/short texts it carries)
    val docs = graft.core.Tables.documents(spark, sf001).limit(200)
    val batch = TextDedup.bandKeys(
      TextDedup.minhashSignatures(
        TextDedup.shingleSets(docs, "doc_id", "text", distinct = false),
        "doc_id"), "doc_id")
      .select($"doc_id", $"band_id", $"band_key")
      .as[(Long, Int, String)].collect().toSet
    val rowLevel = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect()
      .flatMap { case (id, text) =>
        DocStream.bandKeysOf(text).toSeq.flatMap(_.zipWithIndex.map {
          case (key, b) => (id, b, key)
        })
      }.toSet
    assert(rowLevel == batch)
    assert(batch.nonEmpty)
  }

  test("near-dup filter drops band-sharing docs across batches, admits the rest") {
    import graft.dedup.TextDedup
    val src = stageTwoBatches()
    // the store holds doc 1's text verbatim (same shingles ⇒ all bands
    // agree) — doc 1 must drop in whatever micro-batch it arrives;
    // docs 2 (too short to shingle) and 3 (unrelated) are admitted
    val storeDocs = Seq(
      (100L, "the quick brown fox and the lazy dog went to the market today"))
      .toDF("doc_id", "text")
    val store = TextDedup.bandKeys(
      TextDedup.minhashSignatures(
        TextDedup.shingleSets(storeDocs, "doc_id", "text",
          distinct = false), "doc_id"), "doc_id")
      .select($"band_id", $"band_key")
    val out = EventStream.runToMemory(spark,
      DocStream.nearDupAgainstStore(DocStream.read(spark, src), store),
      "docstream_neardup",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .orderBy("doc_id").collect().toSeq
    assert(out.map(_.getLong(0)) == Seq(2L, 3L),
      "doc 1 shares every band with the store; 2 has no shingles; 3 is new")
  }

  test("token-budget admission carries per-group state across micro-batches") {
    // budget 10 per source. Batch 1: a/1 (6 toks, admits, 6 used),
    // a/2 (5, STARTS inside 10 -> admits, 11 used), b/3 (4, admits).
    // Batch 2: a/4 (1, budget exhausted -> rejected), b/5 (7, starts
    // at 4 < 10 -> admits), b/6 (1, starts at 11 -> rejected).
    val dir = graft.core.Staging.tmpDir("docstream_tb")
    Seq((1L, "a", 6L), (2L, "a", 5L), (3L, "b", 4L))
      .toDF("doc_id", "source", "n_toks").coalesce(1)
      .write.parquet(s"$dir/b1")
    Seq((4L, "a", 1L), (5L, "b", 7L), (6L, "b", 1L))
      .toDF("doc_id", "source", "n_toks").coalesce(1)
      .write.parquet(s"$dir/b2")
    val src = graft.core.Staging.tmpDir("docstream_tb_src")
    // the file source orders batches by MODIFICATION TIME and breaks
    // ties arbitrarily — admission is an arrival-order prefix, so the
    // test must pin distinct timestamps or b2-first is a legal (and
    // observed) delivery that admits everything
    for ((b, i) <- Seq("b1", "b2").zipWithIndex) {
      val p = java.nio.file.Paths.get(dir, b)
      java.nio.file.Files.list(p).filter(_.toString.endsWith(".parquet"))
        .forEach { q =>
          val dst = java.nio.file.Paths.get(src, s"${b}_${q.getFileName}")
          java.nio.file.Files.copy(q, dst)
          java.nio.file.Files.setLastModifiedTime(dst,
            java.nio.file.attribute.FileTime.fromMillis(
              System.currentTimeMillis() - 60000L + i * 30000L))
        }
    }
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_toks",
          org.apache.spark.sql.types.LongType))))
      .option("maxFilesPerTrigger", 1).parquet(src)
    val out = EventStream.runToMemory(spark,
      DocStream.tokenBudgetUpdates(stream, "doc_id", "source", "n_toks",
        budget = 10L).toDF(),
      "docstream_tb_sink",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .orderBy("doc_id").collect().toSeq
    assert(out.map(_.getLong(1)) == Seq(1L, 2L, 3L, 5L),
      s"expected 1,2,3,5 admitted; got $out")
  }

  test("chunk fan-out streams: one row per window, parity with batch chunker") {
    val src = stageTwoBatches()
    val streamed = EventStream.runToMemory(spark,
      DocStream.chunk(DocStream.read(spark, src), size = 4, stride = 4),
      "docstream_chunks",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .orderBy("doc_id", "chunk_id").collect().toSeq
    val batch = graft.operators.Chunker.chunkByTokens(
      spark.read.parquet(src), "doc_id", "text", 4, 4)
      .orderBy("doc_id", "chunk_id").collect().toSeq
    assert(streamed == batch)
    assert(streamed.size > 3, "fan-out produced multiple chunks per doc")
  }

  test("fused quality gate: every rule boundary decided on the correct side") {
    // The e21 gate passes only 3 docs at verify scale, so most rule
    // branches are exercised by exclusion there (r11 ADVICE #4); this
    // arm plants one doc ON each boundary and one just OFF it, plus a
    // badword-only rejection. The gate is a pure select/filter, so
    // batch application exercises the identical Column tree the
    // stream runs.
    val word = "word" // 4 chars, alpha
    def doc(ws: Seq[String]) = ws.mkString(" ")
    val base48 = Seq.fill(48)(word) ++ Seq("the", "to") // 50 words, 2 stops
    val docs = Seq(
      // n_words boundaries (minWords=50, maxWords=60 for a cheap cap)
      1L -> doc(base48),                                   // 50 → PASS
      2L -> doc(base48.drop(1)),                           // 49 → reject (min)
      3L -> doc(Seq.fill(58)(word) ++ Seq("the", "to")),   // 60 → PASS (max)
      4L -> doc(Seq.fill(59)(word) ++ Seq("the", "to")),   // 61 → reject (max)
      // mean-length low boundary: sum_len == 3n passes, 3n-1 rejects
      5L -> doc(Seq.fill(47)("abc") ++ Seq("abcd", "the", "to")),  // 150 = 3·50 → PASS
      6L -> doc(Seq.fill(48)("abc") ++ Seq("the", "to")),          // 149 → reject
      // mean-length high boundary: sum_len == 10n passes, 10n+1 rejects
      7L -> doc(Seq.fill(45)("abcdefghij") ++
        Seq.fill(3)("abcdefghijklmno") ++ Seq("the", "to")),       // 500 = 10·50 → PASS
      8L -> doc(Seq.fill(45)("abcdefghij") ++ Seq.fill(2)("abcdefghijklmno") ++
        Seq("abcdefghijklmnop", "the", "to")),                     // 501 → reject
      // alpha-ratio boundary: 40/50 alpha passes (10·40 ≥ 8·50), 39 rejects
      9L -> doc(Seq.fill(38)(word) ++ Seq("the", "to") ++ Seq.fill(10)("x9")),  // PASS
      10L -> doc(Seq.fill(37)(word) ++ Seq("the", "to") ++ Seq.fill(11)("x9")), // reject
      // stopword boundary: 2 hits pass (doc 1), 1 hit rejects
      11L -> doc(Seq.fill(49)(word) :+ "the"),             // 1 stop → reject
      // badword-ONLY rejection: passes every Gopher rule, carries one
      // badword (case-insensitive: BadWords has "SLOW")
      12L -> doc(Seq.fill(47)(word) ++ Seq("slow", "the", "to")),  // reject
      13L -> doc(Seq.fill(47)(word) ++ Seq("Spark", "the", "to"))  // reject
    )
    val df = docs.toDF("doc_id", "text")
    val kept = DocStream.fusedQualityGate(df,
        Seq("SLOW", "dup", "spark"), minWords = 50, maxWords = 60)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L, 7L, 9L),
      s"boundary decisions drifted: kept $kept")
    // null text never reaches the predicate
    val withNull = (Seq(14L -> doc(base48)).toDF("doc_id", "text")
      union Seq((15L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    assert(DocStream.fusedQualityGate(withNull,
        Seq("SLOW", "dup", "spark"), minWords = 50, maxWords = 60)
      .select($"doc_id").as[Long].collect().toSeq == Seq(14L))
  }

  test("streaming weighted top-k carries state across micro-batches, converges to batch") {
    val src = stageTwoBatches()
    // one file per trigger: the stratum's top-k must survive batch 1
    // and merge against batch 2's rows
    val streamSrc = spark.readStream
      .schema(DocStream.docSchema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val out = EventStream.runToMemory(spark,
      DocStream.weightedTopKUpdates(streamSrc, "doc_id", "lang",
        "n_chars", k = 2, seed = "s").toDF(),
      "docstream_wtopk",
      org.apache.spark.sql.streaming.OutputMode.Update())
    // the LAST emission per (stratum, doc_id) set must equal the batch
    // draw over all rows; with k=2 and 3 en docs the final top-2 is the
    // batch answer, regardless of arrival order
    val batch = graft.operators.Sampling.weightedTopKPerStratum(
      spark.read.parquet(src), "doc_id", "lang", "n_chars", 2, "s")
      .select($"doc_id").as[Long].collect().toSet
    // rows emitted in the final micro-batch: group by doc and keep the
    // latest emission set = all docs still present in state. State is
    // bounded at k per stratum, so distinct docs over the LAST batch's
    // update == batch winners; the memory sink appends every update, so
    // reconstruct the final set as the top-2 by key over latest rows
    val finalSet = out.orderBy($"es_key".desc, $"doc_id")
      .select($"doc_id").as[Long].collect().distinct.take(2).toSet
    assert(finalSet == batch,
      s"stream state must converge to the batch draw: $finalSet vs $batch")
  }

  test("streaming index fold: per-file indexAppend converges to the one-shot build") {
    val src = stageTwoBatches()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"term", $"df", $"block", $"block_df", $"postings")
        .as[(String, Long, Long, Long, String)]
        .collect().sortBy(r => (r._1, r._3)).toSeq
    // one file per trigger => the second file's docs fold into the
    // store built from the first (interleaved terms force real
    // append work: "the"/"of" span both batches)
    val folded = DocStream.indexAppendFold(
      DocStream.readOneFilePerTrigger(spark, src), "doc_id", "text",
      nShards = 4, blockSize = 2)
    val oneShot = graft.functions.InvertedIndex.postingsExport(
      spark.read.parquet(src), "doc_id", "text",
      nShards = 4, blockSize = 2)
    assert(rows(folded) == rows(oneShot))
    assert(rows(folded).nonEmpty)
  }

  test("streaming index removal fold equals a clean survivor rebuild (e38 semantics)") {
    val src = stageTwoBatches()
    val all = spark.read.parquet(src).select($"doc_id", $"text")
    val store = graft.functions.InvertedIndex.postingsExport(
      all, "doc_id", "text", nShards = 4, blockSize = 2)
    // remove docs 1 and 3 — one per file, so BOTH micro-batches do
    // real removal work and shared terms ("the") recut twice
    val churned = DocStream.indexRemoveFold(store,
      DocStream.readOneFilePerTrigger(spark, src)
        .filter($"doc_id" =!= 2L),
      "doc_id", "text", nShards = 4, blockSize = 2)
    val survivors = graft.functions.InvertedIndex.postingsExport(
      all.filter($"doc_id" === 2L), "doc_id", "text",
      nShards = 4, blockSize = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"term", $"df", $"block", $"block_df", $"postings")
        .as[(String, Long, Long, Long, String)]
        .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(rows(churned) == rows(survivors))
    assert(rows(churned).nonEmpty)
  }

  test("index fold survives a kill-and-restart from its checkpoint (exactly-once)") {
    // the r15 crash-restart proof: process batch 0, STOP the query
    // (the crash), land more files, restart a NEW query on the SAME
    // checkpoint — the resumed stream must deliver only the unseen
    // files (no batch-0 replay: a re-delivered file would double-fold
    // through indexAppend's disjoint-id contract and break equality
    // with the one-shot build).
    val in = graft.core.Staging.tmpDir("docstream_ckpt_in")
    val ckpt = graft.core.Staging.tmpDir("docstream_ckpt")
    def file(id: Long, text: String) =
      Seq((id, text, "en", "src0", text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("append").parquet(in)
    file(1L, "the quick brown fox jumps over the lazy dog")
    var store: org.apache.spark.sql.DataFrame = null
    val seenBatches = scala.collection.mutable.ArrayBuffer.empty[Long]
    def run(): Unit = {
      val q = DocStream.readOneFilePerTrigger(spark, in)
        .select($"doc_id", $"text")
        .writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          if (!batch.isEmpty) {
            seenBatches += id
            store = (if (store == null)
              graft.functions.InvertedIndex.postingsExport(
                batch, "doc_id", "text", nShards = 4, blockSize = 2)
            else
              graft.functions.InvertedIndex.indexAppend(
                store, batch, "doc_id", "text", nShards = 4, blockSize = 2))
              .localCheckpoint()
          }
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }
    run() // batch 0 only
    assert(seenBatches.toSeq == Seq(0L))
    // crash window: two more files land while the query is down
    file(2L, "a fine day for training data with the usual tokens")
    file(3L, "the market of brown tokens and lazy data")
    run() // restart from the checkpoint — must resume at the new files
    assert(seenBatches.toSeq == Seq(0L, 1L, 2L),
      s"checkpoint replayed or skipped batches: $seenBatches")
    val oneShot = graft.functions.InvertedIndex.postingsExport(
      spark.read.parquet(in).select($"doc_id", $"text"),
      "doc_id", "text", nShards = 4, blockSize = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"term", $"df", $"block", $"block_df", $"postings")
        .as[(String, Long, Long, Long, String)]
        .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(rows(store) == rows(oneShot))
    assert(rows(store).nonEmpty)
  }

  test("streaming containment admission equals the batch admission over the same files") {
    val src = stageTwoBatches()
    import graft.dedup.TextDedup
    // store = doc 1's grams: doc 1 (byte copy) rejected, doc 2
    // (gram-less) and doc 3 (novel) admitted — across both batches
    val store = TextDedup.shingleSets(
      spark.read.parquet(src).filter($"doc_id" === 1L)
        .select($"doc_id", $"text"),
      "doc_id", "text", k = 5)
    val streamed = DocStream.containmentAdmitFold(
      DocStream.readOneFilePerTrigger(spark, src)
        .select($"doc_id", $"text"), store)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val batch = TextDedup.containmentAdmit(
      spark.read.parquet(src).select($"doc_id", $"text"),
      "doc_id", "text", store, k = 5)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(streamed == batch)
    assert(streamed == Seq(2L, 3L))
  }

  test("streaming repetition cut equals the batch cut; repeated doc rejected cross-batch") {
    val dir = graft.core.Staging.tmpDir("docstream_rep")
    val clean = (0 until 30).map(i => f"w$i%02da").mkString(" ")
    val heavy = (0 until 8).map(_ => "spam ham jam flim flam").mkString(" ")
    Seq((1L, clean)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(dir)
    Seq((2L, heavy)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(dir)
    val stream = spark.readStream
      .schema(DocStream.idTextSchema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val streamed = DocStream.repetitionCutFold(stream)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val batch = graft.quality.Repetition.repetitionFilter(
      spark.read.parquet(dir), "doc_id", "text")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(streamed == batch)
    assert(streamed == Seq(1L), "the 8x-repeated doc must be cut")
  }

  test("streaming manifest fold converges to the batch manifest") {
    val src = stageTwoBatches()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"shard", $"n_docs", $"n_tokens", $"min_id", $"max_id",
        $"checksum")
        .as[(Long, Long, Long, Long, Long, Long)]
        .collect().sortBy(_._1).toSeq
    val streamed = EventStream.runToMemory(spark,
      DocStream.manifestFold(
        DocStream.readOneFilePerTrigger(spark, src), nShards = 4),
      "docstream_manifest",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    val batch = graft.sources.Manifest.shardManifest(
      spark.read.parquet(src), "doc_id", "text", 4)
    assert(rows(streamed) == rows(batch))
    assert(rows(streamed).map(_._2).sum == 3L, "all three docs accounted")
  }

  test("streaming length census converges to the batch census; boundaries and clamp exact") {
    // token counts straddling the bucket boundaries: 16 (== bound,
    // stays in 16), 17 (first in 32), 2 (deep inside 16), 300
    // (overlong: clamps to 256, kept=256, waste=0 — truncation regime)
    val dir = graft.core.Staging.tmpDir("docstream_census")
    def doc(id: Long, n: Int) =
      (id, Seq.fill(n)("w").mkString(" "), "en", "s", n.toLong)
    Seq(doc(1, 16), doc(2, 17)).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append").parquet(dir)
    Seq(doc(3, 2), doc(4, 300)).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append").parquet(dir)
    val bounds = Seq(16, 32, 64, 128, 256)
    val streamed = EventStream.runToMemory(spark,
      DocStream.lengthCensus(
        DocStream.readOneFilePerTrigger(spark, dir), bounds, batchSize = 32),
      "docstream_census",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"bucket", $"n_docs", $"n_batches", $"sum_tokens",
        $"padding_waste", $"waste_ratio")
        .as[(Long, Long, Long, Long, Long, Double)]
        .collect().sortBy(_._1).toSeq
    val batch = graft.operators.Packing.lengthBuckets(
      spark.read.parquet(dir).select($"doc_id",
        graft.functions.TextAnalysis.tokenCount($"text")
          .cast("long").as("n_toks")),
      "n_toks", bounds, batchSize = 32)
    assert(rows(streamed) == rows(batch),
      "converged stream census must equal the batch census bit-for-bit")
    // boundary sides: 16 tokens in bucket 16 with 2-token doc
    // (waste 0 + 14); 17 in bucket 32 (waste 15); 300 clamped to 256
    // (kept 256, waste 0)
    assert(rows(streamed) == Seq(
      (16L, 2L, 1L, 18L, 14L, 14.0 / 32.0),
      (32L, 1L, 1L, 17L, 15L, 15.0 / 32.0),
      (256L, 1L, 1L, 256L, 0L, 0.0)))
  }

  test("dHash fold == batch hashes; repeated fold+serve keeps cache storage flat") {
    import graft.operators.StreamMediaCatalog
    // small payload corpus: 3 exact-duplicate images + 1 distinct,
    // staged as two files -> two micro-batches
    def img(src: Long) = StreamMediaCatalog.dhashImage(src, 0)
    val dir = graft.core.Staging.tmpDir("dhash_fold_src")
    Seq((1L, img(5)), (2L, img(5))).toDF("doc_id", "payload")
      .coalesce(1).write.mode("append").parquet(dir)
    Seq((3L, img(5)), (4L, img(900))).toDF("doc_id", "payload")
      .coalesce(1).write.mode("append").parquet(dir)
    def serveOnce(): Set[(Long, Long, Int)] = {
      val hashes = DocStream.dHashFold(
        DocStream.readPayloadsOneFilePerTrigger(spark, dir))
      val pairs = graft.dedup.TextDedup.simhashCandidates(
        hashes.withColumnRenamed("dhash", "simhash"),
        "doc_id", maxHamming = 3, bits = 64, bucketCap = 32)
        .as[(Long, Long, Int)].collect().toSet
      // the simhashCandidates cache-ownership contract: the caller
      // releases once the pairs are materialized
      spark.catalog.clearCache()
      pairs
    }
    val batch = graft.multimodal.BinaryOps.dHashes(
      spark.read.parquet(dir)).toDF()
      .as[(Long, String)].collect().toMap
    val expected = Set((1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0))
    // two full fold+serve cycles in ONE session (the long-lived
    // ingestion shape): results identical, and the cache manager is
    // EMPTY after each release — repeated calls pin no storage (the
    // r13 hygiene contract; localCheckpoint blocks are ContextCleaner-
    // owned and die with their RDDs, unlike CacheManager entries)
    for (round <- 1 to 2) {
      assert(serveOnce() == expected, s"round $round pairs diverged")
      assert(spark.sharedState.cacheManager.isEmpty,
        s"round $round left cached plans behind")
    }
    // folded hashes equal the batch decode on the same files
    val folded = DocStream.dHashFold(
      DocStream.readPayloadsOneFilePerTrigger(spark, dir))
      .as[(Long, String)].collect().toMap
    assert(folded == batch)
    assert(folded(1L) == folded(2L) && folded(2L) == folded(3L))
    assert(folded(1L) != folded(4L))
  }

  test("soft-EM census fold == batch census; repeated words sum across batches") {
    val dir = graft.core.Staging.tmpDir("softcensus_src")
    // "data" recurs in both files so the drained census must SUM its
    // counts, not union rows; junk words exercise the gate-word drop
    val b1 = Seq((1L, "data and training data"), (2L, "x@y !!! data"))
    val b2 = Seq((3L, "training corpora and data"))
    b1.toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/f1")
    b2.toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/f2")
    val out = graft.core.Staging.tmpDir("softcensus_flat")
    val fs = java.nio.file.Paths.get(out)
    for (b <- Seq("f1", "f2")) {
      val src = java.nio.file.Paths.get(dir, b)
      java.nio.file.Files.list(src).filter(_.toString.endsWith(".parquet"))
        .forEach(p => java.nio.file.Files.copy(p, fs.resolve(s"${b}_${p.getFileName}")))
    }
    val vocab = graft.functions.Unigram.FrozenVocab
    val streamed = DocStream.softCensusFold(
      spark.readStream.schema(DocStream.idTextSchema)
        .option("maxFilesPerTrigger", 1).parquet(out), vocab)
      .as[(String, Long)].collect().toMap
    val batch = graft.functions.Unigram.softUsageCensusQuantized(
      (b1 ++ b2).toDF("doc_id", "text"), "text", vocab)
      .as[(String, Long)].collect().toMap
    assert(streamed == batch)
    // the census is non-trivial on this corpus (some piece got usage)
    assert(batch.values.exists(_ > 0L))
  }
}

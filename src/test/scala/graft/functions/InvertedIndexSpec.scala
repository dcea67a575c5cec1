package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "apple cherry cherry date"),
    (4L, "banana"),
    (5L, "apple")
  ).toDF("doc_id", "text")

  test("planted postings: df, blocks, and doc:tf lists exact") {
    // blockSize=2 forces multi-block lists: apple appears in docs
    // 1,3,5 (df=3) -> blocks [1:2, 3:1] and [5:1]
    val out = InvertedIndex.postingsExport(corpus, "doc_id", "text",
        nShards = 4, blockSize = 2)
      .select($"term", $"df", $"block", $"block_df", $"postings")
      .as[(String, Long, Long, Long, String)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(out == Seq(
      ("apple", 3L, 0L, 2L, "1:2,3:1"),
      ("apple", 3L, 1L, 1L, "5:1"),
      ("banana", 3L, 0L, 2L, "1:1,2:1"),
      ("banana", 3L, 1L, 1L, "4:1"),
      ("cherry", 2L, 0L, 2L, "2:1,3:2"),
      ("date", 1L, 0L, 1L, "3:1")))
  }

  test("shard routing is the shared md5-prefix hash, constant per term") {
    val n = 8
    val out = InvertedIndex.postingsExport(corpus, "doc_id", "text",
        nShards = n, blockSize = 2)
      .select($"term", $"shard").distinct()
      .as[(String, Int)].collect().toSeq
    // one shard per term, in range, and equal to the engine formula
    assert(out.map(_._1).distinct.size == out.size, "shard not term-functional")
    assert(out.forall { case (_, s) => s >= 0 && s < n })
    val expected = out.map(_._1).toDF("term")
      .select($"term",
        (conv(substring(md5($"term"), 1, 8), 16, 10).cast("long") % n)
          .cast("int").as("shard"))
      .as[(String, Int)].collect().toMap
    assert(out.toMap == expected)
  }

  test("block invariants: per-block cap, per-term df reconciliation") {
    val b = 4
    val rows = InvertedIndex.postingsExport(
        graft.core.Tables.documents(spark, sf001), "doc_id", "text",
        nShards = 8, blockSize = b)
      .select($"term", $"df", $"block", $"block_df", $"postings")
      .as[(String, Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._4 <= b), "a block exceeded blockSize")
    assert(rows.forall(r => r._5.split(",").length == r._4),
      "postings entry count != block_df")
    for ((_, g) <- rows.groupBy(_._1)) {
      assert(g.map(_._4).sum == g.head._2, "sum(block_df) != df")
      assert(g.map(_._3).sorted.toSeq == (0L until g.length.toLong),
        "blocks not contiguous from 0")
      // every block except the last is full
      assert(g.sortBy(_._3).dropRight(1).forall(_._4 == b))
    }
    // postings are doc_id-ordered within each block
    assert(rows.forall { r =>
      val ids = r._5.split(",").map(_.split(":")(0).toLong).toSeq
      ids == ids.sorted
    })
  }

  test("docLengths: exact token counts, tokenless docs drop") {
    val withEmpty = corpus.union(Seq((6L, "")).toDF("doc_id", "text"))
    val out = InvertedIndex.docLengths(withEmpty, "doc_id", "text")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 3L), (2L, 2L), (3L, 4L), (4L, 1L), (5L, 1L)))
  }

  test("queryTopK: index-served ranking equals corpus-side bm25 exactly") {
    val idx = InvertedIndex.postingsExport(corpus, "doc_id", "text",
      nShards = 4, blockSize = 2) // multi-block lists exercised
    val dls = InvertedIndex.docLengths(corpus, "doc_id", "text")
    val served = InvertedIndex.queryTopK(idx, dls,
        Seq("apple", "cherry"), k = 3)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // corpus-side truth: bm25 per (doc, term), summed over query terms,
    // ranked (score desc, doc_id asc)
    val truth = graft.functions.TextAnalysis
      .bm25(corpus, "doc_id", "text")
      .filter($"term".isin("apple", "cherry"))
      .groupBy($"doc_id").agg(sum($"bm25_q").as("score_q"))
      .as[(Long, Long)].collect().toSeq
      .sortBy { case (id, s) => (-s, id) }.take(3)
      .zipWithIndex.map { case ((id, s), i) => (i + 1L, id, s) }
    assert(served == truth)
  }

  test("queryTopK: k bound and only-query-terms contribute") {
    val idx = InvertedIndex.postingsExport(corpus, "doc_id", "text")
    val dls = InvertedIndex.docLengths(corpus, "doc_id", "text")
    val one = InvertedIndex.queryTopK(idx, dls, Seq("date"), k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    // "date" appears only in doc 3 — exactly one scored doc
    assert(one.map(_._2) == Seq(3L))
    assert(InvertedIndex.queryTopK(idx, dls, Seq("apple"), k = 1)
      .count() == 1L)
  }

  test("blockMax: per-block maxima dominate every posting's exact score") {
    val idx = InvertedIndex.postingsExport(corpus, "doc_id", "text",
      nShards = 4, blockSize = 2)
    val dls = InvertedIndex.docLengths(corpus, "doc_id", "text")
    val bmax = InvertedIndex.blockMax(idx, dls)
      .as[(String, Long, Long)].collect()
      .map { case (t, b, m) => (t, b) -> m }.toMap
    // corpus-side per-posting scores, mapped to their (term, block)
    val perPosting = graft.functions.TextAnalysis
      .bm25(corpus, "doc_id", "text")
      .select($"term", $"doc_id", $"bm25_q")
      .as[(String, Long, Long)].collect()
    val blockOf = idx.select($"term", $"block",
        explode(split($"postings", ",")).as("p"))
      .select($"term", split($"p", ":")(0).cast("long").as("doc_id"),
        $"block")
      .as[(String, Long, Long)].collect()
      .map { case (t, d, b) => (t, d) -> b }.toMap
    assert(perPosting.nonEmpty)
    for ((t, d, q) <- perPosting) {
      val m = bmax((t, blockOf((t, d))))
      assert(q <= m, s"posting ($t,$d) score $q exceeds block max $m")
    }
    // and each max is attained by some posting in its block
    val attained = perPosting
      .groupBy { case (t, d, _) => (t, blockOf((t, d))) }
      .map { case (k, g) => k -> g.map(_._3).max }
    assert(attained == bmax)
  }

  test("queryTopKPruned: identical ranking to the exact path, and the threshold really prunes") {
    // skewed corpus: one heavy doc per term, a tail of tf=1 docs with
    // uniform dl — small blocks make tail block-maxima low, so the
    // k=1 threshold from the heavy doc prunes the tail blocks' docs
    val skew = (1L to 40L).map(i => (i, "filler zz"))
      .union(Seq((100L, "zz zz zz zz zz zz zz zz"), (101L, "filler filler filler filler filler filler filler filler")))
      .toDF("doc_id", "text")
    val idx = InvertedIndex.postingsExport(skew, "doc_id", "text",
      nShards = 4, blockSize = 4)
    val dls = InvertedIndex.docLengths(skew, "doc_id", "text")
    val bmax = InvertedIndex.blockMax(idx, dls)
    for (q <- Seq(Seq("zz"), Seq("filler"), Seq("zz", "filler"));
         k <- Seq(1, 3, 100)) {
      val pruned = InvertedIndex.queryTopKPruned(idx, bmax, dls, q, k)
        .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
      val exact = InvertedIndex.queryTopK(idx, dls, q, k)
        .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
      assert(pruned == exact, s"pruned != exact for q=$q k=$k")
    }
    // pruning effectiveness: replicate the internal UB/threshold and
    // check the candidate set is a strict subset of matched docs
    val ubZz = bmax.filter($"term" === "zz")
      .as[(String, Long, Long)].collect().map(r => r._2 -> r._3).toMap
    // doc 100's exact score is the k=1 threshold; tf=1 docs sit in
    // blocks whose max is below it
    val heavyScore = InvertedIndex.queryTopK(idx, dls, Seq("zz"), 1)
      .as[(Long, Long, Long)].collect().head._3
    assert(ubZz.values.exists(_ < heavyScore),
      "no block max fell below the k=1 threshold — nothing would prune")
  }

  test("queryTopKPruned: real corpus, top-df query — equals exact path") {
    val d = graft.core.Tables.documents(spark, sf001)
    val idx = InvertedIndex.postingsExport(d, "doc_id", "text",
      nShards = 8, blockSize = 16).localCheckpoint()
    val dls = InvertedIndex.docLengths(d, "doc_id", "text")
      .localCheckpoint()
    val bmax = InvertedIndex.blockMax(idx, dls).localCheckpoint()
    val qterms = idx.groupBy($"term").agg(max($"df").as("df"))
      .orderBy($"df".desc, $"term").limit(3)
      .select($"term").as[String].collect().toSeq
    val pruned = InvertedIndex
      .queryTopKPruned(idx, bmax, dls, qterms, k = 10)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val exact = InvertedIndex.queryTopK(idx, dls, qterms, k = 10)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(pruned == exact && pruned.size == 10)
  }

  test("positionalExport: planted cells carry exact 0-based positions") {
    val out = InvertedIndex.positionalExport(corpus, "doc_id", "text",
        nShards = 4, blockSize = 2)
      .select($"term", $"df", $"block", $"block_df", $"postings")
      .as[(String, Long, Long, Long, String)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(out == Seq(
      ("apple", 3L, 0L, 2L, "1:0;2,3:0"),
      ("apple", 3L, 1L, 1L, "5:0"),
      ("banana", 3L, 0L, 2L, "1:1,2:0"),
      ("banana", 3L, 1L, 1L, "4:0"),
      ("cherry", 2L, 0L, 2L, "2:1,3:1;2"),
      ("date", 1L, 0L, 1L, "3:3")))
  }

  test("phraseMatch: overlaps counted, repeated-token phrases, gaps break adjacency") {
    val planted = Seq(
      (1L, "a a a"),          // "a a" occurs at anchors 0 and 1
      (2L, "a b a b a"),      // "a b a" occurs at anchors 0 and 2
      (3L, "a  b"),           // doubled space: a@0, b@2 — NOT adjacent
      (4L, "b a"),            // reversed — no "a b"
      (5L, "x a b a y")       // "a b a" once at anchor 1
    ).toDF("doc_id", "text")
    val idx = InvertedIndex.positionalExport(planted, "doc_id", "text",
      nShards = 4, blockSize = 2)
    def matches(phrase: Seq[String]): Seq[(Long, Long)] =
      InvertedIndex.phraseMatch(idx, phrase)
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(matches(Seq("a", "a")) == Seq((1L, 2L)))
    assert(matches(Seq("a", "b", "a")) == Seq((2L, 2L), (5L, 1L)))
    assert(matches(Seq("a", "b")) == Seq((2L, 2L), (5L, 1L)))
    assert(matches(Seq("z", "z")).isEmpty)
  }

  test("indexAppend/indexRemove: incremental result equals a clean rebuild") {
    def rows(df: org.apache.spark.sql.DataFrame)
        : Seq[(Int, String, Long, Long, Long, String)] =
      df.as[(Int, String, Long, Long, Long, String)]
        .collect().sortBy(r => (r._2, r._4)).toSeq
    val base = corpus.filter($"doc_id" <= 3)
    val inc = corpus.filter($"doc_id" > 3)
    val baseIdx = InvertedIndex.postingsExport(base, "doc_id", "text",
      nShards = 4, blockSize = 2)
    // append: interleaved ids force block recuts on affected terms
    assert(rows(InvertedIndex.indexAppend(baseIdx, inc, "doc_id",
        "text", nShards = 4, blockSize = 2))
      == rows(InvertedIndex.postingsExport(corpus, "doc_id", "text",
        nShards = 4, blockSize = 2)))
    // remove: surviving postings recut; emptied terms disappear
    val fullIdx = InvertedIndex.postingsExport(corpus, "doc_id", "text",
      nShards = 4, blockSize = 2)
    val removed = corpus.filter($"doc_id" === 3) // only holder of "date"
    val afterRemove = rows(InvertedIndex.indexRemove(fullIdx, removed,
      "doc_id", "text", nShards = 4, blockSize = 2))
    assert(afterRemove == rows(InvertedIndex.postingsExport(
      corpus.filter($"doc_id" =!= 3), "doc_id", "text",
      nShards = 4, blockSize = 2)))
    assert(!afterRemove.exists(_._2 == "date"), "emptied term survived")
  }

  test("compact: re-layout from the artifact alone equals a fresh build, serving unchanged") {
    def rows(df: org.apache.spark.sql.DataFrame)
        : Seq[(Int, String, Long, Long, Long, String)] =
      df.as[(Int, String, Long, Long, Long, String)]
        .collect().sortBy(r => (r._2, r._4)).toSeq
    // planted corpus: build at (4, 2), compact to (2, 1) — every block
    // recuts and every shard reroutes, with NO forward corpus in sight
    val built = InvertedIndex.postingsExport(corpus, "doc_id", "text",
      nShards = 4, blockSize = 2)
    val compacted = InvertedIndex.compact(built, nShards = 2, blockSize = 1)
    assert(rows(compacted) == rows(InvertedIndex.postingsExport(
      corpus, "doc_id", "text", nShards = 2, blockSize = 1)))
    // real corpus: churn (append + remove) then compact back — equals
    // the survivor rebuild at the target layout, and SERVES identically
    val docs = graft.core.Tables.documents(spark, sf001)
      .select($"doc_id", $"text")
    val churned = InvertedIndex.indexRemove(
      InvertedIndex.indexAppend(
        InvertedIndex.postingsExport(docs.filter($"doc_id" % 3 =!= 0),
          "doc_id", "text", nShards = 8, blockSize = 16),
        docs.filter($"doc_id" % 3 === 0), "doc_id", "text",
        nShards = 8, blockSize = 16),
      docs.filter($"doc_id" % 5 === 0), "doc_id", "text",
      nShards = 8, blockSize = 16)
    val survivors = docs.filter($"doc_id" % 5 =!= 0)
    val comp = InvertedIndex.compact(churned, nShards = 4, blockSize = 8)
      .localCheckpoint()
    val fresh = InvertedIndex.postingsExport(survivors, "doc_id", "text",
      nShards = 4, blockSize = 8).localCheckpoint()
    assert(rows(comp) == rows(fresh))
    val dls = InvertedIndex.docLengths(survivors, "doc_id", "text")
      .localCheckpoint()
    val qterms = fresh.groupBy($"term").agg(max($"df").as("df"))
      .orderBy($"df".desc, $"term").limit(3)
      .select($"term").as[String].collect().toSeq
    val a = InvertedIndex.queryTopK(comp, dls, qterms, k = 5).collect().toSeq
    val b = InvertedIndex.queryTopK(fresh, dls, qterms, k = 5).collect().toSeq
    assert(a == b)
  }

  test("compact refuses a positional artifact loudly (format guard)") {
    // identical column shape, 'doc:p1;p2' cells — parsing it as
    // 'doc:tf' would yield a structurally valid but garbled index,
    // so the guard must throw, not degrade (r14 review finding)
    val positional = InvertedIndex.positionalExport(corpus, "doc_id",
      "text", nShards = 4, blockSize = 2)
    val err = intercept[Exception] {
      InvertedIndex.compact(positional, nShards = 2, blockSize = 1).collect()
    }
    assert(err.getMessage != null &&
      (err.getMessage.contains("positional") ||
        Option(err.getCause).exists(_.getMessage.contains("positional"))),
      s"expected the positional-format guard, got: $err")
  }

  test("maintenance passes untouched terms through verbatim (poisoned cell)") {
    // poison a term's cell in the base artifact; touch only OTHER
    // terms; the poison must survive both append and remove — proof
    // the untouched branch never reparses or recomputes
    val baseIdx = InvertedIndex.postingsExport(corpus, "doc_id", "text",
        nShards = 4, blockSize = 2)
      .withColumn("postings",
        when($"term" === "date", lit("POISON")).otherwise($"postings"))
    val newDoc = Seq((9L, "apple banana")).toDF("doc_id", "text")
    val appended = InvertedIndex.indexAppend(baseIdx, newDoc,
        "doc_id", "text", nShards = 4, blockSize = 2)
      .filter($"term" === "date").select($"postings")
      .as[String].collect().toSeq
    assert(appended == Seq("POISON"))
    val removed = InvertedIndex.indexRemove(baseIdx,
        Seq((5L, "apple")).toDF("doc_id", "text"),
        "doc_id", "text", nShards = 4, blockSize = 2)
      .filter($"term" === "date").select($"postings")
      .as[String].collect().toSeq
    assert(removed == Seq("POISON"))
  }

  test("plan: two exchanges total; (term, block) agg reuses the term partitioning") {
    val df = InvertedIndex.postingsExport(
      graft.core.Tables.documents(spark, sf001), "doc_id", "text")
    df.collect() // AQE finalizes the plan at runtime
    // the adaptive toString prints Final AND Initial sections — count
    // only the final one
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 2,
      s"expected exactly 2 shuffles (doc+term agg, term window); got $exchanges:\n$plan")
  }

  test("compact plan: one new exchange — the rebuild's term window; the (term,block) agg reuses it") {
    val idx = InvertedIndex.postingsExport(
      graft.core.Tables.documents(spark, sf001), "doc_id", "text")
      .localCheckpoint() // the artifact arrives materialized (a store read)
    val df = InvertedIndex.compact(idx, nShards = 4, blockSize = 8)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"expected exactly 1 shuffle over the parsed artifact (term window, " +
        s"reused by the (term,block) agg); got $exchanges:\n$plan")
  }

  test("varint pack: LEB128 goldens at the byte boundaries") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def pack(vs: Long*): String =
      VarintUtil.packHex(new GenericArrayData(vs.toArray)).toString
    assert(pack(0L) == "00")
    assert(pack(1L) == "01")
    assert(pack(127L) == "7f")          // last 1-byte value
    assert(pack(128L) == "8001")        // first 2-byte value
    assert(pack(300L) == "ac02")
    assert(pack(16384L) == "808001")    // first 3-byte value
    assert(pack(0L, 1L, 127L, 128L, 300L, 16384L)
      == "00017f8001ac02808001")
  }

  test("varint decode: prefix-summed pairs; malformed cells -> empty, never throw") {
    import org.apache.spark.unsafe.types.UTF8String
    def dec(h: String): Seq[(Long, Long)] = {
      val a = VarintUtil.decodePostings(UTF8String.fromString(h))
      (0 until a.numElements()).map { i =>
        val r = a.getStruct(i, 2); (r.getLong(0), r.getLong(1))
      }
    }
    assert(dec("01020201") == Seq((1L, 2L), (3L, 1L))) // gaps 1,2 -> ids 1,3
    assert(dec("") == Seq.empty)
    assert(dec("012") == Seq.empty)     // odd hex length
    assert(dec("zz01") == Seq.empty)    // non-hex char
    assert(dec("8001" + "80") == Seq.empty) // truncated continuation
    assert(dec("010202") == Seq.empty)  // dangling gap without tf
  }

  test("compressedExport: planted d-gap varint cells exact") {
    val out = InvertedIndex.compressedExport(corpus, "doc_id", "text",
        nShards = 4, blockSize = 2)
      .select($"term", $"df", $"block", $"block_df", $"postings_hex")
      .as[(String, Long, Long, Long, String)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    // first gap in a block is the ABSOLUTE doc_id (self-contained
    // seek target); later gaps are deltas; tfs interleave
    assert(out == Seq(
      ("apple", 3L, 0L, 2L, "01020201"),  // (1,tf2),(gap2->3,tf1)
      ("apple", 3L, 1L, 1L, "0501"),      // (5,tf1) absolute restart
      ("banana", 3L, 0L, 2L, "01010101"),
      ("banana", 3L, 1L, 1L, "0401"),
      ("cherry", 2L, 0L, 2L, "02010102"),
      ("date", 1L, 0L, 1L, "0301")))
  }

  test("compression roundtrip: decompress == plain artifact, and smaller") {
    val docs = graft.core.Tables.documents(spark, sf001)
    def rows(df: org.apache.spark.sql.DataFrame)
        : Seq[(Int, String, Long, Long, Long, String)] =
      df.as[(Int, String, Long, Long, Long, String)]
        .collect().sortBy(r => (r._2, r._4)).toSeq
    val plain = rows(InvertedIndex.postingsExport(docs, "doc_id", "text"))
    val compressed = InvertedIndex.compressedExport(docs, "doc_id", "text")
    assert(rows(InvertedIndex.decompressIndex(compressed)) == plain)
    // the point of the format: bytes (hex/2) beat the decimal cells
    val Seq((hexChars, plainChars)) = compressed
      .agg(sum(length($"postings_hex")).as("h"))
      .crossJoin(InvertedIndex.postingsExport(docs, "doc_id", "text")
        .agg(sum(length($"postings")).as("p")))
      .as[(Long, Long)].collect().toSeq
    assert(hexChars / 2 < plainChars / 2,
      s"compressed bytes $hexChars/2 not below plain $plainChars/2")
  }

  test("impact index: per-posting impacts == the online scorer's bm25_q") {
    val docs = graft.core.Tables.documents(spark, sf001)
    val fromIdx = InvertedIndex.impactExport(docs, "doc_id", "text")
      .withColumn("p", explode(split($"postings", ",")))
      .select($"term", split($"p", ":")(0).cast("long").as("doc_id"),
        split($"p", ":")(1).cast("long").as("impact_q"))
    val online = TextAnalysis.bm25(docs, "doc_id", "text")
      .select($"term", $"doc_id", $"bm25_q")
    assert(fromIdx.join(online, Seq("term", "doc_id"))
      .filter($"impact_q" =!= $"bm25_q").count() == 0)
    assert(fromIdx.count() == online.count())
  }

  test("impact-served top-k == plain-index-served top-k, and the plan has no join") {
    val docs = graft.core.Tables.documents(spark, sf001)
    val plainIdx = InvertedIndex.postingsExport(docs, "doc_id", "text")
      .localCheckpoint()
    val dls = InvertedIndex.docLengths(docs, "doc_id", "text")
      .localCheckpoint()
    val impactIdx = InvertedIndex.impactExport(docs, "doc_id", "text")
      .localCheckpoint()
    val topTerms = plainIdx.groupBy($"term").agg(max($"df").as("df"))
      .orderBy($"df".desc, $"term").limit(5)
      .select($"term").as[String].collect().toSeq
    for (q <- Seq(topTerms.take(3), topTerms.drop(2), topTerms.take(1));
         k <- Seq(1, 10)) {
      val served = InvertedIndex.queryTopKImpacts(impactIdx, q, k)
      assert(served.as[(Long, Long, Long)].collect().toSeq
        == InvertedIndex.queryTopK(plainIdx, dls, q, k)
          .as[(Long, Long, Long)].collect().toSeq,
        s"impact-served diverged for q=$q k=$k")
    }
    // the point of the format: the serve plan is join-free (the plain
    // path pays a doc-keyed join against the corpus-size dl sidecar)
    val serve = InvertedIndex.queryTopKImpacts(impactIdx, topTerms.take(3), 10)
    serve.collect()
    val plan = serve.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Join"), s"impact serve path joined:\n$plan")
  }

  test("batch retrieval: one-plan workload == per-query queryTopK loop") {
    val docs = graft.core.Tables.documents(spark, sf001)
    val idx = InvertedIndex.postingsExport(docs, "doc_id", "text")
      .localCheckpoint()
    val dls = InvertedIndex.docLengths(docs, "doc_id", "text")
      .localCheckpoint()
    val top = idx.groupBy($"term").agg(max($"df").as("df"))
      .orderBy($"df".desc, $"term").limit(6)
      .select($"term").as[String].collect().toSeq
    // overlapping queries: shared terms must fan out to both rankings
    val workload = Map(0L -> top.take(3), 1L -> top.drop(3),
      2L -> top.slice(1, 4))
    val qdf = workload.toSeq
      .flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("query_id", "term")
    // a duplicated (query, term) row must not double-count (isin parity)
    val batch = InvertedIndex.queryTopKBatch(idx, dls,
        qdf.unionByName(qdf.limit(1)), k = 10)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    for ((q, ts) <- workload) {
      val solo = InvertedIndex.queryTopK(idx, dls, ts, k = 10)
        .as[(Long, Long, Long)].collect().toSeq
        .map { case (rn, d, s) => (q, rn, d, s) }
      assert(batch(q) == solo, s"batch diverged from solo for query $q")
    }
  }

  test("moreLikeThis: planted similarity through uncapped terms only") {
    // n_docs=5, ratio=2 -> only df<=2 terms survive: cherry (docs 2,3)
    // and date (doc 3). Query doc 3 matches ONLY doc 2 (via cherry);
    // query doc 1's terms (apple, banana, df=3) are all capped out.
    val out = InvertedIndex.moreLikeThis(corpus, "doc_id", "text",
        queryIds = Seq(1L, 3L), k = 10, dfCapRatio = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._3)) == Seq((3L, 1L, 2L)))
    assert(out.head._4 > 0L)
  }

  test("moreLikeThis: self-exclusion, rank contiguity, pairwise symmetry") {
    val docs = graft.core.Tables.documents(spark, sf001)
    val qids = Seq(1L, 2L, 3L)
    val out = InvertedIndex.moreLikeThis(docs, "doc_id", "text",
        qids, k = 1000, dfCapRatio = 1)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    assert(out.forall(r => r._1 != r._3), "a query matched itself")
    for ((q, g) <- out.groupBy(_._1))
      assert(g.map(_._2).sorted.toSeq == (1L to g.length.toLong),
        s"ranks not contiguous for query $q")
    // the tf·idf² dot product is symmetric: score(a->b) == score(b->a).
    // Docs 1..3 need not co-match each other, so take query 1's own
    // top hit as the partner and re-query with both as queries.
    val (q0, _, d0, s0) = out.filter(_._1 == out.head._1).minBy(_._2)
    val pair = InvertedIndex.moreLikeThis(docs, "doc_id", "text",
        Seq(q0, d0), k = 1000, dfCapRatio = 1)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._3) -> r._4).toMap
    assert(pair.get((q0, d0)).contains(s0))
    assert(pair.get((d0, q0)).contains(s0),
      s"asymmetric score for ($q0,$d0)")
  }

  test("compressed plan: still two exchanges (gap lag shares the term window)") {
    val df = InvertedIndex.compressedExport(
      graft.core.Tables.documents(spark, sf001), "doc_id", "text")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 2,
      s"expected exactly 2 shuffles; got $exchanges:\n$plan")
  }
}

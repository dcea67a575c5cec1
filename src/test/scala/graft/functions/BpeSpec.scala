package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(m: Seq[(String, String)]) = m.zipWithIndex.toMap

  test("applyWord goldens under the frozen merges") {
    val r = ranks(Bpe.FrozenMerges)
    assert(Bpe.applyWord("customer", r) == Vector("cu", "st", "o", "mer"))
    assert(Bpe.applyWord("hash", r) == Vector("hash"))
    assert(Bpe.applyWord("batch", r) == Vector("batch"))
    assert(Bpe.applyWord("a", r) == Vector("a"))
    assert(Bpe.applyWord("", r) == Vector.empty)
    // rank order beats position: ("s","t") outranks ("e","r")? no —
    // ("e","r") is rank 0, so in "ster" the er merge wins first even
    // though st appears earlier in the word
    assert(Bpe.applyWord("ster", r) == Vector("st", "er"))
  }

  test("applyWord splits by CODE POINT, matching the RE2 '(.)' oracle") {
    // a non-BMP char (surrogate pair in UTF-16) is ONE symbol, never
    // two lone surrogates — otherwise engine and DuckDB oracle diverge
    // the moment a corpus carries an emoji
    val r = ranks(Bpe.FrozenMerges)
    assert(Bpe.applyWord("a😀b", r) ==
      Vector("a", "😀", "b"))
    assert(Bpe.applyWord("😀", r) == Vector("😀"))
  }

  test("embedded-newline word: engine split matches the (?s)(.) oracle split") {
    // The oracle char-split regex carries RE2's (?s) flag so `.`
    // matches \n; without it a newline-bearing word tokenizes
    // differently engine-vs-oracle (r11 ADVICE #1). Fixtures are
    // newline-free today — this arm keeps the class closed if a
    // future regen embeds one. Replay the oracle's exact split
    // spelling in Spark SQL (same (?s) dotall semantics as RE2 here)
    // and compare against the engine's code-point split.
    val word = "ab\ncd"
    val r = ranks(Seq(("a", "b")))
    assert(Bpe.applyWord(word, r) == Vector("ab", "\n", "c", "d"))
    val oracleSplit = Seq(word).toDF("w")
      .select(split(trim(regexp_replace($"w", "(?s)(.)", "$1 ")), " ").as("s"))
      .as[Seq[String]].head()
    assert(oracleSplit == Seq("a", "b", "\n", "c", "d"),
      s"oracle-spelling split diverged: $oracleSplit")
    assert(oracleSplit == Bpe.applyWord(word, ranks(Seq.empty)),
      "engine code-point split != oracle (?s)(.) split on a newline word")
    // end-to-end: tokenizeDocs carries the newline symbol as a token
    val out = Bpe.tokenizeDocs(
      Seq((1L, "ab\ncd xy")).toDF("doc_id", "text"),
      "doc_id", "text", Seq(("a", "b")))
      .select($"n_words", $"n_bpe_tokens", $"bpe_text").head()
    assert(out.getLong(0) == 2L)
    assert(out.getLong(1) == 6L)
    assert(out.getString(2) == "ab \n c d x y")
  }

  test("applyWord repeated-run semantics: leftmost occurrence merges first") {
    val r = ranks(Seq(("a", "a")))
    // one-at-a-time leftmost: aaa -> [aa, a] (the merged symbol can't
    // re-pair as ("a","a")), aaaa -> [aa, aa]
    assert(Bpe.applyWord("aaa", r) == Vector("aa", "a"))
    assert(Bpe.applyWord("aaaa", r) == Vector("aa", "aa"))
    // min-rank beats leftmost-of-any-rank: in "abab" with ranks
    // {("b","a")->0, ("a","b")->1}, b-a merges first even though an
    // a-b pair sits further left: abab -> a(ba)b, after which neither
    // remaining pair (a,ba) or (ba,b) is in the table
    val r2 = ranks(Seq(("b", "a"), ("a", "b")))
    assert(Bpe.applyWord("abab", r2) == Vector("a", "ba", "b"))
  }

  test("trainer reproduces the frozen merges at sf0.01 (golden pin)") {
    val docs = graft.core.Tables.documents(spark, sf001)
      .select($"doc_id", $"text")
    val learned = Bpe.train(docs, "text", nMerges = 24)
    assert(learned == Bpe.FrozenMerges,
      s"trainer or fixture drifted:\n$learned\nvs frozen:\n${Bpe.FrozenMerges}")
  }

  test("byteSyms: UTF-8 hex symbolization across 1/2/3/4-byte chars") {
    assert(Bpe.byteSyms("ab") == Vector("61", "62"))
    assert(Bpe.byteSyms("é") == Vector("c3", "a9"))
    assert(Bpe.byteSyms("東") == Vector("e6", "9d", "b1"))
    // non-BMP emoji: a surrogate PAIR in the JVM, ONE 4-byte UTF-8 char
    assert(Bpe.byteSyms("😀") == Vector("f0", "9f", "98", "80"))
    assert(Bpe.byteSyms("") == Vector.empty)
  }

  test("byte trainer reproduces the frozen byte merges (golden pin)") {
    val docs = graft.core.Tables.documents(spark, sf001)
      .select($"doc_id", $"text")
      .unionByName(graft.operators.TrainingCatalog.BytePlants
        .toDF("doc_id", "lang", "text").select($"doc_id", $"text"))
    val learned = Bpe.trainBytes(docs, "text", nMerges = 24)
    assert(learned == Bpe.FrozenByteMerges,
      s"byte trainer or fixture drifted:\n$learned\nvs frozen:\n${Bpe.FrozenByteMerges}")
  }

  test("byteVocab: byte-value ids, merge products 256+rank, no unk possible") {
    val v = Bpe.byteVocab(Bpe.FrozenByteMerges)
    assert(v("00") == 0 && v("61") == 0x61 && v("ff") == 255)
    assert(v("6572") == 256) // first merge product
    assert(Bpe.byteSepId(Bpe.FrozenByteMerges) > v.values.max)
    // every terminal symbol of any tokenization is in the vocab: the
    // byte-fallback guarantee, checked over mixed-script words
    val r = ranks(Bpe.FrozenByteMerges)
    for (w <- Seq("customer", "café", "東京", "😀", "naïve", "größe"))
      assert(Bpe.applySyms(Bpe.byteSyms(w), r).forall(v.contains),
        s"unk symbol in tokenization of $w")
  }

  test("byte-level lossless round-trip: decode(encode(x)) == x, any script") {
    val texts = Seq(
      (1L, "plain ascii words"),
      (2L, "café déjà vu émigré"),
      (3L, "東京 大阪 mixed with ascii"),
      (4L, "emoji 😀 inside 🚀 text"),
      (5L, "punct! and? digits 42 symbols #@%"),
      (6L, "singleword"),
      // irregular spacing: the empty split tokens must survive as bare
      // space tokens or these silently lose bytes
      (7L, "trailing space "),
      (8L, " leading space"),
      (9L, "double  space and  more"))
    val df = texts.toDF("doc_id", "text")
    val ids = Bpe.tokenizeToIdsBytesLossless(df, "doc_id", "text",
      Bpe.FrozenByteMerges)
    val back = Bpe.detokenizeBytes(ids, "doc_id", "bpe_ids",
        Bpe.FrozenByteMerges)
      .as[(Long, String)].collect().toMap
    for ((id, t) <- texts) assert(back(id) == t, s"doc $id not lossless")
    // char-level CANNOT do this: OOV symbols collapse to -1
    val charIds = Bpe.tokenizeToIds(df.filter($"doc_id" === 2L),
      "doc_id", "text", Bpe.FrozenMerges)
    val arr = charIds.select($"bpe_ids").as[Seq[Int]].collect().head
    assert(arr.contains(-1), "accented chars must be OOV at char level")
  }

  test("byte-level merge application: ASCII shadows char-level through hex") {
    // on pure [a-z] words the byte merges largely shadow the char
    // merges through ASCII hex — "customer" merges identically
    val rc = ranks(Bpe.FrozenMerges)
    val rb = ranks(Bpe.FrozenByteMerges)
    val charToks = Bpe.applyWord("customer", rc)
    val byteToks = Bpe.applySyms(Bpe.byteSyms("customer"), rb)
    def hexOf(s: String) =
      s.getBytes("UTF-8").map(b => f"${b & 0xff}%02x").mkString
    assert(byteToks == charToks.map(hexOf))
  }

  test("learned merges are invariant to input partitioning (sf0.001)") {
    // exact-long counts + the lexicographic tie-break make each
    // round's argmax partitioning-independent — the tk9 gate's
    // determinism contract
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text")
    val base = Bpe.train(docs, "text", nMerges = 8)
    assert(Bpe.train(docs.repartition(13), "text", nMerges = 8) == base)
    assert(Bpe.train(docs.repartition(1), "text", nMerges = 8) == base)
  }

  test("incremental merge replay == per-round greedy re-derivation (tk9 oracle pin)") {
    // the tk9 oracle advances each word INCREMENTALLY (one recursive
    // leftmost-replace stage per chosen merge) while the trainer
    // re-derives from characters each round with the full rank table;
    // pin their equivalence over every distinct word of the gate
    // corpus, under the gate's learned merges
    val docs = graft.core.Tables.documents(spark, sf0001)
    val merges = Bpe.train(docs, "text", nMerges = 8)
    val rks = ranks(merges)
    def incremental(w: String): Vector[String] = {
      var syms = w.map(_.toString).toVector
      for ((x, y) <- merges) {
        var j = 0
        while (j >= 0) {
          j = (0 until syms.length - 1)
            .indexWhere(i => syms(i) == x && syms(i + 1) == y)
          if (j >= 0)
            syms = (syms.take(j) :+ (x + y)) ++ syms.drop(j + 2)
        }
      }
      syms
    }
    val words = docs.select(explode(split($"text", " ", -1)).as("w"))
      .filter($"w" =!= "").distinct().as[String].collect()
    for (w <- words)
      assert(incremental(w) == Bpe.applyWord(w, rks),
        s"incremental vs re-derived divergence on '$w'")
  }

  test("pretokenize: RE2-verified goldens, lossless partition, category walls") {
    // goldens copied from a DuckDB regexp_extract_all run of the same
    // pattern (leftmost-first alternation) — the engine lexer and the
    // oracle regex must stay in lockstep
    assert(Bpe.pretokenize("it's a test, isn't it? yes!") ==
      Vector("it", "'s", " a", " test", ",", " isn", "'t", " it", "?", " yes", "!"))
    assert(Bpe.pretokenize("price: $42.50 (tax 7%)") ==
      Vector("price", ":", " $", "42", ".", "50", " (", "tax", " 7", "%)"))
    assert(Bpe.pretokenize("  double  spaces  ") ==
      Vector("  ", "double", "  ", "spaces", "  "))
    assert(Bpe.pretokenize("trailing space ") ==
      Vector("trailing", " space", " "))
    assert(Bpe.pretokenize(" leading") == Vector(" leading"))
    assert(Bpe.pretokenize("tabs\tand\nnewlines") ==
      Vector("tabs", "\t", "and", "\n", "newlines"))
    assert(Bpe.pretokenize("naïve 😀 café 東京 mix") ==
      Vector("naïve", " 😀", " café", " 東京", " mix"))
    // ² and ٤٢ are \p{N}-but-not-[0-9]; № is Symbol (punct class)
    assert(Bpe.pretokenize("x² + ٤٢ = №") ==
      Vector("x", "²", " +", " ٤٢", " =", " №"))
    assert(Bpe.pretokenize("don't 'sun 'quoted'") ==
      Vector("don", "'t", " '", "sun", " '", "quoted", "'"))
    assert(Bpe.pretokenize("'sun") == Vector("'s", "un"))
    assert(Bpe.pretokenize("") == Vector.empty)
    assert(Bpe.pretokenize("   ") == Vector("   "))
    // lossless partition — concatenation is the identity, any input
    for (t <- Seq("it's a test, isn't it? yes!", " spaced  out\ttabs\nand newlines ",
      "x² plus ٤٢ equals 44", "東京は2026年です。", "a", " ", "--", "'d'll's"))
      assert(Bpe.pretokenize(t).mkString == t, s"lossy on '$t'")
    // category walls: merges can never glue punctuation to a word —
    // "it's" tokenizes as it | 's however the merge table grows
    val toks = Seq((1L, "it's over")).toDF("doc_id", "text")
    val out = Bpe.tokenizeDocsBytesPretok(toks, "doc_id", "text",
      Bpe.FrozenPretokMerges).select($"bpe_text").as[String].head()
    // 69 74 = "it", 27 73 = "'s", 20 6f 76 = " ov"... the 'er' merge
    // applies inside the word token only
    assert(out.startsWith("69 74 27 73 "), out)
  }

  test("pretok trainer reproduces the frozen pretok merges (golden pin)") {
    val docs = graft.core.Tables.documents(spark, sf001)
      .select($"doc_id", $"lang", $"text")
      .unionByName(graft.operators.TrainingCatalog.BytePlants
        .toDF("doc_id", "lang", "text"))
      .unionByName(graft.operators.TrainingCatalog.PretokPlants
        .toDF("doc_id", "lang", "text"))
      .select($"doc_id", $"text")
    val learned = Bpe.trainBytesPretok(docs, "text", nMerges = 24)
    assert(learned == Bpe.FrozenPretokMerges,
      s"pretok trainer or fixture drifted:\n$learned\nvs frozen:\n${Bpe.FrozenPretokMerges}")
    // the table is Ġ-shaped: space-prefixed merges are learned
    assert(learned.head == (("20", "73")))
  }

  test("pretok round-trip: decode(encode(x)) == x on category-hostile text") {
    val texts = Seq(
      (1L, "it's a test, isn't it? yes!"),
      (2L, " spaced  out\ttabs\nand newlines "),
      (3L, "x² plus ٤٢ equals 44"),
      (4L, "東京は2026年です。"),
      (5L, "emoji 😀 mid-token's edge"))
    val df = texts.toDF("doc_id", "text")
    val back = Bpe.detokenizeBytes(
      Bpe.tokenizeToIdsBytesPretok(df, "doc_id", "text", Bpe.FrozenPretokMerges),
      "doc_id", "bpe_ids", Bpe.FrozenPretokMerges)
      .as[(Long, String)].collect().toMap
    for ((id, t) <- texts) assert(back(id) == t, s"doc $id not lossless")
  }

  test("incremental trainer == legacy trainer (char + byte, gate corpora)") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text")
    assert(Bpe.trainIncremental(docs, "text", 8) == Bpe.train(docs, "text", 8))
    val withPlants = docs.unionByName(
      graft.operators.TrainingCatalog.BytePlants
        .toDF("doc_id", "lang", "text").select($"doc_id", $"text"))
    assert(Bpe.trainBytesIncremental(withPlants, "text", 8) ==
      Bpe.trainBytes(withPlants, "text", 8))
    // partitioning invariance (exact-long counts + lexicographic
    // tie-break — the tk15 determinism contract)
    assert(Bpe.trainBytesIncremental(withPlants.repartition(13), "text", 8) ==
      Bpe.trainBytesIncremental(withPlants, "text", 8))
    // the composed production spelling: incremental counts over the
    // category-pre-tokenized vocabulary == the legacy pretok trainer
    assert(Bpe.trainBytesPretokIncremental(withPlants, "text", 8) ==
      Bpe.trainBytesPretok(withPlants, "text", 8))
  }

  test("incremental == legacy on seeded corpora (surface-collision cover)") {
    // adversarial mini-corpora: short alphabets force repeated merge
    // products and surface collisions — exactly the class where a
    // merge-only-the-new-pair advance diverges from full greedy
    // re-derivation (the full-rank-table reapply in trainIncremental
    // exists for this; see its scaladoc)
    for (seed <- Seq(11L, 23L, 47L)) {
      var s = seed
      val words = (0 until 40).map { i =>
        val len = 3 + (i % 6)
        val sb = new StringBuilder
        for (_ <- 0 until len) {
          s = s * 6364136223846793005L + 1442695040888963407L
          sb += ('a' + java.lang.Math.floorMod(s >>> 33, 4L).toInt).toChar
        }
        Seq.fill(i % 5 + 1)(sb.result()).mkString(" ")
      }
      val corpus = words.toDF("text")
      val leg = Bpe.train(corpus, "text", 12)
      val inc = Bpe.trainIncremental(corpus, "text", 12)
      assert(inc == leg, s"seed $seed: incremental $inc != legacy $leg")
    }
  }

  test("deep trainer: 64-merge prefix of the frozen tk17 table, both trainers") {
    // greedy BPE has the prefix property (round k's argmax depends only
    // on merges 1..k−1), so a 64-round run must equal the frozen
    // 260-round table's prefix — re-derived from BOTH trainers so a
    // fixture or trainer drift fails loudly here before the gate sees
    // it (the full 260-round derivation is the tk17 gate itself)
    val corpus = graft.operators.TrainingCatalog.deepTrainCorpus(spark)
    val frozen = graft.operators.DeepMerges.Table.take(64)
    assert(Bpe.trainBytesIncremental(corpus, "text", 64) == frozen)
    assert(Bpe.trainBytes(corpus, "text", 64) == frozen)
  }

  test("batched trainer == legacy sequence (char, byte, seeded collisions, deep) in fewer rounds") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text")
    assert(Bpe.trainIncrementalBatched(docs, "text", 8) ==
      Bpe.train(docs, "text", 8))
    val withPlants = docs.unionByName(
      graft.operators.TrainingCatalog.BytePlants
        .toDF("doc_id", "lang", "text").select($"doc_id", $"text"))
    assert(Bpe.trainBytesIncrementalBatched(withPlants, "text", 8) ==
      Bpe.trainBytes(withPlants, "text", 8))
    // the adversarial seeded corpora: short alphabets force surface
    // collisions — exactly what the created-strings freshness guard
    // exists for (a collision shrinks the batch, never the exactness)
    for (seed <- Seq(11L, 23L, 47L)) {
      var s = seed
      val words = (0 until 40).map { i =>
        val len = 3 + (i % 6)
        val sb = new StringBuilder
        for (_ <- 0 until len) {
          s = s * 6364136223846793005L + 1442695040888963407L
          sb += ('a' + java.lang.Math.floorMod(s >>> 33, 4L).toInt).toChar
        }
        Seq.fill(i % 5 + 1)(sb.result()).mkString(" ")
      }
      val corpus = words.toDF("text")
      assert(Bpe.trainIncrementalBatched(corpus, "text", 12) ==
        Bpe.train(corpus, "text", 12), s"seed $seed")
    }
    // the composed production spelling: batched selection over the
    // category-pre-tokenized vocabulary == the sequential pretok trainer
    assert(Bpe.trainBytesPretokIncrementalBatched(withPlants, "text", 8) ==
      Bpe.trainBytesPretok(withPlants, "text", 8))
    // deep run: the 64-merge frozen prefix, and the latency claim —
    // strictly fewer census snapshots than merges (jobs/merge < 1)
    val corpus = graft.operators.TrainingCatalog.deepTrainCorpus(spark)
    val (deep, rounds) = Bpe.trainBytesBatchedWithStats(corpus, "text",
      nMerges = 64, batchCap = 32)
    assert(deep == graft.operators.DeepMerges.Table.take(64))
    info(s"64 merges in $rounds batched rounds")
    assert(rounds < 64, s"batching never amortized: $rounds rounds for 64 merges")
  }

  test("batched trainer == a pure in-memory greedy reference on 10 random corpora") {
    // an INDEPENDENT oracle for the batched selection guards: plain
    // driver-side greedy BPE (argmax by count desc / lex tiebreak,
    // full-rank fixpoint application via the shared applySyms) — no
    // Spark, no shared selection code. Short alphabets make ties,
    // collisions, and boundary trims constant occurrences.
    def refTrain(words: Seq[(String, Long)], n: Int): Vector[(String, String)] = {
      var state = words.map { case (w, f) => (w.map(_.toString).toVector, f) }
      var merges = Vector.empty[(String, String)]
      var done = false
      while (merges.size < n && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, f) <- state; i <- 0 until syms.length - 1)
          counts((syms(i), syms(i + 1))) =
            counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
        if (counts.isEmpty) done = true
        else {
          val best = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }._1
          merges = merges :+ best
          val ranks = merges.zipWithIndex.toMap
          state = state.map { case (s, f) => (Bpe.applySyms(s, ranks), f) }
        }
      }
      merges
    }
    for (seed <- Seq(5L, 13L, 29L, 41L, 59L, 71L, 89L, 107L, 131L, 151L)) {
      var s = seed
      def next(mod: Int): Int = {
        s = s * 6364136223846793005L + 1442695040888963407L
        java.lang.Math.floorMod(s >>> 33, mod.toLong).toInt
      }
      val words = (0 until 30).map { _ =>
        val len = 2 + next(6)
        (0 until len).map(_ => ('a' + next(3)).toChar).mkString
      }
      val freqs = words.groupBy(identity).view
        .mapValues(v => v.size.toLong * (1 + next(3))).toSeq
      val corpus = freqs.flatMap { case (w, f) =>
        Seq.fill(f.toInt)(w) }.mkString(" ")
      val df = Seq(corpus).toDF("text")
      val expected = refTrain(
        freqs.map { case (w, f) => (w, f) }, 10)
      val got = Bpe.trainIncrementalBatched(df, "text", 10, batchCap = 4)
      assert(got == expected, s"seed $seed: batched $got != reference $expected")
    }
  }

  test("trainer is deterministic and early-stops when pairs run out") {
    val tiny = Seq((0L, "ab ab cd"), (1L, "ab cd cd")).toDF("doc_id", "text")
    val m1 = Bpe.train(tiny, "text", nMerges = 8)
    val m2 = Bpe.train(tiny, "text", nMerges = 8)
    assert(m1 == m2)
    // 2-char words exhaust after 2 merges; count ties break lexicographic
    assert(m1 == Vector(("a", "b"), ("c", "d")))
    // the incremental trainer early-stops identically (its counts frame
    // empties instead of the legacy flatMap yielding no rows)
    assert(Bpe.trainIncremental(tiny, "text", nMerges = 8) == m1)
  }

  test("tokenizeDocs invariants at sf0.001: counts agree, chars round-trip") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text")
    val tok = Bpe.tokenizeDocs(docs, "doc_id", "text", Bpe.FrozenMerges)
    val joined = docs.join(tok, Seq("doc_id"))
    // BPE never invents or loses characters: tokens concatenated ==
    // the original text with spaces removed
    val broken = joined.filter(
      regexp_replace($"bpe_text", " ", "") =!=
        regexp_replace($"text", " ", "")).count()
    assert(broken == 0L)
    // n_bpe_tokens equals the emitted stream's length; BPE never has
    // MORE tokens than characters nor FEWER than words
    val bad = tok.filter(
      array_size(split($"bpe_text", " ", -1)) =!= $"n_bpe_tokens" ||
        $"n_bpe_tokens" < $"n_words").count()
    assert(bad == 0L)
    assert(tok.count() == docs.count())
  }

  test("vocab ids: a-z base, merge products by rank, first id wins collisions") {
    val v = Bpe.vocab(Bpe.FrozenMerges)
    assert(v("a") == 0 && v("z") == 25)
    assert(v("er") == 26 && v("cu") == 26 + 23)
    assert(v.values.toSeq.distinct.size == v.size) // ids unique
    // two merge paths to one surface keep the FIRST id
    val coll = Bpe.vocab(Seq(("b", "c"), ("a", "bc"), ("a", "b"), ("ab", "c")))
    assert(coll("abc") == 26 + 1) // ("a","bc") wins over ("ab","c")
    // the packing separator sits strictly above every real id — it can
    // never alias a token, including under vocab collisions
    assert(Bpe.sepId(Bpe.FrozenMerges) > v.values.max)
    assert(Bpe.sepId(Seq(("b", "c"), ("a", "bc"), ("a", "b"), ("ab", "c")))
      > coll.values.max)
  }

  test("tokenizeToIds: ids mirror the token stream; unk maps to -1") {
    val docs = Seq((1L, "hash customer"), (2L, "q7")).toDF("doc_id", "text")
    val r = Bpe.tokenizeToIds(docs, "doc_id", "text", Bpe.FrozenMerges)
      .orderBy($"doc_id").as[(Long, Long, Seq[Int])].collect()
    val v = Bpe.vocab(Bpe.FrozenMerges)
    // hash -> [hash]; customer -> [cu, st, o, mer]
    assert(r(0) == ((1L, 5L,
      Seq(v("hash"), v("cu"), v("st"), v("o"), v("mer")))))
    // '7' is out of alphabet -> unk
    assert(r(1) == ((2L, 2L, Seq(v("q"), -1))))
    // parity with the string face at sf0.001: same counts per doc
    val d = graft.core.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text")
    val byStr = Bpe.tokenizeDocs(d, "doc_id", "text", Bpe.FrozenMerges)
      .select($"doc_id", $"n_bpe_tokens")
    val byIds = Bpe.tokenizeToIds(d, "doc_id", "text", Bpe.FrozenMerges)
      .select($"doc_id", $"n_bpe_tokens")
    assert(byStr.exceptAll(byIds).isEmpty && byIds.exceptAll(byStr).isEmpty)
  }

  test("streaming face == batch face row-for-row (pure row function)") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text")
    val batch = Bpe.tokenizeDocs(docs, "doc_id", "text", Bpe.FrozenMerges)
    // the stream operator runs unchanged on a batch frame — that
    // isolates the arithmetic/memo parity claim from stream delivery
    // (delivery parity is the e18 gate's job)
    val streamFace = graft.streaming.DocStream.bpeTokenize(
      docs, Bpe.FrozenMerges)
    assert(streamFace.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamFace).isEmpty)
    // wordless docs drop on both faces
    val empty = Seq((1L, ""), (2L, "a b")).toDF("doc_id", "text")
    assert(graft.streaming.DocStream.bpeTokenize(empty, Bpe.FrozenMerges)
      .count() == 1L)
    assert(Bpe.tokenizeDocs(empty, "doc_id", "text", Bpe.FrozenMerges)
      .count() == 1L)
  }

  test("tokenizeDocs plan: vocab rides a broadcast join, one doc-keyed agg") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text")
    val df = Bpe.tokenizeDocs(docs, "doc_id", "text", Bpe.FrozenMerges)
    df.collect() // AQE finalizes the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"corpus->vocab join must broadcast the vocab side:\n$plan")
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("merge artifact round-trips: save -> load -> tokenize == tokenize") {
    val dir = graft.core.Staging.tmpDir("bpe_merges_artifact")
    Bpe.saveMerges(spark, Bpe.FrozenByteMerges, dir)
    val loaded = Bpe.loadMerges(spark, dir)
    assert(loaded == Bpe.FrozenByteMerges,
      "merge ORDER is the model — rank must reload exactly")
    val df = Seq((1L, "customer café 😀")).toDF("doc_id", "text")
    val direct = Bpe.tokenizeDocsBytes(df, "doc_id", "text",
      Bpe.FrozenByteMerges).as[(Long, Long, Long, String)].collect().toSeq
    val viaArtifact = Bpe.tokenizeDocsBytes(df, "doc_id", "text", loaded)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(viaArtifact == direct)
  }
}

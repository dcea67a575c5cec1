package graft.functions

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  test("encodeWord: greedy longest-match-first with ## continuations") {
    val v = Set("hug", "##s", "h", "##u", "##g", "b", "##ug")
    assert(WordPiece.encodeWord("hugs", v) == Vector("hug", "##s"))
    // longest match wins at the word start even when char paths exist
    assert(WordPiece.encodeWord("hug", v) == Vector("hug"))
    // continuation longest match: b + ##ug beats b + ##u + ##g
    assert(WordPiece.encodeWord("bug", v) == Vector("b", "##ug"))
    // whole-word [UNK] on any unmatched position — no partial output
    assert(WordPiece.encodeWord("hugz", v) == Vector(WordPiece.Unk))
    assert(WordPiece.encodeWord("zug", v) == Vector(WordPiece.Unk))
  }

  test("covered words round-trip: stripping ## and concatenating reproduces the word") {
    val vocab = WordPiece.FrozenVocab.toSet
    val words = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("\\A[a-z]+\\z"))
      .distinct().as[String].collect()
    assert(words.nonEmpty)
    words.foreach { w =>
      val toks = WordPiece.encodeWord(w, vocab)
      // [a-z]+ words are always covered: the alphabet is in the vocab
      assert(toks != Vector(WordPiece.Unk), s"$w should be covered")
      val back = toks.map(t => if (t.startsWith("##")) t.drop(2) else t).mkString
      assert(back == w, s"$w decoded to $back via $toks")
      // every continuation carries ##, the head does not
      assert(!toks.head.startsWith("##"))
      assert(toks.tail.forall(_.startsWith("##")))
    }
  }

  test("mergePass equals repeated leftmost replacement on planted runs") {
    // 'a ##a ##a' under (a, ##a): leftmost merge wins, tail stays
    assert(WordPiece.mergePass(Vector("a", "##a", "##a"), "a", "##a", "aa")
      == Vector("aa", "##a"))
    // interior runs: (##a, ##a) over four — two disjoint merges
    assert(WordPiece.mergePass(Vector("b", "##a", "##a", "##a", "##a"),
      "##a", "##a", "##aa") == Vector("b", "##aa", "##aa"))
    // no occurrence → identity
    assert(WordPiece.mergePass(Vector("x", "##y"), "a", "##b", "ab")
      == Vector("x", "##y"))
  }

  test("FrozenWpMerges re-derives from the live trainer at sf0.01") {
    val live = WordPiece.train(Tables.documents(spark, sf001), "text", 24)
    assert(live == WordPiece.FrozenWpMerges,
      s"frozen WordPiece merge table drifted:\n$live")
  }

  test("tokenizeToIds: [UNK] takes id 0, ids mirror the encode face") {
    val ids = WordPiece.pieceIds(WordPiece.FrozenVocab)
    assert(ids(WordPiece.Unk) == 0)
    assert(ids.values.toSeq.sorted == (0 until ids.size))
    val docs = Tables.documents(spark, sf0001).limit(30)
    val enc = WordPiece.tokenizeDocs(docs, "doc_id", "text",
      WordPiece.FrozenVocab)
      .select($"doc_id", $"wp_text").as[(Long, String)].collect().toMap
    WordPiece.tokenizeToIds(docs, "doc_id", "text", WordPiece.FrozenVocab)
      .select($"doc_id", $"n_wp_tokens", $"wp_ids")
      .as[(Long, Long, Seq[Int])].collect().foreach {
        case (id, n, wpIds) =>
          val toks = enc(id).split(' ').toSeq
          assert(wpIds.length.toLong == n)
          assert(wpIds == toks.map(ids(_)), s"doc $id ids diverge")
      }
  }

  test("vocabOf: alphabet floor + deduped merge products") {
    val v = WordPiece.vocabOf(Vector(("a", "##b"), ("ab", "##c"), ("a", "##b")))
    assert(v.count(_ == "ab") == 1 && v.contains("abc"))
    (('a' to 'z').map(_.toString) ++ ('a' to 'z').map("##" + _))
      .foreach(p => assert(v.contains(p)))
  }

  test("tokenizeDocs: token stream reassembles in word order with exact counts") {
    val docs = Tables.documents(spark, sf0001).limit(50)
    val out = WordPiece.tokenizeDocs(docs, "doc_id", "text",
      WordPiece.FrozenVocab).cache()
    out.select($"doc_id", $"n_words", $"n_wp_tokens", $"wp_text")
      .as[(Long, Long, Long, String)].collect().foreach {
        case (_, nWords, nTok, wpText) =>
          val toks = wpText.split(' ')
          assert(toks.length.toLong == nTok)
          // word heads = tokens that are [UNK] or not ##-prefixed
          val heads = toks.count(t => !t.startsWith("##"))
          assert(heads.toLong == nWords, s"$heads heads vs $nWords words")
      }
    out.unpersist()
  }
}

package graft.operators

import org.apache.spark.sql.execution.exchange.Exchange

class ChunkerSpec extends graft.SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, size: Int, stride: Int) =
    Chunker.chunkByTokens(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text", size, stride)
      .orderBy("chunk_id")
      .select("chunk_text", "chunk_tokens")
      .as[(String, Long)].collect().toSeq

  test("overlapping windows: stride < size") {
    // 7 tokens, size 3, stride 2 → starts 0,2,4,6
    assert(chunksOf("a b c d e f g", 3, 2) ==
      Seq(("a b c", 3L), ("c d e", 3L), ("e f g", 3L), ("g", 1L)))
  }

  test("non-overlapping windows: stride == size") {
    assert(chunksOf("a b c d e", 2, 2) ==
      Seq(("a b", 2L), ("c d", 2L), ("e", 1L)))
  }

  test("document shorter than one chunk is a single whole chunk") {
    assert(chunksOf("a b", 32, 24) == Seq(("a b", 2L)))
    assert(chunksOf("", 32, 24) == Seq(("", 1L))) // "" splits to [""]
  }

  test("chunk ids count per document and every token span is covered") {
    val df = Chunker.chunkByTokens(
      Seq((1L, "a b c d e"), (2L, "x y")).toDF("doc_id", "text"),
      "doc_id", "text", size = 2, stride = 2)
    val byDoc = df.orderBy("doc_id", "chunk_id")
      .as[(Long, Long, String, Long)].collect().groupBy(_._1)
    assert(byDoc(1L).map(_._2).toSeq == Seq(0L, 1L, 2L))
    assert(byDoc(2L).map(_._2).toSeq == Seq(0L))
    // concatenating stride==size chunks reconstructs the document
    assert(byDoc(1L).map(_._3).mkString(" ") == "a b c d e")
  }

  test("plan is shuffle-free (map-side generate only)") {
    val df = Chunker.chunkByTokens(
      graft.core.Tables.documents(spark, sf001).select($"doc_id", $"text"),
      "doc_id", "text", 32, 24)
    val exchanges = df.queryExecution.executedPlan.collect {
      case e: Exchange => e
    }
    assert(exchanges.isEmpty, s"chunking must not shuffle: $exchanges")
  }

  test("truncateMiddle: inclusive boundary, head+tail kept, byte-exact passthrough") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, (1 to 5).map(i => s"t$i").mkString(" ")),  // == head+tail: unchanged
      (2L, (1 to 8).map(i => s"t$i").mkString(" ")),  // keeps t1..t3 + t7 t8
      (3L, "a  b"))                                    // double space survives
      .toDF("doc_id", "text")
    val out = Chunker.truncateMiddle(docs, "doc_id", "text", head = 3, tail = 2)
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out(0) == ((1L, 5L, 0L, "t1 t2 t3 t4 t5")))
    assert(out(1) == ((2L, 8L, 3L, "t1 t2 t3 t7 t8")))
    assert(out(2) == ((3L, 3L, 0L, "a  b")),
      "short docs must pass through byte-exact, empty tokens and all")
  }
}

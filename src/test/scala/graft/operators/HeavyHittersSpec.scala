package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("planted corpus: exact counts, exact threshold, tail excluded") {
    // 100 "hot" tokens, 40 "warm", 1 each of 60 rare -> total 200
    val docs = Seq(
      (1L, Seq.fill(60)("hot").mkString(" ")),
      (2L, (Seq.fill(40)("hot") ++ Seq.fill(40)("warm")).mkString(" ")),
      (3L, (1 to 60).map(i => s"rare$i").mkString(" "))
    ).toDF("doc_id", "text")
    // denom=4: threshold is total/4 = 50 -> hot (100) qualifies,
    // warm (40) and every rare (1) do not
    val out = HeavyHitters.frequentTerms(docs, "doc_id", "text",
        denom = 4L)
      .as[(String, Long)].collect().toSeq.sortBy(_._1)
    assert(out == Seq(("hot", 100L)))
  }

  test("empty and all-empty-token corpora return an empty frame, no NPE") {
    // count_min_sketch over zero rows yields a NULL sketch; the
    // early-return guard must fire instead of feeding null into
    // CountMinSketch.readFrom
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(HeavyHitters.frequentTerms(empty, "doc_id", "text").count() == 0L)
    val blank = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val out = HeavyHitters.frequentTerms(blank, "doc_id", "text")
    assert(out.count() == 0L)
    assert(out.columns.toSeq == Seq("term", "cnt"))
  }

  test("matches the naive exact groupBy at every threshold") {
    val docs = graft.core.Tables.documents(spark, sf001)
    val terms = docs
      .select(explode(split($"text", " ", -1)).as("term"))
      .filter($"term" =!= "")
    val total = terms.count()
    for (denom <- Seq(100L, 1000L)) {
      val naive = terms.groupBy($"term").agg(count(lit(1)).as("cnt"))
        .filter($"cnt" * denom >= total)
        .as[(String, Long)].collect().toSeq.sortBy(_._1)
      val pruned = HeavyHitters.frequentTerms(docs, "doc_id", "text",
          denom = denom)
        .as[(String, Long)].collect().toSeq.sortBy(_._1)
      assert(pruned == naive, s"mismatch at denom=$denom")
      assert(naive.nonEmpty, s"degenerate check at denom=$denom")
    }
  }

  test("boundary: a count exactly at the threshold survives") {
    // total 8 tokens, denom 4 -> threshold 2; "edge" has exactly 2
    val docs = Seq((1L, "edge a b c d e f edge")).toDF("doc_id", "text")
    val out = HeavyHitters.frequentTerms(docs, "doc_id", "text",
        denom = 4L)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("edge", 2L)))
  }
}

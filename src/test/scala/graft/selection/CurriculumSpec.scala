package graft.selection

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  // 90 docs, scores 0.01..0.90 — terciles are unambiguous
  private def docs = (1L to 90L).map(i => (i, i / 100.0)).toDF("doc_id", "q")

  test("bands are score terciles, easiest (highest score) first") {
    val out = Curriculum.shardOrder(docs, "doc_id", "q", nShards = 4,
      exact = true).cache()
    val bands = out.groupBy($"band").count()
      .as[(Int, Long)].collect().toMap
    assert(bands == Map(1 -> 30L, 2 -> 30L, 3 -> 30L))
    // every band-1 score >= every band-2 score >= every band-3 score
    val byBand = out.join(docs, "doc_id")
      .groupBy($"band").agg(min($"q").as("lo"), max($"q").as("hi"))
      .as[(Int, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byBand(1)._1 > byBand(2)._2 && byBand(2)._1 > byBand(3)._2)
  }

  test("pos is a dense 1-based rank within (band, shard); order is md5-deterministic") {
    val out = Curriculum.shardOrder(docs, "doc_id", "q", nShards = 4,
      exact = true)
    val dense = out.groupBy($"band", $"shard")
      .agg(count(lit(1)).as("n"), max($"pos").as("mx"), min($"pos").as("mn"))
      .filter($"mx" =!= $"n" || $"mn" =!= 1)
    assert(dense.isEmpty, "positions must be dense 1..n per (band, shard)")
    // repartition-invariance: same addresses under a different layout
    val again = Curriculum.shardOrder(docs.repartition(7), "doc_id", "q",
      nShards = 4, exact = true)
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
  }

  test("approx path agrees with exact on a well-separated distribution") {
    val ex = Curriculum.shardOrder(docs, "doc_id", "q", nShards = 4, exact = true)
      .select($"doc_id", $"band")
    val ap = Curriculum.shardOrder(docs, "doc_id", "q", nShards = 4, exact = false)
      .select($"doc_id", $"band")
    // percentile_approx at accuracy 10000 over 90 distinct values is
    // an exact order statistic; conventions may differ by one rank at
    // the boundary, so allow <= 2 strays of 90
    val diff = ex.join(ap, "doc_id")
      .filter(ex("band") =!= ap("band")).count()
    assert(diff <= 2, s"approx bands diverged on $diff of 90 docs")
  }
}

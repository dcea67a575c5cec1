package graft.apps

import graft.SparkSpec

class CorpusPrepSpec extends SparkSpec {
  import spark.implicits._

  test("dropNearDups removes the later near-duplicate, keeps originals and unrelated docs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again tonight my friend"),
      (2L, "quick brown fox jumps over the lazy dog again tonight my friend"), // near-dup of 1
      (3L, "completely different text about spark engines and scala pipelines today")
    ).toDF("doc_id", "text")
    val kept = CorpusPrepApp.dropNearDups(docs, threshold = 0.8)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L)) // 2 dropped (larger id of the near-dup pair)
  }
}

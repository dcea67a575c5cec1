package graft.sources

import org.apache.spark.sql.functions._

class ManifestSpec extends graft.SparkSpec {
  import spark.implicits._

  private def corpus = (0L until 64L).map(i =>
    (i, s"doc $i body with token$i and more filler words here"))
    .toDF("doc_id", "text")

  test("manifest is row-order and partitioning invariant") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      Manifest.shardManifest(df, "doc_id", "text", 8)
        .orderBy("shard")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val base = rows(corpus)
    assert(base.nonEmpty && base.map(_._2).sum == 64L)
    assert(rows(corpus.repartition(13)) == base)
    assert(rows(corpus.orderBy($"doc_id".desc)) == base)
  }

  test("identical inputs diff to zero rows") {
    val m = Manifest.shardManifest(corpus, "doc_id", "text", 8)
    assert(Manifest.manifestDiff(m, m).count() == 0)
  }

  test("a single-character corruption flips exactly its shard's row") {
    val tweaked = corpus.select($"doc_id",
      when($"doc_id" === 17L, concat($"text", lit("!")))
        .otherwise($"text").as("text"))
    val d = Manifest.manifestDiff(
      Manifest.shardManifest(corpus, "doc_id", "text", 8),
      Manifest.shardManifest(tweaked, "doc_id", "text", 8)).collect()
    assert(d.length == 1, s"exactly one shard must differ, got ${d.toSeq}")
    // counts agree (no token added by '!' — it glues to the last
    // token), only the checksum flips
    assert(d.head.getAs[Long]("a_docs") == d.head.getAs[Long]("b_docs"))
    assert(d.head.getAs[Long]("a_checksum") != d.head.getAs[Long]("b_checksum"))
  }

  test("a dropped document flips its shard's count and checksum") {
    val d = Manifest.manifestDiff(
      Manifest.shardManifest(corpus, "doc_id", "text", 8),
      Manifest.shardManifest(corpus.filter($"doc_id" =!= 3L),
        "doc_id", "text", 8)).collect()
    assert(d.length == 1)
    assert(d.head.getAs[Long]("a_docs") == d.head.getAs[Long]("b_docs") + 1)
  }
}

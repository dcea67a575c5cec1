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

  test("scopedOverlap: changed shards recompute, carried shards never read a doc") {
    // release B: doc 17 gains novel text (changed, NOT a dup of A);
    // doc 3 takes doc 5's text (changed AND a cross-doc dup of A —
    // doc 5 lives in a DIFFERENT shard, so the probe must hit the
    // full store, not the shard-local slice)
    val b = corpus.select($"doc_id",
      when($"doc_id" === 17L, lit("entirely novel replacement body"))
        .when($"doc_id" === 3L, lit("doc 5 body with token5 and more filler words here"))
        .otherwise($"text").as("text"))
    val aManifest = Manifest.shardManifest(corpus, "doc_id", "text", 8)
    val aFps = corpus.select(md5($"text").as("fp")).distinct()
    val got = Manifest.scopedOverlap(aManifest, aFps, b,
      "doc_id", "text", 8)
      .as[(Long, Long, Long)].collect()
      .map { case (s, n, o) => s -> ((n, o)) }.toMap
    // full recompute the hard way, as the reference answer
    val expected = b
      .select(Manifest.shardOf($"doc_id", 8).as("shard"), md5($"text").as("fp"))
      .join(aFps.withColumn("__hit", lit(1L)), Seq("fp"), "left")
      .groupBy($"shard")
      .agg(count(lit(1)).as("n"), sum(coalesce($"__hit", lit(0L))).as("o"))
      .as[(Long, Long, Long)].collect()
      .map { case (s, n, o) => s -> ((n, o)) }.toMap
    assert(got == expected)
    // the carry really happened: every UNCHANGED shard reports full
    // overlap, and the two changed shards disagree with their doc
    // counts exactly per plant (doc 17 novel -> one miss; doc 3's new
    // text IS in A -> no miss)
    def shardOfId(id: Long): Long =
      corpus.filter($"doc_id" === id)
        .select(Manifest.shardOf($"doc_id", 8)).as[Long].head()
    val (s17, s3v) = (shardOfId(17L), shardOfId(3L))
    for ((s, (n, o)) <- got if s != s17 && s != s3v) assert(n == o)
    assert(got(s17)._1 == got(s17)._2 + 1)
    if (s3v != s17) assert(got(s3v)._1 == got(s3v)._2)
  }
}

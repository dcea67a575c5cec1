package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}

class PackingSpec extends graft.SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  // brute-force reference: md5 order → cumsum → span enumeration
  private def expectedSpans(docs: Seq[(Long, String)], seqLen: Int) = {
    val ordered = docs.map { case (id, t) =>
      (id, t.split(" ", -1).length.toLong)
    }.sortBy { case (id, _) => (md5hex(id.toString), id) }
    var off = 0L
    ordered.flatMap { case (id, n) =>
      val start = off; off += n
      (start / seqLen to (start + n - 1) / seqLen).map { p =>
        val a = math.max(start, p * seqLen)
        val b = math.min(start + n, (p + 1) * seqLen)
        (p, id, a - start, a - p * seqLen, b - a)
      }
    }.sortBy(r => (r._1, r._2))
  }

  private val fixture = (0L until 40L).map(i =>
    (i, Seq.fill(3 + (i % 11).toInt)("tok").mkString(" ")))

  private def spans(buckets: Int, seqLen: Int = 7) =
    Packing.packSpans(fixture.toDF("doc_id", "text"), "doc_id", "text",
      seqLen, buckets)
      .orderBy("pack_id", "doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

  test("span map matches the brute-force concat-and-chunk reference") {
    assert(spans(buckets = 16) == expectedSpans(fixture, 7))
  }

  test("bucketed two-phase prefix sum == unbucketed (any bucket count)") {
    val one = spans(buckets = 1)
    assert(spans(buckets = 16) == one)
    assert(spans(buckets = 256) == one)
    assert(spans(buckets = 4096) == one)
  }

  test("result is invariant to input partition layout") {
    val a = Packing.packSpans(fixture.toDF("doc_id", "text"),
      "doc_id", "text", 7, 16)
      .orderBy("pack_id", "doc_id").collect().toSeq
    val b = Packing.packSpans(fixture.toDF("doc_id", "text").repartition(13),
      "doc_id", "text", 7, 16)
      .orderBy("pack_id", "doc_id").collect().toSeq
    assert(a == b)
  }

  test("every pack is exactly seqLen tokens except the last; docs fully covered") {
    val df = Packing.packSpans(
      graft.core.Tables.documents(spark, sf001).select($"doc_id", $"text"),
      "doc_id", "text", seqLen = 512)
    val fill = Packing.packFill(df)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val lastPack = fill.map(_._1).max
    assert(fill.collect { case (p, _, f) if p != lastPack => f }
      .forall(_ == 512L), "non-final packs must be full")
    assert(fill.last._3 <= 512L)
    // token conservation: spans per doc sum to the doc's token count
    val perDoc = df.groupBy("doc_id").sum("n_toks")
      .as[(Long, Long)].collect().toMap
    val toks = graft.core.Tables.documents(spark, sf001)
      .select($"doc_id", org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split($"text", " ", -1)).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(perDoc == toks)
  }

  test("bucket totals reuse the phase-1 shuffle: ReusedExchange, not a second scan") {
    // AQE finalizes reuse at runtime — collect first, then audit
    val df = Packing.packSpans(
      graft.core.Tables.documents(spark, sf001).select($"doc_id", $"text"),
      "doc_id", "text", seqLen = 512, buckets = 256)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), plan)
    assert(plan.contains("ReusedExchange"),
      s"bucket-total agg must read the phase-1 shuffle, not rescan:\n$plan")
  }

  test("no full-width global window: the big-side window is bucket-partitioned") {
    val df = Packing.packSpans(
      graft.core.Tables.documents(spark, sf001).select($"doc_id", $"text"),
      "doc_id", "text", seqLen = 512, buckets = 256)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: LWindow => w
    }
    val (global, keyed) = windows.partition(_.partitionSpec.isEmpty)
    // the corpus-wide cumsum is keyed by the md5-prefix bucket (it
    // appears twice in the LOGICAL tree — once per consumer — and
    // collapses to one ReusedExchange stage physically, audited above)
    assert(keyed.nonEmpty && keyed.size <= 2,
      s"big-side window must be bucket-partitioned:\n$windows")
    // … and the only unpartitioned window sits above the ≤buckets-row
    // per-bucket aggregate, never over the corpus
    assert(global.size == 1 &&
      global.head.collectFirst { case a: Aggregate => a }.nonEmpty,
      "global window must consume the bucket aggregate only")
  }

  // ---- packSequences: dense cross-doc training sequences ----

  private val idsFixture = (0L until 25L).map(i =>
    (i, (0 until 1 + (i % 7).toInt).map(j => ((i * 7 + j) % 50).toInt)))

  private def idsDf(part: Int = 0) = {
    val d = idsFixture.toDF("doc_id", "bpe_ids")
    (if (part > 0) d.repartition(part) else d)
      .withColumn("n_bpe_tokens",
        org.apache.spark.sql.functions.size($"bpe_ids").cast("long"))
  }

  test("packSequences matches brute-force sep-terminated concat-and-chunk") {
    val sep = 99
    val got = Packing.packSequences(idsDf(), "doc_id", "bpe_ids",
      "n_bpe_tokens", seqLen = 7, sepId = sep, buckets = 16)
      .orderBy("pack_id").as[(Long, Long, Seq[Int])].collect().toSeq
    val stream = idsFixture
      .sortBy { case (id, _) => (md5hex(id.toString), id) }
      .flatMap { case (_, ids) => ids :+ sep }
    val expected = stream.grouped(7).zipWithIndex.map { case (g, i) =>
      (i.toLong, g.length.toLong, g.toSeq)
    }.toSeq
    assert(got == expected)
    // every pack but the last is exactly full — the property tk6's
    // per-doc windows lack
    assert(got.dropRight(1).forall(_._2 == 7L))
  }

  test("packSequences is invariant to input partition layout and bucket count") {
    def run(part: Int, buckets: Int) =
      Packing.packSequences(idsDf(part), "doc_id", "bpe_ids",
        "n_bpe_tokens", seqLen = 7, sepId = 99, buckets = buckets)
        .orderBy("pack_id").as[(Long, Long, Seq[Int])].collect().toSeq
    val base = run(0, 1)
    assert(run(13, 16) == base)
    assert(run(7, 256) == base)
  }

  test("packSequences: no corpus-wide global window; shuffle carries segments, not docs") {
    val ids = graft.functions.Bpe.tokenizeToIds(
      graft.core.Tables.documents(spark, sf001).select($"doc_id", $"text"),
      "doc_id", "text", graft.functions.Bpe.FrozenMerges)
    val df = Packing.packSequences(ids, "doc_id", "bpe_ids",
      "n_bpe_tokens", seqLen = 128,
      sepId = graft.functions.Bpe.sepId(graft.functions.Bpe.FrozenMerges))
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: LWindow => w
    }
    val (global, keyed) = windows.partition(_.partitionSpec.isEmpty)
    assert(keyed.nonEmpty, s"big-side window must be bucket-partitioned:\n$windows")
    assert(global.forall(
      _.collectFirst { case a: Aggregate => a }.nonEmpty),
      "any unpartitioned window must sit above the ≤buckets-row aggregate")
    // the pack-keyed exchange ships sliced segments (≤seqLen ids/row):
    // the slice happens BELOW the final aggregate's shuffle
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("slice("), s"segment slice missing from plan:\n$plan")
  }

  test("packSequences conserves ids: sum(n_ids) == sum(n_bpe_tokens + 1)") {
    val packs = Packing.packSequences(idsDf(), "doc_id", "bpe_ids",
      "n_bpe_tokens", seqLen = 7, sepId = 99, buckets = 16)
    val total = packs.agg(org.apache.spark.sql.functions.sum($"n_ids"))
      .head().getLong(0)
    assert(total == idsFixture.map(_._2.length + 1).sum.toLong)
  }

  test("lengthBuckets: boundary assignment, clamp, batch count, waste") {
    // lengths: 8 → bucket 16 (waste 8); 16 → 16 (waste 0, boundary is
    // inclusive); 17 → 32 (waste 15); 300 → clamps to 64 (waste 0,
    // kept truncates to 64)
    val counts = Seq((1L, 8L), (2L, 16L), (3L, 17L), (4L, 300L))
      .toDF("doc_id", "n_toks")
    val out = Packing.lengthBuckets(counts, "n_toks",
      boundaries = Seq(16, 32, 64), batchSize = 2)
      .orderBy($"bucket")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(16L, 32L, 64L))
    val by = out.map(r => r._1 -> r).toMap
    assert(by(16L) == ((16L, 2L, 1L, 24L, 8L, 8.0 / 32.0)))
    assert(by(32L) == ((32L, 1L, 1L, 17L, 15L, 15.0 / 32.0)))
    assert(by(64L) == ((64L, 1L, 1L, 64L, 0L, 0.0)))
    // batch ceil-div: 3 docs at batchSize 2 → 2 batches
    val many = Seq.tabulate(3)(i => (i.toLong, 10L)).toDF("doc_id", "n_toks")
    val nb = Packing.lengthBuckets(many, "n_toks", Seq(16), batchSize = 2)
      .select($"n_batches").as[Long].head()
    assert(nb == 2L)
  }

  test("suggestBoundaries: exact rank convention, duplicates, partitioning invariance") {
    // lengths 1..6, sextiles: boundary k = smallest len with cum*6 >= k*6
    val six = (1 to 6).map(i => (i.toLong, i.toLong)).toDF("doc_id", "n_toks")
    def rows(df: org.apache.spark.sql.DataFrame, parts: Int) =
      Packing.suggestBoundaries(df, "n_toks", parts)
        .orderBy($"k").as[(Long, Long)].collect().toSeq
    assert(rows(six, 6) == (1L to 5L).map(k => (k, k)))
    // duplicates: {2,2,2,10}, quartiles — cum(2)=3 crosses k=1,2,3
    val dup = Seq(2L, 2L, 2L, 10L).zipWithIndex
      .map { case (n, i) => (i.toLong, n) }.toDF("doc_id", "n_toks")
    assert(rows(dup, 4) == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    assert(rows(dup.repartition(7), 4) == rows(dup, 4))
  }
}

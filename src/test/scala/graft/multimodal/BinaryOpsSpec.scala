package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BinaryOpsSpec extends SparkSpec {
  import spark.implicits._

  private def media = BinaryOps.asMediaTable(
    Seq((1L, "abcdefghij", 300L), (2L, "xy", 10L))
      .toDF("doc_id", "text", "n_chars"))

  test("media table carries binary payload + typed metadata") {
    val r = media.filter($"doc_id" === 1).head()
    assert(r.getAs[Array[Byte]]("payload").toSeq == "abcdefghij".getBytes("UTF-8").toSeq)
    assert(r.getAs[Int]("width") == 300 && r.getAs[Int]("height") == 300 % 480)
  }

  test("decode stub: first bytes scaled to [0,1], zero-padded when short") {
    val feats = BinaryOps.extractFeatures(media).collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).features.head == 'a'.toInt / 255.0)
    assert(feats(1L).features.length == BinaryOps.FeatureDim)
    assert(feats(2L).features(2) == 0.0) // "xy" has 2 bytes → padding
  }

  test("batched decode is row-identical to per-row decode (incl. odd batch edges)") {
    val docs = graft.core.Tables.documents(spark, sf0001).limit(150)
    val media = BinaryOps.asMediaTable(docs)
    val perRow = BinaryOps.extractFeatures(media).collect()
      .map(f => f.doc_id -> f.features.toSeq).toMap
    val batched = BinaryOps.extractFeaturesBatched(media, batchSize = 7).collect()
      .map(f => f.doc_id -> f.features.toSeq).toMap
    assert(batched == perRow && perRow.size == 150)
  }

  test("resize keeps features, changes metadata; frameSample strides") {
    val feats = BinaryOps.extractFeatures(media)
    val resized = BinaryOps.resize(feats, 64, 64).collect().head
    assert(resized.width == 64 && resized.height == 64)
    val sampled = BinaryOps.frameSample(feats, stride = 2)
      .filter($"doc_id" === 1).select($"sampled").as[Array[Double]].head()
    assert(sampled.length == BinaryOps.FeatureDim / 2)
    assert(sampled.head == 'a'.toInt / 255.0 && sampled(1) == 'c'.toInt / 255.0)
  }
}

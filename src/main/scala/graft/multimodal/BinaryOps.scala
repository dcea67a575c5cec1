package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata; decode/feature-extract
  * runs as partition-batched JVM code over the binary column (the Scala
  * analogue of a pandas `mapInPandas` batch UDF). The actual codec step
  * is STUBBED — media libraries are not in this container — with a
  * deterministic byte-derived fake, so the Spark-side contract
  * (schema, partitioning, batch shape, null behavior) is real and
  * oracle-testable while the codec stays swappable.
  *
  * Scale notes: decode is embarrassingly parallel (mapPartitions, no
  * shuffle); payload bytes never enter a shuffle — feature extraction
  * projects them down to fixed-width vectors first, which is the only
  * sane layout at 100 TB of media.
  */
object BinaryOps {

  val FeatureDim = 8

  final case class MediaRecord(doc_id: Long, payload: Array[Byte],
                               format: String, width: Int, height: Int)
  final case class MediaFeatures(doc_id: Long, format: String, width: Int,
                                 height: Int, features: Array[Double])

  /** Wrap a text corpus as a media table: payload = utf-8 bytes,
    * metadata derived deterministically (stands in for real image
    * dimensions).
    */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("fake/raw").as("format"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") % 480).cast("int").as("height"))

  /** ===== STUB: deterministic fake decoder =====
    * A real implementation would decode the codec here (JPEG/PNG/WAV…)
    * and emit pixel/sample features. The fake maps the first
    * [[FeatureDim]] payload bytes to [0,1] doubles — deterministic,
    * cross-engine reproducible, and shape-identical to a real decoder.
    */
  def decodeStub(payload: Array[Byte]): Array[Double] =
    Array.tabulate(FeatureDim)(i =>
      if (i < payload.length) (payload(i) & 0xff) / 255.0 else 0.0)

  /** Partition-batched decode / feature extraction (no shuffle). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload", "format", "width", "height")
      .as[MediaRecord]
      .mapPartitions(_.map(r =>
        MediaFeatures(r.doc_id, r.format, r.width, r.height, decodeStub(r.payload))))
  }

  /** ===== STUB: batch decoder =====
    * Real codecs (and any GPU/SIMD feature extractor) want BATCHES, not
    * rows — this is the Scala analogue of a pandas `mapInPandas` batch
    * UDF: the partition iterator is chunked, the whole chunk is handed
    * to the (stubbed) codec at once, results stream back out. Output is
    * row-for-row identical to [[extractFeatures]].
    */
  def extractFeaturesBatched(media: DataFrame, batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload", "format", "width", "height")
      .as[MediaRecord]
      .mapPartitions(_.grouped(batchSize).flatMap { batch =>
        // a real implementation decodes `batch` in one codec/device call
        val decoded = batch.map(r => decodeStub(r.payload))
        batch.lazyZip(decoded).map { (r, f) =>
          MediaFeatures(r.doc_id, r.format, r.width, r.height, f)
        }
      })
  }

  /** Stub resize: metadata-only transform (a real one would re-decode;
    * the contract — new dims, same features — is what downstream sees).
    */
  def resize(features: Dataset[MediaFeatures], w: Int, h: Int): Dataset[MediaFeatures] = {
    val spark = features.sparkSession
    import spark.implicits._
    features.map(f => f.copy(width = w, height = h))
  }

  /** Frame sampling stub for video-like payloads: every `stride`-th
    * feature, padded — fixed output arity like a real frame sampler.
    */
  def frameSample(features: Dataset[MediaFeatures], stride: Int): DataFrame = {
    val spark = features.sparkSession
    import spark.implicits._
    features.map { f =>
      val sampled = f.features.indices.collect {
        case i if i % stride == 0 => f.features(i)
      }.toArray
      (f.doc_id, sampled)
    }.toDF("doc_id", "sampled")
  }
}

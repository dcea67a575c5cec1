package graft.streaming

import graft.functions.TextAnalysis
import graft.quality.Redact
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming face of corpus curation — continuous
  * training-data ingestion: a file-source stream of document batches
  * flows through the SAME quality-filter / PII-redaction / chunking
  * expressions as the batch pipeline (they are stateless Catalyst
  * projections, so they run unchanged in micro-batch with Append
  * output and no watermark or state store at all).
  *
  * Scale note: stateless streams are embarrassingly parallel per
  * micro-batch — the only cross-batch machinery is source tracking of
  * processed files, so throughput is the batch pipeline's throughput.
  * Parity is the correctness contract: `e9_stream_curation` /
  * `e10_stream_chunks` must equal their batch twins exactly.
  */
object DocStream {

  /** documents.parquet schema as stored. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-source stream over a directory of documents parquet. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(dir)

  /** Stateless curation: quality-gate then PII-scrub. Identical
    * expressions to the batch faces (t2 quality, pii1 redact).
    */
  def curate(docs: DataFrame, minQuality: Double): DataFrame =
    docs
      .filter(TextAnalysis.qualityScore(col("text")) >= minQuality)
      .select(col("doc_id"), Redact.redactPii(col("text")).as("text"))

  /** Stateless chunking: the batch Chunker's generate fan-out, in
    * micro-batch (map-side explode streams straight to the sink).
    */
  def chunk(docs: DataFrame, size: Int, stride: Int): DataFrame =
    graft.operators.Chunker.chunkByTokens(docs, "doc_id", "text", size, stride)

  /** Continuous-ingestion dedup against a HISTORICAL store: drop
    * stream documents whose normalized fingerprint already exists in
    * the static fingerprint table (`store(fp)`). Spelled as
    * stream-static left-outer + null filter — the supported stateless
    * form of the anti-join (stream-static left_anti is not in
    * Structured Streaming's join matrix); per micro-batch the static
    * side broadcasts, so this is the same shape as the batch
    * Boilerplate/Decontam filters: the stream is filtered where it
    * lies, no state store, no watermark.
    *
    * In-batch duplicates are NOT collapsed here (that is
    * [[EventStream.dedupWithinWatermark]]'s job with a key on the
    * fingerprint); this operator's contract is purely
    * "never re-admit what the store already has".
    */
  final case class TopKState(rows: Seq[(Double, Long)])
  final case class KeptDoc(stratum: String, doc_id: Long, es_key: Double)

  /** Streaming per-stratum weighted sampling: the continuous-ingestion
    * face of [[graft.operators.Sampling.weightedTopKPerStratum]]. Each
    * stratum's keyed state holds exactly its current top-k
    * (rank-key, id) pairs — state is bounded by strata × k for ANY
    * stream length, and eviction is the merge itself (a new better row
    * pushes the worst one out). Because the rank key is a pure row
    * function (md5-uniform, no RNG), the stream's converged answer
    * equals the batch draw over the same rows EXACTLY — which is how
    * the e12 gate oracles it against DuckDB. Update mode re-emits a
    * stratum's refreshed top-k each micro-batch it changes.
    */
  def weightedTopKUpdates(docs: DataFrame, idCol: String,
                          strataCol: String, weightCol: String, k: Int,
                          seed: String = ""):
      org.apache.spark.sql.Dataset[KeptDoc] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(k >= 1, s"k=$k must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col(weightCol) > 0)
      .select(col(strataCol).cast("string"), col(idCol).cast("long"),
        graft.operators.Sampling.esKey(col(idCol), col(weightCol), seed))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[TopKState, KeptDoc](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (stratum, it, state) =>
          val merged =
            (state.getOption.map(_.rows).getOrElse(Seq.empty) ++
              it.map(r => (r._3, r._2)))
              .distinct                       // redelivery-safe
              .sortBy { case (key, id) => (-key, id) }
              .take(k)
          state.update(TopKState(merged))
          merged.iterator.map { case (key, id) => KeptDoc(stratum, id, key) }
      }
  }

  def dedupAgainstStore(docs: DataFrame, store: DataFrame): DataFrame =
    docs
      .withColumn("__fp", TextAnalysis.normalizedFingerprint(col("text")))
      .join(store.select(col("fp").as("__fp")).distinct()
          .withColumn("__seen", lit(1)),
        Seq("__fp"), "left_outer")
      .filter(col("__seen").isNull)
      .drop("__fp", "__seen")
}

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
  def dedupAgainstStore(docs: DataFrame, store: DataFrame): DataFrame =
    docs
      .withColumn("__fp", TextAnalysis.normalizedFingerprint(col("text")))
      .join(store.select(col("fp").as("__fp")).distinct()
          .withColumn("__seen", lit(1)),
        Seq("__fp"), "left_outer")
      .filter(col("__seen").isNull)
      .drop("__fp", "__seen")
}

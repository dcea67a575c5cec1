package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) record matching with blocking — the
  * entity-resolution step between exact dedup (hash groupBy) and
  * semantic near-dup (MinHash/SimHash/embeddings): catches typo-level
  * variants that shingle-based methods over- or under-match.
  *
  * Scale design: an unblocked fuzzy self-join is O(n²) Levenshtein
  * evaluations — a non-starter at corpus scale. Blocking turns it into
  * an equi-join on the block key (hash-partitioned, AQE-balanced); the
  * quadratic cost is confined to each block. The block key is the
  * caller's recall/cost dial: (length band, prefix, phonetic code,
  * LSH band, …). Levenshtein itself is Spark's codegen'd built-in, so
  * the whole pipeline stays inside whole-stage codegen.
  */
object Fuzzy {

  /** Candidate pairs (a_id < b_id) within equal `blockCols` whose
    * `textCol` values are within `maxDist` edits. Output:
    * blockCols…, a_id, b_id, dist(bigint).
    */
  def blockedEditDistancePairs(df: DataFrame, idCol: String, textCol: String,
                               blockCols: Seq[String], maxDist: Int): DataFrame = {
    require(blockCols.nonEmpty,
      "blocking is mandatory: an unblocked fuzzy self-join is O(n^2)")
    val base = df.select((blockCols :+ idCol :+ textCol).map(col): _*)
    val left = base.withColumnsRenamed(Map(idCol -> "a_id", textCol -> "a_text"))
    val right = base.withColumnsRenamed(Map(idCol -> "b_id", textCol -> "b_text"))
    left.join(right, blockCols)
      .filter(col("a_id") < col("b_id"))
      .withColumn("dist", levenshtein(col("a_text"), col("b_text")).cast("bigint"))
      .filter(col("dist") <= maxDist)
      .select((blockCols :+ "a_id" :+ "b_id" :+ "dist").map(col): _*)
  }
}

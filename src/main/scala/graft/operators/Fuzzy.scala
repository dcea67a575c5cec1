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
  * an equi-join on the block key; the quadratic cost is confined to
  * each block. The block key is the caller's recall/cost dial:
  * (length band, prefix, phonetic code, LSH band, …). Levenshtein
  * itself is Spark's codegen'd built-in, so the pipeline stays inside
  * whole-stage codegen.
  *
  * The quadratic stage is the JOIN OUTPUT, not its input — a planner
  * (or AQE) sizing partitions by input bytes would run the pair
  * explosion almost serially (measured 11 s → ~1 s at bench scale).
  * Two countermeasures: each block is salted into `subBlocks`
  * sub-blocks (left side keyed by hash(id) % s, right side replicated
  * to all s — every pair still meets exactly once, work spreads over
  * s × |blocks| keys), and both sides get an explicit user-specified
  * repartitioning on the join keys, which AQE honors (it never
  * coalesces user-requested partitioning), so the join runs at the
  * requested width with no extra exchange.
  */
object Fuzzy {

  /** Candidate pairs (a_id < b_id) within equal `blockCols` whose
    * `textCol` values are within `maxDist` edits. Output:
    * blockCols…, a_id, b_id, dist(bigint).
    *
    * @param subBlocks intra-block parallelism (defaults to the
    *                  cluster's default parallelism)
    */
  def blockedEditDistancePairs(df: DataFrame, idCol: String, textCol: String,
                               blockCols: Seq[String], maxDist: Int,
                               subBlocks: Option[Int] = None): DataFrame = {
    require(blockCols.nonEmpty,
      "blocking is mandatory: an unblocked fuzzy self-join is O(n^2)")
    val s = subBlocks.getOrElse(
      df.sparkSession.sparkContext.defaultParallelism).max(1)
    val base = df.select((blockCols :+ idCol :+ textCol).map(col): _*)
    val joinCols = blockCols :+ "__sub"
    val left = base
      .withColumnsRenamed(Map(idCol -> "a_id", textCol -> "a_text"))
      .withColumn("__sub", pmod(hash(col("a_id")), lit(s)))
      .repartition(s, joinCols.map(col): _*)
    val right = base
      .withColumnsRenamed(Map(idCol -> "b_id", textCol -> "b_text"))
      .withColumn("__sub", explode(sequence(lit(0), lit(s - 1))))
      .repartition(s, joinCols.map(col): _*)
    left.join(right, joinCols)
      .filter(col("a_id") < col("b_id"))
      // length band: |len(a)−len(b)| lower-bounds edit distance, so this
      // drops pairs EXACTLY when they cannot match — a cheap codegen'd
      // compare that skips the O(len²) DP for most of the pair explosion
      .filter(abs(length(col("a_text")) - length(col("b_text"))) <= maxDist)
      // threshold form early-exits the DP once a row of the matrix
      // exceeds maxDist (returns −1), bounding per-pair cost at
      // O(len·maxDist) instead of O(len²)
      .withColumn("dist",
        levenshtein(col("a_text"), col("b_text"), maxDist).cast("bigint"))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select((blockCols :+ "a_id" :+ "b_id" :+ "dist").map(col): _*)
  }
}

package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Windowed duplicate detection / deduplication — the reference's
  * signature capability (SURVEY.md §2.3, entry point B §3.2: occurrence
  * numbering over a composite key, occurrence histogram, reconciliation,
  * dedup-by-filter; reference sites
  * 2022-Standalone-SparkETL-identifyingDuplicateRows.ipynb:2156,2208,2230,8904).
  *
  * Scale notes: [[withOccurrenceId]] shuffles once on the key columns
  * (hash partition) and sorts within partitions — the same cost shape as
  * `dropDuplicates`, but it preserves the occurrence profile. When only
  * the deduplicated output is needed, [[dropExactDuplicates]] is cheaper
  * (partial-aggregate based, map-side combine) and should be preferred
  * at 100 TB. Skewed duplicate groups are handled by AQE skew-split since
  * the window key is the shuffle key.
  */
object Dedup {

  /** D1 — number every row 1..n within its duplicate group.
    * `order` must be a deterministic total order within a group (pass a
    * unique tiebreaker) if downstream consumers rely on *which* row is
    * kept; groups of genuinely identical rows don't care.
    */
  def withOccurrenceId(df: DataFrame, keys: Seq[String], order: Seq[Column],
                       idCol: String = "occur_id"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn(idCol, row_number().over(w))
  }

  /** D2 — histogram of occurrence ids (how many rows are 1st, 2nd, … of
    * their duplicate group).
    */
  def occurrenceProfile(df: DataFrame, idCol: String = "occur_id"): DataFrame =
    df.groupBy(col(idCol)).agg(count(lit(1)).as("cnt")).orderBy(col(idCol))

  /** D3 — reconciliation: the profile's counts must sum back to the
    * input row count.
    */
  def reconcile(profile: DataFrame, cntCol: String = "cnt"): DataFrame =
    profile.agg(sum(col(cntCol)).cast("long").as("total_rows"))

  /** D4 — keep the first occurrence of each duplicate group. */
  def dedupByOccurrence(df: DataFrame, idCol: String = "occur_id"): DataFrame =
    df.filter(col(idCol) <= 1)

  /** D6 — one-shot exact dedup over a column subset (partial-agg based:
    * min of a deterministic representative per group would need the
    * window path; this is the cheap whole-row-distinct).
    */
  def dropExactDuplicates(df: DataFrame, subset: Seq[String] = Nil): DataFrame =
    if (subset.isEmpty) df.distinct() else df.dropDuplicates(subset)
}

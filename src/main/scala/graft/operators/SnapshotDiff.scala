package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot reconciliation: classify every id across two
  * snapshots of a table as added / removed / changed / unchanged — the
  * audit step between two crawl drops or two curation runs, answering
  * "what actually moved?" before retraining on the new corpus.
  *
  * Rows are compared by an md5 fingerprint over the chosen content
  * columns (null-safe: each value is length-prefixed before hashing so
  * `("ab","c")` ≠ `("a","bc")` and null ≠ `"null"`), so the wide
  * payload never crosses the wire twice — each side reduces to
  * (id, 32-char fp) before the ONE full-outer shuffle join on the id.
  * No window, no collect; output is |A ∪ B| rows, or 4 for [[census]].
  */
object SnapshotDiff {

  /** Null-safe order-preserving fingerprint of `cols` (md5 of
    * length-prefixed concatenation; nulls hash as a `~` sentinel,
    * which no length prefix can collide with).
    */
  def fingerprint(cols: Seq[String]): Column =
    md5(concat(cols.map { c =>
      val s = col(c).cast("string")
      coalesce(concat(length(s).cast("string"), lit(":"), s), lit("~"))
    }: _*))

  /** @param before  earlier snapshot
    * @param after   later snapshot
    * @param idCol   stable row identity (unique per snapshot)
    * @param cmpCols content columns whose change means "changed"
    * @return (idCol, status ∈ added|removed|changed|unchanged)
    */
  def diff(before: DataFrame, after: DataFrame, idCol: String,
           cmpCols: Seq[String]): DataFrame = {
    require(cmpCols.nonEmpty, "no content columns to compare")
    val a = before.select(col(idCol), fingerprint(cmpCols).as("__fp_a"))
    val b = after.select(col(idCol), fingerprint(cmpCols).as("__fp_b"))
    a.join(b, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__fp_a").isNull, "added")
          .when(col("__fp_b").isNull, "removed")
          .when(col("__fp_a") === col("__fp_b"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** 4-row rollup of [[diff]]: per-status count + id span. */
  def census(before: DataFrame, after: DataFrame, idCol: String,
             cmpCols: Seq[String]): DataFrame =
    diff(before, after, idCol, cmpCols)
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"),
        min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"))
}

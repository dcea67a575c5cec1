package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-maintenance operators the reference's MSSQL/BigQuery loads
  * imply but never implement (it only ever full-overwrites —
  * LAB-2022-Standalone-SparkETL-CSV-to-MSSQL-Copy3.ipynb cell 45 uses
  * mode("overwrite")): keyed MERGE/upsert and SCD2 interval derivation.
  * Both are plain relational plans, so Catalyst keeps pushdown/AQE.
  */
object Warehouse {

  /** MERGE (upsert): rows of `updates` win over `base` on `keys`;
    * unmatched update rows are inserts. Expressed as anti-join + union,
    * which at 100 TB is the right shape: the anti-join broadcasts
    * whenever `updates` is small (the common CDC batch case — AQE picks
    * this up from runtime stats), so the base table is never shuffled,
    * and the union is purely logical (no data movement).
    *
    * PRECONDITION: `updates` has at most one row per key (SQL MERGE
    * errors on multiple matches; this form would keep all of them). A
    * raw CDC batch with several changes per key must be reduced first —
    * [[upsertLatest]] does exactly that.
    *
    * Schemas must align (`unionByName`); project both sides first.
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    base.join(updates.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(updates)

  /** MERGE from a raw CDC batch: several changes per key are reduced to
    * the winner with the greatest `versionCol` (deterministic — version
    * ties resolve by the remaining columns' struct order) before the
    * upsert. The reduction is a map-side-combined argmax (a11 shape),
    * so the batch shrinks before it ever meets the base table.
    */
  def upsertLatest(base: DataFrame, updates: DataFrame, keys: Seq[String],
                   versionCol: String): DataFrame = {
    val others = updates.columns.toSeq.filterNot(keys.contains)
    val ordered = Seq(versionCol) ++ others.filterNot(_ == versionCol)
    val winners = updates
      .groupBy(keys.map(col): _*)
      .agg(max(struct(ordered.map(col): _*)).as("__w"))
      .select(keys.map(col) ++ ordered.map(c => col(s"__w.$c").as(c)): _*)
      .select(updates.columns.map(col): _*)
    upsert(base, winners, keys)
  }

  /** SCD2 interval derivation: collapse a keyed change stream into
    * `[valid_from, valid_to)` dimension rows. Consecutive rows with the
    * same `stateCol` value are merged; `valid_to` is NULL on the
    * current row (`is_current`).
    *
    * Both windows share one partitioning+ordering, so the whole
    * derivation is a single shuffle and a single sort per partition —
    * the natural shape for billions of rows per day keyed by entity.
    * Ordering must be made deterministic by the caller via `orderCols`
    * (include a unique tie-break column).
    */
  def scd2(changes: DataFrame, keys: Seq[String], tsCol: String,
           orderCols: Seq[Column], stateCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    changes
      .withColumn("__prev", lag(col(stateCol), 1).over(w))
      .filter(col("__prev").isNull || !(col("__prev") <=> col(stateCol)))
      .drop("__prev")
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Snapshot diff: derive the CDC changeset BETWEEN two full snapshots
    * (the inverse of [[upsert]], for sources that can only hand you
    * "the table as of today"). One full-outer equi-join on the key
    * classifies every row as insert / delete / update (null-safe value
    * compare, so a null→value transition counts as a change); unchanged
    * rows are dropped — the changeset is what ships downstream.
    *
    * Scale: a fact-fact shuffle join on the key — the one unavoidable
    * shuffle; land both snapshots bucketed on the key (Sinks.bucketed)
    * and it degrades to a zero-exchange sort-merge.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    val o = oldDf.select((keys ++ compareCols).map(col): _*)
      .withColumnsRenamed(compareCols.map(c => c -> s"old_$c").toMap)
      .withColumn("__in_old", lit(true))
    val n = newDf.select((keys ++ compareCols).map(col): _*)
      .withColumnsRenamed(compareCols.map(c => c -> s"new_$c").toMap)
      .withColumn("__in_new", lit(true))
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("__in_old").isNull, "insert")
          .when(col("__in_new").isNull, "delete")
          .when(compareCols.map(c => !(col(s"old_$c") <=> col(s"new_$c")))
            .reduce(_ || _), "update")
          .otherwise("unchanged"))
      .filter(col("change_type") =!= "unchanged")
      .select(keys.map(col) ++ (col("change_type") +:
        compareCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c")))): _*)
  }
}

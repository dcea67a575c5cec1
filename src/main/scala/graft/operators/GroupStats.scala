package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group statistics and group-level curation gates — the forms
  * that stay PARALLEL at 100 TB because every shuffle is keyed by the
  * group, unlike the deliberate single-partition exactness gates
  * (Outliers.iqrBounds, NullRepair.imputeMedianExact) whose global
  * rank question has no keyed decomposition.
  *
  * The group-mean filter is the CCNet/RefinedWeb-style domain gate:
  * curation decisions made per SOURCE (drop a domain whose average
  * quality is low) rather than per document, which catches
  * boilerplate-heavy or machine-generated domains whose individual
  * documents each look acceptable.
  */
object GroupStats {

  /** Exact discrete quartiles per group: (groups…, n, q1, median, q3),
    * quartile ranks ceil(q·n) in exact integer arithmetic over the
    * group's sorted non-null values (ANSI PERCENTILE_DISC / DuckDB
    * quantile_disc semantics — an actual data value, never
    * interpolated, so cross-engine exact for any column type).
    *
    * Scale shape: ONE shuffle keyed by the group; the rank window and
    * the group count share the same exchange+sort, groups proceed in
    * parallel, and no partition ever holds more than its group's rows.
    * This is the keyed complement of the global-rank gates — per-group
    * exact quantiles DO scale, because the sort is per-group.
    */
  def groupQuartiles(df: DataFrame, groupCols: Seq[String],
                     valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupQuartiles needs at least one group column")
    val gs = groupCols.map(col)
    val ranked = Window.partitionBy(gs: _*).orderBy(col(valueCol))
    val whole = Window.partitionBy(gs: _*)
    df.filter(col(valueCol).isNotNull)
      .select((groupCols :+ valueCol).map(col): _*)
      .withColumn("__rn", row_number().over(ranked))
      .withColumn("__n", count(lit(1)).over(whole))
      // ceil(q·n): (n+3) div 4, (n+1) div 2, (3n+3) div 4 — integers only
      .filter(col("__rn") === expr("(__n + 3) div 4") ||
        col("__rn") === expr("(__n + 1) div 2") ||
        col("__rn") === expr("(3 * __n + 3) div 4"))
      .groupBy(gs: _*)
      .agg(max(col("__n")).as("n"),
        min(when(col("__rn") === expr("(__n + 3) div 4"), col(valueCol))).as("q1"),
        min(when(col("__rn") === expr("(__n + 1) div 2"), col(valueCol))).as("median"),
        min(when(col("__rn") === expr("(3 * __n + 3) div 4"), col(valueCol))).as("q3"))
  }

  /** Per-column cardinality census: exact distinct count next to the
    * mergeable-HLL estimate and a within-`tol` flag. The approx side
    * is the 100 TB path (one pass, fixed-size sketch per column,
    * map-side combinable — no per-column distinct shuffle); the exact
    * side is the gate that keeps the sketch honest, same contract as
    * v6's recall audit. Output: (col_name, exact_nd, approx_nd,
    * within_tol) — one row per profiled column.
    */
  def cardinalityProfile(df: DataFrame, cols: Seq[String],
                         rsd: Double = 0.05, tol: Double = 0.1): DataFrame = {
    require(cols.nonEmpty, "cardinalityProfile needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      countDistinct(col(c)).as(s"__e_$c"),
      approx_count_distinct(col(c), rsd).as(s"__a_$c")))
    val pairs = cols.flatMap(c => Seq(
      lit(c), struct(col(s"__e_$c").as("e"), col(s"__a_$c").as("a"))))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(map(pairs: _*)).as(Seq("col_name", "na")))
      .select(col("col_name"),
        col("na.e").as("exact_nd"), col("na.a").as("approx_nd"),
        (abs(col("na.a") - col("na.e")).cast("double")
          <= lit(tol) * col("na.e").cast("double")).cast("int").as("within_tol"))
  }

  /** Cap each group's token contribution: keep rows, in `order` within
    * the group, while the budget lasts — a row is kept iff it STARTS
    * inside the budget (the standard per-domain token cap of an
    * LLM data-mix recipe; with quality-descending order it keeps the
    * best `budget` tokens of every domain). One keyed window cumsum,
    * groups in parallel, integer arithmetic throughout.
    */
  def tokenBudgetTrim(df: DataFrame, groupCol: String, nTokCol: String,
                      budget: Long, order: Seq[Column]): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(order.nonEmpty, "deterministic order is mandatory (tiebreak included)")
    val w = Window.partitionBy(col(groupCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(nTokCol)).over(w))
      .filter(col("__cum") - col(nTokCol) < budget)
      .drop("__cum")
  }

  /** Keep rows of groups whose mean `score` clears `minMeanMicros`
    * (mean ≥ minMeanMicros/1e6). The mean is compared in QUANTIZED
    * INTEGER form — sum(floor(score·1e6)) ≥ minMeanMicros·n — so the
    * verdict is independent of float summation order on any engine or
    * partitioning (the t-series quantized-sum discipline applied to a
    * filter). Two phases: a map-side-combined per-group aggregate
    * (tiny: one row per group), then a broadcast semi-join — the
    * corpus is never reshuffled. Group cardinality is assumed
    * domain-like (bounded); a census larger than broadcast should go
    * through the Boilerplate-style capped fallback.
    */
  def filterByGroupMean(df: DataFrame, groupCol: String, score: Column,
                        minMeanMicros: Long): DataFrame = {
    val q = floor(score * lit(1000000.0)).cast("long")
    val good = df.groupBy(col(groupCol))
      .agg(sum(q).as("__sq"), count(lit(1)).as("__n"))
      .filter(col("__sq") >= lit(minMeanMicros) * col("__n"))
      .select(col(groupCol))
    df.join(broadcast(good), Seq(groupCol), "left_semi")
  }
}

package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Curation-funnel retention census — the report every corpus pipeline
  * prints before committing a filter recipe: how many documents survive
  * each successive gate (min length → quality → language → …), as
  * counts and fractions of the raw corpus. The reference runs this
  * shape as repeated `count()` checkpoints between filter cells
  * (2022Q1-PySpark-EDA notebooks); here every stage is a conditional
  * aggregate over ONE scan, so adding a stage costs a column, not a
  * pass.
  *
  * Scale shape: a single map-side-combined aggregate (one row crosses
  * the shuffle), exploded to one output row per stage. No second scan,
  * no driver-side counting loop — at 100 TB the funnel costs exactly
  * what one `count()` costs.
  *
  * Cross-engine exactness: survivors are integer counts; the fraction
  * is one IEEE double division on identical operands.
  */
object Retention {

  /** One row per stage: (stage_id, stage, survivors, retained_frac),
    * where stage i counts rows satisfying the CONJUNCTION of stages
    * 1..i (the funnel semantics — order matters and is the caller's
    * recipe order). Stage 0 is the raw total.
    */
  def funnel(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val cumulative = stages.scanLeft(lit(true)) {
      case (acc, (_, p)) => acc && p
    }.tail
    val aggs = count(lit(1)).as("__s0") +: cumulative.zipWithIndex.map {
      case (p, i) => sum(when(p, 1L).otherwise(0L)).as(s"__s${i + 1}")
    }
    val pairs = (0, "total") +: stages.zipWithIndex.map {
      case ((name, _), i) => (i + 1, name)
    }
    val entries = pairs.flatMap { case (id, name) =>
      Seq(lit(id), struct(lit(name).as("stage"),
        col(s"__s$id").as("survivors")))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("__s0").as("__total"),
        explode(map(entries: _*)).as(Seq("stage_id", "sv")))
      .select(col("stage_id").cast("int").as("stage_id"),
        col("sv.stage").as("stage"),
        col("sv.survivors").as("survivors"),
        (col("sv.survivors").cast("double") / col("__total").cast("double"))
          .as("retained_frac"))
  }
}

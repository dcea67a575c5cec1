package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality verification (Deequ-style): a set of
  * constraints over a table is verified in ONE aggregation pass — the
  * pre-ingest contract check of a production pipeline, where "run k
  * count() jobs for k checks" is the anti-pattern ([[
  * graft.pipeline.Runner.runObserved]] is the in-flight sibling; this
  * is the standalone audit).
  *
  * Every metric is an integer pair (numerator, denominator) and every
  * verdict an integer comparison — ratio thresholds are compared by
  * cross-multiplication against a micros-scaled threshold, so the
  * pass/fail verdict is independent of float summation order and
  * engine (the [[Exact]] discipline applied to booleans). The reported
  * `ratio` is a single two-long division rounded at 6dp, display-only.
  *
  * Scale shape: one wide `agg` over the scan — conditional counts are
  * map-side partial, nothing shuffles but one row of longs per
  * constraint set. [[Unique]] uses `count(distinct)`: k distinct
  * constraints expand the scan k-fold (Catalyst Expand), exact and
  * fine for audit cadence; at unbounded cardinality × many columns,
  * swap `sketch = true` for `approx_count_distinct` (fixed-size HLL
  * partials, the a20 trade) and treat near-1 uniqueness as advisory.
  * Result assembly is in-plan (struct array + inline), no collect.
  */
object Expectations {

  private val RatioScale = 1000000L

  /** One verifiable constraint; `minRatio` thresholds are inclusive. */
  sealed trait Constraint { def name: String; def col: String }
  /** fraction of non-null values ≥ minRatio */
  case class Complete(col: String, minRatio: Double) extends Constraint {
    val name = s"complete($col)" }
  /** distinct / non-null count = 1 exactly */
  case class Unique(col: String) extends Constraint {
    val name = s"unique($col)" }
  /** all non-null values in [lo, hi] */
  case class Bounds(col: String, lo: Double, hi: Double) extends Constraint {
    val name = s"bounds($col)" }
  /** fraction of non-null values rlike pattern ≥ minRatio */
  case class Matches(col: String, pattern: String, minRatio: Double)
    extends Constraint { val name = s"matches($col)" }
  /** fraction of non-null values in the set ≥ minRatio */
  case class InSet(col: String, values: Seq[String], minRatio: Double)
    extends Constraint { val name = s"in_set($col)" }

  private def micros(r: Double): Long = math.round(r * RatioScale)

  /** num/den/threshold triple for one constraint (den = the constraint's
    * population; pass ⇔ num·SCALE ≥ thr·den, all long arithmetic).
    */
  private def metric(c: Constraint): (Column, Column, Long) = c match {
    case Complete(col0, r) =>
      (count(col(col0)), count(lit(1)), micros(r))
    case Unique(col0) =>
      (count_distinct(col(col0)), count(col(col0)), RatioScale)
    case Bounds(col0, lo, hi) =>
      (count(when(col(col0) >= lo && col(col0) <= hi, 1)),
        count(col(col0)), RatioScale)
    case Matches(col0, p, r) =>
      (count(when(col(col0).rlike(p), 1)), count(col(col0)), micros(r))
    case InSet(col0, vs, r) =>
      (count(when(col(col0).isin(vs: _*), 1)), count(col(col0)), micros(r))
  }

  /** The one-row aggregate stage of [[verify]]: one struct column per
    * constraint. Split out because it is also STREAMING-compatible —
    * conditional counts are incrementally aggregatable, so the same
    * constraint set runs over an unbounded stream in Complete mode
    * (the `inline` explode is a generator, which streaming
    * aggregation output can't host — apply [[explodeMetrics]] to the
    * collected sink instead).
    */
  def metricsRow(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "no constraints")
    require(constraints.map(_.name).distinct.size == constraints.size,
      "duplicate constraint names")
    val structs = constraints.map { c =>
      val (num, den, thr) = metric(c)
      struct(
        lit(c.name).as("check_name"),
        num.cast("long").as("n_ok"),
        den.cast("long").as("n_total"),
        // ANSI mode: 0/0 raises, so the empty-population ratio must be
        // guarded to null explicitly
        when(den.cast("long") =!= 0L,
          round(num.cast("double") / den.cast("double"), 6)).as("ratio"),
        when(num.cast("long") * RatioScale >= lit(thr) * den.cast("long"), 1)
          .otherwise(0).cast("int").as("passed"))
    }
    df.agg(structs.head.as("c0"),
      structs.tail.zipWithIndex.map { case (s, i) => s.as(s"c${i + 1}") }: _*)
  }

  /** Unpack a [[metricsRow]] result into one row per constraint. */
  def explodeMetrics(row: DataFrame, nConstraints: Int): DataFrame =
    row.select(inline(array((0 until nConstraints).map(i => col(s"c$i")): _*)))

  /** Verify all constraints in one pass.
    * @return one row per constraint: (check_name, n_ok, n_total,
    *         ratio 6dp, passed 0/1), in the given constraint order
    */
  def verify(df: DataFrame, constraints: Seq[Constraint]): DataFrame =
    explodeMetrics(metricsRow(df, constraints), constraints.size)
}

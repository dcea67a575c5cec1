package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two snapshots of a numeric
  * column — the PSI (population stability index) monitor every
  * production data pipeline runs between yesterday's corpus and
  * today's: PSI = Σ_b (p_b − q_b)·ln(p_b/q_b) over a fixed bucketing,
  * with q from the baseline snapshot and p from the current one.
  * Rule-of-thumb thresholds: <0.1 stable, 0.1–0.25 drifting, >0.25
  * shifted.
  *
  * Cross-engine exactness stacks three established disciplines:
  * buckets use h1's explicit single-division formula over
  * baseline min/max (broadcast 1-row bounds, identical IEEE ops);
  * proportions are additively smoothed exact rationals
  * (cnt+0.5)/(total+0.5·n) so empty buckets need no ε hack and every
  * double is identical on both engines; each ln is quantized once —
  * floor(ln(r)·1e6 + 1e-4)/1e6, t9's nudged-floor discipline — and
  * the final sum is an index-ordered fold in bucket order (ts2's
  * discipline), never an unordered float aggregation.
  *
  * Scale shape: two groupBy-bucket partial aggs (one per snapshot,
  * shuffle carries ≤ nBuckets rows after map-side combine), bounds
  * and totals broadcast — no sort, no window over data, no collect.
  */
object Drift {

  private val LnScale = 1e6

  /** t9's quantized ln: identical on both engines despite libm drift. */
  private def lnQ(r: Column): Column =
    floor(log(r) * lit(LnScale) + lit(1e-4)) / lit(LnScale)

  /** Per-bucket drift profile: (bucket, base_n, cur_n, p, q, term) for
    * every bucket 0..nBuckets-1 (empty buckets included — smoothing
    * keeps their term finite and exact). `term` sums to PSI.
    */
  def psiProfile(base: DataFrame, cur: DataFrame, c: String,
                 nBuckets: Int): DataFrame = {
    require(nBuckets > 1, s"nBuckets must be > 1, got $nBuckets")
    val spark = base.sparkSession
    val bounds = base.filter(col(c).isNotNull)
      .agg(min(col(c)).cast("double").as("__lo"),
        max(col(c)).cast("double").as("__hi"))

    def bucketed(df: DataFrame, cnt: String): DataFrame =
      df.filter(col(c).isNotNull).crossJoin(broadcast(bounds))
        .select(
          when(col("__hi") === col("__lo"), lit(0L))
            .otherwise(least(greatest(
              floor((col(c).cast("double") - col("__lo")) /
                ((col("__hi") - col("__lo")) / lit(nBuckets))).cast("long"),
              lit(0L)), lit(nBuckets - 1L))).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as(cnt))

    val spine = spark.range(nBuckets).select(col("id").as("bucket"))
    val joined = spine
      .join(bucketed(base, "base_n"), Seq("bucket"), "left")
      .join(bucketed(cur, "cur_n"), Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("base_n"), lit(0L)).as("base_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    val totals = joined.agg(
      sum(col("base_n")).as("__bt"), sum(col("cur_n")).as("__ct"))
    joined.crossJoin(broadcast(totals))
      .select(col("bucket"), col("base_n"), col("cur_n"),
        ((col("cur_n").cast("double") + lit(0.5)) /
          (col("__ct").cast("double") + lit(0.5) * nBuckets)).as("p"),
        ((col("base_n").cast("double") + lit(0.5)) /
          (col("__bt").cast("double") + lit(0.5) * nBuckets)).as("q"))
      .withColumn("term", (col("p") - col("q")) * lnQ(col("p") / col("q")))
  }

  /** The scalar PSI: profile terms summed in bucket order (index-
    * ordered fold — an unordered double sum would be merge-order-
    * dependent and never cross-engine exact).
    */
  def psi(base: DataFrame, cur: DataFrame, c: String,
          nBuckets: Int): DataFrame =
    psiProfile(base, cur, c, nBuckets)
      .agg(aggregate(
        sort_array(collect_list(struct(col("bucket"), col("term")))),
        lit(0.0), (acc, s) => acc + s("term")).as("psi"))

  /** DuckDB spelling over two snapshot CTE names `base`/`cur`, each
    * exposing the value as column x.
    */
  def profileSql(nBuckets: Int): String =
    s"""(WITH b AS (SELECT CAST(MIN(x) AS DOUBLE) AS lo, CAST(MAX(x) AS DOUBLE) AS hi
       |            FROM base WHERE x IS NOT NULL),
       | bb AS (SELECT CASE WHEN hi = lo THEN 0
       |          ELSE LEAST(GREATEST(CAST(FLOOR((CAST(x AS DOUBLE) - lo)
       |            / ((hi - lo) / $nBuckets)) AS BIGINT), 0), ${nBuckets - 1})
       |          END AS bucket
       |        FROM base, b WHERE x IS NOT NULL),
       | cb AS (SELECT CASE WHEN hi = lo THEN 0
       |          ELSE LEAST(GREATEST(CAST(FLOOR((CAST(x AS DOUBLE) - lo)
       |            / ((hi - lo) / $nBuckets)) AS BIGINT), 0), ${nBuckets - 1})
       |          END AS bucket
       |        FROM cur, b WHERE x IS NOT NULL),
       | bc AS (SELECT bucket, COUNT(*) AS n FROM bb GROUP BY bucket),
       | cc AS (SELECT bucket, COUNT(*) AS n FROM cb GROUP BY bucket),
       | j AS (SELECT s.bucket, COALESCE(bc.n, 0) AS base_n, COALESCE(cc.n, 0) AS cur_n
       |       FROM (SELECT unnest(range(0, $nBuckets)) AS bucket) s
       |       LEFT JOIN bc USING (bucket) LEFT JOIN cc USING (bucket)),
       | t AS (SELECT bucket, base_n, cur_n,
       |         (CAST(cur_n AS DOUBLE) + 0.5)
       |           / ((SELECT CAST(SUM(cur_n) AS DOUBLE) FROM j) + 0.5 * $nBuckets) AS p,
       |         (CAST(base_n AS DOUBLE) + 0.5)
       |           / ((SELECT CAST(SUM(base_n) AS DOUBLE) FROM j) + 0.5 * $nBuckets) AS q
       |       FROM j)
       | SELECT bucket, base_n, cur_n, p, q,
       |   (p - q) * (FLOOR(ln(p / q) * 1000000 + 0.0001) / 1000000) AS term
       | FROM t)""".stripMargin
}

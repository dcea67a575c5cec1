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

  /** Streaming PSI against a FROZEN baseline — the monitoring face of
    * [[psi]]: yesterday's snapshot fixes the bucketing and the q
    * proportions, today's data streams in, and every micro-batch
    * refreshes one PSI row (Complete mode).
    *
    * Why this shape: a second aggregation over a streaming aggregate
    * is unsupported, so the whole computation must be ONE streaming
    * agg + projections. The baseline therefore collapses to plan
    * literals driver-side (bounds + nBuckets smoothed q values —
    * a BOUNDED collect, ≤ nBuckets+2 scalars, the capped-pivot
    * idiom), the stream pays a single agg of nBuckets conditional
    * counts in one row (Expectations' metricsRow shape — state is one
    * row of longs), and PSI assembles as an index-ordered literal
    * fold ON that row. Arithmetic is bit-identical to [[psiProfile]]:
    * same bucket expression, same smoothed rationals, same quantized
    * ln, same bucket-ordered summation — so the converged stream
    * equals batch [[psi]] exactly, which is how the e15 gate oracles
    * it.
    */
  def psiStream(cur: DataFrame, c: String, base: DataFrame, baseCol: String,
                nBuckets: Int): DataFrame = {
    require(nBuckets > 1, s"nBuckets must be > 1, got $nBuckets")
    val b = base.filter(col(baseCol).isNotNull)
      .agg(min(col(baseCol)).cast("double"), max(col(baseCol)).cast("double"))
      .head()
    // an empty / all-null baseline has no bounds to bucket against —
    // fail with the actual problem, not getDouble's opaque NPE
    // (psiProfile handles this shape per-row via when(); here the
    // bounds must exist driver-side before the stream starts)
    require(!b.isNullAt(0),
      s"psiStream baseline column '$baseCol' has no non-null rows — " +
        "cannot derive bucket bounds")
    val (lo, hi) = (b.getDouble(0), b.getDouble(1))
    def bucketOf(v: Column): Column =
      if (hi == lo) lit(0L)
      else least(greatest(
        floor((v.cast("double") - lit(lo)) /
          ((lit(hi) - lit(lo)) / lit(nBuckets))).cast("long"),
        lit(0L)), lit(nBuckets - 1L))
    val baseCounts = {
      val m = base.filter(col(baseCol).isNotNull)
        .groupBy(bucketOf(col(baseCol)).as("bucket"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      Array.tabulate(nBuckets)(i => m.getOrElse(i.toLong, 0L))
    }
    val bt = baseCounts.sum
    val q = baseCounts.map(n => (n + 0.5) / (bt.toDouble + 0.5 * nBuckets))
    val counts = cur.filter(col(c).isNotNull)
      .select(bucketOf(col(c)).as("bucket"))
      .agg(
        sum(when(col("bucket") === 0L, 1L).otherwise(0L)).as("n_0"),
        (1 until nBuckets).map(i =>
          sum(when(col("bucket") === i.toLong, 1L).otherwise(0L))
            .as(s"n_$i")): _*)
    val ct = (0 until nBuckets).map(i => col(s"n_$i")).reduceLeft(_ + _)
    counts.withColumn("__ct", ct.cast("double"))
      .select((0 until nBuckets).map { i =>
        val p = (col(s"n_$i").cast("double") + lit(0.5)) /
          (col("__ct") + lit(0.5 * nBuckets))
        (p - lit(q(i))) * lnQ(p / lit(q(i)))
      }.reduceLeft(_ + _).as("psi"))
  }

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
object DriftKs {
  import org.apache.spark.sql.{DataFrame}
  import org.apache.spark.sql.functions._

  /** Two-sample Kolmogorov–Smirnov distance between a baseline and a
    * current numeric snapshot — the nonparametric companion of the
    * [[Drift]] PSI monitor (PSI needs a bucketing choice; KS is the
    * sup-norm of the empirical CDFs and has none). D = max over
    * observed values v of |F_base(v) − F_cur(v)|, computed ENTIRELY in
    * integers: at each value the numerator is
    * |cum_base·n_cur − cum_cur·n_base| (exact longs); the single
    * double division happens once, on the max. Cross-engine exact.
    *
    * Scale shape: distinct values collapse FIRST (one
    * partial-combining agg), so the cumulative window runs over the
    * VALUE CARDINALITY, not the row count — the ol1/h2 exactness-gate
    * contract (deliberate single-partition sort over distinct values;
    * at unbounded cardinality the scale path is the binned dd1 PSI
    * with its bounded bucket table). Totals ride as a broadcast 1-row
    * join (the scalar-subquery idiom), never a collect.
    */
  def ksStatistic(base: DataFrame, cur: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tagged = base.select(col(valueCol).cast("double").as("v"),
        lit(1L).as("a"), lit(0L).as("b"))
      .union(cur.select(col(valueCol).cast("double").as("v"),
        lit(0L).as("a"), lit(1L).as("b")))
      .filter(col("v").isNotNull)
    val perValue = tagged.groupBy(col("v"))
      .agg(sum(col("a")).as("ca"), sum(col("b")).as("cb"))
    val totals = perValue.agg(sum(col("ca")).as("n_base"),
      sum(col("cb")).as("n_cur"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perValue
      .withColumn("cum_a", sum(col("ca")).over(w))
      .withColumn("cum_b", sum(col("cb")).over(w))
      .crossJoin(broadcast(totals))
      .select(col("n_base"), col("n_cur"),
        abs(col("cum_a") * col("n_cur") - col("cum_b") * col("n_base"))
          .as("num"))
      .groupBy(col("n_base"), col("n_cur"))
      .agg(max(col("num")).as("max_num"))
      .select(col("n_base"), col("n_cur"), col("max_num"),
        round(col("max_num").cast("double") /
          (col("n_base").cast("double") * col("n_cur").cast("double")), 6)
          .as("ks_d"))
  }

  /** DuckDB spelling — identical integer sup-norm. */
  def sql(baseRel: String, curRel: String, v: String): String =
    s"""(WITH tagged AS (
       |    SELECT CAST($v AS DOUBLE) AS v, 1 AS a, 0 AS b FROM $baseRel
       |    UNION ALL
       |    SELECT CAST($v AS DOUBLE) AS v, 0 AS a, 1 AS b FROM $curRel),
       |  pv AS (SELECT v, SUM(a) AS ca, SUM(b) AS cb FROM tagged
       |    WHERE v IS NOT NULL GROUP BY v),
       |  tot AS (SELECT SUM(ca) AS n_base, SUM(cb) AS n_cur FROM pv),
       |  cum AS (SELECT v,
       |      SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
       |      SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b
       |    FROM pv)
       |  SELECT CAST(t.n_base AS BIGINT) AS n_base, CAST(t.n_cur AS BIGINT) AS n_cur,
       |    CAST(MAX(ABS(cum_a * t.n_cur - cum_b * t.n_base)) AS BIGINT) AS max_num,
       |    round(CAST(MAX(ABS(cum_a * t.n_cur - cum_b * t.n_base)) AS DOUBLE)
       |      / (CAST(t.n_base AS DOUBLE) * CAST(t.n_cur AS DOUBLE)), 6) AS ks_d
       |  FROM cum, tot t GROUP BY t.n_base, t.n_cur)""".stripMargin
}

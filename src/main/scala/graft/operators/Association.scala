package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Categorical-association profiling: mutual information and
  * chi-square / Cramér's V between two categorical columns — the
  * feature-relevance / redundancy audit of dataset curation ("does
  * `source` carry any information about `lang`, or can the mix recipe
  * treat them independently?"). The reference's EDA stops at
  * per-column censuses; association is the natural pairwise step.
  *
  * Exactness discipline: counts are integers; each cell's
  * transcendental term (ln for MI) is quantized ONCE —
  * floor(ln(·)·1e6 + 1e-4) as int64, the t9 contract — and summed
  * exactly, so the verdict is independent of cell summation order and
  * engine libm ulp. The chi-square cell is a ratio of integers
  * ((N·n_xy − n_x·n_y)² / (N·n_x·n_y)) — one fixed-shape double
  * expression per cell, quantized the same way. Final assembly (÷N,
  * sqrt for V) is a fixed sequence of IEEE ops spelled identically in
  * the oracle.
  *
  * Scale shape: one (x,y)-keyed aggregation over the scan (map-side
  * partial), two margin aggregations BOUNDED by the category
  * cardinalities, margins broadcast back onto the joint table, one
  * ≤|X|·|Y|-row final fold. Nothing driver-side; no window; the wide
  * table never reshuffles.
  */
object Association {

  private val Scale = 1e6

  /** One row: (n, x_cats, y_cats, mi, chi2, cramers_v) for the
    * listwise-complete (x, y) pairs.
    */
  def categoricalAssociation(df: DataFrame, xCol: String,
                             yCol: String): DataFrame = {
    val base = df.select(col(xCol).as("__x"), col(yCol).as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    val joint = base.groupBy(col("__x"), col("__y"))
      .agg(count(lit(1)).as("n_xy"))
    val mx = base.groupBy(col("__x")).agg(count(lit(1)).as("n_x"))
    val my = base.groupBy(col("__y")).agg(count(lit(1)).as("n_y"))
    val tot = base.agg(count(lit(1)).as("n"),
      count_distinct(col("__x")).as("x_cats"),
      count_distinct(col("__y")).as("y_cats"))
    // the FULL |X|·|Y| grid, not just observed pairs: unobserved cells
    // contribute 0 to MI (0·ln 0 → 0 by convention) but their expected
    // counts DO enter chi² — dropping them understates association
    // (a perfectly-dependent diagonal would read V ≈ 0.82, not 1).
    // Grid and margins are bounded by category cardinalities.
    val cells = broadcast(mx).crossJoin(broadcast(my))
      .join(joint, Seq("__x", "__y"), "left")
      .withColumn("n_xy", coalesce(col("n_xy"), lit(0L)))
      .crossJoin(broadcast(tot))
      // MI cell: n_xy · q(ln(N·n_xy / (n_x·n_y)))
      .withColumn("__mi_q", when(col("n_xy") > 0, col("n_xy") *
        floor(log((col("n_xy").cast("double") * col("n").cast("double")) /
            (col("n_x").cast("double") * col("n_y").cast("double"))) * lit(Scale)
          + lit(1e-4)).cast("long")).otherwise(lit(0L)))
      // chi² cell: (N·n_xy − n_x·n_y)² / (N·n_x·n_y), exact-integer
      // numerator root, one double division
      .withColumn("__d",
        (col("n").cast("long") * col("n_xy") - col("n_x") * col("n_y"))
          .cast("double"))
      .withColumn("__chi_q",
        floor(col("__d") * col("__d") /
            (col("n").cast("double") * col("n_x").cast("double") *
              col("n_y").cast("double")) * lit(Scale) + lit(1e-4))
          .cast("long"))
    cells
      .groupBy(col("n"), col("x_cats"), col("y_cats"))
      .agg(sum(col("__mi_q")).as("__mi_sum"),
        sum(col("__chi_q")).as("__chi_sum"))
      .select(col("n"), col("x_cats").cast("int").as("x_cats"),
        col("y_cats").cast("int").as("y_cats"),
        // nats; ÷scale then ÷N, fixed order
        round(col("__mi_sum").cast("double") / lit(Scale) /
          col("n").cast("double"), 6).as("mi"),
        round(col("__chi_sum").cast("double") / lit(Scale), 6).as("chi2"),
        round(sqrt((col("__chi_sum").cast("double") / lit(Scale)) /
          (col("n").cast("double") *
            (least(col("x_cats"), col("y_cats")) - lit(1)).cast("double"))), 6)
          .as("cramers_v"))
  }

  /** Correlation ratio η² (ANOVA R²) between a CATEGORICAL column and
    * a NUMERIC one — the missing cell of the association matrix (mi1
    * covers cat×cat, a14/a18 cover num×num): how much of the numeric
    * variance the grouping explains. η² = SS_between / SS_total.
    *
    * Exactness: per-group count and sum are exact longs; the one
    * rational term per group (S_g²/n_g) is computed in doubles that
    * stay EXACT only while S_g² sits under 2^53 (|S_g| ≤ 94 906 265).
    * Inside the bound the term is quantized to int64 (×1e3, nudged
    * floor — the t9 contract) and summed exactly, so the verdict is
    * independent of group summation order; final assembly is one fixed
    * IEEE expression. BEYOND the bound the result is still
    * cross-engine DETERMINISTIC (both engines evaluate the identical
    * IEEE expression tree) but no longer exact-rational — the output
    * `exact` flag reports which regime the input landed in, computed
    * from max(|S_g|) in the same pass.
    *
    * Scale: one group-keyed partial agg (bounded by category count) +
    * one global fold of the per-group longs. Nothing else moves.
    */
  def etaSquared(df: DataFrame, catCol: String, numCol: String): DataFrame = {
    val base = df.select(col(catCol).as("__g"),
        col(numCol).cast("long").as("__x"))
      .filter(col("__g").isNotNull && col("__x").isNotNull)
    val per = base.groupBy(col("__g"))
      .agg(count(lit(1)).as("n_g"), sum(col("__x")).as("s_g"),
        sum(col("__x") * col("__x")).as("ss_g"))
      .select(col("n_g"), col("s_g"), col("ss_g"),
        floor(col("s_g").cast("double") * col("s_g").cast("double") /
          col("n_g").cast("double") * lit(1000.0) + lit(1e-4))
          .cast("long").as("q_g"))
    per.agg(sum(col("n_g")).as("n"), sum(col("s_g")).as("s"),
        sum(col("ss_g")).as("ssq"), sum(col("q_g")).as("qsum"),
        count(lit(1)).as("n_groups"), max(abs(col("s_g"))).as("__smax"))
      .select(col("n"), col("n_groups").cast("int").as("n_groups"),
        // the exact-rational regime's bound: S_g^2 < 2^53 <=>
        // |S_g| <= floor(sqrt(2^53)) = 94906265
        (col("__smax") <= lit(94906265L)).as("exact"),
        // all-constant input has SS_total = 0: eta undefined -> null
        // (ANSI raises on the 0-divisor double division otherwise)
        when(col("n").cast("double") * col("ssq").cast("double")
            - col("s").cast("double") * col("s").cast("double") =!= 0.0,
          round(
            (col("n").cast("double") * (col("qsum").cast("double") / lit(1000.0))
              - col("s").cast("double") * col("s").cast("double")) /
            (col("n").cast("double") * col("ssq").cast("double")
              - col("s").cast("double") * col("s").cast("double")), 6))
          .as("eta_sq"))
  }

  /** DuckDB spelling of [[etaSquared]] — identical arithmetic. */
  def etaSquaredSql(src: String, catCol: String, numCol: String): String =
    s"""(WITH base AS (SELECT $catCol AS g, CAST($numCol AS BIGINT) AS x
       |    FROM $src WHERE $catCol IS NOT NULL AND $numCol IS NOT NULL),
       |  per AS (SELECT g, COUNT(*) AS n_g, SUM(x) AS s_g,
       |      SUM(x * x) AS ss_g FROM base GROUP BY g),
       |  perq AS (SELECT n_g, s_g, ss_g,
       |      CAST(FLOOR(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
       |        / CAST(n_g AS DOUBLE) * 1000.0 + 0.0001) AS BIGINT) AS q_g
       |    FROM per)
       |  SELECT CAST(SUM(n_g) AS BIGINT) AS n, CAST(COUNT(*) AS INTEGER) AS n_groups,
       |    MAX(ABS(s_g)) <= 94906265 AS exact,
       |    CASE WHEN CAST(SUM(n_g) AS DOUBLE) * CAST(SUM(ss_g) AS DOUBLE)
       |              - CAST(SUM(s_g) AS DOUBLE) * CAST(SUM(s_g) AS DOUBLE) <> 0.0
       |    THEN round(
       |      (CAST(SUM(n_g) AS DOUBLE) * (CAST(SUM(q_g) AS DOUBLE) / 1000.0)
       |        - CAST(SUM(s_g) AS DOUBLE) * CAST(SUM(s_g) AS DOUBLE)) /
       |      (CAST(SUM(n_g) AS DOUBLE) * CAST(SUM(ss_g) AS DOUBLE)
       |        - CAST(SUM(s_g) AS DOUBLE) * CAST(SUM(s_g) AS DOUBLE)), 6)
       |    END AS eta_sq
       |  FROM perq)""".stripMargin

  /** DuckDB spelling — same quantization, same assembly. */
  def sql(src: String, xCol: String, yCol: String): String =
    s"""(WITH base AS (SELECT $xCol AS x, $yCol AS y FROM $src
       |    WHERE $xCol IS NOT NULL AND $yCol IS NOT NULL),
       |  joint AS (SELECT x, y, COUNT(*) AS n_xy FROM base GROUP BY x, y),
       |  mx AS (SELECT x, COUNT(*) AS n_x FROM base GROUP BY x),
       |  my AS (SELECT y, COUNT(*) AS n_y FROM base GROUP BY y),
       |  tot AS (SELECT COUNT(*) AS n, COUNT(DISTINCT x) AS x_cats,
       |      COUNT(DISTINCT y) AS y_cats FROM base),
       |  grid AS (SELECT mx.x, mx.n_x, my.y, my.n_y FROM mx CROSS JOIN my),
       |  cells AS (
       |    SELECT t.n, t.x_cats, t.y_cats,
       |      CASE WHEN COALESCE(j.n_xy, 0) > 0 THEN
       |        j.n_xy * CAST(FLOOR(ln((CAST(j.n_xy AS DOUBLE) * CAST(t.n AS DOUBLE))
       |            / (CAST(g.n_x AS DOUBLE) * CAST(g.n_y AS DOUBLE))) * 1000000.0
       |          + 0.0001) AS BIGINT)
       |      ELSE 0 END AS mi_q,
       |      CAST(FLOOR(
       |        CAST(t.n * COALESCE(j.n_xy, 0) - g.n_x * g.n_y AS DOUBLE)
       |        * CAST(t.n * COALESCE(j.n_xy, 0) - g.n_x * g.n_y AS DOUBLE)
       |        / (CAST(t.n AS DOUBLE) * CAST(g.n_x AS DOUBLE) * CAST(g.n_y AS DOUBLE))
       |        * 1000000.0 + 0.0001) AS BIGINT) AS chi_q
       |    FROM grid g LEFT JOIN joint j USING (x, y) CROSS JOIN tot t)
       |  SELECT n, CAST(x_cats AS INTEGER) AS x_cats,
       |    CAST(y_cats AS INTEGER) AS y_cats,
       |    round(CAST(SUM(mi_q) AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE), 6) AS mi,
       |    round(CAST(SUM(chi_q) AS DOUBLE) / 1000000.0, 6) AS chi2,
       |    round(sqrt((CAST(SUM(chi_q) AS DOUBLE) / 1000000.0)
       |      / (CAST(n AS DOUBLE) * CAST(LEAST(x_cats, y_cats) - 1 AS DOUBLE))), 6)
       |      AS cramers_v
       |  FROM cells GROUP BY n, x_cats, y_cats)""".stripMargin
}

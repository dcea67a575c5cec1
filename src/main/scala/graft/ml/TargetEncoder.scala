package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Smoothed target (mean) encoding — the high-cardinality-categorical
  * feature transform one-hot cannot serve (a million-value domain
  * column would explode the feature space; its target mean is ONE
  * number): enc(g) = (Σ_g y + m·μ) / (n_g + m), shrinking rare
  * categories toward the global mean μ so they don't memorize noise.
  *
  * Exactness: per-group sums are decimal-routed ([[
  * graft.operators.Exact]]); μ is one double division of
  * decimal-exact totals; the final blend is a fixed IEEE expression
  * spelled identically in the oracle — rounded 6dp like every float
  * rank surface.
  *
  * Scale shape: one group-keyed partial agg (bounded by category
  * cardinality) + a broadcast 1-row global-stats join (the scalar-
  * subquery idiom); applying the encoding back to the corpus is a
  * broadcast join on the category when the table fits, the standard
  * dimension-join shuffle when it doesn't. Fit/transform separation
  * means the encoding TABLE is the model artifact — persist it, apply
  * it to any later snapshot (no leakage re-fit).
  */
object TargetEncoder {

  /** The encoding table: (category, n_g, enc). */
  def fit(df: DataFrame, catCol: String, targetCol: String,
          smoothing: Double = 10.0): DataFrame = {
    import graft.operators.Exact.dec
    val base = df.select(col(catCol).as("__g"), col(targetCol).as("__y"))
      .filter(col("__g").isNotNull && col("__y").isNotNull)
    val per = base.groupBy(col("__g"))
      .agg(count(lit(1)).as("n_g"), sum(dec(col("__y"))).as("s_g"))
    val tot = per.agg(sum(col("n_g")).as("__n"), sum(col("s_g")).as("__s"))
    per.crossJoin(broadcast(tot))
      .select(col("__g").as(catCol), col("n_g"),
        round(
          (col("s_g").cast("double") +
            lit(smoothing) * (col("__s").cast("double") / col("__n").cast("double"))) /
          (col("n_g").cast("double") + lit(smoothing)), 6).as("enc"))
  }

  /** Encoded corpus: the fitted table joined back (unseen categories
    * fall back to null — impute with the global mean downstream).
    */
  def transform(df: DataFrame, encTable: DataFrame, catCol: String): DataFrame =
    df.join(broadcast(encTable.select(col(catCol), col("enc"))),
      Seq(catCol), "left")

  /** DuckDB spelling of [[fit]] — identical blend. */
  def fitSql(src: String, catCol: String, targetCol: String,
             smoothing: Double = 10.0): String =
    s"""(WITH base AS (SELECT $catCol AS g, $targetCol AS y FROM $src
       |    WHERE $catCol IS NOT NULL AND $targetCol IS NOT NULL),
       |  per AS (SELECT g, COUNT(*) AS n_g,
       |      SUM(CAST(y AS DECIMAL(18,2))) AS s_g FROM base GROUP BY g),
       |  tot AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n,
       |      CAST(SUM(s_g) AS DOUBLE) AS s FROM per)
       |  SELECT g AS $catCol, CAST(n_g AS BIGINT) AS n_g,
       |    round((CAST(s_g AS DOUBLE)
       |        + $smoothing * (t.s / CAST(t.n AS DOUBLE)))
       |      / (CAST(n_g AS DOUBLE) + $smoothing), 6) AS enc
       |  FROM per, tot t)""".stripMargin
}

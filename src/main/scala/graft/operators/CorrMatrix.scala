package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** All-pairs Pearson correlation matrix in ONE aggregation pass — the
  * EDA "corr heatmap" feed. For k columns the single wide aggregate
  * computes n, k linear sums, and k·(k+1)/2 product sums (decimal-
  * routed, a14's discipline: the built-in corr is an order-dependent
  * streaming merge and never cross-engine exact), then every pairwise
  * correlation is assembled from the SAME IEEE double ops on both
  * engines. One scan, one 1-row shuffle, regardless of k — versus the
  * k²/2 separate corr() jobs the naive loop would run.
  *
  * Listwise-complete semantics: rows with a null in ANY of `cols` are
  * dropped first (the unambiguous cross-engine spelling; pairwise-
  * complete would make each cell's n differ).
  */
object CorrMatrix {

  private val SumScale = DecimalType(18, 2)
  private val ProdScale = DecimalType(30, 4)

  /** (col_x, col_y, corr) for every unordered pair col_x < col_y (in
    * `cols` order), from one aggregation pass.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need at least 2 columns, got $cols")
    require(cols.distinct == cols, s"duplicate columns in $cols")
    // explicit IS NOT NULL conjunctions, NOT na.drop: na.drop also
    // discards NaN rows, which the oracle's listwise `IS NOT NULL`
    // filter would keep — the two engines must aggregate the same rows
    // even on NaN-bearing columns
    val complete = df
      .filter(cols.map(col(_).isNotNull).reduce(_ && _))
      .select(cols.map(col): _*)
    val dec: Map[String, Column] =
      cols.map(c => c -> col(c).cast(SumScale)).toMap
    val sums: Seq[Column] =
      (count(lit(1)).cast("double").as("__n") +:
        cols.map(c => sum(dec(c)).cast("double").as(s"__s_$c"))) ++
        (for { i <- cols.indices; j <- i until cols.size } yield {
          val (a, b) = (cols(i), cols(j))
          sum((dec(a) * dec(b)).cast(ProdScale)).cast("double")
            .as(s"__p_${a}__$b")
        })
    val aggd = complete.agg(sums.head, sums.tail: _*)
    def centered(a: String, b: String): Column =
      col(s"__p_${a}__$b") - col(s"__s_$a") * col(s"__s_$b") / col("__n")
    val cells = for { i <- cols.indices; j <- i + 1 until cols.size } yield {
      val (a, b) = (cols(i), cols(j))
      // the component sums are decimal-exact; only this final double
      // assembly (divide + sqrt) can diverge cross-engine by an ulp —
      // observed at sf0.1 — so round to 12 dp (both spellings)
      struct(lit(a).as("col_x"), lit(b).as("col_y"),
        round(centered(a, b) / (sqrt(centered(a, a)) * sqrt(centered(b, b))),
          12).as("corr"))
    }
    aggd.select(explode(array(cells: _*)).as("__pr")).select(col("__pr.*"))
  }

  /** DuckDB spelling of the same matrix over `src` (same component
    * sums, same assembly, same listwise-complete filter).
    */
  def corrSql(src: String, cols: Seq[String]): String = {
    val notNull = cols.map(c => s"$c IS NOT NULL").mkString(" AND ")
    def d(c: String) = s"CAST($c AS DECIMAL(18,2))"
    val comps =
      s"CAST(COUNT(*) AS DOUBLE) AS n" +:
        cols.map(c => s"CAST(SUM(${d(c)}) AS DOUBLE) AS s_$c") ++:
        (for { i <- cols.indices; j <- i until cols.size } yield {
          val (a, b) = (cols(i), cols(j))
          s"CAST(SUM(CAST(${d(a)} * ${d(b)} AS DECIMAL(30,4))) AS DOUBLE) AS p_${a}__$b"
        })
    def centered(a: String, b: String) = s"(p_${a}__$b - s_$a * s_$b / n)"
    val cells = for { i <- cols.indices; j <- i + 1 until cols.size } yield {
      val (a, b) = (cols(i), cols(j))
      s"""SELECT '$a' AS col_x, '$b' AS col_y,
         |  round(${centered(a, b)} / (sqrt(${centered(a, a)}) * sqrt(${centered(b, b)})), 12) AS corr
         |FROM s""".stripMargin
    }
    s"""(WITH s AS (SELECT ${comps.mkString(", ")} FROM $src WHERE $notNull)
       |${cells.mkString("\nUNION ALL\n")})""".stripMargin
  }
}

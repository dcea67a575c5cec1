package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The character-fraction repetition rules from Gopher (Rae et al.
  * 2021, §A1.1) — the half of the repetition family that
  * `TextAnalysis.repetitionProfile` (t6: token counts, distinct ratio,
  * top-bigram occurrence fraction) does not cover, because these are
  * CHARACTER-weighted: a doc whose repeated n-gram is long is worse
  * than one whose repeated n-gram is short, at equal occurrence
  * counts. Two rules:
  *
  *  - top n-gram char fraction (Gopher uses n=2,3,4): characters
  *    claimed by the single most frequent n-gram (occurrences ×
  *    n-gram char length) over total non-space characters;
  *  - duplicated n-gram char coverage (Gopher uses n=5..10): the
  *    fraction of characters lying inside ANY occurrence of an n-gram
  *    that appears more than once — an interval-UNION over token
  *    positions, so overlapping duplicate grams never double-count a
  *    character (the detail most reimplementations get wrong).
  *
  * Exactness: every numerator/denominator is an exact int64 char
  * count (token char sum == len(replace(text,' ','')) under the
  * corpus split-on-' ' convention, empty tokens contributing 0); the
  * fraction is ONE shared IEEE division at the emission boundary.
  * Ties for "most frequent" break lexicographically on the gram —
  * the same ORDER BY both engine- and oracle-side.
  *
  * Scale shape: positioned grams come from one compiled flatMap over
  * the doc scan (bounded fan-out: ≤ n_toks rows per doc per n); both
  * rules are then doc-keyed partial aggs and doc-keyed windows — no
  * cross-document state anywhere, so the operator parallelizes
  * per-document and survives any corpus size. The interval union is
  * a per-doc distinct over ≤ n·dups positions, never a global one.
  */
object Repetition {

  /** (id, pos, tok_chars, gram, gram_chars): the n-gram starting at
    * 0-based token `pos`, with exact char lengths of the head token
    * and of the whole gram (separators excluded). Null text yields no
    * rows (matches string_split(NULL) oracle-side); docs shorter than
    * `n` yield token rows (gram null) so char totals stay complete.
    */
  private[quality] def positionedGrams(df: DataFrame, idCol: String,
                                       textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .filter(col(textCol).isNotNull)
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = text.split(" ", -1)
        toks.indices.iterator.map { p =>
          val gram =
            if (p + n <= toks.length) {
              var chars = 0L
              var j = p
              while (j < p + n) { chars += toks(j).length; j += 1 }
              // the gram string only matters for the top-gram
              // tie-break and readout; chars are summed separately so
              // separators never leak into the count
              Some((toks.slice(p, p + n).mkString(" "), chars))
            } else None
          (id, p.toLong, toks(p).length.toLong,
            gram.map(_._1).orNull, gram.map(_._2).getOrElse(-1L))
        }
      }
      .toDF(idCol, "pos", "tok_chars", "gram", "gram_chars")
  }

  /** Per (doc, n) for each n in `ns`: the most frequent n-gram (ties:
    * lexicographically smallest), its occurrence count, the characters
    * it claims (count × gram chars), total non-space chars, and the
    * fraction. Docs with fewer than n tokens report count 0 / frac 0.
    */
  def topNgramCharFrac(df: DataFrame, idCol: String, textCol: String,
                       ns: Seq[Int]): DataFrame = {
    require(ns.nonEmpty, "ns must be non-empty")
    val totals = df.select(col(idCol).cast("long").as(idCol),
      length(coalesce(translate(col(textCol), " ", ""), lit("")))
        .cast("long").as("total_chars"))
    ns.map { n =>
      val grams = positionedGrams(df, idCol, textCol, n)
        .filter(col("gram").isNotNull)
        .groupBy(col(idCol), col("gram"), col("gram_chars"))
        .agg(count(lit(1)).as("c"))
      val top = grams
        .withColumn("rk", row_number().over(
          Window.partitionBy(col(idCol))
            .orderBy(col("c").desc, col("gram"))))
        .filter(col("rk") === 1)
        .select(col(idCol), col("gram").as("top_gram"),
          col("c").as("top_count"),
          (col("c") * col("gram_chars")).as("top_chars"))
      totals.join(top, Seq(idCol), "left")
        .select(col(idCol), lit(n.toLong).as("n"),
          coalesce(col("top_gram"), lit("")).as("top_gram"),
          coalesce(col("top_count"), lit(0L)).as("top_count"),
          coalesce(col("top_chars"), lit(0L)).as("top_chars"),
          col("total_chars"),
          when(col("total_chars") > 0,
            coalesce(col("top_chars"), lit(0L)).cast("double") /
              col("total_chars").cast("double"))
            .otherwise(lit(0.0)).as("top_frac"))
    }.reduce(_.unionAll(_))
  }

  /** Per doc: characters covered by the UNION of all occurrences of
    * duplicated n-grams (count ≥ 2 within the doc), total non-space
    * chars, and the coverage fraction. The union is token-position
    * based — `sequence(pos, pos+n-1)` per duplicated occurrence,
    * distinct per doc, then the covered tokens' char lengths are
    * summed — so overlapping duplicates never double-count.
    */
  def dupNgramCharCoverage(df: DataFrame, idCol: String, textCol: String,
                           n: Int): DataFrame = {
    val pg = positionedGrams(df, idCol, textCol, n)
    // per-doc-keyed window: occurrences of grams seen ≥2× in the doc
    val dupStarts = pg.filter(col("gram").isNotNull)
      .withColumn("gc", count(lit(1)).over(
        Window.partitionBy(col(idCol), col("gram"))))
      .filter(col("gc") >= 2)
      .select(col(idCol), explode(
        sequence(col("pos"), col("pos") + (n - 1))).as("cov"))
      .distinct()
    val covered = dupStarts.alias("s")
      .join(pg.select(col(idCol), col("pos"), col("tok_chars")).alias("l"),
        col(s"s.$idCol") === col(s"l.$idCol") && col("s.cov") === col("l.pos"))
      .groupBy(col(s"s.$idCol").as(idCol))
      .agg(sum(col("l.tok_chars")).as("covered_chars"))
    val totals = df.select(col(idCol).cast("long").as(idCol),
      length(coalesce(translate(col(textCol), " ", ""), lit("")))
        .cast("long").as("total_chars"))
    totals.join(covered, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("covered_chars"), lit(0L)).as("covered_chars"),
        col("total_chars"),
        when(col("total_chars") > 0,
          coalesce(col("covered_chars"), lit(0L)).cast("double") /
            col("total_chars").cast("double"))
          .otherwise(lit(0.0)).as("dup_frac"))
  }

  /** Gopher's repetition thresholds, percent form (Rae et al. §A1.1):
    * a doc is removed when the top n-gram claims MORE than 20/18/16 %
    * of its characters (n = 2/3/4), or duplicated 5-grams cover more
    * than 15 %. Percent integers so every verdict is cross-multiplied
    * int64 — no float enters any rule (the gq1 discipline).
    */
  val TopNgramLimitPct: Map[Int, Int] = Map(2 -> 20, 3 -> 18, 4 -> 16)
  val DupCoverageLimitPct: Int = 15

  /** The corpus cut: ids of docs passing ALL repetition rules
    * (inclusive boundaries — `frac == limit` survives, exactly as in
    * the profile gates). Composes [[topNgramCharFrac]] and
    * [[dupNgramCharCoverage]]; both sides of every comparison are
    * exact int64 char counts, so engine and oracle can never disagree
    * on a boundary.
    */
  def repetitionFilter(df: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val ns = TopNgramLimitPct.keys.toSeq.sorted
    val lim = ns.tail.foldLeft(
      when(col("n") === ns.head, lit(TopNgramLimitPct(ns.head).toLong))) {
      (acc, n) => acc.when(col("n") === n, lit(TopNgramLimitPct(n).toLong))
    }.otherwise(lit(-1L))
    val topPass = topNgramCharFrac(df, idCol, textCol, ns)
      .groupBy(col(idCol))
      .agg(min(when(col("top_chars") * 100 <= lim * col("total_chars"),
        lit(1)).otherwise(lit(0))).as("tp"))
    val dup = dupNgramCharCoverage(df, idCol, textCol, 5)
    topPass.join(dup, Seq(idCol))
      .filter(col("tp") === 1 &&
        col("covered_chars") * 100 <= col("total_chars") * DupCoverageLimitPct)
      .select(col(idCol))
  }
}

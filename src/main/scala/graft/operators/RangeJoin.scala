package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join at scale: every (point, interval) pair
  * with `start <= point < end` — the IP-to-geolocation / price-band /
  * sensor-window lookup shape Spark has no native operator for.
  *
  * A naive non-equi join plans as BroadcastNestedLoopJoin (fine only
  * when one side broadcasts) or, worse, a cartesian — O(|P|·|I|)
  * comparisons. Implemented instead by composition (preference (a) of
  * the extension ladder): both sides are mapped onto a shared integer
  * bucket grid of width `bucketWidth` — each point to the ONE bucket
  * containing it, each interval EXPLODED to the few buckets it covers
  * (`ceil(len/width)+1`, map-side `sequence`+`explode`, no shuffle to
  * fan out) — then ONE equi shuffle join on the bucket id plus a
  * codegen'd residual `start <= p < end` filter. A (point, interval)
  * pair meets in at most one bucket (the point's), so no dedup pass is
  * needed and inner-join multiplicity is exact.
  *
  * Scale shape: comparisons drop from |P|·|I| to the true match count
  * plus the residual-filtered same-bucket near-misses; both sides
  * shuffle ONCE on the bucket key; interval fan-out is bounded by
  * `ceil(maxIntervalLen/bucketWidth)+1` copies. `bucketWidth` is the
  * dial: ≈ the typical interval length keeps fan-out ≤ 2× while
  * keeping buckets selective. Skewed grid cells (many points and many
  * intervals in one hot bucket) ride AQE skew-join splitting, since
  * the residual filter is applied above a plain equi join.
  */
object RangeJoin {

  /** Fan-out tripwire shared by both direct-API joins: a row whose
    * bucket SPAN (`bucketOf(end) − bucketOf(start)`, i.e. covering
    * `span + 1` grid buckets) exceeds `maxSpan` raises a clear error
    * naming the remediation — the same span convention as the
    * optimizer-rule guard in RangeJoinToBucketJoin, so one `maxSpan`
    * value means the same thing on both paths. Dropping or clamping
    * the row would silently return wrong results; proceeding would
    * blow the row count up unannounced or hit `Sequence`'s opaque
    * max-array-length error. `assert_true` returns NULL when the bound
    * holds, so the filter passes every compliant row. NULL bounds pass
    * the guard untripped (the `coalesce`): Catalyst may merge this
    * filter with the `start < end` one, and `And` still evaluates the
    * right conjunct when the left is NULL — without the coalesce a
    * null-bounded row (previously silently dropped) would crash the
    * job with a misleading span error. Such rows still drop via the
    * degenerate-interval filter, exactly as before the guard existed.
    */
  private def spanGuard(loB: Column, hiB: Column, maxSpan: Long,
                        bucketWidth: Double): Column =
    assert_true(coalesce(hiB - loB <= lit(maxSpan), lit(true)), lit(
      s"graft range join: an interval spans more than $maxSpan buckets " +
        s"at bucketWidth=$bucketWidth; raise maxSpan or widen " +
        "bucketWidth")).isNull

  /** @param points      point rows
    * @param pointCol    numeric point column
    * @param intervals   interval rows
    * @param startCol    inclusive lower bound column
    * @param endCol      exclusive upper bound column
    * @param bucketWidth grid width in `pointCol` units (> 0); choose
    *                    ≈ the typical interval length
    * @param maxSpan     per-interval bucket-SPAN cap (> 0, default
    *                    65536): an interval with `bucketOf(end) −
    *                    bucketOf(start) > maxSpan` (i.e. covering more
    *                    than `maxSpan + 1` buckets) fails fast with a
    *                    clear remediation message instead of silently
    *                    materializing a huge row blow-up or dying in
    *                    `Sequence`'s opaque max-array-length error —
    *                    the same span convention as the optimizer-rule
    *                    guard (`spark.graft.rangeJoin.maxSpan`)
    * @return every `points` × `intervals` match (all columns from both
    *         sides; empty/negative intervals match nothing)
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Double, maxSpan: Long = 65536L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    require(maxSpan > 0, s"maxSpan must be positive: $maxSpan")
    // collision-proof internal key: withColumn REPLACES an existing
    // column of the same name, so a fixed "__bucket" would clobber (and
    // the final drop delete) a user column — pick the first suffix
    // absent from BOTH inputs instead
    val taken = points.columns.toSet ++ intervals.columns
    val bucket = Iterator.from(0).map(i => s"__graft_rj_bucket_$i")
      .find(!taken.contains(_)).get
    def bucketOf(c: Column): Column = floor(c / lit(bucketWidth)).cast("long")
    val p = points.withColumn(bucket, bucketOf(col(pointCol)))
    // degenerate intervals (end <= start) are dropped BEFORE the
    // sequence fan-out: with an explicit positive step, sequence(a, b)
    // throws at runtime when b < a rather than silently descending
    val i = intervals
      .filter(col(startCol) < col(endCol))
      .filter(spanGuard(bucketOf(col(startCol)), bucketOf(col(endCol)),
        maxSpan, bucketWidth))
      .withColumn(bucket,
        explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)),
          lit(1L))))
    p.join(i, Seq(bucket))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop(bucket)
  }

  /** Interval × interval OVERLAP join: every (a, b) pair with
    * `a.start < b.end && b.start < a.end` (half-open overlap — the
    * genomic-region / booking-conflict / session-intersection shape).
    *
    * Same grid as [[pointInInterval]], but BOTH sides explode to their
    * covering buckets, so an overlapping pair meets in every shared
    * bucket — a naive equi-join would multiply it. The standard
    * dedup-free fix: keep a pair only in the ONE canonical bucket
    * containing the LATER of the two starts (that bucket is always
    * shared when the intervals overlap, because the later start lies
    * inside both intervals' bucket ranges) — multiplicity stays exact
    * with no distinct pass. One equi shuffle on the bucket key, a
    * codegen'd residual, AQE skew-splitting on hot cells; fan-out per
    * row bounded by ceil(len/width)+1 like the point case.
    */
  def intervalOverlap(left: DataFrame, lStart: String, lEnd: String,
                      right: DataFrame, rStart: String, rEnd: String,
                      bucketWidth: Double, maxSpan: Long = 65536L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    require(maxSpan > 0, s"maxSpan must be positive: $maxSpan")
    val taken = left.columns.toSet ++ right.columns
    val bucket = Iterator.from(0).map(i => s"__graft_ov_bucket_$i")
      .find(!taken.contains(_)).get
    def bucketOf(c: Column): Column = floor(c / lit(bucketWidth)).cast("long")
    def exploded(df: DataFrame, s: String, e: String): DataFrame =
      df.filter(col(s) < col(e))
        .filter(spanGuard(bucketOf(col(s)), bucketOf(col(e)), maxSpan,
          bucketWidth))
        .withColumn(bucket,
          explode(sequence(bucketOf(col(s)), bucketOf(col(e)), lit(1L))))
    exploded(left, lStart, lEnd).join(exploded(right, rStart, rEnd),
        Seq(bucket))
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      // canonical-bucket guard: count the pair exactly once, where the
      // later start lives
      .filter(col(bucket) === bucketOf(greatest(col(lStart), col(rStart))))
      .drop(bucket)
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NullType, NumericType}

/** Optimizer rule: inner joins whose ONLY cross-side predicates are a
  * band `lo ⊴ p ⊴ hi` (one side's expression between two of the other
  * side's) have no equi key, so Spark plans BroadcastNestedLoopJoin —
  * O(|P|·|I|) compares, and a plain OOM-or-crawl when neither side
  * fits in an executor. This rule rewrites them onto the shared
  * integer bucket grid of [[graft.operators.RangeJoin]]: the point
  * side gains `floor(p/w)`, the interval side EXPLODES to its covering
  * buckets (map-side `sequence`), and the join becomes a bucket
  * EQUI-join with the original band kept as the residual condition —
  * a shuffled hash/sort-merge join that AQE can skew-split.
  *
  * Opt-in by conf (`spark.graft.rangeJoin.bucketWidth`, in point
  * units): bucket width is a data-dependent dial (≈ the typical
  * interval length), not something a rule should guess. Unset ⇒ the
  * rule never fires. This mirrors the range-join hints of
  * Databricks/Photon, which OSS Spark lacks.
  *
  * Safety:
  *  - fires only on Inner joins where the cross-side conjuncts are
  *    EXACTLY one lower and one upper bound on the same point
  *    expression (any of >=, >, <, <= — the original operators ride
  *    along as the residual, so open/closed semantics are preserved
  *    bit-for-bit); same-side conjuncts ride along untouched;
  *  - skips joins that already have a cross-side equality (those are
  *    hash-joinable as-is — and the rewrite's own output re-matches
  *    this guard, making the rule idempotent);
  *  - inverted intervals whose bucket range would make `sequence`
  *    throw (floor(lo/w) > floor(hi/w)) are pre-filtered on the
  *    interval side — those rows cannot satisfy the band anyway;
  *  - null points/bounds produce a null bucket (never equi-matches) or
  *    an empty sequence (generates nothing) — exactly the rows the
  *    null-rejecting band comparisons dropped before.
  */
object RangeJoinToBucketJoin extends Rule[LogicalPlan] with PredicateHelper {

  /** Global bucket width (point units) for EVERY band join in the
    * session once set — a data-dependent dial, so unset ⇒ rule off.
    * CAUTION: one width serves all band joins; an interval long
    * relative to it explodes to ceil(len/width)+1 rows. Intervals
    * spanning more than [[MaxSpanConf]] buckets fail fast with a
    * clear remediation message instead of materializing the fan-out
    * (or hitting Sequence's opaque max-array-length error).
    */
  val WidthConf = "spark.graft.rangeJoin.bucketWidth"

  /** Per-interval fan-out cap, in buckets (default 65536). A row whose
    * interval covers more buckets raises a runtime error naming both
    * confs — silently dropping or clamping it would return wrong
    * results; proceeding would blow the row count up unannounced.
    */
  val MaxSpanConf = "spark.graft.rangeJoin.maxSpan"
  private val DefaultMaxSpan = 65536L

  /** A cross-side comparison normalized to "point ⊵ bound". */
  private case class Band(point: Expression, bound: Expression,
                          isLower: Boolean)

  private def numeric(e: Expression): Boolean =
    e.dataType.isInstanceOf[NumericType]

  /** Normalize a conjunct into Band form when one side's references
    * live entirely in `pointSide` and the other's in `boundSide`.
    */
  private def asBand(c: Expression, pointSide: AttributeSet,
                     boundSide: AttributeSet): Option[Band] = {
    def oriented(p: Expression, b: Expression): Boolean =
      p.references.nonEmpty && p.references.subsetOf(pointSide) &&
        b.references.nonEmpty && b.references.subsetOf(boundSide) &&
        numeric(p) && numeric(b) && p.deterministic && b.deterministic
    c match {
      case GreaterThanOrEqual(a, b) if oriented(a, b) => Some(Band(a, b, isLower = true))
      case GreaterThan(a, b) if oriented(a, b)        => Some(Band(a, b, isLower = true))
      case LessThanOrEqual(a, b) if oriented(a, b)    => Some(Band(a, b, isLower = false))
      case LessThan(a, b) if oriented(a, b)           => Some(Band(a, b, isLower = false))
      case GreaterThanOrEqual(a, b) if oriented(b, a) => Some(Band(b, a, isLower = false))
      case GreaterThan(a, b) if oriented(b, a)        => Some(Band(b, a, isLower = false))
      case LessThanOrEqual(a, b) if oriented(b, a)    => Some(Band(b, a, isLower = true))
      case LessThan(a, b) if oriented(b, a)           => Some(Band(b, a, isLower = true))
      case _ => None
    }
  }

  private def crossSide(c: Expression, l: AttributeSet, r: AttributeSet): Boolean =
    c.references.intersect(l).nonEmpty && c.references.intersect(r).nonEmpty

  private def bucketOf(e: Expression, w: Double): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w))), LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(WidthConf, "")
    if (width.isEmpty) return plan
    // a malformed width must not brick every query in the session (the
    // rule runs on ALL plans once the conf is set): unparseable or
    // non-positive values log once and disable the rule
    val w = scala.util.Try(width.toDouble).toOption match {
      case Some(v) if v > 0 => v
      case _ =>
        logWarning(s"$WidthConf='$width' is not a positive number; " +
          "range-join rewrite disabled")
        return plan
    }
    val maxSpan = scala.util.Try(
      conf.getConfString(MaxSpanConf, DefaultMaxSpan.toString).toLong)
      .toOption.filter(_ > 0).getOrElse {
        logWarning(s"$MaxSpanConf is not a positive long; " +
          s"using default $DefaultMaxSpan")
        DefaultMaxSpan
      }
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if hint.leftHint.isEmpty && hint.rightHint.isEmpty =>
        val conjuncts = splitConjunctivePredicates(cond)
        val cross = conjuncts.filter(c =>
          crossSide(c, left.outputSet, right.outputSet))
        val hasEqui = cross.exists {
          case EqualTo(a, b) =>
            (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
              (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
          case EqualNullSafe(a, b) =>
            (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
              (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
          case _ => false
        }
        // exactly a lower+upper band over ONE point expression, point
        // on one side and both bounds on the other
        val rewritten = if (hasEqui || cross.size != 2) None else {
          def tryOrient(pointSide: LogicalPlan, boundSide: LogicalPlan,
                        pointIsLeft: Boolean): Option[LogicalPlan] = {
            val bands = cross.flatMap(asBand(_, pointSide.outputSet,
              boundSide.outputSet))
            bands match {
              case Seq(b1, b2) if b1.isLower != b2.isLower &&
                  b1.point.semanticEquals(b2.point) =>
                val lo = if (b1.isLower) b1.bound else b2.bound
                val hi = if (b1.isLower) b2.bound else b1.bound
                Some(rewrite(j, pointSide, boundSide, pointIsLeft,
                  b1.point, lo, hi, w, maxSpan))
              case _ => None
            }
          }
          tryOrient(left, right, pointIsLeft = true)
            .orElse(tryOrient(right, left, pointIsLeft = false))
        }
        rewritten.getOrElse(j)
    }
  }

  private def rewrite(j: Join, pointSide: LogicalPlan, boundSide: LogicalPlan,
                      pointIsLeft: Boolean, point: Expression, lo: Expression,
                      hi: Expression, w: Double, maxSpan: Long): LogicalPlan = {
    logInfo(s"rewriting band join to bucket equi-join: width=$w, " +
      s"per-interval fan-out bounded by $MaxSpanConf=$maxSpan buckets " +
      s"(rows spanning more raise a runtime error)")
    // point side: one projected bucket column
    val pBucketAlias = Alias(bucketOf(point, w), "__graft_bucket_p")()
    val pPlan = Project(pointSide.output :+ pBucketAlias, pointSide)
    // interval side: guard un-sequenceable inverted bucket ranges, then
    // explode the covering buckets
    val loB = bucketOf(lo, w)
    val hiB = bucketOf(hi, w)
    // fan-out tripwire: an interval wide relative to the GLOBAL width
    // (e.g. a second band join over a much larger domain) would explode
    // to ceil(len/w)+1 rows — up to Sequence's opaque max-array-length
    // error. Such rows fail fast with the remediation spelled out;
    // dropping or clamping them would silently return wrong results.
    // NULL bounds coalesce to TRUE (no trip): And still evaluates this
    // conjunct when loB<=hiB is NULL, and the un-rewritten plan simply
    // non-matches a null-bounded row — it must not crash here either
    // (same fix as the direct API's RangeJoin.spanGuard).
    val spanOk = Coalesce(Seq(
      LessThanOrEqual(Subtract(hiB, loB), Literal(maxSpan)),
      Literal.TrueLiteral))
    val spanGuard = IsNull(If(spanOk, Literal(null, NullType),
      new RaiseError(Literal(
        s"graft range-join rewrite: an interval spans more than " +
          s"$maxSpan buckets at $WidthConf=$w; raise $MaxSpanConf, " +
          s"widen $WidthConf, or unset it to fall back to the " +
          s"nested-loop plan"))))
    val guarded = Filter(And(LessThanOrEqual(loB, hiB), spanGuard), boundSide)
    val bAttr = AttributeReference("__graft_bucket_i", LongType,
      nullable = false)()
    val gen = Generate(
      // Sequence is TimeZoneAwareExpression: without a zone it reports
      // unresolved even for numeric sequences, failing plan validation
      Explode(Sequence(loB, hiB, Some(Literal(1L)),
        Some(conf.sessionLocalTimeZone))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(bAttr), child = guarded)
    val newCond = And(EqualTo(pBucketAlias.toAttribute, bAttr),
      j.condition.get)
    val (newLeft, newRight) =
      if (pointIsLeft) (pPlan, gen) else (gen, pPlan)
    Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
  }
}

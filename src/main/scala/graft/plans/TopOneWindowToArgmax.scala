package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: the reference's keep-first-occurrence idiom
  * (SURVEY.md §2.3 D1+D4 — `row_number().over(partitionBy(keys)
  * .orderBy(o))` then `filter(rn <= 1)`) rewritten to a struct-extreme
  * aggregate:
  *
  *   Filter(rn = 1, Window(row_number over (P order by O)))
  *     ⇒ Project(reconstruct, Aggregate(P, min/max(struct(O, rest))))
  *
  * Why at 100 TB: the Window form ships EVERY row through the shuffle
  * and sorts each partition; the aggregate form partial-combines
  * map-side, so one row per key per input partition crosses the wire
  * and no sort happens at all (see a11_argmax's measured plan). For
  * the reference's dedup (keys ≈ all columns) that is the difference
  * between shuffling the full table and shuffling ~the distinct keys.
  *
  * Safety conditions (rewrite fires only when ALL hold):
  *  - the filter keeps exactly rank 1 (`rn = 1` / `rn <= 1` / `1 >= rn`
  *    as the SOLE predicate), and the window computes exactly one
  *    expression: `row_number()`;
  *  - partition expressions are deterministic over the child (they may
  *    carry the optimizer's float-normalization wrappers — they are
  *    reused verbatim as grouping expressions, never reconstructed
  *    from);
  *  - order expressions are plain attributes, and every column type is
  *    orderable (struct min/max needs it);
  *  - order directions are uniform with default null placement:
  *    all (ASC NULLS FIRST) ⇒ min, all (DESC NULLS LAST) ⇒ max — in
  *    both cases struct comparison places nulls exactly where the sort
  *    did;
  *  - every output attribute is reconstructed out of the winning struct
  *    under its ORIGINAL exprId (rn becomes literal 1), so operators
  *    above the filter are untouched and original values (including
  *    un-normalized float keys) survive bit-exactly.
  *
  * Tie semantics: `row_number` breaks order-key ties arbitrarily
  * (partition-layout-dependent); the struct extreme breaks them
  * deterministically by the remaining columns — a deterministic
  * refinement of an otherwise nondeterministic choice, never a change
  * to any well-defined result.
  */
object TopOneWindowToArgmax extends Rule[LogicalPlan] {

  private def keepsOnlyRankOne(cond: Expression): Option[ExprId] = cond match {
    case EqualTo(a: AttributeReference, IntegerLiteral(1)) => Some(a.exprId)
    case EqualTo(IntegerLiteral(1), a: AttributeReference) => Some(a.exprId)
    case LessThanOrEqual(a: AttributeReference, IntegerLiteral(1)) => Some(a.exprId)
    case GreaterThanOrEqual(IntegerLiteral(1), a: AttributeReference) => Some(a.exprId)
    case _ => None
  }

  private def tryRewrite(cond: Expression, w: Window): Option[LogicalPlan] = {
    val rnOk = w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(RowNumber(), _), _)) =>
        keepsOnlyRankOne(cond).contains(a.exprId)
      case _ => false
    }
    // partitionSpec must be non-empty: a GLOBAL Aggregate(Nil, …) emits
    // one all-null row on empty input where the Window+Filter emits none
    if (!rnOk || w.orderSpec.isEmpty || w.partitionSpec.isEmpty) return None

    val useMin = w.orderSpec.forall(s =>
      s.direction == Ascending && s.nullOrdering == NullsFirst)
    val useMax = w.orderSpec.forall(s =>
      s.direction == Descending && s.nullOrdering == NullsLast)
    if (!useMin && !useMax) return None

    // WindowGroupLimit (Spark's own rank<=k pre-filter) below the window
    // only drops rows that can never be the extreme — safe to bypass
    val child = w.child match {
      case wgl: WindowGroupLimit => wgl.child
      case c => c
    }

    if (!w.partitionSpec.forall(e =>
      e.deterministic && e.references.subsetOf(child.outputSet))) return None
    val orderAttrs = w.orderSpec.map(_.child).map {
      case a: AttributeReference => a
      case _ => return None
    }
    // order keys lead the struct (they decide the extreme); every other
    // child column rides behind them — partition values too, so nothing
    // is ever reconstructed from a (possibly float-normalized) grouping
    // expression
    val orderUnique = orderAttrs.foldLeft(Vector.empty[AttributeReference]) {
      (acc, a) => if (acc.exists(_.exprId == a.exprId)) acc else acc :+ a
    }
    val rest = child.output.filterNot(a => orderUnique.exists(_.exprId == a.exprId))
    val structFields = (orderUnique ++ rest).toIndexedSeq
    if (!structFields.forall(a => RowOrdering.isOrderable(a.dataType))) return None

    val struct = CreateStruct(structFields)
    val fn = if (useMin) Min(struct) else Max(struct)
    val top = Alias(AggregateExpression(fn, Complete, isDistinct = false), "__graft_top")()
    val agg = Aggregate(w.partitionSpec, Seq(top), child)

    val topRef = top.toAttribute
    val rebuilt: Seq[NamedExpression] = w.output.map { out =>
      val i = structFields.indexWhere(_.exprId == out.exprId)
      if (i >= 0)
        Alias(GetStructField(topRef, i, Some(structFields(i).name)), out.name)(
          exprId = out.exprId)
      else // the row_number output: every surviving row has rank 1
        Alias(Literal(1), out.name)(exprId = out.exprId)
    }
    Some(Project(rebuilt.toIndexedSeq, agg))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, w: Window) =>
      tryRewrite(cond, w).getOrElse(f)
    case f @ Filter(cond, p @ Project(list, w: Window))
        if list.forall(_.isInstanceOf[AttributeReference]) =>
      tryRewrite(cond, w).map(r => Project(list, r)).getOrElse(f)
  }
}

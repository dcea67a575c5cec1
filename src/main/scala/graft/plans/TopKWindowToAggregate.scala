package graft.plans

import graft.functions.TopKStructs
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: the k-generalization of [[TopOneWindowToArgmax]] —
  * `filter(row_number().over(P orderBy O) <= k)` becomes a bounded
  * [[TopKStructs]] aggregate plus a `posexplode`:
  *
  *   Filter(rn <= k, Window(row_number over (P order by O)))
  *     ⇒ Project(reconstruct, Generate(posexplode(top),
  *         Aggregate(P, top_k_structs(struct(O, rest), k))))
  *
  * Shuffle math: the window form ships every row and sorts whole
  * partitions; the aggregate's partial buffers cap at k rows per group
  * per input partition. Ranks are recovered from the explode position
  * (the aggregate's output array is sorted), so the rn column survives
  * with its original exprId.
  *
  * Fires under the same safety conditions as the argmax rule (sole
  * rank predicate, lone row_number, uniform direction with default
  * null placement, attribute order keys, orderable types, non-empty
  * partition spec) plus 2 <= k <= 128 — k = 1 belongs to the cheaper
  * binary-buffer argmax rule, and an unbounded k would make the
  * aggregate buffer the thing it is supposed to bound.
  */
object TopKWindowToAggregate extends Rule[LogicalPlan] {

  private val MaxK = 128

  private def keptRank(cond: Expression): Option[(ExprId, Int)] = cond match {
    case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k)) => Some((a.exprId, k))
    case GreaterThanOrEqual(IntegerLiteral(k), a: AttributeReference) => Some((a.exprId, k))
    case LessThan(a: AttributeReference, IntegerLiteral(k)) => Some((a.exprId, k - 1))
    case GreaterThan(IntegerLiteral(k), a: AttributeReference) => Some((a.exprId, k - 1))
    case _ => None
  }

  private def tryRewrite(cond: Expression, w: Window): Option[LogicalPlan] = {
    val k = w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(RowNumber(), _), _)) =>
        keptRank(cond).collect { case (id, kk) if id == a.exprId => kk }
      case _ => None
    }
    if (k.isEmpty || k.get < 2 || k.get > MaxK) return None
    if (w.orderSpec.isEmpty || w.partitionSpec.isEmpty) return None

    val useAsc = w.orderSpec.forall(s =>
      s.direction == Ascending && s.nullOrdering == NullsFirst)
    val useDesc = w.orderSpec.forall(s =>
      s.direction == Descending && s.nullOrdering == NullsLast)
    if (!useAsc && !useDesc) return None

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
    val orderUnique = orderAttrs.foldLeft(Vector.empty[AttributeReference]) {
      (acc, a) => if (acc.exists(_.exprId == a.exprId)) acc else acc :+ a
    }
    val rest = child.output.filterNot(a => orderUnique.exists(_.exprId == a.exprId))
    val structFields = (orderUnique ++ rest).toIndexedSeq
    if (!structFields.forall(a => RowOrdering.isOrderable(a.dataType))) return None

    val packed = CreateStruct(structFields)
    val top = Alias(
      TopKStructs(packed, k.get, descending = useDesc).toAggregateExpression(),
      "__graft_topk")()
    val agg = Aggregate(w.partitionSpec, Seq(top), child)

    val posAttr = AttributeReference("__graft_pos", IntegerType, nullable = false)()
    val rowAttr = AttributeReference("__graft_row", packed.dataType, nullable = false)()
    val gen = Generate(PosExplode(top.toAttribute), unrequiredChildIndex = Seq(0),
      outer = false, qualifier = None,
      generatorOutput = Seq(posAttr, rowAttr), agg)

    val rebuilt: Seq[NamedExpression] = w.output.map { out =>
      val i = structFields.indexWhere(_.exprId == out.exprId)
      if (i >= 0)
        Alias(GetStructField(rowAttr, i, Some(structFields(i).name)), out.name)(
          exprId = out.exprId)
      else // the row_number output: array order IS rank order
        Alias(Add(posAttr, Literal(1)), out.name)(exprId = out.exprId)
    }
    Some(Project(rebuilt.toIndexedSeq, gen))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, w: Window) =>
      tryRewrite(cond, w).getOrElse(f)
    case f @ Filter(cond, p @ Project(list, w: Window))
        if list.forall(_.isInstanceOf[AttributeReference]) =>
      tryRewrite(cond, w).map(r => Project(list, r)).getOrElse(f)
  }
}

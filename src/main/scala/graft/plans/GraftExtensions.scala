package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, In, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Union}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule for the reference's filter-then-union idiom
  * (SURVEY.md §2.8 U1 / §4 "custom Rule" row):
  *
  *   df.filter(c === a).union(df.filter(c === b))…   [pairwise distinct]
  *     ⇒ df.filter(c.isin(a, b, …))
  *
  * N-ary: Spark flattens chained unions into one Union node, so the
  * idiom with three statuses is a single three-branch Union here.
  *
  * appears in LAB-2022-Standalone-SparkML-CSV-to-MLPCModel-3.ipynb:1824
  * and loanStat-DataproctoBQ.py:301. The rewrite halves the scan count
  * (one pass instead of two over the same child) — at 100 TB that is
  * the difference between reading the fact table once or twice.
  *
  * Safety: both branches must be the SAME canonical child, the
  * predicates must be equality on the same column (matched by output
  * ordinal, not exprId — the two branches carry distinct instances),
  * and the literals must differ; a row can then never satisfy both
  * branches, so bag-union semantics are preserved exactly. Ordering is
  * not preserved — both forms are unordered bags.
  */
object UnionFilterToIsin extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  import org.apache.spark.sql.catalyst.expressions.{And, Expression}

  /** One branch of the union decomposed: the equality predicate found
    * in its (possibly project-wrapped, isnotnull-augmented) filter, the
    * column's ordinal in that filter's child, and the branch with the
    * equality masked out — canonical equality of the masked branches
    * proves the two sides are the same plan up to the literal.
    */
  private case class Branch(equality: EqualTo, attr: AttributeReference,
                            lit: Literal, ordinal: Int, masked: LogicalPlan)

  /** Walk ONLY through per-row operators (Project) to find the Filter.
    * A Filter below anything row-merging/limiting (Aggregate, Limit,
    * Window, …) must NOT be matched: the "a row satisfies at most one
    * branch" safety argument holds only when the path from the Filter
    * to the Union is per-row, otherwise the rewrite merges aggregates
    * or halves limits (wrong results, confirmed by test).
    */
  private def analyze(branch: LogicalPlan): Seq[Branch] = {
    import org.apache.spark.sql.catalyst.plans.logical.Project
    branch match {
      case Project(list, inner) =>
        analyze(inner).map(b => b.copy(masked = Project(list, b.masked)))
      case Filter(cond, child) =>
        // every equality predicate is a candidate: branches like
        // (c1=1 AND c2=5) vs (c1=1 AND c2=6) only unify on the SECOND
        // equality, so taking just the first would miss the rewrite
        val preds = splitConjunctivePredicates(cond)
        preds.collect {
          case e @ EqualTo(a: AttributeReference, l: Literal)
              if child.output.indexWhere(_.exprId == a.exprId) >= 0 =>
            val ord = child.output.indexWhere(_.exprId == a.exprId)
            val rest = preds.filterNot(_.asInstanceOf[AnyRef] eq e)
            val masked = Filter((rest :+ (Literal.TrueLiteral: Expression)).reduce(And), child)
            Branch(e, a, l, ord, masked)
        }
      case _ => Nil
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // n-ary: Spark flattens chained unions, so the reference idiom with
    // three statuses arrives as ONE Union of three branches
    case u @ Union(children, false, false) if children.length >= 2 =>
      val candidateSets = children.map(analyze)
      val anchor = candidateSets.head.iterator.flatMap { m1 =>
        // every other branch must contribute a candidate whose masked
        // plan and column ordinal match the anchor's
        val matched = candidateSets.tail.map(_.find(m =>
          m.masked.canonicalized == m1.masked.canonicalized &&
            m.ordinal == m1.ordinal))
        if (matched.forall(_.isDefined)) Some((m1, matched.map(_.get)))
        else None
      }.nextOption()
      anchor match {
        case Some((m1, rest)) =>
          val lits = m1.lit +: rest.map(_.lit)
          // pairwise-distinct literals UNDER SQL COMPARISON: distinct
          // Literal objects can still compare equal per the column's
          // semantics (-0.0 vs 0.0 doubles), and then the two branches
          // are NOT exclusive — the union emits the row twice while
          // isin would emit it once. Evaluate EqualTo per pair and
          // require a definite FALSE (null/eval-failure ⇒ bail).
          val pairwiseDistinct = lits.combinations(2).forall {
            case Seq(a, b) =>
              a.dataType == b.dataType &&
                (try { EqualTo(a, b).eval(null) == java.lang.Boolean.FALSE }
                 catch { case _: Exception => false })
            case _ => false
          }
          if (pairwiseDistinct) {
            // keep branch 1, widening its equality to isin(l1..ln);
            // transformUp touches the (Project*/Filter) spine only —
            // analyze() guaranteed that is the whole branch
            children.head.transformUp {
              case Filter(cond, child) =>
                Filter(cond.transform {
                  case e if e.asInstanceOf[AnyRef] eq m1.equality =>
                    In(m1.attr, lits)
                }, child)
            }
          } else u
        case None => u
      }
  }
}

/** Entry point for `SparkSession.builder().withExtensions(...)` or the
  * `spark.sql.extensions` conf: the optimizer rule plus the engine's
  * SQL-callable functions (`SELECT dot_product(a, b)`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => UnionFilterToIsin)
    e.injectOptimizerRule(_ => TopOneWindowToArgmax)
    e.injectOptimizerRule(_ => TopKWindowToAggregate)
    e.injectOptimizerRule(_ => RangeJoinToBucketJoin)
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.DotProduct].getName, "dot_product"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2,
          s"dot_product requires exactly 2 arguments, got ${exprs.length}")
        graft.functions.DotProduct(exprs(0), exprs(1))
      }))
  }
}

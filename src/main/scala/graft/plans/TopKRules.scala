package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.expressions.{RowOrdering => CatalystRowOrdering}

/** Optimizer rule: a rank-limit filter over a row_number window
  *
  * {{{ ... row_number() OVER (PARTITION BY k ORDER BY o) AS rn ... WHERE rn <= K }}}
  *
  * gets a [[TopKPerKey]] inserted below the Window, so only the K best rows
  * per key reach the window at all — and the partial heap pass runs BEFORE
  * the shuffle, so the exchange carries K × keys-per-mapper candidates
  * instead of the corpus. The Window then assigns ranks over K-bounded
  * groups. Spark's own InferWindowGroupLimit has the same goal but its
  * WindowGroupLimitExec sorts every partition; the heap pass sorts nothing.
  *
  * The K = 1 case belongs to [[RankOneWindowToAggregate]] (registered
  * first), which eliminates the window entirely; this rule takes K ≥ 2.
  * Only row_number qualifies: rank()/dense_rank() can admit more than K
  * rows under ties, which the heap would wrongly cut.
  */
object RankLimitToTopK extends Rule[LogicalPlan] with PredicateHelper {

  private val confKey = "spark.graft.rewriteRankLimitTopK"

  /** The tightest upper bound K that `cond` puts on `rn`, if any. */
  private def rankBound(cond: Expression, rn: Attribute): Option[Int] = {
    val bounds = splitConjunctivePredicates(cond).flatMap {
      case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
      case LessThan(a: AttributeReference, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
      case EqualTo(a: AttributeReference, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
      case EqualTo(IntegerLiteral(k), a: AttributeReference) if a.semanticEquals(rn) => Some(k)
      case GreaterThanOrEqual(IntegerLiteral(k), a: AttributeReference) if a.semanticEquals(rn) => Some(k)
      case GreaterThan(IntegerLiteral(k), a: AttributeReference) if a.semanticEquals(rn) => Some(k - 1)
      case _ => None
    }
    if (bounds.isEmpty) None else Some(bounds.min)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(confKey, "true") != "true") return plan
    plan.transform {
      case f @ Filter(cond,
          w @ Window(Seq(al @ Alias(WindowExpression(RowNumber(), _), _)),
            partitionSpec, orderSpec, child, _))
          if partitionSpec.nonEmpty && partitionSpec.forall(_.deterministic) &&
            orderSpec.nonEmpty &&
            orderSpec.forall(s => s.child.deterministic &&
              CatalystRowOrdering.isOrderable(s.child.dataType)) &&
            !child.isInstanceOf[TopKPerKey] =>
        rankBound(cond, al.toAttribute) match {
          case Some(k) if k >= 2 =>
            f.copy(child = w.withNewChildren(
              Seq(TopKPerKey(k, partitionSpec, orderSpec, child))))
          case _ => f
        }
    }
  }
}

/** Column pruning through [[TopKPerKey]]: the node is opaque to Catalyst's
  * ColumnPruning, so without this a two-column projection over a top-k
  * would read every scanned column. When a parent Project uses a subset of
  * the child's output, push a Project below the operator keeping only what
  * the parent, the keys, and the ordering reference — that Project then
  * merges toward the scan and shrinks ReadSchema.
  */
object PruneTopKPerKeyChild extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, t: TopKPerKey)
        if (t.child.outputSet -- p.references -- t.references).nonEmpty =>
      val keep = t.child.output.filter(a =>
        p.references.contains(a) || t.references.contains(a))
      p.copy(child = t.copy(child = Project(keep, t.child)))
  }
}

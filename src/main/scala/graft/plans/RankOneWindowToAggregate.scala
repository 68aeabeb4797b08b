package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.expressions.{RowOrdering => CatalystRowOrdering}

/** Optimizer rule: rewrite the "rank-1 window" dedup idiom
  *
  * {{{
  *   SELECT ... FROM (SELECT *, row_number() OVER
  *     (PARTITION BY k ORDER BY o) AS seq FROM t) WHERE seq = 1
  * }}}
  *
  * into a single `min_by`/`max_by` aggregate:
  *
  * {{{
  *   SELECT k, min_by(c1, struct(o)), ..., 1 AS seq FROM t GROUP BY k
  * }}}
  *
  * The window form shuffles every row, then SORTS each partition before the
  * limit-1 filter (Spark's own InferWindowGroupLimit still sorts; it only
  * caps the rank). The aggregate form is one hash aggregation with map-side
  * partial aggregation: at 100 TB the shuffle carries one candidate row per
  * (key, mapper) instead of the whole corpus, and no sort happens at all.
  * This automates the q64 rewrite (SURVEY §4) for every latest-wins query,
  * including plain SQL ones the Column-API helpers never see.
  *
  * Semantics: `row_number` ties are nondeterministic in both forms (callers
  * pass a total order for determinism — same contract as
  * [[graft.write.Writers.latestWins]]). Null ordering matches because a
  * struct compares fields ascending-nulls-first: ASC NULLS FIRST == min_by,
  * DESC NULLS LAST == max_by. The rewrite is skipped for mixed directions,
  * non-default null ordering, nondeterministic or non-orderable sort keys.
  *
  * Disabled with `spark.graft.rewriteRankOneWindow=false` (used by the A/B
  * spec that proves result equality against the un-rewritten plan).
  */
object RankOneWindowToAggregate extends Rule[LogicalPlan] with PredicateHelper {

  private val confKey = "spark.graft.rewriteRankOneWindow"

  /** cond accepts exactly the rank-1 row: seq = 1, seq <= 1, seq < 2. */
  private def isRankOne(cond: Expression, rn: Attribute): Boolean = cond match {
    case EqualTo(a: AttributeReference, IntegerLiteral(1)) => a.semanticEquals(rn)
    case EqualTo(IntegerLiteral(1), a: AttributeReference) => a.semanticEquals(rn)
    case LessThanOrEqual(a: AttributeReference, IntegerLiteral(1)) => a.semanticEquals(rn)
    case LessThan(a: AttributeReference, IntegerLiteral(2)) => a.semanticEquals(rn)
    case GreaterThanOrEqual(IntegerLiteral(1), a: AttributeReference) => a.semanticEquals(rn)
    case GreaterThan(IntegerLiteral(2), a: AttributeReference) => a.semanticEquals(rn)
    case _ => false
  }

  /** Some(true) → min_by (all ASC NULLS FIRST); Some(false) → max_by (all
    * DESC NULLS LAST); None → direction mix we can't express as one struct
    * extremum, skip.
    */
  private def pickMin(orderSpec: Seq[SortOrder]): Option[Boolean] =
    if (orderSpec.isEmpty) None
    else if (orderSpec.forall(s => s.direction == Ascending && s.nullOrdering == NullsFirst)) {
      Some(true)
    } else if (orderSpec.forall(s => s.direction == Descending && s.nullOrdering == NullsLast)) {
      Some(false)
    } else None

  /** Build the replacement plan plus the old→new attribute mapping.
    *
    * Fresh exprIds are minted for every aggregated output (and the rank
    * column) — reusing the child's ids would make the same exprId mean "raw
    * column" below the Aggregate and "winner's value" above it, and
    * PushDownPredicates would then push a post-dedup filter below the
    * aggregate (it checks `references.subsetOf(child.outputSet)`), silently
    * changing results. `transformUpWithNewOutput` rewrites all upstream
    * references to the fresh ids, exactly as Spark's own
    * ReplaceDeduplicateWithAggregate does.
    */
  private def rewrite(cond: Expression, w: Window, rnAttr: Attribute,
                      rnName: String): Option[(LogicalPlan, Seq[(Attribute, Attribute)])] = {
    val preds = splitConjunctivePredicates(cond)
    val (rankPreds, rest) = preds.partition(isRankOne(_, rnAttr))
    if (rankPreds.isEmpty || rest.exists(_.references.contains(rnAttr))) return None
    pickMin(w.orderSpec).map { useMin =>
      val keys = w.orderSpec.map(_.child)
      // One shared ordering struct; never null itself, so min_by/max_by's
      // null-ordering-skips-row semantics can't drop rows.
      val keyStruct = CreateStruct(keys)
      val groupingAttrs = AttributeSet(w.partitionSpec.collect { case a: Attribute => a })
      val aggExprs: Seq[NamedExpression] = w.child.output.map { a =>
        if (groupingAttrs.contains(a)) a
        else {
          val f = if (useMin) MinBy(a, keyStruct) else MaxBy(a, keyStruct)
          Alias(f.toAggregateExpression(), a.name)(qualifier = a.qualifier)
        }
      } :+ Alias(Literal(1), rnName)(qualifier = rnAttr.qualifier)
      val agg = Aggregate(w.partitionSpec, aggExprs, w.child)
      val oldOutput = w.child.output :+ rnAttr
      val mapping = oldOutput.zip(agg.output).filterNot { case (o, n) => o.semanticEquals(n) }
      // `rest` conjuncts live inside the node being replaced, so upstream
      // remapping never sees them — substitute the fresh attrs here.
      val attrMap = AttributeMap(mapping)
      val plan =
        if (rest.isEmpty) agg
        else Filter(rest.reduce(And).transform {
          case a: Attribute => attrMap.getOrElse(a, a)
        }, agg)
      (plan, mapping)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(confKey, "true") != "true") return plan
    plan.transformUpWithNewOutput {
      case f @ Filter(cond,
          w @ Window(Seq(al @ Alias(WindowExpression(RowNumber(), _), rnName)),
            partitionSpec, orderSpec, _, _))
          if partitionSpec.forall(_.deterministic) &&
            orderSpec.forall(s => s.child.deterministic &&
              CatalystRowOrdering.isOrderable(s.child.dataType)) =>
        rewrite(cond, w, al.toAttribute, rnName).getOrElse((f, Nil))
    }
  }
}

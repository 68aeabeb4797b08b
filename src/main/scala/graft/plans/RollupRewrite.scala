package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Partial-aggregate columns a materialized rollup carries for one base
  * measure column: the names of the MV columns holding the per-group
  * `sum(x)`, `count(x)` and `min/max(x)` partials. Only declared partials
  * are rewritable; an aggregate the MV cannot answer leaves the query on
  * the base table untouched.
  */
final case class MvMeasures(
    sums: Map[String, String] = Map.empty,
    cnts: Map[String, String] = Map.empty,
    mins: Map[String, String] = Map.empty,
    maxs: Map[String, String] = Map.empty,
    rowCount: Option[String] = None)

/** One registered materialized rollup: the base table's grouping keys the MV
  * preserves at full granularity, the partial-aggregate column mapping, and
  * a thunk producing a fresh analyzed plan of the MV scan (fresh so two
  * rewrites in one query never share expression ids).
  */
final case class MvEntry(keys: Set[String], measures: MvMeasures, mvPlan: () => LogicalPlan)

/** Session-global registry of materialized rollups, keyed by the base
  * table's normalized parquet root path. Registration is explicit and the
  * freshness contract is the caller's: register (or re-register) after every
  * MV refresh/maintenance cycle — the rewrite itself assumes the MV is an
  * exact rollup of the CURRENT base data, exactly like any warehouse MV.
  */
object MvCatalog {
  private val entries = TrieMap.empty[String, MvEntry]

  def normalize(path: String): String = new Path(path).toUri.getPath

  /** Register `mv` (a plain scan DataFrame of the materialized rollup) as
    * the rollup of the base table at `basePath` over `keys`.
    */
  def register(basePath: String, keys: Seq[String], measures: MvMeasures, mv: DataFrame): Unit =
    entries.put(normalize(basePath), MvEntry(keys.toSet, measures,
      () => mv.queryExecution.analyzed.transformUp {
        case m: MultiInstanceRelation => m.newInstance().asInstanceOf[LogicalPlan]
      }))

  def unregister(basePath: String): Unit = entries.remove(normalize(basePath))
  def clear(): Unit = entries.clear()
  def lookup(rootPaths: Seq[String]): Option[MvEntry] =
    rootPaths.iterator.flatMap(p => entries.get(normalize(p))).nextOption()
}

/** Optimizer rule: answer a coarse aggregate from a registered materialized
  * rollup instead of the base table — the lakehouse analogue of
  * Calcite/warehouse aggregate-rewrite, and the reason golden summary tables
  * (SURVEY §2 C9, reference config/mau_summary.py:4-28) exist at all.
  *
  * {{{
  *   SELECT f(k1), sum(x), count(1) FROM base WHERE p(k2) GROUP BY f(k1)
  * }}}
  *
  * becomes, when an MV grouped by (k1, k2, …) with partials (sum_x, cnt) is
  * registered for `base`:
  *
  * {{{
  *   SELECT f(k1), sum(sum_x), sum(cnt) FROM mv WHERE p(k2) GROUP BY f(k1)
  * }}}
  *
  * At 100 TB this is the difference between scanning the corpus and scanning
  * a keys-cardinality summary: the rewritten plan never touches the base
  * files (spec-pinned via scan-path assertion), and the filter lands on the
  * MV scan where partition pruning applies.
  *
  * Soundness conditions (all checked, any failure leaves the plan alone):
  *  - every filter and grouping expression references only MV key columns
  *    (arbitrary expressions OVER keys are fine — the MV stores keys at
  *    full granularity, so `date_format(k, …)` re-evaluates identically);
  *  - every aggregate call is non-distinct, unfiltered, and one of
  *    sum/count/min/max over a single declared measure column (min/max over
  *    a key column also qualify — key granularity is preserved);
  *  - the child is a pure scan of the registered base (filters/pruning
  *    projects only — any derived column in between disqualifies).
  *
  * `count` rewrites to `sum(cnt)` wrapped in `coalesce(…, 0)` so a global
  * count over an empty base still returns 0, and re-summed partials are cast
  * back to the original aggregate's result type (decimal sums widen).
  *
  * Disabled with `spark.graft.rewriteRollup=false` (A/B equality spec).
  */
object RollupRewrite extends Rule[LogicalPlan] {

  private val confKey = "spark.graft.rewriteRollup"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString(confKey, "true") != "true") plan
    else plan.transform {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }

  /** Peel projects / filters off a base scan. Returns the filter conditions
    * (inlined to base-relation attributes), an inliner that rewrites any
    * expression over this subtree's output into one over the base relation's
    * attributes, and the leaf relation. Projects may alias deterministic
    * expressions — the optimizer's own PullOutGroupingExpressions batch
    * plants `Alias(date_format(k,…)) AS _groupingexpression` projects under
    * every expression-grouped Aggregate, so alias inlining is the common
    * case, not a corner. None when anything else sits in between.
    */
  private def unwrap(p: LogicalPlan)
      : Option[(Seq[Expression], Expression => Expression, LogicalRelation)] = p match {
    case Filter(c, child) if c.deterministic =>
      unwrap(child).map { case (conds, inline, lr) => (conds :+ inline(c), inline, lr) }
    case Project(projs, child) if projs.forall(ne =>
        ne.deterministic && (ne.isInstanceOf[AttributeReference] || ne.isInstanceOf[Alias])) =>
      unwrap(child).map { case (conds, inline, lr) =>
        val defs: Map[ExprId, Expression] = projs.collect {
          case al: Alias => al.exprId -> inline(al.child)
        }.toMap
        val newInline: Expression => Expression = e => inline(e.transformUp {
          case a: AttributeReference if defs.contains(a.exprId) => defs(a.exprId)
        })
        (conds, newInline, lr)
      }
    case lr: LogicalRelation => Some((Nil, identity[Expression], lr))
    case _ => None
  }

  private def rootPaths(lr: LogicalRelation): Seq[String] = lr.relation match {
    case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toUri.getPath)
    case _ => Nil
  }

  private def tryRewrite(agg: Aggregate): Option[Aggregate] = {
    val unwrapped = unwrap(agg.child)
    for {
      (conds, inline, lr) <- unwrapped
      entry <- MvCatalog.lookup(rootPaths(lr))
      keyAttrs = lr.output.filter(a => entry.keys(a.name))
      keyIds = AttributeSet(keyAttrs)
      grouping = agg.groupingExpressions.map(inline)
      aggsOpt = agg.aggregateExpressions.map(ne => inline(ne) match {
        case n: NamedExpression => Some(n)
        case _ => None // an output column that IS a project-level alias: bail
      })
      if aggsOpt.forall(_.isDefined)
      aggs = aggsOpt.flatten
      // filters and grouping expressions must touch key columns only
      if conds.forall(_.references.subsetOf(keyIds))
      if grouping.forall(_.references.subsetOf(keyIds))
      if aggs.forall(ne =>
        ne.collect { case ae: AggregateExpression => ae }.forall(rewritable(_, entry)))
      mvPlan = entry.mvPlan()
      mvByName = mvPlan.output.map(a => a.name -> a).toMap
      // every referenced MV column must exist in the MV schema
      if keyAttrs.forall(a => mvByName.contains(a.name))
      if neededMvCols(aggs, entry).forall(mvByName.contains)
    } yield {
      val keyMap: Map[ExprId, Attribute] =
        keyAttrs.map(a => a.exprId -> mvByName(a.name)).toMap
      def replaceKeys(e: Expression): Expression = e.transformUp {
        case a: AttributeReference if keyMap.contains(a.exprId) => keyMap(a.exprId)
      }
      val newChild = conds.map(replaceKeys).reduceOption(And)
        .map(Filter(_, mvPlan)).getOrElse(mvPlan)
      val newGrouping = grouping.map(replaceKeys)
      val newAggs = aggs.map {
        // a bare grouping attribute in the output keeps its expression id so
        // downstream sorts/projections stay resolved
        case a: AttributeReference if keyMap.contains(a.exprId) =>
          Alias(keyMap(a.exprId), a.name)(exprId = a.exprId)
        case ne => ne.transformUp {
          case ae: AggregateExpression => rewriteAgg(ae, entry, mvByName)
          case a: AttributeReference if keyMap.contains(a.exprId) => keyMap(a.exprId)
        }.asInstanceOf[NamedExpression]
      }
      Aggregate(newGrouping, newAggs, newChild)
    }
  }

  private def isCountRows(c: Count): Boolean =
    c.children.forall(ch => ch.foldable && ch.eval() != null)

  /** Can this aggregate call be answered from the MV's partials? */
  private def rewritable(ae: AggregateExpression, entry: MvEntry): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
      case Sum(a: AttributeReference, _) => entry.measures.sums.contains(a.name)
      case c: Count if isCountRows(c) => entry.measures.rowCount.isDefined
      case Count(Seq(a: AttributeReference)) => entry.measures.cnts.contains(a.name)
      case Min(a: AttributeReference) =>
        entry.measures.mins.contains(a.name) || entry.keys(a.name)
      case Max(a: AttributeReference) =>
        entry.measures.maxs.contains(a.name) || entry.keys(a.name)
      case _ => false
    })

  /** MV column names the rewritten aggregates will reference. */
  private def neededMvCols(aggs: Seq[NamedExpression], entry: MvEntry): Seq[String] =
    aggs.flatMap(_.collect {
      case ae: AggregateExpression => ae.aggregateFunction match {
        case Sum(a: AttributeReference, _) => entry.measures.sums.get(a.name)
        case c: Count if isCountRows(c) => entry.measures.rowCount
        case Count(Seq(a: AttributeReference)) => entry.measures.cnts.get(a.name)
        case Min(a: AttributeReference) =>
          entry.measures.mins.get(a.name).orElse(if (entry.keys(a.name)) Some(a.name) else None)
        case Max(a: AttributeReference) =>
          entry.measures.maxs.get(a.name).orElse(if (entry.keys(a.name)) Some(a.name) else None)
        case _ => None
      }
    }.flatten)

  private def rewriteAgg(ae: AggregateExpression, entry: MvEntry,
      mv: Map[String, Attribute]): Expression = {
    val m = entry.measures
    def resum(col: String): Expression = {
      val re = ae.copy(aggregateFunction = Sum(mv(col)))
      if (re.dataType == ae.dataType) re else Cast(re, ae.dataType)
    }
    ae.aggregateFunction match {
      case Sum(a: AttributeReference, _) => resum(m.sums(a.name))
      case c: Count if isCountRows(c) =>
        Coalesce(Seq(resum(m.rowCount.get), Literal(0L)))
      case Count(Seq(a: AttributeReference)) =>
        Coalesce(Seq(resum(m.cnts(a.name)), Literal(0L)))
      case Min(a: AttributeReference) =>
        ae.copy(aggregateFunction = Min(mv(m.mins.getOrElse(a.name, a.name))))
      case Max(a: AttributeReference) =>
        ae.copy(aggregateFunction = Max(mv(m.maxs.getOrElse(a.name, a.name))))
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
  }
}

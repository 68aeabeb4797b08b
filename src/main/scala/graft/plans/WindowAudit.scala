package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{Filter, GlobalLimit, LocalLimit, LogicalPlan, Project, Sort, Window}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Plan audit for the r15 defect class: a `Window` with an EMPTY partition
  * spec moves its entire input to ONE partition (Spark logs "No Partition
  * Defined for Window operation"), which is a stall — or an executor OOM —
  * the moment the input is corpus-sized instead of K-bounded.
  *
  * The engine keeps such windows only where the input is provably bounded,
  * and the audit recognizes the two legitimate shapes:
  *
  *  1. STRUCTURALLY bounded — the window's input chain bottoms out in a
  *     `Limit`, so at most k rows reach the single partition. This is the
  *     [[graft.ops.TopK.rankedCut]] / post-[[graft.scale.Curation.cutVocab]]
  *     rank idiom and needs no per-site registration: the proof is in the
  *     plan itself.
  *  2. An explicit ORDER-BY-signature allowlist for the handful of sites
  *     whose bound is semantic, not structural — the ~log N Heaps-curve
  *     buckets, the Pareto staircase's bucket summary and pruned frontier,
  *     day-grained calendar frames.
  *
  * Everything corpus-shaped must rank through `rankedCut` / `denseRankBy`
  * instead. [[WindowGuard]] is a [[QueryExecutionListener]] that audits
  * every execution on a session — the test harness installs it on the
  * shared session, so ANY executed query (old or new) that sneaks in an
  * unbounded global window fails the suite instead of hiding behind
  * WindowExec log noise.
  */
object WindowAudit {

  /** Stable signature of a window: its expression aliases plus the ORDER
    * BY rendered to SQL (expression ids don't appear in `.sql`), e.g.
    * `rnk OVER (__cnt DESC NULLS LAST, __w ASC NULLS FIRST)`. Aliases let
    * an allowlist recognize a bounded site whose order columns are
    * caller-chosen (the Skyline staircase windows).
    */
  def signature(w: Window): String =
    s"${w.windowExpressions.map(_.name).mkString(",")} OVER " +
      s"(${w.orderSpec.map(_.sql).mkString(", ")})"

  /** The window input is structurally K-bounded: a Limit below (through
    * row-preserving/row-reducing shapes) caps the rows reaching the single
    * partition.
    */
  private def boundedInput(plan: LogicalPlan): Boolean = plan match {
    case _: GlobalLimit | _: LocalLimit => true
    case p: Project => boundedInput(p.child)
    case f: Filter => boundedInput(f.child)
    case s: Sort => boundedInput(s.child)
    case w: Window => boundedInput(w.child)
    case _ => false
  }

  /** ORDER-BY signatures of every Window that is unpartitioned AND not
    * structurally bounded, subqueries included.
    */
  def unbounded(plan: LogicalPlan): Seq[String] =
    plan.collectWithSubqueries {
      case w: Window if w.partitionSpec.isEmpty && !boundedInput(w.child) =>
        signature(w)
    }
}

/** Session-wide fence: records the signature of every executed
  * unpartitioned, un-bounded window that is NOT in `allowed`. Assert
  * [[violations]] empty at suite boundaries. Auditing the OPTIMIZED plan
  * keeps it honest: a naked window the optimizer rewrites away
  * (RankOneWindowToAggregate, the TopK rules) never executes
  * single-partition and does not trip it.
  */
final class WindowGuard(allowed: String => Boolean) extends QueryExecutionListener {
  private val seen =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def violations: Set[String] = {
    import scala.jdk.CollectionConverters._
    seen.keySet.asScala.toSet
  }

  /** One offending optimized plan per signature — failure forensics. */
  def examples: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    seen.asScala.toMap
  }

  private def audit(qe: QueryExecution): Unit =
    try WindowAudit.unbounded(qe.optimizedPlan).filterNot(allowed)
      .foreach(sig => seen.putIfAbsent(sig,
        qe.optimizedPlan.toString.take(4000)))
    catch { case scala.util.control.NonFatal(_) => () }

  override def onSuccess(funcName: String, qe: QueryExecution,
                         durationNs: Long): Unit = audit(qe)
  override def onFailure(funcName: String, qe: QueryExecution,
                         exception: Exception): Unit = audit(qe)
}

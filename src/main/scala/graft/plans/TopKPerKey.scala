package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.SQLMetrics

import scala.jdk.CollectionConverters._

/** Logical "top k rows per key" operator — the missing primitive between
  * `LIMIT` (global, TakeOrderedAndProjectExec) and the rank-window idiom
  * (shuffles everything, then sorts every partition).
  *
  * Planned by [[TopKPerKeyStrategy]] as two [[TopKPerKeyExec]] passes with a
  * hash exchange between them (inserted by EnsureRequirements): the partial
  * pass runs on each input partition BEFORE the shuffle, so at most
  * k × distinct-keys-per-mapper rows ever reach the wire — on 100 TB with
  * k=5 that is the difference between shuffling the corpus and shuffling a
  * candidate list. Neither pass sorts: each keeps a bounded heap per key
  * (O(rows·log k) comparisons, O(keys·k) memory), where Spark's own
  * InferWindowGroupLimit still sorts every partition twice.
  */
case class TopKPerKey(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"topKPerKey needs k >= 1, got $k")
  require(keys.nonEmpty, "topKPerKey needs grouping keys; use ORDER BY ... LIMIT for global top-k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Planner strategy: partial heaps per mapper, exchange on the keys, final
  * heap merge. Registered via `injectPlannerStrategy` in GraftExtensions.
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, keys, order, child) =>
      val partial = TopKPerKeyExec(k, keys, order, partial = true, planLater(child))
      TopKPerKeyExec(k, keys, order, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** One bounded-heap pass. `partial = true` accepts any input distribution
  * (runs map-side); the final pass demands clustering on the keys, which
  * EnsureRequirements satisfies with a hash exchange over the (already
  * k-bounded) candidates.
  *
  * Per-key heaps hold the best k rows seen, worst at the head, so a row is
  * copied only when it beats the current worst. Memory is
  * O(distinct keys in partition × k rows) — the operator's contract, same
  * shape as a hash aggregation over the same keys.
  */
case class TopKPerKeyExec(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val kLocal = k
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = GenerateOrdering.generate(sortOrder, childOutput)
      val worstFirst: java.util.Comparator[InternalRow] = ordering.reverse
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kLocal) {
          heap.offer(row.copy())
        } else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.offer(row.copy())
        }
      }
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala).map { r =>
        numOutputRows += 1
        r
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

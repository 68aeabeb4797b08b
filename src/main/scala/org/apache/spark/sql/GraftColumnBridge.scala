package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-package-private Column<->Expression converters — the
  * standard pattern for libraries shipping native Catalyst expressions
  * (Spark 4 moved these behind `private[sql]` in
  * org.apache.spark.sql.classic.ExpressionUtils).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a custom logical plan (e.g. graft.plans.TopKPerKey) as a
    * DataFrame — `Dataset.ofRows` is `private[sql]` in Spark 4.
    */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** `localCheckpoint()` that DROPS the origin plan's estimated stats.
    *
    * Spark 4's local checkpoint freezes the optimized plan's ESTIMATED
    * `sizeInBytes` into the resulting `LogicalRDD` as origin stats. In an
    * iterative loop whose round output is a join product (worse, a
    * crossJoin with broadcast aggregates), the frozen estimate compounds a
    * constant factor per round — hundreds of bits after a few dozen
    * rounds, and eventually JoinSelection burns minutes multiplying
    * BigInts (the kCore stats-compounding trap; see GraphSpec's flat-stats
    * laws). Rebuilding the `LogicalRDD` with `originStats = None` resets
    * the estimate to `spark.sql.defaultSizeInBytes` — zero data copied,
    * the materialized RDD, partitioning, and ordering are reused verbatim.
    * The reset side is then treated as too big to broadcast, which is the
    * right default for a frame that loops at graph scale.
    */
  def checkpointFreshStats(df: DataFrame): DataFrame =
    checkpointFreshStats(df, reliable = false)

  /** As above, with `reliable = true` routing through `Dataset.checkpoint()`
    * (durable files under the SparkContext checkpoint dir) instead of
    * executor-memory blocks — the [[graft.scale.CheckpointPolicy.Reliable]]
    * backing. Same stats reset either way.
    */
  def checkpointFreshStats(df: DataFrame, reliable: Boolean): DataFrame = {
    val cp = if (reliable) df.checkpoint() else df.localCheckpoint()
    cp.queryExecution.analyzed match {
      case lr: execution.LogicalRDD =>
        val spark = cp.sparkSession.asInstanceOf[classic.SparkSession]
        classic.Dataset.ofRows(spark,
          execution.LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
            lr.outputOrdering, lr.isStreaming, lr.stream)(spark, None, None))
      case _ => cp
    }
  }
}

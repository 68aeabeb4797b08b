package graft.scale

import org.apache.spark.sql.DataFrame

/** How an iterative operator truncates lineage between rounds.
  *
  * Every multi-round loop in this engine (PageRank and friends, k-core
  * peeling, label propagation, HITS, NN-descent, suffix-array prefix
  * doubling) must checkpoint its looping relation once per round — without
  * it the logical plan doubles per iteration and analysis hangs. The
  * QUESTION is where the truncated lineage lives:
  *
  *  - [[CheckpointPolicy.Local]] (default): `localCheckpoint()` — blocks
  *    in executor memory/disk. Fast (no distributed filesystem round
  *    trip), but the blocks are unrecoverable: ONE lost executor kills a
  *    multi-hour 100 TB job at whatever round it had reached.
  *  - [[CheckpointPolicy.Reliable]]: `Dataset.checkpoint()` into a
  *    durable directory (HDFS/object store in production). An executor
  *    loss recomputes the lost partitions from the checkpoint files and
  *    the job finishes. Costs one write+read of the looping relation per
  *    round — the standard price of a finishable iterative job, paid by
  *    every production PageRank since Pregel.
  *
  * Both modes preserve partition placement (they checkpoint the
  * materialized RDD, not a re-shuffle), which the distributed dense rank
  * relies on, and both produce bit-identical results — the reliable mode
  * only changes where recovery reads from (CheckpointPolicySpec pins the
  * equality and the survive-block-loss law).
  */
sealed trait CheckpointPolicy {
  /** Truncate lineage, keeping whatever plan statistics the checkpoint
    * naturally carries.
    */
  private[graft] def checkpoint(df: DataFrame): DataFrame

  /** Truncate lineage AND drop the frozen size estimate — for round
    * outputs whose estimated stats compound across iterations (the
    * pageRankDirected/kCore stats trap; see GraftColumnBridge).
    */
  private[graft] def checkpointFresh(df: DataFrame): DataFrame

  /** A per-round durability cut for loops whose LOCAL form deliberately
    * stays lazy (linear plan growth composes into one job — pageRank,
    * HITS, Bellman–Ford): identity under [[CheckpointPolicy.Local]] (the
    * historical plan, unchanged), a real checkpoint under
    * [[CheckpointPolicy.Reliable]] so recovery after executor loss replays
    * at most one round instead of the whole loop.
    */
  private[graft] def bound(df: DataFrame): DataFrame
}

object CheckpointPolicy {

  /** Executor-memory lineage truncation — today's default everywhere. */
  case object Local extends CheckpointPolicy {
    private[graft] def checkpoint(df: DataFrame): DataFrame = df.localCheckpoint()
    private[graft] def checkpointFresh(df: DataFrame): DataFrame =
      org.apache.spark.sql.GraftColumnBridge.checkpointFreshStats(df)
    private[graft] def bound(df: DataFrame): DataFrame = df
  }

  /** Durable round snapshots under `dir` — survives executor loss.
    *
    * Retention: each round leaves one snapshot directory; superseded
    * rounds are garbage once the next round's checkpoint materializes.
    * Spark reclaims them automatically when
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (the RDDs go
    * out of scope as the loop variable rebinds); otherwise sweep `dir`
    * after the job — either way the LIVE footprint is O(one round), not
    * O(rounds).
    */
  final case class Reliable(dir: String) extends CheckpointPolicy {
    private def prepared(df: DataFrame): DataFrame = {
      df.sparkSession.sparkContext.setCheckpointDir(dir)
      df
    }
    private[graft] def checkpoint(df: DataFrame): DataFrame =
      prepared(df).checkpoint()
    private[graft] def checkpointFresh(df: DataFrame): DataFrame =
      org.apache.spark.sql.GraftColumnBridge.checkpointFreshStats(
        prepared(df), reliable = true)
    private[graft] def bound(df: DataFrame): DataFrame = checkpoint(df)
  }
}

package graft.write

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared LSM tombstone-set protocol used by every persistent index
  * with takedown deletes ([[graft.streaming.PhashIndex]],
  * [[graft.streaming.VideoPhashIndex]], [[graft.streaming.NearDupIndex]],
  * [[graft.streaming.PostingsIndex]],
  * [[graft.scale.NnDescent.NavIndex]]): a [[VersionedTable]] of one long
  * id column.
  *
  *  - [[add]]: O(delete-batch) dedup append — the primary tables are never
  *    touched or versioned by a delete. Unknown ids are legal no-ops;
  *    re-deletes are idempotent (version-pinned by the anti-join).
  *  - [[minus]]: serve-side anti-join; the tombstone side is
  *    delete-batch-sized, so AQE broadcasts it — no shuffle lands on the
  *    primary.
  *  - [[purgeInto]]: the physical compaction — rewrite each primary minus
  *    the dead ids (each promote carries its table's current batch stamp so
  *    replay protection survives), THEN truncate the set. A crash between
  *    the promotes leaves stale tombstones over already-purged rows — the
  *    anti-joins match nothing and the next purge clears them (convergent,
  *    the [[graft.scale.AnnIndex]] argument).
  *  - [[remove]]: the un-delete clear (re-admission of a tombstoned id must
  *    drop the tombstone BEFORE the primary promote — see
  *    NnDescent.NavIndex.append for the ordering argument).
  *
  * Extracted because five hand-rolled copies had already drifted in their
  * purge promote counts and chain-compaction routing.
  */
final class TombstoneSet(spark: SparkSession, root: String, idCol: String,
                         maxChainDepth: Int = 16) {

  /** The backing versioned table — exposed so specs can pin version/replay
    * laws directly.
    */
  val table = new VersionedTable(spark, root)

  def exists: Boolean = table.exists

  /** O(batch) dedup append of deleted ids; `srcCol` (any numeric/castable
    * column) is normalized to a long `idCol`.
    */
  def add(deletedIds: DataFrame, srcCol: String): Unit = {
    val ids = deletedIds.select(col(srcCol).cast("long").as(idCol)).distinct()
    if (table.exists) {
      val fresh = ids.join(table.read(), Seq(idCol), "left_anti")
        .localCheckpoint()
      if (!fresh.isEmpty) {
        table.promote(table.stageAppend(fresh))
        table.compactIfNeeded(maxChainDepth)
      }
    } else table.promote(table.stage(ids))
  }

  /** `df` minus tombstoned ids (no-op while the set is absent). */
  def minus(df: DataFrame): DataFrame =
    if (table.exists) df.join(table.read(), Seq(idCol), "left_anti")
    else df

  /** The current dead-id relation, checkpointed, when any ids pend. */
  def dead(): Option[DataFrame] =
    if (table.exists) {
      val d = table.read().localCheckpoint()
      if (d.isEmpty) None else Some(d)
    } else None

  /** Clear the given ids from the set (the un-delete path); a no-op when
    * nothing matches. Callers must invoke this BEFORE promoting the
    * re-admitted rows into a primary table.
    */
  def remove(ids: DataFrame): Unit =
    if (table.exists) {
      val tt = table.read().localCheckpoint()
      val cleared = tt.join(ids.select(col(idCol)), Seq(idCol), "left_anti")
        .localCheckpoint()
      if (cleared.count() != tt.count())
        table.promote(table.stage(cleared))
    }

  /** Truncate the set to empty (after a physical purge). */
  def truncate(): Unit =
    if (table.exists)
      table.promote(table.stage(table.read().limit(0)))

  /** The full purge protocol: if ids pend, rewrite each primary table as
    * itself anti-join the dead set — `reshape` runs on the purged relation
    * (e.g. a term re-sort so row-group envelopes survive) — carrying the
    * table's current stamp, then truncate the set; with nothing pending,
    * plain-compact each primary instead (the rewrite is being paid anyway,
    * so the append chain collapses too).
    */
  def purge(primaries: VersionedTable*): Unit =
    purgeInto(primaries.map(t => (t, identity[DataFrame] _)): _*)

  /** [[purge]] with a per-table reshape hook on the purged relation. */
  def purgeInto(primaries: (VersionedTable, DataFrame => DataFrame)*): Unit =
    dead() match {
      case Some(d) =>
        primaries.foreach { case (t, reshape) =>
          t.promote(
            t.stage(reshape(t.read().join(d, Seq(idCol), "left_anti"))),
            t.currentTag)
        }
        table.promote(table.stage(d.limit(0)))
      case None =>
        primaries.foreach { case (t, _) => t.compact() }
    }
}

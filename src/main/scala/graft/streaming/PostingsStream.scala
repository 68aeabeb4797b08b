package graft.streaming

import graft.scale.Retrieval
import graft.write.VersionedTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming inverted-index maintenance — the lexical complement of
  * [[AnnStream]]: a document crawl drained into a persistent postings table
  * ([[graft.scale.Retrieval.invertedIndex]] shape: term, doc_id, tf) that
  * BM25 / champion-list serving reads directly. `build` swaps the postings
  * shape — the default is the tf index; pass
  * [[graft.scale.Retrieval.positionalIndex]] for phrase-serving postings
  * (any shape keyed by `doc_id` with a `term` column shares the whole
  * protocol, deletes included).
  *
  * Per micro-batch: tokenize and count ONLY the batch (one token-keyed
  * shuffle over batch text — per-batch cost O(batch), never the corpus) and
  * append the batch's postings as an APPEND version
  * ([[graft.write.VersionedTable.stageAppend]] — old files inherited by
  * reference, O(batch) bytes written). A crawl's doc_ids are new, so batch
  * postings can never collide with stored (term, doc_id) rows and the
  * merged read is exactly the batch-built index — no keyed merge needed.
  * What append semantics can't absorb is a foreachBatch REDELIVERY (same
  * rows twice), so each promote stamps the micro-batch id in the manifest
  * and a replayed batch skips — the [[NearDupIndex]] exactly-once protocol.
  *
  * Batch files are sorted by term before the write so each parquet file
  * carries a tight term min/max envelope — a single-term serving scan
  * row-group-prunes instead of reading the whole index. Periodic
  * [[compact]] collapses the append chain (q111's protocol);
  * [[Retrieval.topPostings]] over `served()` yields champion lists
  * identical to a batch build (q126, PostingsStreamSpec).
  *
  * Takedown deletes follow the [[graft.scale.AnnIndex]] LSM protocol
  * (q205/q212): [[delete]] appends the batch's doc ids to a sidecar
  * tombstone table — O(batch), the postings are NOT touched or even
  * versioned — and [[served]] anti-joins them out, so a deleted document
  * stops appearing in BM25/champion/phrase answers immediately.
  * [[compact]] physically purges the dead rows and truncates the tombstone
  * set. One asymmetry vs the ANN index: growth here is APPEND (new crawl
  * ids), not keyed upsert, so re-admitting a tombstoned id by append would
  * resurrect its still-present old rows as duplicates. A tombstoned id is
  * therefore REJECTED at ingest while its tombstone lives (delete stays
  * delete); after a compaction has physically purged it, a re-crawl
  * re-admits it cleanly — erase, then optionally re-ingest.
  */
final class PostingsIndex(spark: SparkSession, root: String,
                          maxChainDepth: Int = 16,
                          build: DataFrame => DataFrame =
                            Retrieval.invertedIndex(_, "doc_id", "text")) {

  val postings = new VersionedTable(spark, s"$root/postings")
  private val ts =
    new graft.write.TombstoneSet(spark, s"$root/tombstones", "doc_id",
      maxChainDepth)
  val tombstones: VersionedTable = ts.table

  /** Index one micro-batch of (doc_id, text). Callable directly so specs
    * drive controlled batch boundaries.
    */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    val tag = s"batch=$batchId"
    if (postings.exists && postings.currentTag.contains(tag)) return
    val incoming = batch.select(col("doc_id"), col("text"))
      .filter(col("text").isNotNull)
    // a tombstoned id stays deleted while its tombstone lives: admitting it
    // would append NEW rows next to its not-yet-purged old rows (see class
    // scaladoc — the append-growth/upsert-growth asymmetry)
    val live = ts.minus(incoming)
    val p = build(live).sortWithinPartitions("term")
    if (postings.exists) postings.promote(postings.stageAppend(p), Some(tag))
    else postings.promote(postings.stage(p), Some(tag))
    // chain-depth policy: bounded read cost for a continuous drain
    // (amortized rewrite — see VersionedTable.compactIfNeeded); routed
    // through the purge-aware compaction so pending tombstones clear too
    if (postings.chainDepth > maxChainDepth) compact()
  }

  /** Delete a batch of doc ids: O(batch) tombstone append, no postings
    * rewrite. Unknown ids are legal no-ops; re-deletes are idempotent.
    */
  def delete(deletedIds: DataFrame, idCol: String = "doc_id"): Unit =
    ts.add(deletedIds, idCol)

  /** The postings a query may serve from: the stored table minus tombstoned
    * docs. The tombstone side is delete-batch-sized, so AQE broadcasts the
    * anti-join — no shuffle lands on the postings.
    */
  def served(): DataFrame = ts.minus(postings.read())

  /** Collapse the append chain into one self-contained version; if
    * tombstones are pending, the rewrite drops the dead rows and a second
    * promote truncates the set (a crash between the two leaves stale
    * tombstones over purged rows — the anti-join matches nothing, the next
    * compaction clears them: convergent, the [[graft.scale.AnnIndex]]
    * argument). Rows re-sort by term so the row-group envelopes survive.
    */
  def compact(): Unit =
    ts.purgeInto(postings -> ((df: DataFrame) => df.sortWithinPartitions("term")))
}

object PostingsStream {

  /** [[PostingsIndex.processBatch]] as a streaming sink: drain a document
    * stream into the index; `index.served()` is the postings table a query
    * may read.
    */
  def postingsSink(docs: DataFrame, index: PostingsIndex,
                   checkpoint: String): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        index.processBatch(batch, batchId)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}

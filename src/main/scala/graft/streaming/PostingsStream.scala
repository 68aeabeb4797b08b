package graft.streaming

import graft.scale.Retrieval
import graft.write.VersionedTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming inverted-index maintenance — the lexical complement of
  * [[AnnStream]]: a document crawl drained into a persistent postings table
  * ([[graft.scale.Retrieval.invertedIndex]] shape: term, doc_id, tf) that
  * BM25 / champion-list serving reads directly.
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
  * [[graft.write.VersionedTable.compact]] collapses the append chain
  * (q111's protocol); [[Retrieval.topPostings]] over `read()` yields
  * champion lists identical to a batch build (q126, PostingsStreamSpec).
  */
final class PostingsIndex(spark: SparkSession, root: String,
                          maxChainDepth: Int = 16) {

  val postings = new VersionedTable(spark, s"$root/postings")

  /** Index one micro-batch of (doc_id, text). Callable directly so specs
    * drive controlled batch boundaries.
    */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    val tag = s"batch=$batchId"
    if (postings.exists && postings.currentTag.contains(tag)) return
    val p = Retrieval.invertedIndex(batch.select(col("doc_id"), col("text"))
        .filter(col("text").isNotNull))
      .sortWithinPartitions("term")
    if (postings.exists) postings.promote(postings.stageAppend(p), Some(tag))
    else postings.promote(postings.stage(p), Some(tag))
    // chain-depth policy: bounded read cost for a continuous drain
    // (amortized rewrite — see VersionedTable.compactIfNeeded)
    postings.compactIfNeeded(maxChainDepth)
  }
}

object PostingsStream {

  /** [[PostingsIndex.processBatch]] as a streaming sink: drain a document
    * stream into the index; `index.postings.read()` is the served postings
    * table.
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

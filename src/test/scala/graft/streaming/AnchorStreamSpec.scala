package graft.streaming

import graft.SparkSpec
import graft.scale.Curation
import org.apache.spark.sql.functions._

/** Cross-batch laws for the streaming anchor-text index: additive-monoid
  * split invariance, redelivery exactly-once, compaction invariance.
  * Batch boundaries are driven directly through
  * [[AnchorCountIndex.processBatch]], the [[PostingsStreamSpec]] convention.
  */
class AnchorStreamSpec extends SparkSpec {
  import spark.implicits._

  private def root(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-anchor-$tag").toString + "/a"

  private val docs = (0L until 12L).map(i => (i, s"alpha beta w$i gamma delta epsilon zeta"))

  private def servedSet(idx: AnchorCountIndex) =
    idx.served().as[(String, String, Long)].collect().toSet

  test("any batch split serves the batch-build counts exactly") {
    val whole = Curation.anchorTermCounts(docs.toDF("doc_id", "text"))
      .as[(String, String, Long)].collect().toSet
    assert(whole.nonEmpty)
    val idx = new AnchorCountIndex(spark, root("split"))
    docs.grouped(5).zipWithIndex.foreach { case (b, i) =>
      idx.processBatch(b.toDF("doc_id", "text"), i.toLong)
    }
    assert(servedSet(idx) === whole)
  }

  test("foreachBatch redelivery never double-counts (stamped batch ids)") {
    val idx = new AnchorCountIndex(spark, root("replay"))
    idx.processBatch(docs.take(6).toDF("doc_id", "text"), 0L)
    idx.processBatch(docs.drop(6).toDF("doc_id", "text"), 1L)
    val before = servedSet(idx)
    idx.processBatch(docs.drop(6).toDF("doc_id", "text"), 1L) // redelivered
    assert(servedSet(idx) === before)
  }

  test("compaction collapses to one row per key, serving invariant, depth bounded") {
    val idx = new AnchorCountIndex(spark, root("compact"), maxChainDepth = 2)
    docs.grouped(2).zipWithIndex.foreach { case (b, i) =>
      idx.processBatch(b.toDF("doc_id", "text"), i.toLong)
      assert(idx.counts.chainDepth <= 2)
    }
    val before = servedSet(idx)
    idx.compact()
    assert(servedSet(idx) === before)
    // stored relation is fully collapsed: stored == served
    assert(idx.counts.read().as[(String, String, Long)].collect().toSet === before)
    // the latest stamp survived compaction: a replay is still a no-op
    idx.processBatch(docs.take(2).toDF("doc_id", "text"), 5L)
    assert(servedSet(idx) === before)
  }
}

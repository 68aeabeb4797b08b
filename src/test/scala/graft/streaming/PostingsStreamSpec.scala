package graft.streaming

import graft.SparkSpec
import graft.scale.Retrieval
import org.apache.spark.sql.functions._

/** Cross-batch laws for the streaming postings index. Batch boundaries are
  * driven directly through [[PostingsIndex.processBatch]] (the foreachBatch
  * body), the [[StreamingNearDupSpec]] convention.
  */
class PostingsStreamSpec extends SparkSpec {
  import spark.implicits._

  private def root(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-lex-$tag").toString + "/lex"

  private val b1 = Seq(
    (1L, "spark merge spark"), (2L, "merge dup"), (3L, "spark"))
  private val b2 = Seq(
    (10L, "dup dup dup"), (11L, "merge spark merge"))

  private def postings(rows: Seq[(Long, String)]) =
    Retrieval.invertedIndex(rows.toDF("doc_id", "text"))
      .select("term", "doc_id", "tf").as[(String, Long, Long)].collect().toSet

  test("multi-batch drain equals the batch build over the union") {
    val idx = new PostingsIndex(spark, root("grow"))
    idx.processBatch(b1.toDF("doc_id", "text"), 0L)
    idx.processBatch(b2.toDF("doc_id", "text"), 1L)
    val drained = idx.postings.read()
      .select("term", "doc_id", "tf").as[(String, Long, Long)].collect().toSet
    assert(drained === postings(b1 ++ b2))
  }

  test("auto-compaction policy: a long drain keeps chain depth bounded, content exact") {
    val idx = new PostingsIndex(spark, root("policy"), maxChainDepth = 3)
    val all = (0 until 12).map { b =>
      Seq((100L * b, s"spark batch$b"), (100L * b + 1, "merge spark"))
    }
    all.zipWithIndex.foreach { case (rows, b) =>
      idx.processBatch(rows.toDF("doc_id", "text"), b.toLong)
      // the sink-level policy law: a reader never pays more than
      // maxChainDepth union legs no matter how long the drain runs
      assert(idx.postings.chainDepth <= 3,
        s"batch $b left chain depth ${idx.postings.chainDepth}")
    }
    val drained = idx.postings.read()
      .select("term", "doc_id", "tf").as[(String, Long, Long)].collect().toSet
    assert(drained === postings(all.flatten))
    // the latest stamp survived every compaction: a replay is still a no-op
    idx.processBatch(all.last.toDF("doc_id", "text"), 11L)
    assert(idx.postings.read().count() === drained.size)
  }

  test("a redelivered batch is a no-op (batch-stamped promote)") {
    val idx = new PostingsIndex(spark, root("replay"))
    idx.processBatch(b1.toDF("doc_id", "text"), 0L)
    idx.processBatch(b2.toDF("doc_id", "text"), 1L)
    val before = idx.postings.currentVersion
    idx.processBatch(b2.toDF("doc_id", "text"), 1L) // redelivery
    assert(idx.postings.currentVersion === before)
    val drained = idx.postings.read()
      .select("term", "doc_id", "tf").as[(String, Long, Long)].collect().toSet
    assert(drained === postings(b1 ++ b2))
  }

  test("appends write O(batch): version bytes are the batch postings, not the corpus") {
    val idx = new PostingsIndex(spark, root("obatch"))
    idx.processBatch(b1.toDF("doc_id", "text"), 0L)
    val v0 = idx.postings.currentVersion.get
    idx.processBatch(b2.toDF("doc_id", "text"), 1L)
    val v1 = idx.postings.currentVersion.get
    assert(v1 > v0)
    // the append version resolves to the old files PLUS the batch's rows:
    // reading version v1 minus version v0 is exactly batch 2's postings
    val before = idx.postings.readVersion(v0)
      .select("term", "doc_id", "tf").as[(String, Long, Long)].collect().toSet
    val after = idx.postings.readVersion(v1)
      .select("term", "doc_id", "tf").as[(String, Long, Long)].collect().toSet
    assert(after -- before === postings(b2))
    assert(before === postings(b1))
  }

  test("champion lists over the drained index equal the batch q120 form; compaction preserves them") {
    val idx = new PostingsIndex(spark, root("serve"))
    idx.processBatch(b1.toDF("doc_id", "text"), 0L)
    idx.processBatch(b2.toDF("doc_id", "text"), 1L)
    def champions = Retrieval.topPostings(idx.postings.read(), k = 2)
      .select("term", "rnk", "doc_id", "tf")
      .as[(String, Long, Long, Long)].collect().toSet
    val batchForm = Retrieval.topPostings(
        Retrieval.invertedIndex((b1 ++ b2).toDF("doc_id", "text")), k = 2)
      .select("term", "rnk", "doc_id", "tf")
      .as[(String, Long, Long, Long)].collect().toSet
    val served = champions
    assert(served === batchForm)
    idx.postings.compact()
    assert(champions === batchForm)
  }
}

package graft.streaming

import graft.SparkSpec
import graft.scale.Retrieval
import org.apache.spark.sql.functions._

/** Laws of the field-tagged postings index and its serving-shaped BM25F:
  * parity with the batch scorer (weights applied at SERVE time), the LSM
  * delete lifecycle, batch-split invariance, and the one-term-pruned-scan
  * plan law — the [[PostingsStreamSpec]] conventions with a field
  * dimension.
  */
class FieldedPostingsSpec extends SparkSpec {
  import spark.implicits._

  private def root(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-flex-$tag").toString + "/flex"

  // (doc_id, body, title): 'zebra' reachable only through titles on %3
  // docs, 'merge' through bodies — the q285 shape at fixture size
  private val rows = (1L to 30L).map(i =>
    (i, s"merge doc$i " + ("pad " * (i % 5).toInt).trim,
      if (i % 3 == 0) "zebra guide" else "plain guide"))

  private def docsDf(rs: Seq[(Long, String, String)]) =
    rs.toDF("doc_id", "text", "title")

  private val weights = Seq("title" -> 3L, "text" -> 1L)
  private val terms = Seq("zebra", "merge")

  private def batchScores(rs: Seq[(Long, String, String)],
                          ws: Seq[(String, Long)]): Map[Long, (Long, Long, Long)] =
    Retrieval.bm25f(docsDf(rs), ws, terms)
      .filter(col("tf_zebra") > 0 || col("tf_merge") > 0)
      .select("doc_id", "tf_zebra", "tf_merge", "score")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  private def served(idx: FieldedPostingsIndex,
                     ws: Seq[(String, Long)]): Map[Long, (Long, Long, Long)] =
    idx.bm25fServe(ws, terms)
      .select("doc_id", "tf_zebra", "tf_merge", "score")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("bm25fServe equals the batch bm25f's candidate rows; weights are serve-time") {
    val idx = new FieldedPostingsIndex(spark, root("parity"), Seq("title", "text"))
    (0 until 3).foreach(b =>
      idx.processBatch(docsDf(rows.filter(_._1 % 3 == b)), b.toLong))
    assert(served(idx, weights) === batchScores(rows, weights))
    // a DIFFERENT weighting served from the SAME index matches ITS batch
    // twin — per-field tf storage is what buys this
    val heavy = Seq("title" -> 5L, "text" -> 2L)
    assert(served(idx, heavy) === batchScores(rows, heavy))
  }

  test("drain is batch-split-invariant and a redelivered batch is a no-op") {
    val one = new FieldedPostingsIndex(spark, root("one"), Seq("title", "text"))
    one.processBatch(docsDf(rows), 0L)
    val four = new FieldedPostingsIndex(spark, root("four"), Seq("title", "text"))
    (0 until 4).foreach(b =>
      four.processBatch(docsDf(rows.filter(_._1 % 4 == b)), b.toLong))
    assert(served(one, weights) === served(four, weights))
    val before = four.postings.currentVersion
    four.processBatch(docsDf(rows.filter(_._1 % 4 == 3)), 3L) // redelivery
    assert(four.postings.currentVersion === before)
  }

  test("delete leaves scores immediately; compaction purges and serves identically") {
    val idx = new FieldedPostingsIndex(spark, root("del"), Seq("title", "text"))
    idx.processBatch(docsDf(rows), 0L)
    val deleted = rows.filter(_._1 % 5 == 0).map(_._1)
    idx.delete(deleted.toDF("doc_id"))
    val want = batchScores(rows.filterNot(r => deleted.contains(r._1)), weights)
    assert(served(idx, weights) === want,
      "deleted docs must leave scores (idf/avg included) before any compaction")
    idx.compact()
    assert(served(idx, weights) === want)
    assert(idx.postings.read().filter(col("doc_id").isin(deleted: _*)).count() === 0L)
  }

  test("bm25fServe plan: one term-pruned postings scan, no full-index aggregate") {
    val idx = new FieldedPostingsIndex(spark, root("plan"), Seq("title", "text"))
    idx.processBatch(docsDf(rows), 0L)
    idx.compact()
    val plan = idx.bm25fServe(weights, terms).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters: [In(term"), plan)
    assert("/postings/".r.findAllIn(plan).size === 1, plan)
    // the weighted length comes from the sidecar joined on candidates —
    // never from re-aggregating the postings
    assert("/lengths/".r.findAllIn(plan).size === 1, plan)
  }
}

package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fault-tolerance laws of [[CheckpointPolicy]]: reliable mode
  * bit-equals local mode, and — the reason it exists — reliable round
  * state survives the loss of every executor-memory block, where local
  * mode's lineage-truncated blocks are unrecoverable by design.
  */
class CheckpointPolicySpec extends SparkSpec {
  import spark.implicits._

  private def relDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-ckpt-$tag").toString

  // an 18-node two-community graph, both-direction encoded
  private def edges = {
    val pairs = (0L until 9L).flatMap(i => Seq((i, (i + 1) % 9)))
      .++((9L until 18L).map(i => (i, 9L + (i - 9L + 1) % 9)))
      .:+((0L, 9L)) // one bridge
    (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
  }

  /** Drop the executor-memory blocks behind THIS frame's truncated
    * lineage (never other suites' blocks — the session is shared): the
    * closest local-mode analogue of losing the executor that held them.
    */
  private def evictOwnBlocks(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = true)
      case other => fail(s"expected a checkpointed LogicalRDD, got $other")
    }

  test("reliable mode bit-equals local mode across the graph loops") {
    val docs = Seq((1L, "a b a b c"), (2L, "a b a b a b"), (3L, "z q"))
      .toDF("doc_id", "text")
    val rel = CheckpointPolicy.Reliable(relDir("eq"))
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString)
    assert(sorted(Graph.pageRank(edges, 4, rel)) ===
      sorted(Graph.pageRank(edges, 4)))
    assert(sorted(Graph.pageRankDirected(edges, 4, rel)) ===
      sorted(Graph.pageRankDirected(edges, 4)))
    assert(sorted(Graph.kCore(edges, 3, 6, rel)) ===
      sorted(Graph.kCore(edges, 3, 6)))
    assert(sorted(Graph.labelPropagation(edges, 4, rel)) ===
      sorted(Graph.labelPropagation(edges, 4)))
    assert(sorted(Graph.hits(edges, 3, rel)) === sorted(Graph.hits(edges, 3)))
    assert(sorted(SuffixArray.suffixRanks(docs, 2, policy = rel)) ===
      sorted(SuffixArray.suffixRanks(docs, 2)))
  }

  test("reliable round state survives block loss; local mode cannot") {
    // local mode: evicting the final round's checkpoint blocks before the
    // collect makes the truncated lineage unrecoverable — the 100 TB
    // failure mode (a lost executor, hour 3 of 4)
    val local = Graph.pageRankDirected(edges, 5)
    evictOwnBlocks(local)
    intercept[Exception] { local.collect() }
    // reliable mode: same eviction, but every round snapshot lives in the
    // checkpoint dir — the collect recomputes from files and matches a
    // fresh undisturbed local run bit-for-bit
    val want = Graph.pageRankDirected(edges, 5).collect()
      .map(_.toSeq).sortBy(_.toString)
    val rel = Graph.pageRankDirected(edges, 5,
      CheckpointPolicy.Reliable(relDir("loss")))
    evictOwnBlocks(rel)
    assert(rel.collect().map(_.toSeq).sortBy(_.toString) === want)
  }

  test("reliable trainer state survives block loss; local mode cannot (KN bigram)") {
    val train = Seq((1L, "a b a b c a"), (2L, "b c b c d"), (3L, "a c a c"))
      .toDF("doc_id", "text")
    val score = Seq((10L, "a b c d"), (11L, "c a b"), (12L, "z"))
      .toDF("doc_id", "text")
    // capture exactly the persistent RDDs a call creates (suites run
    // sequentially in the forked test JVM, so the diff is ours alone)
    def withNewBlocks(body: => org.apache.spark.sql.DataFrame) = {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val df = body
      val added = spark.sparkContext.getPersistentRDDs
        .filter { case (id, _) => !before(id) }.values.toSeq
      (df, added)
    }
    // local mode: the trainer's internal count checkpoint is executor
    // blocks — evicting them makes the scored relation unrecoverable
    val (local, localBlocks) = withNewBlocks(KneserNey.knBigramScore(train, score))
    assert(localBlocks.nonEmpty, "local trainer created no checkpoint blocks")
    localBlocks.foreach(_.unpersist(blocking = true))
    intercept[Exception] { local.collect() }
    // reliable mode: same eviction, but the counts live in the checkpoint
    // dir — scoring recomputes from files, bit-equal to an undisturbed run
    val want = KneserNey.knBigramScore(train, score).collect()
      .map(_.toSeq).sortBy(_.toString)
    val (rel, relBlocks) = withNewBlocks(KneserNey.knBigramScore(train, score,
      policy = CheckpointPolicy.Reliable(relDir("kn"))))
    relBlocks.foreach(_.unpersist(blocking = true))
    assert(rel.collect().map(_.toSeq).sortBy(_.toString) === want)
    // and the trigram trainer's reliable form bit-equals local
    assert(KneserNey.knTrigramScore(train, score,
        policy = CheckpointPolicy.Reliable(relDir("kn3")))
      .collect().map(_.toSeq).sortBy(_.toString) ===
      KneserNey.knTrigramScore(train, score)
        .collect().map(_.toSeq).sortBy(_.toString))
    // tokenizer trainers: reliable word-count checkpoint bit-equals local
    assert(Bpe.bpeTokenCounts(train, policy = CheckpointPolicy.Reliable(relDir("bpe")))
      .collect().map(_.toSeq).toSeq ===
      Bpe.bpeTokenCounts(train).collect().map(_.toSeq).toSeq)
    assert(Wordpiece.wordpieceSegmentWords(train,
        policy = CheckpointPolicy.Reliable(relDir("wp")))
      .orderBy("word").collect().map(_.toSeq).toSeq ===
      Wordpiece.wordpieceSegmentWords(train).orderBy("word")
        .collect().map(_.toSeq).toSeq)
    assert(Unigram.unigramSegmentWords(train,
        policy = CheckpointPolicy.Reliable(relDir("uni")))
      .orderBy("word").collect().map(_.toSeq).toSeq ===
      Unigram.unigramSegmentWords(train).orderBy("word")
        .collect().map(_.toSeq).toSeq)
  }

  test("reliable mode preserves the dense rank's pinned partition placement") {
    val rel = CheckpointPolicy.Reliable(relDir("rank"))
    val rows = (0L until 500L).map(i => (i % 11, i, (i * 37) % 13, (i * 13) % 7))
      .toDF("doc_id", "pos", "k1", "k2")
    val got = SuffixArray.denseRank(rows, rel)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val want = rows.withColumn("rank",
        dense_rank().over(org.apache.spark.sql.expressions.Window
          .orderBy("k1", "k2")).cast("long"))
      .select("doc_id", "pos", "rank")
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got === want)
  }
}

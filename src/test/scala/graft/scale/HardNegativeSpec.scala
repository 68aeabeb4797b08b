package graft.scale

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Semi-hard negative mining laws: the FaceNet selection rule (strictly
  * below the positive, within the relative margin), self/positive/duplicate
  * exclusion, the non-positive-anchor skip, dense ranks, and the corpus
  * fixture's margin invariants.
  */
class HardNegativeSpec extends SparkSpec {

  private def vecs(rows: (Long, Seq[Float])*) = {
    val spark0 = spark
    import spark0.implicits._
    rows.toSeq.toDF("vec_id", "embedding")
  }

  private def pairs(rows: (Long, Long)*) = {
    val spark0 = spark
    import spark0.implicits._
    rows.toSeq.toDF("qid", "pos_id")
  }

  test("hand case: margin keeps the gradient-bearing negative, drops dup/easy") {
    // anchor 1 = (1,0), positive 2 = (1,0): pos_score = 127*127 = 16129
    //   3 exact duplicate of the positive -> score ties pos -> excluded
    //   4 (0.5,1.0) -> codes (64,127), score 8128, gap 8001 -> semi-hard
    //   5 (-1,0)    -> score -16129, too easy (outside 3/4 margin)
    //   6 (0.1,1.0) -> codes (13,127), score 1651, gap 14478 -> too easy
    val corpus = vecs(
      1L -> Seq(1f, 0f), 2L -> Seq(1f, 0f), 3L -> Seq(1f, 0f),
      4L -> Seq(0.5f, 1f), 5L -> Seq(-1f, 0f), 6L -> Seq(0.1f, 1f))
    val r = Similarity.semiHardNegatives(corpus, pairs(1L -> 2L), k = 5,
      marginNum = 3, marginDen = 4).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("neg_id") === 4L)
    assert(row.getAs[Long]("score") === 8128L)
    assert(row.getAs[Long]("gap") === 8001L)
    assert(row.getAs[Long]("neg_rank") === 1L)
  }

  test("anchors whose positive scores non-positive are skipped entirely") {
    val corpus = vecs(1L -> Seq(1f, 0f), 2L -> Seq(-1f, 0f), 3L -> Seq(0f, 1f))
    // pos_score = dot((127,0), (-127,0)) = -16129 <= 0 -> no rows
    val r = Similarity.semiHardNegatives(corpus, pairs(1L -> 2L), k = 5,
      marginNum = 3, marginDen = 4).collect()
    assert(r.isEmpty)
  }

  test("corpus fixture invariants: exclusions, margin, dense ranks") {
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val twins = emb.filter(col("vec_id") % 10 === 0)
      .withColumn("vec_id", col("vec_id") + 100000)
      .withColumn("embedding",
        transform(col("embedding"), x => x + lit(0.02f)).cast("array<float>"))
    val corpus = emb.unionByName(twins)
    val labels = emb.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("qid"), (col("vec_id") + 100000).as("pos_id"))
    val rows = Similarity.semiHardNegatives(corpus, labels, k = 5,
      marginNum = 3, marginDen = 4)
      .orderBy("qid", "neg_rank").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (q, p, n) = (r.getAs[Long]("qid"), r.getAs[Long]("pos_id"), r.getAs[Long]("neg_id"))
      assert(n !== q); assert(n !== p)
      val gap = r.getAs[Long]("gap")
      assert(gap > 0, s"tie with positive leaked for anchor $q")
      // gap*den <= pos_score*num with pos_score = score + gap
      assert(gap * 4 <= (r.getAs[Long]("score") + gap) * 3,
        s"out-of-margin negative for anchor $q")
    }
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (q, rs) =>
      val ranks = rs.map(_.getAs[Long]("neg_rank")).sorted.toSeq
      assert(ranks === (1L to ranks.length).toSeq, s"ranks not dense for $q")
      assert(ranks.length <= 5)
      // scores descend with rank, ties broken by neg_id ascending
      val ordered = rs.sortBy(_.getAs[Long]("neg_rank"))
        .map(r => (-r.getAs[Long]("score"), r.getAs[Long]("neg_id"))).toSeq
      assert(ordered === ordered.sorted, s"rank order violates total order for $q")
    }
  }

  test("multiple positives per anchor: each (qid, pos_id) pair gets its own k budget and dense ranks") {
    // anchor 1 with TWO positives (2 strong: pos_score 16129; 3 weaker:
    // codes (95,127), pos_score 12065): different pos_scores, different
    // margin windows — candidates must not interleave in one qid-wide
    // window sharing the k budget. Scores vs the (127,0) anchor:
    //   3 -> 12065, 4 (0.5,1)->(64,127) -> 8128, 5 (0.4,1)->(51,127) -> 6477,
    //   6 (0.3,1)->(38,127) -> 4826. Margin floors: A >= 4033, B >= 3017.
    val corpus = vecs(
      1L -> Seq(1f, 0f),
      2L -> Seq(1f, 0f),
      3L -> Seq(0.6f, 0.8f),
      4L -> Seq(0.5f, 1f), 5L -> Seq(0.4f, 1f), 6L -> Seq(0.3f, 1f))
    val rows = Similarity.semiHardNegatives(corpus, pairs(1L -> 2L, 1L -> 3L),
      k = 2, marginNum = 3, marginDen = 4)
      .collect().map(r => (r.getAs[Long]("pos_id"), r.getAs[Long]("neg_rank"),
        r.getAs[Long]("neg_id"), r.getAs[Long]("score")))
    // pair A's window = {3:12065, 4:8128, 5:6477, 6:4826} -> top-2 = 3, 4
    // pair B's window = {4:8128, 5:6477, 6:4826} (2 excluded: >= pos) -> 4, 5
    assert(rows.toSet === Set(
      (2L, 1L, 3L, 12065L), (2L, 2L, 4L, 8128L),
      (3L, 1L, 4L, 8128L), (3L, 2L, 5L, 6477L)))
  }

  test("plan law: broadcast panel + bounded heaps, no corpus-wide shuffle join") {
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val labels = emb.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("qid"), (col("vec_id") + 1).as("pos_id"))
    val plan = Similarity.semiHardNegatives(emb, labels, 5, 3, 4)
      .queryExecution.executedPlan.toString
    // the mining scan is a broadcast join against the panel, pruned by the
    // TopKPerKey bounded heaps — never a corpus-keyed SortMergeJoin
    assert(plan.contains("TopKPerKey"), s"missing bounded heaps:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"), s"panel not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus-wide shuffle join:\n$plan")
  }

  test("index mining at full probe equals the brute-force window form") {
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val twins = emb.filter(col("vec_id") % 20 === 0)
      .withColumn("vec_id", col("vec_id") + 100000)
      .withColumn("embedding",
        transform(col("embedding"), x => x + lit(0.02f)).cast("array<float>"))
    val corpus = emb.unionByName(twins).localCheckpoint()
    val anchors = emb.filter(col("vec_id") % 20 === 0)
    val labels = anchors
      .select(col("vec_id").as("qid"), (col("vec_id") + 100000).as("pos_id"))
    val root = s"${graft.core.Scratch.dir("graft-hn-ivf")}/ivf"
    AnnIndex.buildIvfIndex(corpus, root)
    val got = AnnIndex.mineHardNegativesIvf(spark, root, anchors, labels,
        k = 3, kCand = 32, marginNum = 3, marginDen = 4, nProbe = 4096)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // brute window form: quantized top-32 per anchor, positive score from
    // the window (the twin always ranks inside it), margin, top-3
    val win = Similarity.quantizedTopK(corpus, anchors, 32)
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3)))
    val expected = win.groupBy(_._1).flatMap { case (qid, rows) =>
      val posId = qid + 100000
      val posScore = rows.find(_._3 == posId).map(_._4).getOrElse(
        throw new IllegalStateException(s"twin of $qid missing from its window"))
      if (posScore <= 0) Seq.empty[(Long, Long, Long, Long)]
      else rows.filter(r => r._3 != posId && r._4 < posScore &&
          (posScore - r._4) * 4 <= posScore * 3)
        .sortBy(r => (-r._4, r._3)).take(3).zipWithIndex
        .map { case (r, i) => (qid, (i + 1).toLong, r._3, r._4) }.toSeq
    }.toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("index mining respects tombstones: a deleted negative never surfaces") {
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val anchors = emb.filter(col("vec_id") % 40 === 0)
    val labels = anchors
      .select(col("vec_id").as("qid"), (col("vec_id") + 1).as("pos_id"))
    val root = s"${graft.core.Scratch.dir("graft-hn-del")}/ivf"
    AnnIndex.buildIvfIndex(emb, root)
    def mine() = AnnIndex.mineHardNegativesIvf(spark, root, anchors, labels,
        k = 3, kCand = 32, marginNum = 9, marginDen = 10, nProbe = 4096)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    val before = mine()
    assert(before.nonEmpty)
    val victim = before.head._2
    val spark0 = spark
    import spark0.implicits._
    AnnIndex.deleteFromIvfIndex(Seq(victim).toDF("vec_id"), root)
    val after = mine()
    assert(!after.exists(_._2 == victim), s"tombstoned $victim still mined")
  }

  test("mining is deterministic") {
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val labels = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("qid"), (col("vec_id") + 1).as("pos_id"))
    def run() = Similarity.semiHardNegatives(emb, labels, k = 3,
      marginNum = 9, marginDen = 10)
      .orderBy("qid", "neg_rank").collect().map(_.toSeq).toSeq
    assert(run() === run())
  }
}

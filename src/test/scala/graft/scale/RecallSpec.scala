package graft.scale

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Recall-certification laws: the curve is monotone in probe width, bounded
  * by 100%, and a FULL probe recovers the brute-force ranking exactly —
  * the IVF index prunes, it never loses candidates.
  */
class RecallSpec extends SparkSpec {

  private def curve(nProbes: Seq[Int]): Map[Int, (Long, Long, Long)] = {
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    Recall.ivfRecallTable(emb, emb.filter(col("vec_id") < 8), k = 5, nProbes = nProbes)
      .collect()
      .map(r => r.getLong(0).toInt -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("recall is monotone in probe width and bounded by 100%") {
    val c = curve(Seq(1, 3, 10))
    val recalls = Seq(1, 3, 10).map(p => c(p)._3)
    assert(recalls === recalls.sorted, s"recall curve not monotone: $c")
    recalls.foreach(r => assert(r >= 0 && r <= 10000))
    // possible = |queries| × k when the corpus is large enough
    assert(c(1)._2 === 8L * 5)
  }

  test("full probe equals brute force exactly: recall_bp = 10000") {
    val c = curve(Seq(10))
    assert(c(10) === ((40L, 40L, 10000L)), s"full probe lost candidates: $c")
  }
}

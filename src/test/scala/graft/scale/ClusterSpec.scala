package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Connected components over near-dup pairs: transitive chains collapse to
  * one cluster, disjoint components stay apart, and cluster-based removal is
  * a fixpoint (re-running the pipeline on its survivors removes nothing).
  */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  test("a~b, b~c collapses into one cluster labeled by the min id (a~c never emitted)") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val cc = Cluster.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    val cl = Cluster.clusters(pairs).as[(Long, Long)].collect().toMap
    assert(cl === Map(1L -> 3L))
  }

  test("disjoint components keep distinct labels; long path converges") {
    // a 6-node path (diameter 5, worst case for propagation) + a separate pair
    val path = (1L to 5L).map(i => (i, i + 1))
    val pairs = (path :+ (100L, 200L)).toDF("doc_a", "doc_b")
    val cc = Cluster.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    assert((1L to 6L).forall(cc(_) == 1L))
    assert(cc(100L) === 100L && cc(200L) === 100L)
    assert(Cluster.clusters(pairs).as[(Long, Long)].collect().toMap
      === Map(1L -> 6L, 100L -> 2L))
  }

  test("adversarial 60-node chain (eccentricity 59) converges via pointer doubling") {
    // hop-only min-label propagation needs 59 rounds here and the earlier
    // implementation threw require(converged) at 25; doubling needs ~O(log d)
    val pairs = (1L to 59L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val cc = Cluster.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    assert((1L to 60L).forall(cc(_) == 1L))
  }

  test("dropNearDups keeps exactly one survivor per chain, untouched docs pass through") {
    val docs = Seq(1L, 2L, 3L, 9L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val survivors = Cluster.dropNearDups(docs, pairs).select("doc_id")
      .as[Long].collect().toSet
    assert(survivors === Set(1L, 9L)) // chain -> its min id; 9 untouched
  }

  test("cluster-based removal is a fixpoint: re-running the pipeline on survivors is a no-op") {
    // three mutual near-dups (a chain through LSH) + two distinct docs
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val docs = Seq(
      (1L, base),
      (2L, base),                                  // exact dup of 1
      (3L, base.split(" ").drop(1).mkString(" ")), // near dup of 1/2
      (4L, "a completely different document about spark query engines and shuffles"),
      (5L, "unrelated text with numbers 1 2 3 4 5 6 7 8 9 and letters a b c d e")
    ).toDF("doc_id", "text")
    def losersOf(corpus: org.apache.spark.sql.DataFrame) = {
      val pairs = Dedup.jaccardVerify(corpus,
        Dedup.minhashCandidates(Dedup.minhashSignatures(corpus)), threshold = 0.5)
      Cluster.dropNearDups(corpus, pairs)
    }
    val once = losersOf(docs)
    assert(once.select("doc_id").as[Long].collect().toSet === Set(1L, 4L, 5L))
    val twice = losersOf(once)
    assert(twice.select("doc_id").as[Long].collect().toSet === Set(1L, 4L, 5L))
  }
}

package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank matches the hand-computed trajectory on a 3-node path") {
    // undirected path 1 — 2 — 3: the center node accumulates authority
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val got = Graph.pageRank(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-computed with Scale=1e6, damping 85/100, truncating division:
    // i1: ends 575000, center 1850000
    // i2: ends 936250, center 1127500
    // i3: ends 629187, center 1741625
    assert(got === Map(1L -> 629187L, 2L -> 1741625L, 3L -> 629187L))
  }

  test("pageRank conserves no-edge-loss invariants: every node ranked, symmetric graph symmetric ranks") {
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L)).toDF("src", "dst")
    val got = Graph.pageRank(edges, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L))
    // two disconnected symmetric pairs: all four ranks identical
    assert(got.values.toSet.size === 1)
  }

  test("trade graph is bipartite and bidirectional") {
    val e = Graph.tradeEdges(spark, sfDir).cache()
    // customer nodes even, supplier nodes odd; every edge crosses sides
    assert(e.filter((col("src") % 2) === (col("dst") % 2)).count() === 0)
    // both directions present: reversing the edge list changes nothing
    val rev = e.select(col("dst").as("src"), col("src").as("dst"))
    assert(e.except(rev).count() === 0 && rev.except(e).count() === 0)
    e.unpersist()
  }
}

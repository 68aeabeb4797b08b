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

  test("pageRankDirected == pageRank on a dangling-free graph (dm = 0 reduction)") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L), (4L, 2L))
    val edges = (pairs ++ pairs.map(_.swap)).distinct.toDF("src", "dst")
    val a = Graph.pageRank(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.pageRankDirected(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b && a.nonEmpty)
  }

  test("pageRankDirected: sources keep rows, sink mass recycles, totals conserved") {
    // star-out plus chain: 1 -> {2,3,4}, 4 -> 5; node 1 is a pure source
    // (indeg 0), nodes 2/3/5 pure sinks (outdeg 0)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L)).toDF("src", "dst")
    val iters = 4
    val got = Graph.pageRankDirected(edges, iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every node still has a row — including the pure source
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 5L))
    // the source's rank is base + damped dangling share only (it has no
    // in-edges), strictly positive and strictly below a sink's
    assert(got(1L) > 0 && got(1L) < got(2L))
    // total mass stays within the truncation slack of N·Scale: each round
    // loses < 1 unit per div per node (outdeg divs + the dm div + the
    // damping div), never gains
    val n = 5L
    val total = got.values.sum
    assert(total <= n * Graph.Scale)
    assert(total >= n * Graph.Scale - n * iters * 3,
      s"mass leaked beyond truncation slack: $total")
  }

  test("pageRankDirected: deep iteration stays planner-safe (flat stats, no 2^iters plan)") {
    // `ranks` feeds BOTH contrib and dm each round; without the per-round
    // checkpoint the logical plan doubles per iteration and 16 rounds
    // never finish analysis. Run 16 rounds, pin the checkpointed frame's
    // stats estimate flat (the kCore compounding canary), and sanity the
    // conservation law still holds at depth.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L), (5L, 1L))
      .toDF("src", "dst")
    val iters = 16
    val pr = Graph.pageRankDirected(edges, iters)
    val bits = pr.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
    assert(bits < 64, s"stats estimate grew to $bits bits after $iters rounds")
    val got = pr.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 5L))
    val n = 5L
    val total = got.values.sum
    assert(total <= n * Graph.Scale && total >= n * Graph.Scale - n * iters * 3)
  }

  test("incremental append equals full recompute on the union — entire relation, every round") {
    val pairs = Graph.tradePairs(spark, sfDir).localCheckpoint()
    val holdOut = pmod(col("c") + col("s"), lit(5)) === 0
    val root = s"${graft.core.Scratch.dir("graft-prspec1")}/pr"
    val idx = new Graph.PageRankIndex(spark, root, iters = 3)
    idx.build(Graph.undirected(pairs.filter(!holdOut)))
    val incremental = idx.append(Graph.undirected(pairs.filter(holdOut)))
    val full = Graph.pageRank(Graph.undirected(pairs), iters = 3)
    assert(incremental.except(full).count() === 0 &&
      full.except(incremental).count() === 0)
    // the persisted history equals the full trajectory too, not just round 3
    var ranks = Graph.undirected(pairs).groupBy("src").agg(count(lit(1)).as("outdeg"))
      .select(col("src").as("node"), lit(Graph.Scale).as("rank"))
    assert(idx.ranks(0).except(ranks).count() === 0 && ranks.except(idx.ranks(0)).count() === 0)
  }

  test("append recomputes only the batch's cone: dirty counts stay O(batch), not O(graph)") {
    // a 300-node undirected path; the batch extends one end by one node.
    // The exact cone grows one hop per round: |dirty_t| <= t + 3 — measured
    // counts above that mean the delta update is secretly recomputing the
    // graph.
    val n = 300L
    val base = Graph.undirected(
      (0L until n - 1).map(i => (i, i + 1)).toDF("c", "s"))
    val batch = Graph.undirected(Seq((n - 1, n)).toDF("c", "s"))
    val root = s"${graft.core.Scratch.dir("graft-prspec2")}/pr"
    val idx = new Graph.PageRankIndex(spark, root, iters = 3)
    idx.collectStats = true // the measured-footprint law needs the counts
    idx.build(base)
    val got = idx.append(batch)
    assert(idx.lastAppendStats.dirtyPerRound.nonEmpty)
    idx.lastAppendStats.dirtyPerRound.foreach { case (round, dirty) =>
      assert(dirty <= round + 3,
        s"round $round recomputed $dirty nodes on a 1-edge batch over $n nodes")
    }
    // and the exactness law still holds on this planted shape
    val full = Graph.pageRank(base.unionByName(batch), iters = 3)
    assert(got.except(full).count() === 0 && full.except(got).count() === 0)
  }

  test("delete equals full recompute on the surviving graph — entire history, every round") {
    val pairs = Graph.tradePairs(spark, sfDir).localCheckpoint()
    val root = s"${graft.core.Scratch.dir("graft-prspec3")}/pr"
    val idx = new Graph.PageRankIndex(spark, root, iters = 3)
    idx.build(Graph.undirected(pairs))
    val got = idx.delete(Graph.undirected(pairs)
      .select(col("src").as("node")).distinct()
      .filter(col("node") % 37 === 0))
    val surviving = Graph.undirected(pairs)
      .filter(col("src") % 37 =!= 0 && col("dst") % 37 =!= 0)
      .localCheckpoint()
    val full = Graph.pageRank(surviving, iters = 3)
    assert(got.except(full).count() === 0 && full.except(got).count() === 0)
    // the repaired HISTORY matches a rebuild's trajectory, not just round 3:
    // rank0 = surviving srcs at Scale, rank_i = the fresh i-round run
    val r0 = surviving.select(col("src").as("node")).distinct()
      .withColumn("rank", lit(Graph.Scale))
    assert(idx.ranks(0).except(r0).count() === 0 && r0.except(idx.ranks(0)).count() === 0)
    for (i <- 1 to 2) {
      val fresh = Graph.pageRank(surviving, iters = i)
      assert(idx.ranks(i).except(fresh).count() === 0 &&
        fresh.except(idx.ranks(i)).count() === 0, s"round $i history diverged")
    }
  }

  test("delete recomputes only the cone; isolated survivors vanish; re-delete is a no-op") {
    // a 300-node undirected path plus a detached 2-node component; delete
    // one path end and the detached node's only neighbor. The cone grows
    // one hop per round — measured dirty counts above t+3 mean the repair
    // is secretly recomputing the graph.
    val n = 300L
    val path = Graph.undirected(
      (0L until n - 1).map(i => (i, i + 1)).toDF("c", "s"))
    val extra = Graph.undirected(Seq((1000L, 1001L)).toDF("c", "s"))
    val root = s"${graft.core.Scratch.dir("graft-prspec4")}/pr"
    val idx = new Graph.PageRankIndex(spark, root, iters = 3)
    idx.collectStats = true // the measured-footprint law needs the counts
    idx.build(path.unionByName(extra))
    val got = idx.delete(Seq(n - 1, 1001L).toDF("node"))
    assert(idx.lastDeleteStats.dirtyPerRound.nonEmpty)
    idx.lastDeleteStats.dirtyPerRound.foreach { case (round, dirty) =>
      assert(dirty <= round + 3,
        s"round $round recomputed $dirty nodes on a 2-node delete over $n nodes")
    }
    // node 1000 lost its only neighbor: a rebuild never seats it, so the
    // repair must purge it from every round, not leave a stale row
    val surv = Graph.undirected((0L until n - 2).map(i => (i, i + 1)).toDF("c", "s"))
    val full = Graph.pageRank(surv, iters = 3)
    assert(got.except(full).count() === 0 && full.except(got).count() === 0)
    (0 to 3).foreach { i =>
      assert(idx.ranks(i).filter(col("node").isin(n - 1, 1000L, 1001L)).count() === 0,
        s"round $i kept a deleted/isolated node")
    }
    // deleting an unknown id together with an already-deleted one changes
    // nothing (idempotence)
    val again = idx.delete(Seq(12345L, n - 1).toDF("node"))
    assert(again.except(full).count() === 0 && full.except(again).count() === 0)
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

  test("triangleCount: known closed forms (K4, path, star, two shared triangles)") {
    import spark.implicits._
    def pairs(es: (Long, Long)*) = es.toDF("u", "v")
    def count(df: org.apache.spark.sql.DataFrame): Long =
      Graph.triangleCount(df).as[Long].head()
    // K4: C(4,3) = 4 triangles
    assert(count(pairs((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L))) === 4L)
    // path: none
    assert(count(pairs((1L,2L),(2L,3L),(3L,4L))) === 0L)
    // star hub: wedges everywhere, no closure — the case degree
    // orientation exists for (hub never fans out)
    assert(count(pairs((1L,2L),(1L,3L),(1L,4L),(1L,5L),(1L,6L))) === 0L)
    // two triangles sharing edge (1,2)
    assert(count(pairs((1L,2L),(1L,3L),(2L,3L),(1L,4L),(2L,4L))) === 2L)
  }

  test("triangleCount == brute force on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val es = (for (u <- 1L to 40L; v <- (u + 1) to 40L if rnd.nextDouble() < 0.15)
      yield (u, v)).toSeq
    val brute = (for {
      (a, b) <- es; (c, d) <- es if a == c && b < d
      if es.contains((b, d))
    } yield 1).size.toLong
    assert(Graph.triangleCount(es.toDF("u", "v")).as[Long].head() === brute)
    assert(brute > 0, "fixture degenerate")
  }

  test("orientation caps fan-out: hub star never drives the wedge join") {
    import spark.implicits._
    // star: hub 1 has degree 50, leaves degree 1 — oriented edges must all
    // point INTO the hub (leaf -> hub), so wedge fan-out from any src is 0
    // or tiny rather than C(50,2) from the hub
    val star = (2L to 51L).map(v => (1L, v)).toDF("u", "v")
    // count wedges the oriented form generates: reproduce the internals
    val nodes = star.select(col("u").as("n")).unionByName(star.select(col("v").as("n")))
    val ord = nodes.groupBy("n").agg(count(lit(1)).as("deg"))
      .select(col("n"), (col("deg") * lit(4294967296L) + col("n")).as("ord"))
    val e = star
      .join(ord.select(col("n").as("u"), col("ord").as("uord")), "u")
      .join(ord.select(col("n").as("v"), col("ord").as("vord")), "v")
      .select(when(col("uord") < col("vord"), col("u")).otherwise(col("v")).as("src"))
    val maxOut = e.groupBy("src").count().agg(max("count")).as[Long].head()
    assert(maxOut === 1L, s"hub fanned out: max oriented out-degree $maxOut")
  }

  test("kCore: cycle-with-tail peels the whole tail, keeps the cycle (deep cascade)") {
    // triangle 1-2-3 plus pendant chain 3-4-5-...-20: the 2-core is exactly
    // the triangle, and peeling must cascade 17 rounds deep to find it
    val tri = Seq((1L,2L),(2L,3L),(1L,3L))
    val tail = (3L until 20L).map(i => (i, i+1))
    val edges = Graph.undirected((tri ++ tail).toDF("c", "s"))
    val core = Graph.kCore(edges, k = 2, rounds = 20)
      .select("node").as[Long].collect().toSet
    assert(core === Set(1L, 2L, 3L))
    // insufficient rounds leave the cascade unfinished (monotone, no over-peel)
    val partial = Graph.kCore(edges, k = 2, rounds = 3)
      .select("node").as[Long].collect().toSet
    assert(partial.contains(1L) && partial.size > 3)
  }

  test("iterated peel keeps flat stats estimates (no checkpoint-stat compounding)") {
    // Spark's local checkpoint preserves the plan's ESTIMATED stats. A
    // kCore variant that checkpointed the degree aggregate for reuse
    // compounded the join-product estimate ~3x in BIT LENGTH per round
    // (28 -> 82 -> 242 -> ... measured), and by round ~15 JoinSelection
    // spent minutes multiplying million-bit BigInts — a silent 80x
    // slowdown, not a failure. Replicate the production loop shape for 8
    // rounds and pin the estimate flat; if this ever grows past a plain
    // long, some stage started checkpointing a compounding estimate.
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val tail = (3L until 20L).map(i => (i, i + 1))
    var e = Graph.undirected((tri ++ tail).toDF("c", "s"))
      .select("src", "dst").localCheckpoint()
    for (i <- 0 until 8) {
      val degs = e.groupBy("src").agg(count(lit(1)).as("deg"))
      val keep = degs.filter(col("deg") >= 2).select("src")
      e = e.join(keep, "src")
        .join(keep.withColumnRenamed("src", "dst"), "dst")
        .select("src", "dst").localCheckpoint()
      val bits = e.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
      assert(bits < 64, s"round $i stats estimate grew to $bits bits")
    }
  }

  test("kCore: extra rounds past the fixpoint are no-ops; degrees are core degrees") {
    val k4 = Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L))
    // K4 plus a pendant on node 1: 3-core is K4; node 1's GRAPH degree is 4
    // but its CORE degree must be 3 (the pendant edge is gone)
    val edges = Graph.undirected((k4 :+ (1L, 9L)).toDF("c", "s"))
    val a = Graph.kCore(edges, k = 3, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.kCore(edges, k = 3, rounds = 9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    assert(a === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kHopReachable: BFS labels are SHORTEST hop counts; horizon respected") {
    // undirected path 1-2-3-4-5 plus a shortcut 1-4: node 4 must label
    // hop 1 (via the shortcut), not hop 3; node 5 labels 2
    val pairs = Seq((1L,2L),(2L,3L),(3L,4L),(4L,5L),(1L,4L))
    val edges = Graph.undirected(pairs.toDF("c", "s"))
    val seeds = Seq(1L).toDF("node")
    val out = Graph.kHopReachable(edges, seeds, hops = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out === Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 2, 5L -> 2))
    // horizon 1: only the direct neighbors
    val h1 = Graph.kHopReachable(edges, seeds, hops = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(h1 === Map(1L -> 0, 2L -> 1, 4L -> 1))
  }

  test("shortestPaths: exact weighted distances; horizon bounds path length") {
    // diamond with a cheap long way: 1->2->3->4 costs 1+1+1=3, direct
    // 1->4 costs 10; also 2->4 costs 9 (so 1-2-4 = 10, worse than 3)
    val es = Seq((1L,2L,1L),(2L,3L,1L),(3L,4L,1L),(1L,4L,10L),(2L,4L,9L))
    val edges = (es ++ es.map(t => (t._2, t._1, t._3))).toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("node")
    val d4 = Graph.shortestPaths(edges, seeds, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d4 === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // horizon 1: only direct edges relaxed — node 4 still at cost 10, node 3 unreached
    val d1 = Graph.shortestPaths(edges, seeds, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d1 === Map(1L -> 0L, 2L -> 1L, 4L -> 10L))
  }

  test("triangleCountDelta: old + delta == full recount across random splits") {
    val rnd = new scala.util.Random(31)
    val all = (for (u <- 1L to 30L; v <- (u + 1) to 30L if rnd.nextDouble() < 0.25)
      yield (u, v)).toSeq
    def tri(es: Seq[(Long, Long)]): Long =
      Graph.triangleCount(es.toDF("u", "v")).as[Long].head()
    for (seed <- 1 to 3) {
      val r2 = new scala.util.Random(seed)
      val (batch, base) = all.partition(_ => r2.nextDouble() < 0.3)
      val delta = Graph.triangleCountDelta(base.toDF("u", "v"), batch.toDF("u", "v"))
        .as[Long].head()
      assert(tri(base) + delta === tri(all), s"seed $seed")
    }
    assert(tri(all) > 0, "degenerate fixture")
  }

  test("triangleCountDelta: exactly-2-new and all-new multiplicity classes count once") {
    // base has only edge (1,2); batch adds (1,3),(2,3) -> ONE new triangle
    // with exactly two new edges
    assert(Graph.triangleCountDelta(
      Seq((1L,2L)).toDF("u","v"), Seq((1L,3L),(2L,3L)).toDF("u","v"))
      .as[Long].head() === 1L)
    // empty base, batch is a full triangle -> counted once via the t3 term
    assert(Graph.triangleCountDelta(
      Seq.empty[(Long,Long)].toDF("u","v"),
      Seq((1L,2L),(1L,3L),(2L,3L)).toDF("u","v")).as[Long].head() === 1L)
    // batch overlapping base edges is anti-joined away, not double-counted
    assert(Graph.triangleCountDelta(
      Seq((1L,2L),(1L,3L),(2L,3L)).toDF("u","v"),
      Seq((1L,2L)).toDF("u","v")).as[Long].head() === 0L)
  }

  test("labelPropagation: two planted cliques with one bridge keep separate min-id labels") {
    // cliques {1,2,3,4} and {10,11,12,13}, bridge 4-10: inside a clique
    // the min id dominates every vote; the single bridge edge never
    // outvotes a node's three clique neighbors
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a != b) yield (a, b)
    val e = (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L)) ++
      Seq((4L, 10L), (10L, 4L))).toDF("src", "dst")
    val out = Graph.labelPropagation(e, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(out(_) == 1L))
    assert(Seq(10L, 11L, 12L, 13L).forall(out(_) == 10L))
    // synchronous determinism: a second run is bit-identical
    assert(Graph.labelPropagation(e, rounds = 4)
      .as[(Long, Long)].collect().toMap === out)
  }

  test("labelPropagationWeighted: one strong tie outvotes several weak ones; all-ones reduces to labelPropagation") {
    // node 5: two weak edges (w=1) into clique {1,2}, one strong edge
    // (w=3) to clique {9,10} — count-votes pick label 1 (tie to smallest
    // among three single votes), weight-votes pick 9
    def sym(t: Seq[(Long, Long, Long)]) =
      (t ++ t.map(x => (x._2, x._1, x._3))).toDF("src", "dst", "w")
    val e = sym(Seq((1L, 2L, 5L), (1L, 5L, 1L), (2L, 5L, 1L),
      (9L, 10L, 5L), (9L, 5L, 3L)))
    val w1 = Graph.labelPropagationWeighted(e, rounds = 1)
      .as[(Long, Long)].collect().toMap
    val c1 = Graph.labelPropagation(e.select("src", "dst"), rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(w1(5L) === 9L && c1(5L) === 1L)
    // all-ones weights: exact reduction, any round count
    val u = sym(Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (4L, 1L, 1L),
      (7L, 8L, 1L)))
    assert(Graph.labelPropagationWeighted(u, rounds = 3)
      .as[(Long, Long)].collect().toMap ===
      Graph.labelPropagation(u.select("src", "dst"), rounds = 3)
        .as[(Long, Long)].collect().toMap)
  }

  test("hits: bipartite direction splits the scores; normalized sums bounded by Scale") {
    val e = Seq((0L, 101L), (0L, 102L), (2L, 101L), (4L, 103L))
      .toDF("src", "dst")
    val out = Graph.hits(e, rounds = 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // sources are pure hubs, targets pure authorities
    assert(Seq(0L, 2L, 4L).forall(out(_)._1 === 0L))
    assert(Seq(101L, 102L, 103L).forall(out(_)._2 === 0L))
    // L1 normalization: each side's total is Scale minus truncation dust
    val sa = Seq(101L, 102L, 103L).map(out(_)._1).sum
    val sh = Seq(0L, 2L, 4L).map(out(_)._2).sum
    assert(sa <= Graph.Scale && sa > Graph.Scale - 10)
    assert(sh <= Graph.Scale && sh > Graph.Scale - 10)
    // 101 is cited by two hubs incl. the strongest; it must out-rank 103
    assert(out(101L)._1 > out(103L)._1)
  }

  test("personalizedPageRank: unreached components sit at exactly 0; reach follows hop distance") {
    // symmetric path 1 — 2 — 3 plus a disconnected pair {8, 9}; seed = 1
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (8L, 9L), (9L, 8L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val one = Graph.personalizedPageRank(e, seeds, iters = 1)
      .as[(Long, Long)].collect().toMap
    // after 1 round seed mass has reached exactly the 1-hop neighborhood
    assert(one(2L) > 0L && one(3L) === 0L)
    val out = Graph.personalizedPageRank(e, seeds, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(out.keySet === Set(1L, 2L, 3L, 8L, 9L))
    // the restart never lands off-seed: the island stays at exactly 0
    assert(out(8L) === 0L && out(9L) === 0L)
    assert(out(1L) > 0L && out(2L) > 0L && out(3L) > 0L)
    // determinism: integer arithmetic, bit-identical rerun
    assert(Graph.personalizedPageRank(e, seeds, iters = 3)
      .as[(Long, Long)].collect().toMap === out)
  }

  test("trustRank: trust splits by edge weight; uniform weights reduce to personalizedPageRank") {
    // seed 1 splits outflow 9:1 between nodes 2 and 3
    val e = Seq((1L, 2L, 9L), (2L, 1L, 9L), (1L, 3L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("node")
    val out = Graph.trustRank(e, seeds, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(out(2L) > out(3L) && out(3L) > 0L)
    // all-ones weights: exact reduction to the unweighted personalized walk
    val u = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    assert(Graph.trustRank(u.withColumn("w", lit(1L)), seeds, iters = 3)
      .as[(Long, Long)].collect().toMap ===
      Graph.personalizedPageRank(u, seeds, iters = 3)
        .as[(Long, Long)].collect().toMap)
  }

  test("personalizedPageRank with every node seeded reduces to uniform pageRank") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L), (4L, 2L))
    val e = (pairs ++ pairs.map(_.swap)).distinct.toDF("src", "dst")
    val all = e.select(col("src").as("node")).distinct()
    val ppr = Graph.personalizedPageRank(e, all, iters = 3)
      .as[(Long, Long)].collect().toMap
    val pr = Graph.pageRank(e, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(ppr === pr && ppr.nonEmpty)
  }
}

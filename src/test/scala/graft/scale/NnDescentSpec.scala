package graft.scale

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** NN-descent graph + beam-probe laws: structural invariants of the built
  * graph, the descent-improves-monotonically guarantee, and serving
  * sanity on a small strongly-covered fixture.
  */
class NnDescentSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sfDir)
    .select("vec_id", "embedding").cache()
  private lazy val small = emb.filter(col("vec_id") < 40).cache()

  test("buildKnnGraph: out-degree <= k, no self-loops, endpoints in corpus") {
    val g = NnDescent.buildKnnGraph(emb, k = 8, iters = 2)
    val deg = g.groupBy("u").agg(count(lit(1)).as("d"))
    assert(deg.filter(col("d") > 8).count() === 0)
    assert(g.filter(col("u") === col("v")).count() === 0)
    val ids = emb.select(col("vec_id").cast("long").as("nid"))
    assert(g.select(col("v").as("nid")).join(ids, Seq("nid"), "left_anti").count() === 0)
    assert(g.count() > 0)
  }

  test("each descent round is monotone: per-node kept-score sum never decreases") {
    // candidates always include the current edges, so the per-node top-k is
    // a max over a superset — the NN-descent convergence argument, pinned
    val cz = NnDescent.codes(small).localCheckpoint()
    val init = NnDescent.initGraph(cz.select("nid"), 8)
    def keptSum(e: org.apache.spark.sql.DataFrame) =
      e.join(cz.select(col("nid").as("u"), col("cc").as("cu")), "u")
        .join(cz.select(col("nid").as("v"), col("cc").as("cv")), "v")
        .select(col("u"), Similarity.int8Dot(col("cu"), col("cv")).as("s"))
        .groupBy("u").agg(sum("s").as("t"), count(lit(1)).as("n"))
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val r1 = NnDescent.descentRound(init, cz, 8).localCheckpoint()
    val r2 = NnDescent.descentRound(r1, cz, 8).localCheckpoint()
    val (s1, s2) = (keptSum(r1), keptSum(r2))
    for ((u, (t2, n2)) <- s2; (t1, n1) <- s1.get(u)) {
      assert(n2 >= n1, s"node $u lost neighbors: $n1 -> $n2")
      if (n2 == n1) assert(t2 >= t1, s"node $u kept-score sum fell: $t1 -> $t2")
    }
  }

  test("beam probe on a small dense fixture finds the planted exact twin at rank 1") {
    val probes = small.filter(col("vec_id") < 3)
    val twins = probes.withColumn("vec_id", col("vec_id") + 100000)
    val corpus = small.unionByName(twins)
    val cz = NnDescent.codes(corpus).localCheckpoint()
    // 4 hash buckets: 16 would leave ~3 nodes per bucket on this small
    // fixture and an init graph too sparse for descent to heal
    val g = NnDescent.buildKnnGraph(corpus, k = 8, iters = 2, buckets = 4)
    val top1 = NnDescent.beamProbe(g, cz, probes, k = 1, beam = 8, rounds = 3)
      .filter(col("rnk") === 1)
      .select("qid", "nid").as[(Long, Long)].collect().toMap
    for ((qid, nid) <- top1) assert(nid === qid + 100000,
      s"query $qid reached $nid, expected its exact twin")
    assert(top1.size === 3)
  }

  test("wide beam + enough rounds on the small fixture == brute force top-k") {
    val probes = small.filter(col("vec_id") < 3)
    val cz = NnDescent.codes(small).localCheckpoint()
    val g = NnDescent.buildKnnGraph(small, k = 8, iters = 2, buckets = 4)
    val got = NnDescent.beamProbe(g, cz, probes, k = 5, beam = 40, rounds = 5)
      .collect().map(_.toSeq).toSet
    val want = Similarity.quantizedTopK(small, probes, 5)
      .collect().map(_.toSeq).toSet
    assert(got === want && got.nonEmpty)
  }

  test("NavIndex soft delete: identical walk, survivors-only ranking; O(batch) footprint") {
    val root = s"${graft.core.Scratch.dir("graft-navspec1")}/nav"
    val idx = new NnDescent.NavIndex(spark, root, graphK = 8, iters = 2, buckets = 4)
    idx.build(small)
    val qs = small.filter(col("vec_id") < 3)
    val del = small.select("vec_id").filter(col("vec_id") % 5 === 0)
    // the FULL visited ranking of the plain (index-free) walk over the same
    // graph — k larger than the corpus, so nothing truncates
    val fullRank = NnDescent.beamProbe(idx.graph.read(), idx.codes.read(), qs,
      k = 1000, beam = 8, rounds = 3).localCheckpoint()
    val (gv, cv) = (idx.graph.currentVersion, idx.codes.currentVersion)
    idx.delete(del)
    // footprint: tombstones hold exactly the batch; graph/codes untouched
    assert(idx.tombstones.read().count() === del.count())
    assert(idx.graph.currentVersion === gv && idx.codes.currentVersion === cv)
    // soft serve == the SAME walk's ranking with tombstoned ids filtered
    // then re-truncated — the implementation-independent soft-delete law
    val got = idx.probe(qs, k = 5, beam = 8, rounds = 3)
      .select("qid", "rnk", "nid", "score").collect().map(_.toSeq).toSet
    val want = {
      val surv = fullRank.join(
        del.select(col("vec_id").cast("long").as("nid")), Seq("nid"), "left_anti")
      import org.apache.spark.sql.expressions.Window
      surv.withColumn("rnk", row_number().over(
          Window.partitionBy("qid").orderBy(col("score").desc, col("nid"))))
        .filter(col("rnk") <= 5)
        .select("qid", "rnk", "nid", "score").collect().map(_.toSeq).toSet
    }
    assert(got === want && got.nonEmpty)
    // no tombstoned id is ever served
    assert(idx.probe(qs, 5, 8, 3).join(
      del.select(col("vec_id").cast("long").as("nid")), Seq("nid")).count() === 0)
    // re-delete + unknown-id delete: idempotent no-op
    idx.delete(del.unionByName(Seq(999999L).toDF("vec_id")))
    assert(idx.tombstones.read().count() === del.count() + 1)
    val again = idx.probe(qs, 5, 8, 3)
      .select("qid", "rnk", "nid", "score").collect().map(_.toSeq).toSet
    assert(again === got)
  }

  test("NavIndex compactPurge == fresh build on the surviving corpus, bit-exact") {
    val root = s"${graft.core.Scratch.dir("graft-navspec2")}/nav"
    val idx = new NnDescent.NavIndex(spark, root, graphK = 8, iters = 2, buckets = 4)
    idx.build(small)
    val surviving = small.filter(col("vec_id") % 5 =!= 0).localCheckpoint()
    idx.delete(small.select("vec_id").filter(col("vec_id") % 5 === 0))
    idx.compactPurge()
    // the rebuilt graph IS buildKnnGraph(survivors) — relation equality
    val fresh = NnDescent.buildKnnGraph(surviving, k = 8, iters = 2, buckets = 4)
    assert(idx.graph.read().except(fresh).count() === 0 &&
      fresh.except(idx.graph.read()).count() === 0)
    // tombstones truncated; codes shrank to the survivors
    assert(idx.tombstones.read().count() === 0)
    assert(idx.codes.read().count() === surviving.count())
    // and the serve path equals the index-free walk on the fresh build
    val qs = small.filter(col("vec_id") < 3)
    val got = idx.probe(qs, 5, 8, 3).collect().map(_.toSeq).toSet
    val want = NnDescent.beamProbe(fresh, NnDescent.codes(surviving), qs,
      k = 5, beam = 8, rounds = 3).collect().map(_.toSeq).toSet
    assert(got === want && got.nonEmpty)
  }

  test("IVF-routed entry points dominate-or-equal md5 seeds at every beam (q215 law)") {
    // same graph, same knobs, same candidate budget — only the entry
    // points differ. Routed entries start the walk near the query, so at
    // every budget the routed family's recall must be >= the fixed-seed
    // family's (the r14 verdict's done-criterion for entry-point routing).
    // Pinned at sf0.01 — the driver's certification tier — NOT the spec
    // default sf0.001: a ~300-vector corpus has no geometry for routing to
    // exploit, and 8 hash-scattered seeds out-cover any 8 cell
    // representatives there (measured: beam 2 routed 968 < fixed 1062 bp
    // at sf0.001, while every knob dominates at sf0.01). Routing is a
    // scale remedy; the law is asserted at the scale it exists for.
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select("vec_id", "embedding")
    val table = Recall.graphSeedComparisonTable(emb, emb.filter(col("vec_id") < 32))
      .select("family", "knob", "recall_bp")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val knobs = table.keys.map(_._2).toSet
    assert(knobs.nonEmpty)
    for (b <- knobs) {
      assert(table(("graph_ivf", b)) >= table(("graph", b)),
        s"beam $b: routed ${table(("graph_ivf", b))} < fixed ${table(("graph", b))}")
    }
    // and routing is not vacuous: strictly better somewhere
    assert(knobs.exists(b => table(("graph_ivf", b)) > table(("graph", b))))
  }

  test("two-layer hier serving: budgets add the fixed upper cost; upper walk hands better entries than fixed seeds") {
    val table = Recall.hierRecallTable(emb, emb.filter(col("vec_id") < 32))
      .select("family", "knob", "budget", "recall_bp")
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // knobs come from the table (Recall.Beams moved to (2, 8) in r18 —
    // hardcoding the panel here is what broke when the constant moved)
    val knobs = table.keys.map(_._2).toSeq.distinct.sorted
    assert(knobs.nonEmpty)
    // budget bookkeeping: hier = flat + one fixed upper-walk cost, per knob
    val extras = knobs.map(b => table(("graph_hier", b))._1 - table(("graph", b))._1)
    assert(extras.distinct.size === 1 && extras.head > 0)
    // the mechanism law: the upper walk's best entry is (in aggregate over
    // the panel) at least as close to the query as the best of the fixed
    // md5 seeds — entering near the answer is what the layer buys. Which
    // RECALL that translates to is scale-dependent (at sf0.01 hier wins
    // the narrow beam 1500 vs 812 bp but iid data lets wide scattered
    // beams dominate) — certified by value in the q233 oracle table, not
    // legislated here.
    val qs = emb.filter(col("vec_id") < 32)
    val cz = NnDescent.codes(emb).localCheckpoint()
    val upper = emb.filter(NnDescent.layerPredicate(col("vec_id"), 8))
    val czU = NnDescent.codes(upper).localCheckpoint()
    val gU = NnDescent.buildKnnGraph(upper, 8, 2)
    val hierBest = NnDescent.beamProbe(gU, czU, qs, 1, 4, 3)
      .select(col("qid"), col("score")).as[(Long, Long)].collect().toMap
    val qz = Similarity.quantizeInt8(qs, "embedding")
      .select(col("vec_id").cast("long").as("qid"), col("qcode").as("qc"))
    val seedBest = cz.select("nid")
      .orderBy(md5(col("nid").cast("string")), col("nid")).limit(8)
      .crossJoin(qz).join(cz, "nid")
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), Similarity.int8Dot(col("qc"), col("cc")).as("s"))
      .groupBy("qid").agg(max("s").as("s"))
      .as[(Long, Long)].collect().toMap
    assert(hierBest.keySet === seedBest.keySet)
    assert(hierBest.values.sum >= seedBest.values.sum)
  }

  test("hierProbe: k rows per query, no self-matches, ranks dense") {
    val qs = emb.filter(col("vec_id") < 8)
    val upper = emb.filter(NnDescent.layerPredicate(col("vec_id"), 8))
    val czU = NnDescent.codes(upper).localCheckpoint()
    val gU = NnDescent.buildKnnGraph(upper, 8, 2)
    val cz = NnDescent.codes(emb).localCheckpoint()
    val g = NnDescent.buildKnnGraph(emb, 8, 2)
    val out = NnDescent.hierProbe(gU, czU, g, cz, qs, 5, 4, 3).cache()
    assert(out.filter(col("qid") === col("nid")).count() === 0)
    val perQ = out.groupBy("qid").agg(count(lit(1)).as("n"), max("rnk").as("m"))
      .as[(Long, Long, Long)].collect()
    assert(perQ.length === 8)
    perQ.foreach { case (_, n, m) => assert(n === 5L && m === 5L) }
  }

  test("PQ-compressed walk: budgets add the rerank cost; k dense ranks per query, no self-matches") {
    val qs = emb.filter(col("vec_id") < 16)
    val table = Recall.pqWalkTable(emb, qs)
      .select("family", "knob", "budget")
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // knobs from the table (see the hier test's note on Recall.Beams)
    val pqKnobs = table.keys.map(_._2).toSeq.distinct.sorted
    assert(pqKnobs.nonEmpty)
    val extras = pqKnobs
      .map(b => table(("graph_pq", b)) - table(("graph", b)))
    assert(extras.distinct === Seq(20L))
    val cz = NnDescent.codes(emb).localCheckpoint()
    val g = NnDescent.buildKnnGraph(emb, 8, 2)
    val subs = Pq.subvectors(emb)
    val cents = Pq.trainCodebook(subs)
    val pqCodes = Pq.encode(subs, cents).localCheckpoint()
    val out = NnDescent.beamProbePq(g, pqCodes, cents, cz, qs, 5, 4, 3, 20).cache()
    assert(out.filter(col("qid") === col("nid")).count() === 0)
    val perQ = out.groupBy("qid").agg(count(lit(1)).as("n"), max("rnk").as("m"))
      .as[(Long, Long, Long)].collect()
    assert(perQ.length === 16)
    perQ.foreach { case (_, n, m) => assert(n === 5L && m === 5L) }
    // the rerank is genuine: final scores are int8 dots, descending in rank
    val mono = out.select("qid", "rnk", "score").as[(Long, Long, Long)]
      .collect().groupBy(_._1).values
    mono.foreach { rows =>
      val sorted = rows.sortBy(_._2).map(_._3)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
  }

  // --- NavIndex append --------------------------------------------------

  private def navRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-nav-$tag").toString + "/nav"

  test("NavIndex append is O(batch): new codes/edges append, old lists untouched") {
    val root = navRoot("append")
    val idx = new NnDescent.NavIndex(spark, root)
    val base = emb.filter(col("vec_id") < 150)
    val batch = emb.filter(col("vec_id") >= 150 && col("vec_id") < 155)
    idx.build(base)
    val g0 = idx.graph.read().collect().map(_.toSeq).toSet
    idx.append(batch)
    // codes grew by exactly the batch; the append version's own rows are
    // batch-sized (stageAppend inherits the base files by reference)
    assert(idx.codes.read().count() === base.count() + batch.count())
    val g1 = idx.graph.read().collect().map(_.toSeq).toSet
    val newEdges = g1 -- g0
    assert((g0 -- g1).isEmpty, "append must not rewrite existing neighbor lists")
    val newSources = newEdges.map(_.head.asInstanceOf[Long])
    assert(newSources === Set(150L, 151L, 152L, 153L, 154L))
    assert(newEdges.size <= 5 * 8)
    // appended nodes are immediately probe-reachable: each new node's own
    // vector finds ITSELF at rank 1 is excluded, so probe for an exact
    // clone and expect the stored node
    val probeSelf = NnDescent.beamProbe(idx.graph.read(), idx.codes.read(),
      batch.withColumn("vec_id", col("vec_id") + 900000), 1, 8, 3)
    val hits = probeSelf.filter(col("rnk") === 1)
      .select(col("qid"), col("nid")).as[(Long, Long)].collect().toMap
    for ((qid, nid) <- hits) assert(nid === qid - 900000,
      s"clone query $qid did not reach its appended original (got $nid)")
  }

  test("NavIndex compact == fresh build on the union, bit-exact (append repair)") {
    val base = emb.filter(col("vec_id") < 150)
    val batch = emb.filter(col("vec_id") >= 150 && col("vec_id") < 170)
    val rootA = navRoot("repair")
    val a = new NnDescent.NavIndex(spark, rootA)
    a.build(base); a.append(batch); a.compact()
    val rootB = navRoot("fresh")
    val b = new NnDescent.NavIndex(spark, rootB)
    b.build(base.unionByName(batch))
    assert(a.graph.read().collect().map(_.toSeq).toSet ===
      b.graph.read().collect().map(_.toSeq).toSet)
    assert(a.codes.read().collect().map(_.toSeq).toSet ===
      b.codes.read().collect().map(_.toSeq).toSet)
  }

  test("NavIndex append torn between graph and codes promotes retries bit-identically") {
    val base = emb.filter(col("vec_id") < 150)
    val batch = emb.filter(col("vec_id") >= 150 && col("vec_id") < 160)
    val clean = new NnDescent.NavIndex(spark, navRoot("clean"))
    clean.build(base); clean.append(batch)
    // torn state: the graph patch landed (same public walk append stages),
    // the codes patch did not — then the append is retried whole
    val torn = new NnDescent.NavIndex(spark, navRoot("torn"))
    torn.build(base)
    val links = NnDescent.beamProbe(torn.graph.read(), torn.codes.read(),
        batch, 8, 8, 3, 8, 8)
      .select(col("qid").as("u"), col("nid").as("v"), col("score"))
    torn.graph.promote(torn.graph.stageAppend(links))
    torn.append(batch)
    assert(torn.graph.read().collect().map(_.toSeq).toSet ===
      clean.graph.read().collect().map(_.toSeq).toSet)
    assert(torn.codes.read().collect().map(_.toSeq).toSet ===
      clean.codes.read().collect().map(_.toSeq).toSet)
  }

  test("navAppendSink multi-batch drain == the same sequential append calls") {
    import org.apache.spark.sql.streaming.Trigger
    val base = emb.filter(col("vec_id") < 150)
    val b1 = emb.filter(col("vec_id") >= 150 && col("vec_id") < 155)
    val b2 = emb.filter(col("vec_id") >= 155 && col("vec_id") < 160)
    val seq = new NnDescent.NavIndex(spark, navRoot("seq"))
    seq.build(base); seq.append(b1); seq.append(b2)
    val st = new NnDescent.NavIndex(spark, navRoot("stream"))
    st.build(base)
    // deterministic 2-batch arrival: two feed files in write order
    val wh = java.nio.file.Files.createTempDirectory("graft-navstream").toString
    b1.coalesce(1).write.mode("append").parquet(s"$wh/feed")
    Thread.sleep(1100) // distinct mtime seconds => deterministic file order
    b2.coalesce(1).write.mode("append").parquet(s"$wh/feed")
    val s2 = spark.newSession()
    val schema = s2.read.parquet(s"$wh/feed").schema
    val stream = s2.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$wh/feed")
    graft.streaming.AnnStream.navAppendSink(stream, st, s"$wh/ckpt")
      .awaitTermination()
    assert(st.graph.read().collect().map(_.toSeq).toSet ===
      seq.graph.read().collect().map(_.toSeq).toSet)
    assert(st.codes.read().collect().map(_.toSeq).toSet ===
      seq.codes.read().collect().map(_.toSeq).toSet)
  }

  test("NavIndex append: existing ids no-op; tombstoned ids un-delete first") {
    val root = navRoot("undelete")
    val idx = new NnDescent.NavIndex(spark, root)
    idx.build(emb.filter(col("vec_id") < 150))
    val v0 = (idx.codes.currentVersion, idx.graph.currentVersion)
    idx.append(emb.filter(col("vec_id") < 10)) // all already present
    assert((idx.codes.currentVersion, idx.graph.currentVersion) === v0)
    // delete node 3, then re-append it: tombstone cleared, node serves
    idx.delete(Seq(3L).toDF("vec_id"))
    idx.append(emb.filter(col("vec_id") === 3))
    assert(idx.tombstones.read().isEmpty)
    val clone = emb.filter(col("vec_id") === 3)
      .withColumn("vec_id", col("vec_id") + 900000)
    val top = idx.probe(clone, 1, 8, 3).filter(col("rnk") === 1)
      .select("nid").as[Long].head()
    assert(top === 3L)
  }
  test("NavIndex filtered probe (denied set) == tombstone-delete of the same set") {
    // filtered graph search: denied nodes route like tombstones — walked
    // THROUGH as waypoints, never ranked — so a metadata reject set and a
    // takedown of the same ids serve identically
    val rootA = navRoot("filta"); val rootB = navRoot("filtb")
    val denied = small.select("vec_id").filter(col("vec_id") % 4 =!= 0)
    val qs = small.filter(col("vec_id") < 3)
    val a = new NnDescent.NavIndex(spark, rootA)
    a.build(small)
    val filtered = a.probe(qs, k = 5, beam = 8, rounds = 3,
        denied = Some(denied.select(col("vec_id").cast("long").as("nid"))))
      .select("qid", "rnk", "nid", "score").collect().map(_.toSeq).toSet
    val b = new NnDescent.NavIndex(spark, rootB)
    b.build(small)
    b.delete(denied)
    val deleted = b.probe(qs, k = 5, beam = 8, rounds = 3)
      .select("qid", "rnk", "nid", "score").collect().map(_.toSeq).toSet
    assert(filtered === deleted && filtered.nonEmpty)
    assert(!filtered.exists(r => r(2).asInstanceOf[Long] % 4 != 0))
  }

  test("NavIndex predicate probe == the denied-complement probe; pred pushed to the codes scan") {
    val root = navRoot("pred")
    val meta = small.withColumn("lang", expr(
      "CASE CAST(vec_id % 4 AS INT) WHEN 0 THEN 'en' ELSE 'xx' END"))
    val qs = small.filter(col("vec_id") < 3)
    val idx = new NnDescent.NavIndex(spark, root, metaCols = Seq("lang"))
    idx.build(meta)
    val byPred = idx.probe(qs, k = 5, beam = 8, rounds = 3,
      pred = Some(col("lang") === "en"))
    val byDenied = idx.probe(qs, k = 5, beam = 8, rounds = 3,
      denied = Some(small.select("vec_id").filter(col("vec_id") % 4 =!= 0)
        .select(col("vec_id").cast("long").as("nid"))))
    assert(byPred.collect().map(_.toSeq).toSet ===
      byDenied.collect().map(_.toSeq).toSet)
    // the predicate lands on the codes parquet scan, never a reject-set
    // materialization
    val plan = byPred.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*lang[^\\]]*\\].*"),
      s"lang predicate not pushed to the codes scan:\n$plan")
  }

  test("NavIndex predicate probe is filter-then-rank over the UNCHANGED walk") {
    val root = navRoot("ftr")
    val meta = small.withColumn("lang", expr(
      "CASE CAST(vec_id % 4 AS INT) WHEN 0 THEN 'en' ELSE 'xx' END"))
    val qs = small.filter(col("vec_id") < 3)
    val idx = new NnDescent.NavIndex(spark, root, metaCols = Seq("lang"))
    idx.build(meta)
    // the predicate must not perturb ROUTING: the filtered top-5 is
    // exactly the unfiltered walk's full visited ranking (k = corpus)
    // restricted to matching nodes and re-cut — rank-then-filter of the
    // same walk, NOT a different walk. (Full-beam != brute here by
    // design: the md5-bucketed init graph is multi-component and seeds
    // reach only their components — the recall curves price that in.)
    val got = idx.probe(qs, k = 5, beam = 40, rounds = 3,
        pred = Some(col("lang") === "en"))
      .select("qid", "rnk", "nid").as[(Long, Long, Long)].collect().toSet
    import org.apache.spark.sql.expressions.Window
    val want = idx.probe(qs, k = 40, beam = 40, rounds = 3)
      .filter(col("nid") % 4 === 0)
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("score").desc, col("nid"))).cast("long"))
      .filter(col("rnk") <= 5)
      .select("qid", "rnk", "nid").as[(Long, Long, Long)].collect().toSet
    assert(got === want && got.nonEmpty)
  }
}

package graft.scale

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Persistent IVF index: build/probe split semantics — a prebuilt index
  * answers exactly like the retrain-per-call forms, survives rebuilds
  * atomically, and its probes stay cell-pruned (the plan side of that is
  * PlanSpec territory).
  */
class AnnIndexSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding").cache()
  private lazy val queries = emb.filter(col("vec_id") < 5)

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-annidx-$tag").toString + "/ivf"

  test("probeIvf with a full probe == quantizedTopK (exact parity on ranks and scores)") {
    val root = tmpRoot("parity")
    val idx = AnnIndex.buildIvfIndex(emb, root)
    val probed = AnnIndex.probeIvf(spark, root, queries, 5, nProbe = idx.nCentroids)
      .collect().map(_.toSeq).toSet
    val brute = Similarity.quantizedTopK(emb, queries, 5)
      .collect().map(_.toSeq).toSet
    assert(probed === brute && probed.nonEmpty)
  }

  test("default probe surfaces an exact twin at rank 1 through the prebuilt index") {
    import spark.implicits._
    val twins = queries.withColumn("vec_id", col("vec_id") + 100000)
    val root = tmpRoot("twin")
    AnnIndex.buildIvfIndex(emb.unionByName(twins), root)
    val top1 = AnnIndex.probeIvf(spark, root, queries, 1)
      .select("qid", "nid").as[(Long, Long)].collect().toMap
    for ((qid, nid) <- top1) assert(nid === qid + 100000,
      s"query $qid top-1 was $nid, expected its exact twin")
  }

  test("rebuild is atomic: the index answers from the old version until promote") {
    val root = tmpRoot("rebuild")
    AnnIndex.buildIvfIndex(emb.filter(col("vec_id") < 50), root)
    val before = AnnIndex.probeIvf(spark, root, queries, 3, nProbe = 64)
      .collect().map(_.toSeq).toSet
    // rebuild over a different corpus slice; probes after the rebuild see it
    AnnIndex.buildIvfIndex(emb.filter(col("vec_id") < 100), root)
    val after = AnnIndex.probeIvf(spark, root, queries, 3, nProbe = 64)
      .collect().map(_.toSeq).toSet
    assert(before !== after) // the rebuild actually changed the answer set
    // both versions' data directories still exist (stage never deletes the
    // live version out from under a concurrent reader)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/postings/v0")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/postings/v1")))
  }

  test("compaction is invisible to serving and leaves a self-contained version") {
    val base = emb.filter(col("vec_id") < 150)
    val batch = emb.filter(col("vec_id") >= 150 && col("vec_id") < 200)
    val root = tmpRoot("compact")
    val idx = AnnIndex.buildIvfIndex(base, root)
    AnnIndex.appendToIvfIndex(batch, root)
    val before = AnnIndex.probeIvf(spark, root, queries, 5, nProbe = idx.nCentroids)
      .collect().map(_.toSeq).toSet
    AnnIndex.compactIvfIndex(spark, root)
    val after = AnnIndex.probeIvf(spark, root, queries, 5, nProbe = idx.nCentroids)
      .collect().map(_.toSeq).toSet
    assert(after === before)
    // the compacted version resolves no file lists — a whole-directory read
    val vDirs = java.nio.file.Files.list(java.nio.file.Paths.get(s"$root/postings"))
    val latest = try {
      import scala.jdk.CollectionConverters._
      vDirs.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("v")).map(_.drop(1).toInt).max
    } finally vDirs.close()
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$root/postings/v$latest/_FILELIST")))
    // and cid partition directories survive for probe-time pruning
    val entries = java.nio.file.Files.list(
      java.nio.file.Paths.get(s"$root/postings/v$latest"))
    val hasCidDirs = try {
      import scala.jdk.CollectionConverters._
      entries.iterator().asScala.exists(_.getFileName.toString.startsWith("cid="))
    } finally entries.close()
    assert(hasCidDirs)
  }

  test("the stored index carries codes only — no raw embedding column") {
    val root = tmpRoot("schema")
    AnnIndex.buildIvfIndex(emb.filter(col("vec_id") < 50), root)
    val cols = spark.read.parquet(s"$root/postings/v0").columns.toSet
    assert(cols === Set("nid", "code", "cid"))
  }

  test("append: full probe over an appended index == quantizedTopK over the union") {
    val base = emb.filter(col("vec_id") < 150)
    val batch = emb.filter(col("vec_id") >= 150 && col("vec_id") < 200)
    val root = tmpRoot("append")
    val idx = AnnIndex.buildIvfIndex(base, root)
    AnnIndex.appendToIvfIndex(batch, root)
    val probed = AnnIndex.probeIvf(spark, root, queries, 5, nProbe = idx.nCentroids)
      .collect().map(_.toSeq).toSet
    val brute = Similarity.quantizedTopK(base.unionByName(batch), queries, 5)
      .collect().map(_.toSeq).toSet
    assert(probed === brute && probed.nonEmpty)
  }

  test("append is a keyed upsert: re-appending the same batch is idempotent") {
    val base = emb.filter(col("vec_id") < 150)
    val batch = emb.filter(col("vec_id") >= 150 && col("vec_id") < 200)
    val root = tmpRoot("idem")
    val idx = AnnIndex.buildIvfIndex(base, root)
    AnnIndex.appendToIvfIndex(batch, root)
    val once = AnnIndex.probeIvf(spark, root, queries, 5, nProbe = idx.nCentroids)
      .collect().map(_.toSeq).toSet
    AnnIndex.appendToIvfIndex(batch, root)
    val twice = AnnIndex.probeIvf(spark, root, queries, 5, nProbe = idx.nCentroids)
      .collect().map(_.toSeq).toSet
    assert(once === twice)
    // and the LOGICAL row count did not grow (patch versions resolve through
    // their file list, so raw directory counts no longer describe a version)
    val t = new graft.write.VersionedTable(spark, s"$root/postings")
    assert(t.readVersion(1).count() === t.readVersion(2).count())
  }

  test("append is O(batch): writes files only for touched cells, inherits the rest") {
    val base = emb.filter(col("vec_id") < 150)
    val batch = emb.filter(col("vec_id") >= 150 && col("vec_id") < 155)
    val root = tmpRoot("delta")
    AnnIndex.buildIvfIndex(base, root)
    AnnIndex.appendToIvfIndex(batch, root)
    def cellDirs(v: Int): Set[String] = {
      val d = java.nio.file.Paths.get(s"$root/postings/v$v")
      val s = java.nio.file.Files.list(d)
      try {
        val it = s.iterator(); val out = scala.collection.mutable.Set.empty[String]
        while (it.hasNext) { val n = it.next().getFileName.toString
          if (n.startsWith("cid=")) out += n }
        out.toSet
      } finally s.close()
    }
    val baseCells = cellDirs(0)
    val patchCells = cellDirs(1)
    // a 5-vector batch assigns into at most 5 cells — the append version's
    // on-disk footprint is the batch's cell set, never the corpus's
    assert(patchCells.size <= 5,
      s"append staged ${patchCells.size} cell dirs for a 5-vector batch")
    assert(patchCells.size < baseCells.size,
      s"append rewrote as many cells (${patchCells.size}) as the corpus has")
    // the logical table still covers every base cell plus the patch
    val t = new graft.write.VersionedTable(spark, s"$root/postings")
    val merged = t.read()
    assert(merged.count() === base.count() + batch.count())
    assert(merged.select("nid").distinct().count() === merged.count())
    // and untouched cells' rows are byte-identical to the base version's
    val untouched = (baseCells -- patchCells).head.stripPrefix("cid=").toInt
    val before = t.readVersion(0).filter(col("cid") === untouched)
      .collect().map(_.toSeq).toSet
    val after = merged.filter(col("cid") === untouched)
      .collect().map(_.toSeq).toSet
    assert(before === after && before.nonEmpty)
  }

  test("delete is O(batch): tombstones append without touching the postings") {
    val root = tmpRoot("tomb")
    AnnIndex.buildIvfIndex(emb, root)
    val pt = new graft.write.VersionedTable(spark, s"$root/postings")
    val pv = pt.currentVersion
    AnnIndex.deleteFromIvfIndex(emb.select("vec_id").filter(col("vec_id") % 17 === 3), root)
    AnnIndex.deleteFromIvfIndex(emb.select("vec_id").filter(col("vec_id") % 23 === 5), root)
    // the footprint law: deletes never rewrite (or even version) the
    // postings — the cost is the tombstone batch, full stop
    assert(pt.currentVersion === pv)
    val tt = new graft.write.VersionedTable(spark, s"$root/tombstones")
    assert(tt.chainDepth <= 4)
    val nDead = AnnIndex.tombstones(spark, root).count()
    // re-delete is idempotent: the set stays a set, no new version needed
    val tv = tt.currentVersion
    AnnIndex.deleteFromIvfIndex(emb.select("vec_id").filter(col("vec_id") % 17 === 3), root)
    assert(tt.currentVersion === tv)
    assert(AnnIndex.tombstones(spark, root).count() === nDead)
    // deleting an absent id is a legal no-op for serving
    import spark.implicits._
    AnnIndex.deleteFromIvfIndex(Seq(999999L).toDF("vec_id"), root)
    assert(AnnIndex.probeIvf(spark, root, queries, 3).count() > 0)
  }

  test("delete-then-probe == rebuild-without-deleted, before and after compaction") {
    val dead = emb.select("vec_id").filter(col("vec_id") % 17 === 3)
    val root = tmpRoot("tombeq")
    val idx = AnnIndex.buildIvfIndex(emb, root)
    AnnIndex.deleteFromIvfIndex(dead, root)
    // FULL probe (every cell) so ANN cell routing can't mask a liveness bug
    def full() = AnnIndex.probeIvf(spark, root, queries, 5, nProbe = idx.nCentroids)
      .collect().map(_.toSeq).toSet
    val alive = emb.join(dead.withColumnRenamed("vec_id", "__dead"),
      col("vec_id") === col("__dead"), "left_anti")
    val want = Similarity.quantizedTopK(alive, queries, 5)
      .collect().map(_.toSeq).toSet
    val served = full()
    assert(served === want && served.nonEmpty)
    AnnIndex.compactIvfIndex(spark, root)
    assert(full() === want)
    // compaction PHYSICALLY dropped the rows and truncated the tombstones
    val pt = new graft.write.VersionedTable(spark, s"$root/postings")
    assert(pt.read().join(dead.withColumnRenamed("vec_id", "nid"), Seq("nid"))
      .count() === 0)
    assert(AnnIndex.tombstones(spark, root).count() === 0)
    assert(pt.chainDepth === 1)
  }

  test("append un-deletes: a re-ingested tombstoned id serves again") {
    import spark.implicits._
    val root = tmpRoot("undelete")
    val idx = AnnIndex.buildIvfIndex(emb, root)
    val victim = emb.filter(col("vec_id") === 3)
    AnnIndex.deleteFromIvfIndex(victim.select("vec_id"), root)
    assert(AnnIndex.tombstones(spark, root).as[Long].collect().toSet === Set(3L))
    AnnIndex.appendToIvfIndex(victim, root)
    assert(AnnIndex.tombstones(spark, root).count() === 0)
    // full-probe parity with the never-deleted corpus: the lifecycle
    // (delete then re-append) must be invisible to serving
    val got = AnnIndex.probeIvf(spark, root, queries, 5, nProbe = idx.nCentroids)
      .collect().map(_.toSeq).toSet
    val want = Similarity.quantizedTopK(emb, queries, 5)
      .collect().map(_.toSeq).toSet
    assert(got === want && got.nonEmpty)
  }

  test("q88/q93 fixture coupling: each twin's cell is inside its query's nProbe=3 cells") {
    // the q88/q93 oracles are exact brute force while the engine probes
    // nProbe=3 cells — their parity rests on every planted twin assigning
    // into one of its query's top-3 cells. Pin that invariant here so any
    // future drift in centroid training, fixture data, or nProbe fails with
    // a clear message instead of an opaque driver hash mismatch.
    import org.apache.spark.sql.functions.{transform => atransform}
    import spark.implicits._
    val probes = queries
    val twins = probes
      .withColumn("vec_id", col("vec_id") + 100000)
      .withColumn("embedding",
        atransform(col("embedding"), x => x + lit(0.02f)).cast("array<float>"))
    val root = tmpRoot("coupling")
    AnnIndex.buildIvfIndex(emb.unionByName(twins), root)
    val cents = new graft.write.VersionedTable(spark, s"$root/centroids").read()
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
    def cells(df: org.apache.spark.sql.DataFrame, k: Int): Map[Long, Seq[Int]] =
      df.select(col("vec_id").cast("long"),
          Similarity.nearestCidsExpr(cents, col("embedding").cast("array<double>"), k))
        .as[(Long, Seq[Int])].collect().toMap
    val queryCells = cells(probes, 3)
    val twinCells = cells(twins, 1)
    for ((tid, Seq(tCell)) <- twinCells) {
      val qid = tid - 100000
      assert(queryCells(qid).contains(tCell),
        s"twin $tid landed in cell $tCell, outside query $qid's nProbe=3 " +
          s"cells ${queryCells(qid)} — q88/q93's approximate-vs-exact-oracle " +
          "coupling is broken; retune the fixture or nProbe")
    }
    assert(twinCells.size === 5)
  }

  // --- rebalance --------------------------------------------------------

  /** Build + append the q228-shaped clump so at least one cell is hot. */
  private def skewedRoot(tag: String): String = {
    val root = tmpRoot(tag)
    val clump = emb.filter(col("vec_id") < 2)
      .crossJoin(broadcast(spark.range(80).select(col("id").as("r"))))
      .select((lit(200000L) + col("vec_id") * 100 + col("r")).as("vec_id"),
        transform(col("embedding"),
          x => x + lit(0.003f) * pmod(col("r"), lit(7)).cast("float"))
          .cast("array<float>").as("embedding"))
    AnnIndex.buildIvfIndex(emb, root)
    AnnIndex.appendToIvfIndex(clump, root)
    root
  }

  private def postings(root: String) =
    new graft.write.VersionedTable(spark, s"$root/postings").read()

  test("rebalance re-partitions the postings multiset exactly: nothing lost, duped, or recoded") {
    import spark.implicits._
    val root = skewedRoot("rebal")
    val before = postings(root)
      .select(col("nid"), col("code").cast("array<int>"), col("cid"))
      .as[(Long, Seq[Int], Int)].collect()
    val split = AnnIndex.rebalanceIvfIndex(spark, root, maxFactor = 2)
    assert(split.nonEmpty, "the clump fixture must make at least one cell hot")
    val after = postings(root)
      .select(col("nid"), col("code").cast("array<int>"), col("cid"))
      .as[(Long, Seq[Int], Int)].collect()
    // identical (nid, code) multiset
    assert(after.map(r => (r._1, r._2)).sortBy(_._1).toSeq ===
      before.map(r => (r._1, r._2)).sortBy(_._1).toSeq)
    // refinement: untouched cells keep their cid; hot members stay in
    // their old cid or move to a fresh one (> every pre-existing cid)
    val maxOld = before.map(_._3).max
    val beforeCid = before.map(r => r._1 -> r._3).toMap
    after.foreach { case (nid, _, cid) =>
      val old = beforeCid(nid)
      if (split.contains(old)) assert(cid === old || cid > maxOld)
      else assert(cid === old)
    }
    // balance improved: every split cell's halves are both strictly
    // smaller than the original hot cell
    val beforeSizes = before.groupBy(_._3).view.mapValues(_.length).toMap
    val afterSizes = after.groupBy(_._3).view.mapValues(_.length).toMap
    split.foreach { h =>
      assert(afterSizes(h) < beforeSizes(h))
      assert(afterSizes.keys.max > maxOld)
    }
  }

  test("rebalance writes only the touched cells; untouched cell files are inherited") {
    val root = skewedRoot("rebalfoot")
    val split = AnnIndex.rebalanceIvfIndex(spark, root, maxFactor = 2)
    assert(split.nonEmpty)
    val t = new graft.write.VersionedTable(spark, s"$root/postings")
    val v = t.currentVersion.get
    val d = java.nio.file.Paths.get(s"$root/postings/v$v")
    val s = java.nio.file.Files.list(d)
    val dirs = try {
      val it = s.iterator(); val out = scala.collection.mutable.Set.empty[String]
      while (it.hasNext) { val n = it.next().getFileName.toString
        if (n.startsWith("cid=")) out += n.stripPrefix("cid=").toInt.toString }
      out.toSet
    } finally s.close()
    // the patch version's own dirs are exactly: split cells + their fresh halves
    assert(dirs.size === 2 * split.size,
      s"rebalance staged ${dirs.size} cell dirs for ${split.size} splits: $dirs")
    split.foreach(h => assert(dirs.contains(h.toString)))
  }

  test("rebalance is deterministic and a no-op on a balanced index") {
    import spark.implicits._
    def assignment(root: String): Map[Long, Int] = {
      AnnIndex.rebalanceIvfIndex(spark, root, maxFactor = 2)
      postings(root).select(col("nid"), col("cid")).as[(Long, Int)].collect().toMap
    }
    assert(assignment(skewedRoot("det1")) === assignment(skewedRoot("det2")))
    // balanced: no clump — nothing exceeds 2x the median
    val root = tmpRoot("noop")
    AnnIndex.buildIvfIndex(emb, root)
    val v0 = new graft.write.VersionedTable(spark, s"$root/postings").currentVersion
    assert(AnnIndex.rebalanceIvfIndex(spark, root, maxFactor = 4) === Seq.empty)
    assert(new graft.write.VersionedTable(spark, s"$root/postings").currentVersion === v0)
  }

  test("filtered probe == tombstone-delete of the reject set (same machinery, same answer)") {
    // the semantic contract of filtered ANN: probing WHERE pred is exactly
    // probing an index whose pred-violating rows were taken down
    val lang = expr("CASE CAST(vec_id % 4 AS INT) WHEN 0 THEN 'en' ELSE 'xx' END")
    val corpus = emb.withColumn("lang", lang)
    val rootF = tmpRoot("filt")
    AnnIndex.buildIvfIndex(corpus, rootF, metaCols = Seq("lang"))
    val filtered = AnnIndex.probeIvf(spark, rootF, queries, 5, nProbe = 65536,
        pred = Some(col("lang") === "en"))
      .collect().map(_.toSeq).toSet
    val rootD = tmpRoot("filtdel")
    AnnIndex.buildIvfIndex(corpus, rootD, metaCols = Seq("lang"))
    AnnIndex.deleteFromIvfIndex(
      corpus.filter(col("lang") =!= "en").select("vec_id"), rootD)
    val deleted = AnnIndex.probeIvf(spark, rootD, queries, 5, nProbe = 65536)
      .collect().map(_.toSeq).toSet
    assert(filtered === deleted && filtered.nonEmpty)
    // and it equals the filtered brute force at full coverage
    val brute = Similarity.quantizedTopK(
        corpus.filter(col("lang") === "en"), queries, 5)
      .collect().map(_.toSeq).toSet
    assert(filtered === brute)
  }

  test("rebalanced index serves a full-coverage probe exactly == quantizedTopK") {
    val root = skewedRoot("rebalserve")
    val clump = emb.filter(col("vec_id") < 2)
      .crossJoin(broadcast(spark.range(80).select(col("id").as("r"))))
      .select((lit(200000L) + col("vec_id") * 100 + col("r")).as("vec_id"),
        transform(col("embedding"),
          x => x + lit(0.003f) * pmod(col("r"), lit(7)).cast("float"))
          .cast("array<float>").as("embedding"))
    AnnIndex.rebalanceIvfIndex(spark, root, maxFactor = 2)
    val probed = AnnIndex.probeIvf(spark, root, queries, 5, nProbe = 65536)
      .collect().map(_.toSeq).toSet
    val brute = Similarity.quantizedTopK(emb.unionByName(clump), queries, 5)
      .collect().map(_.toSeq).toSet
    assert(probed === brute && probed.nonEmpty)
  }
}

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
    // and the row count did not grow
    val n1 = spark.read.parquet(s"$root/postings/v1").count()
    val n2 = spark.read.parquet(s"$root/postings/v2").count()
    assert(n1 === n2)
  }
}

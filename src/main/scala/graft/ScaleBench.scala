package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale-slope harness (r12 verdict item 5): the bounded-cost
  * claims on the dedup/ANN/streaming paths are spec-pinned at one corpus
  * size; this MEASURES them across synthesized ×1/×2/×4/×8 corpora and
  * writes a SCALE_r*.json artifact, turning "the plan shape is linear"
  * into a bench-pinned number.
  *
  * Corpus synthesis preserves the claim being measured: each copy remaps
  * ids (disjoint ranges) and ROTATES the text alphabet (`translate` by a
  * per-copy Caesar shift), so copies share no shingles — near-dup density
  * per document stays constant as the corpus grows, which is exactly the
  * regime where the candidate-generation bounds claim linear total work.
  * (Cloning text verbatim would instead grow every identity bucket with
  * the scale factor and measure the hot-bucket cap, not the slope.)
  * Embedding copies shift by a small per-copy constant — same cluster
  * structure, disjoint ids.
  *
  * Workload expectations:
  *   - lsh_neardup (q26 core), containment (q144 core), exact_dedup (q25
  *     core): total work LINEAR in the corpus → wall ratio at ×8 ≈ 8
  *     (pass ≤ 16, i.e. visibly subquadratic; quadratic would read ~64).
  *   - ann_append (q93 core), streaming near-dup batch (q101 core): a
  *     FIXED batch against a ×8 index → O(batch)-dominated, near-FLAT
  *     (pass ≤ 3; linear-in-index would read ~8).
  */
object ScaleBench {

  private val Alpha = "abcdefghijklmnopqrstuvwxyz"

  private def scaleDocs(docs: DataFrame, k: Int): DataFrame =
    (0 until k).map { c =>
      val rot = Alpha.drop(c % 26) + Alpha.take(c % 26)
      docs.select((col("doc_id") + lit(c.toLong * 1000000L)).as("doc_id"),
        translate(col("text"), Alpha, rot).as("text"))
    }.reduce(_ unionByName _)

  private def scaleEmb(emb: DataFrame, k: Int): DataFrame =
    (0 until k).map { c =>
      emb.select((col("vec_id") + lit(c.toLong * 1000000L)).as("vec_id"),
        transform(col("embedding"), x => x + lit(c * 0.01f)).cast("array<float>")
          .as("embedding"))
    }.reduce(_ unionByName _)

  private def timeMin(reps: Int)(f: => Unit): Double =
    (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outPath = args.headOption.getOrElse("SCALE_r13.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config(graft.core.Tables.NanosConfKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.scale.{AnnIndex, Dedup}

    val baseDocs = graft.core.Tables.documents(spark, sfDir).select("doc_id", "text")
    val baseEmb = graft.core.Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val scales = Seq(1, 2, 4, 8)
    val reps = 2

    // fixed batches, ids and vocab disjoint from every scaled copy
    val fixedDocBatch = baseDocs.limit(200)
      .select((col("doc_id") + 50000000L).as("doc_id"),
        translate(col("text"), Alpha, Alpha.drop(13) + Alpha.take(13)).as("text"))
      .localCheckpoint()
    val fixedVecBatch = baseEmb.filter(col("vec_id") < 64)
      .select((col("vec_id") + 50000000L).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.5f)).cast("array<float>")
          .as("embedding"))
      .localCheckpoint()

    val results = scales.map { k =>
      val docs = scaleDocs(baseDocs, k).localCheckpoint()
      val emb = scaleEmb(baseEmb, k).localCheckpoint()
      val nDocs = docs.count(); val nVecs = emb.count()

      val tDedup = timeMin(reps) { Dedup.exact(docs).queryExecution.toRdd.count() }
      val tLsh = timeMin(reps) {
        val sigs = Dedup.minhashSignatures(docs).localCheckpoint()
        Dedup.jaccardVerify(docs, Dedup.minhashCandidates(sigs))
          .queryExecution.toRdd.count()
      }
      val tContain = timeMin(reps) {
        Dedup.containmentPairs(docs).queryExecution.toRdd.count()
      }
      // index build is untimed setup; the measured number is the FIXED
      // batch's append/drain against the ×k index
      val annRoot = s"${graft.core.Scratch.dir(s"graft-scale-ann$k")}/ivf"
      AnnIndex.buildIvfIndex(emb, annRoot)
      val tAppend = timeMin(reps) { AnnIndex.appendToIvfIndex(fixedVecBatch, annRoot) }
      val ndRoot = s"${graft.core.Scratch.dir(s"graft-scale-nd$k")}/nd"
      val nd = new graft.streaming.NearDupIndex(spark, ndRoot)
      nd.seed(docs)
      // distinct batch ids per rep: replay gating would no-op rep 2
      var b = 0
      val tStream = timeMin(reps) { nd.processBatch(fixedDocBatch, { b += 1; b.toLong }) }
      System.err.println(s"[scale] x$k docs=$nDocs vecs=$nVecs dedup=$tDedup lsh=$tLsh " +
        s"contain=$tContain append=$tAppend stream=$tStream")
      (k, nDocs, nVecs, Map(
        "exact_dedup" -> tDedup, "lsh_neardup" -> tLsh, "containment" -> tContain,
        "ann_append" -> tAppend, "streaming_neardup_batch" -> tStream))
    }

    val expectations = Map(
      "exact_dedup" -> ("linear", 16.0), "lsh_neardup" -> ("linear", 16.0),
      "containment" -> ("linear", 16.0),
      "ann_append" -> ("flat", 3.0), "streaming_neardup_batch" -> ("flat", 3.0))
    def f(v: Double) = f"$v%.3f"
    val byQ = results.head._4.keys.toSeq.sorted.map { q =>
      val times = results.map { case (k, _, _, m) => k -> m(q) }
      val ratio = times.last._2 / math.max(times.head._2, 1e-9)
      val (exp, bound) = expectations(q)
      val series = times.map { case (k, t) => s""""x$k":${f(t)}""" }.mkString(",")
      s""""$q":{$series,"ratio_x8":${f(ratio)},"expect":"$exp","bound":$bound,"pass":${ratio <= bound}}"""
    }.mkString(",")
    val sizes = results.map { case (k, d, v, _) => s""""x$k":{"docs":$d,"vecs":$v}""" }.mkString(",")
    val allPass = results.head._4.keys.forall { q =>
      val times = results.map(_._4(q))
      times.last / math.max(times.head, 1e-9) <= expectations(q)._2
    }
    val json =
      s"""{"artifact":"scale_slope","sf_dir":"$sfDir","scales":{$sizes},"workloads":{$byQ},"all_pass":$allPass}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
    if (!allPass) sys.exit(3)
  }
}

package graft.scale

import graft.core.{Q, Tables}
import graft.write.VersionedTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent ANN index: the build/probe split of [[Similarity.ivfTopKQuantized]].
  *
  * `ivfTopK*` retrain centroids and re-assign the whole corpus on every call —
  * right for a one-shot analytical query, wrong for a serving path where one
  * corpus snapshot answers many query batches. Here the expensive parts run
  * ONCE ([[buildIvfIndex]]) and are written as tables; [[probeIvf]] then reads
  * only what a query batch needs:
  *
  *   root/centroids  (cid int, centroid array<double>)   — nCentroids × dim
  *                   doubles, metadata-sized (the k-means model);
  *   root/postings   (nid long, code array<tinyint>) partitioned by cid —
  *                   the int8-quantized corpus, hive-partitioned by cell so a
  *                   probe's cid filter prunes whole directories
  *                   (PartitionFilters, asserted in PlanSpec).
  *
  * Both are [[graft.write.VersionedTable]]s: a rebuild stages a full new
  * version and atomically flips the manifest, so probes running concurrently
  * with a rebuild keep reading a consistent snapshot — the same stage+promote
  * protocol as the W5 summary tables.
  *
  * Probe cost shape: a query batch touches nProbe cells ≈ nProbe/√n of the
  * corpus (directory-pruned, never a full scan), reads 1-byte codes instead
  * of 8-byte doubles (the raw `embedding` column is never stored in the
  * index, so the probe CANNOT scan it — ReadSchema is (nid, code)), and
  * reranks through the native integer MAC ([[graft.expressions.Int8DotProduct]])
  * with exact BIGINT scores. With nProbe = nCentroids the probe equals
  * [[Similarity.quantizedTopK]] exactly (SimilaritySpec parity law).
  */
object AnnIndex {

  /** Handle to a built index (paths + the parameters baked into it). */
  final case class IvfIndex(root: String, nCentroids: Int)

  private def centroidsTable(spark: SparkSession, root: String) =
    new VersionedTable(spark, s"$root/centroids")
  private def postingsTable(spark: SparkSession, root: String) =
    new VersionedTable(spark, s"$root/postings")

  /** Build (or rebuild) the index at `root`: train centroids over a bounded
    * sample, assign every corpus vector its nearest cell, quantize to int8
    * codes, and write both tables — each scan-shaped job runs exactly once.
    * The corpus never shuffles: assignment and quantization are codegen'd
    * projections and the partitioned write's directory split replaces any
    * key shuffle.
    */
  def buildIvfIndex(corpus: DataFrame, root: String,
                    nCentroids: Int = -1, trainIters: Int = 4,
                    idCol: String = "vec_id", vecCol: String = "embedding"): IvfIndex = {
    val nCents = Similarity.resolveNCentroids(corpus, nCentroids)
    buildIvfIndexWith(corpus, root,
      Similarity.centroidsFor(corpus, nCents, trainIters, idCol, vecCol),
      idCol, vecCol)
  }

  /** [[buildIvfIndex]] with a caller-supplied centroid model (unit-norm
    * doubles, ids 0..n-1) instead of the sample-trained default — the hook
    * for FULL-CORPUS training: [[Kmeans.lloyd]] refines centroids with
    * distributed rounds that touch every vector, then
    * [[Kmeans.unitCentroids]] projects them onto the sphere the dot-product
    * assignment expects. Same storage, probe and append contracts.
    */
  def buildIvfIndexWith(corpus: DataFrame, root: String,
                        cents: Array[(Int, Seq[Double])],
                        idCol: String = "vec_id", vecCol: String = "embedding"): IvfIndex = {
    val spark = corpus.sparkSession
    Similarity.requireNumericId(corpus, idCol, "buildIvfIndex")

    import spark.implicits._
    val centsDf = cents.toSeq.toDF("cid", "centroid")
    val ct = centroidsTable(spark, root)
    ct.promote(ct.stage(centsDf))

    val postings = Similarity.quantizeInt8(corpus, vecCol)
      .withColumn("cid", element_at(
        Similarity.nearestCidsExpr(cents, col(vecCol).cast("array<double>"), 1), 1))
      .select(col(idCol).cast("long").as("nid"), col("qcode").as("code"), col("cid"))
    val pt = postingsTable(spark, root)
    pt.promote(pt.stage(postings, Seq("cid")))
    IvfIndex(root, cents.length)
  }

  /** Append a batch of new vectors to an existing index WITHOUT retraining:
    * assign each one to its nearest EXISTING centroid, quantize, and merge
    * into the postings as a keyed upsert on nid (a re-crawled id replaces
    * its old posting — the W4 semantic, [[graft.write.Writers.upsert]]),
    * staged and atomically promoted. Centroids are unchanged — the standard
    * serving compromise: appends between periodic rebuilds keep working by
    * assigning into the existing cells, a full [[buildIvfIndex]] re-trains.
    * Under a full probe the appended index answers exactly like a fresh
    * index over the union corpus (AnnIndexSpec law — cell assignment can
    * differ, the scanned set cannot), and re-appending the same batch is a
    * no-op (idempotence law).
    *
    * Write cost is O(touched cells), NOT O(corpus): only the cells the batch
    * assigns into are read (directory-pruned), merged, and rewritten; every
    * untouched cell is inherited by reference through the patch version's
    * file list ([[graft.write.VersionedTable.stagePatch]] — zero files
    * written for an untouched cid, asserted in AnnIndexSpec). A crawl
    * appending small batches between rebuilds therefore pays per-batch work
    * proportional to the batch's cell footprint.
    *
    * Contract: the upsert is exact within a cell. A re-crawled id whose NEW
    * vector assigns to a DIFFERENT cell than its old posting leaves the
    * stale posting in the old cell (same-vector re-appends are unaffected —
    * the assignment is deterministic); crossing-cell re-crawls need a
    * periodic [[buildIvfIndex]] rebuild, the IVF analogue of LSM
    * compaction. The touched-cid collect is bounded by the batch's distinct
    * cell count, ≤ nCentroids — the same metadata class as the centroids
    * themselves.
    */
  def appendToIvfIndex(newVectors: DataFrame, root: String,
                       idCol: String = "vec_id", vecCol: String = "embedding"): IvfIndex = {
    val spark = newVectors.sparkSession
    Similarity.requireNumericId(newVectors, idCol, "appendToIvfIndex")
    val cents = readCentroids(spark, root)
    val newPostings = Similarity.quantizeInt8(newVectors, vecCol)
      .withColumn("cid", element_at(
        Similarity.nearestCidsExpr(cents, col(vecCol).cast("array<double>"), 1), 1))
      .select(col(idCol).cast("long").as("nid"), col("qcode").as("code"), col("cid"))
      .localCheckpoint()
    val touched = newPostings.select("cid").distinct().collect().map(_.getInt(0))
    val pt = postingsTable(spark, root)
    val existingTouched = pt.read()
      .filter(col("cid").isin(touched.map(Integer.valueOf): _*))
    val merged = graft.write.Writers.upsert(existingTouched, newPostings, Seq("nid"))
    pt.promote(pt.stagePatch(merged, Seq("cid")))
    IvfIndex(root, cents.length)
  }

  /** Collapse the postings patch chain an append-heavy crawl accumulates
    * ([[appendToIvfIndex]] patches only touched cells, so each append adds a
    * version resolving most cells by file-list reference) into ONE
    * self-contained whole-directory version — the LSM compaction step.
    * Re-staged partitioned by cid, so probe directory-pruning is preserved;
    * probe answers are identical before and after (q111 certifies this
    * through the oracle). Run periodically, between appends — the promote
    * carries the current tag, so any batch-stamped protocol survives.
    */
  def compactIvfIndex(spark: SparkSession, root: String): Unit = {
    postingsTable(spark, root).compact(Seq("cid"))
    ()
  }

  /** Read the centroid model back as the driver-side array the assignment
    * kernel needs — nCentroids × dim doubles, the same metadata-bounded
    * collect class as centroid training itself.
    */
  private def readCentroids(spark: SparkSession, root: String): Array[(Int, Seq[Double])] =
    centroidsTable(spark, root).read()
      .select(col("cid"), col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1)

  /** Probe a prebuilt index: route each query to its `nProbe` nearest cells,
    * scan ONLY those cells' postings (the cid filter is a driver-resolved IN
    * list over a partition column — directory pruning, no corpus scan), and
    * rerank by the exact int8 dot product. Output (qid, rnk, nid, score),
    * the [[Similarity.quantizedTopK]] shape.
    *
    * The probed-cid collect is bounded by |queries| × nProbe — queries must
    * be broadcast-small, the same contract as every top-k form here.
    */
  def probeIvf(spark: SparkSession, root: String, queries: DataFrame, k: Int,
               nProbe: Int = 3,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    Similarity.requireNumericId(queries, idCol, "probeIvf")
    val cents = readCentroids(spark, root)
    // localCheckpoint: the quantize + centroid-assignment job runs ONCE —
    // the probeCids collect below and the candidate join both read the
    // materialized rows (a second evaluation would double the query-side
    // work on the path built for probe-many serving); blocks free with the
    // query's DataFrames
    val q = Similarity.quantizeInt8(queries, vecCol)
      .withColumn("cid", explode(
        Similarity.nearestCidsExpr(cents, col(vecCol).cast("array<double>"),
          math.min(nProbe, cents.length))))
      .select(col(idCol).cast("long").as("qid"), col("qcode").as("qc"), col("cid"))
      .localCheckpoint()
    val probeCids = q.select("cid").distinct().collect().map(_.getInt(0))
    // guard the broadcast-small-queries contract: a corpus-sized query table
    // would both blow the broadcast below and turn this IN list into a
    // megabyte plan literal — route that shape through knnJoinQuantized
    require(probeCids.length <= 65536,
      s"probeIvf routed ${probeCids.length} distinct cells — the query table " +
        "is not broadcast-small; use Similarity.knnJoinQuantized for " +
        "corpus-vs-corpus kNN")
    val postings = postingsTable(spark, root).read()
      .filter(col("cid").isin(probeCids.map(Integer.valueOf): _*))
    val scored = postings.join(broadcast(q), Seq("cid"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), Similarity.int8Dot(col("qc"), col("code")).as("score"))
    Similarity.longScoreTopK(scored, k)
  }

  // ---- declared queries ----------------------------------------------------

  val queries: Seq[Q] = Seq(

    // Build-once/probe-many IVF serving path, driver-certified with the q31
    // planted-twin invariant on the q83 quantized arithmetic: each query
    // vector gets a near-identical twin under qid+100000 (sim ≈ 0.99 vs
    // ≤ 0.52 for any random pair — the int8 dot preserves that margin), so
    // the oracle computes the true rank-1 by quantized brute force while the
    // engine must reach it through a PREBUILT index: centroids + int8
    // postings written as versioned tables, then probed with nProbe=3 —
    // scanning only the probed cells' directories, never the raw vectors
    // (the index stores codes only). Scores are exact BIGINTs (q83's
    // IEEE-identical quantization), so the row hash-compares value-exact.
    Q("q88_ann_index_probe",
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | corp AS (SELECT vec_id, v FROM base
        |          UNION ALL
        |          SELECT vec_id + 100000,
        |            CAST(list_transform(embedding, x -> x + CAST(0.02 AS FLOAT)) AS DOUBLE[])
        |          FROM embeddings WHERE vec_id < 5),
        | qz AS (
        |  SELECT vec_id,
        |    CASE WHEN smax = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |         ELSE list_transform(v, x -> CAST(round(x / smax * 127) AS BIGINT))
        |    END AS code
        |  FROM (SELECT vec_id, v,
        |          list_max(list_transform(v, x -> abs(x))) AS smax FROM corp)),
        | q AS (SELECT vec_id AS qid, code AS qc FROM qz WHERE vec_id < 5),
        | c AS (SELECT vec_id AS nid, code AS cc FROM qz),
        | scored AS (
        |   SELECT qid, nid, CAST(list_dot_product(qc, cc) AS BIGINT) AS score
        |   FROM q, c WHERE qid <> nid),
        | ranked AS (SELECT qid, nid, score,
        |   row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rnk
        |   FROM scored)
        |SELECT qid, nid, score FROM ranked WHERE rnk = 1 ORDER BY qid""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val probes = emb.filter(col("vec_id") < 5)
      val twins = probes
        .withColumn("vec_id", col("vec_id") + 100000)
        .withColumn("embedding",
          transform(col("embedding"), x => x + lit(0.02f)).cast("array<float>"))
      val root = s"${graft.core.Scratch.dir("graft-q88")}/ivf"
      buildIvfIndex(emb.unionByName(twins), root)
      probeIvf(s, root, probes, k = 1, nProbe = 3)
        .filter(col("rnk") === 1)
        .select("qid", "nid", "score")
        .orderBy("qid")
    },

    // Incremental serving: the q88 invariant reached through an APPENDED
    // index — the base index is built WITHOUT the twins, which then arrive
    // as a later crawl batch via appendToIvfIndex (assigned into the
    // existing cells, no retrain, atomic promote). The probe must surface
    // each twin at rank 1 exactly as if it had been indexed from the start;
    // a twin assigns to its query's own top cell (near-identical vectors,
    // same argmax centroid), so nProbe=3 reaches it through unchanged
    // centroids. Same quantized brute-force oracle as q88: the serving
    // answer is index-lifecycle-invariant.
    Q("q93_ann_index_append",
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | corp AS (SELECT vec_id, v FROM base
        |          UNION ALL
        |          SELECT vec_id + 100000,
        |            CAST(list_transform(embedding, x -> x + CAST(0.02 AS FLOAT)) AS DOUBLE[])
        |          FROM embeddings WHERE vec_id < 5),
        | qz AS (
        |  SELECT vec_id,
        |    CASE WHEN smax = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |         ELSE list_transform(v, x -> CAST(round(x / smax * 127) AS BIGINT))
        |    END AS code
        |  FROM (SELECT vec_id, v,
        |          list_max(list_transform(v, x -> abs(x))) AS smax FROM corp)),
        | q AS (SELECT vec_id AS qid, code AS qc FROM qz WHERE vec_id < 5),
        | c AS (SELECT vec_id AS nid, code AS cc FROM qz),
        | scored AS (
        |   SELECT qid, nid, CAST(list_dot_product(qc, cc) AS BIGINT) AS score
        |   FROM q, c WHERE qid <> nid),
        | ranked AS (SELECT qid, nid, score,
        |   row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rnk
        |   FROM scored)
        |SELECT qid, nid, score FROM ranked WHERE rnk = 1 ORDER BY qid""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val probes = emb.filter(col("vec_id") < 5)
      val twins = probes
        .withColumn("vec_id", col("vec_id") + 100000)
        .withColumn("embedding",
          transform(col("embedding"), x => x + lit(0.02f)).cast("array<float>"))
      val root = s"${graft.core.Scratch.dir("graft-q93")}/ivf"
      buildIvfIndex(emb, root)
      appendToIvfIndex(twins, root)
      probeIvf(s, root, probes, k = 1, nProbe = 3)
        .filter(col("rnk") === 1)
        .select("qid", "nid", "score")
        .orderBy("qid")
    },

    // q93's lifecycle with a compaction in the middle: build → append (the
    // postings are now a patch chain) → compactIvfIndex (chain collapses to
    // one self-contained cid-partitioned version) → probe. The answer must
    // be byte-identical to q93's — compaction is invisible to serving.
    Q("q111_ann_compact",
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | corp AS (SELECT vec_id, v FROM base
        |          UNION ALL
        |          SELECT vec_id + 100000,
        |            CAST(list_transform(embedding, x -> x + CAST(0.02 AS FLOAT)) AS DOUBLE[])
        |          FROM embeddings WHERE vec_id < 5),
        | qz AS (
        |  SELECT vec_id,
        |    CASE WHEN smax = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |         ELSE list_transform(v, x -> CAST(round(x / smax * 127) AS BIGINT))
        |    END AS code
        |  FROM (SELECT vec_id, v,
        |          list_max(list_transform(v, x -> abs(x))) AS smax FROM corp)),
        | q AS (SELECT vec_id AS qid, code AS qc FROM qz WHERE vec_id < 5),
        | c AS (SELECT vec_id AS nid, code AS cc FROM qz),
        | scored AS (
        |   SELECT qid, nid, CAST(list_dot_product(qc, cc) AS BIGINT) AS score
        |   FROM q, c WHERE qid <> nid),
        | ranked AS (SELECT qid, nid, score,
        |   row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rnk
        |   FROM scored)
        |SELECT qid, nid, score FROM ranked WHERE rnk = 1 ORDER BY qid""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val probes = emb.filter(col("vec_id") < 5)
      val twins = probes
        .withColumn("vec_id", col("vec_id") + 100000)
        .withColumn("embedding",
          transform(col("embedding"), x => x + lit(0.02f)).cast("array<float>"))
      val root = s"${graft.core.Scratch.dir("graft-q111")}/ivf"
      buildIvfIndex(emb, root)
      appendToIvfIndex(twins, root)
      compactIvfIndex(s, root)
      probeIvf(s, root, probes, k = 1, nProbe = 3)
        .filter(col("rnk") === 1)
        .select("qid", "nid", "score")
        .orderBy("qid")
    },
  )
}

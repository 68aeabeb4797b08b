package graft.scale

import graft.core.{Q, Tables}
import graft.expressions.{ArgMinCentroidL2, VecSumLong}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over integer grid codes — centroid training
  * that touches every corpus vector, not a driver-local sample.
  *
  * [[Similarity.trainCentroids]] (the IVF default) k-means a bounded 2,048-
  * row sample on the driver: the right call for centroid SEEDING at any
  * scale, but the centroids only ever see the sample. This is the full
  * counterpart: each Lloyd iteration is one corpus scan — a codegen'd
  * E-step through the native [[graft.expressions.ArgMinCentroidL2]] kernel
  * (k×dim longs ride along once per task as a reference object) and an
  * M-step through the native [[graft.expressions.VecSumLong]] aggregate
  * (map-side partials: one long[dim] per (partition, cluster) on the
  * shuffle, never the vectors). The only driver state is k rows of
  * sufficient statistics per iteration — bounded regardless of corpus size,
  * the same contract as every other collect in this package.
  *
  * Everything is integer arithmetic, value-exact on any engine:
  *  - codes quantize to a GLOBAL grid (`round(clip(x)·256) + 512` ∈
  *    [0, 1024]) — one shared scale, unlike the per-vector symmetric scale
  *    of [[Similarity.quantizeInt8]], because clustering compares DISTANCES
  *    ACROSS vectors and a per-vector scale would warp the space. The ×256
  *    is a power of two, so float→double widen and multiply are exact and
  *    the rounding decision is bit-identical cross-engine.
  *  - distances are exact long sums of squared differences (≤ dim·2²⁰ per
  *    row — 2⁶³ is out of reach for any realistic dim), ties to the
  *    SMALLEST cid, the `ORDER BY dist, cid` order any SQL replay produces.
  *  - new centroids are element-wise `sum DIV n` over NONNEGATIVE sums, so
  *    truncating and flooring division agree and both engines produce the
  *    same quantized centroid. Empty clusters keep their previous centroid.
  *  - seeds are the hash-order head (`ORDER BY md5(id), id LIMIT k` — the
  *    [[Similarity]] sampling order), so the whole trajectory is a pure
  *    function of the data.
  *
  * Scale shape at 100 TB: iters × (one scan + one k-group aggregate); no
  * join, no explode, nothing corpus-sized on any shuffle or the driver.
  * Skew is structurally absent — the aggregate's key space is exactly k.
  */
object Kmeans {

  /** Grid quantization constants: clip to ±[[GridClip]], scale by
    * [[GridScale]] (a power of two — exact double multiply), offset to
    * nonnegative so M-step division semantics can't diverge cross-engine.
    */
  val GridScale = 256
  val GridClip = 2.0
  val GridOffset = 512L

  /** Append `codeCol`: the global-grid integer code of `vecCol`
    * (`array<bigint>`, every element in [0, 2·[[GridOffset]]]). Pure
    * codegen'd projection.
    */
  def quantizeGrid(df: DataFrame, vecCol: String = "embedding",
                   codeCol: String = "gcode"): DataFrame = {
    val vd = col(vecCol).cast("array<double>")
    df.withColumn(codeCol,
      transform(vd, x =>
        round(least(greatest(x, lit(-GridClip)), lit(GridClip)) * GridScale)
          .cast("long") + lit(GridOffset)))
  }

  /** Deterministic seeds: the k grid codes first in (md5(id), id) order —
    * the package's standard hash-order head. Bounded k-row collect.
    */
  def seedCentroids(df: DataFrame, k: Int, idCol: String = "vec_id",
                    codeCol: String = "gcode"): Array[Array[Long]] = {
    val rows = df
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(k)
      .select(col(codeCol))
      .collect()
    require(rows.length == k, s"need at least $k vectors to seed, got ${rows.length}")
    rows.map(_.getSeq[Long](0).toArray)
  }

  private def ncol = org.apache.spark.sql.GraftColumnBridge.column _
  private def nexpr = org.apache.spark.sql.GraftColumnBridge.expression _

  /** E-step as a projection: append `cidCol` (nearest centroid, ties to the
    * smallest id) and `distCol` (exact squared distance) via one fused
    * kernel scan.
    */
  def assignNearest(df: DataFrame, cents: Array[Array[Long]],
                    codeCol: String = "gcode", cidCol: String = "cid",
                    distCol: String = "dist"): DataFrame = {
    require(cents.nonEmpty && cents.map(_.length).distinct.length == 1,
      "centroids must be non-empty and share one dimension")
    val near = ncol(ArgMinCentroidL2(
      nexpr(col(codeCol)), cents.flatten, cents.length, cents.head.length))
    df.withColumn("__near", near)
      .withColumn(cidCol, col("__near.cid"))
      .withColumn(distCol, col("__near.dist"))
      .drop("__near")
  }

  /** `iters` full Lloyd rounds (assign → recompute) from the deterministic
    * seeds. Returns the final centroid matrix. Driver work per round: k
    * rows of (count, long[dim]) — metadata-bounded.
    */
  def lloyd(df: DataFrame, k: Int, iters: Int, idCol: String = "vec_id",
            codeCol: String = "gcode"): Array[Array[Long]] = {
    var cents = seedCentroids(df, k, idCol, codeCol)
    for (_ <- 0 until iters) {
      val stats = assignNearest(df, cents, codeCol)
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n"),
          ncol(VecSumLong(nexpr(col(codeCol))).toAggregateExpression()).as("s"))
        .collect()
      val byCid = stats.map(r =>
        r.getInt(0) -> (r.getLong(1), r.getSeq[Long](2).toArray)).toMap
      cents = Array.tabulate(k) { c =>
        byCid.get(c) match {
          // floorDiv, not /: signed code grids (int8 PQ postings in
          // rebalanceIvfIndex) produce negative sums, and truncation
          // toward zero would bias those centroids toward 0. For the
          // nonnegative grids the two divisions coincide.
          case Some((n, s)) => s.map(Math.floorDiv(_, n))
          case None         => cents(c)     // empty cluster keeps its centroid
        }
      }
    }
    cents
  }

  /** Final report for a trained model: one row per (cid, dim position) —
    * cluster size, exact inertia under the final centroids, and the
    * centroid element (arrays exploded to scalar cells for the driver's
    * celled compare, the [[Similarity]] q112 convention).
    */
  def report(spark: SparkSession, df: DataFrame, cents: Array[Array[Long]],
             codeCol: String = "gcode"): DataFrame = {
    import spark.implicits._
    val stats = assignNearest(df, cents, codeCol)
      .groupBy(col("cid").cast("long").as("cid"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("dist")).as("inertia"))
    val centsDf = cents.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toSeq) }.toSeq
      .toDF("cid", "cent")
    centsDf.join(stats, Seq("cid"), "left")
      .na.fill(0L, Seq("n_vecs", "inertia"))
      .select(col("cid"), col("n_vecs"), col("inertia"),
        posexplode(col("cent")).as(Seq("pos0", "cval")))
      .select(col("cid"), col("n_vecs"), col("inertia"),
        (col("pos0") + 1).cast("long").as("pos"), col("cval"))
      .orderBy("cid", "pos")
  }

  /** Cluster-scoped semantic dedup (the SemDeDup shape): train k-means on
    * the corpus, then compare vectors ONLY within their cluster and drop
    * every vector that has a smaller-id neighbor at squared grid distance
    * ≤ `maxSqDist`. Returns the survivors (id, cid).
    *
    * This is the embedding complement of MinHash near-dup
    * ([[Dedup.minhashCandidates]]) and the scale path past q32's bit-probe
    * LSH: the cluster assignment is the blocking key, so candidate
    * generation is ONE co-partitioned self-join on `cid` — no all-pairs.
    * Pair work is Σ|cell|², bounded by training k: at larger corpora raise
    * k proportionally (cells stay O(n/k)) — the published SemDeDup recipe.
    * Like any cluster-scoped dedup, a near-dup pair split across a cluster
    * boundary is not compared — recall is bounded by assignment locality,
    * which is the accepted trade of this operator class.
    *
    * Distances are exact long sums over grid codes; the drop rule (smaller
    * id wins, no transitive chaining) is deterministic on any engine.
    */
  def semDedup(corpus: DataFrame, k: Int, iters: Int, maxSqDist: Long,
               idCol: String = "vec_id"): DataFrame = {
    val g = quantizeGrid(corpus)
    val cents = lloyd(g, k, iters, idCol)
    val a = assignNearest(g, cents).select(col(idCol), col("cid"), col("gcode"))
    val x = a.select(col(idCol).as("xid"), col("cid").as("xcid"), col("gcode").as("xg"))
    val y = a.select(col(idCol).as("yid"), col("cid").as("ycid"), col("gcode").as("yg"))
    // fused codegen'd kernel: the pair scan is Σ|cell|² evaluations — the
    // interpreted aggregate(zip_with(...)) HOF was the hottest loop in q125
    val sq = ncol(graft.expressions.SqDistLong(nexpr(col("xg")), nexpr(col("yg"))))
    val dropped = x.join(y, col("xcid") === col("ycid") && col("yid") < col("xid"))
      .filter(sq <= maxSqDist)
      .select(col("xid").as(idCol)).distinct()
    a.join(dropped, Seq(idCol), "left_anti")
      .select(col(idCol), col("cid").cast("long").as("cid"))
  }

  // q121: 3 Lloyd rounds, k=10, over the 64-dim embeddings — the oracle
  // replays the ENTIRE trajectory (seeding order, every assignment, every
  // quantized centroid update, the final inertia) as unrolled CTEs; one
  // vector assigned to the wrong cluster in round 1 cascades into different
  // centroids everywhere and hash-fails. dim=64 is hardcoded in the SQL
  // (constant across SFs); the engine reads it from the data.
  private val K = 10
  private val Iters = 3

  private def iterSql(i: Int, dim: Int, pre: String): String = {
    val p = i - 1
    s"""${pre}d$i AS (
       |  SELECT e.vec_id, c.cid,
       |         SUM((e.g[t.i] - c.cent[t.i]) * (e.g[t.i] - c.cent[t.i])) AS dist
       |  FROM ${pre}e e CROSS JOIN ${pre}c$p c CROSS JOIN range(1, ${dim + 1}) t(i)
       |  GROUP BY e.vec_id, c.cid),
       |${pre}a$i AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM ${pre}d$i) WHERE rn = 1),
       |${pre}s$i AS (
       |  SELECT a.cid, t.i, SUM(e.g[t.i]) AS s
       |  FROM ${pre}a$i a JOIN ${pre}e e USING (vec_id) CROSS JOIN range(1, ${dim + 1}) t(i)
       |  GROUP BY a.cid, t.i),
       |${pre}n$i AS (SELECT cid, count(1) AS n FROM ${pre}a$i GROUP BY cid),
       |${pre}u$i AS (
       |  SELECT s.cid, list(CAST(s.s // n.n AS BIGINT) ORDER BY s.i) AS cent
       |  FROM ${pre}s$i s JOIN ${pre}n$i n USING (cid) GROUP BY s.cid),
       |${pre}c$i AS (
       |  SELECT c.cid, COALESCE(u.cent, c.cent) AS cent
       |  FROM ${pre}c$p c LEFT JOIN ${pre}u$i u USING (cid))""".stripMargin
  }

  /** The Lloyd-replay CTE list (no leading WITH): quantize `corpusSql` (a
    * SELECT of vec_id + FLOAT[] embedding of `dim` elements), seed, run
    * `iters` unrolled rounds with `k` centroids, and assign every vector
    * under the final centroids. Exposed CTEs (all `pre`-prefixed so two
    * trainings can compose in one statement — [[Pq]]'s IVF+PQ oracle runs a
    * coarse and a codebook replay side by side): `<pre>e` (vec_id, g),
    * `<pre>c<iters>` (final centroids), `<pre>af` (vec_id, cid, dist).
    */
  private[scale] def lloydCtes(corpusSql: String, k: Int, iters: Int,
                               dim: Int, pre: String = "", raw: Boolean = false): String = {
    // raw = true: `embedding` is ALREADY a nonnegative BIGINT code list
    // (e.g. offset residuals) — skip the grid transform. The nonnegativity
    // contract still holds, so the M-step division stays engine-exact.
    val quant = if (raw) s"SELECT vec_id, embedding AS g FROM ${pre}e0"
    else
      s"""SELECT vec_id,
         |         list_transform(embedding, x ->
         |           CAST(round(least(greatest(CAST(x AS DOUBLE), -2.0), 2.0) * 256)
         |                AS BIGINT) + 512) AS g
         |  FROM ${pre}e0""".stripMargin
    s"""${pre}e0 AS ($corpusSql),
       |${pre}e AS (
       |  $quant),
       |${pre}seed AS (
       |  SELECT g, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid
       |  FROM ${pre}e QUALIFY cid < $k),
       |${pre}c0 AS (SELECT cid, g AS cent FROM ${pre}seed),
       |${(1 to iters).map(iterSql(_, dim, pre)).mkString(",\n")},
       |${pre}df AS (
       |  SELECT e.vec_id, c.cid,
       |         SUM((e.g[t.i] - c.cent[t.i]) * (e.g[t.i] - c.cent[t.i])) AS dist
       |  FROM ${pre}e e CROSS JOIN ${pre}c$iters c CROSS JOIN range(1, ${dim + 1}) t(i)
       |  GROUP BY e.vec_id, c.cid),
       |${pre}af AS (
       |  SELECT vec_id, cid, dist FROM (
       |    SELECT vec_id, cid, dist,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM ${pre}df) WHERE rn = 1)""".stripMargin
  }

  /** [[lloydCtes]] as a complete WITH prefix — the single-training form
    * q121/q125/q130 build on.
    */
  private[scale] def lloydPrefixSql(corpusSql: String, k: Int = K,
                                    iters: Int = Iters, dim: Int = 64): String =
    s"WITH ${lloydCtes(corpusSql, k, iters, dim)}"

  private val q121Sql: String =
    s"""${lloydPrefixSql("SELECT vec_id, embedding FROM embeddings")},
       |fs AS (SELECT cid, count(1) AS n_vecs, CAST(SUM(dist) AS BIGINT) AS inertia
       |       FROM af GROUP BY cid)
       |SELECT CAST(c.cid AS BIGINT) AS cid,
       |       COALESCE(f.n_vecs, 0) AS n_vecs,
       |       COALESCE(f.inertia, 0) AS inertia,
       |       CAST(generate_subscripts(c.cent, 1) AS BIGINT) AS pos,
       |       unnest(c.cent) AS cval
       |FROM c$Iters c LEFT JOIN fs f USING (cid)
       |ORDER BY cid, pos""".stripMargin

  // q125: SemDeDup over the corpus plus 40 planted twins (+0.02 per
  // component, the q31 fixture convention). The oracle replays the FULL
  // trajectory — same seeds, same three Lloyd rounds over the twin-extended
  // corpus, same final assignment — then the within-cluster pair scan and
  // the smaller-id drop rule. A twin sits ~sqrt(64*5²)≈40 grid units from
  // its original vs hundreds for unrelated pairs, so maxSqDist=10000
  // separates cleanly; a twin that lands in a different cluster than its
  // original survives BY DESIGN on both engines (cluster-scoped recall).
  private val q125Sql: String =
    s"""${lloydPrefixSql(
        """SELECT vec_id, embedding FROM embeddings
          |       UNION ALL
          |       SELECT vec_id + 100000,
          |              list_transform(embedding, x -> x + CAST(0.02 AS FLOAT))
          |       FROM embeddings WHERE vec_id < 40""".stripMargin)},
       |p AS (
       |  SELECT x.vec_id AS a
       |  FROM af x JOIN af y ON x.cid = y.cid AND y.vec_id < x.vec_id
       |  JOIN e ex ON ex.vec_id = x.vec_id
       |  JOIN e ey ON ey.vec_id = y.vec_id
       |  CROSS JOIN range(1, 65) t(i)
       |  GROUP BY x.vec_id, y.vec_id
       |  HAVING SUM((ex.g[t.i] - ey.g[t.i]) * (ex.g[t.i] - ey.g[t.i])) <= 10000)
       |SELECT f.vec_id, CAST(f.cid AS BIGINT) AS cid FROM af f
       |WHERE f.vec_id NOT IN (SELECT DISTINCT a FROM p)
       |ORDER BY f.vec_id""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q121_kmeans", q121Sql) { (s, d) =>
      val g = quantizeGrid(Tables.embeddings(s, d).select("vec_id", "embedding"))
      val cents = lloyd(g, K, Iters)
      report(s, g, cents)
    },

    Q("q125_semdedup", q125Sql) { (s, d) =>
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val twins = emb.filter(col("vec_id") < 40)
        .withColumn("vec_id", col("vec_id") + 100000)
        .withColumn("embedding",
          transform(col("embedding"), x => x + lit(0.02f)).cast("array<float>"))
      semDedup(emb.unionByName(twins), K, Iters, maxSqDist = 10000L)
        .orderBy("vec_id")
    },
  )
}

package graft.scale

import graft.core.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization — the memory-scale path for billion-vector ANN.
  *
  * IVF ([[AnnIndex]]) prunes WHICH vectors a query scans; PQ shrinks WHAT
  * each scanned vector costs: every vector is split into [[M]] subvectors,
  * each subvector is replaced by the id of its nearest codebook centroid,
  * and a query scores a vector by summing M table lookups (asymmetric
  * distance computation) instead of a full-dimension arithmetic pass. At
  * [[M]]=4 codes per 64-dim vector the corpus representation drops from 64
  * floats to 4 small ints — the compression that lets a 10⁹-vector index
  * live in cluster memory. Production systems compose both: IVF cells of
  * PQ codes; this module keeps PQ itself isolated and oracled.
  *
  * This variant trains ONE codebook shared by all subspaces (all M·N
  * subvectors pooled into a single [[Kmeans.lloyd]] run) rather than M
  * per-subspace codebooks — same operator shape, 1/M the training state,
  * and the whole trajectory stays a pure function of the data, so the
  * DuckDB oracle replays training, encoding, and ADC scoring exactly
  * (everything is the [[Kmeans]] integer grid arithmetic).
  *
  * Scale shape at 100 TB: training is Lloyd over the pooled subvector
  * relation (iters × one scan, k-bounded driver state); encoding is a pure
  * codegen'd projection ([[graft.expressions.ArgMinCentroidL2]]); the query
  * path broadcasts a (queries × M × k)-row distance table — metadata-sized
  * under the same bounded-queries contract as [[Similarity.topKCosine]] —
  * onto the code relation, and the only wide operation is the (qid, vec)
  * partial-aggregated score reduction feeding a bounded
  * [[graft.ops.TopK.topKPerKey]] heap. Raw vectors never leave the
  * training/encode scans; the serving plan touches codes only.
  */
object Pq {

  /** Subspace count (codes per vector). */
  val M = 4

  /** Dimensions per subspace (input dim = M · SubDim). */
  val SubDim = 16

  /** Shared-codebook size. */
  val K = 8

  /** Lloyd rounds for codebook training. */
  val Iters = 2

  /** Explode (vec_id, embedding float[M·SubDim]) into the pooled subvector
    * relation (sid, vec_id, m, embedding float[SubDim]) with
    * `sid = vec_id·M + m` — unique per subvector, so the pooled relation
    * feeds [[Kmeans.lloyd]] unchanged.
    */
  def subvectors(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      posexplode(array((0 until M).map(m =>
        slice(col("embedding"), m * SubDim + 1, SubDim)): _*)).as(Seq("m", "sub")))
      .select((col("vec_id") * M + col("m")).as("sid"),
        col("vec_id"), col("m").cast("long").as("m"),
        col("sub").as("embedding"))

  /** Train the shared codebook: grid-quantize the pooled subvectors and run
    * [[Kmeans.lloyd]]. Returns the k × SubDim centroid matrix.
    */
  def trainCodebook(subs: DataFrame, k: Int = K, iters: Int = Iters): Array[Array[Long]] =
    Kmeans.lloyd(Kmeans.quantizeGrid(subs), k, iters, idCol = "sid")

  /** Encode the corpus: (vec_id, m, cid) — each subvector replaced by its
    * nearest codebook id. One kernel scan, no shuffle.
    */
  def encode(subs: DataFrame, cents: Array[Array[Long]]): DataFrame =
    Kmeans.assignNearest(Kmeans.quantizeGrid(subs), cents)
      .select(col("vec_id"), col("m"), col("cid"))

  /** ADC top-k: exact integer L2² between each query subvector and each
    * centroid builds the (qid, m, cid, d) distance table; scoring a corpus
    * vector is Σ_m dt[m, code(m)] — M narrow lookups, summed map-side, fed
    * to the bounded per-key heap. `queries` must satisfy the bounded-
    * queries contract (the distance table is queries × M × k rows).
    */
  def adcTopK(spark: SparkSession, codes: DataFrame, querySubs: DataFrame,
              cents: Array[Array[Long]], k: Int): DataFrame = {
    import spark.implicits._
    val centsDf = cents.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cid", "cent")
    val sq = aggregate(
      zip_with(col("gcode"), col("cent"), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, v) => acc + v)
    val dt = Kmeans.quantizeGrid(querySubs)
      .select(col("vec_id").as("qid"), col("m"), col("gcode"))
      .crossJoin(centsDf)
      .select(col("qid"), col("m"), col("cid"), sq.as("d"))
    codes.join(broadcast(dt), Seq("m", "cid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum("d").as("score"))
      .transform(graft.ops.TopK.topKPerKey(_, Seq("qid"),
        Seq(col("score").asc, col("vec_id").asc), k))
  }

  private val TopN = 10

  // Oracle: the Kmeans Lloyd prefix over the pooled subvector relation
  // (vec_id in the prefix = sid here), then decode sid back to (vid, m),
  // build the query distance table from the SAME quantized subvectors (CTE
  // e) and final centroids (CTE c<Iters>), and replay ADC + the top-10 cut.
  private val q130Sql: String =
    s"""${Kmeans.lloydPrefixSql(
         s"""SELECT vec_id * $M + t.m AS vec_id,
            |       embedding[$SubDim * t.m + 1 : $SubDim * t.m + $SubDim] AS embedding
            |FROM embeddings
            |CROSS JOIN (SELECT unnest([${(0 until M).mkString(", ")}]) AS m) t""".stripMargin,
         k = K, iters = Iters, dim = SubDim)},
       |a AS (SELECT vec_id // $M AS vid, vec_id % $M AS m, cid FROM af),
       |qs AS (SELECT vec_id // $M AS qid, vec_id % $M AS m, g
       |       FROM e WHERE vec_id // $M < 5),
       |dt AS (
       |  SELECT qs.qid, qs.m, c.cid,
       |         SUM((qs.g[t.i] - c.cent[t.i]) * (qs.g[t.i] - c.cent[t.i])) AS d
       |  FROM qs CROSS JOIN c$Iters c CROSS JOIN range(1, ${SubDim + 1}) t(i)
       |  GROUP BY 1, 2, 3),
       |sc AS (
       |  SELECT dt.qid, a.vid, SUM(dt.d) AS score
       |  FROM a JOIN dt ON a.m = dt.m AND a.cid = dt.cid
       |  GROUP BY 1, 2)
       |SELECT CAST(qid AS BIGINT) AS qid,
       |  CAST(row_number() OVER (PARTITION BY qid ORDER BY score, vid) AS BIGINT) AS rnk,
       |  CAST(vid AS BIGINT) AS vec_id, CAST(score AS BIGINT) AS score
       |FROM sc
       |QUALIFY rnk <= $TopN
       |ORDER BY qid, rnk""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q130_pq_topk", q130Sql) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val subs = subvectors(Tables.embeddings(s, d).select("vec_id", "embedding"))
      val cents = trainCodebook(subs)
      val codes = encode(subs, cents)
      val qsubs = subs.filter(col("vec_id") < 5)
      val topk = adcTopK(s, codes, qsubs, cents, TopN)
      // rank the k·|queries| survivors (bounded) for a stable output shape
      topk.select(col("qid").cast("long").as("qid"),
          row_number().over(Window.partitionBy("qid")
            .orderBy(col("score").asc, col("vec_id").asc)).cast("long").as("rnk"),
          col("vec_id").cast("long").as("vec_id"),
          col("score").cast("long").as("score"))
        .orderBy("qid", "rnk")
    },
  )
}

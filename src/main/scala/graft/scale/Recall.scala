package graft.scale

import graft.core.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ANN serving-quality certification: measured recall@k of an IVF index
  * against the brute-force oracle, per probe width — the number a serving
  * team actually signs off on. Until now recall laws lived in
  * SimilaritySpec unit fixtures (planted twins, controlled corpora); this
  * makes the recall CURVE itself a driver-checked query result.
  *
  * Every stage is integer-exact, which is what makes a recall VALUE (not
  * just a planted rank-1) oracle-able at all: grid-quantized Lloyd
  * training ([[Kmeans.lloyd]], replayed by [[Kmeans.lloydCtes]]), integer
  * L2 cell routing (ties to the smaller cid), int8 codes and BIGINT dot
  * scores (ties to the smaller nid). The DuckDB replay re-derives the
  * whole index — seeding order, every Lloyd round, every assignment, the
  * per-query routing, both top-k rankings — so one vector routed or ranked
  * differently anywhere moves some hit count and fails the hash.
  *
  * Scale shape: training/assignment are the q121 shapes (codegen'd E-step
  * scans, k-row M-step collects); candidate scoring per probe width is the
  * IVF probe shape (cell-pruned equi-join, bounded per-key heaps); the
  * brute-force side is the one deliberately corpus-sized job — per-
  * partition bounded heaps over |queries| × n pairs, the certification
  * cost you pay on a SAMPLE of queries (here: a fixed 32-query panel), not
  * per serving call.
  */
object Recall {

  private val Cells = 10
  private val Iters = 3
  private val Dim = 64
  private val TopK = 10
  private val NQueries = 32
  private val Probes = Seq(1, 2, 4, 8)

  /** Recall@`k` of int8-rerank IVF probing vs the int8 brute-force ranking,
    * one row per probe width: (n_probe, hits, possible, recall_bp) with
    * recall in integer basis points (hits·10000 div possible) — exact on
    * any engine, no float division.
    */
  def ivfRecallTable(corpus: DataFrame, queries: DataFrame, k: Int = TopK,
                     nProbes: Seq[Int] = Probes, nCells: Int = Cells,
                     iters: Int = Iters): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val g = Kmeans.quantizeGrid(corpus).localCheckpoint()
    val cents = Kmeans.lloyd(g, nCells, iters)
    val post = Kmeans.assignNearest(g, cents)
      .select(col("vec_id").cast("long").as("nid"), col("cid"))
      .join(Similarity.quantizeInt8(corpus)
        .select(col("vec_id").cast("long").as("nid"), col("qcode").as("cc")), "nid")
    val qz = Similarity.quantizeInt8(queries)
      .select(col("vec_id").cast("long").as("qid"), col("qcode").as("qc"))
    // routing: exact integer L2 between the query's grid code and every
    // centroid — a |queries| × nCells cross against the broadcast k-row
    // centroid table, ranked (dist, cid)
    val centsDf = cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toSeq.toDF("cid", "cent")
    val sq = aggregate(zip_with(col("gcode"), col("cent"), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, v) => acc + v)
    val route = Kmeans.quantizeGrid(queries)
      .select(col("vec_id").cast("long").as("qid"), col("gcode"))
      .crossJoin(broadcast(centsDf))
      .select(col("qid"), col("cid"), sq.as("dist"))
      .withColumn("rrank",
        row_number().over(Window.partitionBy("qid").orderBy(col("dist"), col("cid"))))
      .select("qid", "cid", "rrank")
      .localCheckpoint()
    val brute = Similarity.quantizedTopK(corpus, queries, k)
      .select("qid", "nid").localCheckpoint()
    // per probe width: cell-pruned candidates → bounded-heap top-k →
    // intersection with the brute ranking. A global agg always yields its
    // row, so a zero-hit width still surfaces as hits=0, never a lost row.
    val hits = nProbes.map { p =>
      val cand = post
        .join(route.filter(col("rrank") <= p).select("qid", "cid"), Seq("cid"))
        .join(broadcast(qz), Seq("qid"))
        .filter(col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"),
          Similarity.int8Dot(col("qc"), col("cc")).as("score"))
      Similarity.longScoreTopK(cand, k).select("qid", "nid")
        .join(brute, Seq("qid", "nid"))
        .agg(count(lit(1)).as("hits"))
        .select(lit(p.toLong).as("n_probe"), col("hits"))
    }.reduce(_ unionByName _)
    hits.crossJoin(brute.agg(count(lit(1)).as("possible")))
      .select(col("n_probe"), col("hits"), col("possible"),
        expr("hits * 10000 div possible").as("recall_bp"))
  }

  // ---- oracle -------------------------------------------------------------

  private def perProbeSql(p: Int): String =
    s"""
 cand$p AS (
   SELECT r.qid, po.nid,
          CAST(list_dot_product(q.qc, po.cc) AS BIGINT) AS score
   FROM rt r
   JOIN post po ON po.cid = r.cid
   JOIN qq q ON q.qid = r.qid
   WHERE r.rrank <= $p AND q.qid <> po.nid),
 ann$p AS (
   SELECT qid, nid FROM (
     SELECT qid, nid,
            row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rn
     FROM cand$p) WHERE rn <= $TopK),
 hit$p AS (
   SELECT CAST($p AS BIGINT) AS n_probe, CAST(count(1) AS BIGINT) AS hits
   FROM ann$p a JOIN brk b ON a.qid = b.qid AND a.nid = b.nid)"""

  private val recallOracle: String = {
    val per = Probes.map(perProbeSql).mkString(",")
    val union = Probes.map(p => s"SELECT n_probe, hits FROM hit$p")
      .mkString("\n  UNION ALL ")
    s"""WITH ${Kmeans.lloydCtes("SELECT vec_id, embedding FROM embeddings",
        Cells, Iters, Dim)},
 qz AS (
   SELECT vec_id,
     CASE WHEN smax = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
          ELSE list_transform(v, x -> CAST(round(x / smax * 127) AS BIGINT))
     END AS code
   FROM (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS smax
         FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings))),
 qq AS (SELECT vec_id AS qid, code AS qc FROM qz WHERE vec_id < $NQueries),
 cc AS (SELECT vec_id AS nid, code AS cc FROM qz),
 bsc AS (SELECT qid, nid, CAST(list_dot_product(qc, cc.cc) AS BIGINT) AS score
         FROM qq, cc WHERE qid <> nid),
 brk AS MATERIALIZED (
   SELECT qid, nid FROM (
     SELECT qid, nid,
            row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rn
     FROM bsc) WHERE rn <= $TopK),
 qg AS (SELECT vec_id AS qid, g FROM e WHERE vec_id < $NQueries),
 rt AS MATERIALIZED (
   SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY dist, cid) AS rrank
   FROM (SELECT q.qid, c.cid,
           SUM((q.g[t.i] - c.cent[t.i]) * (q.g[t.i] - c.cent[t.i])) AS dist
         FROM qg q CROSS JOIN c$Iters c CROSS JOIN range(1, ${Dim + 1}) t(i)
         GROUP BY q.qid, c.cid)),
 post AS MATERIALIZED (
   SELECT a.vec_id AS nid, a.cid, z.code AS cc
   FROM af a JOIN qz z USING (vec_id)),$per,
 pos AS (SELECT CAST(count(1) AS BIGINT) AS possible FROM brk)
SELECT h.n_probe, h.hits, pos.possible,
       h.hits * 10000 // pos.possible AS recall_bp
FROM ($union) h, pos
ORDER BY h.n_probe"""
  }

  // ---- declared queries ----------------------------------------------------

  val queries: Seq[Q] = Seq(

    // The measured recall@10 curve of integer-IVF probing over a 32-query
    // panel, per probe width 1/2/4/8 of 10 cells — serving quality as a
    // hash-checked number. The oracle re-derives the index from scratch
    // (full Lloyd replay) and both rankings, so this certifies the
    // retrieval pipeline end to end, not a spot-checked rank-1.
    Q("q149_ann_recall", recallOracle) { (s, d) =>
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      ivfRecallTable(emb, emb.filter(col("vec_id") < NQueries))
        .orderBy("n_probe")
    },
  )
}

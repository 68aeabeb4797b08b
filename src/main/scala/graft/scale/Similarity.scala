package graft.scale

import graft.core.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set,
  * score every corpus vector, keep k per query. The scored relation is
  * |corpus| × |queries| rows but only (qid, nid, sim); with per-partition
  * pre-top-k the shuffle shrinks to partitions × queries × k rows, so the
  * plan survives a 1000-executor corpus as long as the query set broadcasts.
  *
  * Scale path: random-hyperplane LSH — bucket corpus and queries by sign
  * bits, rerank exactly within colliding buckets. Candidate generation is an
  * equi-join on the bucket key; no full cross product ever materializes.
  */
object Similarity {

  /** Cosine similarity between two float-array columns, accumulated in
    * double, strictly left-to-right (matches a sequential fold, so results
    * are bit-reproducible).
    */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0d), (acc, v) => acc + v)
    dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
  }

  /** Brute-force cosine top-k: every query vs every corpus vector, ranked.
    * `queries` must be broadcast-small. Output: (qid, rank, nid, sim).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv")))
    val scored = corpus.select(col(idCol).as("nid"), col(vecCol).as("cv"))
      .join(q, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qv"), col("cv")).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("nid"), col("sim"))
  }

  /** Same result with a per-partition pre-top-k (bounded heap per query id in
    * each partition) before the global rank — the shuffle carries at most
    * numPartitions × |queries| × k rows instead of |corpus| × |queries|.
    * This is the form to use when the corpus is large.
    */
  def bruteForceTopKPartial(corpus: DataFrame, queries: DataFrame, k: Int,
                            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv")))
    val scored = corpus.select(col(idCol).as("nid"), col(vecCol).as("cv"))
      .join(q, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qv"), col("cv")).as("sim"))
    val spark = corpus.sparkSession
    import spark.implicits._
    val pruned = scored.as[(Long, Long, Double)].mapPartitions { rows =>
      // bounded min-heap of size k per query id — O(k · |queries|) memory
      implicit val ord: Ordering[(Double, Long)] =
        Ordering.by[(Double, Long), Double](_._1).reverse // min-heap on sim
      val heaps = scala.collection.mutable.Map
        .empty[Long, scala.collection.mutable.PriorityQueue[(Double, Long)]]
      rows.foreach { case (qid, nid, sim) =>
        val h = heaps.getOrElseUpdate(qid,
          scala.collection.mutable.PriorityQueue.empty[(Double, Long)])
        h.enqueue((sim, nid))
        if (h.size > k) h.dequeue()
      }
      heaps.iterator.flatMap { case (qid, h) =>
        h.iterator.map { case (sim, nid) => (qid, nid, sim) }
      }
    }.toDF("qid", "nid", "sim")
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    pruned.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("nid"), col("sim"))
  }

  /** Random-hyperplane signature: `planes` sign bits packed into a long.
    * Hyperplane components are seeded-deterministic. Returns the input plus a
    * `bucket` column. `dim` defaults to -1 = derived from the data (one
    * cheap head() at plan time) — a wrong hard-coded dim would silently
    * truncate the dot products.
    */
  def hyperplaneBuckets(df: DataFrame, planes: Int = 12, dim: Int = -1, seed: Long = 42,
                        vecCol: String = "embedding"): DataFrame = {
    val d = if (dim > 0) dim
            else df.select(size(col(vecCol)).as("d")).head().getInt(0)
    val rnd = new scala.util.Random(seed)
    val hyperplanes = Array.fill(planes, d)(rnd.nextGaussian())
    val vd = col(vecCol).cast("array<double>")
    val bits = (0 until planes).map { p =>
      // zip_with against the plane literal: length-safe (no element_at past
      // the end -> null -> all-zero buckets) and stays in codegen
      val plane = typedLit(hyperplanes(p).toSeq)
      val dot = aggregate(zip_with(vd, plane, (x, y) => x * y), lit(0d), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    df.withColumn("bucket", bits.reduce((a, b) => a.bitwiseOR(b)))
  }

  /** ANN top-k: candidates = bucket-collision join (queries broadcast),
    * exact cosine rerank within candidates. Recall < 1 by construction;
    * multi-probe (flipping one bit) raises it — probes=1 flips each single
    * bit of the query bucket.
    */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              planes: Int = 12, dim: Int = -1, probes: Int = 1,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = hyperplaneBuckets(corpus, planes, dim, vecCol = vecCol)
      .select(col(idCol).as("nid"), col(vecCol).as("cv"), col("bucket"))
    val qb = hyperplaneBuckets(queries, planes, dim, vecCol = vecCol)
    val probeBuckets: Column = {
      val base = array(col("bucket"))
      // planes is a compile-time Int, so the probe masks are built driver-side
      if (probes >= 1)
        concat(base, array((0 until planes).map(p =>
          col("bucket").bitwiseXOR(lit(1L << p))): _*))
      else base
    }
    val q = broadcast(qb.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      explode(probeBuckets).as("bucket")))
    c.join(q, Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qv"), col("cv")).as("sim"))
      .distinct()
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("nid"), col("sim"))
  }

  /** Embedding-cosine near-duplicate pairs via bucket collision (both sides
    * the corpus): candidates from shared hyperplane bucket, verified by
    * exact cosine >= threshold.
    */
  def cosineNearDup(corpus: DataFrame, threshold: Double, planes: Int = 8, dim: Int = -1,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val b = hyperplaneBuckets(corpus, planes, dim, vecCol = vecCol)
      .select(col(idCol), col(vecCol), col("bucket"))
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        cosine(col(s"a.$vecCol"), col(s"b.$vecCol")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  // ---- declared queries ----------------------------------------------------

  val queries: Seq[Q] = Seq(

    // Brute-force cosine top-10 for 5 probe vectors. Output is ids+rank only
    // (both engines accumulate the dot product sequentially in double, so the
    // ranking is identical; emitting the float sim itself would hash-compare
    // raw doubles, which also works but adds no coverage).
    Q("q30_knn_cosine",
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 5),
        | c AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        | scored AS (
        |   SELECT qid, nid,
        |     list_dot_product(qv, cv) /
        |       (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS sim
        |   FROM q, c WHERE qid <> nid),
        | ranked AS (SELECT qid, nid,
        |   row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk FROM scored)
        |SELECT qid, rnk, nid FROM ranked WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin) { (s, d) =>
      // the partial form: per-partition bounded heaps shrink the shuffle to
      // partitions x |queries| x k rows — the plan that survives a large corpus
      val emb = Tables.embeddings(s, d)
      bruteForceTopKPartial(emb, emb.filter(col("vec_id") < 5), 10)
        .select("qid", "rnk", "nid")
        .orderBy("qid", "rnk")
    },

    // LSH-bucketed ANN — approximate by construction, so rows-only here; the
    // ScalaTest spec measures recall against the brute-force baseline.
    Q.noOracle("q31_knn_ann") { (s, d) =>
      val emb = Tables.embeddings(s, d)
      annTopK(emb, emb.filter(col("vec_id") < 5), 10)
        .select("qid", "rnk", "nid")
        .orderBy("qid", "rnk")
    },

    // Embedding near-dup pairs above a cosine threshold. The driver corpus is
    // random vectors (no near-dups: pairwise cosine ~ N(0, 1/dim)), so every
    // 10th vector is re-added slightly perturbed under vec_id+100000; the
    // operator must find exactly those planted pairs via bucket collision.
    Q.noOracle("q32_embedding_neardup") { (s, d) =>
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val clones = emb.filter(col("vec_id") % 10 === 0)
        .withColumn("vec_id", col("vec_id") + 100000)
        .withColumn("embedding",
          transform(col("embedding"), x => x + lit(0.02f)).cast("array<float>"))
      cosineNearDup(emb.unionByName(clones), threshold = 0.95)
        .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim"))
        .orderBy("id_a", "id_b")
    },
  )
}

package graft.scale

import graft.SparkSpec
import graft.core.Tables
import graft.expressions.ArgMinCentroidL2
import org.apache.spark.sql.GraftColumnBridge.{column => ncol, expression => nexpr}
import org.apache.spark.sql.functions._

class KmeansSpec extends SparkSpec {
  import spark.implicits._

  private def gridded = Kmeans.quantizeGrid(
    Tables.embeddings(spark, sfDir).select("vec_id", "embedding"))

  test("quantizeGrid: clip, power-of-two scale, nonnegative offset") {
    val df = Seq(
      (1L, Seq(0.0f, 1.0f, -1.0f)),
      (2L, Seq(3.0f, -3.0f, 0.5f)), // clips to +-2
    ).toDF("vec_id", "embedding")
    val g = Kmeans.quantizeGrid(df).select("vec_id", "gcode")
      .as[(Long, Seq[Long])].collect().toMap
    assert(g(1L) === Seq(512L, 768L, 256L))
    assert(g(2L) === Seq(1024L, 0L, 640L))
    assert(g.values.flatten.forall(v => v >= 0L && v <= 1024L))
  }

  test("ArgMinCentroidL2 matches the HOF reference form incl. smallest-cid ties") {
    val cents = Array(Array(0L, 0L), Array(10L, 0L), Array(0L, 10L))
    val df = Seq(
      (1L, Seq(1L, 1L)),   // nearest cent 0 (d=2)
      (2L, Seq(9L, 0L)),   // nearest cent 1 (d=1)
      (3L, Seq(5L, 5L)),   // tie: d=50 for all three -> cid 0
      (4L, Seq(0L, 9L)),   // nearest cent 2 (d=1)
    ).toDF("id", "g")
    val near = ncol(ArgMinCentroidL2(nexpr(col("g")), cents.flatten, 3, 2))
    val got = df.select(col("id"), near.as("a"))
      .select(col("id"), col("a.cid"), col("a.dist"))
      .as[(Long, Int, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got(1L) === ((0, 2L)))
    assert(got(2L) === ((1, 1L)))
    assert(got(3L) === ((0, 50L)))
    assert(got(4L) === ((2, 1L)))
    // HOF reference: explicit per-centroid distances, argmin by (dist, cid)
    val ref = df.collect().map { r =>
      val g = r.getSeq[Long](1)
      val ds = cents.zipWithIndex.map { case (c, i) =>
        (c.zip(g).map { case (a, b) => (b - a) * (b - a) }.sum, i)
      }
      r.getLong(0) -> ds.minBy(identity)
    }.toMap
    for ((id, (d, c)) <- ref) assert(got(id) === ((c, d)))
  }

  test("SqDistLong matches the HOF form, ragged arrays truncate, nulls propagate") {
    import org.apache.spark.sql.functions.{aggregate, zip_with, lit}
    val df = Seq(
      (1L, Seq(1L, 2L, 3L), Seq(4L, 6L, 3L)),
      (2L, Seq(0L, 0L), Seq(0L, 0L)),
      (3L, Seq(1000L, -1000L), Seq(-1000L, 1000L)),
      (4L, Seq(5L, 5L, 5L), Seq(5L)), // ragged: shorter length wins
    ).toDF("id", "a", "b")
    val kernel = ncol(graft.expressions.SqDistLong(nexpr(col("a")), nexpr(col("b"))))
    val hof = aggregate(
      zip_with(col("a"), col("b"), (p, q) => coalesce((p - q) * (p - q), lit(0L))),
      lit(0L), (acc, v) => acc + v)
    val got = df.select(col("id"), kernel.as("k"), hof.as("h"))
      .as[(Long, Long, Long)].collect()
    for ((id, k, h) <- got) assert(k === h, s"id=$id")
    assert(got.find(_._1 == 1L).get._2 === 25L)
    assert(got.find(_._1 == 3L).get._2 === 8000000L)
    // null array → null result
    val withNull = Seq((1L, Seq(1L, 2L), null: Seq[Long])).toDF("id", "a", "b")
    assert(withNull.select(kernel).collect().head.isNullAt(0))
    // SQL registration via GraftExtensions
    assert(spark.sql("SELECT sqdist_long(array(1L,2L), array(3L,5L))")
      .collect().head.getLong(0) === 13L)
  }

  test("ArgMinCentroidL2: dimension mismatch is null, not a truncated rank") {
    val cents = Array(Array(0L, 0L))
    val df = Seq((1L, Seq(1L, 2L, 3L))).toDF("id", "g")
    val near = ncol(ArgMinCentroidL2(nexpr(col("g")), cents.flatten, 1, 2))
    assert(df.select(near).collect().head.isNullAt(0))
  }

  test("ArgMinCentroidL2 codegen path actually compiles (no interpreted fallback)") {
    val cents = Array(Array(512L, 512L))
    val df = Seq((1L, Seq(513L, 512L))).toDF("id", "g")
    val near = ncol(ArgMinCentroidL2(nexpr(col("g")), cents.flatten, 1, 2))
    val was = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val r = df.select(near.as("a")).select(col("a.cid"), col("a.dist"))
        .as[(Int, Long)].collect()
      assert(r.toSeq === Seq((0, 1L)))
    } finally spark.conf.set("spark.sql.codegen.factoryMode", was)
  }

  test("lloyd is invariant under repartitioning (integer sums are associative)") {
    val g = gridded
    val a = Kmeans.lloyd(g, k = 5, iters = 2)
    val b = Kmeans.lloyd(g.repartition(7), k = 5, iters = 2)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("lloyd: an empty cluster keeps its previous centroid") {
    // two tight groups, k=3: the seed order puts three distinct seeds down,
    // but after one assignment only two clusters can win rows unless a seed
    // sits alone; force it with 3 seeds where two coincide geometrically.
    val df = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(0.01f, 0.0f)), (3L, Seq(0.0f, 0.01f)),
      (4L, Seq(1.0f, 1.0f)), (5L, Seq(1.0f, 0.99f)),
    ).toDF("vec_id", "embedding")
    val g = Kmeans.quantizeGrid(df)
    val seeds = Kmeans.seedCentroids(g, 3)
    val out = Kmeans.lloyd(g, k = 3, iters = 3)
    // every centroid either attracts rows (and is a quantized mean) or is
    // byte-identical to its seed — never garbage
    val assigned = Kmeans.assignNearest(g, out)
      .select("cid").as[Int].collect().toSet
    for (c <- 0 until 3 if !assigned.contains(c))
      assert(out(c).toSeq === seeds(c).toSeq)
  }

  test("semDedup laws: no surviving in-cell pair within the radius; every drop is justified") {
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val twins = emb.filter(col("vec_id") < 20)
      .withColumn("vec_id", col("vec_id") + 100000)
      .withColumn("embedding",
        transform(col("embedding"), x => x + lit(0.02f)).cast("array<float>"))
    val corpus = emb.unionByName(twins)
    val maxSq = 10000L
    val survivors = Kmeans.semDedup(corpus, k = 5, iters = 2, maxSqDist = maxSq)
      .select("vec_id", "cid").as[(Long, Long)].collect().toMap
    val all = corpus.count()
    assert(survivors.size < all && survivors.size >= all - 20)
    // reconstruct codes + assignment exactly as the operator does
    val g = Kmeans.quantizeGrid(corpus)
    val cents = Kmeans.lloyd(g, k = 5, iters = 2)
    val rows = Kmeans.assignNearest(g, cents)
      .select(col("vec_id"), col("cid"), col("gcode"))
      .as[(Long, Int, Seq[Long])].collect()
    def sq(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val byCell = rows.groupBy(_._2)
    for ((_, cell) <- byCell; a <- cell; b <- cell if a._1 < b._1) {
      val close = sq(a._3, b._3) <= maxSq
      // law 1: two survivors in one cell are never within the radius
      if (survivors.contains(a._1) && survivors.contains(b._1)) assert(!close)
    }
    // law 2: every dropped id has a SMALLER-id same-cell neighbor in radius
    val dropped = rows.map(_._1).toSet -- survivors.keySet
    for (id <- dropped) {
      val me = rows.find(_._1 == id).get
      assert(byCell(me._2).exists(o => o._1 < id && sq(o._3, me._3) <= maxSq),
        s"dropped $id without a smaller-id close neighbor")
    }
    // survivors report the cid they were assigned
    for ((id, cid) <- survivors)
      assert(rows.find(_._1 == id).get._2.toLong === cid)
  }

  test("report: n_vecs sums to corpus size and inertia matches a direct recompute") {
    val g = gridded
    val cents = Kmeans.lloyd(g, k = 4, iters = 2)
    val rep = Kmeans.report(spark, g, cents)
    val perCluster = rep.select("cid", "n_vecs", "inertia").distinct()
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(perCluster.map(_._2._1).sum === g.count())
    val direct = Kmeans.assignNearest(g, cents)
      .groupBy("cid").agg(sum("dist").as("s"))
      .as[(Int, Long)].collect().toMap
    for ((cid, (_, inertia)) <- perCluster)
      assert(inertia === direct.getOrElse(cid.toInt, 0L))
    // exploded shape: k * dim rows, pos 1-based contiguous
    assert(rep.count() === 4L * cents.head.length)
  }
}

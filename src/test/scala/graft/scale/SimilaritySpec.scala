package graft.scale

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Similarity search: the partial-top-k form agrees exactly with the naive
  * window form, and ANN recall vs brute force clears 0.9 (VERDICT item 7).
  */
class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir).cache()
  private lazy val queries = emb.filter(col("vec_id") < 5)

  test("bruteForceTopKPartial == bruteForceTopK (same ids and ranks)") {
    val full = Similarity.bruteForceTopK(emb, queries, 10)
      .select("qid", "rnk", "nid").collect().map(_.toSeq).toSet
    val part = Similarity.bruteForceTopKPartial(emb, queries, 10)
      .select("qid", "rnk", "nid").collect().map(_.toSeq).toSet
    assert(part === full)
    assert(full.nonEmpty)
  }

  test("quantizeInt8: codes bounded at ±127, scale anchored, zero vector safe") {
    import spark.implicits._
    val codes = Similarity.quantizeInt8(emb.limit(100))
      .select(col("vec_id"), col("qcode"))
    // every component in [-127, 127] and each non-zero vector's max |code|
    // is exactly 127 (the scale anchor)
    val stats = codes.select(
      max(array_max(transform(col("qcode"), c => abs(c.cast("int"))))).as("gmax"),
      min(array_max(transform(col("qcode"), c => abs(c.cast("int"))))).as("vmaxmin"))
      .as[(Int, Int)].head()
    assert(stats._1 === 127)
    assert(stats._2 === 127)
    val z = Seq((1L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val zc = Similarity.quantizeInt8(z).select("qcode")
      .as[Seq[Byte]].head()
    assert(zc === Seq[Byte](0, 0, 0))
  }

  test("native int8_dot == HOF fold on corpus codes, unit cases, SQL-callable") {
    import spark.implicits._
    val codes = Similarity.quantizeInt8(emb.limit(200))
      .select(col("vec_id"), col("qcode"))
    val pairs = codes.as("a").join(codes.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(5000)
      .select(
        Similarity.int8Dot(col("a.qcode"), col("b.qcode")).as("nat"),
        Similarity.int8DotHof(col("a.qcode"), col("b.qcode")).as("hof"))
    assert(pairs.filter(col("nat") =!= col("hof")).count() === 0)
    // unit cases: negative components, shorter-length truncation, null
    // Seq[Byte], not Array[Byte]: the latter encodes as BinaryType
    val u = Seq(
      (Seq[Byte](127, -127, 3), Seq[Byte](1, 2, 3)),
      (Seq[Byte](1, 2), Seq[Byte](5, 5, 5)))
      .toDF("a", "b")
    assert(u.select(Similarity.int8Dot(col("a"), col("b")).as("d"))
      .as[Long].collect().toSeq === Seq(127L - 254L + 9L, 15L))
    // ragged pair: HOF truncates to the shorter length exactly like the
    // native loop (coalesce drops zip_with's null padding)
    assert(u.select(Similarity.int8DotHof(col("a"), col("b")).as("d"))
      .as[Long].collect().toSeq === Seq(127L - 254L + 9L, 15L))
    assert(u.select(Similarity.int8Dot(lit(null).cast("array<tinyint>"), col("b")))
      .first().isNullAt(0))
    // registered for SQL
    u.createOrReplaceTempView("int8_pairs")
    assert(spark.sql("SELECT int8_dot(a, b) FROM int8_pairs").count() === 2)
  }

  test("quantizedTopK heap form == naive window form, and rank-1 finds an exact twin") {
    import spark.implicits._
    // naive reference: same scoring, global window, no heaps
    val qz = Similarity.quantizeInt8(queries).select(col("vec_id").as("qid"), col("qcode").as("qc"))
    val cz = Similarity.quantizeInt8(emb).select(col("vec_id").as("nid"), col("qcode").as("cc"))
    val dot = aggregate(
      zip_with(col("qc"), col("cc"), (a, b) => a.cast("long") * b.cast("long")),
      lit(0L), (acc, v) => acc + v)
    val naive = cz.join(broadcast(qz), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), dot.as("score"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("score").desc, col("nid"))))
      .filter(col("rnk") <= 10)
      .select("qid", "rnk", "nid", "score").collect().map(_.toSeq).toSet
    val heap = Similarity.quantizedTopK(emb, queries, 10)
      .collect().map(_.toSeq).toSet
    assert(heap === naive)
    assert(naive.nonEmpty)
    // an exact copy quantizes to identical codes; with near-orthogonal
    // random embeddings its dot dominates, so the twin is rank 1
    val twins = queries.withColumn("vec_id", col("vec_id") + 100000)
    val top1 = Similarity.quantizedTopK(emb.unionByName(twins), queries, 1)
      .select("qid", "nid").as[(Long, Long)].collect().toMap
    for ((qid, nid) <- top1) assert(nid === qid + 100000,
      s"query $qid top-1 was $nid, expected its exact twin")
  }

  test("ivfTopKQuantized: full probe == quantized brute force; twin found through probes") {
    import spark.implicits._
    val n = emb.count().toInt
    val nCents = Similarity.resolveNCentroids(emb, -1)
    // full probe: every cell is scanned, so the IVF form must equal the
    // brute-force quantized ranking row for row
    val full = Similarity.ivfTopKQuantized(emb, queries, 5, nProbe = nCents)
      .collect().map(_.toSeq).toSet
    val brute = Similarity.quantizedTopK(emb, queries, 5)
      .collect().map(_.toSeq).toSet
    assert(full === brute && full.nonEmpty)
    // an exact twin quantizes to identical codes AND assigns to the same
    // cell, so the default probe set must surface it at rank 1
    val twins = queries.withColumn("vec_id", col("vec_id") + 100000)
    val top1 = Similarity.ivfTopKQuantized(emb.unionByName(twins), queries, 1)
      .select("qid", "nid").as[(Long, Long)].collect().toMap
    for ((qid, nid) <- top1) assert(nid === qid + 100000,
      s"query $qid top-1 was $nid, expected its exact twin (n=$n)")
  }

  test("knnJoinQuantized full probe == quantizedTopK (the broadcast form) row for row") {
    val n = Similarity.resolveNCentroids(emb, -1)
    val joined = Similarity.knnJoinQuantized(queries, emb, 5, nProbe = n)
      .collect().map(_.toSeq).toSet
    val brute = Similarity.quantizedTopK(emb, queries, 5)
      .collect().map(_.toSeq).toSet
    assert(joined === brute && joined.nonEmpty)
  }

  test("planted hot cell: AQE splits the skewed candidate-join partition, results unchanged") {
    // every even id is collapsed onto ONE point and replicated 32x:
    // identical vectors tie on distance to every centroid, so the argmin
    // tie-break routes all ~8000 of them to a single cid — k-means cannot
    // balance them away (a cluster with radius would be split across
    // centroids; a point cannot be). The cid shuffle then has one partition
    // holding ~95% of the corpus side. An isolated child session lowers the
    // AQE skew thresholds to the fixture's byte scale (test data never
    // crosses the 256MB production default) and forces the rewrite past the
    // extra-shuffle veto; the law is (a) the runtime plan really split the
    // hot partition, (b) answers are identical to the brute-force broadcast
    // form — skew handling must be invisible in the result.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4kb")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2kb")
    // spread the ~20 cells across enough partitions that the hot cell IS a
    // partition, not a fraction of one
    s2.conf.set("spark.sql.shuffle.partitions", "16")
    val emb2 = Tables.embeddings(s2, sfDir).select("vec_id", "embedding")
    val hot = emb2.filter(col("vec_id") % 2 === 0)
      .withColumn("rep", explode(sequence(lit(0), lit(31))))
      .withColumn("vec_id", col("vec_id") * 100 + col("rep"))
      .withColumn("embedding",
        transform(col("embedding"), x => x * lit(0.001f) + lit(3.0f))
          .cast("array<float>"))
      .drop("rep")
    val corpus = emb2.filter(col("vec_id") % 2 === 1).unionByName(hot)
      .localCheckpoint()
    val probes = emb2.filter(col("vec_id") % 2 === 1 && col("vec_id") < 400)
    val n = Similarity.resolveNCentroids(corpus, -1)
    val joined = Similarity.knnJoinQuantized(probes, corpus, 3, nProbe = n)
    val got = joined.collect().map(_.toSeq).toSet
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"AQE skew-join split did not engage on the hot cell:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"), plan)
    // identical answers through the broadcast brute-force path
    val brute = Similarity.quantizedTopK(corpus, probes, 3)
      .collect().map(_.toSeq).toSet
    assert(got === brute && got.nonEmpty)
  }

  test("knnJoinQuantized answers with broadcast joins disabled (the no-broadcast law)") {
    import spark.implicits._
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val aqeThr = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val twins = queries.withColumn("vec_id", col("vec_id") + 100000)
      val corpus = emb.unionByName(twins)
      val df = Similarity.knnJoinQuantized(corpus, corpus, 1)
        .filter(col("qid") < 5)
      // the candidate join really is a shuffle join under the disabled
      // thresholds — the plan a billion-row left side requires
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), plan)
      // and it still finds every planted exact twin at rank 1
      val top1 = df.select("qid", "nid").as[(Long, Long)].collect().toMap
      for ((qid, nid) <- top1) assert(nid === qid + 100000,
        s"query $qid top-1 was $nid under no-broadcast, expected its twin")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
      aqeThr match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("long-id top-k forms reject non-numeric id columns with the contract, not NULLs") {
    import spark.implicits._
    val strIds = Seq(("doc-1", Array(1f, 2f)), ("doc-2", Array(2f, 1f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.quantizedTopK(strIds, strIds, 1)
    }
    assert(e.getMessage.contains("numeric id column"))
    intercept[IllegalArgumentException] {
      Similarity.bruteForceTopKPartial(strIds, strIds, 1)
    }
    intercept[IllegalArgumentException] {
      Similarity.knnJoinQuantized(strIds, strIds, 1)
    }
  }

  test("cosine of a vector with itself is 1") {
    import spark.implicits._
    val one = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val sim = one.select(Similarity.cosine(col("a"), col("b")).as("s")).as[Double].head()
    assert(math.abs(sim - 1.0) < 1e-12)
  }

  test("IVF with full probe == brute force (rank-exact); half probe stays close") {
    val exact = Similarity.bruteForceTopKPartial(emb, queries, 10)
      .select("qid", "rnk", "nid").collect().map(_.toSeq).toSet
    // nProbe == nCentroids scans everything: must equal brute force exactly
    val full = Similarity.ivfTopK(emb, queries, 10, nCentroids = 16, nProbe = 16)
      .select("qid", "rnk", "nid").collect().map(_.toSeq).toSet
    assert(full === exact)
    // the driver corpus is uniform random (top-10 cosine ~ 0.3, no gap), so
    // partial probing trades recall for scan fraction; it must still return
    // full result sets and clear a floor well above random
    val halfPairs = Similarity.ivfTopK(emb, queries, 10, nCentroids = 16, nProbe = 8)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactPairs = exact.map(s => (s(0).asInstanceOf[Long], s(2).asInstanceOf[Long]))
    assert(halfPairs.size === exactPairs.size) // k results per query regardless
    val recall = (exactPairs intersect halfPairs).size.toDouble / exactPairs.size
    info(f"IVF recall at half scan on structureless data: $recall%.3f")
    assert(recall >= 0.3)
  }

  test("k-means-trained IVF centroids beat the sampled baseline on clustered data") {
    import spark.implicits._
    // 16 well-separated clusters of 60 vectors each: the regime where probe
    // placement matters. A raw hash-ordered sample of 16 points typically
    // double-covers some clusters and misses others; Lloyd iterations must
    // recover coverage and with it recall at nProbe=1.
    val rnd = new scala.util.Random(7)
    val dim = 32
    val centers = Array.fill(16)(Array.fill(dim)(rnd.nextGaussian()))
    val rows = (0 until 16).flatMap { c =>
      (0 until 60).map { i =>
        val v = centers(c).map(x => (x + rnd.nextGaussian() * 0.15).toFloat)
        (c * 1000L + i, v.toSeq)
      }
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val qs = corpus.filter(col("vec_id") % 1000 < 2) // 2 queries per cluster
    val exact = Similarity.bruteForceTopKPartial(corpus, qs, 10)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    def recallOf(trainIters: Int): Double = {
      val got = Similarity.ivfTopK(corpus, qs, 10, nCentroids = 16, nProbe = 1,
        trainIters = trainIters).select("qid", "nid").as[(Long, Long)].collect().toSet
      (exact intersect got).size.toDouble / exact.size
    }
    val sampled = recallOf(0)
    val trained = recallOf(4)
    info(f"IVF recall@10, nProbe=1/16: sampled=$sampled%.3f trained=$trained%.3f")
    assert(trained >= sampled)
    assert(trained >= 0.8, f"trained recall $trained%.3f below 0.8")
  }

  test("ANN recall >= 0.9 vs brute force on planted near neighbors") {
    import spark.implicits._
    // Plant a genuinely-near neighbor (the situation ANN exists for): each
    // query is a perturbed clone of a corpus vector; brute-force rank 1 is
    // the clone source, and LSH multi-probe must recover >= 90% of them
    // from bucket collisions alone.
    val planted = emb.filter(col("vec_id") % 10 === 0)
      .withColumn("vec_id", col("vec_id") + 100000)
      .withColumn("embedding", transform(col("embedding"), x => x + lit(0.02f)).cast("array<float>"))
      .cache()
    val nQueries = planted.count()
    val exactTop1 = Similarity.bruteForceTopKPartial(emb.unionByName(planted), planted, 1)
      .select("qid", "nid").as[(Long, Long)].collect().toMap
    // sanity: brute-force says the clone source is the nearest neighbor
    assert(exactTop1.count { case (q, n) => n == q - 100000 } >= (nQueries * 0.9).toInt)
    val annTop1 = Similarity.annTopK(emb.unionByName(planted), planted, 1, planes = 12)
      .filter(col("rnk") === 1)
      .select("qid", "nid").as[(Long, Long)].collect().toMap
    val recall = exactTop1.count { case (q, n) => annTop1.get(q).contains(n) }.toDouble / nQueries
    info(f"LSH ANN recall@1 on planted neighbors: $recall%.3f ($nQueries queries)")
    assert(recall >= 0.9, f"recall $recall%.3f < 0.9")
  }

  test("hyperplaneBuckets derives dim from the data (no silent truncation)") {
    val b = Similarity.hyperplaneBuckets(emb, planes = 4)
    assert(b.columns.contains("bucket"))
    // all 16 possible 4-plane buckets should not collapse to one value
    assert(b.select(countDistinct("bucket")).head().getLong(0) > 1)
  }

  test("native nearest_centroids == HOF reference (ids, order, both topN=1 and 3)") {
    import spark.implicits._
    val cents = Similarity.trainCentroids(emb, nCentroids = 16, iters = 2)
    val vec = col("embedding").cast("array<double>")
    for (topN <- Seq(1, 3)) {
      val both = emb.select(
        Similarity.nearestCidsExpr(cents, vec, topN).as("native"),
        Similarity.nearestCidsHof(cents, vec, topN).as("hof"))
        .as[(Seq[Int], Seq[Int])].collect()
      assert(both.nonEmpty)
      both.foreach { case (n, h) => assert(n === h) }
    }
    // NaN vectors rank NaN dots the way the HOF form's array_sort does
    // (NaN greatest, ties by descending id) — parity must hold there too
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val nanVecs = Seq(
      Seq.fill(dim)(Double.NaN),
      Double.NaN +: Seq.fill(dim - 1)(0.1)).toDF("v")
    for (topN <- Seq(1, 3)) {
      val both = nanVecs.select(
        Similarity.nearestCidsExpr(cents, col("v"), topN).as("native"),
        Similarity.nearestCidsHof(cents, col("v"), topN).as("hof"))
        .as[(Seq[Int], Seq[Int])].collect()
      both.foreach { case (n, h) => assert(n === h) }
    }
  }

  test("vec_sum_long: layout-invariant, partial-aggregated, dims pinned, nulls skipped") {
    import spark.implicits._
    val codes = Similarity.quantizeInt8(emb.select(col("vec_id"), col("embedding")))
      .withColumn("g", (col("vec_id") % 3).cast("string"))
      .select("g", "qcode")
    def sums(df: org.apache.spark.sql.DataFrame) =
      Similarity.groupedCodeSums(df, "g")
        .select(col("g"), col("n_vecs"), col("code_sum").cast("array<long>"))
        .as[(String, Long, Seq[Long])].collect().sortBy(_._1).toSeq
    val a = sums(codes)
    assert(a.nonEmpty && a.forall(_._3.nonEmpty))
    // integer accumulation is associative: any partitioning, same answer
    assert(sums(codes.repartition(7)) === a)
    assert(sums(codes.coalesce(1)) === a)
    // null arrays are skipped but the group still counts its rows
    val withNull = codes.unionByName(
      Seq("0").toDF("g").withColumn("qcode", lit(null).cast("array<tinyint>")))
    val b = sums(withNull)
    assert(b.find(_._1 == "0").get._3 === a.find(_._1 == "0").get._3)
    assert(b.find(_._1 == "0").get._2 === a.find(_._1 == "0").get._2 + 1)
    // the plan partial-aggregates: map-side partial + final, object hash agg
    val plan = Similarity.groupedCodeSums(codes, "g").queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert("vec_sum_long".r.findAllIn(plan).size >= 2, plan)
  }

  test("cosineNearDup finds planted perturbed clones") {
    import spark.implicits._
    val base = emb.select("vec_id", "embedding")
    val clones = base.filter(col("vec_id") % 10 === 0)
      .withColumn("vec_id", col("vec_id") + 100000)
      .withColumn("embedding", transform(col("embedding"), x => x + lit(0.02f)).cast("array<float>"))
    val nClones = clones.count()
    val found = Similarity.cosineNearDup(base.unionByName(clones), threshold = 0.95)
      .filter(col("id_b") === col("id_a") + 100000).count()
    // bucket collision is probabilistic per pair; planted pairs are near-identical
    // so nearly all must collide in at least one arrangement
    assert(found >= (nClones * 0.9).toLong,
      s"found only $found of $nClones planted near-dup pairs")
  }

  test("semanticDecontaminate: exact cosine threshold, no sqrt drift") {
    val spark0 = spark
    import spark0.implicits._
    // hand geometry: eval = (1,0). cos((1,0))=1 drop; cos((1,1))=0.7071 < 3/4
    // keep; cos((2,1))=0.8944 drop; cos((-1,0))=-1 keep (dot <= 0)
    val corpus = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(1f, 1f)), (3L, Seq(2f, 1f)), (4L, Seq(-1f, 0f))
    ).toDF("vec_id", "embedding")
    val ev = Seq((100L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val r = Similarity.semanticDecontaminate(corpus, ev)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r === Map(1L -> 1L, 2L -> 0L, 3L -> 1L, 4L -> 0L))
    // quantization check on (2,1): codes (127, 64); cos² = 127²·(2·127+64)²
    // vs self products — the integer rule must agree with the real cosine
    // side of 3/4 here (0.894 > 0.75)
  }

  test("semanticDecontaminate covers every corpus row and counts multi-flags") {
    val spark0 = spark
    import spark0.implicits._
    val corpus = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    // two eval vectors both cosine-1 to corpus vec 1
    val ev = Seq((10L, Seq(2f, 0f)), (11L, Seq(3f, 0f))).toDF("vec_id", "embedding")
    val r = Similarity.semanticDecontaminate(corpus, ev)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sortBy(_._1)
    assert(r.toSeq === Seq((1L, 2L, 1L), (2L, 0L, 0L)))
  }
}

package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dedup operators find planted duplicates, and candidate generation is
  * bucket-bounded (the hot-shingle case must not blow up).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "a completely different document about spark query engines and shuffles"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (4L, "quick brown fox jumps over the lazy dog near the river bank today"),     // near dup of 1
    (5L, "unrelated text with numbers 1 2 3 4 5 6 7 8 9 and letters a b c d e")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical content") {
    val out = Dedup.exact(corpus).collect()
    val dupGroup = out.find(_.getAs[Long]("copies") == 2L)
    assert(dupGroup.isDefined)
    assert(dupGroup.get.getAs[Long]("keep_id") === 1L)
    assert(out.length === 4) // 5 docs, one pair collapses
  }

  test("minhash LSH surfaces the exact and near pair; jaccard verifies") {
    val sigs = Dedup.minhashSignatures(corpus)
    val cands = Dedup.minhashCandidates(sigs)
    val verified = Dedup.jaccardVerify(corpus, cands, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(verified.contains((1L, 3L))) // exact dup: jaccard 1.0
    assert(verified.contains((1L, 4L)) || verified.contains((3L, 4L))) // near dup
    assert(!verified.exists(p => p._1 == 2L || p._2 == 2L)) // unrelated never pairs
  }

  test("minhashSignatures length tracks numHashes; candidates reject bad banding") {
    val sigs = Dedup.minhashSignatures(corpus, numHashes = 32)
    assert(sigs.select(size(col("signature"))).as[Int].head() === 32)
    intercept[IllegalArgumentException] {
      Dedup.minhashCandidates(sigs, bands = 10, sigLen = 32) // 32 % 10 != 0
    }
    // correct parameterization works
    assert(Dedup.minhashCandidates(sigs, bands = 8, sigLen = 32).columns.toSeq
      === Seq("doc_a", "doc_b"))
  }

  test("jaccardVerify stays candidate-bounded under a hot shingle") {
    // 60 docs share one hot phrase; only ONE candidate pair is requested.
    // The count stays exact and small — the fan-out guard in jaccardVerify.
    val hot = (1L to 60L).map(i => (i, s"shared hot phrase common to all docs plus unique token u$i"))
    val docs = hot.toDF("doc_id", "text")
    val oneCand = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val out = Dedup.jaccardVerify(docs, oneCand, threshold = 0.1).collect()
    assert(out.length === 1)
    val j = out.head.getAs[Double]("jaccard")
    assert(j > 0.5 && j < 1.0)
  }

  test("minhash candidates stay linear under a hot bucket (mass duplicate)") {
    // 1,000 exact copies of one document: every band bucket is hot, so the
    // uncapped pairwise join would emit ~m^2/2 = 499,500 candidate rows.
    // With the bucket cap the hot path star-links to the min-id
    // representative: exactly m-1 = 999 pairs, all reaching doc 1 — dedup
    // connectivity preserved, fan-out linear.
    val mass = (1L to 1000L)
      .map(i => (i, "the same boilerplate document repeated verbatim across the corpus"))
      .toDF("doc_id", "text")
    val cands = Dedup.minhashCandidates(Dedup.minhashSignatures(mass), maxBucket = 20)
      .as[(Long, Long)].collect()
    assert(cands.length === 999)
    assert(cands.forall(_._1 == 1L))
    assert(cands.map(_._2).toSet === (2L to 1000L).toSet)
  }

  test("simhash candidates stay linear under a hot bucket (mass duplicate)") {
    val mass = (1L to 1000L)
      .map(i => (i, "the same boilerplate document repeated verbatim across the corpus"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashCandidates(Dedup.simhash(mass), maxBucket = 20)
      .as[(Long, Long, Long)].collect()
    assert(pairs.length === 999)
    assert(pairs.forall(p => p._1 == 1L && p._3 == 0L)) // all to rep, hamming 0
  }

  test("LSH pipeline == brute-force shingle Jaccard on a cloned real corpus (full-parity law)") {
    // The law the retired q26 full oracle expressed, now held where the
    // corpus is controlled: over sf0.001 documents + planted exact/near
    // clones, the bucketed pipeline must emit EXACTLY the pairs a brute-force
    // pairwise Jaccard >= 0.7 finds — no misses, no phantoms, equal values.
    val docs = graft.core.Tables.documents(spark, sfDir).select("doc_id", "text")
    val clones = docs.filter(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + 100000)
    val near = docs.filter(col("doc_id") % 11 === 0)
      .withColumn("doc_id", col("doc_id") + 200000)
      .withColumn("text", expr("substring(text, instr(text, ' ') + 1)"))
    val corpus = docs.unionByName(clones).unionByName(near).localCheckpoint()
    val ids = corpus.select("doc_id")
    val allPairs = ids.select(col("doc_id").as("doc_a"))
      .crossJoin(ids.select(col("doc_id").as("doc_b")))
      .filter(col("doc_a") < col("doc_b"))
    def pairSet(cands: org.apache.spark.sql.DataFrame) =
      Dedup.jaccardVerify(corpus, cands, threshold = 0.7)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4))
        .as[(Long, Long, Double)].collect().toSet
    val truth = pairSet(allPairs) // O(n²) is exactly what the ORACLE should be
    val lsh = pairSet(Dedup.minhashCandidates(Dedup.minhashSignatures(corpus)))
    assert(truth.nonEmpty)
    assert(lsh === truth)
  }

  test("simhash near-dup: exact copies have hamming 0, near copies small hamming") {
    // SimHash needs enough tokens for per-bit sums to be stable: on a ~15
    // token doc a one-word edit flips many near-zero bit sums. Use prose-
    // length docs with a one-token edit — the regime the operator targets.
    val longText = (1 to 60).map(i => s"token$i").mkString(" ")
    val edited = (1 to 60).map(i => if (i == 30) "EDITED" else s"token$i").mkString(" ")
    val docs = Seq((1L, longText), (2L, longText), (3L, edited),
      (4L, "totally different short document about something else entirely"))
      .toDF("doc_id", "text")
    val sigs = Dedup.simhash(docs)
    val pairs = Dedup.simhashCandidates(sigs, maxHamming = 10)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(pairs.get((1L, 2L)).contains(0L)) // identical docs
    assert(pairs.contains((1L, 3L))) // one-token edit stays within 10 bits
    assert(!pairs.keys.exists(p => p._1 == 4L || p._2 == 4L)) // unrelated never pairs
  }

  test("containmentPairs finds an excerpt symmetric Jaccard misses, directionally") {
    import spark.implicits._
    val long = (1 to 60).map(i => s"w$i").mkString(" ")
    val excerpt = (1 to 20).map(i => s"w$i").mkString(" ") // first third of `long`
    val other = (100 to 160).map(i => s"x$i").mkString(" ")
    val docs = Seq((1L, long), (2L, excerpt), (3L, other)).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // excerpt ⊂ long passes at 100% containment…
    assert(got.contains((2L, 1L)))
    assert(got((2L, 1L))._1 === got((2L, 1L))._2) // shared == its full shingle count
    // …but NOT the reverse (long is only ~1/3 covered by the excerpt)
    assert(!got.contains((1L, 2L)))
    // and the unrelated doc pairs with nothing
    assert(!got.keys.exists(p => p._1 == 3L || p._2 == 3L))
    // the same pair is invisible to symmetric Jaccard at the q26 threshold:
    // J(excerpt, long) = 18/58 << 0.7
    val cand = Seq((2L, 1L)).toDF("doc_a", "doc_b")
    assert(Dedup.jaccardVerify(docs, cand, threshold = 0.7).count() === 0)
  }
}

package graft.scale

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Kneser–Ney bigram laws: the three-way branch partition, the
  * self-scoring degenerate case, a fully hand-computed integer trajectory,
  * the short-doc floor, and determinism.
  */
class KneserNeySpec extends SparkSpec {

  test("hand-computed trajectory: all three branches, exact integers") {
    val spark0 = spark
    import spark0.implicits._
    // train: b = {(x,y):2, (y,x):1, (x,z):1}, B = 3
    //   ctx: x -> (pc 3, n1fw 2); y -> (pc 1, n1fw 1)
    //   bw:  x -> 1, y -> 1, z -> 1
    val train = Seq((1L, "x y x y"), (2L, "x z")).toDF("doc_id", "text")
    // score "x y q y": (x,y) hit  = bits(12) - bits(5)          = 4 - 3 = 1
    //                  (y,q) back = bits(4) + bits(3) - bits(3) - bits(1) = 3+2-2-1 = 2
    //                  (q,y) cold = bits(3) - bits(1)           = 2 - 1 = 1
    val score = Seq((10L, "x y q y")).toDF("doc_id", "text")
    val r = KneserNey.knBigramScore(train, score).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("n_trans") === 3L)
    assert(row.getAs[Long]("n_hit") === 1L)
    assert(row.getAs[Long]("n_backoff") === 1L)
    assert(row.getAs[Long]("n_cold") === 1L)
    assert(row.getAs[Long]("kn_bits") === 4L)
  }

  test("branch counts partition n_trans on the real corpus") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val r = KneserNey.knBigramScore(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1)).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("n_hit") + row.getAs[Long]("n_backoff") +
        row.getAs[Long]("n_cold") === row.getAs[Long]("n_trans"))
      assert(row.getAs[Long]("kn_bits") >= 0L)
    }
    // a held-out split on a real corpus must actually exercise backoff
    assert(r.map(_.getAs[Long]("n_backoff")).sum +
      r.map(_.getAs[Long]("n_cold")).sum > 0)
  }

  test("self-scoring degenerates to all-hit (every bigram seen)") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val r = KneserNey.knBigramScore(docs, docs).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("n_backoff") === 0L)
      assert(row.getAs[Long]("n_cold") === 0L)
      assert(row.getAs[Long]("n_hit") === row.getAs[Long]("n_trans"))
    }
  }

  test("docs with fewer than two words score all-zero, not null and not missing") {
    val spark0 = spark
    import spark0.implicits._
    val train = Seq((1L, "x y")).toDF("doc_id", "text")
    val score = Seq((10L, ""), (11L, "lone"), (12L, "x y")).toDF("doc_id", "text")
    val r = KneserNey.knBigramScore(train, score).orderBy("doc_id").collect()
    assert(r.length === 3)
    assert(r(0).getAs[Long]("n_trans") === 0L && r(0).getAs[Long]("kn_bits") === 0L)
    assert(r(1).getAs[Long]("n_trans") === 0L && r(1).getAs[Long]("kn_bits") === 0L)
    assert(r(2).getAs[Long]("n_hit") === 1L)
  }

  test("rarer transitions cost more bits (the discount orders within a context)") {
    val spark0 = spark
    import spark0.implicits._
    // context x: 7 transitions to y, 1 to z — same pc, different bc
    val train = Seq((1L, "x y x y x y x y x y x y x y x z")).toDF("doc_id", "text")
    def bitsOfScore(word: String): Long =
      KneserNey.knBigramScore(train, Seq((9L, s"x $word")).toDF("doc_id", "text"))
        .collect().head.getAs[Long]("kn_bits")
    assert(bitsOfScore("z") > bitsOfScore("y"))
  }

  test("trigram hand case: hit, backoff-through-bigram, cold, exact integers") {
    val spark0 = spark
    import spark0.implicits._
    // train "x y z x y z": tc = {(x,y,z):2, (y,z,x):1, (z,x,y):1}
    //   c2: (x,y)->(2,1), (y,z)->(1,1), (z,x)->(1,1)
    //   bigram level: b = {(x,y):2, (y,z):2, (z,x):1}, B = 3
    val train = Seq((1L, "x y z x y z")).toDF("doc_id", "text")
    // score "x y z q":
    //   (x,y,z) hit  = bits(8) - bits(5)              = 4 - 3 = 1
    //   (y,z,q) back = bits(4) - bits(3)               = 3 - 2 = 1
    //           + bigram (z,q): z warm pc=1, q unseen
    //             = bits(4) + bits(3) - bits(3) - bits(1) = 3+2-2-1 = 2
    val r1 = KneserNey.knTrigramScore(train, Seq((10L, "x y z q")).toDF("doc_id", "text"))
      .collect().head
    assert(r1.getAs[Long]("n_tri") === 2L)
    assert(r1.getAs[Long]("n_hit3") === 1L)
    assert(r1.getAs[Long]("n_back3") === 1L)
    assert(r1.getAs[Long]("n_cold3") === 0L)
    assert(r1.getAs[Long]("kn3_bits") === 4L)
    // score "q r s": cold trigram context -> pure bigram rule, itself cold
    //   = bits(3) - bits(1) = 1
    val r2 = KneserNey.knTrigramScore(train, Seq((11L, "q r s")).toDF("doc_id", "text"))
      .collect().head
    assert(r2.getAs[Long]("n_tri") === 1L)
    assert(r2.getAs[Long]("n_cold3") === 1L)
    assert(r2.getAs[Long]("kn3_bits") === 1L)
  }

  test("trigram branch counts partition n_tri; self-score is all-hit") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val held = KneserNey.knTrigramScore(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1)).collect()
    assert(held.nonEmpty)
    held.foreach { r =>
      assert(r.getAs[Long]("n_hit3") + r.getAs[Long]("n_back3") +
        r.getAs[Long]("n_cold3") === r.getAs[Long]("n_tri"))
      assert(r.getAs[Long]("kn3_bits") >= 0L)
    }
    val self = KneserNey.knTrigramScore(docs, docs).collect()
    self.foreach { r =>
      assert(r.getAs[Long]("n_hit3") === r.getAs[Long]("n_tri"))
    }
    // docs of < 3 words zero out
    val spark0 = spark
    import spark0.implicits._
    val short = KneserNey.knTrigramScore(docs,
      Seq((99L, "two words")).toDF("doc_id", "text")).collect().head
    assert(short.getAs[Long]("n_tri") === 0L && short.getAs[Long]("kn3_bits") === 0L)
  }

  test("scoring is deterministic") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    def run() = KneserNey.knBigramScore(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1)).orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(run() === run())
  }
}

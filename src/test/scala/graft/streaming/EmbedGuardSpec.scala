package graft.streaming

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** EmbedGuard protocol laws: fail-closed unseeded, frozen-screen order
  * invariance (batch-split invariance), stamped redelivery idempotence,
  * and agreement with the batch decontamination closed form.
  */
class EmbedGuardSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")

  private def evalPanel = emb.filter(col("vec_id") % 10 === 0)
    .withColumn("vec_id", col("vec_id") + 100000)
    .withColumn("embedding",
      transform(col("embedding"), x => x + lit(0.02f)).cast("array<float>"))

  private def admittedSet(idx: EmbedGuardIndex): Set[Long] = {
    val spark0 = spark
    import spark0.implicits._
    idx.served().as[Long].collect().toSet
  }

  test("fails closed on an unseeded index") {
    val idx = new EmbedGuardIndex(spark, s"${scratch("eg-unseeded")}/g")
    val e = intercept[IllegalArgumentException] { idx.processBatch(emb, 0L) }
    assert(e.getMessage.contains("fail closed"))
  }

  test("frozen screen: any batch split admits the identical set (= the batch closed form)") {
    val batchForm = graft.scale.Similarity.semanticDecontaminate(emb, evalPanel)
      .filter(col("dropped") === 0).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val one = new EmbedGuardIndex(spark, s"${scratch("eg-one")}/g")
    one.seed(evalPanel)
    one.processBatch(emb, 0L)
    assert(admittedSet(one) === batchForm)
    val four = new EmbedGuardIndex(spark, s"${scratch("eg-four")}/g", maxChainDepth = 2)
    four.seed(evalPanel)
    for (i <- 0 until 4)
      four.processBatch(emb.filter(pmod(col("vec_id"), lit(4)) === i), i.toLong)
    assert(admittedSet(four) === batchForm)
    assert(batchForm.nonEmpty)
  }

  test("stamped redelivery: replaying a batch id is a no-op; torn retry never duplicates") {
    val idx = new EmbedGuardIndex(spark, s"${scratch("eg-replay")}/g")
    idx.seed(evalPanel)
    val b0 = emb.filter(col("vec_id") < 100)
    idx.processBatch(b0, 0L)
    val after = admittedSet(idx)
    idx.processBatch(b0, 0L) // redelivery
    assert(admittedSet(idx) === after)
    // torn retry: the same ids arriving under a NEW batch id must not
    // duplicate rows in the admitted log (the anti-join law)
    idx.processBatch(b0, 1L)
    assert(idx.served().count() === after.size.toLong)
    // genuinely new ids still flow
    idx.processBatch(emb.filter(col("vec_id") >= 100 && col("vec_id") < 120), 2L)
    assert(admittedSet(idx).size > after.size)
  }

  test("null embeddings are tracked as dropped, not silently discarded or admitted") {
    val spark0 = spark
    import spark0.implicits._
    val idx = new EmbedGuardIndex(spark, s"${scratch("eg-null")}/g")
    idx.seed(evalPanel)
    val withNulls = emb.filter(col("vec_id") < 40)
      .withColumn("embedding",
        when(col("vec_id") % 5 === 0, lit(null)).otherwise(col("embedding"))
          .cast("array<float>"))
    idx.processBatch(withNulls, 0L)
    val nullIds = (0L until 40L).filter(_ % 5 == 0).toSet
    assert(idx.droppedNull().as[Long].collect().toSet === nullIds)
    assert(admittedSet(idx).intersect(nullIds).isEmpty)
    // redelivery + torn retry never duplicate dropped rows either
    idx.processBatch(withNulls, 0L)
    idx.processBatch(withNulls, 1L)
    assert(idx.dropped.read().count() === nullIds.size.toLong)
  }

  private def scratch(p: String): String = graft.core.Scratch.dir(s"graft-$p")
}

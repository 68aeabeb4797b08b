package graft.scale

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.GraftColumnBridge.{column => ncol, expression => nexpr}
import org.apache.spark.sql.functions._

class NbClassifierSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir).select("doc_id", "lang", "text")
  private lazy val labeled = docs.filter(col("doc_id") % 3 =!= 0)
    .withColumn("y", (col("lang") === "en").cast("int"))
  private lazy val model = NbClassifier.fit(labeled, topK = 16)

  test("fit returns sorted distinct keys aligned with weights") {
    assert(model.keys.length === 16)
    assert(model.keys.toSeq === model.keys.toSeq.sorted)
    assert(model.keys.distinct.length === model.keys.length)
    assert(model.weights.length === model.keys.length)
  }

  test("kernel score equals the explode+join reference computation") {
    val scored = NbClassifier.score(docs, model)
      .select("doc_id", "score", "n_hits")

    val m = model.keys.zip(model.weights).toSeq.toDF("k", "wt")
    val key = conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long")
    val ref = docs
      .select(col("doc_id"),
        explode(filter(split(col("text"), graft.expressions.Ws.Regex),
          w => w =!= "")).as("g"))
      .select(col("doc_id"), key.as("k"))
      .join(m, Seq("k"), "left")
      .groupBy("doc_id")
      .agg((sum(coalesce(col("wt"), lit(0L))) + lit(model.prior)).as("score"),
        count(col("wt")).as("n_hits"))
    // every fixture doc has at least one token, so the explode drops no doc
    assert(ref.count() === docs.count())
    assert(scored.exceptAll(ref).count() === 0)
    assert(ref.exceptAll(scored).count() === 0)
  }

  test("a document with no in-vocabulary tokens scores exactly the prior") {
    val byId = NbClassifier.score(
      Seq((1L, "xyzzy qwerty"), (2L, "")).toDF("doc_id", "text"), model)
      .select("doc_id", "score", "n_hits").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byId(1L) === ((model.prior, 0L)))
    assert(byId(2L) === ((model.prior, 0L)))
  }

  test("LongMapSum matches a brute-force scan and skips null elements") {
    val keys = Array(-7L, 0L, 3L, 99L)
    val vals = Array(10L, -2L, 5L, 1L)
    val data = Seq(
      (1L, Seq[java.lang.Long](3L, 3L, -7L, 42L)),
      (2L, Seq[java.lang.Long](null, 0L, 99L)),
      (3L, Seq.empty[java.lang.Long]))
    val df = data.toDF("id", "ks")
    val out = df.withColumn("s",
        ncol(graft.expressions.LongMapSum(nexpr(col("ks")), keys, vals)))
      .select("id", "s").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 20L, 2L -> -1L, 3L -> 0L))
  }
}

package graft.plans

import graft.SparkSpec
import graft.core.Tables
import graft.ops.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Laws for the custom per-key top-k operator: plan shape (two heap passes,
  * one exchange between them, no sort), value equality with the rank-window
  * form, k edge cases, and candidate bounding on the shuffle.
  */
class TopKSpec extends SparkSpec {

  private def orders = Tables.orders(spark, sfDir)
    .select("o_custkey", "o_orderkey", "o_totalprice")

  private def topk(k: Int) = TopK.topKPerKey(orders, Seq("o_custkey"),
    Seq(col("o_totalprice").desc, col("o_orderkey").asc), k)

  private def windowForm(k: Int) = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
  }

  test("plans as partial + final TopKPerKeyExec around one exchange, no sort") {
    val plan = topk(3).queryExecution.executedPlan.toString
    assert("TopKPerKey".r.findAllIn(plan).size == 2, plan)
    assert(plan.contains("Exchange"), plan)
    assert(!plan.contains("Sort ["), plan) // SortExec prints "Sort [...]"
    assert(!plan.contains("Window"), plan)
  }

  test("matches the rank-window form for k = 1, 3, 7") {
    for (k <- Seq(1, 3, 7)) {
      val got = topk(k).collect().toSet
      val want = windowForm(k).collect().toSet
      assert(got === want, s"k=$k: ${got.size} vs ${want.size} rows")
    }
  }

  test("k larger than any group passes every row through") {
    assert(topk(1000000).count() === orders.count())
  }

  test("results are stable across shuffle partition counts") {
    val base = topk(2).collect().toSet
    val repartitioned = TopK.topKPerKey(orders.repartition(13), Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 2).collect().toSet
    assert(base === repartitioned)
  }

  test("string keys and ascending order work (different type paths)") {
    val ev = Tables.events(spark, sfDir).select("user_id", "event_id", "event_type", "ts")
    val got = TopK.topKPerKey(ev, Seq("event_type"),
      Seq(col("ts").asc, col("event_id").asc), 4).collect().toSet
    val w = Window.partitionBy("event_type").orderBy(col("ts").asc, col("event_id").asc)
    val want = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4).drop("rn").collect().toSet
    assert(got === want)
  }

  test("partial pass bounds the shuffle: candidates <= k * keys * mappers") {
    // 4-partition input, 15 users, k=2: the exchange can carry at most
    // 4*15*2 = 120 candidate rows even though there are ~1000 events.
    val ev = Tables.events(spark, sfDir).select("user_id", "event_id", "ts")
      .repartition(4)
    val df = TopK.topKPerKey(ev, Seq("user_id"), Seq(col("ts").desc, col("event_id").desc), 2)
    df.collect()
    // AQE wraps executed stages in leaf QueryStageExec nodes; recurse into
    // them to reach the partial pass that ran before the exchange.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def collectTopK(p: SparkPlan): Seq[TopKPerKeyExec] = {
      val here = p match { case t: TopKPerKeyExec => Seq(t); case _ => Nil }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      here ++ kids.flatMap(collectTopK)
    }
    val partialRows = collectTopK(df.queryExecution.executedPlan)
      .filter(_.partial).map(_.metrics("numOutputRows").value)
    assert(partialRows.nonEmpty)
    assert(partialRows.head <= 120, s"partial emitted ${partialRows.head} rows")
    assert(partialRows.head < ev.count(), "partial pass did not reduce anything")
  }

  test("RankLimitToTopK: SQL rank<=k gets a heap pass below the window") {
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders_topk_rule")
    val sql =
      """SELECT o_custkey, o_orderkey, o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER
        |      (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders_topk_rule)
        |WHERE rn <= 4""".stripMargin
    val df = spark.sql(sql)
    val plan = df.queryExecution.optimizedPlan
    val topks = plan.collect { case t: TopKPerKey => t }
    assert(topks.map(_.k) === Seq(4), plan.toString)
    assert(plan.collect { case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }.nonEmpty,
      "window must survive to assign ranks")
    val expected = {
      spark.conf.set("spark.graft.rewriteRankLimitTopK", "false")
      try {
        val d = spark.sql(sql)
        assert(d.queryExecution.optimizedPlan.collect { case t: TopKPerKey => t }.isEmpty,
          "disable knob is dead")
        d.collect().toSet
      } finally spark.conf.unset("spark.graft.rewriteRankLimitTopK")
    }
    assert(df.collect().toSet === expected)
  }

  test("RankLimitToTopK leaves rank() and unpartitioned windows alone") {
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders_topk_rule2")
    val rankSql =
      """SELECT * FROM (SELECT o_orderkey, rank() OVER (PARTITION BY o_custkey
        |ORDER BY o_totalprice DESC) AS rn FROM orders_topk_rule2) WHERE rn <= 4""".stripMargin
    assert(spark.sql(rankSql).queryExecution.optimizedPlan
      .collect { case t: TopKPerKey => t }.isEmpty)
    val globalSql =
      """SELECT * FROM (SELECT o_orderkey, row_number() OVER
        |(ORDER BY o_totalprice DESC) AS rn FROM orders_topk_rule2) WHERE rn <= 4""".stripMargin
    assert(spark.sql(globalSql).queryExecution.optimizedPlan
      .collect { case t: TopKPerKey => t }.isEmpty)
  }

  test("PruneTopKPerKeyChild: a narrow projection shrinks ReadSchema") {
    // top-k needs (o_custkey, o_totalprice, o_orderkey); the wide input has
    // 9 columns. The pruning rule must stop the scan reading the rest.
    val wide = Tables.orders(spark, sfDir)
    val df = TopK.topKPerKey(wide, Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 2)
      .select("o_custkey", "o_orderkey")
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val readSchema = formatted.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.contains("o_custkey") && readSchema.contains("o_totalprice"), readSchema)
    assert(!readSchema.contains("o_comment") && !readSchema.contains("o_orderdate"),
      s"scan reads columns the top-k never needs: $readSchema")
    // and the pruned form still computes the same thing
    val want = windowForm(2).select("o_custkey", "o_orderkey").collect().toSet
    assert(df.collect().toSet === want)
  }

  test("rejects empty keys and k < 1") {
    intercept[IllegalArgumentException](TopK.topKPerKey(orders, Seq.empty, Seq(col("o_orderkey").asc), 3).collect())
    intercept[IllegalArgumentException](topk(0).collect())
    intercept[IllegalArgumentException](
      TopK.topKPerKey(orders, Seq("no_such_col"), Seq(col("o_orderkey").asc), 3).collect())
  }
}

package graft.plans

import graft.SparkSpec
import graft.core.Tables
import graft.write.Writers
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Laws for the injected rank-1-window → min_by/max_by optimizer rule:
  * the rewrite fires on the latest-wins idiom (Column API and raw SQL),
  * never changes answers, and declines the shapes it cannot express.
  */
class RankOneWindowToAggregateSpec extends SparkSpec {

  private val ConfKey = "spark.graft.rewriteRankOneWindow"

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  private def withRuleDisabled[A](body: => A): A = {
    spark.conf.set(ConfKey, "false")
    try body finally spark.conf.unset(ConfKey)
  }

  private def events = Tables.events(spark, sfDir)

  test("latestWins (desc order) rewrites to a max_by aggregate, no Window") {
    val df = Writers.latestWins(events,
      keys = Seq("user_id", "event_type"), orderCols = Seq("ts", "event_id"))
    val plan = optimized(df)
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("max_by"), plan)
  }

  test("ascending SQL rank-1 rewrites to min_by and matches the window answer") {
    events.createOrReplaceTempView("ev_rank1")
    val sql =
      """SELECT user_id, event_type, event_id, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS seq FROM ev_rank1)
        |WHERE seq = 1""".stripMargin
    val rewritten = spark.sql(sql)
    assert(!optimized(rewritten).contains("Window"), optimized(rewritten))
    assert(optimized(rewritten).contains("min_by"), optimized(rewritten))
    val expected = withRuleDisabled {
      val df = spark.sql(sql)
      assert(optimized(df).contains("Window"), "disable knob is dead")
      df.collect().toSet
    }
    assert(rewritten.collect().toSet === expected)
  }

  test("rewrite preserves latest-wins results exactly (A/B vs disabled rule)") {
    def run(): Set[org.apache.spark.sql.Row] =
      Writers.latestWins(events, keys = Seq("user_id", "event_type"),
        orderCols = Seq("ts", "event_id")).collect().toSet
    val withRule = run()
    val withoutRule = withRuleDisabled(run())
    assert(withRule === withoutRule)
  }

  test("extra filter conjuncts survive the rewrite") {
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val df = events.withColumn("seq", row_number().over(w))
      .filter(col("seq") === 1 && col("value") > 100)
      .drop("seq")
    val plan = optimized(df)
    assert(!plan.contains("Window"), plan)
    val expected = withRuleDisabled {
      events.withColumn("seq", row_number().over(w))
        .filter(col("seq") === 1 && col("value") > 100)
        .drop("seq").collect().toSet
    }
    assert(df.collect().toSet === expected)
  }

  test("mixed sort directions are not rewritten (no struct extremum exists)") {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").desc)
    val df = events.withColumn("seq", row_number().over(w))
      .filter(col("seq") === 1).drop("seq")
    assert(optimized(df).contains("Window"), optimized(df))
  }

  test("rank() is not rewritten (keeps ties, unlike row_number)") {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc)
    val df = events.withColumn("seq", rank().over(w))
      .filter(col("seq") === 1).drop("seq")
    assert(optimized(df).contains("Window"), optimized(df))
  }

  test("a kept seq column resolves to literal 1 after the rewrite") {
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val df = events.withColumn("seq", row_number().over(w)).filter(col("seq") === 1)
    val plan = optimized(df)
    assert(!plan.contains("Window"), plan)
    assert(df.select("seq").distinct().collect().map(_.getInt(0)).toSeq === Seq(1))
  }

  test("q113's registered SQL query runs through the rewrite (max_by, no Window)") {
    val df = graft.SparkEntry.queries("q113_sql_latest_order")(spark, sfDir)
    val plan = optimized(df)
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("max_by"), plan)
  }

  test("null ordering matches: ASC NULLS FIRST picks the null-key row first") {
    import spark.implicits._
    val df = Seq(("a", Some(2), "x"), ("a", None, "y"), ("b", Some(1), "z"))
      .toDF("k", "o", "v")
      .select(col("k"), col("o").cast("int").as("o"), col("v"))
    val w = Window.partitionBy("k").orderBy(col("o").asc)
    def run(d: DataFrame): Map[String, String] =
      d.withColumn("seq", row_number().over(w)).filter(col("seq") === 1)
        .select("k", "v").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val got = run(df)
    assert(!optimized(df.withColumn("seq", row_number().over(w))
      .filter(col("seq") === 1)).contains("Window"))
    assert(got === Map("a" -> "y", "b" -> "z"))
    assert(got === withRuleDisabled(run(df)))
  }
}

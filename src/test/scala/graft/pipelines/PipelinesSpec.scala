package graft.pipelines

import graft.SparkSpec
import graft.run.{JobRunner, Notifier, RetryPolicy}
import graft.sources.{Fetcher, FixtureStockApi}
import graft.write.VersionedTable
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.time.LocalDate

class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  private def wh() = Files.createTempDirectory("graft-pipe").toString

  test("nameGender: CSV fetch -> clean -> full refresh; rerun is idempotent (W1)") {
    val t = new VersionedTable(spark, s"${wh()}/ng")
    val fetcher: Fetcher = _ => "name,gender\nAlice,F\nBob,M\n,\n"
    Pipelines.nameGender(spark, "http://x/csv", fetcher, t)
    assert(t.read().count() === 2) // null row cleaned
    Pipelines.nameGender(spark, "http://x/csv", fetcher, t)
    assert(t.read().count() === 2)
    assert(t.currentVersion === Some(1)) // two promoted versions, latest read
  }

  test("stockV2: append + DISTINCT collapses redelivered identical bars (W3 v2)") {
    val t = new VersionedTable(spark, s"${wh()}/stock2")
    val api = new FixtureStockApi(days = 10)
    Pipelines.stockV2(spark, api, Seq("AAA"), t)
    val n1 = t.read().count()
    Pipelines.stockV2(spark, api, Seq("AAA"), t) // same bars again
    assert(t.read().count() === n1)
  }

  test("stockV3: latest-wins by (symbol,date) with audit column (W3 v3/F6)") {
    val t = new VersionedTable(spark, s"${wh()}/stock3")
    val api = new FixtureStockApi(days = 10)
    Pipelines.stockV3(spark, api, Seq("AAA", "BBB"), t)
    Pipelines.stockV3(spark, api, Seq("AAA", "BBB"), t)
    val out = t.read()
    assert(out.columns.contains("created_date"))
    assert(out.count() === 20) // one per (symbol, date) despite double delivery
    assert(out.groupBy("symbol", "date").count().filter(col("count") > 1).count() === 0)
  }

  test("country: nested JSON -> projection -> full refresh (W2/P2)") {
    val t = new VersionedTable(spark, s"${wh()}/country")
    val fetcher: Fetcher = _ =>
      """{"name":{"official":"Republic of Korea"},"population":51780579,"area":100210.0}
        |{"name":{"official":"Japan"},"population":125836021,"area":377930.0}""".stripMargin
    Pipelines.country(spark, "http://x/countries", fetcher, t)
    val rows = t.read().as[(String, Long, Double)].collect().toSet
    assert(rows === Set(("Republic of Korea", 51780579L, 100210.0),
      ("Japan", 125836021L, 377930.0)))
  }

  test("runDateSlice keeps exactly the run's day") {
    val df = Seq(("2024-01-14 23:59:59", 1), ("2024-01-15 00:00:00", 2),
      ("2024-01-15 23:59:59", 3), ("2024-01-16 00:00:00", 4))
      .toDF("ts", "id").withColumn("ts", to_timestamp(col("ts")))
    val got = Pipelines.runDateSlice(df, "ts", LocalDate.of(2024, 1, 15))
      .select("id").as[Int].collect().toSet
    assert(got === Set(2, 3))
  }

  test("backfill crash recovery: resumes from the failed date, nothing re-runs twice") {
    val w = wh()
    val runner = new Pipelines.BackfillRunner(spark,
      new VersionedTable(spark, s"$w/manifest"))
    val ran = scala.collection.mutable.ArrayBuffer.empty[(LocalDate, Long)]
    val start = LocalDate.of(2024, 3, 1)
    val crashOn = start.plusDays(2)
    // first attempt dies on day 3 of 5 — days 1..2 are recorded, 3..5 not
    intercept[RuntimeException] {
      runner.backfill(start, start.plusDays(4)) { (d, seq) =>
        if (d == crashOn) throw new RuntimeException("boom")
        ran += d -> seq
      }
    }
    assert(ran.toSeq === Seq(start -> 1L, start.plusDays(1) -> 1L))
    // recovery backfill over the SAME window: only the unrecorded tail runs,
    // still in order, all at seq 1 (nothing double-executed)
    val resumed = runner.backfill(start, start.plusDays(4)) { (d, seq) => ran += d -> seq }
    assert(resumed === Seq(crashOn -> 1L, start.plusDays(3) -> 1L, start.plusDays(4) -> 1L))
    assert(ran.toSeq === (0 to 4).map(i => start.plusDays(i) -> 1L))
    // a third pass is a complete no-op
    assert(runner.backfill(start, start.plusDays(4)) { (d, s) => ran += d -> s }.isEmpty)
    assert(ran.size === 5)
  }

  test("dailyRun wires the chain: both tables exist after, rerun idempotent (C1/C8)") {
    val w = wh()
    val runner = new JobRunner(RetryPolicy(retries = 0, delayMillis = 0),
      Notifier.noop, sleep = _ => ())
    val fetcher: Fetcher = _ => "name,gender\nAlice,F\n"
    Pipelines.dailyRun(spark, sfDir, w, runner, LocalDate.of(2024, 1, 15), fetcher, "http://x")
    val ng = new VersionedTable(spark, s"$w/name_gender")
    val ev = new VersionedTable(spark, s"$w/events_daily")
    assert(ng.read().count() === 1)
    val n1 = ev.read().count()
    assert(n1 > 0)
    // next day's run appends only that day's slice, upsert keeps both days
    Pipelines.dailyRun(spark, sfDir, w, runner, LocalDate.of(2024, 1, 16), fetcher, "http://x")
    assert(ev.read().count() > n1)
    // same-day rerun: no growth (upsert idempotency)
    val n2 = ev.read().count()
    Pipelines.dailyRun(spark, sfDir, w, runner, LocalDate.of(2024, 1, 16), fetcher, "http://x")
    assert(ev.read().count() === n2)
  }
}

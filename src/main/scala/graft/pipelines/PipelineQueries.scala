package graft.pipelines

import graft.core.{Q, Tables}
import graft.run.{JobRunner, Notifier, RetryPolicy}
import graft.sources.{Fetcher, FixtureStockApi}
import graft.write.VersionedTable
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.time.LocalDate

object PipelineQueries {

  val queries: Seq[Q] = Seq(

    // The 100 TB daily-run shape end-to-end: two run-dates sliced from
    // events, each landed via dynamic partition overwrite (day 2 re-run to
    // prove partition-scoped idempotency), read back through the partitioned
    // table. Oracle = the same two days straight from the source.
    Q("q60_partitioned_daily",
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE CAST(ts AS DATE) = DATE '2024-01-10' OR CAST(ts AS DATE) = DATE '2024-01-11'
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val root = Files.createTempDirectory("graft-q60").toString
      val t = new graft.write.DatePartitionedTable(s, root)
      val events = Tables.events(s, d)
        .select("event_id", "user_id", "event_type", "ts", "value")
      def run(day: LocalDate): Unit =
        t.writeRun(Pipelines.runDateSlice(events, "ts", day).drop("ts"), day)
      run(LocalDate.of(2024, 1, 10))
      run(LocalDate.of(2024, 1, 11))
      run(LocalDate.of(2024, 1, 11)) // idempotent re-run of day 2
      t.read()
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    },

    // P4/C8 — the parameterized run-date predicate as a declared operator:
    // one day's slice of the events stream (the filter reaches the parquet
    // scan as a pushed predicate on the nanos column's derived date).
    Q("q43_rundate_filter",
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE CAST(ts AS DATE) = DATE '2024-01-15' ORDER BY event_id""".stripMargin) { (s, d) =>
      Pipelines.runDateSlice(Tables.events(s, d), "ts", LocalDate.of(2024, 1, 15))
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    },

    // S3/W3/F6/C1 — the stock v3 pipeline end-to-end, run TWICE to prove
    // idempotency: fixture bars → audit column → latest-wins by (symbol,
    // date) → versioned promote; the result is the promoted table, which
    // must hold exactly one row per (symbol, date).
    Q.noOracle("q44_pipeline_stock") { (s, _) =>
      val wh = Files.createTempDirectory("graft-q44").toString
      val table = new VersionedTable(s, s"$wh/stock_info_v3")
      val api = new FixtureStockApi(days = 30)
      val symbols = Seq("AAPL", "MSFT", "GOOG")
      Pipelines.stockV3(s, api, symbols, table)
      Pipelines.stockV3(s, api, symbols, table) // rerun: latest-wins keeps one
      table.read()
        .select("symbol", "date", "open", "high", "low", "close", "volume")
        .orderBy("symbol", "date")
    },

    // S2/P2/F8/W3/C1/C5 — the weather pipeline end-to-end through the
    // JobRunner with a retry: the fetcher fails once (transient), the runner
    // retries, nested JSON becomes per-day rows, latest-wins on re-delivery.
    Q.noOracle("q45_pipeline_weather") { (s, _) =>
      val wh = Files.createTempDirectory("graft-q45").toString
      val table = new VersionedTable(s, s"$wh/weather")
      val days = (0 until 8).map { i =>
        s"""{"dt": ${1704067200L + i * 86400}, "temp": {"day": ${10 + i}.5, "min": ${i}.0, "max": ${20 + i}.0}}"""
      }.mkString(",")
      val payload = s"""{"daily": [$days]}"""
      var calls = 0
      val flaky: Fetcher = _ => { calls += 1; if (calls == 1) sys.error("transient"); payload }
      val runner = new JobRunner(RetryPolicy(retries = 1, delayMillis = 0),
        Notifier.noop, sleep = _ => ())
      runner.runChain(graft.run.RunContext(s, LocalDate.of(2024, 1, 1)),
        graft.run.Job("weather", c => Pipelines.weather(c.spark, "http://fixture/weather", flaky, table)))
      table.read()
        .select(col("date").cast("string").as("date"), col("temp"), col("min_temp"), col("max_temp"))
        .orderBy("date")
    },
  )
}

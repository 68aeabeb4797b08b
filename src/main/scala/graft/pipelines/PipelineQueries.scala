package graft.pipelines

import graft.core.{Q, Tables}
import graft.run.{JobRunner, Notifier, RetryPolicy}
import graft.sources.{Fetcher, FixtureStockApi}
import graft.write.VersionedTable
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.time.LocalDate

object PipelineQueries {

  /** q44's oracle: the fixture bars are pure deterministic Scala, so the
    * expected table is computed here (same code path the query runs) and
    * embedded as a VALUES relation in the DuckDB SQL — upgrading q44 from a
    * rows-only check to a full value-level compare. CASTs pin DuckDB's
    * literal types (a bare 107.77 would bind as DECIMAL) to the Spark
    * output's DOUBLE/BIGINT.
    */
  private def stockOracleSql: String = {
    val api = new FixtureStockApi(days = 30)
    val bars = Seq("AAPL", "MSFT", "GOOG").flatMap(api.history)
    val values = bars.map(b =>
      s"('${b.symbol}', '${b.date}', ${b.open}, ${b.high}, ${b.low}, ${b.close}, ${b.volume})")
      .mkString(",\n")
    s"""SELECT symbol, "date", CAST(open AS DOUBLE) AS open, CAST(high AS DOUBLE) AS high,
       | CAST(low AS DOUBLE) AS low, CAST(close AS DOUBLE) AS close,
       | CAST(volume AS BIGINT) AS volume
       |FROM (VALUES
       |$values) t(symbol, "date", open, high, low, close, volume)
       |ORDER BY symbol, "date"""".stripMargin
  }

  /** q45's oracle: same idea — the synthetic 8-day weather payload below is
    * deterministic, so the expected rows are literal.
    */
  private def weatherOracleSql: String = {
    val values = (0 until 8).map { i =>
      val date = LocalDate.of(2024, 1, 1).plusDays(i)
      s"('$date', ${10 + i}.5, $i.0, ${20 + i}.0)"
    }.mkString(",\n")
    s"""SELECT "date", CAST(temp AS DOUBLE) AS temp, CAST(min_temp AS DOUBLE) AS min_temp,
       | CAST(max_temp AS DOUBLE) AS max_temp
       |FROM (VALUES
       |$values) t("date", temp, min_temp, max_temp)
       |ORDER BY "date"""".stripMargin
  }

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
    Q("q44_pipeline_stock", stockOracleSql) { (s, _) =>
      val wh = Files.createTempDirectory("graft-q44").toString
      val table = new VersionedTable(s, s"$wh/stock_info_v3")
      val api = new FixtureStockApi(days = 30)
      val symbols = Seq("AAPL", "MSFT", "GOOG")
      Pipelines.stockV3(s, api, symbols, table)
      Pipelines.stockV3(s, api, symbols, table) // rerun: latest-wins keeps one
      table.read()
        .select(col("symbol"), col("date").cast("string").as("date"),
          col("open"), col("high"), col("low"), col("close"), col("volume"))
        .orderBy("symbol", "date")
    },

    // S2/P2/F8/W3/C1/C5 — the weather pipeline end-to-end through the
    // JobRunner with a retry: the fetcher fails once (transient), the runner
    // retries, nested JSON becomes per-day rows, latest-wins on re-delivery.
    Q("q45_pipeline_weather", weatherOracleSql) { (s, _) =>
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

    // Time travel, driver-certified (it was spec-only): version 0 is a full
    // refresh of the even-id docs, version 1 a W4 upsert that rewrites the
    // %4==0 rows and inserts the odd ids. The output is computed by DIFFING
    // the two version reads — readVersion(0) against read() — so it is
    // correct only if the promoted upsert left v0's directory byte-intact
    // and the manifest flip really is the only thing a write moves. The
    // oracle replays the id arithmetic; 'updated'/'added'/'unchanged' per
    // row must agree exactly.
    Q("q103_time_travel",
      """SELECT doc_id,
        | CASE WHEN doc_id % 2 = 1 THEN 'added'
        |      WHEN doc_id % 4 = 0 THEN 'updated'
        |      ELSE 'unchanged' END AS change
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val wh = Files.createTempDirectory("graft-q103").toString
      val table = new VersionedTable(s, s"$wh/docs")
      val docs = Tables.documents(s, d).select("doc_id", "text")
      table.fullRefresh(docs.filter(col("doc_id") % 2 === 0))
      val batch = docs.filter(col("doc_id") % 4 === 0)
        .withColumn("text", concat(col("text"), lit(" [v2]")))
        .unionByName(docs.filter(col("doc_id") % 2 === 1))
      table.upsert(batch, Seq("doc_id"))
      val v0 = table.readVersion(0).select(col("doc_id"), col("text").as("old_text"))
      table.read().join(v0, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          when(col("old_text").isNull, "added")
            .when(col("text") =!= col("old_text"), "updated")
            .otherwise("unchanged").as("change"))
        .orderBy("doc_id")
    },
  )
}

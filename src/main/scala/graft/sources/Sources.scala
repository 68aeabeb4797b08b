package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import java.nio.file.{Files, Path, Paths}
import java.nio.charset.StandardCharsets
import java.time.LocalDate

/** The reference's ingestion surface (SURVEY.md §2.1), re-expressed so that
  * every byte of parsing happens inside Spark's distributed readers with an
  * explicit schema (schema-on-read, fail-fast) — the reference's driver-side
  * row loops (e.g. NameGenderCSVtoRedshift.py:33-37) never scale past one
  * process.
  *
  * Network fetches are behind a [[Fetcher]] so tests and the offline build
  * stay hermetic; the live implementation is a plain HTTPS GET exactly like
  * the reference's `requests.get(url).text`.
  */
/** Serializable because [[HttpSource.parallel]] ships the fetcher inside a
  * mapPartitions closure to executors; a non-serializable implementation
  * would fail the whole job at submit time with Task not serializable.
  */
trait Fetcher extends Serializable { def fetch(url: String): String }

/** Live HTTP fetch (S1/S2 production path — NameGenderCSVtoRedshift.py:24-28,
  * UpdateCountry.py:27-35). Driver-side by design: the reference fetches one
  * small payload per run; for many-URL ingestion see [[HttpSource.parallel]].
  */
object HttpFetcher extends Fetcher {
  def fetch(url: String): String = {
    val src = scala.io.Source.fromURL(url, "UTF-8")
    try src.mkString finally src.close()
  }
}

/** Landing-zone convention (S7 — Gsheet_to_Redshift.py:57-63): fetched
  * payloads are staged to a local/`s3a:` path and then read by Spark's
  * distributed readers, so the fetch and the parse are decoupled.
  */
object Landing {
  def newDir(prefix: String = "graft-landing"): Path =
    Files.createTempDirectory(prefix)

  def writeText(text: String, fileName: String, dir: Path = newDir()): String = {
    val p = dir.resolve(fileName)
    Files.write(p, text.getBytes(StandardCharsets.UTF_8))
    p.toString
  }
}

/** S1 (HTTP CSV) + S6 (bulk CSV scan — the COPY role) + P5 (header skip).
  * The schema is always explicit; `header=true` replaces the reference's
  * `lines[1:]` slice.
  */
object CsvSource {
  /** `mode`: PERMISSIVE (default — malformed fields null out), DROPMALFORMED
    * (skip bad rows), or FAILFAST (abort the job on the first bad row —
    * use for sources where silent data loss is worse than a failed run).
    */
  def read(spark: SparkSession, path: String, schema: StructType,
           header: Boolean = true, mode: String = "PERMISSIVE"): DataFrame =
    spark.read.option("header", header.toString).option("mode", mode)
      .schema(schema).csv(path)

  def fromText(spark: SparkSession, csvText: String, schema: StructType,
               header: Boolean = true, mode: String = "PERMISSIVE"): DataFrame =
    read(spark, Landing.writeText(csvText, "payload.csv"), schema, header, mode)

  def fromUrl(spark: SparkSession, url: String, schema: StructType,
              fetcher: Fetcher = HttpFetcher, header: Boolean = true): DataFrame =
    fromText(spark, fetcher.fetch(url), schema, header)
}

/** S2: REST JSON fetch → explicit-schema JSON read (UpdateCountry.py:27-35,
  * Weather_to_Redshift.py:30-32). Nested fields come out as StructType and
  * are selected with dotted paths (P2).
  */
object JsonSource {
  def read(spark: SparkSession, path: String, schema: StructType,
           mode: String = "PERMISSIVE"): DataFrame =
    spark.read.option("mode", mode).schema(schema).json(path)

  def fromText(spark: SparkSession, jsonText: String, schema: StructType,
               mode: String = "PERMISSIVE"): DataFrame =
    read(spark, Landing.writeText(jsonText, "payload.json"), schema, mode)

  def fromUrl(spark: SparkSession, url: String, schema: StructType,
              fetcher: Fetcher = HttpFetcher): DataFrame =
    fromText(spark, fetcher.fetch(url), schema)
}

/** Many-URL ingestion: the scale path the reference never needed — URLs
  * distributed across the cluster, fetched per-partition, parsed with
  * from_json/csv expressions. (SURVEY §2.1 S1 "at scale".)
  */
object HttpSource {
  def parallel(spark: SparkSession, urls: Seq[String],
               fetcher: Fetcher = HttpFetcher): DataFrame = {
    import spark.implicits._
    val f = fetcher // avoid closing over the outer object
    urls.toDF("url").repartition(math.min(urls.size, 64))
      .mapPartitions(_.map(r => (r.getString(0), f.fetch(r.getString(0)))))
      .toDF("url", "body")
  }
}

/** S4: JDBC table scan, full or incremental. The run-date predicate is a
  * DataFrame filter that Catalyst pushes down into the remote query
  * (MySQL_to_Redshift_v2.py:36's `WHERE DATE(created_at) = '{{ ds }}'`),
  * so the database ships only the run's slice — never string templating.
  */
object JdbcSource {
  def full(spark: SparkSession, url: String, table: String,
           props: java.util.Properties = new java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  def incremental(spark: SparkSession, url: String, table: String,
                  dateCol: String, runDate: LocalDate,
                  props: java.util.Properties = new java.util.Properties): DataFrame = {
    // half-open range, not to_date(col) = d: plain column comparisons push
    // into the remote WHERE clause (JDBC V1 can't push function filters, so
    // the DATE() form would pull the whole table and filter locally)
    val start = java.sql.Timestamp.valueOf(runDate.atStartOfDay)
    val end = java.sql.Timestamp.valueOf(runDate.plusDays(1).atStartOfDay)
    full(spark, url, table, props)
      .filter(col(dateCol) >= lit(start) && col(dateCol) < lit(end))
  }
}

/** S5: sheet-shaped ingestion — a header row + string cells
  * (plugins/gsheet.py:42-99). Values arrive as driver-side lists (that is
  * what a sheets API returns); everything after the parallelize is columnar.
  * Cleaning ($/, strip, %→fraction) is applied by the caller with
  * graft.functions.Cleaning — native expressions, not the reference's
  * per-cell Python loops.
  */
object SheetSource {
  def toDf(spark: SparkSession, values: Seq[Seq[String]]): DataFrame = {
    require(values.nonEmpty, "sheet must have a header row")
    val header = values.head
    val rows = values.tail.map(r => org.apache.spark.sql.Row.fromSeq(
      r.padTo(header.size, "").take(header.size)))
    val schema = StructType(header.map(c =>
      org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, math.max(1, rows.size / 10000)), schema)
  }
}

/** S3: market-data API adapter (UpdateSymbol.py:25-35's
  * `yf.Ticker(symbol).history()`). The API is a trait so the engine is
  * testable offline; bars become a typed Dataset immediately.
  */
final case class StockBar(symbol: String, date: java.sql.Date, open: Double,
                          high: Double, low: Double, close: Double, volume: Long)

trait StockApi { def history(symbol: String): Seq[StockBar] }

/** Deterministic fixture bars (seeded by symbol) — the offline stand-in. */
final class FixtureStockApi(days: Int = 30) extends StockApi {
  def history(symbol: String): Seq[StockBar] = {
    val rnd = new scala.util.Random(symbol.hashCode.toLong)
    val start = LocalDate.of(2024, 1, 1)
    var price = 50.0 + rnd.nextDouble() * 100
    (0 until days).map { i =>
      val open = price
      val close = open * (0.98 + rnd.nextDouble() * 0.04)
      val high = math.max(open, close) * (1 + rnd.nextDouble() * 0.01)
      val low = math.min(open, close) * (1 - rnd.nextDouble() * 0.01)
      price = close
      StockBar(symbol, java.sql.Date.valueOf(start.plusDays(i)),
        math.rint(open * 100) / 100, math.rint(high * 100) / 100,
        math.rint(low * 100) / 100, math.rint(close * 100) / 100,
        1000000 + rnd.nextInt(9000000))
    }
  }
}

object StockSource {
  def bars(spark: SparkSession, api: StockApi, symbols: Seq[String]): DataFrame = {
    import spark.implicits._
    symbols.flatMap(api.history).toDF()
  }
}

/** K6: export sink — the reference's "query result → sheet" writer
  * (plugins/gsheet.py:102-140, SQL_to_Sheet.py:26-35): blank out NULLs
  * (F12's fillna('')), write one CSV file per export. Only for
  * sheet-sized results; anything larger goes out as a parallel write.
  */
object Export {
  def toCsvDir(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.na.fill("").coalesce(1).write
      .option("header", header.toString).mode("overwrite").csv(path)
}

package graft.sources

import graft.SparkSpec
import graft.functions.Cleaning
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1–S7 ingestion surface against hermetic fixtures — no network. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val ngSchema = StructType(Seq(
    StructField("name", StringType), StructField("gender", StringType)))

  test("CsvSource reads header CSV with an explicit schema (S1/P5)") {
    val csv = "name,gender\nAlice,F\nBob,M\n"
    val df = CsvSource.fromText(spark, csv, ngSchema)
    assert(df.as[(String, String)].collect().toSet === Set(("Alice", "F"), ("Bob", "M")))
    assert(df.schema === ngSchema)
  }

  test("CsvSource.fromUrl goes through the Fetcher (hermetic)") {
    val fetcher: Fetcher = url => { assert(url == "http://x/names.csv"); "name,gender\nEve,F\n" }
    val df = CsvSource.fromUrl(spark, "http://x/names.csv", ngSchema, fetcher)
    assert(df.as[(String, String)].collect().toSeq === Seq(("Eve", "F")))
  }

  test("JsonSource reads nested JSON with dotted-path extraction (S2/P2/F10)") {
    val json = """{"name":{"official":"Republic of Korea"},"population":51780579,"area":100210.0}"""
    val schema = StructType(Seq(
      StructField("name", StructType(Seq(StructField("official", StringType)))),
      StructField("population", LongType),
      StructField("area", DoubleType)))
    val df = JsonSource.fromText(spark, json, schema)
      .select(col("name.official").as("official"), col("population"), col("area"))
    assert(df.as[(String, Long, Double)].collect().toSeq ===
      Seq(("Republic of Korea", 51780579L, 100210.0)))
  }

  test("SheetSource: header row becomes schema; cleaning handles $, and % (S5/F11)") {
    val sheet = Seq(
      Seq("item", "amount", "pct"),
      Seq("a", "$1,234.50", "50%"),
      Seq("b", "10", "5%"))
    val df = SheetSource.toDf(spark, sheet)
      .select(col("item"),
        Cleaning.stripDollarComma(col("amount")).as("amount"),
        Cleaning.percentToFraction(col("pct")).as("pct"))
    assert(df.as[(String, Double, Double)].collect().toSet ===
      Set(("a", 1234.5, 0.5), ("b", 10.0, 0.05)))
  }

  test("SheetSource pads ragged rows to the header width") {
    val df = SheetSource.toDf(spark, Seq(Seq("a", "b", "c"), Seq("1", "2")))
    assert(df.collect().head.toSeq === Seq("1", "2", ""))
  }

  test("FixtureStockApi is deterministic per symbol; bars become a DataFrame (S3)") {
    val api = new FixtureStockApi(days = 5)
    assert(api.history("TEST") === api.history("TEST"))
    assert(api.history("TEST") !== api.history("OTHER"))
    val df = StockSource.bars(spark, api, Seq("AAA", "BBB"))
    assert(df.count() === 10)
    assert(df.columns.toSeq === Seq("symbol", "date", "open", "high", "low", "close", "volume"))
    // OHLC sanity: low <= open/close <= high
    assert(df.filter(col("low") > col("open") || col("low") > col("close") ||
      col("high") < col("open") || col("high") < col("close")).count() === 0)
  }

  test("JdbcSource.incremental pushes the run-date filter (S4/P4)") {
    val db = java.nio.file.Files.createTempDirectory("graft-derby-spec").resolve("db")
    val url = s"jdbc:derby:$db;create=true"
    Seq(("2026-01-01 10:00:00", 1), ("2026-01-02 11:00:00", 2), ("2026-01-02 12:00:00", 3))
      .toDF("created_at", "id")
      .withColumn("created_at", to_timestamp(col("created_at")))
      .write.mode("overwrite").jdbc(url, "t", new java.util.Properties)
    val got = JdbcSource.incremental(spark, url, "t", "created_at",
        java.time.LocalDate.of(2026, 1, 2))
      .select("id").as[Int].collect().toSet
    assert(got === Set(2, 3))
  }

  test("JSON malformed-row modes: DROPMALFORMED skips, FAILFAST aborts") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("n", IntegerType)))
    // middle line is not valid JSON (CSV's parser pads/truncates tokens, so
    // mode semantics are demonstrated on the JSON reader where a broken
    // record is unambiguous)
    val bad = """{"name":"ok","n":1}
                |{"name": BROKEN
                |{"name":"ok2","n":2}""".stripMargin
    val dropped = JsonSource.fromText(spark, bad, schema, mode = "DROPMALFORMED")
    assert(dropped.count() === 2)
    val failing = JsonSource.fromText(spark, bad, schema, mode = "FAILFAST")
    intercept[org.apache.spark.SparkException] { failing.collect() }
  }

  test("HttpSource.parallel ships the fetcher to executors (Fetcher is Serializable)") {
    // a SAM-lambda fetcher rides the mapPartitions closure; this fails with
    // Task not serializable if Fetcher ever stops extending Serializable
    val fetcher: Fetcher = url => s"body-of:$url"
    val urls = (1 to 20).map(i => s"http://x/page$i")
    val out = HttpSource.parallel(spark, urls, fetcher)
      .as[(String, String)].collect().toMap
    assert(out.size === 20)
    assert(out("http://x/page7") === "body-of:http://x/page7")
  }

  test("Export.toCsvDir writes one header CSV with NULLs blanked (K6/F12)") {
    val out = java.nio.file.Files.createTempDirectory("graft-export").toString
    Export.toCsvDir(Seq(("a", Some("x")), ("b", None)).toDF("k", "v"), out)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.length === 1)
    val lines = scala.io.Source.fromFile(files.head).getLines().toList
    assert(lines.head === "k,v")
    assert(lines.toSet === Set("k,v", "a,x", "b,\"\"") || lines.toSet === Set("k,v", "a,x", "b,"))
  }
}

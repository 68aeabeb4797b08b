package graft.sources

import graft.core.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Declared queries that exercise the ingestion surface end-to-end with a
  * DuckDB oracle: each writes driver-table data out through a sink format,
  * reads it back through the engine's source reader, and must reproduce the
  * oracle computed straight from the parquet. Staging is a per-run temp dir
  * (the landing-zone convention, S7).
  */
object SourceQueries {

  private val nationSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val queries: Seq[Q] = Seq(

    // S1/S6/P5/F9/K6 — CSV roundtrip: nation → header CSV in the landing
    // zone → explicit-schema distributed CSV scan (header skip replaces the
    // reference's lines[1:]).
    Q("q19_csv_roundtrip",
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey") { (s, d) =>
      val landing = Landing.newDir("graft-q19").toString
      Export.toCsvDir(Tables.nation(s, d), landing)
      CsvSource.read(s, landing, nationSchema)
        .orderBy("n_nationkey")
    },

    // S2/F10/P2 — JSON roundtrip with nested structure: nation → one JSON
    // object per line ({"name":{"official":…},"key":…,"region":…}) → explicit
    // nested-schema read → dotted-path field extraction
    // (UpdateCountry.py:43-48's d["name"]["official"] shape).
    Q("q28_json_roundtrip",
      """SELECT n_name AS official, n_nationkey AS key, n_regionkey AS region
        |FROM nation ORDER BY key""".stripMargin) { (s, d) =>
      val landing = Landing.newDir("graft-q28").toString
      Tables.nation(s, d)
        .select(to_json(struct(
          struct(col("n_name").as("official")).as("name"),
          col("n_nationkey").as("key"),
          col("n_regionkey").as("region"))).as("value"))
        .coalesce(1).write.mode("overwrite").text(landing)
      val schema = StructType(Seq(
        StructField("name", StructType(Seq(StructField("official", StringType)))),
        StructField("key", IntegerType),
        StructField("region", IntegerType)))
      JsonSource.read(s, landing, schema)
        .select(col("name.official").as("official"), col("key"), col("region"))
        .orderBy("key")
    },

    // S5/F11 — sheet-shaped ingestion + cleaning: a synthetic sheet (header
    // row + string cells with $/,-polluted numerics and percent strings) goes
    // through SheetSource and the native cleaning expressions; the oracle
    // generates the identical data relationally.
    Q("q29_sheet_clean",
      """SELECT 'name_' || CAST(i AS VARCHAR) AS item,
        | CAST(i * 1000 + 500 AS DOUBLE) AS amount,
        | CAST(i AS DOUBLE) / 100 AS frac
        |FROM range(100) t(i) ORDER BY item""".stripMargin) { (s, _) =>
      val sheet = Seq(Seq("item", "amount", "pct")) ++
        (0 until 100).map(i => Seq(s"name_$i", s"$$$i,500", s"$i%"))
      SheetSource.toDf(s, sheet)
        .select(col("item"),
          graft.functions.Cleaning.stripDollarComma(col("amount")).as("amount"),
          graft.functions.Cleaning.percentToFraction(col("pct")).as("frac"))
        .orderBy("item")
    },

    // S4/K4 — JDBC roundtrip through embedded Derby: nation is bulk-written
    // to a real database table, read back via spark.read.jdbc with a filter
    // that Catalyst pushes into the remote query (check PushedFilters in the
    // scan node), and must match the oracle over parquet.
    Q("q41_jdbc_roundtrip",
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |WHERE n_regionkey = 2 ORDER BY n_nationkey""".stripMargin) { (s, d) =>
      val db = Files.createTempDirectory("graft-derby").resolve("db").toString
      val url = s"jdbc:derby:$db;create=true"
      Tables.nation(s, d).write.mode("overwrite").jdbc(url, "nation", new java.util.Properties)
      JdbcSource.full(s, url, "nation")
        .filter(col("n_regionkey") === 2)
        .orderBy("n_nationkey")
    },

    // K6/F12/S8 — export sink roundtrip: a summary query result exported as a
    // single header CSV (the SQL_to_Sheet.py:26-35 flow, NULLs blanked), read
    // back and compared to the summary computed directly.
    Q("q42_export_roundtrip",
      """SELECT strftime(ts, '%Y-%m') AS month, count(DISTINCT user_id) AS mau
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val out = Landing.newDir("graft-q42").toString
      val mau = Tables.events(s, d)
        .groupBy(date_format(col("ts"), "yyyy-MM").as("month"))
        .agg(countDistinct("user_id").as("mau"))
      Export.toCsvDir(mau, out)
      CsvSource.read(s, out, StructType(Seq(
        StructField("month", StringType), StructField("mau", LongType))))
        .orderBy("month")
    },

    // ORC roundtrip — the second columnar warehouse format (Spark's ORC
    // source is built in): a lineitem projection written as ORC, read back
    // through the ORC scan, aggregated; must equal the oracle computed
    // straight from the parquet. Predicate/column pushdown works on ORC as
    // on parquet, so a warehouse standardized on ORC keeps every plan shape
    // this engine asserts.
    Q("q95_orc_roundtrip",
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty, count(1) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val dir = s"${graft.core.Scratch.dir("graft-q95")}/orc"
      Tables.lineitem(s, d).select("l_returnflag", "l_quantity")
        .write.mode("overwrite").orc(dir)
      s.read.orc(dir)
        .groupBy("l_returnflag")
        // round like q01: double summation order differs across engines
        .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    },

    // WARC crawl-container scan (r17 verdict "what's missing" #4): the
    // corpus re-containered as REAL multi-member .warc.gz files — one
    // gzip member per WARC/1.0 response record, 4 files — read back
    // through [[Warc.readWarc]]'s two-phase splittable scan (member-offset
    // index, then range-pruned scan-local gunzip; the exchange-schema law
    // that only (path, off, len) ever shuffles is WarcSpec territory) and
    // fed to the existing [[graft.scale.Curation.extractText]] front end.
    // The oracle recomputes every record field straight from the
    // documents table, so a member boundary, header parse, or body-offset
    // error anywhere lands wrong rows and hash-fails. The fixture WRITE is
    // distributed too (one file per partition, FixtureCache-materialized).
    Q("q305_warc_scan",
      """WITH recs AS (
        |  SELECT 'https://site' || (doc_id % 10) || '.com/page/' || doc_id AS url,
        |         '2026-08-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
        |           || 'T00:00:00Z' AS fetch_ts,
        |         'text/html' AS content_type, text
        |  FROM documents),
        | cleaned AS (
        |  SELECT url, fetch_ts, content_type,
        |         trim(regexp_replace(text, '[ \t\r\f]+', ' ', 'g')) AS t
        |  FROM recs)
        |SELECT url, fetch_ts, content_type,
        |  CASE WHEN t <> '' AND len(string_split(t, ' ')) >= 3 THEN t ELSE '' END AS text
        |FROM cleaned ORDER BY url""".stripMargin) { (s, d) =>
      import s.implicits._
      val feed = graft.core.FixtureCache.dir(s"q305-warc@$d") { p =>
        Tables.documents(s, d).select(col("doc_id"), col("text"))
          .repartition(4, pmod(col("doc_id"), lit(4)))
          .sortWithinPartitions("doc_id")
          .as[(Long, String)]
          .mapPartitions { it =>
            val rows = it.toVector
            if (rows.isEmpty) Iterator.empty
            else {
              val part = org.apache.spark.TaskContext.getPartitionId()
              val recs = rows.map { case (id, text) =>
                Warc.Rec(s"https://site${id % 10}.com/page/$id",
                  f"2026-08-${id % 28 + 1}%02dT00:00:00Z",
                  "text/html", s"<p>$text</p>")
              }
              // temp + ATOMIC_MOVE per task attempt: a retried/speculative
              // duplicate attempt can write this path concurrently, and a
              // torn plain write would be served to every later rep by the
              // per-JVM fixture cache (r18 ADVICE)
              val fin = java.nio.file.Paths.get(s"$p/part-$part.warc.gz")
              val tmp = java.nio.file.Files.createTempFile(
                java.nio.file.Paths.get(p), s"part-$part", ".tmp")
              java.nio.file.Files.write(tmp, Warc.warcFileBytes(recs))
              java.nio.file.Files.move(tmp, fin,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE,
                java.nio.file.StandardCopyOption.REPLACE_EXISTING)
              Iterator.single(1)
            }
          }.collect()
        ()
      }
      graft.scale.Curation.extractText(Warc.readWarc(s, feed), "text")
        .select("url", "fetch_ts", "content_type", "text")
        .orderBy("url")
    },

    // WARC CDX-sidecar rescan (r18 verdict task 3): the same container
    // shape as q305, but (a) every doc_id % 7 = 0 body legitimately ENDS
    // with CRLFCRLF — the bytes the old suffix-scanning parse truncated
    // (r18 ADVICE medium); Content-Length slicing must preserve them or
    // the summed body lengths hash-fail — and (b) the query itself
    // certifies the sidecar lifecycle: the member indexes are built once
    // (persisting <archive>.cdx next to each file), and the served scan
    // must then resolve every member range FROM the sidecars — a re-skim
    // trips the fail-loud require below.
    Q("q307_warc_cdx_rescan",
      """WITH recs AS (
        |  SELECT 'site' || (doc_id % 10) || '.com' AS site,
        |         '<p>' || text || '</p>' ||
        |           CASE WHEN doc_id % 7 = 0
        |                THEN chr(13) || chr(10) || chr(13) || chr(10)
        |                ELSE '' END AS body
        |  FROM documents)
        |SELECT site, CAST(count(1) AS BIGINT) AS n_pages,
        |       CAST(sum(length(body)) AS BIGINT) AS body_len
        |FROM recs GROUP BY site ORDER BY site""".stripMargin) { (s, d) =>
      import s.implicits._
      val feed = graft.core.FixtureCache.dir(s"q307-warc@$d") { p =>
        Tables.documents(s, d).select(col("doc_id"), col("text"))
          .repartition(4, pmod(col("doc_id"), lit(4)))
          .sortWithinPartitions("doc_id")
          .as[(Long, String)]
          .mapPartitions { it =>
            val rows = it.toVector
            if (rows.isEmpty) Iterator.empty
            else {
              val part = org.apache.spark.TaskContext.getPartitionId()
              val recs = rows.map { case (id, text) =>
                val tail = if (id % 7 == 0) "\r\n\r\n" else ""
                Warc.Rec(s"https://site${id % 10}.com/page/$id",
                  f"2026-08-${id % 28 + 1}%02dT00:00:00Z",
                  "text/html", s"<p>$text</p>$tail")
              }
              val fin = java.nio.file.Paths.get(s"$p/part-$part.warc.gz")
              val tmp = java.nio.file.Files.createTempFile(
                java.nio.file.Paths.get(p), s"part-$part", ".tmp")
              java.nio.file.Files.write(tmp, Warc.warcFileBytes(recs))
              java.nio.file.Files.move(tmp, fin,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE,
                java.nio.file.StandardCopyOption.REPLACE_EXISTING)
              Iterator.single(1)
            }
          }.collect()
        ()
      }
      // pass 1: ensure every archive's CDX sidecar exists (skims at most
      // once per file per JVM; later executions find them on disk)
      val fs = java.nio.file.Files.list(java.nio.file.Paths.get(feed))
      try {
        import scala.jdk.CollectionConverters._
        fs.iterator().asScala.map(_.toString)
          .filter(_.endsWith(".warc.gz")).foreach(Warc.memberIndexFor(_))
      } finally fs.close()
      // pass 2 (the served scan): must resolve member ranges from the
      // sidecars — the skim counter pins it, fail-loud
      val skims0 = Warc.skims.get
      val out = Warc.readWarc(s, feed)
        .groupBy(regexp_extract(col("url"), "https://(site[0-9]+\\.com)/", 1)
          .as("site"))
        .agg(count(lit(1)).as("n_pages"),
          sum(length(col("text"))).as("body_len"))
        .orderBy("site")
        .localCheckpoint()
      require(Warc.skims.get == skims0,
        "q307 re-scan must serve the member index from CDX sidecars, not re-skim")
      out
    },
  )
}

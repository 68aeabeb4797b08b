package graft.scale

import graft.core.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass declarative data-quality profiler (Deequ-style) for ingest
  * gates on corpus tables.
  *
  * Every requested metric — per-column null fractions, distinct counts,
  * numeric min/max/mean, byte-length stats for strings, regex-conformance
  * fractions, plus boolean expectation checks (uniqueness, completeness,
  * range) — is computed in a SINGLE aggregation over the table, then
  * reshaped to long (col_name, metric, value) rows by a constant-width
  * projection. At 100 TB that single pass is the entire cost: one scan, one
  * map-side-combined aggregate to a 1-row result; there is no per-metric
  * re-scan, which is exactly the failure mode of naive "run one query per
  * check" validation suites (the reference runs one Redshift round-trip per
  * gate, plugins/redshift_summary.py input-check loop).
  *
  * Exact `count(distinct …)` on d columns makes Spark expand the scan d+1×
  * before the aggregate — acceptable for gate columns (ids, enums), wrong
  * for the general case at scale, so `approxDistinct = true` swaps in
  * HLL++ `approx_count_distinct` (the certified-register variant lives in
  * [[Sketches]]). String lengths are OCTET lengths: byte semantics agree
  * bit-for-bit across engines, unlike char counting (UTF-16 units vs code
  * points for astral-plane text).
  */
object Profiler {

  final case class ProfileSpec(
      numericCols: Seq[String] = Nil,
      stringCols: Seq[String] = Nil,
      distinctCols: Seq[String] = Nil,
      patterns: Map[String, String] = Map.empty, // col -> regex, conformance frac
      uniqueKeys: Seq[String] = Nil,             // check: distinct == rows
      requiredCols: Seq[String] = Nil,           // check: no nulls
      approxDistinct: Boolean = false)

  def profile(df: DataFrame, spec: ProfileSpec): DataFrame = {
    val allCols = (spec.numericCols ++ spec.stringCols).distinct
    def cd(c: String): Column =
      if (spec.approxDistinct) approx_count_distinct(c) else countDistinct(col(c))
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n")) ++
      allCols.map(c => count(col(c)).as(s"nn__$c")) ++
      spec.distinctCols.map(c => cd(c).as(s"dc__$c")) ++
      spec.numericCols.flatMap(c => Seq(
        min(col(c)).cast("double").as(s"min__$c"),
        max(col(c)).cast("double").as(s"max__$c"),
        round(avg(col(c)), 4).as(s"avg__$c"))) ++
      spec.stringCols.flatMap(c => Seq(
        min(octet_length(col(c))).cast("double").as(s"minb__$c"),
        max(octet_length(col(c))).cast("double").as(s"maxb__$c"),
        round(avg(octet_length(col(c))), 4).as(s"avgb__$c"))) ++
      spec.patterns.toSeq.map { case (c, re) =>
        round(avg(when(col(c).rlike(re), 1.0).otherwise(0.0)), 6).as(s"pat__$c")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val n = col("n").cast("double")
    def m(colName: String, metric: String, v: Column): Column =
      struct(lit(colName).as("col_name"), lit(metric).as("metric"),
        v.cast("double").as("value"))
    val rows: Seq[Column] =
      Seq(m("*", "row_count", n)) ++
      allCols.map(c => m(c, "null_frac", round(lit(1.0) - col(s"nn__$c") / n, 6))) ++
      spec.distinctCols.map(c => m(c, "distinct_count", col(s"dc__$c"))) ++
      spec.numericCols.flatMap(c => Seq(
        m(c, "min", col(s"min__$c")), m(c, "max", col(s"max__$c")),
        m(c, "mean", col(s"avg__$c")))) ++
      spec.stringCols.flatMap(c => Seq(
        m(c, "min_bytes", col(s"minb__$c")), m(c, "max_bytes", col(s"maxb__$c")),
        m(c, "avg_bytes", col(s"avgb__$c")))) ++
      spec.patterns.keys.toSeq.map(c => m(c, "pattern_frac", col(s"pat__$c"))) ++
      spec.uniqueKeys.map(c =>
        m(c, "check_unique", when(col(s"dc__$c") === col("n"), 1.0).otherwise(0.0))) ++
      spec.requiredCols.map(c =>
        m(c, "check_complete", when(col(s"nn__$c") === col("n"), 1.0).otherwise(0.0)))
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.col_name"), col("r.metric"), col("r.value"))
  }

  private val docSpec = ProfileSpec(
    numericCols = Seq("doc_id", "n_chars"),
    stringCols = Seq("text", "lang", "source"),
    distinctCols = Seq("doc_id", "lang", "source"),
    patterns = Map("lang" -> "^[a-z]{2}$"),
    uniqueKeys = Seq("doc_id"),
    requiredCols = Seq("text", "lang"))

  val queries: Seq[Q] = Seq(
    Q("q159_profile",
      """WITH a AS (SELECT count(1) AS n,
        |  count(doc_id) AS nn_doc_id, count(n_chars) AS nn_n_chars,
        |  count(text) AS nn_text, count(lang) AS nn_lang, count(source) AS nn_source,
        |  count(DISTINCT doc_id) AS dc_doc_id, count(DISTINCT lang) AS dc_lang,
        |  count(DISTINCT source) AS dc_source,
        |  CAST(min(doc_id) AS DOUBLE) AS min_doc_id, CAST(max(doc_id) AS DOUBLE) AS max_doc_id,
        |  round(avg(doc_id), 4) AS avg_doc_id,
        |  CAST(min(n_chars) AS DOUBLE) AS min_n_chars, CAST(max(n_chars) AS DOUBLE) AS max_n_chars,
        |  round(avg(n_chars), 4) AS avg_n_chars,
        |  CAST(min(strlen(text)) AS DOUBLE) AS minb_text, CAST(max(strlen(text)) AS DOUBLE) AS maxb_text,
        |  round(avg(strlen(text)), 4) AS avgb_text,
        |  CAST(min(strlen(lang)) AS DOUBLE) AS minb_lang, CAST(max(strlen(lang)) AS DOUBLE) AS maxb_lang,
        |  round(avg(strlen(lang)), 4) AS avgb_lang,
        |  CAST(min(strlen(source)) AS DOUBLE) AS minb_source, CAST(max(strlen(source)) AS DOUBLE) AS maxb_source,
        |  round(avg(strlen(source)), 4) AS avgb_source,
        |  round(avg(CASE WHEN regexp_matches(lang, '^[a-z]{2}$') THEN 1.0 ELSE 0.0 END), 6) AS pat_lang
        |  FROM documents)
        |SELECT col_name, metric, value FROM (
        |  SELECT '*' AS col_name, 'row_count' AS metric, CAST(n AS DOUBLE) AS value FROM a
        |  UNION ALL SELECT 'doc_id', 'null_frac', round(1.0 - nn_doc_id / CAST(n AS DOUBLE), 6) FROM a
        |  UNION ALL SELECT 'n_chars', 'null_frac', round(1.0 - nn_n_chars / CAST(n AS DOUBLE), 6) FROM a
        |  UNION ALL SELECT 'text', 'null_frac', round(1.0 - nn_text / CAST(n AS DOUBLE), 6) FROM a
        |  UNION ALL SELECT 'lang', 'null_frac', round(1.0 - nn_lang / CAST(n AS DOUBLE), 6) FROM a
        |  UNION ALL SELECT 'source', 'null_frac', round(1.0 - nn_source / CAST(n AS DOUBLE), 6) FROM a
        |  UNION ALL SELECT 'doc_id', 'distinct_count', CAST(dc_doc_id AS DOUBLE) FROM a
        |  UNION ALL SELECT 'lang', 'distinct_count', CAST(dc_lang AS DOUBLE) FROM a
        |  UNION ALL SELECT 'source', 'distinct_count', CAST(dc_source AS DOUBLE) FROM a
        |  UNION ALL SELECT 'doc_id', 'min', min_doc_id FROM a
        |  UNION ALL SELECT 'doc_id', 'max', max_doc_id FROM a
        |  UNION ALL SELECT 'doc_id', 'mean', avg_doc_id FROM a
        |  UNION ALL SELECT 'n_chars', 'min', min_n_chars FROM a
        |  UNION ALL SELECT 'n_chars', 'max', max_n_chars FROM a
        |  UNION ALL SELECT 'n_chars', 'mean', avg_n_chars FROM a
        |  UNION ALL SELECT 'text', 'min_bytes', minb_text FROM a
        |  UNION ALL SELECT 'text', 'max_bytes', maxb_text FROM a
        |  UNION ALL SELECT 'text', 'avg_bytes', avgb_text FROM a
        |  UNION ALL SELECT 'lang', 'min_bytes', minb_lang FROM a
        |  UNION ALL SELECT 'lang', 'max_bytes', maxb_lang FROM a
        |  UNION ALL SELECT 'lang', 'avg_bytes', avgb_lang FROM a
        |  UNION ALL SELECT 'source', 'min_bytes', minb_source FROM a
        |  UNION ALL SELECT 'source', 'max_bytes', maxb_source FROM a
        |  UNION ALL SELECT 'source', 'avg_bytes', avgb_source FROM a
        |  UNION ALL SELECT 'lang', 'pattern_frac', pat_lang FROM a
        |  UNION ALL SELECT 'doc_id', 'check_unique', CASE WHEN dc_doc_id = n THEN 1.0 ELSE 0.0 END FROM a
        |  UNION ALL SELECT 'text', 'check_complete', CASE WHEN nn_text = n THEN 1.0 ELSE 0.0 END FROM a
        |  UNION ALL SELECT 'lang', 'check_complete', CASE WHEN nn_lang = n THEN 1.0 ELSE 0.0 END FROM a
        |) ORDER BY col_name, metric""".stripMargin) { (s, d) =>
      profile(Tables.documents(s, d), docSpec).orderBy("col_name", "metric")
    },

    // Integer PMI association between two categorical columns — "which
    // (lang, source) pairings are over/under-represented" — via the same
    // floor-log2 bit idiom as the surprisal scorers: pmi_bits =
    // bitlen(n_xy·N) − bitlen(n_x·n_y) ≈ log2(p_xy/(p_x·p_y)), exact
    // integers end to end. Three map-side-combined count aggregates plus
    // two broadcast-sized marginal joins; the cell table is |X|·|Y|-bounded.
    Q("q180_pmi",
      """WITH n AS (SELECT count(*) AS n FROM documents),
        | mx AS (SELECT lang, count(*) AS n_x FROM documents GROUP BY 1),
        | my AS (SELECT source, count(*) AS n_y FROM documents GROUP BY 1),
        | cell AS (SELECT lang, source, count(*) AS n_xy
        |          FROM documents GROUP BY 1, 2)
        |SELECT c.lang, c.source, c.n_xy, mx.n_x, my.n_y,
        |  CAST(length(bin(c.n_xy * n.n)) AS BIGINT)
        |    - CAST(length(bin(mx.n_x * my.n_y)) AS BIGINT) AS pmi_bits
        |FROM cell c JOIN mx ON c.lang = mx.lang
        |            JOIN my ON c.source = my.source CROSS JOIN n
        |ORDER BY c.lang, c.source""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val n = docs.select(count(lit(1)).as("n"))
      val mx = docs.groupBy("lang").agg(count(lit(1)).as("n_x"))
      val my = docs.groupBy("source").agg(count(lit(1)).as("n_y"))
      docs.groupBy("lang", "source").agg(count(lit(1)).as("n_xy"))
        .join(broadcast(mx), "lang")
        .join(broadcast(my), "source")
        .crossJoin(broadcast(n))
        .select(col("lang"), col("source"), col("n_xy"), col("n_x"), col("n_y"),
          (length(bin(col("n_xy") * col("n"))).cast("long") -
            length(bin(col("n_x") * col("n_y"))).cast("long")).as("pmi_bits"))
        .orderBy("lang", "source")
    },
  )
}

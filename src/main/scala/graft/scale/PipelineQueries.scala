package graft.scale

import graft.core.{Q, Tables}
import org.apache.spark.sql.functions._

/** Composed training-data queries: the full cleaning pipeline a pretraining
  * corpus goes through, expressed as one lazy plan (quality gate → language
  * gate → exact dedup → near-dup removal → stats).
  */
object PipelineQueries {

  /** The canonical pretraining-corpus cleaning pipeline over documents:
    *   1. quality floor (length + token heuristics)
    *   2. language filter (keep confidently-identified docs)
    *   3. exact dedup (keep lowest doc_id per content hash)
    *   4. MinHash-LSH near-dup removal — TRANSITIVE: verified pairs are
    *      grouped by connected components and only each cluster's
    *      representative survives (per-pair doc_b drops are order-dependent:
    *      an a~b~c chain could leave both a and b alive when a~c was never
    *      emitted).
    * Materialization is at the widest reuse point: everything downstream
    * (signatures, both jaccard sides, the anti-join) re-reads the deduped
    * relation, and the quality/langid chain above it is the expensive part —
    * run it once. localCheckpoint, not cache, so the blocks are GC-freed
    * after the query instead of staying pinned for the rest of the session.
    */
  def cleanCorpus(docs: org.apache.spark.sql.DataFrame,
                  nearDupThreshold: Double = 0.8): org.apache.spark.sql.DataFrame = {
    val quality = docs
      .filter(length(col("text")) >= 100)
      .filter(Text.tokenCount(col("text")) >= 20)
      .filter(Text.qualityScoreNative(col("text")) >= 0.5)
    val withLang = quality
      .withColumn("lang_pred", Text.langIdNative(col("text")))
      .filter(col("lang_pred") =!= "und")
    val keepers = Dedup.exact(withLang).select(col("keep_id").as("doc_id"))
    val exactDeduped = withLang.join(keepers, "doc_id").localCheckpoint()
    val sigs = Dedup.minhashSignatures(exactDeduped).localCheckpoint()
    val pairs = Dedup.jaccardVerify(exactDeduped,
      Dedup.minhashCandidates(sigs), threshold = nearDupThreshold)
    Cluster.dropNearDups(exactDeduped, pairs)
  }

  val queries: Seq[Q] = Seq(

    // The deterministic core of the cleaning pipeline (quality floor →
    // language gate → exact dedup → survivor stats), fully value-oracled:
    // DuckDB recomputes the quality score, the langid vote, the md5 dedup
    // and the per-language stats end-to-end. The near-dup stage stays out of
    // this declaration because its ground truth is the O(n²) Jaccard the
    // engine must NOT compute — it is certified separately (pairs: q26;
    // transitive clusters: q69; full composition incl. cluster-based
    // removal: cleanCorpus + PipelinesSpec). avg-quality is emitted as an
    // exact integer micro-unit sum — a float avg's value depends on Spark vs
    // DuckDB accumulation order; integer sums don't. The aggregate itself is
    // wrapped in CAST(... AS BIGINT): DuckDB widens sum(BIGINT) to HUGEINT,
    // which the driver's type-sensitive compare rejects against Spark's long
    // even when the values are identical.
    Q("q61_clean_pipeline",
      s"""WITH q AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE length(text) >= 100
         |    AND len(string_split_regex(text, '\\s+')) >= 20
         |    AND ${Text.qualityScoreSql("text")} >= 0.5),
         |l AS (
         |  SELECT doc_id, text,
         |    CASE WHEN best[1] = '0' THEN 'und' ELSE best[2:] END AS lang_pred
         |  FROM (SELECT doc_id, text, ${Text.langIdBestSql("text")} AS best FROM q)),
         |lf AS (SELECT * FROM l WHERE lang_pred <> 'und'),
         |k AS (SELECT md5(text) AS h, min(doc_id) AS keep FROM lf GROUP BY 1),
         |surv AS (SELECT lf.* FROM lf JOIN k ON lf.doc_id = k.keep)
         |SELECT lang_pred, count(1) AS n_docs,
         | round(avg(length(text)), 2) AS avg_chars,
         | CAST(sum(CAST(round(${Text.qualityScoreSql("text")} * 1000000) AS BIGINT)) AS BIGINT) AS quality_micro_sum
         |FROM surv GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val quality = docs
        .filter(length(col("text")) >= 100)
        .filter(Text.tokenCount(col("text")) >= 20)
        .filter(Text.qualityScoreNative(col("text")) >= 0.5)
      val withLang = quality
        .withColumn("lang_pred", Text.langIdNative(col("text")))
        .filter(col("lang_pred") =!= "und")
      val keepers = Dedup.exact(withLang).select(col("keep_id").as("doc_id"))
      val surv = withLang.join(keepers, "doc_id")
      surv.groupBy("lang_pred")
        .agg(count(lit(1)).as("n_docs"),
          round(avg(length(col("text"))), 2).as("avg_chars"),
          sum(round(Text.qualityScoreNative(col("text")) * 1e6).cast("long"))
            .as("quality_micro_sum"))
        .orderBy("lang_pred")
    },

    // The full curation pipeline, end-to-end in ONE query with every stage
    // doing real work on planted dirt: nav-bar boilerplate (every 3rd doc),
    // PII (every 5th), benchmark contamination (every 17th), then
    //   boilerplate removal → PII scrub → 13-gram decontamination (drop) →
    //   temperature mix (alpha = 0.5 over lang) → 64/16 sliding chunks,
    // reduced to per-language doc/chunk/token counts. Every stage is
    // deterministic, so DuckDB replays the entire five-stage chain and the
    // compare is value-exact — the composition law q61/q80 establish,
    // extended across the whole curation surface.
    Q("q86_full_curation",
      s"""WITH base AS (SELECT doc_id, lang, trim(text) AS text FROM documents),
         | ev AS (SELECT doc_id, text FROM base WHERE doc_id % 50 = 0),
         | seeded AS (
         |  SELECT d.doc_id, d.lang,
         |    (CASE WHEN d.doc_id % 3 = 0
         |          THEN 'NAV: home | about | contact' || chr(10) ELSE '' END)
         |    || d.text
         |    || (CASE WHEN d.doc_id % 17 = 0 AND d.doc_id % 50 <> 0
         |             AND e.doc_id IS NOT NULL
         |             AND len(string_split_regex(e.text, '\\s+')) >= 13
         |        THEN ' [CONT] ' || e.text ELSE '' END)
         |    || (CASE WHEN d.doc_id % 5 = 0
         |        THEN ' contact user' || d.doc_id || '@example.com' ELSE '' END)
         |    AS text
         |  FROM base d LEFT JOIN ev e ON e.doc_id = d.doc_id - (d.doc_id % 50)),
         | corp AS (SELECT * FROM seeded WHERE doc_id % 50 <> 0),
         | p AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS para FROM corp),
         | hot AS (SELECT list(para) AS hp FROM (
         |   SELECT para FROM (
         |     SELECT para, count(DISTINCT doc_id) AS df FROM p GROUP BY 1)
         |   WHERE df >= 100)),
         | s1 AS (
         |  SELECT doc_id, lang,
         |    array_to_string(list_filter(string_split(text, chr(10)),
         |      x -> NOT coalesce(list_contains(hp, x), false)), chr(10)) AS text
         |  FROM corp CROSS JOIN hot),
         | s2 AS (
         |  SELECT doc_id, lang,
         |    regexp_replace(regexp_replace(text, '${Curation.EmailRe}', '[EMAIL]', 'g'),
         |                   '${Curation.PhoneRe}', '[PHONE]', 'g') AS text
         |  FROM s1),
         | shc AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(0, greatest(len(string_split_regex(text, '\\s+')) - 13, 0) + 1),
         |    i -> array_to_string(string_split_regex(text, '\\s+')[i+1:i+13], ' ')))) AS g
         |  FROM s2),
         | she AS (
         |  SELECT DISTINCT unnest(list_transform(
         |    range(0, greatest(len(string_split_regex(text, '\\s+')) - 13, 0) + 1),
         |    i -> array_to_string(string_split_regex(text, '\\s+')[i+1:i+13], ' '))) AS g
         |  FROM ev),
         | flagged AS (SELECT DISTINCT doc_id FROM shc JOIN she USING (g)),
         | s3 AS (SELECT * FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM flagged)),
         | c AS (SELECT lang, count(1) AS c FROM s3 GROUP BY 1),
         | m AS (SELECT min(c) AS cmin FROM c),
         | r AS (SELECT lang,
         |         CAST(floor(sqrt(CAST(cmin AS DOUBLE) / CAST(c AS DOUBLE)) *
         |                    1152921504606846976) AS BIGINT) AS thr
         |       FROM c CROSS JOIN m),
         | s4 AS (
         |  SELECT s3.* FROM s3 JOIN r USING (lang)
         |  WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
         |        < thr),
         | w AS (SELECT doc_id, lang,
         |         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
         |       FROM s4),
         | k AS (SELECT doc_id, lang, ws, unnest(range(0, greatest(len(ws), 1))) AS k
         |       FROM w),
         | ch AS (SELECT doc_id, lang, len(ws[k * 48 + 1 : k * 48 + 64]) AS n
         |        FROM k WHERE k * 48 < len(ws))
         |SELECT lang, count(DISTINCT doc_id) AS n_docs, count(1) AS n_chunks,
         |  CAST(sum(n) AS BIGINT) AS n_tokens
         |FROM ch GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), trim(col("text")).as("text"))
      val ev = base.filter(col("doc_id") % 50 === 0).select("doc_id", "text")
      val seeded = base
        .join(broadcast(ev.select(col("doc_id").as("__eid"), col("text").as("__etext"))),
          col("__eid") === col("doc_id") - (col("doc_id") % 50), "left")
        .select(col("doc_id"), col("lang"),
          concat(
            when(col("doc_id") % 3 === 0,
              lit("NAV: home | about | contact\n")).otherwise(lit("")),
            col("text"),
            when(col("doc_id") % 17 === 0 && col("doc_id") % 50 =!= 0 &&
                 col("__eid").isNotNull &&
                 size(split(col("__etext"), graft.expressions.Ws.Regex)) >= 13,
              concat(lit(" [CONT] "), col("__etext"))).otherwise(lit("")),
            when(col("doc_id") % 5 === 0,
              concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
              .otherwise(lit("")))
            .as("text"))
      val corp = seeded.filter(col("doc_id") % 50 =!= 0)
      val s1 = Curation.removeBoilerplate(corp, minDf = 100)
        .select("doc_id", "lang", "text")
      val s2 = Curation.scrubPii(s1).select("doc_id", "lang", "text")
      val flagged = Curation.contaminatedDocs(s2.select("doc_id", "text"), ev)
        .select("doc_id")
      val s3 = s2.join(flagged, Seq("doc_id"), "left_anti")
      val s4 = Curation.temperatureMix(s3, "lang")
      val chunks = Curation.chunkByTokens(s4.select("doc_id", "text"))
      chunks.join(s4.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(countDistinct("doc_id").as("n_docs"),
          count(lit(1)).as("n_chunks"),
          sum("n_tokens").as("n_tokens"))
        .orderBy("lang")
    },

    // Unicode/text normalization as an oracled operator: lowercase +
    // whitespace collapse + trim (the fingerprint normalization, F-series).
    Q("q62_normalize",
      """SELECT doc_id,
        | trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm,
        | length(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS norm_len
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val norm = trim(regexp_replace(lower(col("text")), graft.expressions.Ws.Regex, " "))
      Tables.documents(s, d)
        .select(col("doc_id"), norm.as("norm"), length(norm).as("norm_len"))
        .orderBy("doc_id")
    },
  )
}

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

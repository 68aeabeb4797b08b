package graft.scale

import graft.core.{Q, Tables}
import org.apache.spark.sql.functions._

/** Composed training-data queries: the full cleaning pipeline a pretraining
  * corpus goes through, expressed as one lazy plan (quality gate → language
  * gate → exact dedup → near-dup removal → stats).
  */
object PipelineQueries {

  val queries: Seq[Q] = Seq(

    // The canonical pretraining-corpus cleaning pipeline over documents:
    //   1. quality floor (length + token heuristics)
    //   2. language filter (keep confidently-identified docs)
    //   3. exact dedup (keep lowest doc_id per content hash)
    //   4. MinHash-LSH near-dup removal (drop the higher id of each pair)
    //   5. survivor stats per language
    // Rows-only (langId profiles live in the engine); every stage is itself
    // oracled/spec'd individually (q20-q26, TextSpec, DedupSpec).
    Q.noOracle("q61_clean_pipeline") { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val quality = docs
        .filter(length(col("text")) >= 100)
        .filter(Text.tokenCount(col("text")) >= 20)
        .filter(Text.qualityScoreNative(col("text")) >= 0.5)
      val withLang = quality
        .withColumn("lang_pred", Text.langIdNative(col("text")))
        .filter(col("lang_pred") =!= "und")
      val keepers = Dedup.exact(withLang).select(col("keep_id").as("doc_id"))
      // materialize at the widest reuse point: everything downstream
      // (signatures, both jaccard sides, the anti-join, the final stats)
      // re-reads this relation, and the quality/langid regex chain above it
      // is the expensive part — run it once. localCheckpoint, not cache, so
      // the blocks are GC-freed after the query instead of staying pinned
      // for the rest of the 65-query session.
      val exactDeduped = withLang.join(keepers, "doc_id").localCheckpoint()
      val sigs = Dedup.minhashSignatures(exactDeduped).localCheckpoint()
      val nearDupLosers = Dedup.jaccardVerify(exactDeduped,
          Dedup.minhashCandidates(sigs), threshold = 0.8)
        .select(col("doc_b").as("doc_id")).distinct()
      val cleaned = exactDeduped.join(nearDupLosers, Seq("doc_id"), "left_anti")
      cleaned.groupBy("lang_pred")
        .agg(count(lit(1)).as("n_docs"),
          round(avg(length(col("text"))), 2).as("avg_chars"),
          round(avg(Text.qualityScoreNative(col("text"))), 4).as("avg_quality"))
        .orderBy("lang_pred")
    },

    // Unicode/text normalization as an oracled operator: lowercase +
    // whitespace collapse + trim (the fingerprint normalization, F-series).
    Q("q62_normalize",
      """SELECT doc_id,
        | trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm,
        | length(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS norm_len
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
      Tables.documents(s, d)
        .select(col("doc_id"), norm.as("norm"), length(norm).as("norm_len"))
        .orderBy("doc_id")
    },
  )
}

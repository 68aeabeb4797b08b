package graft

import graft.core.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The declared surface is the union of the per-module registries; each Q
  * carries its Spark implementation and (when SQL-expressible) its DuckDB
  * oracle.
  */
object SparkEntry {

  val registry: Seq[Q] =
    ops.Relational.queries ++
    ops.Scale.queries ++
    ops.Extended.queries ++
    ops.Temporal.queries ++
    ops.Behavioral.queries ++
    ops.Skyline.queries ++
    ops.TopK.queries ++
    functions.Cleaning.queries ++
    sources.SourceQueries.queries ++
    summary.Golden.queries ++
    summary.Rollup.queries ++
    pipelines.PipelineQueries.queries ++
    streaming.StreamingQueries.queries ++
    scale.Text.queries ++
    scale.Dedup.queries ++
    scale.PipelineQueries.queries ++
    scale.Similarity.queries ++
    scale.AnnIndex.queries ++
    scale.Multimodal.queries ++
    scale.Curation.queries ++
    scale.NbClassifier.queries ++
    scale.Layout.queries ++
    scale.Retrieval.queries ++
    scale.Kmeans.queries ++
    scale.Graph.queries ++
    scale.Pq.queries ++
    scale.Pca.queries ++
    scale.Sampling.queries ++
    scale.Bpe.queries ++
    scale.Unigram.queries ++
    scale.Wordpiece.queries ++
    scale.KneserNey.queries ++
    scale.Recall.queries ++
    scale.Sketches.queries ++
    scale.Profiler.queries ++
    scale.SuffixArray.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * (The reference's MAU-style join+agg over the star schema.)
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    Tables.orders(spark, d)
      .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("order_cnt"), round(sum("o_totalprice"), 2).as("revenue"))
      .orderBy("c_mktsegment")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.collect { case Q(name, _, Some(sql)) => name -> sql }.toMap
}

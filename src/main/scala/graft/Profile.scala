package graft

import graft.core.Tables
import graft.scale.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the MinHash near-dup pipeline (scratch). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    time("warmup read")(docs.queryExecution.toRdd.count())
    val corpus = {
      val exact = docs.filter(col("doc_id") % 7 === 0).withColumn("doc_id", col("doc_id") + 100000)
      val near = docs.filter(col("doc_id") % 11 === 0).withColumn("doc_id", col("doc_id") + 200000)
        .withColumn("text", expr("substring(text, instr(text, ' ') + 1)"))
      docs.unionByName(exact).unionByName(near).cache()
    }
    time("corpus cache")(corpus.count())
    val sigs = Dedup.minhashSignatures(corpus)
    time("signatures")(sigs.queryExecution.toRdd.count())
    val cand = Dedup.minhashCandidates(sigs)
    time("candidates (sigs+banding+join)")(cand.queryExecution.toRdd.count())
    val sigsC = sigs.cache()
    time("sigs cache")(sigsC.count())
    val candC = Dedup.minhashCandidates(sigsC)
    time("candidates from cached sigs")(candC.queryExecution.toRdd.count())
    import org.apache.spark.sql.functions.{posexplode, transform => tfm, sequence, slice => slc, array_join, xxhash64, lit => l, col => c}
    val banded = sigsC.select(c("doc_id"),
      posexplode(tfm(sequence(l(0), l(15)),
        b => xxhash64(b, array_join(tfm(slc(c("signature"), b * 4 + 1, l(4)), h => h.cast("string")), ","))))
        .as(Seq("band", "band_hash")))
    time("banding only (cached sigs)")(banded.queryExecution.toRdd.count())
    val bandedC = banded.cache()
    time("banded cache")(bandedC.count())
    val joined = bandedC.as("a").join(bandedC.as("b"),
      c("a.band") === c("b.band") && c("a.band_hash") === c("b.band_hash") &&
        c("a.doc_id") < c("b.doc_id"))
      .select(c("a.doc_id").as("doc_a"), c("b.doc_id").as("doc_b")).distinct()
    time("self-join+distinct only (cached banded)")(joined.queryExecution.toRdd.count())
    val ver = Dedup.jaccardVerify(corpus, cand)
    time("verify (cand recomputed + jaccard)")(ver.queryExecution.toRdd.count())
    time("full q26 again")(Dedup.queries.find(_.name == "q26_minhash_neardup").get
      .fn(spark, sfDir).queryExecution.toRdd.count())

    // q61 stages
    import graft.scale.Text
    val docs61 = Tables.documents(spark, sfDir).select("doc_id", "text")
    val quality = docs61.filter(length(col("text")) >= 100)
      .filter(Text.tokenCount(col("text")) >= 20)
      .filter(Text.qualityScore(col("text")) >= 0.5)
    time("q61 quality filter")(quality.queryExecution.toRdd.count())
    val withLang = quality.withColumn("lang_pred", Text.langId(col("text")))
      .filter(col("lang_pred") =!= "und")
    time("q61 langid")(withLang.queryExecution.toRdd.count())
    val keepers = Dedup.exact(withLang).select(col("keep_id").as("doc_id"))
    val exactDeduped = withLang.join(keepers, "doc_id").cache()
    time("q61 exact dedup + cache")(exactDeduped.count())
    val sigs61 = Dedup.minhashSignatures(exactDeduped).cache()
    time("q61 sigs")(sigs61.count())
    val cand61 = Dedup.minhashCandidates(sigs61)
    time("q61 candidates")(cand61.queryExecution.toRdd.count())
    val losers = Dedup.jaccardVerify(exactDeduped, cand61, threshold = 0.8)
      .select(col("doc_b").as("doc_id")).distinct()
    time("q61 jaccard losers")(losers.queryExecution.toRdd.count())
    val cleaned = exactDeduped.join(losers, Seq("doc_id"), "left_anti")
    val stats = cleaned.groupBy("lang_pred")
      .agg(count(lit(1)).as("n_docs"),
        round(avg(length(col("text"))), 2).as("avg_chars"),
        round(avg(Text.qualityScore(col("text"))), 4).as("avg_quality"))
    time("q61 final stats")(stats.queryExecution.toRdd.count())
    spark.stop()
  }
}

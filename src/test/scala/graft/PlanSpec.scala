package graft

import graft.core.Tables
import graft.pipelines.Pipelines
import graft.scale.Similarity
import org.apache.spark.sql.functions._
import java.time.LocalDate

/** Physical-plan audits: the properties that make these queries survive a
  * 100x scale-up — pushdown reaching the scan, dimensions broadcast, column
  * pruning, no full-corpus shuffles where a partial form exists. Asserted on
  * `explain(formatted)` text so a regression in plan shape fails the build,
  * not just the benchmark.
  */
class PlanSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("runDateSlice pushes range bounds into the parquet scan (P4 at scale)") {
    val plan = planOf(Pipelines.runDateSlice(
      Tables.orders(spark, sfDir), "o_orderdate", LocalDate.of(1995, 6, 1)))
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*o_orderdate[^\\]]*\\].*"),
      s"o_orderdate bounds not pushed:\n$plan")
  }

  test("q09 region revenue: dimension joins are broadcast, not shuffled") {
    val plan = planOf(SparkEntry.queries("q09_region_revenue")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("column pruning: a two-column projection reads a two-column schema") {
    val plan = planOf(Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity"))
    val readSchema = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice"),
      s"scan reads more columns than the projection needs: $readSchema")
  }

  test("filter on a scanned column reaches PushedFilters (predicate pushdown)") {
    val plan = planOf(Tables.lineitem(spark, sfDir)
      .filter(col("l_quantity") > 30).select("l_orderkey"))
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*l_quantity[^\\]]*\\].*"), plan)
  }

  test("q64 min_by rewrite: one aggregation shuffle with map-side partials") {
    val plan = planOf(SparkEntry.queries("q64_channel_minby")(spark, sfDir))
    // exactly two exchanges: the hash exchange of the partial-aggregated
    // groupBy and the range exchange of the output sort — no window, no
    // distinct re-shuffle (q03's literal-parity form pays those)
    val exchanges = plan.linesIterator.count(l =>
      l.matches("""\(\d+\) Exchange.*""") || l.trim.startsWith("Exchange"))
    assert(exchanges === 2, s"plan:\n$plan")
    assert(plan.contains("partial_min_by") || plan.contains("partial_min"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("q30 brute-force top-k uses the partial (per-mapper heap) form") {
    val plan = planOf(SparkEntry.queries("q30_knn_cosine")(spark, sfDir))
    // the custom TopKPerKey operator appears twice in the plan tree
    // (partial pass before the exchange, final merge after; the formatted
    // details section repeats each), and the rank window reuses the final
    // pass's qid clustering: exactly two exchanges total (top-k hash, final
    // ORDER BY range) even with the window present
    assert("TopKPerKey".r.findAllIn(plan).size == 4, plan)
    val exchanges = plan.linesIterator.count(l =>
      l.matches(""".*\(\d+\) Exchange.*""") || l.trim.startsWith("Exchange"))
    assert(exchanges == 2, s"plan:\n$plan")
  }

  test("whole-stage codegen covers the relational aggregation path") {
    // AQE shows codegen spans only on the executed plan
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    // codegen'd operators print with a "*(n)" stage prefix
    assert(executed.contains("WholeStageCodegen") || "\\*\\(\\d+\\)".r.findFirstIn(executed).isDefined,
      executed)
    // and the aggregation is two-phase (map-side partial before the shuffle)
    assert(planOf(df).contains("partial_sum"), planOf(df))
  }

  test("broadcast query side in similarity search (no corpus-side shuffle for candidates)") {
    val emb = Tables.embeddings(spark, sfDir)
    val plan = planOf(Similarity.bruteForceTopKPartial(emb, emb.limit(3), 5))
    assert(plan.contains("BroadcastExchange"), plan)
  }

  test("decontamination broadcasts the benchmark shingles, never shuffling corpus text") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val plan = planOf(graft.scale.Curation.contaminatedDocs(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 50 =!= 0),
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 50 === 0)))
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("bloom decontamination probes scan-local with no eval-set broadcast") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = planOf(graft.scale.Curation.contaminatedDocsBloom(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0)))
      // the bloom probe is an expression in the corpus scan stage — the
      // clean-gram kill happens before any exchange, and the eval set is
      // never shipped as a broadcast relation
      assert(plan.contains("bloom_might_contain"), plan)
      assert(!plan.contains("BroadcastExchange"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("stratifiedMix is a pure filter: the only shuffle is the downstream agg") {
    val mixed = graft.scale.Curation.stratifiedMix(
      Tables.documents(spark, sfDir), "lang", Map("en" -> 16, "de" -> 8), default16 = 2)
    val plan = planOf(mixed)
    val exchanges = plan.linesIterator.count(l =>
      l.matches("""\(\d+\) Exchange.*""") || l.trim.startsWith("Exchange"))
    assert(exchanges === 0, s"sampling itself must not shuffle, plan:\n$plan")
  }

  test("repetition stats: kernel runs in the scan stage, one agg shuffle, no explode") {
    import org.apache.spark.sql.functions._
    val stats = graft.scale.Curation.repetitionStats(
      Tables.documents(spark, sfDir).select("doc_id", "lang", "text"))
      .groupBy("lang").agg(sum("top_bigram"))
    val plan = planOf(stats)
    val exchanges = plan.linesIterator.count(l =>
      l.matches("""\(\d+\) Exchange.*""") || l.trim.startsWith("Exchange"))
    assert(exchanges === 1, s"per-doc kernel + one agg shuffle expected, plan:\n$plan")
    assert(!plan.contains("Generate"), s"no explode in the native path:\n$plan")
  }

  test("sequence packing shuffles once (by shard) and text never rides the exchange") {
    val plan = planOf(graft.scale.Curation.packSequences(
      Tables.documents(spark, sfDir).select("doc_id", "text")))
    val exchanges = plan.linesIterator.count(l =>
      l.matches("""\(\d+\) Exchange.*""") || l.trim.startsWith("Exchange"))
    assert(exchanges === 1, s"one hash shuffle by shard expected, plan:\n$plan")
    // only (doc_id, shard, toks) reach the exchange — the text column is
    // reduced to its word count inside the scan-side projection
    val exchangeLine = plan.linesIterator.find(_.contains("Exchange")).get
    assert(!plan.contains("text#") ||
      !exchangeLine.contains("text"), s"text must not shuffle:\n$plan")
  }

  test("unigram surprisal broadcasts the vocabulary — no sort-merge join on the token stream") {
    val plan = planOf(graft.scale.Curation.unigramSurprisal(
      Tables.documents(spark, sfDir).select("doc_id", "lang", "text")))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), s"token stream must not sort-merge:\n$plan")
  }

  test("capped surprisal: the broadcast vocabulary is K-bounded (TakeOrdered feeds it)") {
    val plan = planOf(graft.scale.Curation.unigramSurprisal(
      Tables.documents(spark, sfDir).select("doc_id", "lang", "text"), vocabCap = 16))
    // the vocabCap path exists to bound the broadcast: the cut vocabulary
    // must materialize as a bounded top-K (per-partition heaps merged on the
    // driver — K rows total), not a global sort, before it feeds the
    // BroadcastExchange the token stream probes
    assert(plan.contains("TakeOrderedAndProject"), s"cut is not a bounded top-K:\n$plan")
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("SortMergeJoin"), s"token stream must not sort-merge:\n$plan")
  }

  test("q80 curation pipeline: cap window is narrow, vocabulary cut is bounded") {
    val plan = planOf(SparkEntry.queries("q80_curation_pipeline")(spark, sfDir))
    // domain-cap window + bounded vocabulary cut, and the corpus text never
    // sort-merges anywhere in the composed chain
    assert(plan.contains("Window"), plan)
    assert(plan.contains("TakeOrderedAndProject"), s"vocabulary cut not bounded:\n$plan")
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("temperatureMix joins rates by broadcast: the corpus relation never sort-merges") {
    val plan = planOf(graft.scale.Curation.temperatureMix(
      Tables.documents(spark, sfDir), "lang"))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), s"corpus must not sort-merge for its rates:\n$plan")
  }

  test("chunkByTokens is scan-local: zero exchanges before any downstream op") {
    val plan = planOf(graft.scale.Curation.chunkByTokens(
      Tables.documents(spark, sfDir).select("doc_id", "text")))
    val exchanges = plan.linesIterator.count(l =>
      l.matches("""\(\d+\) Exchange.*""") || l.trim.startsWith("Exchange"))
    assert(exchanges === 0, s"chunking must not shuffle:\n$plan")
  }

  test("removeBoilerplate rebuild is a pure projection: zero exchanges, no explode") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").limit(200)
    val plan = planOf(graft.scale.Curation.removeBoilerplate(docs, minDf = 50))
    // the df pass already ran (hash-keyed, collected bounded hot set); the
    // returned rebuild must run entirely inside the scan task — per-row
    // split/filter/concat against the hot-hash literal
    val exchanges = plan.linesIterator.count(l =>
      l.matches("""\(\d+\) Exchange.*""") || l.trim.startsWith("Exchange"))
    assert(exchanges === 0, s"rebuild must not shuffle:\n$plan")
    assert(!plan.contains("Generate"), s"rebuild must not explode:\n$plan")
  }

  test("removeBoilerplate probes a reference-object set, not an O(|hot|) plan literal") {
    import org.apache.spark.sql.functions._
    // plant a hot line in every doc so the hot set is non-empty, then assert
    // the rebuild plan embeds NEITHER the hot line's hash value nor an
    // array_contains over a literal array — the set must ride task
    // serialization as a LongSetContains reference object
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"),
      concat(lit("HOTLINE\n"), col("text")).as("text")).limit(500)
    val cleaned = graft.scale.Curation.removeBoilerplate(docs, minDf = 50)
    val hotHash = spark.sql("SELECT xxhash64('HOTLINE') AS h").head().getLong(0)
    val plan = cleaned.queryExecution.optimizedPlan.toString
    assert(plan.contains("long_set_contains"), s"expected LongSetContains probe:\n$plan")
    assert(!plan.contains(hotHash.toString),
      s"hot hash $hotHash must not appear as a plan literal:\n$plan")
    assert(!plan.contains("array_contains"), s"rebuild must not linear-scan a literal:\n$plan")
    // the fraction form resolves to the same plan shape
    val frac = graft.scale.Curation.removeBoilerplateByFraction(docs, 0.1)
    assert(frac.queryExecution.optimizedPlan.toString.contains("long_set_contains"))
  }

  test("kmvSample prunes per-partition before its only wide stage") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sfDir)
    val plan = planOf(graft.ops.Scale.kmvSample(li, "l_returnflag",
      md5(concat(col("l_orderkey").cast("string"), lit("-"), col("l_linenumber").cast("string"))),
      col("l_extendedprice"), k = 64))
    // bounded heaps run as a MapPartitions stage ahead of the window sort
    assert(plan.contains("MapPartitions"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("corpus-QA profiles never window the vocab relation (termDrift/zipf/suffix seed)") {
    val docs = Tables.documents(spark, sfDir)
    // termDrift: the vocab-wide rank is a TakeOrdered cut; the only window
    // allowed is the k-row rank AFTER the cut (its input is a limit)
    val drift = planOf(graft.scale.Curation.termDrift(
      docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1)))
    assert(drift.contains("TakeOrderedAndProject"), drift)
    // zipf + the suffix round-0 seed rank through denseRankBy
    // (range-repartitioned mapPartitions): zero Window operators anywhere —
    // a revert to row_number()/dense_rank() over the full vocab would
    // reintroduce one
    val zipf = planOf(graft.scale.Curation.zipfBuckets(docs.limit(200)))
    assert(!zipf.contains("Window"), zipf)
    val seed = planOf(graft.scale.SuffixArray.suffixRanks(docs.limit(50), rounds = 1))
    assert(!seed.contains("Window"), seed)
  }

  test("exact dedup aggregates on the hash, never shuffling text twice") {
    val plan = planOf(graft.scale.Dedup.exact(Tables.documents(spark, sfDir)))
    // partial then final HashAggregate around a single Exchange
    val exchanges = plan.linesIterator.count(l =>
      l.matches("""\(\d+\) Exchange.*""") || l.trim.startsWith("Exchange"))
    assert(exchanges === 1, s"expected exactly one shuffle, plan:\n$plan")
    assert(plan.contains("HashAggregate"), plan)
  }

  test("probeIvf scans only the probed cells: cid directory-pruned, codes-only read") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("graft-plan-ivf").toString + "/ivf"
    val idx = graft.scale.AnnIndex.buildIvfIndex(emb, root)
    val probe = graft.scale.AnnIndex.probeIvf(
      spark, root, emb.filter(col("vec_id") < 5), 3, nProbe = 2)
    val plan = planOf(probe)
    // the cid IN-list reaches the postings scan as a PARTITION filter —
    // directory pruning, not a data filter over a full scan
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*cid[^\\]]*\\].*"),
      s"cid not pruned at the partition level:\n$plan")
    // the postings scan reads codes only — the raw vector column does not
    // exist in the index, so no probe can ever scan it
    val postingsRead = plan.linesIterator
      .filter(l => l.contains("ReadSchema") && l.contains("code")).mkString
    assert(postingsRead.nonEmpty && !postingsRead.contains("embedding"),
      s"postings scan must read codes only:\n$plan")
    // pruning is real: the postings relation resolves to <= nProbe * |queries|
    // distinct cells' directories, never the full corpus partition count
    assert(idx.nCentroids > 10) // sanity: pruning below is a real cut
  }

  test("filtered probeIvf pushes the metadata predicate into the postings scan") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      .withColumn("lang", expr(
        "CASE CAST(vec_id % 4 AS INT) WHEN 0 THEN 'en' ELSE 'xx' END"))
    val root = java.nio.file.Files.createTempDirectory("graft-plan-fivf").toString + "/ivf"
    graft.scale.AnnIndex.buildIvfIndex(emb, root, metaCols = Seq("lang"))
    val plan = planOf(graft.scale.AnnIndex.probeIvf(
      spark, root, emb.filter(col("vec_id") < 5), 3, nProbe = 2,
      pred = Some(col("lang") === "en")))
    // the predicate lands in PushedFilters on the codes-only scan — rows
    // the filter rejects never reach the scoring heap
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*lang[^\\]]*\\].*"),
      s"lang predicate not pushed to the postings scan:\n$plan")
    // cid partition pruning is undisturbed by the extra predicate
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*cid[^\\]]*\\].*"), plan)
  }

  private def exchangeCount(plan: String): Int =
    plan.linesIterator.count(l =>
      l.matches("""\(\d+\) Exchange.*""") || l.trim.startsWith("Exchange"))

  test("q178 rolling MAU: bounded expansion, no inequality join anywhere") {
    val plan = planOf(SparkEntry.queries("q178_rolling_mau")(spark, sfDir))
    // the naive form is a BroadcastNestedLoop (range) join; the expansion
    // rewrite must keep everything equi-keyed
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q176 point-in-time join: no range/cross join; keyed exchanges only") {
    val plan = planOf(SparkEntry.queries("q176_temporal_join")(spark, sfDir))
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // scd2's windows and the as-of union window all key on o_custkey; the
    // whole composition should stay in single digits of exchanges
    assert(exchangeCount(plan) <= 6, s"${exchangeCount(plan)} exchanges:\n$plan")
  }

  test("q172 attribution: bin-bucketed touch join is an equi hash join") {
    val plan = planOf(SparkEntry.queries("q172_attribution")(spark, sfDir))
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("extractText is scan-local: zero exchanges, no explode, codegen'd HOFs") {
    val plan = planOf(graft.scale.Curation.extractText(
      Tables.documents(spark, sfDir).select("doc_id", "text")))
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Generate"), plan)
  }

  test("URL canonicalization + domain are pure projections: zero exchanges") {
    import graft.scale.Curation
    val plan = planOf(Tables.documents(spark, sfDir)
      .select(col("doc_id"), concat(lit("https://www.Example.com:443/a?utm_s=1&q="),
        col("doc_id").cast("string")).as("url"))
      .select(col("doc_id"), Curation.canonicalizeUrl(col("url")).as("url"))
      .withColumn("domain", Curation.urlDomain(col("url"))))
    assert(!plan.contains("Exchange"), plan)
  }

  test("q128 bigram joins stay broadcast at bench scale (sf0.1) under AQE") {
    // the bigram-count join is deliberately UNHINTED (vocab² can outgrow
    // any broadcast threshold on a real corpus — the r12 advice finding),
    // which leaves the strategy to AQE. Pin that at the BENCH corpus the
    // r13 verdict flagged (sf0.1): the vocab²-bounded bigram table and the
    // doc-count-bounded score table must both come in under the default
    // 10 MB threshold and broadcast — a silent fallback to sort-merge on
    // the transition stream is exactly the regression this guards.
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.1")
      .select("doc_id", "lang", "text")
    val df = graft.scale.Curation.bigramSurprisal(docs)
    df.collect() // drive to completion so AQE finalizes its join choices
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("BroadcastHashJoin"), finalPlan)
    assert(!finalPlan.contains("SortMergeJoin"),
      s"a q128 join degraded to sort-merge at bench scale:\n$finalPlan")
  }
}

package graft.scale

import graft.core.{Q, Tables}
import graft.ops.TopK
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling and exact distribution statistics — the two "decide the
  * cut" primitives a curation pipeline runs before it filters anything:
  * draw a reproducible per-stratum sample to eyeball, and compute the exact
  * percentile thresholds the quality filters will use.
  *
  * Both are built to the package's scale rules: deterministic integer/hash
  * arithmetic (value-exact on any engine), no global sort, nothing
  * corpus-sized on the driver.
  */
object Sampling {

  /** Exact-size deterministic sample per stratum: the `n` rows of each
    * `strataCol` group that come first in (md5(id), id) order — the
    * package's standard hash permutation ([[Curation.shuffleShards]],
    * train/val/test splits), so the sample is a pure function of the data,
    * stable across runs, engines and partitionings.
    *
    * Runs through the custom [[graft.ops.TopK.topKPerKey]] operator: each
    * mapper keeps one bounded n-heap per stratum and only n × strata ×
    * mappers candidate rows ride the shuffle — no per-partition sort, no
    * corpus-sized window. `TABLESAMPLE` / `df.sample` can't do per-stratum
    * exact counts, and the window form sorts every partition first.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       n: Int): DataFrame = {
    val pri = md5(col(idCol).cast("string"))
    TopK.topKPerKey(df.withColumn("__pri", pri),
      Seq(strataCol), Seq(col("__pri").asc, col(idCol).asc), n)
      .drop("__pri")
  }

  /** Exact percentiles per key WITHOUT a global sort — the two-phase
    * counting shape: (1) one combine-friendly shuffle to (key, value)
    * counts — the only pass over the corpus; (2) cumulative counts over the
    * per-key DISTINCT-value table (tiny: bounded by the value domain, not
    * the corpus) pick each percentile as the smallest value whose rank
    * reaches `ceil(p·N)` — `percentile_disc` semantics, checked as exact
    * integer cross-multiplication (`cum·den ≥ num·N`), no floats anywhere.
    *
    * `spark.stat.approxQuantile` and `approx_percentile` trade exactness
    * for one pass; a 100 TB quality cut wants the exact threshold, and this
    * stays two narrow shuffles regardless of corpus size.
    *
    * `percentiles` are (name, numerator, denominator) triples, e.g.
    * ("p90", 90, 100). Values must be non-null integers.
    */
  def exactPercentilesByKey(df: DataFrame, keyCol: String, valCol: String,
                            percentiles: Seq[(String, Int, Int)]): DataFrame = {
    val counts = df.groupBy(col(keyCol), col(valCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val byKey = Window.partitionBy(keyCol)
    val cum = sum(col("__c")).over(byKey.orderBy("__v"))
    val total = sum(col("__c")).over(byKey)
    val ranked = counts.withColumn("__cum", cum).withColumn("__n", total)
    val aggs = count(lit(1)).as("__distinct") +:
      percentiles.map { case (name, num, den) =>
        min(when(col("__cum") * lit(den.toLong) >= col("__n") * lit(num.toLong),
          col("__v"))).as(name)
      }
    ranked.groupBy(col(keyCol), col("__n").as("n_rows"))
      .agg(aggs.head, aggs.tail: _*)
      .drop("__distinct")
  }

  /** Weighted reservoir sample without replacement per stratum
    * (Efraimidis–Spirakis A-ES via the exponential race): item i survives
    * with probability proportional to `weightCol`, drawn as the `n`
    * smallest values of e_i = −ln(u_i)/w_i, where u_i is the md5-derived
    * 60-bit hash fraction of the id — so like every sampler in this
    * package the draw is a pure function of the DATA: reproducible across
    * runs, engines and partitionings, and replayable as plain SQL (the
    * q160 oracle), which no PRNG-seeded sampler can offer.
    *
    * Same scale shape as [[stratifiedSample]]: TopKPerKey bounded heaps,
    * n × strata × mappers candidates on the shuffle, no per-partition
    * sort. Rows with non-positive weight are excluded (A-ES domain).
    */
  def weightedSample(df: DataFrame, strataCol: String, idCol: String,
                     weightCol: String, n: Int): DataFrame = {
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long") / lit(1152921504606846976.0) // 2^60
    val e = -log(u) / col(weightCol)
    TopK.topKPerKey(
      df.filter(col(weightCol) > 0).withColumn("__e", e),
      Seq(strataCol), Seq(col("__e").asc, col(idCol).asc), n)
      .drop("__e")
  }

  val queries: Seq[Q] = Seq(

    // q160: 8 docs per language, drawn with probability proportional to
    // document length — the "sample for inspection, weighted by how much
    // text you're actually looking at" draw. The oracle replays the same
    // exponential race in SQL over the same md5 fractions.
    Q("q160_weighted_sample",
      """SELECT lang, doc_id, n_chars FROM (
        |  SELECT lang, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY -ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)
        |                   / 1152921504606846976.0) / n_chars, doc_id) AS rn
        |  FROM documents WHERE n_chars > 0)
        |WHERE rn <= 8 ORDER BY lang, doc_id""".stripMargin) { (s, d) =>
      weightedSample(
        Tables.documents(s, d).select("lang", "doc_id", "n_chars"),
        "lang", "doc_id", "n_chars", n = 8)
        .orderBy("lang", "doc_id")
    },

    // q122: 25 docs per language, selected by the md5 hash permutation —
    // the reproducible "show me a sample of every stratum" draw. The
    // oracle's window replays the same permutation; the engine's TopKPerKey
    // heaps must surface the identical 25-row set per language.
    Q("q122_stratified_sample",
      """SELECT lang, doc_id, n_chars FROM (
        |  SELECT lang, doc_id, n_chars,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents) WHERE rn <= 25
        |ORDER BY lang, doc_id""".stripMargin) { (s, d) =>
      stratifiedSample(
        Tables.documents(s, d).select("lang", "doc_id", "n_chars"),
        "lang", "doc_id", n = 25)
        .orderBy("lang", "doc_id")
    },

    // q124: exact p50/p90/p99 of document length per language — the
    // thresholds a length-based quality filter would apply. quantile_disc
    // is DuckDB's independent implementation of the same discrete
    // percentile definition (smallest value whose cumulative count reaches
    // ceil(p·N) — parity pinned in SamplingSpec).
    Q("q124_exact_percentiles",
      """SELECT lang, count(1) AS n_rows,
        |       quantile_disc(n_chars, 0.50) AS p50,
        |       quantile_disc(n_chars, 0.90) AS p90,
        |       quantile_disc(n_chars, 0.99) AS p99
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      exactPercentilesByKey(
        Tables.documents(s, d).select("lang", "n_chars"),
        "lang", "n_chars",
        Seq(("p50", 50, 100), ("p90", 90, 100), ("p99", 99, 100)))
        .orderBy("lang")
    },

    // Robust outlier flagging via median absolute deviation: per-language
    // median of doc lengths, median of |len − med| (both through the exact
    // percentile machinery — integer cross-multiplication thresholds, no
    // sort), then the `|len − med| > 2·MAD` flag as a pure integer compare
    // (2·MAD splits this corpus 22/478; the classic 3·MAD never fires on
    // its uniform synthetic lengths).
    // The standard length-outlier screen a curation pipeline runs before
    // mixing; two narrow count shuffles + broadcast joins of the 5-row
    // per-language statistics, corpus never re-shuffles.
    Q("q143_mad_outliers",
      """WITH m AS (SELECT lang, CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS med
        |           FROM documents GROUP BY 1),
        | dv AS (SELECT d.lang, m.med, abs(d.n_chars - m.med) AS dd
        |        FROM documents d JOIN m USING (lang)),
        | md AS (SELECT lang, CAST(quantile_disc(dd, 0.5) AS BIGINT) AS mad
        |        FROM dv GROUP BY 1)
        |SELECT dv.lang, MAX(dv.med) AS med, MAX(md.mad) AS mad,
        |  count(1) AS n_docs,
        |  CAST(SUM(CASE WHEN dd > 2 * md.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dv JOIN md USING (lang)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("lang"), col("n_chars"))
      val med = exactPercentilesByKey(docs, "lang", "n_chars", Seq(("med", 1, 2)))
        .select(col("lang"), col("med"))
      val dev = docs.join(broadcast(med), "lang")
        .select(col("lang"), col("med"), abs(col("n_chars") - col("med")).as("dd"))
      val mad = exactPercentilesByKey(dev.select(col("lang"), col("dd")),
          "lang", "dd", Seq(("mad", 1, 2)))
        .select(col("lang"), col("mad"))
      dev.join(broadcast(mad), "lang")
        .groupBy("lang")
        .agg(max("med").as("med"), max("mad").as("mad"),
          count(lit(1)).as("n_docs"),
          sum(when(col("dd") > col("mad") * 2, 1L).otherwise(0L)).as("n_outliers"))
        .orderBy("lang")
    },

    // Winsorization: clamp doc lengths to the per-language [p10, p90] band
    // (thresholds from the exact-percentile machinery) and report the
    // clamped totals — the outlier-taming companion to the q143 flag, as
    // used before any mean-based mixing statistic. Pure integer clamp; the
    // corpus is touched by one count shuffle (percentiles) and one
    // broadcast-joined aggregate.
    Q("q147_winsorize",
      """WITH b AS (
        |  SELECT lang,
        |    CAST(quantile_disc(n_chars, 0.10) AS BIGINT) AS lo,
        |    CAST(quantile_disc(n_chars, 0.90) AS BIGINT) AS hi
        |  FROM documents GROUP BY 1)
        |SELECT d.lang, MAX(b.lo) AS lo, MAX(b.hi) AS hi,
        |  CAST(SUM(least(greatest(d.n_chars, b.lo), b.hi)) AS BIGINT) AS sum_clamped,
        |  CAST(SUM(CASE WHEN d.n_chars < b.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |  CAST(SUM(CASE WHEN d.n_chars > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high
        |FROM documents d JOIN b USING (lang)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("lang"), col("n_chars"))
      val bands = exactPercentilesByKey(docs, "lang", "n_chars",
          Seq(("lo", 10, 100), ("hi", 90, 100)))
        .select(col("lang"), col("lo"), col("hi"))
      docs.join(broadcast(bands), "lang")
        .groupBy("lang")
        .agg(max("lo").as("lo"), max("hi").as("hi"),
          sum(least(greatest(col("n_chars"), col("lo")), col("hi"))).as("sum_clamped"),
          sum(when(col("n_chars") < col("lo"), 1L).otherwise(0L)).as("n_low"),
          sum(when(col("n_chars") > col("hi"), 1L).otherwise(0L)).as("n_high"))
        .orderBy("lang")
    },

    // Equi-depth histogram per language: exact quartile boundaries from the
    // two-narrow-shuffle percentile machinery (q124), broadcast back as
    // 4-row bands, each doc bucketed by integer comparison. The profile
    // complement to q159: where the data MASSES, not just its min/max.
    Q("q179_histogram",
      """WITH b AS (
        |  SELECT lang,
        |    quantile_disc(n_chars, 0.25) AS p25,
        |    quantile_disc(n_chars, 0.50) AS p50,
        |    quantile_disc(n_chars, 0.75) AS p75
        |  FROM documents GROUP BY 1)
        |SELECT d.lang,
        |  CASE WHEN n_chars <= p25 THEN 0 WHEN n_chars <= p50 THEN 1
        |       WHEN n_chars <= p75 THEN 2 ELSE 3 END AS bucket,
        |  count(*) AS n_docs
        |FROM documents d JOIN b ON d.lang = b.lang
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val bands = exactPercentilesByKey(docs, "lang", "n_chars",
        Seq(("p25", 25, 100), ("p50", 50, 100), ("p75", 75, 100)))
        .select("lang", "p25", "p50", "p75")
      docs.join(broadcast(bands), "lang")
        .groupBy(col("lang"),
          when(col("n_chars") <= col("p25"), 0)
            .when(col("n_chars") <= col("p50"), 1)
            .when(col("n_chars") <= col("p75"), 2)
            .otherwise(3).as("bucket"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "bucket")
    },
  )
}

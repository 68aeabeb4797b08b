package graft.scale

import graft.core.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge.{column => ncol, expression => nexpr}
import org.apache.spark.sql.functions._

/** Naive-Bayes bag-of-words quality classifier — the fastText-style model
  * every web-corpus curation pipeline trains on weak labels (wiki-vs-crawl,
  * lang-vs-rest) and then sweeps over the full corpus as a keep/drop filter
  * (the GPT-3 / CCNet quality-filtering step). Not present in the reference
  * (whose analytics stop at SQL aggregation); built as a first-class
  * training-data operator on the `documents` table.
  *
  * Everything is INTEGER arithmetic, so both training and scoring are
  * value-exact on any engine (the q75 surprisal trick): log-likelihoods are
  * quantized to bit lengths — `length(bin(x))` = floor(log2 x) + 1, which
  * DuckDB and Spark compute identically — and token keys are the shared
  * 60-bit md5-prefix permutation. A per-token weight is the bit-length
  * log-likelihood ratio with Laplace smoothing, over the TOP-K vocabulary
  * cut by the deterministic (count desc, token asc) order:
  *
  *   w(t) = bitlen(c1+1) - bitlen(c0+1) + bitlen(T0+V) - bitlen(T1+V)
  *
  * where c1/c0 are the token's occurrence counts in the positive/negative
  * class, T1/T0 the class totals over the cut vocabulary, and V the cut
  * size. The document score is `prior + Σ w(t)` over token OCCURRENCES
  * (bag semantics), with out-of-vocabulary tokens contributing zero.
  *
  * Scale shape: training is ONE token-keyed shuffle (map-side partial
  * counts) plus a K-bounded TakeOrdered — the model collect is topK rows of
  * (8-byte key, weight), legitimate bounded metadata. Scoring is a pure
  * codegen'd projection: tokens hash to longs in place and stream through
  * the [[graft.expressions.LongMapSum]] kernel against the sorted weight
  * array — NO shuffle, no join, no explode; a 100 TB corpus scores in one
  * scan. Both kernel calls (score and hit count) share the same hashed-token
  * array subexpression, which whole-stage codegen's subexpression
  * elimination evaluates once per row.
  */
object NbClassifier {

  /** Trained model: sorted 60-bit token keys, aligned integer weights, and
    * the class-prior bit-length ratio added to every document's score.
    */
  final case class Model(keys: Array[Long], weights: Array[Long], prior: Long) {
    require(keys.length == weights.length)
  }

  private def toks(text: Column): Column =
    filter(split(text, graft.expressions.Ws.Regex), w => w =!= "")

  private def bitlen(c: Column): Column = length(bin(c)).cast("long")

  private def key60(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** The model as a DataFrame of (token, key, w) — the distributed part of
    * training: one token-keyed count shuffle, the deterministic top-K cut,
    * and the bit-length weight formula over the cut totals.
    */
  def trainModelDf(labeled: DataFrame, labelCol: String = "y",
                   textCol: String = "text", topK: Int = 16): DataFrame = {
    val y = col("__y")
    val t = labeled.select(col(labelCol).cast("long").as("__y"),
      explode(toks(col(textCol))).as("__g"))
    val counts = t.groupBy("__g").agg(
      sum(y).as("__c1"),
      (count(lit(1)) - sum(y)).as("__c0"),
      count(lit(1)).as("__cnt"))
    val cut = counts.orderBy(col("__cnt").desc, col("__g")).limit(topK)
    val tot = cut.agg(sum("__c1").as("__t1"), sum("__c0").as("__t0"),
      count(lit(1)).as("__v"))
    cut.crossJoin(broadcast(tot)).select(
      col("__g").as("token"),
      key60(col("__g")).as("key"),
      (bitlen(col("__c1") + 1) - bitlen(col("__c0") + 1)
        + bitlen(col("__t0") + col("__v"))
        - bitlen(col("__t1") + col("__v"))).as("w"))
  }

  /** Class-prior score term: bitlen(n1+1) - bitlen(n0+1) over the labeled
    * document counts.
    */
  def priorOf(labeled: DataFrame, labelCol: String = "y"): Long = {
    val y = col(labelCol).cast("long")
    labeled.agg(
      (bitlen(sum(y) + 1) - bitlen(count(lit(1)) - sum(y) + 1)).as("p"))
      .head().getLong(0)
  }

  /** Full training: the distributed model build plus the bounded (topK-row)
    * collect into the sorted probe arrays the scoring kernel ships.
    */
  def fit(labeled: DataFrame, labelCol: String = "y", textCol: String = "text",
          topK: Int = 16): Model = {
    val rows = trainModelDf(labeled, labelCol, textCol, topK)
      .select("key", "w").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    Model(rows.map(_._1), rows.map(_._2), priorOf(labeled, labelCol))
  }

  /** Score every document: adds `scoreCol` (prior + Σ weights over token
    * occurrences) and `hitsCol` (in-vocabulary occurrence count). Pure
    * projection — the model rides the [[graft.expressions.LongMapSum]]
    * kernel as reference-object arrays.
    */
  def score(docs: DataFrame, model: Model, textCol: String = "text",
            scoreCol: String = "score", hitsCol: String = "n_hits"): DataFrame = {
    val ks = transform(toks(col(textCol)), t => key60(t))
    val s = ncol(graft.expressions.LongMapSum(nexpr(ks), model.keys, model.weights))
    val h = ncol(graft.expressions.LongMapSum(nexpr(ks), model.keys,
      Array.fill(model.keys.length)(1L)))
    docs.withColumn(scoreCol, s + lit(model.prior)).withColumn(hitsCol, h)
  }

  // q117: train on the ~2/3 stratum (doc_id % 3 <> 0) with the weak label
  // y = (lang = 'en'), score the held-out third per-document. The oracle
  // replays training declaratively (counts -> top-16 cut -> bit-length
  // weights -> md5-prefix keys) and scores by explode + left join + sum —
  // every intermediate is an integer, so engine and oracle agree exactly.
  val queries: Seq[Q] = Seq(
    Q("q117_nb_quality",
      """WITH lab AS (
        |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y, text
        |  FROM documents WHERE doc_id % 3 <> 0),
        | w AS (
        |  SELECT y, unnest(list_filter(string_split_regex(text, '\s+'),
        |                               x -> x <> '')) AS g
        |  FROM lab),
        | v AS (SELECT g, CAST(sum(y) AS BIGINT) AS c1,
        |              CAST(count(1) - sum(y) AS BIGINT) AS c0,
        |              count(1) AS cnt
        |       FROM w GROUP BY 1),
        | cut AS (SELECT * FROM v ORDER BY cnt DESC, g LIMIT 16),
        | tot AS (SELECT CAST(sum(c1) AS BIGINT) AS t1,
        |                CAST(sum(c0) AS BIGINT) AS t0,
        |                count(1) AS vz FROM cut),
        | model AS (
        |  SELECT CAST(('0x' || substring(md5(g), 1, 15)) AS BIGINT) AS k,
        |         CAST(length(bin(c1 + 1)) - length(bin(c0 + 1))
        |            + length(bin(t0 + vz)) - length(bin(t1 + vz)) AS BIGINT) AS wt
        |  FROM cut CROSS JOIN tot),
        | pr AS (
        |  SELECT CAST(length(bin(CAST(sum(y) AS BIGINT) + 1))
        |            - length(bin(CAST(count(1) - sum(y) AS BIGINT) + 1))
        |              AS BIGINT) AS p
        |  FROM lab),
        | sc AS (
        |  SELECT doc_id, CAST(('0x' || substring(md5(g), 1, 15)) AS BIGINT) AS k
        |  FROM (SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'),
        |                                          x -> x <> '')) AS g
        |        FROM documents WHERE doc_id % 3 = 0)),
        | agg AS (
        |  SELECT doc_id, CAST(count(wt) AS BIGINT) AS n_hits,
        |         CAST(sum(coalesce(wt, 0)) AS BIGINT) AS s
        |  FROM sc LEFT JOIN model ON sc.k = model.k GROUP BY 1)
        |SELECT d.doc_id, d.lang,
        |       coalesce(n_hits, 0) AS n_hits,
        |       coalesce(s, 0) + p AS score,
        |       (coalesce(s, 0) + p) > 0 AS pred_en
        |FROM (SELECT doc_id, lang FROM documents WHERE doc_id % 3 = 0) d
        |LEFT JOIN agg USING (doc_id) CROSS JOIN pr
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "lang", "text")
      val labeled = docs.filter(col("doc_id") % 3 =!= 0)
        .withColumn("y", (col("lang") === "en").cast("int"))
      val model = fit(labeled, topK = 16)
      score(docs.filter(col("doc_id") % 3 === 0), model)
        .select(col("doc_id"), col("lang"), col("n_hits"), col("score"),
          (col("score") > 0).as("pred_en"))
        .orderBy("doc_id")
    },
  )
}

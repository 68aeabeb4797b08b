package graft.scale

import graft.core.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval over the document corpus — the search primitive a
  * curation pipeline reaches for when it needs "every document about X"
  * (targeted quality audits, topic mixes, eval-set mining). Not a reference
  * operator; the lexical complement of the embedding-space
  * [[Similarity]] / [[AnnIndex]] paths.
  *
  * Scoring is the classic Robertson BM25 with k1 = 6/5 and b = 3/4, folded
  * into ONE integer division per (doc, term) so both engines agree exactly
  * (the q117 quantization strategy): with integer idf, average doc length
  * `avg` and per-doc length `len`,
  *
  *   tf·(k1+1) / (tf + k1·(1 − b + b·len/avg))
  *     = 44·avg·tf / (20·avg·tf + 6·avg + 18·len)
  *
  * so `score_t = (1000 · idf · 44 · avg · tf) DIV (20·avg·tf + 6·avg +
  * 18·len)` in milli-units, summed over query terms. idf is the bit-length
  * quantization `bitlen(N+1) − bitlen(df_t+1)` (≈ log2 with +1 smoothing),
  * and `avg = Σlen DIV N` — every intermediate a BIGINT.
  *
  * Scale shape: corpus statistics are one aggregation returning ONE row (N,
  * Σlen) plus one `df_t` count per query term over a broadcast-filtered
  * explode; scoring is then a pure codegen'd projection — per-term
  * occurrence counts via an array scan per row, the integer formula, no
  * shuffle, no join. A query has a handful of terms, so the per-term
  * columns stay narrow; batch-scoring thousands of stored queries is the
  * ANN path's job, not this one's.
  */
object Retrieval {

  private[graft] def toks(text: Column): Column =
    filter(split(text, graft.expressions.Ws.Regex), w => w =!= "")

  private def bitlen(c: Column): Column = length(bin(c)).cast("long")

  private def idiv(num: Column, den: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftColumnBridge.expression(num),
        org.apache.spark.sql.GraftColumnBridge.expression(den)))

  /** Corpus stats for scoring: (N docs, avg doc length, idf per term). One
    * 1-row aggregation + one small term-keyed count — bounded collects.
    */
  def corpusStats(docs: DataFrame, terms: Seq[String],
                  textCol: String = "text"): (Long, Long, Map[String, Long]) = {
    val withLen = docs.select(size(toks(col(textCol))).cast("long").as("__len"),
      toks(col(textCol)).as("__ts"))
    val r = withLen.agg(count(lit(1)).as("n"), sum("__len").as("s")).head()
    val n = r.getLong(0)
    val avg = math.max(1L, r.getLong(1) / n)
    val dfs = withLen
      .select(explode(array_distinct(col("__ts"))).as("__t"))
      .filter(col("__t").isin(terms: _*))
      .groupBy("__t").agg(count(lit(1)).as("__df"))
      .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
    val idf = terms.map { t =>
      val df = dfs.getOrElse(t, 0L)
      // bitlen(N+1) - bitlen(df+1), floored at 1 so present terms still count
      t -> math.max(1L,
        (64 - java.lang.Long.numberOfLeadingZeros(n + 1))
          - (64 - java.lang.Long.numberOfLeadingZeros(df + 1)).toLong)
    }.toMap
    (n, avg, idf)
  }

  /** Milli-unit integer BM25 of one term given its tf column. */
  private def termScore(tf: Column, len: Column, idf: Long, avg: Long): Column =
    when(tf > 0,
      idiv(lit(1000L * idf * 44L * avg) * tf,
        lit(20L * avg) * tf + lit(6L * avg) + lit(18L) * len))
      .otherwise(lit(0L))

  /** Score every document against `terms`: adds `score` (milli-units,
    * BIGINT) and per-term tf columns `tf_<term>`. Pure projection — term
    * occurrence counts are array scans over the token split; corpus stats
    * enter as plan literals.
    */
  def bm25(docs: DataFrame, terms: Seq[String], textCol: String = "text",
           scoreCol: String = "score"): DataFrame = {
    require(terms.nonEmpty && terms.size <= 32,
      s"bm25 is a few-term search primitive, got ${terms.size} terms")
    val (_, avg, idf) = corpusStats(docs, terms, textCol)
    val ts = toks(col(textCol))
    val len = size(ts).cast("long")
    val withTf = terms.foldLeft(docs) { (d, t) =>
      d.withColumn(s"tf_$t",
        size(filter(toks(col(textCol)), x => x === lit(t))).cast("long"))
    }
    val score = terms.map(t => termScore(col(s"tf_$t"), len, idf(t), avg))
      .reduce(_ + _)
    withTf.withColumn(scoreCol, score)
  }

  /** Field-weighted BM25 (BM25F — Robertson, Zaragoza & Taylor, CIKM 2004,
    * the "simple extension" form): per-term field tfs combine as
    * `tf' = Σ_f w_f·tf_f` and document length as `len' = Σ_f w_f·len_f`
    * BEFORE the saturation, so a weight-3 title hit saturates like three
    * body occurrences of one document rather than adding three
    * independently saturated scores (the known mistake of summing
    * per-field BM25s, which over-rewards spreading a term thinly across
    * fields). The formula is [[bm25]]'s milli-unit integer form on
    * (tf', len', weighted avg); idf's df counts documents where the term
    * appears in ANY field. Field weights are integer plan literals, so
    * every intermediate stays a BIGINT and the whole scorer is one
    * codegen'd projection — corpus stats enter as literals exactly as in
    * [[bm25]], whose single-field weight-1 case this reduces to verbatim
    * (RetrievalSpec law).
    */
  def bm25f(docs: DataFrame, fields: Seq[(String, Long)], terms: Seq[String],
            scoreCol: String = "score"): DataFrame = {
    require(terms.nonEmpty && terms.size <= 32,
      s"bm25f is a few-term search primitive, got ${terms.size} terms")
    require(fields.nonEmpty && fields.forall(_._2 >= 1),
      s"bm25f needs >= 1 fields with positive integer weights, got $fields")
    val wlen = fields.map { case (f, w) => size(toks(col(f))).cast("long") * w }
      .reduce(_ + _)
    val anyField = array_distinct(concat(
      fields.map { case (f, _) => toks(col(f)) }: _*))
    val stats = docs.select(wlen.as("__wl"), anyField.as("__ts"))
    val r = stats.agg(count(lit(1)).as("n"), sum("__wl").as("s")).head()
    val n = r.getLong(0)
    val avg = math.max(1L, r.getLong(1) / n)
    val dfs = stats.select(explode(col("__ts")).as("__t"))
      .filter(col("__t").isin(terms: _*))
      .groupBy("__t").agg(count(lit(1)).as("__df"))
      .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
    val idf = terms.map { t =>
      val df = dfs.getOrElse(t, 0L)
      t -> math.max(1L,
        (64 - java.lang.Long.numberOfLeadingZeros(n + 1))
          - (64 - java.lang.Long.numberOfLeadingZeros(df + 1)).toLong)
    }.toMap
    val withTf = terms.foldLeft(docs) { (d, t) =>
      d.withColumn(s"tf_$t",
        fields.map { case (f, w) =>
          size(filter(toks(col(f)), x => x === lit(t))).cast("long") * w
        }.reduce(_ + _))
    }
    val score = terms.map(t => termScore(col(s"tf_$t"), wlen, idf(t), avg))
      .reduce(_ + _)
    withTf.withColumn(scoreCol, score)
  }

  /** Ranked-retrieval evaluation — recall@k, precision@k, and MRR as exact
    * integers (basis points / micro-units; a float mean would not replay):
    * given a run (qid, rnk, doc_id) and relevance judgments (qid, doc_id),
    * emits per query the judged-relevant count, top-`k` hit count,
    * `recall_bp = 10000·hits div n_rel`, `precision_bp = 10000·hits div
    * k`, and `mrr_micro = 1000000 div first_relevant_rank` (0 when no
    * relevant doc reaches the cut). One row per judged query; queries
    * absent from the run score zero, never vanish.
    *
    * Scale shape: two keyed aggregates + one (qid, doc_id) equi-join —
    * runs are panels × k rows and qrels are judgment-sized, both tiny
    * next to any corpus that produced them.
    */
  def evalRanking(run: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    val nrel = qrels.groupBy("qid").agg(count(lit(1)).as("n_rel"))
    val hits = run.filter(col("rnk") <= k)
      .join(qrels, Seq("qid", "doc_id"))
      .groupBy("qid")
      .agg(count(lit(1)).as("hits"), min("rnk").cast("long").as("__first"))
    nrel.join(hits, Seq("qid"), "left")
      .select(col("qid"), col("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        expr("CAST(10000 * coalesce(hits, 0) div n_rel AS BIGINT)").as("recall_bp"),
        expr(s"CAST(10000 * coalesce(hits, 0) div $k AS BIGINT)").as("precision_bp"),
        coalesce(expr("CAST(1000000 div __first AS BIGINT)"), lit(0L)).as("mrr_micro"))
  }

  /** BM25 served ENTIRELY from an inverted index — the form a persistent
    * postings table (e.g. [[graft.streaming.PostingsIndex]]) answers with,
    * no document text in sight. Every statistic derives from the postings:
    * doc length = Σtf over the doc's rows (exact for the whitespace
    * tokenizer — every token lands in exactly one posting), N and avg from
    * the length frame, df_t = the term's posting count. Same milli-unit
    * integer formula as [[bm25]]; on a corpus where every doc tokenizes to
    * ≥ 1 term the two agree row-for-row (docs with no tokens have no
    * postings, so they are absent here where [[bm25]] scores them 0 — and
    * they can never reach a positive-score top-k either way).
    *
    * Scale shape: one doc-keyed shuffle for lengths; the per-term tf/df
    * side scans ONLY the query terms' postings (the `term IN` filter pushes
    * to the scan, which row-group-prunes on the stored term sort); corpus
    * stats are a 1-row and a |terms|-row collect — the [[corpusStats]]
    * metadata class.
    */
  def bm25FromIndex(postings: DataFrame, terms: Seq[String],
                    idCol: String = "doc_id",
                    scoreCol: String = "score"): DataFrame = {
    require(terms.nonEmpty && terms.size <= 32,
      s"bm25FromIndex is a few-term search primitive, got ${terms.size} terms")
    val lens = postings.groupBy(idCol)
      .agg(sum("tf").cast("long").as("__len"))
    val st = lens.agg(count(lit(1)).as("n"),
      coalesce(sum("__len"), lit(0L)).as("s")).head()
    val n = st.getLong(0)
    val avg = if (n == 0) 1L else math.max(1L, st.getLong(1) / n)
    val idf = idfMap(postings, terms, n)
    val qtf = queryTf(postings, terms, idCol)
    val joined = terms.foldLeft(lens.join(qtf, Seq(idCol), "left")) { (d, t) =>
      d.withColumn(s"tf_$t", coalesce(col(s"tf_$t"), lit(0L)))
    }
    val score = terms.map(t => termScore(col(s"tf_$t"), col("__len"), idf(t), avg))
      .reduce(_ + _)
    joined.withColumn(scoreCol, score)
      .withColumnRenamed("__len", "len")
  }

  /** bitlen(N+1) − bitlen(df+1), floored at 1 — the shared integer idf. */
  private def idfOf(n: Long, df: Long): Long =
    math.max(1L,
      (64 - java.lang.Long.numberOfLeadingZeros(n + 1))
        - (64 - java.lang.Long.numberOfLeadingZeros(df + 1)).toLong)

  /** Per-term idf from the query terms' postings only — an O(terms)-row
    * collect over a term-pruned scan.
    */
  private def idfMap(postings: DataFrame, terms: Seq[String],
                     n: Long): Map[String, Long] = {
    val dfs = postings.filter(col("term").isin(terms: _*))
      .groupBy("term").agg(count(lit(1)).as("__df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    terms.map(t => t -> idfOf(n, dfs.getOrElse(t, 0L))).toMap
  }

  /** Candidate docs' per-term tf pivot over the query terms' postings. */
  private def queryTf(postings: DataFrame, terms: Seq[String],
                      idCol: String): DataFrame =
    postings.filter(col("term").isin(terms: _*))
      .groupBy(col(idCol))
      .agg(sum(when(col("term") === terms.head, col("tf")).otherwise(0L))
             .cast("long").as(s"tf_${terms.head}"),
        terms.tail.map(t =>
          sum(when(col("term") === t, col("tf")).otherwise(0L))
            .cast("long").as(s"tf_$t")): _*)

  /** [[bm25FromIndex]] restricted to what a SERVING path may touch: the
    * query terms' postings slice, a per-doc length SIDECAR (one
    * (doc_id, len) row per indexed doc — [[graft.streaming.PostingsIndex]]
    * maintains it as additive batch partials), and the corpus totals
    * (`nDocs`, `sumLen`) as O(1) driver scalars. The full postings
    * relation is never aggregated: doc lengths come from the sidecar
    * joined on the CANDIDATE ids only (inner join — a doc holding none of
    * the query terms can never score positive, so the emitted relation is
    * exactly `bm25FromIndex(...).filter(` candidates `)`, score-0
    * long-doc candidates included). Same milli-unit integer formula.
    */
  def bm25FromSidecar(postings: DataFrame, lens: DataFrame,
                      nDocs: Long, sumLen: Long, terms: Seq[String],
                      idCol: String = "doc_id",
                      scoreCol: String = "score"): DataFrame = {
    require(terms.nonEmpty && terms.size <= 32,
      s"bm25FromSidecar is a few-term search primitive, got ${terms.size} terms")
    val avg = if (nDocs == 0) 1L else math.max(1L, sumLen / nDocs)
    val idf = idfMap(postings, terms, nDocs)
    val qtf = queryTf(postings, terms, idCol)
    val joined = qtf.join(
      lens.select(col(idCol), col("len").cast("long").as("__len")), Seq(idCol))
    val score = terms.map(t => termScore(col(s"tf_$t"), col("__len"), idf(t), avg))
      .reduce(_ + _)
    joined.withColumn(scoreCol, score)
      .withColumnRenamed("__len", "len")
  }

  /** Inverted-index build: the postings table (term, doc id, term
    * frequency) every lexical-retrieval system serves from. ONE token-keyed
    * shuffle with map-side partial counts — text never leaves the scan;
    * the index is a DataFrame, so it lands in a [[graft.write.VersionedTable]]
    * or bucketed-by-term parquet like any other table.
    */
  def invertedIndex(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame =
    docs.select(col(idCol), explode(toks(col(textCol))).as("term"))
      .groupBy(col("term"), col(idCol))
      .agg(count(lit(1)).as("tf"))

  /** Field-tagged inverted index: (term, doc id, field, tf), one relation
    * across all of `fields` — the postings shape BM25F serving needs,
    * because the field weights are SERVE-time parameters: storing per-field
    * tf lets one index answer any weighting, where a pre-weighted index
    * would bake one ranking in. One token-keyed shuffle per field (fields
    * are few and schema-fixed); text never leaves the scan.
    */
  def fieldedInvertedIndex(docs: DataFrame, fields: Seq[String],
                           idCol: String = "doc_id"): DataFrame = {
    require(fields.nonEmpty, "fieldedInvertedIndex needs >= 1 fields")
    fields.map { f =>
      docs.select(col(idCol), explode(toks(col(f))).as("term"))
        .groupBy(col("term"), col(idCol))
        .agg(count(lit(1)).as("tf"))
        .withColumn("field", lit(f))
    }.reduce(_ unionByName _)
  }

  /** Positional inverted index: (term, doc id, sorted positions array) —
    * the postings shape phrase and proximity queries serve from. Same ONE
    * token-keyed shuffle as [[invertedIndex]] (positions ride as ints,
    * text never leaves the scan); `tf` is implicit as the array length.
    */
  def positionalIndex(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame =
    docs.select(col(idCol), posexplode(toks(col(textCol))).as(Seq("pos", "term")))
      .groupBy(col("term"), col(idCol))
      .agg(sort_array(collect_list(col("pos"))).as("positions"))

  /** Minimal proximity window: per document containing ALL query terms,
    * the length of the smallest token span holding at least one
    * occurrence of each — the classic proximity feature between "bag of
    * words" (BM25) and "exact phrase" ([[phraseMatches]]): a doc where
    * the terms sit in one sentence should outrank one where they are
    * pages apart. Computed with the sorted sweep, not a positions cross
    * join: the query terms' postings explode to (doc, term, pos); at each
    * position the best window ENDING there starts at the minimum over
    * every term's LATEST occurrence so far (one conditional running max
    * per term over a single doc-keyed window), and the answer is the min
    * over ends — O(Σtf) rows through one keyed shuffle, independent of
    * how far apart the occurrences are. Docs missing any term are absent.
    */
  def minWindow(positional: DataFrame, terms: Seq[String],
                idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(terms.nonEmpty && terms.size <= 8,
      s"minWindow is a few-term proximity primitive, got ${terms.size} terms")
    val pos = positional.filter(col("term").isin(terms: _*))
      .select(col(idCol), col("term"), explode(col("positions")).as("pos"))
    val w = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lasts = terms.zipWithIndex.map { case (t, i) =>
      max(when(col("term") === t, col("pos"))).over(w).as(s"__l$i")
    }
    val swept = pos.select(Seq(col(idCol), col("pos")) ++ lasts: _*)
    val start = least(terms.indices.map(i => col(s"__l$i")): _*)
    val allSeen = terms.indices.map(i => col(s"__l$i").isNotNull).reduce(_ && _)
    swept.filter(allSeen)
      .select(col(idCol), (col("pos") - start + 1).cast("long").as("win"))
      .groupBy(idCol).agg(min("win").as("min_window"))
  }

  /** Exact phrase search over a positional index: docs containing the words
    * of `phrase` at consecutive positions, with the match count. Each term's
    * postings are shifted so every term of one phrase occurrence aligns on
    * its start position, then the start sets intersect pairwise — the
    * textbook positional-merge, as |phrase|−1 equi-joins on the doc id over
    * TERM-FILTERED postings (each side is one word's posting list, pruned
    * at the scan by the pushed `term =` predicate — never the full index).
    * At corpus scale the joins co-locate if the index is bucketed by the
    * id; match arithmetic is per-row array work.
    */
  def phraseMatches(index: DataFrame, phrase: Seq[String],
                    idCol: String = "doc_id"): DataFrame = {
    require(phrase.nonEmpty, "phraseMatches needs at least one word")
    val steps = phrase.zipWithIndex.map { case (t, i) =>
      index.filter(col("term") === t)
        .select(col(idCol), transform(col("positions"), p => p - i).as(s"__p$i"))
    }
    val aligned = steps.zipWithIndex.reduceLeft[(DataFrame, Int)] {
      case ((acc, ai), (step, si)) =>
        (acc.join(step, idCol)
          .select(col(idCol),
            array_intersect(col(s"__p$ai"), col(s"__p$si")).as(s"__p$si")), si)
    }._1
    aligned
      .select(col(idCol), size(col(s"__p${phrase.length - 1}")).cast("long").as("n_matches"))
      .filter(col("n_matches") > 0)
  }

  /** Per-term top-k postings by (tf desc, id asc) — the impact-ordered
    * truncation (champion lists) that caps what a query must read per term.
    * Runs on the custom [[graft.plans.TopKPerKey]] operator: partial
    * bounded heaps per mapper, ≤ k×terms×mappers candidate rows on the
    * shuffle, no sort of the full postings; the rank window after it sees
    * k-sized groups already clustered by term, so it adds no exchange.
    */
  def topPostings(postings: DataFrame, k: Int,
                  idCol: String = "doc_id"): DataFrame = {
    val topk = graft.ops.TopK.topKPerKey(postings, Seq("term"),
      Seq(col("tf").desc, col(idCol).asc), k)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("term").orderBy(col("tf").desc, col(idCol))
    topk.withColumn("rnk", row_number().over(w).cast("long"))
  }

  /** Hybrid retrieval: BM25 lexical ranks fused with quantized-dot semantic
    * ranks by reciprocal-rank fusion — the standard two-retriever serving
    * shape (keyword recall + embedding recall, neither alone suffices).
    * RRF in integer milli-units: `1000000 DIV (60 + rank)` per list, summed;
    * a doc missing from a list contributes 0 from it. k=60 is the canonical
    * RRF constant; integer DIV keeps the fused score value-exact on any
    * engine where float 1/(60+r) sums would not be guaranteed associative.
    *
    * Scale shape: each side ends in a global top-`kEach` — Spark compiles
    * `orderBy(...).limit(k)` to TakeOrderedAndProject (bounded per-partition
    * heaps + one k-row merge, no full sort). The rank windows and the
    * full-outer fusion join then run over two ≤ kEach-row frames —
    * metadata-sized, broadcast by AQE. The corpus is scanned twice (once
    * per modality), shuffled never.
    *
    * The semantic query enters as a literal int8 code (one bounded 1-row
    * lookup): scoring is a pure codegen'd projection via
    * [[Similarity.int8Dot]], the q83 rerank contract.
    */
  def hybridRrf(docs: DataFrame, emb: DataFrame, terms: Seq[String],
                queryVecId: Long, kEach: Int = 50, kOut: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rrf = (rnk: Column) =>
      coalesce(idiv(lit(1000000L), lit(60L) + rnk), lit(0L))

    val lexRnk = graft.ops.TopK.rankedCut(
        bm25(docs, terms).filter(col("score") > 0)
          .select(col("doc_id"), col("score")),
        kEach, "lex_rnk", col("score").desc, col("doc_id"))
      .select("doc_id", "lex_rnk")

    val cz = Similarity.quantizeInt8(emb)
    val qRows = cz.filter(col("vec_id") === queryVecId)
      .select("qcode").collect()
    require(qRows.length == 1, s"query vec_id=$queryVecId must match exactly one vector")
    val qcode = qRows.head.getSeq[Byte](0)
    val semRnk = graft.ops.TopK.rankedCut(
        cz.withColumn("dot", Similarity.int8Dot(col("qcode"), typedlit(qcode)))
          .select(col("vec_id").as("doc_id"), col("dot")),
        kEach, "sem_rnk", col("dot").desc, col("doc_id"))
      .select("doc_id", "sem_rnk")

    lexRnk.join(semRnk, Seq("doc_id"), "full_outer")
      .withColumn("rrf", rrf(col("lex_rnk")) + rrf(col("sem_rnk")))
      .orderBy(col("rrf").desc, col("doc_id")).limit(kOut)
  }

  // q119: BM25 top-25 for the query {spark, merge, dup} — "dup" is the rare
  // high-idf term (26 occurrences corpus-wide vs ~900 for the others), so
  // ranking is dominated by genuine idf contrast, not noise. Deterministic
  // total order: (score desc, doc_id asc). The oracle replays the integer
  // formula with scalar-subquery stats; every intermediate is a BIGINT.
  val queries: Seq[Q] = Seq(

    // Exact phrase search through the positional index: docs where 'table'
    // is immediately followed by 'part', with match counts — the oracle
    // recomputes via a position self-join over the exploded token stream
    // (same multiset, different idiom). The corpus is uniform word salad,
    // so the phrase hits a meaningful subset, not everything/nothing.
    Q("q133_phrase_search",
      """WITH w AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS term,
        |    generate_subscripts(list_filter(string_split_regex(text, '\s+'),
        |                                    x -> x <> ''), 1) AS pos
        |  FROM documents)
        |SELECT a.doc_id AS doc_id, CAST(count(1) AS BIGINT) AS n_matches
        |FROM w a JOIN w b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |WHERE a.term = 'table' AND b.term = 'part'
        |GROUP BY a.doc_id
        |ORDER BY n_matches DESC, a.doc_id LIMIT 25""".stripMargin) { (s, d) =>
      val idx = positionalIndex(Tables.documents(s, d).select("doc_id", "text"))
      phraseMatches(idx, Seq("table", "part"))
        .orderBy(col("n_matches").desc, col("doc_id"))
        .limit(25)
    },

    // Minimal proximity window for {spark, merge, dup} over the positional
    // index: the sorted sweep (conditional running max per term, min over
    // window ends) replayed in SQL with the same three running-max
    // windows — any off-by-one in the sweep, a missed doc, or a phantom
    // doc missing a term hash-fails. Only docs holding all three terms
    // appear (both engines agree structurally).
    Q("q273_min_window",
      """WITH w AS (
        |  SELECT doc_id, term, CAST(pos - 1 AS BIGINT) AS pos FROM (
        |    SELECT doc_id,
        |      unnest(list_filter(string_split_regex(text, '[ \t\n\f\r]+'), x -> x <> '')) AS term,
        |      generate_subscripts(list_filter(string_split_regex(text, '[ \t\n\f\r]+'),
        |                                      x -> x <> ''), 1) AS pos
        |    FROM documents) q
        |  WHERE term IN ('spark', 'merge', 'dup')),
        | l AS (
        |  SELECT doc_id, pos,
        |    max(CASE WHEN term = 'spark' THEN pos END)
        |      OVER (PARTITION BY doc_id ORDER BY pos) AS l0,
        |    max(CASE WHEN term = 'merge' THEN pos END)
        |      OVER (PARTITION BY doc_id ORDER BY pos) AS l1,
        |    max(CASE WHEN term = 'dup' THEN pos END)
        |      OVER (PARTITION BY doc_id ORDER BY pos) AS l2
        |  FROM w)
        |SELECT doc_id, CAST(min(pos - least(l0, l1, l2) + 1) AS BIGINT) AS min_window
        |FROM l
        |WHERE l0 IS NOT NULL AND l1 IS NOT NULL AND l2 IS NOT NULL
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val idx = positionalIndex(Tables.documents(s, d).select("doc_id", "text"))
      minWindow(idx, Seq("spark", "merge", "dup"))
        .orderBy("doc_id")
    },

    Q("q119_bm25",
      """WITH d AS (
        |  SELECT doc_id, lang,
        |         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        | st AS (
        |  SELECT count(1) AS n, CAST(sum(len(ws)) AS BIGINT) AS s FROM d),
        | av AS (SELECT greatest(1, s // n) AS avg, n FROM st),
        | df AS (
        |  SELECT
        |    (SELECT count(1) FROM d WHERE list_contains(ws, 'spark')) AS df_spark,
        |    (SELECT count(1) FROM d WHERE list_contains(ws, 'merge')) AS df_merge,
        |    (SELECT count(1) FROM d WHERE list_contains(ws, 'dup')) AS df_dup),
        | idf AS (
        |  SELECT
        |    greatest(1, length(bin(n + 1)) - length(bin(df_spark + 1))) AS i_spark,
        |    greatest(1, length(bin(n + 1)) - length(bin(df_merge + 1))) AS i_merge,
        |    greatest(1, length(bin(n + 1)) - length(bin(df_dup + 1))) AS i_dup
        |  FROM df CROSS JOIN av),
        | tf AS (
        |  SELECT doc_id, lang, CAST(len(ws) AS BIGINT) AS len,
        |    CAST(len(list_filter(ws, x -> x = 'spark')) AS BIGINT) AS tf_spark,
        |    CAST(len(list_filter(ws, x -> x = 'merge')) AS BIGINT) AS tf_merge,
        |    CAST(len(list_filter(ws, x -> x = 'dup')) AS BIGINT) AS tf_dup
        |  FROM d),
        | sc AS (
        |  SELECT doc_id, lang, len, tf_spark, tf_merge, tf_dup,
        |    (CASE WHEN tf_spark > 0 THEN
        |       (1000 * i_spark * 44 * avg * tf_spark)
        |         // (20 * avg * tf_spark + 6 * avg + 18 * len) ELSE 0 END
        |   + CASE WHEN tf_merge > 0 THEN
        |       (1000 * i_merge * 44 * avg * tf_merge)
        |         // (20 * avg * tf_merge + 6 * avg + 18 * len) ELSE 0 END
        |   + CASE WHEN tf_dup > 0 THEN
        |       (1000 * i_dup * 44 * avg * tf_dup)
        |         // (20 * avg * tf_dup + 6 * avg + 18 * len) ELSE 0 END) AS score
        |  FROM tf CROSS JOIN idf CROSS JOIN av)
        |SELECT doc_id, lang, len, tf_spark, tf_merge, tf_dup, score
        |FROM sc ORDER BY score DESC, doc_id LIMIT 25""".stripMargin) { (s, d) =>
      bm25(Tables.documents(s, d).select("doc_id", "lang", "text"),
          Seq("spark", "merge", "dup"))
        .select(col("doc_id"), col("lang"),
          size(toks(col("text"))).cast("long").as("len"),
          col("tf_spark"), col("tf_merge"), col("tf_dup"), col("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(25)
    },

    // q120: champion lists — the top-3 postings of every term by
    // (tf desc, doc_id asc), through the TopKPerKey operator. The oracle
    // replays the identical window; (term, rnk) is a total order.
    Q("q120_inverted_index",
      """WITH p AS (
        |  SELECT g AS term, doc_id, CAST(count(1) AS BIGINT) AS tf
        |  FROM (SELECT doc_id,
        |               unnest(list_filter(string_split_regex(text, '\s+'),
        |                                  x -> x <> '')) AS g
        |        FROM documents)
        |  GROUP BY 1, 2),
        | r AS (
        |  SELECT term, doc_id, tf,
        |         CAST(row_number() OVER (PARTITION BY term
        |              ORDER BY tf DESC, doc_id) AS BIGINT) AS rnk
        |  FROM p)
        |SELECT term, rnk, doc_id, tf FROM r WHERE rnk <= 3
        |ORDER BY term, rnk""".stripMargin) { (s, d) =>
      topPostings(
          invertedIndex(Tables.documents(s, d).select("doc_id", "text")), k = 3)
        .select(col("term"), col("rnk"), col("doc_id"), col("tf"))
        .orderBy("term", "rnk")
    },

    // q123: hybrid search — q119's lexical top-50 fused with the semantic
    // top-50 for query vector 0 by integer RRF. The oracle replays both
    // rank lists (the q119 integer BM25, the q112-style int8 quantization
    // with an exact integer dot) and the DIV fusion; a single rank swap on
    // either side changes the fused order and hash-fails.
    Q("q123_hybrid_rrf",
      """WITH d AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        | st AS (
        |  SELECT count(1) AS n, CAST(sum(len(ws)) AS BIGINT) AS s FROM d),
        | av AS (SELECT greatest(1, s // n) AS avg, n FROM st),
        | df AS (
        |  SELECT
        |    (SELECT count(1) FROM d WHERE list_contains(ws, 'spark')) AS df_spark,
        |    (SELECT count(1) FROM d WHERE list_contains(ws, 'merge')) AS df_merge,
        |    (SELECT count(1) FROM d WHERE list_contains(ws, 'dup')) AS df_dup),
        | idf AS (
        |  SELECT
        |    greatest(1, length(bin(n + 1)) - length(bin(df_spark + 1))) AS i_spark,
        |    greatest(1, length(bin(n + 1)) - length(bin(df_merge + 1))) AS i_merge,
        |    greatest(1, length(bin(n + 1)) - length(bin(df_dup + 1))) AS i_dup
        |  FROM df CROSS JOIN av),
        | tf AS (
        |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS len,
        |    CAST(len(list_filter(ws, x -> x = 'spark')) AS BIGINT) AS tf_spark,
        |    CAST(len(list_filter(ws, x -> x = 'merge')) AS BIGINT) AS tf_merge,
        |    CAST(len(list_filter(ws, x -> x = 'dup')) AS BIGINT) AS tf_dup
        |  FROM d),
        | sc AS (
        |  SELECT doc_id,
        |    (CASE WHEN tf_spark > 0 THEN
        |       (1000 * i_spark * 44 * avg * tf_spark)
        |         // (20 * avg * tf_spark + 6 * avg + 18 * len) ELSE 0 END
        |   + CASE WHEN tf_merge > 0 THEN
        |       (1000 * i_merge * 44 * avg * tf_merge)
        |         // (20 * avg * tf_merge + 6 * avg + 18 * len) ELSE 0 END
        |   + CASE WHEN tf_dup > 0 THEN
        |       (1000 * i_dup * 44 * avg * tf_dup)
        |         // (20 * avg * tf_dup + 6 * avg + 18 * len) ELSE 0 END) AS score
        |  FROM tf CROSS JOIN idf CROSS JOIN av),
        | lexr AS (
        |  SELECT doc_id,
        |         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rnk
        |  FROM sc WHERE score > 0 ORDER BY score DESC, doc_id LIMIT 50),
        | qz AS (
        |  SELECT vec_id,
        |    CASE WHEN smax = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |         ELSE list_transform(v, x -> CAST(round(x / smax * 127) AS BIGINT))
        |    END AS code
        |  FROM (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS smax
        |        FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings))),
        | qv AS (SELECT code FROM qz WHERE vec_id = 0),
        | dots AS (
        |  SELECT z.vec_id AS doc_id, CAST(SUM(z.code[t.i] * q.code[t.i]) AS BIGINT) AS dot
        |  FROM qz z CROSS JOIN qv q CROSS JOIN range(1, 65) t(i)
        |  GROUP BY 1),
        | semr AS (
        |  SELECT doc_id,
        |         CAST(row_number() OVER (ORDER BY dot DESC, doc_id) AS BIGINT) AS sem_rnk
        |  FROM dots ORDER BY dot DESC, doc_id LIMIT 50)
        |SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id, l.lex_rnk, s.sem_rnk,
        |       (COALESCE(1000000 // (60 + l.lex_rnk), 0)
        |        + COALESCE(1000000 // (60 + s.sem_rnk), 0)) AS rrf
        |FROM lexr l FULL OUTER JOIN semr s ON l.doc_id = s.doc_id
        |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin) { (s, d) =>
      hybridRrf(Tables.documents(s, d).select("doc_id", "text"),
        Tables.embeddings(s, d).select("vec_id", "embedding"),
        Seq("spark", "merge", "dup"), queryVecId = 0L)
    },

    // Field-weighted BM25F: body (weight 1) + a planted title field
    // (weight 3) where every 11th doc's title carries 'zebra' — a term
    // the organic corpus lacks, so its idf and every hit come from the
    // title channel alone, while 'merge' scores through the body. The
    // oracle replays the weighted tf/length combination, the any-field
    // df, and the milli-unit saturation; a per-field-sum implementation
    // (saturate-then-add) would shift every zebra score and hash-fail.
    Q("q285_bm25f",
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS bs,
        |    list_filter(string_split_regex(
        |      CASE WHEN doc_id % 11 = 0 THEN 'zebra guide' ELSE 'plain guide' END,
        |      '\s+'), x -> x <> '') AS ts2
        |  FROM documents),
        | w AS (SELECT doc_id, bs, ts2,
        |         CAST(len(bs) + 3 * len(ts2) AS BIGINT) AS wlen FROM d),
        | st AS (SELECT count(1) AS n, CAST(sum(wlen) AS BIGINT) AS s FROM w),
        | av AS (SELECT greatest(1, s // n) AS avg, n FROM st),
        | df AS (
        |  SELECT
        |    (SELECT count(1) FROM d
        |     WHERE list_contains(bs, 'zebra') OR list_contains(ts2, 'zebra')) AS df_z,
        |    (SELECT count(1) FROM d
        |     WHERE list_contains(bs, 'merge') OR list_contains(ts2, 'merge')) AS df_m),
        | idf AS (
        |  SELECT greatest(1, length(bin(n + 1)) - length(bin(df_z + 1))) AS i_z,
        |         greatest(1, length(bin(n + 1)) - length(bin(df_m + 1))) AS i_m
        |  FROM df CROSS JOIN av),
        | tf AS (
        |  SELECT doc_id, wlen,
        |    CAST(len(list_filter(bs, x -> x = 'zebra'))
        |         + 3 * len(list_filter(ts2, x -> x = 'zebra')) AS BIGINT) AS tf_zebra,
        |    CAST(len(list_filter(bs, x -> x = 'merge'))
        |         + 3 * len(list_filter(ts2, x -> x = 'merge')) AS BIGINT) AS tf_merge
        |  FROM w),
        | sc AS (
        |  SELECT doc_id, tf_zebra, tf_merge,
        |    (CASE WHEN tf_zebra > 0 THEN
        |       (1000 * i_z * 44 * avg * tf_zebra)
        |         // (20 * avg * tf_zebra + 6 * avg + 18 * wlen) ELSE 0 END
        |   + CASE WHEN tf_merge > 0 THEN
        |       (1000 * i_m * 44 * avg * tf_merge)
        |         // (20 * avg * tf_merge + 6 * avg + 18 * wlen) ELSE 0 END) AS score
        |  FROM tf CROSS JOIN idf CROSS JOIN av)
        |SELECT doc_id, tf_zebra, tf_merge, score FROM sc
        |ORDER BY score DESC, doc_id LIMIT 25""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"),
        when(col("doc_id") % 11 === 0, "zebra guide")
          .otherwise("plain guide").as("title"))
      bm25f(docs, Seq("title" -> 3L, "text" -> 1L), Seq("zebra", "merge"))
        .select("doc_id", "tf_zebra", "tf_merge", "score")
        .orderBy(col("score").desc, col("doc_id")).limit(25)
    },

    // Retrieval evaluation end to end: two single-term BM25 runs (top-10)
    // scored against derived judgments (tf ≥ 3 = relevant), with recall/
    // precision in basis points and MRR in micro-units — all integral
    // divides, so the metric table is value-exact. The oracle re-derives
    // BOTH runs (full q119 arithmetic per query) AND the judgments AND
    // the metric arithmetic; a one-position rank slip anywhere moves a
    // metric integer and fails the hash.
    Q("q288_retrieval_eval", {
      val terms = Seq("merge", "hash")
      val perTerm = terms.map { t =>
        s"""
 df_$t AS (SELECT (SELECT count(1) FROM d WHERE list_contains(ws, '$t')) AS df),
 idf_$t AS (SELECT greatest(1, length(bin(n + 1)) - length(bin(df + 1))) AS idf
            FROM df_$t CROSS JOIN av),
 r_$t AS (
  SELECT '$t' AS qid, doc_id,
    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
  FROM (
    SELECT doc_id,
      CASE WHEN tf > 0 THEN
        (1000 * idf * 44 * avg * tf) // (20 * avg * tf + 6 * avg + 18 * len)
      ELSE 0 END AS score
    FROM (SELECT doc_id, CAST(len(ws) AS BIGINT) AS len,
            CAST(len(list_filter(ws, x -> x = '$t')) AS BIGINT) AS tf FROM d)
    CROSS JOIN idf_$t CROSS JOIN av)
  ORDER BY score DESC, doc_id LIMIT 10),
 q_$t AS (SELECT '$t' AS qid, doc_id FROM d
          WHERE len(list_filter(ws, x -> x = '$t')) >= 3)"""
      }.mkString(",")
      s"""WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
  FROM documents),
 st AS (SELECT count(1) AS n, CAST(sum(len(ws)) AS BIGINT) AS s FROM d),
 av AS (SELECT greatest(1, s // n) AS avg, n FROM st),$perTerm,
 run AS (${terms.map(t => s"SELECT * FROM r_$t").mkString(" UNION ALL ")}),
 qr AS (${terms.map(t => s"SELECT * FROM q_$t").mkString(" UNION ALL ")}),
 nrel AS (SELECT qid, CAST(count(1) AS BIGINT) AS n_rel FROM qr GROUP BY 1),
 h AS (SELECT r.qid, CAST(count(1) AS BIGINT) AS hits,
         CAST(min(rnk) AS BIGINT) AS first_rel
       FROM run r JOIN qr USING (qid, doc_id) GROUP BY 1)
SELECT n.qid, n.n_rel, coalesce(h.hits, 0) AS hits,
  CAST(10000 * coalesce(h.hits, 0) // n.n_rel AS BIGINT) AS recall_bp,
  CAST(10000 * coalesce(h.hits, 0) // 10 AS BIGINT) AS precision_bp,
  CAST(coalesce(1000000 // h.first_rel, 0) AS BIGINT) AS mrr_micro
FROM nrel n LEFT JOIN h USING (qid) ORDER BY n.qid"""
    }) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val terms = Seq("merge", "hash")
      val run = terms.map { t =>
        graft.ops.TopK.rankedCut(bm25(docs, Seq(t)), 10, "rnk",
            col("score").desc, col("doc_id"))
          .select(lit(t).as("qid"), col("doc_id"), col("rnk"))
      }.reduce(_ unionByName _)
      val qrels = terms.map { t =>
        docs.filter(size(filter(toks(col("text")), x => x === lit(t))) >= 3)
          .select(lit(t).as("qid"), col("doc_id"))
      }.reduce(_ unionByName _)
      evalRanking(run, qrels, k = 10).orderBy("qid")
    },
  )
}

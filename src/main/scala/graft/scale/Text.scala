package graft.scale

import graft.core.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, document fingerprinting. All are
  * native column expressions (whole-stage-codegen'd, no UDFs) so they scan
  * 100 TB of documents at parquet-read speed.
  */
object Text {

  /** Whitespace tokenization ([[graft.expressions.Ws]] set — RE2 `\s`, so
    * the oracle's `string_split_regex(text, '\s+')` sees identical words
    * even on `\v`-bearing text, which Java `\s` would also split on).
    */
  def tokens(text: Column): Column = split(text, graft.expressions.Ws.Regex)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-word segmentation: split on word/digit/punctuation
    * boundaries (the usual pre-tokenizer shape), count pieces.
    */
  def bpeIshTokenCount(text: Column): Column =
    size(filter(split(text, """(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])"""), t => length(t) > 0))

  /** Word n-gram shingles: ["a b c d"] with n=3 -> ["a b c", "b c d"].
    * Implemented with sequence+transform over the token array — no explode
    * until the caller wants one. (Measured: slice+array_join beats a
    * concat_ws-of-element_at formulation ~3x, and ANSI mode faults
    * element_at past the end anyway.)
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => array_join(slice(toks, i + 1, lit(n)), " "))
  }

  /** Character n-grams of the lowercased text (the usual language-ID basis). */
  def charNgrams(text: Column, n: Int): Column = {
    val t = lower(text)
    transform(
      sequence(lit(1), greatest(length(t) - (n - 1), lit(1))),
      i => t.substr(i, lit(n)))
  }

  /** Quality-scoring signals (ratios in [0,1], per-row exact arithmetic). */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, """[\p{Punct}]""", ""))).cast("double") /
      greatest(length(text), lit(1))

  def digitRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[0-9]", ""))).cast("double") /
      greatest(length(text), lit(1))

  def upperRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[A-Z]", ""))).cast("double") /
      greatest(length(text), lit(1))

  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(lower(text))
    size(filter(toks, t => t.isInCollection(stopwords))).cast("double") /
      greatest(size(toks), lit(1))
  }

  /** Composite quality score in [0,1]: long-enough, word-like, not shouty,
    * not digit soup. Weights follow common web-text quality filters.
    */
  def qualityScore(text: Column): Column = {
    val lengthOk = least(length(text).cast("double") / 200d, lit(1d))
    val wordish  = lit(1d) - punctRatio(text)
    val calm     = lit(1d) - upperRatio(text)
    val prose    = lit(1d) - digitRatio(text)
    round(lengthOk * 0.25 + wordish * 0.25 + calm * 0.25 + prose * 0.25, 6)
  }

  /** 64-bit content fingerprint of normalized text (xxhash64 — codegen'd).
    * Normalization: lowercase, collapse whitespace.
    */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(text), graft.expressions.Ws.Regex, " "))

  /** Rolling-hash content-defined chunk fingerprints (Rabin–Karp window +
    * boundary mask) — the fuzzy-dedup primitive: shared fingerprints between
    * docs witness shared content regions even after insertions/deletions.
    * Native kernel ([[graft.expressions.RollingChunks]]).
    */
  def rollingChunks(text: Column, window: Int = 16, boundaryBits: Int = 6,
                    maxChunk: Int = 512): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.RollingChunks(
        org.apache.spark.sql.GraftColumnBridge.expression(text),
        window, boundaryBits, maxChunk))

  /** Chunk-overlap near-dup pairs: explode each doc's rolling-hash chunk
    * fingerprints, self-join on fingerprint equality, keep pairs sharing at
    * least `minShared` chunks. Hot-fingerprint bound: a boilerplate chunk
    * (license header, nav bar) shared by m docs would alone contribute
    * m(m-1)/2 join rows, and a ubiquitous chunk carries no near-dup signal
    * anyway — it is the chunk-level analogue of a stopword. Fingerprints
    * with frequency above `maxDf` are dropped before pairing; the window
    * shuffles on the same fp key the join needs anyway.
    */
  def chunkOverlapPairs(corpus: DataFrame, minShared: Int = 3, maxDf: Int = -1,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // maxDf <= 0 resolves to max(50, 1% of the corpus): the stopword-chunk
    // cutoff then grows with the corpus instead of silently reclassifying
    // rare-ish shared blocks as boilerplate at larger SFs (cross-sf results
    // stay comparable; the resolved value is deterministic from row count).
    val df = if (maxDf > 0) maxDf else math.max(50L, (corpus.count() + 99L) / 100L)
    val chunks = corpus.select(col(idCol),
      explode(rollingChunks(col(textCol))).as("fp"))
    val bounded = chunks
      .withColumn("__df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .filter(col("__df") <= df).drop("__df")
    bounded.as("a").join(bounded.as("b"),
        col("a.fp") === col("b.fp") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .agg(count(lit(1)).as("shared_chunks"))
      .filter(col("shared_chunks") >= minShared)
  }

  /** Language-ID by character-trigram profile voting: each language gets a
    * small set of highly characteristic trigrams/stopwords; the language with
    * the most hits wins, 'und' (undetermined) on zero hits. A real deployment
    * would load bigger profiles; the operator shape (scored struct array →
    * array_max) is the scalable part — one projection, no shuffle, no UDF.
    */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " is ", "ing "),
    "de" -> Seq(" der ", " und ", " die ", " ist ", "sch"),
    "fr" -> Seq(" le ", " et ", " les ", " est ", " une "),
    "es" -> Seq(" el ", " los ", " es ", " una ", "ción"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Score against pre-padded lowercase text (see [[langId]]). Callers that
    * can should materialize the padded column once (`withColumn`) and use
    * this form: the padded subexpression is probed by all 25 markers, and
    * inlining it repeats the lower+concat per probe (measured ~5x slower).
    */
  def langIdFrom(padded: Column): Column = {
    val scored = langProfiles.toSeq.sortBy(_._1).map { case (lang, marks) =>
      val score = marks.map(m => when(padded.contains(m), 1).otherwise(0))
        .reduce(_ + _)
      struct(score.as("score"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Lowercase + space-pad `text` for [[langIdFrom]]. */
  def langPad(text: Column): Column = concat(lit(" "), lower(text), lit(" "))

  def langId(text: Column): Column = langIdFrom(langPad(text))

  /** Native single-pass forms of [[langId]] / [[qualityScore]] and q22's
    * token statistics (see [[graft.expressions.TextKernels]]); the column
    * forms above remain the semantic reference the specs compare against.
    */
  def langIdNative(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.LangIdNative(
        org.apache.spark.sql.GraftColumnBridge.expression(text)))

  def qualityScoreNative(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.QualityScoreNative(
        org.apache.spark.sql.GraftColumnBridge.expression(text)))

  def tokenStats(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.TokenStats(
        org.apache.spark.sql.GraftColumnBridge.expression(text)))

  // ---- DuckDB oracle replicas ---------------------------------------------

  /** DuckDB expression computing the best (score, lang) pair for `t`, as the
    * string score||lang — scores are <= 5 (single digit), so string order
    * == struct(score, lang) order and ties pick the greatest label, exactly
    * like [[langIdFrom]]'s array_max and the byte kernel's `>=` update. The
    * marker `contains` probes run against ' '||lower(t)||' ' exactly as the
    * engine pads. Valid on ASCII corpora (the driver tables are — the byte
    * kernel ASCII-folds case while lower() folds Unicode).
    */
  def langIdBestSql(t: String): String = {
    val pad = s"(' ' || lower($t) || ' ')"
    val scored = langProfiles.toSeq.sortBy(_._1).map { case (lang, marks) =>
      val score = marks.map(m => s"contains($pad, '$m')::INT").mkString(" + ")
      s"($score)::VARCHAR || '$lang'"
    }
    s"greatest(${scored.mkString(", ")})"
  }

  /** DuckDB expression for [[qualityScore]] over ASCII text: RE2's
    * [[:punct:]] / [A-Z] / [0-9] classes count the same bytes the native
    * kernel counts, and round(x, 6) agrees with the kernel's
    * BigDecimal HALF_UP on these ratio sums (verified value-exact on the
    * driver corpora).
    */
  def qualityScoreSql(t: String): String =
    s"""round(least(length($t) / 200.0, 1.0) * 0.25
       | + (1 - (length($t) - length(regexp_replace($t, '[[:punct:]]', '', 'g'))) / greatest(length($t), 1)::DOUBLE) * 0.25
       | + (1 - (length($t) - length(regexp_replace($t, '[A-Z]', '', 'g'))) / greatest(length($t), 1)::DOUBLE) * 0.25
       | + (1 - (length($t) - length(regexp_replace($t, '[0-9]', '', 'g'))) / greatest(length($t), 1)::DOUBLE) * 0.25, 6)""".stripMargin

  // ---- declared queries ----------------------------------------------------

  val queries: Seq[Q] = Seq(

    // Token counting + length stats per document.
    Q("q20_text_stats",
      """SELECT doc_id, length(text) AS len, len(string_split(text, ' ')) AS n_tokens,
        | len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        length(col("text")).as("len"),
        size(split(col("text"), " ")).as("n_tokens"),
        size(array_distinct(split(col("text"), " "))).as("n_distinct_tokens"))
        .orderBy("doc_id")
    },

    // Language/source distribution with length aggregates.
    Q("q21_lang_stats",
      """SELECT lang, count(1) AS n_docs, round(avg(n_chars), 2) AS avg_chars,
        | min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.documents(s, d).groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          round(avg("n_chars"), 2).as("avg_chars"),
          min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
        .orderBy("lang")
    },

    // Per-document quality signals (per-row exact math → raw doubles).
    Q("q22_doc_quality",
      """SELECT doc_id,
        | len(string_split(text, ' ')) AS n_tokens,
        | CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
        |   / len(string_split(text, ' ')) AS avg_token_len,
        | CAST(len(list_filter(string_split(text, ' '),
        |        t -> t IN ('a', 'the', 'of'))) AS DOUBLE)
        |   / len(string_split(text, ' ')) AS stopword_ratio
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      // one native pass computes all three stats (the split-based column
      // form repeated the tokenization four times; see TextKernels)
      Tables.documents(s, d)
        .select(col("doc_id"), tokenStats(col("text")).as("__st"))
        .select(col("doc_id"), col("__st.n_tokens").as("n_tokens"),
          col("__st.avg_token_len").as("avg_token_len"),
          col("__st.stopword_ratio").as("stopword_ratio"))
        .orderBy("doc_id")
    },

    // Content fingerprint via md5 (oracle-matched; the engine's internal
    // fingerprint is xxhash64, see Text.fingerprint).
    Q("q23_fingerprint",
      """SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id""") { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), md5(col("text")).as("fp"))
        .orderBy("doc_id")
    },

    // F9-adjacent — token counting two ways, both oracled: whitespace words
    // and alphanumeric-run tokens (the BPE-ish pre-tokenizer's run count).
    Q("q65_token_counts",
      """SELECT doc_id,
        | len(string_split_regex(trim(text), '\s+')) AS n_words,
        | length(regexp_replace(text, '[^a-zA-Z0-9]+', '', 'g')) AS n_alnum_chars
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        size(split(trim(col("text")), graft.expressions.Ws.Regex)).as("n_words"),
        length(regexp_replace(col("text"), "[^a-zA-Z0-9]+", "")).as("n_alnum_chars"))
        .orderBy("doc_id")
    },

    // Rolling-hash CDC fuzzy dedup, driver-certified on its deterministic
    // subset: planted copies share the original text as an unchanged PREFIX
    // (a marker suffix is appended), so every complete chunk of the original
    // except the tail re-synchronizes — any original with >= 2 chunks MUST
    // share >= 1 fingerprint with its copy. The oracle enumerates planted
    // pairs whose original is long enough to chunk at least twice (>= 300
    // chars: the worst one-chunk document across every driver SF is 233
    // chars); the pipeline — explode -> df-bound -> fingerprint self-join,
    // short keys only, text never shuffles — must recover each of them.
    // Unlike the LSH gates this capture is content-determined, not
    // probabilistic: chunk boundaries are a pure function of the bytes. The
    // one interaction to watch is the maxDf stopword-chunk bound — planted
    // copies duplicate each fingerprint exactly twice, far under the
    // resolved cutoff (>= 50), so the bound can only bite if the BASE corpus
    // itself mass-duplicates a chunk, which the driver generator does not.
    // Mid-document-edit resynchronization (the splice case, where the
    // shared-chunk count is boundary-dependent and no SQL oracle can predict
    // it) is locked by TextSpec instead.
    Q("q66_rolling_neardup",
      """SELECT doc_id AS doc_a, doc_id + 300000 AS doc_b, length(text) AS n_chars
        |FROM documents WHERE doc_id % 13 = 0 AND length(text) >= 300
        |ORDER BY doc_a""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val mutated = docs.filter(col("doc_id") % 13 === 0)
        .withColumn("doc_id", col("doc_id") + 300000)
        .withColumn("text", concat(col("text"), lit(" [APPENDIX] "), expr("repeat('x', 100)")))
      val corpus = docs.unionByName(mutated)
      val recovered = chunkOverlapPairs(corpus, minShared = 1)
        .filter(col("doc_b") - col("doc_a") === 300000 &&
          col("doc_a") % 13 === 0 && col("doc_a") < 300000)
      recovered
        .join(docs.select(col("doc_id").as("doc_a"), length(col("text")).as("n_chars")), "doc_a")
        .filter(col("n_chars") >= 300)
        .select("doc_a", "doc_b", "n_chars")
        .orderBy("doc_a")
    },

    // Language-ID + quality scoring against a full value-level oracle: the
    // marker profiles are plain `contains` probes and the quality score is
    // ratio arithmetic, both SQL-expressible (see langIdBestSql /
    // qualityScoreSql) — so the native byte kernels are certified
    // value-exact by the driver, not just spec'd against the column forms.
    Q("q24_langid",
      s"""WITH s AS (SELECT doc_id, text, ${langIdBestSql("text")} AS best FROM documents)
         |SELECT doc_id,
         | CASE WHEN best[1] = '0' THEN 'und' ELSE best[2:] END AS lang_pred,
         | ${qualityScoreSql("text")} AS quality
         |FROM s ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), langIdNative(col("text")).as("lang_pred"),
          qualityScoreNative(col("text")).as("quality"))
        .orderBy("doc_id")
    },
  )
}

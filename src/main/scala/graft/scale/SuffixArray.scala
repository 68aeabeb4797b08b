package graft.scale

import graft.core.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed token-level suffix ordering by prefix doubling
  * (Manber & Myers, SODA 1990), the primitive behind EXACT substring
  * deduplication (Lee et al., ACL 2022 "Deduplicating Training Data
  * Makes Language Models Better" build a suffix array for precisely
  * this): after round k, two suffixes carry EQUAL rank iff their first
  * 2^k tokens agree (suffixes ending earlier compare via an
  * end-sentinel), so a repeated >= 2^k-token span anywhere in the corpus
  * is literally a rank collision — no pairwise comparison, no shingling
  * approximation, no false positives.
  *
  * Each round is one self-join at offset 2^(k-1) plus one distributed
  * dense-rank over the (rank, next-rank) pairs. The dense rank is the
  * scale-critical piece: a global `dense_rank() OVER (ORDER BY ...)`
  * window collapses to a single partition, so [[denseRank]] implements
  * it as range-repartition + in-partition sort + a two-phase offset
  * pass (per-partition distinct-key counts — numPartitions longs on the
  * driver — then per-partition assignment), the standard distributed
  * zipWithIndex shape. Equal keys land in one range partition, so the
  * result is the exact global dense rank, and the DuckDB oracle replays
  * it with the window form.
  */
object SuffixArray {

  /** Exact global dense rank of `(k1, k2)` over (doc_id, pos, k1, k2)
    * rows: range-partition by key, sort within partitions, then assign
    * `offset(partition) + local dense index`. Driver state is one long
    * per partition. Output: (doc_id, pos, rank), rank starting at 1 —
    * bit-equal to `dense_rank() OVER (ORDER BY k1, k2)`.
    */
  private[scale] def denseRank(df: DataFrame,
      policy: CheckpointPolicy = CheckpointPolicy.Local): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sorted: Dataset[(Long, Long, Long, Long)] = policy.checkpoint(df
      .select(col("doc_id").cast("long"), col("pos").cast("long"),
        col("k1").cast("long"), col("k2").cast("long"))
      .repartitionByRange(col("k1"), col("k2"))
      .sortWithinPartitions("k1", "k2"))
      // pin the partitions: both passes below must see identical data
      // placement (range boundaries come from sampling); both checkpoint
      // modes preserve it (they snapshot the materialized RDD)
      .as[(Long, Long, Long, Long)]
    val counts = sorted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var n = 0L
      var lastK1 = 0L; var lastK2 = 0L; var any = false
      it.foreach { r =>
        if (!any || r._3 != lastK1 || r._4 != lastK2) {
          n += 1; lastK1 = r._3; lastK2 = r._4; any = true
        }
      }
      Iterator((pid, n))
    }.collect().toMap
    val nParts = sorted.rdd.getNumPartitions
    val offsets = new Array[Long](nParts)
    var acc = 0L
    for (p <- 0 until nParts) {
      offsets(p) = acc
      acc += counts.getOrElse(p, 0L)
    }
    val bc = spark.sparkContext.broadcast(offsets)
    sorted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var rank = bc.value(pid)
      var lastK1 = 0L; var lastK2 = 0L; var any = false
      it.map { r =>
        if (!any || r._3 != lastK1 || r._4 != lastK2) {
          rank += 1; lastK1 = r._3; lastK2 = r._4; any = true
        }
        (r._1, r._2, rank)
      }
    }.toDF("doc_id", "pos", "rank")
  }

  /** [[denseRank]] generalized to arbitrary key columns: exact global
    * dense rank of the `keys` tuple under the `order` sort (which may
    * mix ASC/DESC over those same columns) — range-repartition +
    * in-partition sort + the two-phase offset pass, bit-equal to
    * `dense_rank() OVER (ORDER BY order)` without the single-partition
    * window. Appends `rankCol` (long, 1-based) to `df`'s schema. Used
    * wherever the ranked relation is vocabulary-sized (billions of rows
    * at web scale): the suffix-array round-0 seed, the Zipf rank→bucket
    * profile. The (k1,k2)-specialized [[denseRank]] stays for the
    * prefix-doubling hot loop (typed encoders, no Row boxing).
    */
  private[graft] def denseRankBy(df: DataFrame,
                                 order: Seq[org.apache.spark.sql.Column],
                                 keys: Seq[String],
                                 rankCol: String,
                                 policy: CheckpointPolicy = CheckpointPolicy.Local): DataFrame = {
    val spark = df.sparkSession
    val sorted = policy.checkpoint(df
      .repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*))
      // pin the partitions: both passes below must see identical data
      // placement (range boundaries come from sampling); both checkpoint
      // modes preserve it (they snapshot the materialized RDD)
    val schema = sorted.schema
    val keyIdx = keys.map(schema.fieldIndex).toArray
    val rdd = sorted.rdd
    val counts = rdd.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L
      var last: IndexedSeq[Any] = null; var any = false
      it.foreach { r =>
        val k: IndexedSeq[Any] = keyIdx.map(r.get).toIndexedSeq
        if (!any || k != last) { n += 1; last = k; any = true }
      }
      Iterator((pid, n))
    }.collect().toMap
    val nParts = rdd.getNumPartitions
    val offsets = new Array[Long](nParts)
    var acc = 0L
    for (p <- 0 until nParts) {
      offsets(p) = acc
      acc += counts.getOrElse(p, 0L)
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var rank = bc.value(pid)
      var last: IndexedSeq[Any] = null; var any = false
      it.map { r =>
        val k: IndexedSeq[Any] = keyIdx.map(r.get).toIndexedSeq
        if (!any || k != last) { rank += 1; last = k; any = true }
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ rank)
      }
    }
    spark.createDataFrame(out,
      schema.add(rankCol, org.apache.spark.sql.types.LongType, nullable = false))
  }

  /** (doc_id, pos, rank) after `rounds` doubling rounds: ranks equal iff
    * the suffixes' first 2^rounds tokens agree (end-of-doc behaves as a
    * sentinel below every token). Round 0 seeds from the vocabulary
    * order through [[denseRankBy]] — the distinct-token relation is
    * corpus-scale at 100 TB, so the seed is distributed like every
    * later round, never a global window.
    */
  def suffixRanks(docs: DataFrame, rounds: Int,
                  textCol: String = "text",
                  policy: CheckpointPolicy = CheckpointPolicy.Local): DataFrame = {
    val toks = docs.select(col("doc_id"),
      posexplode(filter(split(col(textCol), graft.expressions.Ws.Regex),
        w => w =!= "")).as(Seq("pos", "w")))
    // round-0 seed: the vocabulary's dense rank — at web scale the
    // distinct-token relation is NOT metadata-sized (ids, typos, URLs),
    // so it goes through the distributed rank, never a global window
    val vocabRank = denseRankBy(toks.select("w").distinct(),
      Seq(col("w")), Seq("w"), "r", policy)
    var ranks = policy.checkpoint(toks.join(vocabRank, "w")
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("r").as("rank")))
    // span doubles per round and feeds lead()'s Int offset below — guard the
    // silent Long→Int truncation far before it could bite (rounds <= 4 today)
    require(rounds < 31, s"suffixRanks: rounds=$rounds overflows the Int lead offset")
    var span = 1L
    for (_ <- 1 to rounds) {
      // rank at pos+span = lead(rank, span) over the per-doc position order
      // (every position 0..n−1 is present exactly once per doc, invariant
      // across rounds) — one doc_id exchange instead of the historical
      // (doc_id, pos)-keyed self-join's two
      val byDoc = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
      val paired = ranks
        .select(col("doc_id"), col("pos"), col("rank").as("k1"),
          // past end-of-doc: sentinel 0 < every rank
          coalesce(lead(col("rank"), span.toInt).over(byDoc), lit(0L)).as("k2"))
      ranks = denseRank(paired, policy)
      span *= 2
    }
    ranks
  }

  /** The non-canonical repeated-span occurrences' token coverage: every
    * corpus token tagged with how many dropped spans cover it (`cov` > 0
    * ⟺ the token duplicates an earlier canonical occurrence). Drops
    * become ±1 interval events and a per-doc running sum marks coverage —
    * no range join, no global window. Shared by [[spanDedupRewrite]]
    * (keeps cov = 0) and [[dupTokenProfile]] (counts cov > 0).
    */
  private def dropCoverage(docs: DataFrame, rounds: Int,
                           textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spanLen = 1L << rounds
    // canonical occurrence = per-group min key, as a window min over the
    // span_grp partition repeatedSpans already established (no agg+re-join);
    // each drop then emits its +1/−1 interval events in the SAME pass (an
    // explode instead of a union of two reads of the drop relation)
    val drops = repeatedSpans(docs, rounds, textCol)
      .withColumn("__fk",
        min(col("doc_id") * 1000000L + col("pos"))
          .over(Window.partitionBy("span_grp")))
      .filter(col("doc_id") * 1000000L + col("pos") =!= col("__fk"))
      .select(col("doc_id"), col("pos"))
    val events = drops
      .select(col("doc_id"), explode(array(
        struct(col("pos").as("pos"), lit(1L).as("ev")),
        struct((col("pos") + spanLen).as("pos"), lit(-1L).as("ev")))).as("__e"))
      .select(col("doc_id"), col("__e.pos").as("pos"), col("__e.ev").as("ev"))
      .groupBy("doc_id", "pos").agg(sum("ev").as("ev"))
    val toks = docs.select(col("doc_id"),
      posexplode(filter(split(col(textCol), graft.expressions.Ws.Regex),
        w => w =!= "")).as(Seq("p", "w")))
      .select(col("doc_id"), col("p").cast("long").as("pos"), col("w"))
    toks.join(events, Seq("doc_id", "pos"), "left")
      .na.fill(0L, Seq("ev"))
      .withColumn("cov", sum("ev").over(Window.partitionBy("doc_id")
        .orderBy("pos").rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
  }

  /** Corpus duplication-rate profile — the headline "what fraction of the
    * corpus is exact duplicate text" number (Lee et al. ACL 2022 report
    * it first for every corpus they dedup), bucketed so the SHAPE is
    * visible too: per doc, the share of tokens covered by non-canonical
    * repeated >= 2^rounds-token spans, in integer basis points; docs
    * grouped into rate deciles (rate_bp div 1000), each bucket reporting
    * doc count, duplicate-token mass, and total tokens. Zero-token docs
    * carry no tokens and are excluded. Same machinery as the rewrite —
    * this is the measure, that is the cut.
    */
  def dupTokenProfile(docs: DataFrame, rounds: Int,
                      textCol: String = "text"): DataFrame =
    dropCoverage(docs, rounds, textCol)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("cov") > 0, 1L).otherwise(0L)).as("dup"))
      .select(expr("(dup * 10000) div n div 1000").as("decile"),
        col("n"), col("dup"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"), sum("dup").as("dup_tokens"),
        sum("n").as("tokens"))

  /** Every corpus position opening an EXACT repeated span of
    * `2^rounds` tokens: positions with at least 2^rounds tokens left in
    * their document, grouped by suffix rank — a group of size >= 2 IS a
    * repeated span (the rank value is the replayable group id). Output
    * (span_grp, doc_id, pos), one row per occurrence.
    */
  def repeatedSpans(docs: DataFrame, rounds: Int,
                    textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spanLen = 1L << rounds
    // per-doc token count as a window count over the rank rows (one row per
    // position by construction) — no re-tokenization scan, no lens re-join;
    // group sizes as a window count over the rank partition — the >= 2
    // filter without the count+re-join round trip
    val full = suffixRanks(docs, rounds, textCol)
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("doc_id")))
      .filter(col("pos") + spanLen <= col("__n"))
      .select(col("doc_id"), col("pos"), col("rank"))
    full
      .withColumn("__c", count(lit(1)).over(Window.partitionBy("rank")))
      .filter(col("__c") > 1)
      .select(col("rank").as("span_grp"), col("doc_id"), col("pos"))
  }

  /** The 16-token phrase planted by the q253 fixture (appended to every
    * doc_id % 7 == 0 document) — guarantees the corpus contains exact
    * cross-document 16-token repeats beyond the generator's organic
    * phrase reuse.
    */
  private[graft] val PlantedPhrase: String =
    "the quick stream merges sorted batches while the window slides " +
      "over hashed partitions into one table"

  private def spanRoundSql(i: Int, offset: Long): String =
    s""" p$i AS (SELECT a.doc_id, a.pos, a.rank AS k1, coalesce(b.rank, 0) AS k2
       |   FROM r${i - 1} a LEFT JOIN r${i - 1} b
       |     ON a.doc_id = b.doc_id AND b.pos = a.pos + $offset),
       | r$i AS (SELECT doc_id, pos,
       |   CAST(dense_rank() OVER (ORDER BY k1, k2) AS BIGINT) AS rank FROM p$i)""".stripMargin

  /** The corpus REWRITTEN with every non-canonical repeated span cut
    * out — the actual output artifact of exact substring dedup: tokens
    * covered by any drop interval [pos, pos+2^rounds) are removed and
    * the survivors re-join in document order. Coverage is computed
    * without a range join: each drop contributes a +1 start / −1 end
    * event, events join the token stream per (doc, pos), and a running
    * sum PARTITIONED BY doc (never a global window) gives the covering
    * count; a token survives iff its coverage is 0. Docs with no drops
    * pass through verbatim.
    */
  def spanDedupRewrite(docs: DataFrame, rounds: Int,
                       textCol: String = "text"): DataFrame = {
    val kept = dropCoverage(docs, rounds, textCol).filter(col("cov") === 0)
      .groupBy("doc_id")
      .agg(array_join(transform(array_sort(collect_list(
        struct(col("pos"), col("w")))), s => s.getField("w")), " ")
        .as("clean_text"))
    // total over the corpus: a fully-covered doc keeps an empty string
    docs.select(col("doc_id")).join(kept, Seq("doc_id"), "left")
      .na.fill("", Seq("clean_text"))
  }

  val queries: Seq[Q] = Seq(

    // Exact repeated 16-token spans by suffix-array prefix doubling: the
    // fixture plants a shared 16-token tail on every 7th doc, the 4
    // doubling rounds turn every repeated 16-token span into a rank
    // collision, and the full (group, doc, pos) occurrence table —
    // planted AND organic repeats — hash-compares against DuckDB's
    // window-form replay of every round.
    Q("q253_repeated_spans",
      s"""WITH fix AS (SELECT doc_id,
         |   CASE WHEN doc_id % 7 = 0 THEN text || ' $PlantedPhrase'
         |        ELSE text END AS text FROM documents
         |   WHERE doc_id % 2 = 0),
         | tl AS (SELECT doc_id,
         |   list_filter(string_split_regex(text, '[ \\t\\n\\f\\r]+'), x -> x <> '') AS ts
         | FROM fix),
         | t AS (SELECT doc_id, s.p AS pos, s.w FROM
         |   (SELECT doc_id, unnest(list_transform(range(1, len(ts) + 1),
         |      i -> {'p': CAST(i - 1 AS BIGINT), 'w': ts[i]})) AS s FROM tl) q),
         | r0 AS (SELECT doc_id, pos,
         |   CAST(dense_rank() OVER (ORDER BY w) AS BIGINT) AS rank FROM t),
         |${Seq((1, 1L), (2, 2L), (3, 4L), (4, 8L))
            .map { case (i, o) => spanRoundSql(i, o) }.mkString(",\n")},
         | ln AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n FROM tl),
         | el AS (SELECT r4.rank, r4.doc_id, r4.pos FROM r4 JOIN ln USING (doc_id)
         |        WHERE r4.pos + 16 <= ln.n),
         | g AS (SELECT rank FROM (SELECT rank, count(1) AS c FROM el GROUP BY 1)
         |       WHERE c > 1)
         |SELECT el.rank AS span_grp, el.doc_id, el.pos
         |FROM el JOIN g ON el.rank = g.rank
         |ORDER BY span_grp, doc_id, pos""".stripMargin) { (s, d) =>
      val fixed = Tables.documents(s, d)
        // 1/2 corpus sample (oracle carries the predicate): four full-corpus
        // doubling chains made this family ~90s of the r17 bench
        .filter(col("doc_id") % 2 === 0).select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" " + PlantedPhrase)))
          .otherwise(col("text")).as("text"))
      repeatedSpans(fixed, rounds = 4)
        .orderBy("span_grp", "doc_id", "pos")
    },

    // The dedup POLICY over q253's groups: the first occurrence
    // (doc_id, pos) of each repeated span is canonical, every other
    // occurrence is a drop candidate — the actual "remove duplicate
    // substring" decision of Lee et al. 2022 §4, as a per-group
    // min-struct aggregate (no window over the corpus).
    Q("q254_span_dedup_drops",
      s"""WITH fix AS (SELECT doc_id,
         |   CASE WHEN doc_id % 7 = 0 THEN text || ' $PlantedPhrase'
         |        ELSE text END AS text FROM documents
         |   WHERE doc_id % 2 = 0),
         | tl AS (SELECT doc_id,
         |   list_filter(string_split_regex(text, '[ \\t\\n\\f\\r]+'), x -> x <> '') AS ts
         | FROM fix),
         | t AS (SELECT doc_id, s.p AS pos, s.w FROM
         |   (SELECT doc_id, unnest(list_transform(range(1, len(ts) + 1),
         |      i -> {'p': CAST(i - 1 AS BIGINT), 'w': ts[i]})) AS s FROM tl) q),
         | r0 AS (SELECT doc_id, pos,
         |   CAST(dense_rank() OVER (ORDER BY w) AS BIGINT) AS rank FROM t),
         |${Seq((1, 1L), (2, 2L), (3, 4L), (4, 8L))
            .map { case (i, o) => spanRoundSql(i, o) }.mkString(",\n")},
         | ln AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n FROM tl),
         | el AS (SELECT r4.rank, r4.doc_id, r4.pos FROM r4 JOIN ln USING (doc_id)
         |        WHERE r4.pos + 16 <= ln.n),
         | keep AS (SELECT rank, min(doc_id * 1000000 + pos) AS first_key,
         |                 count(1) AS c
         |          FROM el GROUP BY 1)
         |SELECT el.rank AS span_grp, el.doc_id, el.pos
         |FROM el JOIN keep ON el.rank = keep.rank
         |WHERE keep.c > 1 AND el.doc_id * 1000000 + el.pos <> keep.first_key
         |ORDER BY span_grp, doc_id, pos""".stripMargin) { (s, d) =>
      val fixed = Tables.documents(s, d)
        // 1/2 corpus sample (oracle carries the predicate): four full-corpus
        // doubling chains made this family ~90s of the r17 bench
        .filter(col("doc_id") % 2 === 0).select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" " + PlantedPhrase)))
          .otherwise(col("text")).as("text"))
      // canonical occurrence per group: min (doc_id, pos) — encoded as
      // one long (pos < 1e6 per doc by fixture construction), computed as
      // a window min over the span_grp partition repeatedSpans already
      // established (no agg+re-join)
      repeatedSpans(fixed, rounds = 4)
        .withColumn("__fk",
          min(col("doc_id") * 1000000L + col("pos"))
            .over(org.apache.spark.sql.expressions.Window.partitionBy("span_grp")))
        .filter(col("doc_id") * 1000000L + col("pos") =!= col("__fk"))
        .select(col("span_grp"), col("doc_id"), col("pos"))
        .orderBy("span_grp", "doc_id", "pos")
    },

    // The corpus rewritten with q254's drops cut out — detect, decide,
    // REWRITE, the full exact-dedup pipeline as one certified relation.
    // Coverage via +1/-1 interval events and a per-doc running sum (no
    // range join, no global window); survivors re-join in doc order. The
    // planted tail survives ONLY in each group's canonical occurrence.
    Q("q255_span_dedup_rewrite",
      s"""WITH fix AS (SELECT doc_id,
         |   CASE WHEN doc_id % 7 = 0 THEN text || ' $PlantedPhrase'
         |        ELSE text END AS text FROM documents
         |   WHERE doc_id % 2 = 0),
         | tl AS (SELECT doc_id,
         |   list_filter(string_split_regex(text, '[ \\t\\n\\f\\r]+'), x -> x <> '') AS ts
         | FROM fix),
         | t AS (SELECT doc_id, s.p AS pos, s.w FROM
         |   (SELECT doc_id, unnest(list_transform(range(1, len(ts) + 1),
         |      i -> {'p': CAST(i - 1 AS BIGINT), 'w': ts[i]})) AS s FROM tl) q),
         | r0 AS (SELECT doc_id, pos,
         |   CAST(dense_rank() OVER (ORDER BY w) AS BIGINT) AS rank FROM t),
         |${Seq((1, 1L), (2, 2L), (3, 4L), (4, 8L))
            .map { case (i, o) => spanRoundSql(i, o) }.mkString(",\n")},
         | ln AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n FROM tl),
         | el AS (SELECT r4.rank, r4.doc_id, r4.pos FROM r4 JOIN ln USING (doc_id)
         |        WHERE r4.pos + 16 <= ln.n),
         | keep AS (SELECT rank, min(doc_id * 1000000 + pos) AS first_key,
         |                 count(1) AS c
         |          FROM el GROUP BY 1),
         | drops AS (SELECT el.doc_id, el.pos FROM el
         |           JOIN keep ON el.rank = keep.rank
         |           WHERE keep.c > 1
         |             AND el.doc_id * 1000000 + el.pos <> keep.first_key),
         | ev AS (SELECT doc_id, pos, CAST(sum(e) AS BIGINT) AS ev FROM (
         |   SELECT doc_id, pos, 1 AS e FROM drops
         |   UNION ALL SELECT doc_id, pos + 16, -1 FROM drops) q GROUP BY 1, 2),
         | cov AS (SELECT t.doc_id, t.pos, t.w,
         |   sum(coalesce(ev.ev, 0)) OVER (PARTITION BY t.doc_id ORDER BY t.pos) AS cov
         |  FROM t LEFT JOIN ev ON t.doc_id = ev.doc_id AND t.pos = ev.pos),
         | clean AS (SELECT doc_id,
         |   string_agg(w, ' ' ORDER BY pos) AS clean_text
         |  FROM cov WHERE cov = 0 GROUP BY 1)
         |SELECT f.doc_id, coalesce(c.clean_text, '') AS clean_text
         |FROM fix f LEFT JOIN clean c ON f.doc_id = c.doc_id
         |ORDER BY f.doc_id""".stripMargin) { (s, d) =>
      val fixed = Tables.documents(s, d)
        // 1/2 corpus sample (oracle carries the predicate): four full-corpus
        // doubling chains made this family ~90s of the r17 bench
        .filter(col("doc_id") % 2 === 0).select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" " + PlantedPhrase)))
          .otherwise(col("text")).as("text"))
      spanDedupRewrite(fixed, rounds = 4).orderBy("doc_id")
    },

    // Corpus duplication-rate profile: the q255 coverage measured instead
    // of cut — per doc, the basis-point share of tokens covered by
    // non-canonical repeated 16-token spans, bucketed into deciles with
    // doc counts and token masses. The planted tail (~7% of each planted
    // doc) lands the %7 docs in a nonzero decile while clean docs report
    // decile 0 with dup_tokens = 0; the oracle replays all 4 doubling
    // rounds, the drop decision, the coverage sum, and the bucketing.
    Q("q269_dup_token_profile",
      s"""WITH fix AS (SELECT doc_id,
         |   CASE WHEN doc_id % 7 = 0 THEN text || ' $PlantedPhrase'
         |        ELSE text END AS text FROM documents
         |   WHERE doc_id % 2 = 0),
         | tl AS (SELECT doc_id,
         |   list_filter(string_split_regex(text, '[ \\t\\n\\f\\r]+'), x -> x <> '') AS ts
         | FROM fix),
         | t AS (SELECT doc_id, s.p AS pos, s.w FROM
         |   (SELECT doc_id, unnest(list_transform(range(1, len(ts) + 1),
         |      i -> {'p': CAST(i - 1 AS BIGINT), 'w': ts[i]})) AS s FROM tl) q),
         | r0 AS (SELECT doc_id, pos,
         |   CAST(dense_rank() OVER (ORDER BY w) AS BIGINT) AS rank FROM t),
         |${Seq((1, 1L), (2, 2L), (3, 4L), (4, 8L))
            .map { case (i, o) => spanRoundSql(i, o) }.mkString(",\n")},
         | ln AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n FROM tl),
         | el AS (SELECT r4.rank, r4.doc_id, r4.pos FROM r4 JOIN ln USING (doc_id)
         |        WHERE r4.pos + 16 <= ln.n),
         | keep AS (SELECT rank, min(doc_id * 1000000 + pos) AS first_key,
         |                 count(1) AS c
         |          FROM el GROUP BY 1),
         | drops AS (SELECT el.doc_id, el.pos FROM el
         |           JOIN keep ON el.rank = keep.rank
         |           WHERE keep.c > 1
         |             AND el.doc_id * 1000000 + el.pos <> keep.first_key),
         | ev AS (SELECT doc_id, pos, CAST(sum(e) AS BIGINT) AS ev FROM (
         |   SELECT doc_id, pos, 1 AS e FROM drops
         |   UNION ALL SELECT doc_id, pos + 16, -1 FROM drops) q GROUP BY 1, 2),
         | cov AS (SELECT t.doc_id, t.pos,
         |   sum(coalesce(ev.ev, 0)) OVER (PARTITION BY t.doc_id ORDER BY t.pos) AS cov
         |  FROM t LEFT JOIN ev ON t.doc_id = ev.doc_id AND t.pos = ev.pos),
         | perdoc AS (SELECT doc_id, CAST(count(1) AS BIGINT) AS n,
         |   CAST(sum(CASE WHEN cov > 0 THEN 1 ELSE 0 END) AS BIGINT) AS dup
         |  FROM cov GROUP BY 1)
         |SELECT (dup * 10000 // n) // 1000 AS decile,
         |  CAST(count(1) AS BIGINT) AS n_docs,
         |  CAST(sum(dup) AS BIGINT) AS dup_tokens,
         |  CAST(sum(n) AS BIGINT) AS tokens
         |FROM perdoc GROUP BY 1 ORDER BY decile""".stripMargin) { (s, d) =>
      val fixed = Tables.documents(s, d)
        // 1/2 corpus sample (oracle carries the predicate): four full-corpus
        // doubling chains made this family ~90s of the r17 bench
        .filter(col("doc_id") % 2 === 0).select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" " + PlantedPhrase)))
          .otherwise(col("text")).as("text"))
      dupTokenProfile(fixed, rounds = 4).orderBy("decile")
    },
  )
}

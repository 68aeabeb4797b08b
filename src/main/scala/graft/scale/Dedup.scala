package graft.scale

import graft.core.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed around
  * Spark's shuffle: exact (hash group-by), MinHash+LSH banding (near-dup),
  * SimHash (near-dup via hamming buckets), n-gram Jaccard (verification).
  *
  * Scale notes (100 TB): signatures are pure projections (native kernel
  * expressions — zero shuffle); candidate generation is always an equi-join
  * on short bucket keys over narrow (id, bucket) relations, so join fan-out
  * is bounded by bucket size and no shuffle ever carries document text.
  */
object Dedup {

  /** Exact dedup: group on a content hash, keep the smallest id. One shuffle
    * on the 128-bit hash; text never shuffles.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))

  /** MinHash signatures: k independent min-hashes over distinct word
    * shingles, via the native [[graft.expressions.MinHashSignature]]
    * expression — one static-helper call per document inside whole-stage
    * codegen, zero shuffle, zero intermediate arrays. (Two composable
    * formulations were measured and rejected: interpreted HOF projection
    * ~20x slower; explode + partial-agg groupBy ~2x slower plus a
    * |docs|·k-long shuffle.)
    */
  def minhashSignatures(docs: DataFrame, numHashes: Int = 64, shingleSize: Int = 3,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sigExpr = org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.MinHashSignature(
        org.apache.spark.sql.GraftColumnBridge.expression(col(textCol)),
        numHashes, shingleSize))
    docs.select(col(idCol), sigExpr.as("signature"))
  }

  /** The (id, band, band_hash) banding relation of a signature table —
    * `bands` LSH bands plus the identity pseudo-band (a hash of the whole
    * signature, so identical content is a candidate by construction). Shared
    * by the self-join candidate generation ([[minhashCandidates]]) and the
    * cross-snapshot diff ([[Curation.newContentNearDup]]), which must band
    * BOTH snapshots into the same keyspace for their buckets to collide.
    */
  private[scale] def bandedKeys(signatures: DataFrame, bands: Int, sigLen: Int,
                                idCol: String): DataFrame = {
    require(sigLen % bands == 0, s"sigLen=$sigLen must be divisible by bands=$bands")
    val rows = sigLen / bands
    signatures.select(
      col(idCol),
      posexplode(concat(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, array_join(transform(
            slice(col("signature"), b * rows + 1, lit(rows)), h => h.cast("string")), ","))),
        array(xxhash64(lit("__identity"), col("signature")))))
        .as(Seq("band", "band_hash")))
  }

  /** LSH banding over MinHash signatures: split the k-long signature into
    * `bands` bands, hash each band, self-join on (band index, band hash).
    * Probability of candidacy for Jaccard similarity s: 1-(1-s^r)^b.
    * Returns candidate pairs (doc_a < doc_b) — feed to `jaccardVerify`.
    *
    * Band index `bands` is the IDENTITY pseudo-band: a hash of the whole
    * signature. Identical content (identical text, hence identical
    * signature) is thereby a candidate BY CONSTRUCTION — the overwhelmingly
    * common duplicate case must not depend on sharing a cold bucket, which
    * stops holding once real-band buckets go hot and star-link through a
    * third-party representative (the round-4 finding). Folding identity into
    * the same (band, band_hash) keyspace reuses the one existing shuffle —
    * a separate identical-signature pass measured ~2x the candidate cost.
    * In a hot identity bucket the min-id representative shares the full
    * signature, so star links still verify downstream (up to a 2^-64
    * xxhash64 collision mixing two signature groups in one bucket).
    */
  def minhashCandidates(signatures: DataFrame, bands: Int = 16, sigLen: Int = 64,
                        idCol: String = "doc_id", maxBucket: Int = 100): DataFrame = {
    val banded = bandedKeys(signatures, bands, sigLen, idCol)
    // Hot-bucket bound: a band value shared by m docs (web boilerplate is
    // duplicated 10^6 times) would alone yield m(m-1)/2 pairwise rows. Buckets
    // over maxBucket instead star-link every member to the bucket's min-id
    // representative: m-1 rows. Connectivity through the representative is
    // preserved for members whose rep link itself passes the downstream
    // verify (always true for exact duplicates, which share every band); two
    // hot-bucket members that are near-dups of each other but both below
    // the verify threshold AGAINST THE REP can lose their direct link — the
    // cap trades that tail for a hard fan-out bound, and connectedComponents
    // downstream re-links anything still sharing a cold bucket. The window
    // shuffles on the same (band, band_hash) key the join needs anyway.
    val w = Window.partitionBy("band", "band_hash")
    val sized = banded
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__rep", min(col(idCol)).over(w))
    val cold = sized.filter(col("__n") <= maxBucket)
    val coldPairs = cold.as("a").join(cold.as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
    val hotPairs = sized.filter(col("__n") > maxBucket && col(idCol) =!= col("__rep"))
      .select(col("__rep").as("doc_a"), col(idCol).as("doc_b"))
    coldPairs.unionByName(hotPairs).distinct()
  }

  /** Exact shingle-set Jaccard for candidate pairs (the verify step after
    * LSH): join the pair list to per-doc shingle arrays (one per side), then
    * the Jaccard is a per-row array_intersect — join fan-out is bounded by
    * |candidates|, never by shingle frequency (a hot shingle shared by 10k
    * docs adds zero join rows here, vs ~5·10⁷ in the naive shingle-equality
    * self-join). The shingle pass over docs is the same linear cost class as
    * signature generation itself; restricting it to candidate docs with a
    * pre-join measured SLOWER end-to-end here (extra join topology beats the
    * saved projection only when candidates ≪ corpus AND the corpus isn't
    * already being scanned — revisit with a profiler before "optimizing").
    */
  def jaccardVerify(docs: DataFrame, candidates: DataFrame, shingleSize: Int = 3,
                    threshold: Double = 0.7,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val shExpr = org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.DistinctShingles(
        org.apache.spark.sql.GraftColumnBridge.expression(col(textCol)), shingleSize))
    val sh = docs.select(col(idCol), shExpr.as("sh"))
    val a = sh.select(col(idCol).as("doc_a"), col("sh").as("sh_a"))
    val b = sh.select(col(idCol).as("doc_b"), col("sh").as("sh_b"))
    candidates.join(a, "doc_a").join(b, "doc_b")
      .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jaccard", col("common").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Asymmetric near-dup: pairs (a, b) where a's shingle set is ≥ num/den
    * CONTAINED in b's — the quote / excerpt / wrapped-republication detector
    * that symmetric Jaccard structurally misses (a short doc inside a long
    * one has low Jaccard no matter how completely it is contained, so
    * MinHash bands under-recall exactly the pairs this operator exists for;
    * that is why it probes a shingle inverted index instead of reusing the
    * LSH candidates).
    *
    * Shape: one shingle explode (16-byte xxhash64 rows on every shuffle),
    * df-capped postings (`dfCap`), one postings self-join, one (a, b) count
    * aggregate. The cap bounds the join: pair fan-out is Σ_g df_g² ≤
    * dfCap · |postings| — linear in the corpus at fixed dfCap. What the cap
    * drops is boilerplate-frequency shingles, whose pairs are
    * [[graft.scale.Curation]].removeBoilerplate territory, not containment
    * evidence; the containment DENOMINATOR stays the full per-doc shingle
    * count, so the cap can only lower recall, never inflate a score.
    */
  def containmentPairs(docs: DataFrame, shingleSize: Int = 3, dfCap: Int = 50,
                       num: Int = 9, den: Int = 10,
                       idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val shExpr = org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.DistinctShingles(
        org.apache.spark.sql.GraftColumnBridge.expression(col(textCol)), shingleSize))
    val sh = docs
      .select(col(idCol).as("__id"), explode(shExpr).as("__s"))
      .select(col("__id"), xxhash64(col("__s")).as("__g"))
      .localCheckpoint() // consumed three times: sizes, df table, both join sides
    val sizes = sh.groupBy("__id").agg(count(lit(1)).as("n_sh"))
    val hot = sh.groupBy("__g").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > dfCap)
    val kept = sh.join(hot, Seq("__g"), "left_anti")
    kept.select(col("__id").as("aid"), col("__g"))
      .join(kept.select(col("__id").as("bid"), col("__g")), "__g")
      .filter(col("aid") =!= col("bid"))
      .groupBy("aid", "bid").agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("__id").as("aid"), col("n_sh")), "aid")
      .filter(col("shared") * den >= col("n_sh") * num)
      .select(col("aid"), col("bid"), col("shared"), col("n_sh"))
  }

  /** SimHash: 64-bit signature where bit i is the sign of the sum over tokens
    * of ±1 according to bit i of the token hash. Near-dups have small hamming
    * distance. One native kernel call per row
    * ([[graft.expressions.SimHash64]]) — no explode, no shuffle, codegen
    * preserved.
    */
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sig = org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.SimHash64(
        org.apache.spark.sql.GraftColumnBridge.expression(col(textCol))))
    docs.select(col(idCol), sig.as("simhash"))
  }

  /** SimHash near-dup candidates: band the 64-bit signature into four 16-bit
    * chunks (any pair within hamming distance 3 shares at least one chunk),
    * join on chunk equality, verify with bit_count(xor) <= maxHamming.
    *
    * Chunk index 4 is the IDENTITY pseudo-chunk — the full 64-bit signature
    * itself (collision-free, unlike a hash). Identical signatures are
    * thereby candidates by construction even when all four 16-bit chunk
    * buckets are hot (the NORM at corpus scale: only 65,536 values per
    * index) and the per-chunk star-link would otherwise route both planted
    * endpoints through a third-party representative. In a hot identity
    * bucket the representative's signature is identical, so hamming to the
    * rep is 0 and the star link always survives the verify.
    */
  def simhashCandidates(sigs: DataFrame, maxHamming: Int = 3,
                        idCol: String = "doc_id", maxBucket: Int = 100): DataFrame = {
    val chunked = sigs.select(col(idCol), col("simhash"),
      posexplode(array(((0 until 4).map(i =>
        shiftright(col("simhash"), i * 16).bitwiseAND(0xffffL)) :+ col("simhash")): _*))
        .as(Seq("chunk_idx", "chunk")))
    // Hot-bucket bound (same rationale and same caveat as
    // minhashCandidates): a 16-bit chunk has only 65,536 values per index,
    // so at corpus scale every bucket is huge — buckets over maxBucket
    // star-link to the min-id representative (carried with its signature so
    // the hamming verify still runs) instead of the full pairwise join.
    // Exact duplicates (hamming 0 to the rep) always stay connected; two
    // members each > maxHamming from the rep but <= maxHamming from each
    // other lose their direct link under the cap.
    val w = Window.partitionBy("chunk_idx", "chunk")
    val sized = chunked
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__rep", min(struct(col(idCol), col("simhash"))).over(w))
    val cold = sized.filter(col("__n") <= maxBucket)
    val coldPairs = cold.as("a").join(cold.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") && col("a.chunk") === col("b.chunk") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
    val hotPairs = sized
      .filter(col("__n") > maxBucket && col(idCol) =!= col("__rep").getField(idCol))
      .select(col("__rep").getField(idCol).as("doc_a"), col(idCol).as("doc_b"),
        bit_count(col("__rep").getField("simhash").bitwiseXOR(col("simhash"))).as("hamming"))
    coldPairs.unionByName(hotPairs).distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ---- declared queries ----------------------------------------------------

  /** The driver corpus has no duplicates, so dedup queries inject clones:
    * every 7th doc is re-added under doc_id+100000 (exact copy), every 11th
    * under doc_id+200000 with the first token dropped (near-dup), and every
    * 21st gets a SECOND exact copy under doc_id+400000 — giving those docs a
    * three-member identical family whose transitive grouping q69 certifies.
    */
  private def withClones(docs: DataFrame): DataFrame = {
    val exactClones = docs.filter(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + 100000)
    val nearClones = docs.filter(col("doc_id") % 11 === 0)
      .withColumn("doc_id", col("doc_id") + 200000)
      .withColumn("text", expr("substring(text, instr(text, ' ') + 1)"))
    val secondClones = docs.filter(col("doc_id") % 21 === 0)
      .withColumn("doc_id", col("doc_id") + 400000)
    docs.unionByName(exactClones).unionByName(nearClones).unionByName(secondClones)
  }

  private val clonesSql =
    """SELECT doc_id, text FROM documents
      |UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id % 7 = 0
      |UNION ALL SELECT doc_id + 200000, text[instr(text, ' ') + 1:] FROM documents WHERE doc_id % 11 = 0
      |UNION ALL SELECT doc_id + 400000, text FROM documents WHERE doc_id % 21 = 0""".stripMargin

  val queries: Seq[Q] = Seq(

    // Quote detection through shingle containment: planted excerpts (the
    // first half of every 25th doc's words, re-ids'd +400000) must surface
    // as contained-in-source pairs at >= 9/10 containment — a relationship
    // symmetric Jaccard scores near 1/2 and MinHash bands can miss. The
    // oracle replays shingling, the df cap, the postings self-join, and the
    // integer cross-multiplied threshold. Chance high-containment pairs
    // among the synthetic docs appear identically on both engines.
    Q("q144_containment",
      """WITH corp AS (
        |  SELECT doc_id, trim(text) AS text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 400000, array_to_string(t[1 : len(t) // 2], ' ')
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |        FROM documents)
        |  WHERE doc_id % 25 = 0),
        | sh0 AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |           range(1, greatest(len(t) - 3, 0) + 2),
        |           i -> array_to_string(t[i:i+2], ' ')))) AS g
        |         FROM (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM corp)),
        | dft AS (SELECT g, count(1) AS df FROM sh0 GROUP BY 1),
        | kept AS (SELECT sh0.doc_id, sh0.g FROM sh0 JOIN dft USING (g)
        |          WHERE dft.df <= 50),
        | sz AS (SELECT doc_id, CAST(count(1) AS BIGINT) AS n_sh FROM sh0 GROUP BY 1),
        | p AS (SELECT a.doc_id AS aid, b.doc_id AS bid, CAST(count(1) AS BIGINT) AS shared
        |       FROM kept a JOIN kept b USING (g)
        |       WHERE a.doc_id <> b.doc_id GROUP BY 1, 2)
        |SELECT p.aid, p.bid, p.shared, sz.n_sh
        |FROM p JOIN sz ON sz.doc_id = p.aid
        |WHERE p.shared * 10 >= sz.n_sh * 9
        |ORDER BY aid, bid""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), trim(col("text")).as("text"))
      val t = filter(split(col("text"), graft.expressions.Ws.Regex), w => w =!= "")
      val quotes = docs.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 400000).as("doc_id"),
          array_join(slice(t, lit(1), (size(t) / 2).cast("int")), " ").as("text"))
      containmentPairs(docs.unionByName(quotes))
        .orderBy("aid", "bid")
    },

    // Exact dedup over a corpus with injected duplicate content.
    Q("q25_dedup_exact",
      s"""WITH corpus AS ($clonesSql)
         |SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(1) AS copies
         |FROM corpus GROUP BY 1 ORDER BY keep_id""".stripMargin) { (s, d) =>
      exact(withClones(Tables.documents(s, d).select("doc_id", "text")))
        .orderBy("keep_id")
    },

    // MinHash-LSH near-dup pipeline, driver-certified on its deterministic
    // subset: planted exact clones have identical text, hence identical
    // signatures, hence guaranteed candidacy through minhashCandidates'
    // identity pseudo-band (the whole-signature hash banded in) — capture does not depend on bucket
    // luck or on surviving a hot-bucket star-link. The full pipeline (sigs →
    // banding → jaccard verify) still runs; its output is filtered to the
    // planted-exact id shape so the oracle is enumerable and a chance
    // near-pair in a future re-rolled corpus cannot become a phantom row.
    // The earlier form demanded 100% recall against a FULL brute-force
    // Jaccard oracle — green at every tested SF but probabilistic at the
    // 0.7-threshold tail (~1% per-pair miss for a pair at exactly 0.7): the
    // round-4 finding this replaces. That full-parity law now lives in
    // DedupSpec ("LSH pipeline == brute force"), where the corpus is
    // controlled; identical shingle sets make jaccard exactly 1.0 here.
    Q("q26_minhash_neardup",
      """SELECT doc_id AS doc_a, doc_id + 100000 AS doc_b,
        | CAST(1.0 AS DOUBLE) AS jaccard
        |FROM documents WHERE doc_id % 7 = 0 ORDER BY doc_a""".stripMargin) { (s, d) =>
      // corpus is consumed twice (signatures + verify); materialize it so the
      // parquet read + clone synthesis runs once. Signatures are consumed by
      // both sides of the banding self-join — reusing the tiny (id, 64-long)
      // relation halves candidate generation (profiled 4.0s -> 1.2s).
      // r12 in-suite read 2.5s; a fresh isolated 10-rep profile medians
      // 1.52s (min 1.12s — the recorded 1.2s reproduced) with unchanged
      // plan, so the r12 number was 145-query-suite interference, not
      // drift. BENCH_SHUFFLE.json now pins the plan's byte footprint so a
      // real regression here is caught mechanically rather than by eye.
      // localCheckpoint, not cache: checkpoint blocks are freed by the
      // ContextCleaner once the query's DataFrames are GC'd, so the
      // materialization can't outlive this query in a 65-query session
      // (a .cache() here stays pinned until explicit unpersist).
      val corpus = withClones(Tables.documents(s, d).select("doc_id", "text")).localCheckpoint()
      val sigs = minhashSignatures(corpus).localCheckpoint()
      val cand = minhashCandidates(sigs)
      jaccardVerify(corpus, cand)
        .filter(col("doc_b") - col("doc_a") === 100000 &&
          col("doc_a") % 7 === 0 && col("doc_a") < 100000)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    },

    // SimHash near-dup pipeline (hamming <= 3 over banded 16-bit chunks),
    // driver-certified on its deterministic subset: an exact clone has an
    // IDENTICAL simhash, and identical signatures are candidates by
    // construction (simhashCandidates' identity pseudo-chunk: the full
    // signature banded in) — previously capture relied on
    // sharing a COLD chunk bucket, which stops holding once buckets go hot
    // (the norm at corpus scale: only 65,536 values per chunk index), so a
    // planted pair could star-link through a third doc and vanish. The
    // oracle enumerates the planted pairs from the clone-injection rule.
    // Near/chance pairs the pipeline also finds have engine-internal
    // hammings no SQL oracle can recompute; DedupSpec locks those.
    Q("q27_simhash_neardup",
      """SELECT doc_id AS doc_a, doc_id + 100000 AS doc_b, 0 AS hamming
        |FROM documents WHERE doc_id % 7 = 0 ORDER BY doc_a""".stripMargin) { (s, d) =>
      val corpus = withClones(Tables.documents(s, d).select("doc_id", "text"))
      simhashCandidates(simhash(corpus))
        .filter(col("doc_b") - col("doc_a") === 100000 &&
          col("doc_a") % 7 === 0 && col("doc_a") < 100000)
        .orderBy("doc_a", "doc_b")
    },

    // Transitive near-dup clusters: connected components over verified pairs
    // — a~b, b~c must collapse into one cluster even when a~c is absent. The
    // pair set is restricted to a deterministic planted CHAIN: for doc_id %
    // 21 == 0 the corpus holds three identical docs {a, a+100000, a+400000},
    // and only the (a, a+100000) and (a+100000, a+400000) edges are kept —
    // a and a+400000 are never paired directly, so the size-3 cluster the
    // oracle expects exists ONLY if the distributed min-label propagation
    // actually propagates transitively. Both kept edges join identical docs
    // (guaranteed candidates via the identity pseudo-band, jaccard exactly 1.0), so
    // the gate is deterministic at any SF; the earlier form closed over the
    // full probabilistic LSH pair set with a recursive-CTE oracle (same
    // round-4 fragility as q26). Full-graph closure laws live in ClusterSpec.
    Q("q69_neardup_clusters",
      """SELECT doc_id AS cluster_rep,
        | CAST(CASE WHEN doc_id % 21 = 0 THEN 3 ELSE 2 END AS BIGINT) AS cluster_size
        |FROM documents WHERE doc_id % 7 = 0 ORDER BY 1""".stripMargin) { (s, d) =>
      val corpus = withClones(Tables.documents(s, d).select("doc_id", "text")).localCheckpoint()
      val sigs = minhashSignatures(corpus).localCheckpoint()
      val pairs = jaccardVerify(corpus, minhashCandidates(sigs))
      val plantedChain = pairs.filter(
        (col("doc_b") - col("doc_a") === 100000 &&
          col("doc_a") % 7 === 0 && col("doc_a") < 100000) ||
        (col("doc_b") - col("doc_a") === 300000 &&
          col("doc_a") >= 100000 && col("doc_a") < 200000 &&
          (col("doc_a") - 100000) % 21 === 0))
      Cluster.clusters(plantedChain).orderBy("cluster_rep")
    },
  )
}

package graft.scale

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Curation operator laws: decontamination flags exactly the planted docs,
  * PII scrubbing is complete and idempotent, mix sampling is deterministic
  * and tracks its declared rates.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir).select("doc_id", "text")

  test("contaminatedDocs flags exactly the planted docs beyond the organic baseline") {
    val ev = docs.filter(col("doc_id") % 50 === 0)
    val clean = docs.filter(col("doc_id") % 50 =!= 0)
    // the generator reuses phrases across docs, so a handful of ORGANIC
    // 13-gram overlaps exist even before planting — measure the baseline
    // rather than assuming zero (it is real contamination by definition)
    val baseline = Curation.contaminatedDocs(clean, ev)
      .select("doc_id").as[Long].collect().toSet
    val targets = clean.select("doc_id").as[Long].collect()
      .filterNot(baseline).sorted.take(3).toSet
    val evText = ev.orderBy("doc_id").select("text").as[String].head()
    val planted = clean.withColumn("text",
      when(col("doc_id").isInCollection(targets), concat(col("text"), lit(" "), lit(evText)))
        .otherwise(col("text")))
    val flagged = Curation.contaminatedDocs(planted, ev)
      .select("doc_id").as[Long].collect().toSet
    assert(flagged -- baseline === targets) // planted appear...
    assert(baseline.subsetOf(flagged))      // ...and the organic ones remain
  }

  test("contaminatedDocsBloom is value-exact at any fpp (verify join kills false positives)") {
    val ev = docs.filter(col("doc_id") % 50 === 0)
    val planted = docs.filter(col("doc_id") % 50 =!= 0)
      .join(broadcast(ev.select(col("doc_id").as("__e"), col("text").as("__t"))),
        col("__e") === col("doc_id") - (col("doc_id") % 50), "left")
      .select(col("doc_id"),
        when(col("doc_id") % 17 === 0, concat(col("text"), lit(" [CONT] "), col("__t")))
          .otherwise(col("text")).as("text"))
    val exact = Curation.contaminatedDocs(planted, ev).as[(Long, Long)].collect().toMap
    // fpp=0.5: roughly half the clean grams leak through the bloom — the
    // result must still be identical because every positive is re-verified
    val bloomy = Curation.contaminatedDocsBloom(planted, ev, fpp = 0.5)
      .as[(Long, Long)].collect().toMap
    assert(bloomy === exact)
  }

  test("shuffleShards: every doc placed once, positions contiguous per shard, deterministic") {
    val ids = docs.select("doc_id")
    val a = Curation.shuffleShards(ids, nShards = 8)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(a.map(_._1).toSet === ids.as[Long].collect().toSet) // a permutation
    a.groupBy(_._2).foreach { case (shard, rows) =>
      val ps = rows.map(_._3).sorted
      assert(ps.head === 1L && ps.last === ps.length.toLong,
        s"shard $shard positions not contiguous 1..${ps.length}")
    }
    // rerun on a different layout — same assignment (the md5 key is the RNG)
    val b = Curation.shuffleShards(ids.repartition(3), nShards = 8)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(a.sortBy(_._1).toSeq === b.sortBy(_._1).toSeq)
  }

  test("contaminatedDocs: hashed keys == string keys (counts and ids)") {
    val ev = docs.filter(col("doc_id") % 50 === 0)
    val planted = docs.filter(col("doc_id") % 50 =!= 0)
      .join(broadcast(ev.select(col("doc_id").as("__e"), col("text").as("__t"))),
        col("__e") === col("doc_id") - (col("doc_id") % 50), "left")
      .select(col("doc_id"),
        when(col("doc_id") % 17 === 0, concat(col("text"), lit(" [CONT] "), col("__t")))
          .otherwise(col("text")).as("text"))
    def m(hash: Boolean) = Curation.contaminatedDocs(planted, ev, hashKeys = hash)
      .as[(Long, Long)].collect().toMap
    assert(m(hash = true) === m(hash = false))
  }

  test("scrubPii redacts every planted email/phone and is idempotent") {
    val seeded = docs.limit(100).withColumn("text",
      concat(col("text"), lit(" reach me at jane.doe+spam@mail.example.org / 555-867-5309")))
    val once = Curation.scrubPii(seeded).cache()
    assert(once.filter(col("n_emails") =!= 1 || col("n_phones") =!= 1).count() === 0)
    assert(once.filter(col("text").rlike(Curation.EmailRe) ||
      col("text").rlike(Curation.PhoneRe)).count() === 0)
    assert(once.filter(!col("text").contains("[EMAIL]") ||
      !col("text").contains("[PHONE]")).count() === 0)
    // scrubbing scrubbed text changes nothing (and counts drop to zero)
    val twice = Curation.scrubPii(once.select("doc_id", "text"))
    assert(twice.filter(col("n_emails") =!= 0 || col("n_phones") =!= 0).count() === 0)
    assert(twice.select("doc_id", "text").exceptAll(once.select("doc_id", "text")).count() === 0)
  }

  test("repetitionStats kernel == explode-based string counting on the corpus") {
    // expected via brute force: explode words / adjacent bigrams, count by
    // STRING value (the kernel counts 64-bit hashes — parity means no
    // collision broke the counts)
    val sample = docs.limit(200).cache()
    val ws = sample.withColumn("ws",
      filter(split(col("text"), graft.expressions.Ws.Regex), w => w =!= ""))
    val words = ws.select(col("doc_id"), explode(col("ws")).as("w"))
      .groupBy("doc_id", "w").count()
      .groupBy("doc_id")
      .agg(count(lit(1)).as("e_distinct"), max("count").as("e_top_word"))
    val bigrams = ws.filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("g"))
      .groupBy("doc_id", "g").count()
      .groupBy("doc_id").agg(max("count").as("e_top_bigram"))
    val expected = ws.select(col("doc_id"), size(col("ws")).as("e_words"))
      .join(words, Seq("doc_id"), "left").join(bigrams, Seq("doc_id"), "left")
      .na.fill(0)
    val got = Curation.repetitionStats(sample)
    val mismatches = got.join(expected, "doc_id")
      .filter(col("n_words") =!= col("e_words") ||
        col("n_distinct") =!= col("e_distinct") ||
        col("top_word") =!= col("e_top_word") ||
        col("top_bigram") =!= col("e_top_bigram"))
    assert(mismatches.count() === 0)
    sample.unpersist()
  }

  test("repetitionStats unit cases: empty, single word, pure repetition, tabs") {
    val cases = Seq(
      ("", (0, 0, 0, 0)),
      ("   ", (0, 0, 0, 0)),
      ("hello", (1, 1, 1, 0)),
      ("a a a a", (4, 1, 4, 3)),        // bigram "a a" at 3 positions
      ("x y x y x", (5, 2, 3, 2)),      // bigrams [x y][y x][x y][y x] -> top 2
      ("one\ttwo\n one", (3, 2, 2, 1)))
    val df = cases.map(_._1).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Curation.repetitionStats(df)
      .select("doc_id", "n_words", "n_distinct", "top_word", "top_bigram")
      .as[(Long, Int, Int, Int, Int)].collect().sortBy(_._1)
    for (((_, (w, d, tw, tb)), (_, gw, gd, gtw, gtb)) <- cases.zip(got)) {
      assert((gw, gd, gtw, gtb) === ((w, d, tw, tb)))
    }
  }

  test("dropRepetitive drops a planted degenerate doc and keeps organic text") {
    val planted = docs.limit(50).withColumn("text",
      when(col("doc_id") === docs.limit(50).select(min("doc_id")).as[Long].head(),
        lit("spam ham spam ham spam ham spam ham spam ham"))
        .otherwise(col("text")))
    val kept = Curation.dropRepetitive(planted).select("doc_id").as[Long].collect().toSet
    val minId = docs.limit(50).select(min("doc_id")).as[Long].head()
    assert(!kept.contains(minId))
    assert(kept.size >= 40) // word-salad corpus is not repetitive at 20%
  }

  test("packSequences: layout-invariant, bins respect the budget arithmetic") {
    val budget = 512
    val a = Curation.packSequences(docs, budget = budget, nShards = 8)
    val b = Curation.packSequences(docs.repartition(13), budget = budget, nShards = 8)
    assert(a.orderBy("doc_id").collect() === b.orderBy("doc_id").collect())
    // every doc's bin is exactly floor(start / budget), and the shard-local
    // cumulative sum really is a running sum in doc_id order
    val rows = a.select("shard", "doc_id", "toks", "cum", "seq")
      .as[(Long, Long, Long, Long, Long)].collect()
    for ((_, _, toks, cum, seq) <- rows)
      assert(seq === (cum - toks) / budget)
    for ((_, rs) <- rows.groupBy(_._1)) {
      val ordered = rs.sortBy(_._2)
      assert(ordered.map(_._3).scanLeft(0L)(_ + _).tail.sameElements(ordered.map(_._4)))
    }
  }

  test("chunkByTokens: window arithmetic, zero-overlap reconstruction, empty docs") {
    val df = Seq((1L, "a b c d e f g h i j"), (2L, ""), (3L, "   "), (4L, "x"))
      .toDF("doc_id", "text")
    // maxTokens 4, overlap 1 -> stride 3: starts 0,3,6,9
    val got = Curation.chunkByTokens(df, maxTokens = 4, overlap = 1)
      .select("doc_id", "chunk_idx", "n_tokens", "chunk")
      .as[(Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq === Seq(
      (1L, 0L, 4L, "a b c d"), (1L, 1L, 4L, "d e f g"),
      (1L, 2L, 4L, "g h i j"), (1L, 3L, 1L, "j"),
      (4L, 0L, 1L, "x")))  // empty/whitespace docs yield no chunks
    // zero overlap partitions the stream exactly: concatenation rebuilds it
    val rec = Curation.chunkByTokens(df, maxTokens = 3, overlap = 0)
      .filter(col("doc_id") === 1).orderBy("chunk_idx")
      .select("chunk").as[String].collect().mkString(" ")
    assert(rec === "a b c d e f g h i j")
    // and conserves tokens on the real corpus
    val sample = docs.limit(100)
    val chunked = Curation.chunkByTokens(sample, maxTokens = 32, overlap = 0)
    val totalChunk = chunked.agg(sum("n_tokens")).as[Long].head()
    val totalWords = sample.select(
      size(filter(split(col("text"), graft.expressions.Ws.Regex), w => w =!= "")).as("n"))
      .agg(sum("n")).as[Long].head()
    assert(totalChunk === totalWords)
  }

  test("unigramSurprisal: hand-computed corpus, docs with no words score zero") {
    // corpus "a a a b" + "b c" + "": vocab a:3 b:2 c:1, total 6 (bits=3)
    // surp(a)=3-2=1, surp(b)=3-2=1, surp(c)=3-1=2
    val df = Seq((1L, "a a a b"), (2L, "b c"), (3L, "   ")).toDF("doc_id", "text")
    val got = Curation.unigramSurprisal(df)
      .select("doc_id", "n_tokens", "surprisal")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got === Array((1L, 4L, 4L), (2L, 2L, 3L), (3L, 0L, 0L)))
  }

  test("unigramSurprisal is layout-invariant and monotone in word rarity") {
    val sample = docs.limit(300)
    val a = Curation.unigramSurprisal(sample).select("doc_id", "surprisal")
      .as[(Long, Long)].collect().toMap
    val b = Curation.unigramSurprisal(sample.repartition(11))
      .select("doc_id", "surprisal").as[(Long, Long)].collect().toMap
    assert(a === b)
    // appending a corpus-unique word strictly raises a doc's surprisal
    val spiked = sample.withColumn("text",
      when(col("doc_id") === sample.select(min("doc_id")).as[Long].head(),
        concat(col("text"), lit(" zzqqxxunique"))).otherwise(col("text")))
    val s = Curation.unigramSurprisal(spiked).select("doc_id", "surprisal")
      .as[(Long, Long)].collect().toMap
    val minId = sample.select(min("doc_id")).as[Long].head()
    assert(s(minId) > a(minId))
  }

  test("unigramSurprisal vocabCap law: capped == exact at full vocab, lower-bounds otherwise") {
    val sample = docs.limit(200)
    def run(cap: Int): Map[Long, (Long, Long)] =
      Curation.unigramSurprisal(sample, vocabCap = cap)
        .select("doc_id", "n_tokens", "surprisal")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val exact = run(0)
    // vocabCap >= |corpus vocabulary| (31 words) -> the OOV bucket is empty
    // and the capped form degenerates to the exact one, value for value
    assert(run(10000) === exact)
    // a real cut: every doc keeps its token count, surprisal can only drop
    // (the OOV bucket aggregates >= each member word's count), and at least
    // one doc must actually hit the bucket with a 31-word vocab cut to 8
    val capped = run(8)
    assert(capped.keySet === exact.keySet)
    for ((id, (nTok, surp)) <- capped) {
      assert(nTok === exact(id)._1, s"doc $id token count changed under cap")
      assert(surp <= exact(id)._2, s"doc $id capped surprisal above exact")
    }
    assert(capped.exists { case (id, (_, s)) => s < exact(id)._2 },
      "cap 8 of a 31-word vocabulary must send some tokens to the OOV bucket")
  }

  test("vocabulary matches brute-force top-K and keeps the whole vocab at large K") {
    val expected = docs
      .select(explode(filter(split(col("text"), graft.expressions.Ws.Regex),
        w => w =!= "")).as("w"))
      .groupBy("w").count()
      .as[(String, Long)].collect()
      .sortBy { case (w, c) => (-c, w) }
    val k = 10
    val got = Curation.vocabulary(docs, topK = k)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === (1 to k).map(_.toLong))
    assert(got.map(t => (t._2, t._3)).toSeq === expected.take(k).toSeq)
    // K beyond the vocabulary size returns the entire table, still ranked
    val all = Curation.vocabulary(docs, topK = expected.length + 50)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(all.map(t => (t._2, t._3)).toSeq === expected.toSeq)
  }

  test("capPerStratum: exact per-stratum caps, layout-invariant, id tiebreak total") {
    val all = Tables.documents(spark, sfDir)
    val cap = 7
    val a = Curation.capPerStratum(all, "source", cap)
    val b = Curation.capPerStratum(all.repartition(13), "source", cap)
    assert(a.select("doc_id").as[Long].collect().toSet ===
      b.select("doc_id").as[Long].collect().toSet)
    val kept = a.groupBy("source").count().as[(String, Long)].collect().toMap
    val total = all.groupBy("source").count().as[(String, Long)].collect().toMap
    for ((s, n) <- total) assert(kept.getOrElse(s, 0L) === math.min(cap.toLong, n))
  }

  test("capPerStratum hot-stratum escape hatch: stratifiedMix pre-filter composes") {
    // a pathological head domain: one stratum 8x the size of the others.
    // The prescribed composition pre-thins it with the deterministic mix
    // filter, then applies the exact cap — output still caps at `cap` per
    // stratum, the pre-filter only shrinks the rows that VISIT the window
    // task, and determinism is preserved end-to-end.
    val hot = docs.limit(400).withColumn("stratum", lit("head"))
      .unionByName(docs.limit(50).withColumn("stratum", lit("tail"))
        .withColumn("doc_id", col("doc_id") + 1000000))
    val cap = 12
    val thinned = Curation.stratifiedMix(hot, "stratum",
      Map("head" -> 2, "tail" -> 16), idCol = "doc_id")
    val capped = Curation.capPerStratum(thinned, "stratum", cap)
    val counts = capped.groupBy("stratum").count().as[(String, Long)].collect().toMap
    val thinnedCounts = thinned.groupBy("stratum").count().as[(String, Long)].collect().toMap
    // head was pre-thinned to ~2/16 of 400 = ~50 rows (3-sigma ~ 20), so the
    // window task sees ~50 rows, not 400 — and the cap still binds exactly
    assert(thinnedCounts("head") < 120,
      s"mix pre-filter did not thin the hot stratum: $thinnedCounts")
    assert(counts("head") === math.min(cap.toLong, thinnedCounts("head")))
    assert(counts("tail") === math.min(cap.toLong, thinnedCounts("tail")))
    // composition is deterministic: same survivors on a different layout
    val again = Curation.capPerStratum(
      Curation.stratifiedMix(hot.repartition(9), "stratum",
        Map("head" -> 2, "tail" -> 16), idCol = "doc_id"), "stratum", cap)
    assert(capped.select("doc_id").as[Long].collect().toSet ===
      again.select("doc_id").as[Long].collect().toSet)
  }

  test("newContent: NULL-text rows pass through, NULL-text old rows suppress nothing") {
    val old = Seq((1L, "same"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text").select(col("text"))
    val neu = Seq((10L, "same"), (11L, null.asInstanceOf[String]), (12L, "fresh"))
      .toDF("doc_id", "text")
    val got = Curation.newContent(neu, old)
      .select("doc_id").as[Long].collect().toSet
    // "same" is suppressed; the NULL-text new row passes (NULL = nothing in
    // anti-join semantics); old's NULL row must not suppress it
    assert(got === Set(11L, 12L))
  }

  test("newContent tolerates a __k column on the caller's dataframes") {
    val old = Seq((1L, "dup")).toDF("doc_id", "text").withColumn("__k", lit(99))
    val neu = Seq((10L, "dup"), (11L, "new")).toDF("doc_id", "text")
      .withColumn("__k", lit(7))
    val got = Curation.newContent(neu, old)
    assert(got.columns.toSeq === Seq("doc_id", "text", "__k"))
    assert(got.select("doc_id").as[Long].collect().toSet === Set(11L))
  }

  test("temperatureMix: rarest stratum keeps all, kept mass tracks c^alpha, deterministic") {
    val all = Tables.documents(spark, sfDir)
    val a = Curation.temperatureMix(all, "lang")
    val b = Curation.temperatureMix(all.repartition(7), "lang")
    assert(a.select("doc_id").as[Long].collect().toSet ===
      b.select("doc_id").as[Long].collect().toSet)
    val total = all.groupBy("lang").count().as[(String, Long)].collect().toMap
    val kept = a.groupBy("lang").count().as[(String, Long)].collect().toMap
    val cmin = total.values.min
    val rarest = total.minBy(_._2)._1
    // rate_s = sqrt(cmin/c_s): exactly 1 at the rarest stratum
    assert(kept(rarest) === total(rarest))
    // expected kept_s = sqrt(cmin * c_s), binomial 3-sigma band elsewhere
    for ((lang, c) <- total) {
      val p = math.sqrt(cmin.toDouble / c)
      val sigma = math.sqrt(c * p * (1 - p))
      assert(math.abs(kept(lang) - c * p) <= 3 * sigma + 1,
        s"$lang kept ${kept(lang)} of $c, expected ~${c * p}")
    }
    // alpha = 1 is the identity mix
    assert(Curation.temperatureMix(all, "lang", alpha = 1.0).count() === all.count())
  }

  test("temperatureMix treats a NULL stratum as a stratum: counted, rated, sampled") {
    val withNull = docs.limit(300).withColumn("grp",
      when(col("doc_id") % 10 === 0, lit(null).cast("string")).otherwise(lit("big")))
    val kept = Curation.temperatureMix(withNull, "grp")
      .groupBy("grp").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val totals = withNull.groupBy("grp").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    // the NULL group is the rarest stratum here -> keeps everything; the
    // big stratum samples at sqrt(cmin/c); nothing is silently dropped
    assert(kept(None) === totals(None))
    val p = math.sqrt(totals(None).toDouble / totals(Some("big")))
    val n = totals(Some("big")).toDouble
    val sigma = math.sqrt(n * p * (1 - p))
    assert(math.abs(kept(Some("big")) - n * p) <= 3 * sigma + 1,
      s"big kept ${kept(Some("big"))} of $n at rate $p")
  }

  test("extractText: body prose survives; nav, footer, script, style, comments don't") {
    val html = Seq((1L,
      "<html><head><title>T</title><style>p { color: red }</style></head>" +
        "<body><nav><a href=\"/\">home</a> <a href=\"/a\">about</a></nav>" +
        "<p>the quick brown fox jumps over the lazy dog</p>" +
        "<script>var x = \"<p>fake paragraph inside script</p>\";</script>" +
        "<!-- hidden comment text --><footer><a href=\"/t\">terms</a></footer></body></html>"))
      .toDF("doc_id", "text")
    val out = Curation.extractText(html).select("text").as[String].head()
    assert(out === "the quick brown fox jumps over the lazy dog")
  }

  test("extractText fail-closes malformed markup: unclosed script/comment/tag drop, not leak") {
    val cases = Seq(
      // unclosed script: everything after it is invisible
      (1L, "<p>kept body text here</p><script>var leak = 1; <p>never seen</p>"),
      // unclosed comment likewise
      (2L, "<p>kept body text here</p><!-- unterminated <p>never seen</p>"),
      // dangling '<' inside a block drops the tail of that block only
      (3L, "<p>kept body text before <broken tag soup never closed</p><p>next block still here</p>"))
      .toDF("doc_id", "text")
    val out = Curation.extractText(cases).orderBy("doc_id")
      .select("text").as[String].collect()
    assert(out(0) === "kept body text here")
    assert(out(1) === "kept body text here")
    assert(out(2) === "kept body text before\nnext block still here")
    assert(!out.exists(_.contains("never")))
    assert(!out.exists(_.contains("leak")))
  }

  test("extractText entities: single decode, &amp;lt; stays literal, nbsp collapses") {
    val html = Seq((1L,
      "<p>5 &lt; 6 &amp; 7 &gt; 2 so &quot;q&quot; isn&#39;t &amp;lt; escaped&nbsp;&nbsp;here</p>"))
      .toDF("doc_id", "text")
    val out = Curation.extractText(html).select("text").as[String].head()
    assert(out === "5 < 6 & 7 > 2 so \"q\" isn't &lt; escaped here")
  }

  test("extractText density rule: short and link-dominated blocks drop, NULL/empty safe") {
    val html = Seq(
      (1L, "<p>two words</p><p>three words here</p>"),           // minWords boundary
      (2L, "<p>see <a href=\"/x\">this link</a> plus four real words</p>"), // 1 link, 8 words: kept
      (3L, "<li><a href=\"/a\">one</a> <a href=\"/b\">two</a> <a href=\"/c\">three</a></li>"), // 3 links, 3 words: dropped
      (4L, null.asInstanceOf[String]),
      (5L, ""))
      .toDF("doc_id", "text")
    val out = Curation.extractText(html).orderBy("doc_id")
      .select("text").as[Option[String]].collect()
    assert(out(0) === Some("three words here"))
    assert(out(1) === Some("see this link plus four real words"))
    assert(out(2) === Some(""))
    assert(out(3) === None)
    assert(out(4) === Some(""))
  }

  test("extractText block segmentation keeps document order and nested tags flatten") {
    val html = Seq((1L,
      "<div>outer open first three words<div>inner nested block also kept</div>" +
        "tail after the nested block</div><h2>Heading With Three Words</h2>"))
      .toDF("doc_id", "text")
    val out = Curation.extractText(html).select("text").as[String].head()
    assert(out === "outer open first three words\ninner nested block also kept\n" +
      "tail after the nested block\nHeading With Three Words")
  }

  test("canonicalizeUrl: equivalent spellings collapse, significant parts survive") {
    val urls = Seq(
      // all five of these name the same resource
      "https://EXAMPLE.com/a/b",
      "https://example.com:443/a/b",
      "https://www.example.com/a/b/",
      "HTTPS://example.com/a/b#frag",
      "https://example.com/a/b?utm_source=x&utm_medium=y",
      // and these must all stay distinct
      "http://example.com:8080/a/b",   // non-default port
      "https://example.com/a/B",       // path case is significant
      "https://example.com/a/b?id=1",  // real param survives
      "http://example.com/a/b"         // scheme differs
    ).zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
    val out = urls.select(Curation.canonicalizeUrl(col("url"))).as[String].collect()
    assert(out.take(5).toSet === Set("https://example.com/a/b"))
    assert((out.drop(5).toSet + "https://example.com/a/b").size === 5)
    assert(out(5) === "http://example.com:8080/a/b")
    assert(out(7) === "https://example.com/a/b?id=1")
  }

  test("canonicalizeUrl sorts surviving params and drops only tracking ones") {
    val out = Seq((1L, "https://e.com/p?z=1&gclid=g&a=2&fbclid=f&ref=tw&msclkid=m&m=3"))
      .toDF("id", "url")
      .select(Curation.canonicalizeUrl(col("url"))).as[String].head()
    assert(out === "https://e.com/p?a=2&m=3&z=1")
    // empty-after-stripping query drops the '?' entirely; root path is '/'
    val bare = Seq((1L, "http://e.com?utm_campaign=x#f")).toDF("id", "url")
      .select(Curation.canonicalizeUrl(col("url"))).as[String].head()
    assert(bare === "http://e.com/")
  }

  test("registeredDomain: plain TLDs, multi-part suffixes, bare hosts") {
    val cases = Seq(
      ("a.b.example.com", "example.com"),
      ("example.com", "example.com"),
      ("news.bbc.co.uk", "bbc.co.uk"),
      ("bbc.co.uk", "bbc.co.uk"),
      ("co.uk", "co.uk"),           // a bare suffix has no registrable part
      ("user.github.io", "user.github.io"),
      ("deep.sub.user.github.io", "user.github.io"),
      ("localhost", "localhost"))
    val out = cases.map(_._1).zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("id", "host")
      .orderBy("id")
      .select(Curation.registeredDomain(col("host"))).as[String].collect()
    out.zip(cases.map(_._2)).foreach { case (got, want) => assert(got === want) }
  }

  test("removeBoilerplate strips planted hot lines exactly, counts them, idempotent") {
    val sample = docs.limit(300)
    val seeded = sample.withColumn("text",
      concat(
        when(col("doc_id") % 2 === 0,
          concat(lit("HOT HEADER\n"), col("text"))).otherwise(col("text")),
        when(col("doc_id") % 5 === 0,
          lit("\nHOT FOOTER")).otherwise(lit(""))))
    val cleaned = Curation.removeBoilerplate(seeded, minDf = 50).cache()
    // every planted line is gone and stripping them restores the original
    // corpus byte-for-byte (organic lines are each unique to ~1 doc, far
    // below the threshold)
    assert(cleaned.filter(col("text").contains("HOT HEADER") ||
      col("text").contains("HOT FOOTER")).count() === 0)
    val orig = sample.select("doc_id", "text").as[(Long, String)].collect().toMap
    val got = cleaned.select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(got === orig)
    // n_removed counts removed paragraph positions per doc
    for ((id, n) <- cleaned.select("doc_id", "n_removed").as[(Long, Long)].collect())
      assert(n === (if (id % 2 == 0) 1L else 0L) + (if (id % 5 == 0) 1L else 0L))
    // second pass over the cleaned corpus finds nothing hot
    val twice = Curation.removeBoilerplate(cleaned.select("doc_id", "text"), minDf = 50)
    assert(twice.filter(col("n_removed") =!= 0).count() === 0)
    cleaned.unpersist()
  }

  test("removeBoilerplate keeps all-boilerplate docs as empty rows, not dropped") {
    val df = (1 to 100).map(i => (i.toLong, "SAME LINE")).toDF("doc_id", "text")
    val c = Curation.removeBoilerplate(df, minDf = 50)
    assert(c.count() === 100)
    assert(c.filter(col("text") =!= "" || col("n_removed") =!= 1).count() === 0)
  }

  test("removeBoilerplate passes NULL text through as NULL, not empty string") {
    val df = (1 to 60).map(i => (i.toLong, "HOT LINE"))
      .toDF("doc_id", "text")
      .unionByName(Seq((1000L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val c = Curation.removeBoilerplate(df, minDf = 50)
    val nullRow = c.filter(col("doc_id") === 1000L)
      .select("text", "n_removed").collect().head
    assert(nullRow.isNullAt(0))
    assert(nullRow.getLong(1) === 0L)
    assert(c.count() === 61)
  }

  test("stratifiedMix is deterministic, keeps all of rate-16 strata, tracks rates") {
    val all = Tables.documents(spark, sfDir)
    val rates = Map("en" -> 16, "de" -> 8, "fr" -> 4)
    val a = Curation.stratifiedMix(all, "lang", rates, default16 = 2)
    val b = Curation.stratifiedMix(all.repartition(7), "lang", rates, default16 = 2)
    val ids = a.select("doc_id").as[Long].collect().toSet
    assert(ids === b.select("doc_id").as[Long].collect().toSet) // layout-invariant
    val kept = a.groupBy("lang").count().as[(String, Long)].collect().toMap
    val total = all.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(kept("en") === total("en")) // rate 16/16 keeps everything
    // rate-k strata keep ~k/16 (binomial; 3-sigma band)
    for ((lang, r) <- Seq("de" -> 8, "fr" -> 4)) {
      val p = r / 16.0
      val n = total(lang).toDouble
      val sigma = math.sqrt(n * p * (1 - p))
      assert(math.abs(kept(lang) - n * p) <= 3 * sigma + 1,
        s"$lang kept ${kept(lang)} of $n at rate $p")
    }
  }

  // span = boundary-led junction token + a 10-token all-non-boundary body
  // ending on a boundary token, so its interior chunk is byte-identical in
  // every doc it is planted into regardless of surrounding text
  private val Span = "dup spark sort merge join scan filter batch stream vector hash"
  private val SpanBody = "spark sort merge join scan filter batch stream vector hash"

  test("native span_chunks == HOF reference on the corpus and edge cases") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("text"))
      .unionByName(Seq("", "one", "a  b\t c", " lead", "trail ", "x \n y")
        .toDF("text"))
    val native = docs.select(Curation.spanChunks(col("text")).as("c")).collect().map(_.toSeq)
    val hof = docs.select(Curation.spanChunksHof(col("text")).as("c")).collect().map(_.toSeq)
    assert(native.toSeq === hof.toSeq)
    assert(native.nonEmpty)
  }

  test("dedupSpans cuts every planted span occurrence except the canonical one") {
    val sample = docs.limit(300)
    val seeded = sample.withColumn("text",
      when(col("doc_id") % 7 === 3, concat(col("text"), lit(s" $Span")))
        .otherwise(col("text"))).cache()
    val planted = seeded.filter(col("doc_id") % 7 === 3)
      .select("doc_id").as[Long].collect().sorted
    val cleaned = Curation.dedupSpans(seeded, minSpan = 8).cache()
    val withBody = cleaned.filter(col("text").contains(SpanBody))
      .select("doc_id").as[Long].collect().toSet
    // exactly one doc — the min-id planted one — keeps the span body
    assert(withBody.intersect(planted.toSet) === Set(planted.head))
    // every other planted doc recorded at least the span removal
    val removedCounts = cleaned.filter(col("doc_id") % 7 === 3)
      .select("doc_id", "n_removed").as[(Long, Long)].collect().toMap
    for (id <- planted.tail) assert(removedCounts(id) >= 1L, s"doc $id kept the span")
    seeded.unpersist(); cleaned.unpersist()
  }

  test("dedupSpans is idempotent and pass-through == token-normalization when nothing dups") {
    val sample = docs.limit(300)
    val seeded = sample.withColumn("text",
      when(col("doc_id") % 7 === 3, concat(col("text"), lit(s" $Span")))
        .otherwise(col("text")))
    val once = Curation.dedupSpans(seeded, minSpan = 8)
      .select("doc_id", "text").cache()
    val twice = Curation.dedupSpans(once, minSpan = 8)
    // surviving chunks re-chunk identically and the kept canonical
    // occurrence is unique on the second pass — nothing further is removed
    assert(twice.filter(col("n_removed") =!= 0).count() === 0)
    assert(twice.select("doc_id", "text").as[(Long, String)].collect().toMap
      === once.as[(Long, String)].collect().toMap)
    // with a threshold above every chunk size nothing is ever removed and
    // the rebuild is exactly whitespace normalization
    val none = Curation.dedupSpans(sample, minSpan = 1000)
    assert(none.filter(col("n_removed") =!= 0).count() === 0)
    val normalized = sample.select(col("doc_id"),
      array_join(filter(split(col("text"), "\\s+"), w => w =!= ""), " ").as("text"))
      .as[(Long, String)].collect().toMap
    assert(none.select("doc_id", "text").as[(Long, String)].collect().toMap === normalized)
    once.unpersist()
  }

  test("dedupSpans handles NULL and empty text") {
    val df = Seq((1L, s"one $Span"), (2L, s"two two $Span"), (3L, ""),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val c = Curation.dedupSpans(df, minSpan = 8)
      .select("doc_id", "text", "n_removed").collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)), r.getLong(2))).toMap
    // doc 1 is the canonical holder; doc 2 loses the interior chunk
    assert(c(1L)._1.get.contains(SpanBody) && c(1L)._2 === 0L)
    assert(!c(2L)._1.get.contains(SpanBody) && c(2L)._2 === 1L)
    assert(c(3L) === (Some(""), 0L))
    assert(c(4L) === (None, 0L))
  }

  test("newContentNearDup drops planted single-token edits, keeps genuinely new docs") {
    val old = Tables.documents(spark, sfDir)
      .select(col("doc_id"), trim(col("text")).as("text")).limit(200)
    // mutated re-crawl: first token lost — J >= (m-1)/m, a near-dup at any
    // doc length in the corpus; fresh: token order reversed — shingles
    // share ~nothing with the original
    val edited = old.filter(col("doc_id") % 3 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000)
      .withColumn("text", expr("substring(text, instr(text, ' ') + 1)"))
    val fresh = old.filter(col("doc_id") % 3 === 1)
      .withColumn("doc_id", col("doc_id") + 1000000)
      .withColumn("text", concat_ws(" ",
        reverse(split(col("text"), graft.expressions.Ws.Regex))))
    val kept = Curation.newContentNearDup(edited.unionByName(fresh), old)
      .select("doc_id").as[Long].collect().toSet
    val freshIds = fresh.select("doc_id").as[Long].collect().toSet
    assert(kept === freshIds && kept.nonEmpty)
  }

  test("newContentNearDup: exact-dup drops are a strict subset of near-dup drops") {
    val old = Tables.documents(spark, sfDir)
      .select(col("doc_id"), trim(col("text")).as("text")).limit(200)
    val neu = old.filter(col("doc_id") % 2 === 0) // exact re-crawls
      .withColumn("doc_id", col("doc_id") + 1000000)
      .unionByName(old.filter(col("doc_id") % 5 === 1)
        .withColumn("doc_id", col("doc_id") + 1000000)
        .withColumn("text", expr("substring(text, instr(text, ' ') + 1)")))
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").as[Long].collect().toSet
    val allNew = ids(neu)
    val exactDropped = allNew -- ids(Curation.newContent(neu, old))
    val nearDropped = allNew -- ids(Curation.newContentNearDup(neu, old))
    assert(exactDropped.subsetOf(nearDropped))
    assert(nearDropped.size > exactDropped.size) // the edits are the extra drops
  }

  test("assignSplit: stable under corpus growth, fractions honored, totals partition") {
    val docs = Tables.documents(spark, sfDir).select("doc_id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      df.select("doc_id", "split").as[(Long, String)].collect().toMap
    val small = asMap(Curation.assignSplit(docs.limit(200), splits))
    val full = asMap(Curation.assignSplit(docs, splits))
    // the serving guarantee: a doc's split never changes as the corpus grows
    small.foreach { case (id, s) => assert(full(id) === s, s"doc $id moved splits") }
    // every doc lands in exactly one split, and the head split dominates
    val counts = full.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts.values.sum === full.size)
    val trainFrac = counts("train").toDouble / full.size
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train fraction $trainFrac")
    // malformed fractions are rejected at call time
    intercept[IllegalArgumentException] {
      Curation.assignSplit(docs, Seq("a" -> 0.5, "b" -> 0.2))
    }
  }

  test("newContentNearDup: NULL-text rows pass through on both sides") {
    val old = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val neu = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // exact
      (11L, null.asInstanceOf[String]),                                  // NULL passes
      (12L, "totally different words with no overlap at all here now")).toDF("doc_id", "text")
    val kept = Curation.newContentNearDup(neu, old)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(11L, 12L))
  }

  // --- tokenBudgetMix ---------------------------------------------------

  private def mixCorpus: org.apache.spark.sql.DataFrame =
    (0 until 120).map { i =>
      val lang = Seq("en", "de", "zz")(i % 3)
      (i.toLong, lang, Seq.fill(1 + i % 5)("w").mkString(" "))
    }.toDF("doc_id", "lang", "text")

  test("tokenBudgetMix: bound strata land at >= budget, crossing doc kept, whitelist drops") {
    val out = Curation.tokenBudgetMix(mixCorpus, "lang",
      Seq("en" -> 20L, "de" -> 35L)).cache()
    val totals = out.groupBy("lang").agg(sum("n_tokens").as("tot"),
      max("cum_tokens").as("mx")).as[(String, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    // budget binds: total >= budget, and minus the LAST admitted doc < budget
    for ((lang, budget) <- Seq("en" -> 20L, "de" -> 35L)) {
      val (tot, mx) = totals(lang)
      assert(tot === mx)
      assert(tot >= budget)
      val lastTok = out.filter(col("lang") === lang)
        .orderBy(col("cum_tokens").desc).limit(1)
        .select("n_tokens").as[Long].head()
      assert(tot - lastTok < budget)
    }
    assert(out.filter(col("lang") === "zz").count() === 0)
  }

  test("tokenBudgetMix: bucketed prefix sum is invariant in the bucket count") {
    def run(b: Int) = Curation.tokenBudgetMix(mixCorpus, "lang",
        Seq("en" -> 20L, "de" -> 35L), buckets = b)
      .select("doc_id", "n_tokens", "cum_tokens")
      .as[(Long, Long, Long)].collect().toSet
    val one = run(1)
    assert(run(7) === one)
    assert(run(64) === one)
  }

  test("tokenBudgetMix: zero-token and NULL-text docs ride their slot, zero budget keeps nothing") {
    val df = Seq((1L, "en", null.asInstanceOf[String]), (2L, "en", "   "),
      (3L, "en", "a b c"), (4L, "en", "d e")).toDF("doc_id", "lang", "text")
    val out = Curation.tokenBudgetMix(df, "lang", Seq("en" -> 4L))
      .select("doc_id", "n_tokens", "cum_tokens")
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    // NULL and blank text both count zero tokens wherever they land
    out.filter(r => r._1 == 1L || r._1 == 2L).foreach(r => assert(r._2 === 0L))
    // total mass (5) exceeds the budget (4), so the budget binds exactly:
    // kept total >= 4 and the total minus the LAST admitted doc < 4
    val tot = out.map(_._2).sum
    assert(tot >= 4L && tot - out.last._2 < 4L)
    val none = Curation.tokenBudgetMix(df, "lang", Seq("en" -> 0L))
    assert(none.count() === 0)
  }

  // --- perplexityBuckets --------------------------------------------------

  test("perplexityBuckets: distinct keys split into exact terciles; ties coarsen to one bucket") {
    // doc j: j copies of the common word + one doc-unique token -> the
    // per-token key is strictly decreasing in j (9 distinct keys)
    val spread = (0 until 9).map { j =>
      (j.toLong, "xx", (Seq.fill(j)("c") :+ s"u$j").mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val out = Curation.perplexityBuckets(spread, "lang")
      .select("doc_id", "ppl_key", "bucket")
      .as[(Long, Long, String)].collect()
    assert(out.map(_._2).distinct.length === 9, "fixture keys must be distinct")
    val byBucket = out.groupBy(_._3).view.mapValues(_.length).toMap
    assert(byBucket === Map("head" -> 3, "middle" -> 3, "tail" -> 3))
    // boundaries are order statistics: head keys < middle keys < tail keys
    def keys(b: String) = out.filter(_._3 == b).map(_._2)
    assert(keys("head").max < keys("middle").min)
    assert(keys("middle").max < keys("tail").min)

    // all-tied corpus: one key holds everything -> k1 = k2 = that key,
    // every doc is head (no arbitrary rank split inside a tied cohort)
    val tied = (0 until 6).map(j => (j.toLong, "xx", "same words here"))
      .toDF("doc_id", "lang", "text")
    assert(Curation.perplexityBuckets(tied, "lang")
      .select("bucket").as[String].collect().forall(_ == "head"))
  }

  test("perplexityBuckets: languages bucket independently; zero-token docs are head") {
    val mixed = ((0 until 9).map { j =>
      (j.toLong, "aa", (Seq.fill(j)("c") :+ s"u$j").mkString(" "))
    } ++ (10 until 16).map(j => (j.toLong, "bb", "same words here"))
      :+ ((20L, "bb", "   "))).toDF("doc_id", "lang", "text")
    val out = Curation.perplexityBuckets(mixed, "lang")
      .select("doc_id", "lang", "ppl_key", "bucket")
      .as[(Long, String, Long, String)].collect()
    // aa still splits 3/3/3 even though bb's keys are interleaved nowhere
    val aa = out.filter(_._2 == "aa").groupBy(_._4).view.mapValues(_.length).toMap
    assert(aa === Map("head" -> 3, "middle" -> 3, "tail" -> 3))
    // bb is all one tied key plus a zero-token doc -> all head
    assert(out.filter(_._2 == "bb").forall(_._4 == "head"))
    assert(out.find(_._1 == 20L).get._3 === 0L)
  }

  test("extractLinks: both quote styles, attribute case; relative/mailto survive extraction, die at the absolute filter") {
    val html = """<a HREF="https://a.com/x">1</a> <a href='http://b.com'>2</a>""" +
      """ <a data-href="https://decoy.com">no</a>""" +
      """ <a href="/rel">3</a> <a href="mailto:x@y.z">4</a>"""
    val out = Seq(html).toDF("h")
      .select(Curation.extractLinks(col("h")).as("ls"))
      .as[Seq[String]].head()
    // double-quoted matches first, then single-quoted — the documented order
    assert(out === Seq("https://a.com/x", "https://decoy.com", "/rel",
      "mailto:x@y.z", "http://b.com"))
    assert(out.filter(_.matches("(?i)^https?://.*")) ===
      Seq("https://a.com/x", "https://decoy.com", "http://b.com"))
  }

  test("textRankKeywords: the co-occurrence hub tops its doc; short tokens never rank") {
    val d = Seq(
      // alpha is adjacent to three distinct terms, each of degree 1
      (1L, "alpha beta alpha gamma alpha delta"),
      // every token under 4 chars: the doc contributes no keywords
      (2L, "ab cd ef gh"),
      // one qualifying adjacent pair: both terms rank, term-ASC tiebreak
      (3L, "zeta the wind wind echo")).toDF("doc_id", "text")
    val out = Curation.textRankKeywords(d, k = 3, iters = 3)
      .as[(Long, Long, String, Long)].collect()
    val byDoc = out.groupBy(_._1)
    assert(!byDoc.contains(2L))
    assert(byDoc(1L).minBy(_._2)._3 === "alpha")
    // degree-1 satellites of the hub tie exactly; rank order is term ASC
    assert(byDoc(1L).sortBy(_._2).map(_._3).toSeq ===
      Seq("alpha", "beta", "delta"))
    // doc 3: adjacent >=4-char pairs are (wind,echo) only — "the" breaks
    // the zeta-wind adjacency and wind-wind self-pairs drop
    assert(byDoc(3L).sortBy(_._2).map(_._3).toSeq === Seq("echo", "wind"))
    // rnk is contiguous from 1 and capped at k
    byDoc.values.foreach { rows =>
      assert(rows.map(_._2).sorted.toSeq === (1L to rows.length).toSeq)
      assert(rows.length <= 3)
    }
    // short tokens are structurally excluded
    assert(out.forall(_._3.length >= 4))
  }

  test("extractAnchors pairs every href with its anchor across quote styles, case, empty anchors") {
    val html = "<a HREF=\"https://a.com/x\">First Link</a> mid " +
      "<a href='http://b.com'>second</a><a href=\"/rel\"></a>"
    val out = spark.range(1)
      .select(Curation.extractAnchors(lit(html)).as("p"))
      .as[Seq[(String, String)]].head()
    // double-quoted pass in document order, then the single-quoted pass
    assert(out === Seq("https://a.com/x" -> "First Link", "/rel" -> "",
      "http://b.com" -> "second"))
  }

  test("parseRobotsRules keeps exactly the Allow/Disallow lines, case-insensitive, comments skipped") {
    val txt = "User-agent: *\n# note\nDISALLOW: /news/\n  disallow:\t/read/5\n" +
      "Allow: /read/5/ok\nCrawl-delay: 2\nSitemap: https://x/s.xml\nDisallow:\n"
    val rules = spark.range(1)
      .select(Curation.parseRobotsRules(lit(txt)).as("r"))
      .as[Seq[(String, String)]].head()
    // the bare "Disallow:" line has no value: it parses to nothing
    assert(rules === Seq("disallow" -> "/news/", "disallow" -> "/read/5",
      "allow" -> "/read/5/ok"))
  }

  test("zipfBuckets: exact log2 rank boundaries, token mass conserved") {
    val d = Seq((0L, "a a a a b b c c d")).toDF("doc_id", "text")
    // counts a:4 b:2 c:2 d:1 -> ranks a=1, b=2, c=3, d=4
    val out = Curation.zipfBuckets(d)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq((0L, 1L, 4L), (1L, 2L, 4L), (2L, 1L, 1L)))
    assert(out.map(_._3).sum === 9L) // Σ mass = corpus tokens
  }

  test("winnowFingerprints: the w+k-1 guarantee and the rightmost tie-break") {
    // MOSS §3: any common run of >= w+k-1 = 11 tokens contains one
    // complete gram window identical in both docs -> a shared fingerprint
    val shared = "one two three four five six seven eight nine ten eleven"
    val d = Seq(
      (1L, s"aa bb cc $shared dd ee ff gg hh"),
      (2L, s"zz yy $shared xx ww vv uu tt ss rr qq")).toDF("doc_id", "text")
    val byDoc = Curation.winnowFingerprints(d).select("doc_id", "h")
      .distinct().as[(Long, String)].collect().groupBy(_._1)
    assert(byDoc(1L).map(_._2).toSet
      .intersect(byDoc(2L).map(_._2).toSet).nonEmpty)
    // all-identical grams: each window's min ties across the whole window
    // and must resolve to the RIGHTMOST position (the paper's convention)
    val mono = Seq((9L, "m m m m m m m m m m m m")).toDF("doc_id", "text")
    val got = Curation.winnowFingerprints(mono)
      .as[(Long, Long, String)].collect().map(_._2).toSet
    // 9 grams, complete windows i=0 (-> p7) and i=1 (-> p8)
    assert(got === Set(7L, 8L))
    // docs shorter than one complete window emit nothing
    assert(Curation.winnowFingerprints(
      Seq((5L, "a b c d e f")).toDF("doc_id", "text")).count() === 0L)
  }

  test("scrubEvalSpans: quoted spans excised exactly, the rest verbatim; idempotent") {
    val phrase = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (1L, s"intro words here $phrase closing words"), // quotes the eval
      (2L, phrase),                                    // IS the eval quote
      (3L, "totally unrelated document text body"),    // untouched
      (4L, "short doc")).toDF("doc_id", "text")        // shorter than n
    val evalSet = Seq((0L, phrase)).toDF("doc_id", "text")
    val out = Curation.scrubEvalSpans(corpus, evalSet, n = 5)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === (("intro words here closing words", 10L)))
    assert(out(2L) === (("", 10L)))
    assert(out(3L) === (("totally unrelated document text body", 0L)))
    assert(out(4L) === (("short doc", 0L)))
    // idempotent: nothing quotable survives the first pass
    val again = Curation.scrubEvalSpans(
        out.toSeq.map { case (id, (t, _)) => (id, t) }.toDF("doc_id", "text"),
        evalSet, n = 5)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(again === out.map { case (id, (t, _)) => id -> ((t, 0L)) })
  }

  test("scrubEvalSpans: overlapping and adjacent quotes merge into one covered interval") {
    // doc repeats the eval phrase twice back to back: coverage must be the
    // whole 2x span (interval events nest), not a torn middle
    val phrase = "one two three four five"
    val corpus = Seq((1L, s"$phrase $phrase tail words")).toDF("doc_id", "text")
    val evalSet = Seq((0L, phrase)).toDF("doc_id", "text")
    val out = Curation.scrubEvalSpans(corpus, evalSet, n = 5)
      .as[(Long, String, Long)].collect().head
    assert(out === ((1L, "tail words", 10L)))
  }

  test("termDrift: an emergent term tops the drift table; absent sides rate 0") {
    val before = Seq((0L, "alpha beta alpha gamma")).toDF("doc_id", "text")
    val after = Seq((1L, "alpha beta meme meme")).toDF("doc_id", "text")
    val out = Curation.termDrift(before, after, k = 10)
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    // meme: 0 -> 2/4; gamma: 1/4 -> 0; alpha: 2/4 -> 1/4; beta flat
    assert(out.head._2 === "meme" && out.head._3 === 0L &&
      out.head._4 === 500000L)
    val byTerm = out.map(r => r._2 -> r).toMap
    assert(byTerm("gamma")._4 === 0L && byTerm("gamma")._3 === 250000L)
    assert(byTerm("beta")._5 === 0L) // identical rates: zero drift
    // score is exactly the squared rate delta
    assert(out.forall(r => r._5 === (r._4 - r._3) * (r._4 - r._3)))
  }

  test("heapsCurve: cumulative tokens and first-sighting vocab at power-of-two prefixes") {
    val d = Seq((0L, "x y"), (1L, "x z"), (2L, "x"), (3L, "w"))
      .toDF("doc_id", "text")
    val out = Curation.heapsCurve(d)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // b0 = doc 0 (2 tokens, vocab {x,y}); b1 = docs 1-2 (+3 tokens, +{z});
    // b2 = doc 3 (+1 token, +{w})
    assert(out === Seq((0L, 2L, 2L), (1L, 5L, 3L), (2L, 6L, 4L)))
  }

  test("robotsAgentRules: the agent's group replaces *, unknown agents fall back, shared UA lines share a group") {
    val b = Seq(
      ("d1", "User-agent: GraftBot\nDisallow: /a\n\nUser-agent: *\nDisallow: /b\n"),
      ("d2", "User-agent: x\nUser-agent: graftbot\nDisallow: /x\nAllow: /y\n\nUser-agent: *\nDisallow: /z\n"))
      .toDF("domain", "txt")
    val bot = Curation.robotsAgentRules(b, "graftbot")
      .as[(String, String, String)].collect().toSet
    // replacement, not extension: /b and /z never reach the bot
    assert(bot === Set(("d1", "disallow", "/a"),
      ("d2", "disallow", "/x"), ("d2", "allow", "/y")))
    val other = Curation.robotsAgentRules(b, "unknownbot")
      .as[(String, String, String)].collect().toSet
    assert(other === Set(("d1", "disallow", "/b"), ("d2", "disallow", "/z")))
  }

  test("parseCrawlDelay: line-anchored, first match wins, absent means 0") {
    def delay(txt: String): Long = spark.range(1)
      .select(Curation.parseCrawlDelay(lit(txt)).as("d")).as[Long].head()
    assert(delay("User-agent: *\nCrawl-Delay: 17\nDisallow: /x\ncrawl-delay: 3\n") === 17L)
    // a delay-looking token inside a rule VALUE is not a directive line
    assert(delay("Disallow: /a/crawl-delay: 9\n") === 0L)
    assert(delay("User-agent: *\nDisallow: /x\n") === 0L)
  }

  test("textRankSummary: overlap-heavy segments are the summary; isolated docs never rank") {
    // 3 exact 12-token segments: 0 and 2 share 11 tokens, 1 hangs off
    // both by the single token "wolf" — salience must pick {0, 2}
    val s0 = "wolf bear hawk lynx deer boar crow swan toad newt mole hare"
    val s1 = "wolf aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj kkkk"
    val s2 = "wolf bear hawk lynx deer boar crow swan toad newt mole zzzz"
    val disjoint = "alfa brav char delt ecco foxt golf hote indi juli kilo lima"
    val d = Seq(
      (1L, s"$s0 $s1 $s2"),
      (2L, "solo text here only"), // a single segment: no pairs, no rank
      (3L, s"$s0 $disjoint") // two segments, zero overlap: both isolated
    ).toDF("doc_id", "text")
    val out = Curation.textRankSummary(d, k = 2, iters = 3)
      .as[(Long, Long, Long, Long)].collect()
    val byDoc = out.groupBy(_._1)
    assert(byDoc.keySet === Set(1L))
    // segments 0 and 2 have identical neighborhoods: equal rank, sid-ASC
    // tiebreak puts 0 first; the weakly-attached segment 1 never ranks
    val rows = byDoc(1L).sortBy(_._3)
    assert(rows.map(r => (r._2, r._3)).toSeq === Seq((0L, 1L), (2L, 2L)))
    assert(rows(0)._4 === rows(1)._4)
    // deterministic rerun
    assert(Curation.textRankSummary(d, k = 2, iters = 3)
      .as[(Long, Long, Long, Long)].collect().toSet === out.toSet)
  }

  test("sitemapEntries: block scoping, element order, whitespace, drops") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq(
      // element order reversed + padded loc; two entries
      (1L, "<urlset><url><lastmod>2026-02-03</lastmod><loc>https://a.com/x</loc></url>" +
        "<url>\n <loc>  https://a.com/y  </loc>\n</url></urlset>"),
      // sitemapindex: loc OUTSIDE url blocks -> no rows
      (2L, "<sitemapindex><sitemap><loc>https://a.com/child.xml</loc></sitemap></sitemapindex>"),
      // loc-less url block -> block matches, row dropped
      (3L, "<url><priority>0.5</priority></url>"),
      (4L, "no xml at all")
    ).toDF("doc_id", "body")
    val out = Curation.sitemapEntries(docs)
      .as[(Long, Int, String, Option[String])].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq === Seq(
      (1L, 0, "https://a.com/x", Some("2026-02-03")),
      (1L, 1, "https://a.com/y", None)))
  }

  test("recrawlSchedule: due rule, dedup to freshest, null-lastmod ranks last, slots") {
    val spark0 = spark
    import spark0.implicits._
    val entries = Seq(
      ("https://d.com/stale", Some("2026-03-10")),  // fetched 03-09 -> due
      ("https://d.com/fresh", Some("2026-03-10")),  // fetched 03-11 -> not due
      ("https://d.com/never", Some("2026-03-12")),  // never fetched -> due
      ("https://d.com/nolm", None),                 // never fetched, unknown freshness
      // duplicate claims: freshest (03-20) wins the dedup, which makes it due
      ("https://d.com/dup", Some("2026-03-01")),
      ("https://d.com/dup", Some("2026-03-20"))
    ).toDF("url", "lastmod")
    val log = Seq(
      ("https://d.com/stale", "2026-03-09"),
      ("https://d.com/fresh", "2026-03-11"),
      ("https://d.com/dup", "2026-03-05")
    ).toDF("url", "last_fetch")
    val out = Curation.recrawlSchedule(entries, log)
      .orderBy("cycle", "slot")
      .as[(String, Long, Long, String, Option[String], Option[String])].collect()
    // due set: dup (03-20), never (03-12), stale (03-10), nolm (ranked last)
    assert(out.map(_._4).toSeq === Seq(
      "https://d.com/dup", "https://d.com/never",
      "https://d.com/stale", "https://d.com/nolm"))
    assert(out.map(r => (r._2, r._3)).toSeq ===
      Seq((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L)))
    assert(out.forall(_._1 == "d.com"))
    // the deduped duplicate carries the freshest lastmod
    assert(out.head._5 === Some("2026-03-20"))
  }
}

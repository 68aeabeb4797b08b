package graft.scale

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25 matches a hand-computed tiny corpus") {
    // corpus: 4 docs, query {x}. N=4, lens = 2,2,2,2 -> avg = 2.
    // df_x = 2 -> idf = bitlen(5) - bitlen(3) = 3 - 2 = 1.
    // doc 1: tf=1, len=2 -> (1000*1*44*2*1) DIV (20*2*1 + 6*2 + 18*2) = 88000 DIV 88 = 1000
    // doc 2: tf=2, len=2 -> (1000*1*44*2*2) DIV (20*2*2 + 6*2 + 18*2) = 176000 DIV 128 = 1375
    val docs = Seq(
      (1L, "x y"), (2L, "x x"), (3L, "y z"), (4L, "z y")).toDF("doc_id", "text")
    val out = Retrieval.bm25(docs, Seq("x"))
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1000L, 2L -> 1375L, 3L -> 0L, 4L -> 0L))
  }

  test("docs without any query term score exactly zero") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val out = Retrieval.bm25(docs, Seq("dup"))
    val zero = out.filter(col("tf_dup") === 0 && col("score") =!= 0).count()
    assert(zero === 0)
  }

  test("rare high-idf term dominates ranking over common terms") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang", "text")
    val top = Retrieval.bm25(docs, Seq("spark", "merge", "dup"))
      .orderBy(col("score").desc, col("doc_id")).limit(5)
      .select("tf_dup").as[Long].collect()
    // "dup" appears in a handful of docs corpus-wide; every top-5 hit must
    // contain it, else idf contrast isn't driving the ranking
    assert(top.forall(_ > 0), s"top-5 tf_dup: ${top.toSeq}")
  }

  test("minWindow: sweep == brute force over all occurrence combos; missing-term docs absent") {
    val docs = Seq(
      (1L, "a x x b x x x c"),        // windows: a..c = 8
      (2L, "b a c x x a x b x c"),    // best is the leading "b a c" -> 3
      (3L, "a b x"),                  // missing c -> absent
      (4L, "c b a"),                  // reverse order -> 3
      (5L, "a a a b c")).toDF("doc_id", "text") // tight tail -> 3
    val idx = Retrieval.positionalIndex(docs)
    val got = Retrieval.minWindow(idx, Seq("a", "b", "c"))
      .as[(Long, Long)].collect().toMap
    // brute force: min over every (pa, pb, pc) combo of max-min+1
    val brute = docs.as[(Long, String)].collect().flatMap { case (id, t) =>
      val toks = t.split(" ").zipWithIndex
      def ps(w: String) = toks.filter(_._1 == w).map(_._2.toLong)
      val (as, bs, cs) = (ps("a"), ps("b"), ps("c"))
      if (as.isEmpty || bs.isEmpty || cs.isEmpty) None
      else Some(id -> (for { x <- as; y <- bs; z <- cs }
        yield Seq(x, y, z).max - Seq(x, y, z).min + 1).min)
    }.toMap
    assert(got === brute)
    assert(!got.contains(3L) && got(2L) === 3L && got(4L) === 3L)
  }

  test("bm25FromIndex == bm25 over the raw corpus (index serving parity)") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val terms = Seq("spark", "merge", "dup")
    val want = Retrieval.bm25(docs, terms)
      .select("doc_id", "tf_spark", "tf_merge", "tf_dup", "score")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val got = Retrieval.bm25FromIndex(Retrieval.invertedIndex(docs), terms)
      .select("doc_id", "tf_spark", "tf_merge", "tf_dup", "score")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // every doc in this corpus tokenizes to >= 1 term, so the two forms
    // agree on the full relation, not just positive scores
    assert(got === want && got.nonEmpty)
  }

  test("invertedIndex postings reproduce exact term frequencies") {
    val docs = Seq((1L, "x y x"), (2L, "y"), (3L, "x")).toDF("doc_id", "text")
    val idx = Retrieval.invertedIndex(docs)
      .select("term", "doc_id", "tf").as[(String, Long, Long)].collect().toSet
    assert(idx === Set(("x", 1L, 2L), ("y", 1L, 1L), ("y", 2L, 1L), ("x", 3L, 1L)))
  }

  test("topPostings runs on TopKPerKeyExec and equals the window form") {
    val idx = Retrieval.invertedIndex(
      Tables.documents(spark, sfDir).select("doc_id", "text"))
    val top = Retrieval.topPostings(idx, k = 3)
    assert(top.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      "expected the custom TopKPerKey operator in the physical plan")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("term").orderBy(col("tf").desc, col("doc_id"))
    val ref = idx.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
    assert(top.select("term", "rnk", "doc_id", "tf")
      .exceptAll(ref.select("term", "rnk", "doc_id", "tf")).count() === 0)
    assert(ref.select("term", "rnk", "doc_id", "tf")
      .exceptAll(top.select("term", "rnk", "doc_id", "tf")).count() === 0)
  }

  test("score monotonically increases with tf at fixed length") {
    val docs = Seq(
      (1L, "x a a a"), (2L, "x x a a"), (3L, "x x x a"), (4L, "b c d e"))
      .toDF("doc_id", "text")
    val s = Retrieval.bm25(docs, Seq("x"))
      .orderBy("doc_id").select("score").as[Long].collect()
    assert(s(0) < s(1) && s(1) < s(2))
    assert(s(3) === 0L)
  }

  test("hybridRrf fuses exactly 1000000 DIV (60+rank) per list, missing side = 0") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val fused = Retrieval.hybridRrf(docs, emb, Seq("spark", "merge", "dup"),
      queryVecId = 0L, kEach = 10, kOut = 15)
      .select("doc_id", "lex_rnk", "sem_rnk", "rrf")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getLong(3)))
    assert(fused.nonEmpty)
    def contrib(r: Option[Long]) = r.map(x => 1000000L / (60L + x)).getOrElse(0L)
    for ((_, lex, sem, rrf) <- fused) {
      assert(lex.isDefined || sem.isDefined)
      assert(rrf === contrib(lex) + contrib(sem))
    }
    // output is the top-kOut of the fused order, totally ordered
    val scores = fused.map(t => (t._4, t._1))
    assert(scores.toSeq === scores.sortBy(t => (-t._1, t._2)).toSeq)
  }

  test("hybridRrf: a doc ranked in both lists beats one with the same single rank") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val fused = Retrieval.hybridRrf(docs, emb, Seq("spark", "merge", "dup"),
      queryVecId = 0L, kEach = 10, kOut = 50).collect()
      .map(r => (if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3)))
    for {
      (Some(l1), Some(_), bothRrf) <- fused
      (Some(l2), None, oneRrf) <- fused
      if l1 === l2
    } assert(bothRrf > oneRrf)
  }

  test("phraseMatches equals a brute-force sliding-window count; 3-term and overlap cases") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b c a b"),   // "a b": 3, "a b c": 2
      (2L, "a a a a"),           // "a a": 3 (overlapping occurrences count)
      (3L, "b c b c"),           // no "a b"
      (4L, "a"),                 // single word, no bigram
    ).toDF("doc_id", "text")
    val idx = Retrieval.positionalIndex(docs)
    def got(phrase: Seq[String]) =
      Retrieval.phraseMatches(idx, phrase).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def brute(phrase: Seq[String]) = docs.collect().map { r =>
      val ws = r.getString(1).split(" ").toSeq
      r.getLong(0) -> ws.sliding(phrase.length).count(_ == phrase)
    }.filter(_._2 > 0).toMap
    for (p <- Seq(Seq("a", "b"), Seq("a", "b", "c"), Seq("a", "a"), Seq("c"))) {
      assert(got(p).view.mapValues(_.toInt).toMap === brute(p), s"phrase=$p")
    }
    // single-word phrase degenerates to term frequency
    assert(got(Seq("a")) === Map(1L -> 3L, 2L -> 4L, 4L -> 1L))
  }

  test("evalRanking: hand-computed metrics, absent-query zeroing, cut boundary") {
    val spark0 = spark
    import spark0.implicits._
    val run = Seq(
      ("a", 1L, 10L), ("a", 2L, 11L), ("a", 3L, 12L),
      ("b", 1L, 20L), ("b", 2L, 21L)
    ).toDF("qid", "rnk", "doc_id")
    val qrels = Seq(
      ("a", 11L), ("a", 12L), ("a", 99L), // 2 of 3 relevant in top-3, first at rank 2
      ("b", 77L),                         // none retrieved
      ("c", 5L)                           // query absent from the run entirely
    ).toDF("qid", "doc_id")
    val r = Retrieval.evalRanking(run, qrels, k = 3).orderBy("qid")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5)))
    assert(r.toSeq === Seq(
      ("a", 3L, 2L, 6666L, 6666L, 500000L),
      ("b", 1L, 0L, 0L, 0L, 0L),
      ("c", 1L, 0L, 0L, 0L, 0L)))
    // rank k+1 must not count: relevant doc at rank 4 is outside the cut
    val run2 = Seq(("a", 4L, 11L)).toDF("qid", "rnk", "doc_id")
    val r2 = Retrieval.evalRanking(run2, Seq(("a", 11L)).toDF("qid", "doc_id"), k = 3)
      .collect().head
    assert(r2.getLong(2) === 0L && r2.getLong(5) === 0L)
  }

  test("bm25f with one weight-1 field reduces to bm25 exactly") {
    val docs = graft.core.Tables.documents(spark, sfDir).select("doc_id", "text")
    val terms = Seq("merge", "hash")
    val a = Retrieval.bm25(docs, terms)
      .select("doc_id", "score").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Retrieval.bm25f(docs, Seq("text" -> 1L), terms)
      .select("doc_id", "score").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("bm25f weights: a weight-3 title hit outranks a body hit at equal weighted length") {
    val spark0 = spark
    import spark0.implicits._
    // both docs have weighted length 3*2 + 3 = 9; A's zebra rides the
    // title (weighted tf 3), B's the body (tf 1)
    val docs = Seq(
      (1L, "x y z", "zebra guide"),
      (2L, "zebra y z", "plain guide")
    ).toDF("doc_id", "text", "title")
    val r = Retrieval.bm25f(docs, Seq("title" -> 3L, "text" -> 1L), Seq("zebra"))
      .select("doc_id", "tf_zebra", "score").collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(1L)._1 === 3L && r(2L)._1 === 1L)
    assert(r(1L)._2 > r(2L)._2)
    // combine-BEFORE-saturation: tf' saturates once, so a doc holding the
    // term in both fields scores strictly less than the sum of two
    // single-field scorers would claim (concavity of the saturation)
    val both = Seq((3L, "zebra y z", "zebra guide")).toDF("doc_id", "text", "title")
    val combined = Retrieval.bm25f(both, Seq("title" -> 3L, "text" -> 1L), Seq("zebra"))
      .select("score").head().getLong(0)
    val titleOnly = Retrieval.bm25f(both, Seq("title" -> 3L), Seq("zebra"))
      .select("score").head().getLong(0)
    val bodyOnly = Retrieval.bm25f(both, Seq("text" -> 1L), Seq("zebra"))
      .select("score").head().getLong(0)
    assert(combined < titleOnly + bodyOnly)
  }
}

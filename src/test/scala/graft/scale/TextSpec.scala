package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("shingles produce n-gram windows over tokens") {
    val out = Seq("a b c d").toDF("t")
      .select(Text.shingles(col("t"), 3).as("s")).as[Seq[String]].head()
    assert(out === Seq("a b c", "b c d"))
  }

  test("shingles on short text yield a single (padded) shingle") {
    val out = Seq("a b").toDF("t")
      .select(Text.shingles(col("t"), 3).as("s")).as[Seq[String]].head()
    assert(out === Seq("a b"))
  }

  test("charNgrams slide over characters") {
    val out = Seq("abcd").toDF("t")
      .select(Text.charNgrams(col("t"), 2).as("s")).as[Seq[String]].head()
    assert(out === Seq("ab", "bc", "cd"))
  }

  test("token counts: whitespace and BPE-ish") {
    val df = Seq("Hello, world! It's 42 degrees.").toDF("t")
    assert(df.select(Text.tokenCount(col("t"))).as[Int].head() === 5)
    // BPE-ish splits punctuation/digits apart: more pieces than words
    assert(df.select(Text.bpeIshTokenCount(col("t"))).as[Int].head() > 5)
  }

  test("ratios are bounded [0,1] and exact on known input") {
    val df = Seq("AB cd 12.").toDF("t") // 9 chars: 2 upper, 2 digit, 1 punct
    val (p, d, u) = df.select(
      Text.punctRatio(col("t")), Text.digitRatio(col("t")), Text.upperRatio(col("t")))
      .as[(Double, Double, Double)].head()
    assert(math.abs(p - 1.0 / 9) < 1e-9)
    assert(math.abs(d - 2.0 / 9) < 1e-9)
    assert(math.abs(u - 2.0 / 9) < 1e-9)
  }

  test("stopwordRatio counts lowercase stopword tokens") {
    val r = Seq("The cat and the dog").toDF("t")
      .select(Text.stopwordRatio(col("t"), Seq("the", "and"))).as[Double].head()
    assert(math.abs(r - 3.0 / 5) < 1e-9)
  }

  test("langId votes by characteristic trigrams; und on no hits") {
    val preds = Seq(
      ("the house is on the hill and the tree is green", "en"),
      ("der hund und die katze ist schnell", "de"),
      ("le chat et les chiens est une famille", "fr"),
      ("el perro y los gatos es una familia", "es"),
      ("我是在了的", "zh"),
      ("zzz qqq xxx", "und")
    ).toDF("t", "expected")
      .select(col("expected"), Text.langId(col("t")).as("got"))
      .as[(String, String)].collect()
    preds.foreach { case (expected, got) => assert(got === expected) }
  }

  test("fingerprint is whitespace/case normalized") {
    val fps = Seq("Hello   World", "hello world", "different").toDF("t")
      .select(Text.fingerprint(col("t"))).as[Long].collect()
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("rollingChunks: mutation changes only the touched chunks (CDC property)") {
    val base = (1 to 400).map(i => s"tok$i").mkString(" ")
    // drop a few tokens from the middle: prefix and suffix chunks must
    // re-synchronize and keep identical fingerprints
    val mutated = ((1 to 190) ++ (196 to 400)).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, base), (2L, mutated), (3L, "entirely different material")).toDF("id", "t")
    val chunks = df.select(col("id"), Text.rollingChunks(col("t")).as("c"))
      .as[(Long, Seq[Long])].collect().toMap
    val shared = chunks(1L).toSet intersect chunks(2L).toSet
    assert(chunks(1L).size > 3, s"expected several chunks, got ${chunks(1L).size}")
    assert(shared.size >= (chunks(1L).size * 0.5).toInt,
      s"mutation destroyed re-synchronization: ${shared.size} of ${chunks(1L).size} shared")
    assert((chunks(1L).toSet intersect chunks(3L).toSet).isEmpty)
    // deterministic
    assert(df.select(Text.rollingChunks(col("t"))).collect().toSeq ===
      df.select(Text.rollingChunks(col("t"))).collect().toSeq)
  }

  test("chunkOverlapPairs: finds near-dups, stays bounded under hot boilerplate") {
    // 200 docs share an identical long boilerplate block (chunk frequency
    // 200 > maxDf, so those fingerprints are dropped — they carry no
    // near-dup signal) plus unique tails; docs 1/2 additionally share a
    // genuinely rare long block. The uncapped join would emit ~200^2/2 rows
    // from the boilerplate alone; capped, only the planted rare pair
    // survives.
    val boiler = (1 to 300).map(i => s"nav$i").mkString(" ")
    val rare = (1 to 300).map(i => s"rare$i").mkString(" ")
    val docs = (1L to 200L).map { i =>
      val tail = (1 to 80).map(j => s"u${i}x$j").mkString(" ")
      val body = if (i <= 2) s"$boiler $rare $tail" else s"$boiler $tail"
      (i, body)
    }.toDF("doc_id", "text")
    val pairs = Text.chunkOverlapPairs(docs, minShared = 3, maxDf = 50)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.toSet === Set((1L, 2L)))
  }

  test("native kernels agree with the composable reference forms on the corpus") {
    val docs = graft.core.Tables.documents(spark, sfDir).select("doc_id", "text")
    // langId: 25-probe column form vs single-pass byte kernel
    val langDiff = docs.select(
        Text.langId(col("text")).as("ref"), Text.langIdNative(col("text")).as("native"))
      .filter(col("ref") =!= col("native")).count()
    assert(langDiff === 0)
    // qualityScore: 4-regexp column form vs one-pass kernel (bit-exact)
    val qDiff = docs.select(
        Text.qualityScore(col("text")).as("ref"), Text.qualityScoreNative(col("text")).as("native"))
      .filter(col("ref") =!= col("native")).count()
    assert(qDiff === 0)
    // tokenStats: split-based forms vs one-pass kernel (bit-exact)
    val toks = split(col("text"), " ")
    val tDiff = docs.select(
        size(toks).as("rn"),
        ((length(col("text")) - size(toks) + 1).cast("double") / size(toks)).as("ra"),
        (size(filter(toks, t => t.isInCollection(Seq("a", "the", "of")))).cast("double") /
          size(toks)).as("rs"),
        Text.tokenStats(col("text")).as("st"))
      .filter(col("rn") =!= col("st.n_tokens") || col("ra") =!= col("st.avg_token_len") ||
        col("rs") =!= col("st.stopword_ratio")).count()
    assert(tDiff === 0)
    // edge cases through the SQL registration path
    val edge = Seq("", " ", "a", "the of a", "ALL CAPS!!! 123", "  double  spaces  ")
      .toDF("t").createOrReplaceTempView("edge_texts")
    val sqlOut = spark.sql(
      "SELECT lang_id(t), quality_score(t), token_stats(t).n_tokens FROM edge_texts")
    assert(sqlOut.count() === 6) // evaluates without error via the registry
    spark.catalog.dropTempView("edge_texts")
  }

  test("qualityScore favors prose over noise") {
    val scores = Seq(
      "This is a well formed English sentence of a reasonable length that continues long enough to look like prose in every way.",
      "!!! ### $$$ 111 222 333 !!!"
    ).toDF("t").select(Text.qualityScore(col("t"))).as[Double].collect()
    assert(scores(0) > scores(1))
    assert(scores.forall(s => s >= 0 && s <= 1))
  }
}

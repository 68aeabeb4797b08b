package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Suffix-array prefix-doubling laws: the distributed dense rank is
  * bit-equal to the window form, rank equality is exactly
  * first-2^k-token equality, and repeated spans surface within and
  * across documents (never for truncated suffixes).
  */
class SuffixArraySpec extends SparkSpec {
  import spark.implicits._

  test("denseRank matches the global window dense_rank bit-for-bit") {
    val rows = (0L until 200L).map(i =>
      (i % 7, i, (i * 37) % 11, (i * 13) % 5))
    val df = rows.toDF("doc_id", "pos", "k1", "k2")
    val got = SuffixArray.denseRank(df)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val want = df.withColumn("rank",
        dense_rank().over(org.apache.spark.sql.expressions.Window
          .orderBy("k1", "k2")).cast("long"))
      .select("doc_id", "pos", "rank")
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got === want)
  }

  test("denseRankBy: string keys and mixed ASC/DESC match the window form bit-for-bit") {
    val rows = (0L until 300L).map(i =>
      (i, s"w${(i * 37) % 40}", (i * 13) % 7))
    val df = rows.toDF("id", "w", "cnt")
    // single string key ascending (the suffix-array round-0 seed shape)
    val gotW = SuffixArray.denseRankBy(df.select("w").distinct(),
        Seq(col("w")), Seq("w"), "r")
      .as[(String, Long)].collect().toMap
    val wantW = df.select("w").distinct()
      .withColumn("r", dense_rank().over(org.apache.spark.sql.expressions
        .Window.orderBy("w")).cast("long"))
      .as[(String, Long)].collect().toMap
    assert(gotW === wantW)
    // (cnt DESC, w ASC) composite (the Zipf rank shape); unique keys, so
    // dense rank == row number
    val counts = df.groupBy("w").agg(sum("cnt").as("cnt"))
    val got = SuffixArray.denseRankBy(counts,
        Seq(col("cnt").desc, col("w")), Seq("cnt", "w"), "rank")
      .select("w", "rank").as[(String, Long)].collect().toMap
    val want = counts.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("w"))).cast("long"))
      .select("w", "rank").as[(String, Long)].collect().toMap
    assert(got === want)
  }

  test("rank equality is exactly first-2^k-token equality, across documents") {
    val d = Seq((1L, "x y x y"), (2L, "x y z")).toDF("doc_id", "text")
    val r = SuffixArray.suffixRanks(d, rounds = 1)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    // 2-token prefixes: (1,0)="x y", (1,2)="x y", (2,0)="x y" tie;
    // everything else unique
    assert(r((1L, 0L)) === r((1L, 2L)) && r((1L, 0L)) === r((2L, 0L)))
    val others = Seq((1L, 1L), (1L, 3L), (2L, 1L), (2L, 2L)).map(r)
    assert((others :+ r((1L, 0L))).distinct.size === 5)
    // suffix "y" (1,3) vs "y x y" (1,1) vs "y z" (2,1): all differ —
    // the end sentinel separates the truncated suffix
    assert((r((1L, 3L)) !== r((1L, 1L))) && (r((1L, 3L)) !== r((2L, 1L))))
  }

  test("repeatedSpans: cross-doc and self-overlap repeats surface; truncated tails never do") {
    // "p q r s" repeats across docs; "r s" also repeats but is shorter
    // than the 4-token span and must NOT form a group
    val d = Seq((1L, "p q r s a b c d"), (2L, "z z p q r s w"))
      .toDF("doc_id", "text")
    val g = SuffixArray.repeatedSpans(d, rounds = 2)
      .as[(Long, Long, Long)].collect()
    assert(g.map(t => (t._2, t._3)).toSet === Set((1L, 0L), (2L, 2L)))
    assert(g.map(_._1).distinct.size === 1)
    // self-repetition inside one doc: "m m m m m" has two full 4-token
    // spans (pos 0 and 1) that are identical
    val m = Seq((9L, "m m m m m")).toDF("doc_id", "text")
    val gm = SuffixArray.repeatedSpans(m, rounds = 2)
      .as[(Long, Long, Long)].collect()
    assert(gm.map(t => (t._2, t._3)).toSet === Set((9L, 0L), (9L, 1L)))
  }

  test("dupTokenProfile: deciles partition the docs, masses conserve, canonical stays clean") {
    // 4-token spans (rounds = 2); doc 1 is canonical, doc 2 fully
    // duplicates it (decile 10), doc 3 is clean (decile 0 with doc 1)
    val dup = "a b c d"
    val d = Seq((1L, dup), (2L, dup), (3L, "p q r s")).toDF("doc_id", "text")
    val out = SuffixArray.dupTokenProfile(d, rounds = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out === Map(0L -> ((2L, 0L, 8L)), 10L -> ((1L, 4L, 4L))))
    // totals: every token accounted for exactly once across buckets
    assert(out.values.map(_._3).sum === 12L)
  }

  test("spanDedupRewrite: the canonical occurrence survives, drops are cut, untouched docs pass verbatim") {
    val d = Seq((1L, "p q r s a b c d"), (2L, "z z p q r s w"), (3L, "u v"))
      .toDF("doc_id", "text")
    val out = SuffixArray.spanDedupRewrite(d, rounds = 2)
      .as[(Long, String)].collect().toMap
    assert(out === Map(
      1L -> "p q r s a b c d", // first (doc, pos) keeps its span
      2L -> "z z w",           // the repeat is excised
      3L -> "u v"))            // no drops: verbatim
  }
}

package graft.scale

import graft.SparkSpec
import graft.core.Tables

/** BPE merge training: greedy-application semantics, the tokenize round
  * trip, and trajectory determinism (the merge list is a pure function of
  * the word-frequency table).
  */
class BpeSpec extends SparkSpec {

  test("applyMerge is greedy left-to-right and never overlaps in symbol runs") {
    assert(Bpe.applyMerge(Array("a", "a", "a", "a"), "a", "a").toSeq === Seq("aa", "aa"))
    assert(Bpe.applyMerge(Array("a", "a", "a"), "a", "a").toSeq === Seq("aa", "a"))
    assert(Bpe.applyMerge(Array("n", "e", "w", "e", "s", "t"), "e", "s").toSeq ===
      Seq("n", "e", "w", "es", "t"))
    assert(Bpe.applyMerge(Array("x"), "a", "b").toSeq === Seq("x"))
    assert(Bpe.applyMerge(Array.empty[String], "a", "b").toSeq === Seq.empty)
  }

  test("segmentWord round trip: segments concatenate back to the word") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val merges = Bpe.bpeMerges(docs, nMerges = 12, topKWords = 200)
      .select("lhs", "rhs").as[(String, String)].collect().toSeq
    assert(merges.size === 12)
    val words = Curation.vocabulary(docs, topK = 50)
      .select("word").as[String].collect()
    words.foreach { w =>
      val seg = Bpe.segmentWord(w, merges)
      assert(seg.mkString === w, s"round trip broke for '$w': ${seg.toSeq}")
    }
    // training compressed something: at least one top word segments into
    // fewer symbols than characters
    assert(words.exists(w => Bpe.segmentWord(w, merges).length < w.length))
  }

  test("merge list is prefix-stable: training longer extends, never rewrites") {
    val docs = Tables.documents(spark, sfDir)
    val short = Bpe.bpeMerges(docs, nMerges = 6, topKWords = 200)
      .collect().map(_.toSeq)
    val long = Bpe.bpeMerges(docs, nMerges = 10, topKWords = 200)
      .collect().map(_.toSeq).take(6)
    assert(short.toSeq === long.toSeq)
  }
}

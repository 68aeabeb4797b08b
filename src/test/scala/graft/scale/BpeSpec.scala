package graft.scale

import graft.SparkSpec
import graft.core.Tables

/** BPE merge training: greedy-application semantics, the tokenize round
  * trip, and trajectory determinism (the merge list is a pure function of
  * the word-frequency table).
  */
class BpeSpec extends SparkSpec {

  test("segmentation is per code point: astral chars never split into surrogates") {
    val astral = "x😀y" // x, U+1F600 GRINNING FACE, y
    assert(graft.expressions.BpeSegment.codePoints(astral).toSeq ===
      Seq("x", "😀", "y"))
    // round trip survives the astral char under merges touching it
    val seg = Bpe.segmentWord(astral, Seq("x" -> "😀"))
    assert(seg.toSeq === Seq("x😀", "y"))
    assert(seg.mkString === astral)
  }

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

  test("native bpe_segment == driver segmentWord on every corpus word") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
    val merges = Bpe.bpeMerges(docs, nMerges = 12, topKWords = 200)
      .orderBy("rnk").select("lhs", "rhs").as[(String, String)].collect().toSeq
    val words = docs
      .select(explode(split(col("text"), graft.expressions.Ws.Regex)).as("w"))
      .filter(col("w") =!= "").distinct()
    val native = words.select(col("w"), Bpe.bpeSegmentCol(col("w"), merges).as("s"))
      .as[(String, Seq[String])].collect().toMap
    assert(native.nonEmpty)
    native.foreach { case (w, seg) =>
      assert(seg === Bpe.segmentWord(w, merges).toSeq, s"mismatch for '$w'")
    }
  }

  test("bpeTokenCounts conserves character mass at an uncut topK") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
    val subs = Bpe.bpeTokenCounts(docs, nMerges = 12, topKWords = 200, topK = 100000)
    val subMass = subs.select(sum(length(col("subword")) * col("cnt")))
      .as[Long].head()
    val rawMass = docs
      .select(explode(split(col("text"), graft.expressions.Ws.Regex)).as("w"))
      .filter(col("w") =!= "")
      .select(sum(length(col("w")))).as[Long].head()
    assert(subMass === rawMass)
  }
}

package graft.scale

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM trainer laws: Viterbi optimality and tie order, kernel ↔
  * driver parity, the tiling round trip, the UNK policy, and trajectory
  * determinism (the vocab is a pure function of the word-frequency table).
  */
class UnigramSpec extends SparkSpec {

  private def kernel(word: String, pc: Map[String, Long]): Option[Seq[String]] = {
    val pieces = pc.keys.toArray
    val costs = pieces.map(pc)
    Option(graft.expressions.UnigramSegment.compute(
      UTF8String.fromString(word),
      graft.expressions.UnigramSegment.buildTable(pieces, costs),
      Unigram.MaxPieceLen, Unigram.MaxWordLen)).map(_.toSeq.map(_.toString))
  }

  test("viterbi picks the cheapest tiling, not the greedy longest prefix") {
    // greedy longest-first would take "ab" + "c" (cost 5+1=6); the optimal
    // tiling is "a" + "bc" (cost 1+1=2)
    val pc = Map("a" -> 1L, "ab" -> 5L, "bc" -> 1L, "b" -> 9L, "c" -> 1L)
    assert(Unigram.viterbi("abc", pc).map(_.toSeq) === Some(Seq("a", "bc")))
  }

  test("tie order: equal cost prefers fewer pieces, then the longest piece") {
    // two tilings cost 2: ["ab"] never arises (len 2 = one piece, cost 2)
    // vs ["a","b"] cost 1+1 = 2 — fewer pieces wins
    val pc1 = Map("a" -> 1L, "b" -> 1L, "ab" -> 2L)
    assert(Unigram.viterbi("ab", pc1).map(_.toSeq) === Some(Seq("ab")))
    // same cost, same piece count: ["ab","c"] vs ["a","bc"] both cost 2,
    // both 2 pieces — the smallest final split point (longest LAST piece
    // lookback at each DP position) resolves: dp tie at position 3 keeps
    // the smaller j, i.e. piece "bc" starting at 1 beats "c" starting at 2
    val pc2 = Map("a" -> 1L, "ab" -> 1L, "bc" -> 1L, "c" -> 1L, "b" -> 9L)
    assert(Unigram.viterbi("abc", pc2).map(_.toSeq) === Some(Seq("a", "bc")))
  }

  test("kernel matches the driver-side viterbi on every corpus word") {
    val docs = Tables.documents(spark, sfDir)
    val vocab = Unigram.trainFromCounts(Bpe.wordCounts(docs, "text"))
    val total = vocab.values.sum
    val pc = vocab.map { case (p, c) => p -> (Unigram.bits(total) - Unigram.bits(c)) }
    import spark.implicits._
    val words = Bpe.wordCounts(docs, "text").select("__w").as[String].collect()
    assert(words.nonEmpty)
    words.foreach { w =>
      assert(kernel(w, pc) === Unigram.viterbi(w, pc).map(_.toSeq),
        s"kernel/driver divergence on '$w'")
    }
  }

  test("tiling round trip: pieces concatenate back to the word, all in vocab") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val segs = Unigram.unigramSegmentWords(docs)
      .select("word", "seg", "n_pieces").as[(String, String, Long)].collect()
    assert(segs.nonEmpty)
    val vocab = Unigram.trainFromCounts(Bpe.wordCounts(docs, "text")).keySet
    segs.foreach { case (w, seg, np) =>
      if (seg == "<unk>" && !vocab.contains("<unk>")) assert(np === 0L)
      else {
        val pieces = seg.split(' ')
        assert(pieces.mkString === w, s"'$seg' does not tile '$w'")
        assert(pieces.length.toLong === np)
        pieces.foreach(p => assert(vocab.contains(p), s"piece '$p' not in vocab"))
      }
    }
  }

  test("UNK policy: untileable and oversized words are null, not partial") {
    val pc = Map("a" -> 1L, "b" -> 1L)
    assert(Unigram.viterbi("axb", pc) === None)
    assert(kernel("axb", pc) === None)
    val long = "a" * (Unigram.MaxWordLen + 1)
    assert(Unigram.viterbi(long, pc) === None)
    assert(kernel(long, pc) === None)
    // boundary: exactly MaxWordLen still segments
    assert(Unigram.viterbi("a" * Unigram.MaxWordLen, pc).isDefined)
  }

  test("training is deterministic and every final piece is used") {
    val docs = Tables.documents(spark, sfDir)
    val v1 = Unigram.unigramVocab(docs).collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val v2 = Unigram.unigramVocab(docs).collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(v1.toSeq === v2.toSeq)
    assert(v1.nonEmpty)
    // hard-EM counts are Viterbi use counts: strictly positive by
    // construction (unused pieces fall out of the vocabulary)
    v1.foreach { case (_, p, c) => assert(c > 0, s"piece '$p' has count $c") }
    // ranks are 1..n in order
    assert(v1.map(_._1).toSeq === (1L to v1.length).toSeq)
  }

  test("segmentation column runs inside codegen over a distributed relation") {
    val docs = Tables.documents(spark, sfDir)
    val vocab = Unigram.trainFromCounts(Bpe.wordCounts(docs, "text")).toSeq
    val seg = Unigram.unigramSegmentCol(col("__w"), vocab)
    val out = Bpe.wordCounts(docs, "text").select(seg.as("s"))
    // plan executes (no interpreted-fallback crash) and yields rows
    assert(out.count() > 0)
  }
}

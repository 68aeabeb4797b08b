package graft.scale

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece laws: the likelihood argmax (rational comparison, not raw
  * frequency), marker discipline, greedy longest-match semantics, kernel ↔
  * driver parity, the tiling round trip (strip markers, concatenate back to
  * the word), the whole-word UNK policy, and trajectory determinism.
  */
class WordpieceSpec extends SparkSpec {

  private def kernel(word: String, vocab: Set[String]): Option[Seq[String]] = {
    val pieces = vocab.toArray
    val maxLen =
      if (pieces.isEmpty) 0
      else pieces.iterator.map(p => p.codePointCount(0, p.length)).max
    Option(graft.expressions.WordpieceSegment.compute(
      UTF8String.fromString(word),
      graft.expressions.WordpieceSegment.buildSet(pieces),
      maxLen, Wordpiece.MaxWordLen)).map(_.toSeq.map(_.toString))
  }

  test("marked segmentation: initial raw, rest ##-marked; merge strips r's marker") {
    assert(Wordpiece.markedCps("abc").toSeq === Seq("a", "##b", "##c"))
    assert(Wordpiece.applyMerge(Array("a", "##b", "##c"), "##b", "##c").toSeq
      === Seq("a", "##bc"))
    assert(Wordpiece.applyMerge(Array("a", "##bc"), "a", "##bc").toSeq === Seq("abc"))
    // non-overlapping run rule, same as BPE: aaaa -> [aa, aa] under (a, ##a)
    // never applies (positions differ); marked runs merge pairwise
    assert(Wordpiece.applyMerge(Array("##a", "##a", "##a", "##a"), "##a", "##a").toSeq
      === Seq("##aa", "##aa"))
  }

  test("score is likelihood gain, not raw pair frequency") {
    // corpus: "ab" x3, "cd" x2, with c/d appearing ONLY in "cd":
    //   pair (c,##d): c=2, cl=2, cr=2 -> score 2/4 = 1/2
    //   pair (a,##b): c=3, cl=3, cr=3 -> score 3/9 = 1/3
    // raw-frequency BPE would pick (a,##b); WordPiece must pick (c,##d)
    val spark0 = spark
    import spark0.implicits._
    val counts = Seq(("ab", 3L), ("cd", 2L)).toDF("__w", "__cnt")
    val (merges, _) = Wordpiece.trainFromCounts(counts, nMerges = 1, topKWords = 10)
    assert(merges.head.lhs === "c" && merges.head.rhs === "##d")
    assert(merges.head.cnt === 2L && merges.head.cl === 2L && merges.head.cr === 2L)
  }

  test("score ties break by (lhs, rhs) in UTF-8 order") {
    // two isolated words with identical structure -> identical scores
    val spark0 = spark
    import spark0.implicits._
    val counts = Seq(("xy", 2L), ("uv", 2L)).toDF("__w", "__cnt")
    val (merges, _) = Wordpiece.trainFromCounts(counts, nMerges = 1, topKWords = 10)
    assert(merges.head.lhs === "u" && merges.head.rhs === "##v")
  }

  test("greedy takes the longest match first and fails whole-word") {
    val vocab = Set("a", "ab", "##c", "##bc")
    // longest initial match "ab", then "##c" (not "a" + "##bc")
    assert(Wordpiece.greedy("abc", vocab).map(_.toSeq) === Some(Seq("ab", "##c")))
    assert(kernel("abc", vocab) === Some(Seq("ab", "##c")))
    // dead position -> whole-word UNK, never a partial tiling
    assert(Wordpiece.greedy("abx", vocab) === None)
    assert(kernel("abx", vocab) === None)
    // oversized word -> UNK
    val long = "a" * (Wordpiece.MaxWordLen + 1)
    assert(Wordpiece.greedy(long, Set("a", "##a")) === None)
    assert(kernel(long, Set("a", "##a")) === None)
    assert(Wordpiece.greedy("a" * Wordpiece.MaxWordLen, Set("a", "##a")).isDefined)
  }

  test("marker discipline: ##-spelled pieces never match initially; bare ## is inert") {
    // word "##" segments via '#' + continuation '###' (= marked '#'),
    // NOT via an initial piece spelled '##'
    val vocab = Set("#", "###", "##")
    assert(Wordpiece.greedy("##", vocab).map(_.toSeq) === Some(Seq("#", "###")))
    assert(kernel("##", vocab) === Some(Seq("#", "###")))
    // a vocab containing ONLY the bare marker can tile nothing
    assert(Wordpiece.greedy("##", Set("##")) === None)
    assert(kernel("##", Set("##")) === None)
  }

  test("kernel matches the driver greedy on every corpus word") {
    val docs = Tables.documents(spark, sfDir)
    val words = Bpe.wordCounts(docs, "text").localCheckpoint()
    val vocab = Wordpiece.trainFromCounts(words)._2
    val spark0 = spark
    import spark0.implicits._
    val ws = words.select("__w").as[String].collect()
    assert(ws.nonEmpty)
    ws.foreach { w =>
      assert(kernel(w, vocab) === Wordpiece.greedy(w, vocab).map(_.toSeq),
        s"kernel/driver divergence on '$w'")
    }
  }

  test("tiling round trip: stripped pieces concatenate back to the word, all in vocab") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Tables.documents(spark, sfDir)
    val words = Bpe.wordCounts(docs, "text").localCheckpoint()
    val vocab = Wordpiece.trainFromCounts(words)._2
    val segs = Wordpiece.wordpieceSegmentWords(docs)
      .select("word", "seg", "n_pieces").as[(String, String, Long)].collect()
    assert(segs.nonEmpty)
    var tiled = 0
    segs.foreach { case (w, seg, np) =>
      if (seg == "<unk>" && !vocab.contains("<unk>")) assert(np === 0L)
      else {
        val pieces = seg.split(' ')
        assert(pieces.map(Wordpiece.stripMark).mkString === w,
          s"'$seg' does not tile '$w'")
        assert(pieces.length.toLong === np)
        pieces.foreach(p => assert(vocab.contains(p), s"piece '$p' not in vocab"))
        // marker positions: first piece unmarked, the rest marked
        assert(!pieces.head.startsWith("##"), s"initial piece marked in '$seg'")
        pieces.tail.foreach(p => assert(p.startsWith("##"), s"unmarked continuation in '$seg'"))
        tiled += 1
      }
    }
    // every cut word tiles by construction (its final segmentation IS a tiling)
    assert(tiled > 0)
  }

  test("training is deterministic and merges record positive exact integers") {
    val docs = Tables.documents(spark, sfDir)
    val m1 = Wordpiece.wordpieceMerges(docs).collect().map(_.toSeq)
    val m2 = Wordpiece.wordpieceMerges(docs).collect().map(_.toSeq)
    assert(m1.toSeq === m2.toSeq)
    assert(m1.nonEmpty)
    m1.foreach { r =>
      assert(r(3).asInstanceOf[Long] > 0 && r(4).asInstanceOf[Long] > 0 &&
        r(5).asInstanceOf[Long] > 0, s"non-positive score integers in $r")
    }
  }

  test("id pack: token mass = tiled pieces + one [UNK] per untileable word") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val packed = Wordpiece.wordpieceIdPack(docs).collect()
    assert(packed.nonEmpty)
    // recompute the expected total token mass from the serve table: every
    // tiled word contributes n_pieces per occurrence, every UNK word 1
    val words = Bpe.wordCounts(docs, "text")
    val served = Wordpiece.wordpieceSegmentWords(docs)
      .select("word", "cnt", "n_pieces")
      .as[(String, Long, Long)].collect()
    val expected = served.map { case (_, cnt, np) =>
      cnt * (if (np == 0L) 1L else np)
    }.sum
    assert(packed.map(_.getAs[Long]("n_tokens")).sum === expected)
    // shards partition the docs
    assert(packed.map(_.getAs[Long]("n_docs")).sum === docs.count())
    // deterministic rerun
    assert(Wordpiece.wordpieceIdPack(docs).collect().map(_.toSeq).toSeq
      === packed.map(_.toSeq).toSeq)
  }

  test("segmentation column runs inside codegen over a distributed relation") {
    val docs = Tables.documents(spark, sfDir)
    val vocab = Wordpiece.trainFromCounts(Bpe.wordCounts(docs, "text"))._2
    val out = Bpe.wordCounts(docs, "text")
      .select(Wordpiece.wordpieceSegmentCol(col("__w"), vocab.toSeq.sorted).as("s"))
    assert(out.count() > 0)
  }
}

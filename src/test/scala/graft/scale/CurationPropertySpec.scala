package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized laws for the pure per-row curation/similarity kernels: each
  * operator is replayed by a plain-Scala reference implementation on
  * generated inputs (deterministic seeds — scalatestplus isn't on the
  * offline classpath, following WritersSpec's pattern). These defend the
  * corpus-fixture specs against fixture-shaped blind spots: empty docs,
  * ragged arrays, all-duplicate lines, zero vectors.
  */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("chunkByTokens == plain-Scala sliding windows on random word streams") {
    val genWords = Gen.listOf(Gen.oneOf("a", "bb", "ccc", "dddd", "e"))
    val docs = (0 until 120).map(i => (i.toLong, sample(genWords, i.toLong).mkString(" ")))
    val maxT = 5; val ov = 2; val stride = maxT - ov
    val expected = docs.flatMap { case (id, text) =>
      val ws = text.split("\\s+").filter(_.nonEmpty).toList
      Iterator.from(0).map(_ * stride).takeWhile(_ < ws.length).zipWithIndex.map {
        case (s, k) =>
          val chunk = ws.slice(s, s + maxT)
          (id, k.toLong, chunk.length.toLong, chunk.mkString(" "))
      }.toList
    }.toSet
    val got = Curation.chunkByTokens(docs.toDF("doc_id", "text"), maxT, ov)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got === expected)
  }

  test("quantizeInt8 == plain-Scala HALF_UP rounding on random vectors (incl. zero)") {
    val genVec = Gen.listOfN(8, Gen.chooseNum(-10f, 10f))
    val vecs = (0 until 60).map(i => (i.toLong, sample(genVec, i.toLong).toArray)) :+
      (100L, Array(0f, 0f, 0f)) :+ (101L, Array.empty[Float])
    val expected = vecs.map { case (id, v) =>
      val s = if (v.isEmpty) 0.0 else v.map(x => math.abs(x.toDouble)).max
      val codes =
        if (s == 0.0) v.map(_ => 0: Byte).toSeq
        else v.map { x =>
          // mirror Spark's Round(double, 0): BigDecimal.decimal (the
          // canonical-string double) then HALF_UP
          BigDecimal.decimal(x.toDouble / s * 127)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toByte
        }.toSeq
      id -> codes
    }.toMap
    val got = Similarity.quantizeInt8(vecs.toDF("vec_id", "embedding"))
      .select("vec_id", "qcode").as[(Long, Seq[Byte])].collect().toMap
    assert(got === expected)
  }

  test("int8Dot == plain-Scala MAC on random byte arrays, including ragged pairs") {
    val genCodes = Gen.listOf(Gen.chooseNum(-127, 127).map(_.toByte))
    val pairs = (0 until 80).map { i =>
      (i.toLong, sample(genCodes, i * 2L), sample(genCodes, i * 2L + 1))
    }
    val expected = pairs.map { case (id, a, b) =>
      id -> a.zip(b).map { case (x, y) => x.toLong * y.toLong }.sum
    }.toMap
    val got = pairs.toDF("id", "a", "b")
      .select(col("id"), Similarity.int8Dot(col("a"), col("b")).as("d"))
      .as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("removeBoilerplate == plain-Scala df filter on random multi-line docs") {
    val pool = (1 to 8).map(i => s"LINE$i")
    val genDoc = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, Gen.oneOf(pool)))
    val docs = (0 until 80).map(i => (i.toLong, sample(genDoc, i.toLong).mkString("\n")))
    val minDf = 10
    val df = docs.flatMap { case (id, t) => t.split("\n").distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val hot = df.filter(_._2 >= minDf).keySet
    val expected = docs.map { case (id, t) =>
      val lines = t.split("\n", -1).toList
      val kept = lines.filterNot(hot)
      (id, kept.mkString("\n"), (lines.length - kept.length).toLong)
    }.toSet
    val got = Curation.removeBoilerplate(docs.toDF("doc_id", "text"), minDf)
      .select("doc_id", "text", "n_removed")
      .as[(Long, String, Long)].collect().toSet
    assert(got === expected)
  }

  test("span_chunks partitions the token stream on random docs (counts and concat)") {
    val genWords = Gen.listOf(Gen.oneOf("alpha", "b", "chi", "delta9", "e", "ff"))
    val docs = (0 until 120).map(i => (i.toLong, sample(genWords, i.toLong).mkString("  ")))
    val got = docs.toDF("doc_id", "text")
      .select(col("doc_id"), Curation.spanChunks(col("text")).as("c"))
      .as[(Long, Seq[(Long, String)])].collect().toMap
    docs.foreach { case (id, text) =>
      val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
      val chunks = got(id)
      // chunk token counts partition the stream, and the chunks concatenate
      // back to the normalized token stream in order
      assert(chunks.map(_._1).sum === toks.length.toLong, s"doc $id")
      assert(chunks.flatMap(_._2.split(" ").filter(_.nonEmpty)) === toks, s"doc $id")
      // every chunk's own length matches its declared n_tokens
      chunks.foreach { case (n, c) =>
        assert(c.split(" ").count(_.nonEmpty).toLong === n, s"doc $id chunk '$c'")
      }
    }
  }

  test("bpe_segment concat-invariance holds for ANY merge list on random words") {
    val genWord = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar))
      .map(_.mkString)
    val words = (0 until 100).map(i => sample(genWord, i.toLong)).distinct
    // adversarial merges, not just trained ones: repeated symbols, chains
    val merges = Seq("a" -> "a", "aa" -> "a", "b" -> "c", "bc" -> "bc",
      "d" -> "e", "de" -> "f", "z" -> "z")
    val got = words.toDF("w")
      .select(col("w"), Bpe.bpeSegmentCol(col("w"), merges).as("s"))
      .as[(String, Seq[String])].collect()
    got.foreach { case (w, seg) =>
      assert(seg.mkString === w, s"concat broke for '$w': $seg")
      assert(seg === Bpe.segmentWord(w, merges).toSeq, s"kernel != driver for '$w'")
    }
  }
}

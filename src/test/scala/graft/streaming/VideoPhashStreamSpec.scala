package graft.streaming

import graft.SparkSpec
import graft.scale.{Multimodal => M}
import org.apache.spark.sql.functions._

/** Cross-batch and lifecycle laws for the streaming VIDEO perceptual-hash
  * index. Batch boundaries are driven directly through
  * [[VideoPhashIndex.processBatch]]; every payload is a REAL animated
  * GIF89a encode of the deterministic md5 frame fixtures, decoded through
  * the real multi-frame codec in the sink.
  */
class VideoPhashStreamSpec extends SparkSpec {
  import spark.implicits._

  private def root(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-vphi-$tag").toString + "/vphi"

  private def frames(src: Long, pert: Boolean = false): Array[Array[Byte]] =
    Array.tabulate(4)(f => M.synthFramePixels(src, f, pert))
  private def gif(src: Long, pert: Boolean = false): Array[Byte] =
    M.gifEncodeGrayAnimated(frames(src, pert).toSeq, 64, 64)
  private def gifHalf(src: Long): Array[Byte] =
    M.gifEncodeGrayAnimated(
      frames(src).map(fr => M.halfSize(fr, 64, 64)._3).toSeq, 32, 32)
  private def gifDropped(src: Long): Array[Byte] = {
    val fs = frames(src)
    M.gifEncodeGrayAnimated(Seq(fs(0), fs(2)), 64, 64)
  }
  /** A video sharing exactly ONE frame with `src` (its frame 0), the other
    * three from `other` — one vote, below the >= 2 threshold.
    */
  private def gifOneShared(src: Long, other: Long): Array[Byte] = {
    val fs = frames(other)
    M.gifEncodeGrayAnimated(Seq(frames(src)(0), fs(1), fs(2), fs(3)), 64, 64)
  }

  private def batch(rows: (Long, Array[Byte])*) =
    rows.toSeq.toDF("asset_id", "payload")

  private def servedIds(idx: VideoPhashIndex): Set[Long] =
    idx.served().select("asset_id").distinct().as[Long].collect().toSet

  test("within one batch: half-size and frame-dropped twins collapse to the min id") {
    val idx = new VideoPhashIndex(spark, root("batch1"))
    idx.processBatch(batch(
      (10L, gif(1)), (20L, gifHalf(1)), (30L, gifDropped(1)), (40L, gif(2))), 0L)
    assert(servedIds(idx) === Set(10L, 40L))
  }

  test("cross-batch vote: 2 shared keyframes drop a video, 1 shared frame does not") {
    val idx = new VideoPhashIndex(spark, root("vote"))
    idx.processBatch(batch((10L, gif(1))), 0L)
    idx.processBatch(batch(
      (50L, gifDropped(1)),      // keyframes 0 and 2 survive -> 2 votes -> drops
      (60L, gifOneShared(1, 3)), // one shared frame -> 1 vote -> admitted
      (70L, gif(4))), 1L)        // new -> admitted
    assert(servedIds(idx) === Set(10L, 60L, 70L))
  }

  test("perturbed re-upload drops; replayed batch and id-level re-crawl are no-ops") {
    val idx = new VideoPhashIndex(spark, root("replay"))
    idx.processBatch(batch((10L, gif(1))), 0L)
    val b1 = batch((50L, gif(1, pert = true)), (60L, gif(5)))
    idx.processBatch(b1, 1L)
    val after = idx.served().orderBy("asset_id", "f").collect().map(_.toSeq).toSeq
    assert(servedIds(idx) === Set(10L, 60L))
    idx.processBatch(b1, 1L) // redelivery: batch-stamp skip
    assert(idx.served().orderBy("asset_id", "f").collect().map(_.toSeq).toSeq === after)
    idx.processBatch(b1, 2L) // id-level re-crawl: accepted ids skip outright
    assert(idx.served().orderBy("asset_id", "f").collect().map(_.toSeq).toSeq === after)
  }

  test("delete: erased video leaves served(), stops suppressing; purge serves identically") {
    val idx = new VideoPhashIndex(spark, root("delete"))
    idx.processBatch(batch((10L, gif(1)), (20L, gif(2))), 0L)
    idx.delete(Seq(10L).toDF("asset_id"))
    assert(servedIds(idx) === Set(20L))
    // re-crawl of ERASED content is admitted; a twin of live 20 drops
    idx.processBatch(batch((30L, gifHalf(1)), (40L, gifDropped(2))), 1L)
    assert(servedIds(idx) === Set(20L, 30L))
    val before = idx.served().orderBy("asset_id", "f").collect().map(_.toSeq).toSeq
    idx.compactPurge()
    assert(idx.served().orderBy("asset_id", "f").collect().map(_.toSeq).toSeq === before)
    assert(idx.tombstones.read().isEmpty, "purge truncates the tombstone set")
    // video 1's content now lives on under id 30 (the admitted re-crawl),
    // so a re-crawl of id 10 drops against IT — content dedup outlives the
    // id's erasure
    idx.processBatch(batch((10L, gif(1))), 2L)
    assert(servedIds(idx) === Set(20L, 30L))
    // erase that copy too and purge: only then does the content's history
    // fully clear, and the original id re-admits fresh
    idx.delete(Seq(30L).toDF("asset_id"))
    idx.compactPurge()
    idx.processBatch(batch((10L, gif(1))), 3L)
    assert(servedIds(idx) === Set(10L, 20L))
  }

  test("append chains stay bounded under many batches") {
    val idx = new VideoPhashIndex(spark, root("chain"), maxChainDepth = 3)
    for (i <- 0 until 8)
      idx.processBatch(batch((1000L + i, gif(100 + i))), i.toLong)
    assert(idx.frames.chainDepth <= 4,
      s"chain depth ${idx.frames.chainDepth} exceeded the compaction bound")
    assert(servedIds(idx).size === 8)
  }

  // ---- the avc1 audio-fallback modality (q297) -----------------------------

  private def audio(src: Long, quiet: Boolean = false): Array[Short] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def b1(tag: String): Int = {
      md.reset(); md.digest(tag.getBytes("UTF-8"))(0).toInt & 0xff
    }
    Array.tabulate(1024) { t =>
      val sb = b1(s"${src}_b${t / 16}") * 100 + b1(s"${src}_j$t") % 50
      (if (quiet) sb / 2 else sb).toShort
    }
  }
  private def mjpegWithAudio(src: Long): Array[Byte] = M.mp4AvcPcmBytes(
    frames(src).take(2).map(px => M.jpegEncodeGray(px, 64, 64, M.JpegFlatQuant8)).toSeq,
    64, 64, Some(audio(src)), videoFourcc = "jpeg")
  private def avc1(id: Long, audioSrc: Long, quiet: Boolean = false): Array[Byte] =
    M.mp4AvcPcmBytes(Seq(Array.tabulate(64)(i => (id + i).toByte)),
      64, 64, Some(audio(audioSrc, quiet)), videoFourcc = "avc1")

  test("avc1 fallback: same/quiet audio suppresses, new audio admits, neither path throws") {
    val idx = new VideoPhashIndex(spark, root("audio"))
    idx.processBatch(batch((1L, mjpegWithAudio(1)), (2L, mjpegWithAudio(2))), 0L)
    // originals store frames AND one audio row each
    assert(idx.served().filter(col("f") === VideoPhashIndex.AudioF).count() === 2L)
    idx.processBatch(batch(
      (100L, avc1(100, audioSrc = 1)), // same audio as 1 -> drop
      (200L, avc1(200, audioSrc = 2, quiet = true)), // half-gain of 2 -> drop
      (300L, avc1(300, audioSrc = 99))), 1L) // new audio -> admit
    assert(servedIds(idx) === Set(1L, 2L, 300L))
    // an avc1 container with NO audio track has no modality at all
    val ex = intercept[org.apache.spark.SparkException] {
      idx.processBatch(batch((400L, M.mp4AvcPcmBytes(
        Seq(Array.tabulate(64)(_.toByte)), 64, 64, None))), 2L)
    }
    assert(ex.getMessage.contains("undecodable video") ||
      Option(ex.getCause).exists(_.getMessage.contains("undecodable video")))
  }

  test("modality purity: an audio row never votes against frame rows") {
    val idx = new VideoPhashIndex(spark, root("purity"))
    idx.processBatch(batch((1L, mjpegWithAudio(1))), 0L)
    // plant an arrival whose audio-envelope HASH equals one of 1's FRAME
    // hashes exactly: seed a fake frame row carrying the envelope value,
    // then stream an avc1 with that audio — it must still ADMIT, because
    // the envelope may only match rows of its own modality
    val envHash = M.mp4AudioEnvelopeHash(avc1(500, audioSrc = 77)).get
    idx.seed(Seq((9000L, 0, envHash), (9000L, 1, envHash)).toDF("asset_id", "f", "dhash"))
    idx.processBatch(batch((500L, avc1(500, audioSrc = 77))), 1L)
    assert(servedIds(idx).contains(500L),
      "an audio envelope matched a frame row — modalities leaked")
  }

  test("audio-modality takedown: erased original stops suppressing its re-encodes") {
    val idx = new VideoPhashIndex(spark, root("audel"))
    idx.processBatch(batch((1L, mjpegWithAudio(1))), 0L)
    idx.delete(Seq(1L).toDF("asset_id"))
    idx.compactPurge()
    idx.processBatch(batch((100L, avc1(100, audioSrc = 1))), 1L)
    assert(servedIds(idx) === Set(100L))
  }
}

package graft.streaming

import graft.SparkSpec
import graft.scale.{Multimodal => M}
import org.apache.spark.sql.functions._

/** Cross-batch laws for the streaming perceptual-hash image index. Batch
  * boundaries are driven directly through [[PhashIndex.processBatch]] (the
  * foreachBatch body), so each law controls exactly what the stream would
  * deliver when. All payloads are REAL encodes of the deterministic md5
  * fixture pixels, decoded through the real codecs in the sink.
  */
class PhashStreamSpec extends SparkSpec {
  import spark.implicits._

  private def root(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-phi-$tag").toString + "/phi"

  private def png(src: Long, pert: Boolean = false): Array[Byte] =
    M.pngEncodeGray(M.synthPixels(src, pert), 64, 64)
  private def gifHalf(src: Long): Array[Byte] = {
    val (rw, rh, half) = M.halfSize(M.synthPixels(src, pert = false), 64, 64)
    M.gifEncodeGray(half, rw, rh)
  }
  private def jpeg(src: Long): Array[Byte] =
    M.jpegEncodeGray(M.synthPixels(src, pert = false), 64, 64, M.JpegFlatQuant8)

  private def batch(rows: (Long, Array[Byte], String)*) =
    rows.toSeq.toDF("asset_id", "payload", "fmt")

  private def acceptedIds(idx: PhashIndex): Set[Long] =
    idx.accepted().select("asset_id").as[Long].collect().toSet

  test("within one batch: container/resolution twins collapse to the min id") {
    val idx = new PhashIndex(spark, root("batch1"))
    // three encodings of image 1's content (ids 10 < 20 < 30) + unrelated 40
    idx.processBatch(batch(
      (10L, png(1), "png"), (20L, gifHalf(1), "gif"), (30L, jpeg(1), "jpeg"),
      (40L, png(2), "png")), 0L)
    assert(acceptedIds(idx) === Set(10L, 40L))
  }

  test("cross-batch: a later twin drops against the persisted index; new content is admitted") {
    val idx = new PhashIndex(spark, root("batch2"))
    idx.processBatch(batch((10L, png(1), "png")), 0L)
    // batch 2: a GIF re-crawl of image 1 (different container AND
    // resolution), a perturbed PNG of image 1 (within Hamming 6), and a
    // genuinely new image
    idx.processBatch(batch(
      (50L, gifHalf(1), "gif"), (60L, png(1, pert = true), "png"),
      (70L, png(3), "png")), 1L)
    assert(acceptedIds(idx) === Set(10L, 70L))
  }

  test("replayed batch is a no-op; so is an id-level re-crawl under a new batch id") {
    val idx = new PhashIndex(spark, root("replay"))
    idx.processBatch(batch((10L, png(1), "png")), 0L)
    val b1 = batch((50L, png(4), "png"), (60L, gifHalf(1), "gif"))
    idx.processBatch(b1, 1L)
    val after = idx.accepted().orderBy("asset_id").collect().map(_.toSeq).toSeq
    assert(acceptedIds(idx) === Set(10L, 50L))
    // foreachBatch redelivery: same batch id → batch-stamp skip
    idx.processBatch(b1, 1L)
    assert(idx.accepted().orderBy("asset_id").collect().map(_.toSeq).toSeq === after)
    // same rows as a NEW batch (an id-level re-crawl): ids already accepted
    // are skipped outright, no duplicate hash rows appear
    idx.processBatch(b1, 2L)
    assert(idx.accepted().orderBy("asset_id").collect().map(_.toSeq).toSeq === after)
  }

  test("seeded index: bootstrap hashes suppress later twins without re-litigating the seed") {
    val idx = new PhashIndex(spark, root("seed"))
    // seed images 1 and 2 by hash only — no payloads ever stored
    idx.seed(Seq(
      (100L, M.dHash56(M.synthPixels(1, pert = false), 64, 64)),
      (200L, M.dHash56(M.synthPixels(2, pert = false), 64, 64))).toDF("asset_id", "dhash"))
    idx.processBatch(batch(
      (300L, jpeg(1), "jpeg"),   // twin of seeded 100 → drops
      (400L, png(5), "png")), 0L) // new → admitted
    assert(acceptedIds(idx) === Set(100L, 200L, 400L))
  }

  test("append chains stay bounded: many batches never exceed maxChainDepth+1 legs") {
    val idx = new PhashIndex(spark, root("chain"), maxChainDepth = 3)
    for (i <- 0 until 10)
      idx.processBatch(batch((1000L + i, png(100 + i), "png")), i.toLong)
    assert(idx.hashes.chainDepth <= 4,
      s"chain depth ${idx.hashes.chainDepth} exceeded the compaction bound")
    assert(acceptedIds(idx).size === 10)
  }

  private def servedIds(idx: PhashIndex): Set[Long] =
    idx.served().select("asset_id").as[Long].collect().toSet

  test("delete: erased image leaves served() and stops suppressing; purge serves identically") {
    val idx = new PhashIndex(spark, root("delete"))
    idx.processBatch(batch((10L, png(1), "png"), (20L, png(2), "png")), 0L)
    idx.delete(Seq(10L).toDF("asset_id"))
    assert(servedIds(idx) === Set(20L), "erased id must leave the served relation")
    // a re-crawl of the ERASED content is admitted — as if 10 never existed;
    // a twin of the still-live 20 drops as before
    idx.processBatch(batch(
      (30L, gifHalf(1), "gif"), (40L, png(2, pert = true), "png")), 1L)
    assert(servedIds(idx) === Set(20L, 30L))
    val before = idx.served().orderBy("asset_id").collect().map(_.toSeq).toSeq
    idx.compactPurge()
    assert(idx.served().orderBy("asset_id").collect().map(_.toSeq).toSeq === before,
      "physical purge must not change what is served")
    assert(idx.tombstones.read().isEmpty, "purge truncates the tombstone set")
  }

  test("delete is idempotent and O(batch): re-deletes and unknown ids append nothing") {
    val idx = new PhashIndex(spark, root("deleteidem"))
    idx.processBatch(batch((10L, png(1), "png"), (20L, png(2), "png")), 0L)
    idx.delete(Seq(10L).toDF("asset_id"))
    val v = idx.tombstones.currentVersion
    idx.delete(Seq(10L).toDF("asset_id")) // re-delete: no new version
    assert(idx.tombstones.currentVersion === v, "re-delete must be a no-op")
    idx.delete(Seq(999L).toDF("asset_id")) // unknown id: legal, tombstoned
    assert(servedIds(idx) === Set(20L))
    // the raw hash table was never rewritten by any delete
    assert(acceptedIds(idx) === Set(10L, 20L))
  }

  test("tombstoned id is rejected at ingest; after purge a re-crawl re-admits it fresh") {
    val idx = new PhashIndex(spark, root("deletereadmit"))
    idx.processBatch(batch((10L, png(1), "png")), 0L)
    idx.delete(Seq(10L).toDF("asset_id"))
    // same id arrives again while the tombstone lives: rejected (no
    // resurrection-by-append duplicates)
    idx.processBatch(batch((10L, png(1), "png")), 1L)
    assert(servedIds(idx) === Set.empty[Long])
    idx.compactPurge()
    // post-purge: the id's history is gone; a re-crawl re-admits it
    idx.processBatch(batch((10L, png(1), "png")), 2L)
    assert(servedIds(idx) === Set(10L))
  }
}

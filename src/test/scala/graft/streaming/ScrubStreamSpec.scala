package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming eval-scrub laws: any batch split drains to the same clean
  * table (frozen screen ⇒ no cross-doc state), redelivery is a no-op,
  * and an unseeded index refuses to drain. Value certification is
  * q272's oracle (== the batch scrub's closed form).
  */
class ScrubStreamSpec extends SparkSpec {
  import spark.implicits._

  private def newIndex(): ScrubIndex = {
    val root = java.nio.file.Files.createTempDirectory("graft-scrub").toString
    val ix = new ScrubIndex(spark, s"$root/scrub", n = 4)
    ix.seed(Seq((0L, "e1 e2 e3 e4 e5")).toDF("doc_id", "text"))
    ix
  }

  private val docs = Seq(
    (1L, "x e2 e3 e4 e5 y"),       // interior quote excised
    (2L, "clean words only here"), // untouched
    (3L, "e1 e2 e3 e4 e5"),        // full quote -> empty
    (4L, "tiny"))                  // shorter than n

  private def cleanSet(ix: ScrubIndex): Set[(Long, String, Long)] =
    ix.clean.read().as[(Long, String, Long)].collect().toSet

  test("any batch split drains to the same clean table") {
    val want = Set(
      (1L, "x y", 4L),
      (2L, "clean words only here", 0L),
      (3L, "", 5L),
      (4L, "tiny", 0L))
    for (splits <- Seq(Seq(docs), docs.grouped(2).toSeq, docs.map(Seq(_)))) {
      val ix = newIndex()
      splits.zipWithIndex.foreach { case (b, i) =>
        ix.processBatch(b.toDF("doc_id", "text"), i.toLong)
      }
      assert(cleanSet(ix) === want, s"split ${splits.map(_.size)} diverged")
    }
  }

  test("redelivery is a no-op; unseeded index fails closed") {
    val ix = newIndex()
    ix.processBatch(docs.toDF("doc_id", "text"), 0L)
    val v = ix.clean.currentVersion
    ix.processBatch(docs.toDF("doc_id", "text"), 0L)
    assert(ix.clean.currentVersion === v)
    val root = java.nio.file.Files.createTempDirectory("graft-scrub-un").toString
    val bare = new ScrubIndex(spark, s"$root/scrub", n = 4)
    intercept[IllegalArgumentException] {
      bare.processBatch(docs.toDF("doc_id", "text"), 0L)
    }
  }
}

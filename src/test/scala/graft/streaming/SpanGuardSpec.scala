package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming exact-substring guard laws: earlier-batch spans reject,
  * within-batch sharers are concurrent, REJECTED docs still poison the
  * index (non-recursive state), short docs guard on their whole text,
  * redelivery is a no-op.
  */
class SpanGuardSpec extends SparkSpec {
  import spark.implicits._

  private def root(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-guard-$tag").toString + "/g"

  private def admittedSet(idx: SpanGuardIndex): Set[Long] =
    idx.admitted.read().as[Long].collect().toSet

  test("admission depends on earlier batches only; rejected docs still poison") {
    val idx = new SpanGuardIndex(spark, root("laws"), n = 4)
    // batch 0: docs 1 and 2 share "a b c d" WITHIN the batch — concurrent,
    // both admit
    idx.processBatch(Seq((1L, "a b c d x"), (2L, "a b c d y"))
      .toDF("doc_id", "text"), 0L)
    assert(admittedSet(idx) === Set(1L, 2L))
    // batch 1: doc 3 repeats the seen span -> rejected; doc 4 is clean
    idx.processBatch(Seq((3L, "z a b c d"), (4L, "q r s t"))
      .toDF("doc_id", "text"), 1L)
    assert(admittedSet(idx) === Set(1L, 2L, 4L))
    // batch 2: doc 5 repeats "z a b c" — a span introduced ONLY by the
    // REJECTED doc 3 — and must still reject (all seen spans poison)
    idx.processBatch(Seq((5L, "z a b c w")).toDF("doc_id", "text"), 2L)
    assert(admittedSet(idx) === Set(1L, 2L, 4L))
    // redelivery of the last batch is a no-op
    idx.processBatch(Seq((5L, "z a b c w")).toDF("doc_id", "text"), 2L)
    assert(admittedSet(idx) === Set(1L, 2L, 4L))
  }

  test("short docs guard on their whole text as one span") {
    val idx = new SpanGuardIndex(spark, root("short"), n = 4)
    idx.processBatch(Seq((1L, "p q")).toDF("doc_id", "text"), 0L)
    idx.processBatch(Seq((2L, "p q"), (3L, "p r"))
      .toDF("doc_id", "text"), 1L)
    assert(admittedSet(idx) === Set(1L, 3L))
  }
}

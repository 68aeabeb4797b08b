package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TTL-windowed streaming dedup laws: the admitted log equals the
  * most-recent-prior-sighting rule, sightings refresh suppression whether
  * or not admitted, the state holds exactly the TTL window (eviction +
  * re-admission), replay is exactly once, and out-of-order feeds fail
  * closed. The value-level certification of a full drain is q230's oracle;
  * these pin the mechanics the oracle can't see (state footprint, replay,
  * rejection).
  */
class TtlDedupSpec extends SparkSpec {
  import spark.implicits._

  private def newIndex(ttl: Long): TtlDedupIndex = {
    val root = java.nio.file.Files.createTempDirectory("graft-ttl").toString
    new TtlDedupIndex(spark, s"$root/ttl", ttl)
  }

  private def batch(rows: (Long, Long, Long)*) =
    rows.toDF("doc_id", "key", "day")

  private def admitted(ix: TtlDedupIndex): Set[(Long, Long, Long)] =
    ix.admitted.read().as[(Long, Long, Long)].collect().toSet

  private def stateOf(ix: TtlDedupIndex): Map[Long, Long] =
    ix.windowState().as[(Long, Long)].collect().toMap

  test("admit/suppress/refresh/re-admit across day batches (ttl=1)") {
    val ix = newIndex(1)
    ix.processBatch(batch((1, 10, 0), (2, 20, 0)), 0)   // both new -> admit
    ix.processBatch(batch((3, 10, 1)), 1)               // gap 1 <= ttl -> drop
    ix.processBatch(batch((4, 10, 2)), 2)               // gap 1 again (refreshed at day 1!)
    ix.processBatch(batch((5, 10, 4), (6, 20, 4)), 3)   // 10: gap 2 > 1 -> admit; 20: gap 4 -> admit
    assert(admitted(ix) === Set((1L, 10L, 0L), (2L, 20L, 0L),
      (5L, 10L, 4L), (6L, 20L, 4L)))
  }

  test("same-day duplicates: only the min-id sighting can admit") {
    val ix = newIndex(1)
    ix.processBatch(batch((9, 10, 0), (3, 10, 0), (7, 10, 0)), 0)
    assert(admitted(ix) === Set((3L, 10L, 0L)))
  }

  test("state holds exactly the TTL window: eviction + footprint") {
    val ix = newIndex(1)
    ix.processBatch(batch((1, 10, 0), (2, 20, 0)), 0)
    ix.processBatch(batch((3, 20, 3)), 1)
    // watermark 3: key 10 last seen day 0 -> evicted; 20 at 3 -> live
    assert(stateOf(ix) === Map(20L -> 3L))
    // the evicted key's next sighting is admitted (nothing suppresses it)
    ix.processBatch(batch((4, 10, 4)), 2)
    assert(admitted(ix).contains((4L, 10L, 4L)))
  }

  test("replay of a processed batch is a no-op (exactly once)") {
    val ix = newIndex(1)
    ix.processBatch(batch((1, 10, 0)), 0)
    ix.processBatch(batch((2, 10, 1), (3, 30, 1)), 1)
    val (a1, s1) = (admitted(ix), stateOf(ix))
    val (av, sv) = (ix.admitted.currentVersion, ix.state.currentVersion)
    ix.processBatch(batch((2, 10, 1), (3, 30, 1)), 1)
    assert(admitted(ix) === a1 && stateOf(ix) === s1)
    assert(ix.admitted.currentVersion === av && ix.state.currentVersion === sv)
  }

  test("crash between promotes converges: state fold re-runs, admitted skips") {
    val ix = newIndex(1)
    ix.processBatch(batch((1, 10, 0)), 0)
    ix.processBatch(batch((2, 20, 2)), 1)
    val (a1, s1) = (admitted(ix), stateOf(ix))
    // simulate "admitted stamped, state promote lost": roll state back to
    // its batch-0 version, then redeliver batch 1
    ix.state.promote(0, Some("batch=0"))
    ix.processBatch(batch((2, 20, 2)), 1)
    assert(admitted(ix) === a1 && stateOf(ix) === s1)
  }

  test("out-of-order batches fail closed") {
    val ix = newIndex(1)
    ix.processBatch(batch((1, 10, 5)), 0)
    val e = intercept[IllegalArgumentException] {
      ix.processBatch(batch((2, 20, 3)), 1)
    }
    assert(e.getMessage.contains("day-ordered"))
    // same-day (== watermark) batches are inside the contract
    ix.processBatch(batch((3, 30, 5)), 2)
    assert(admitted(ix).contains((3L, 30L, 5L)))
  }

  test("multi-day batch: in-batch lag sequences the days correctly") {
    val ix = newIndex(1)
    ix.processBatch(batch((1, 10, 0), (2, 10, 1), (3, 10, 3), (4, 10, 6)), 0)
    // 0 admit, 1 drop (gap 1), 3 admit (gap 2), 6 admit (gap 3)
    assert(admitted(ix) === Set((1L, 10L, 0L), (3L, 10L, 3L), (4L, 10L, 6L)))
    assert(stateOf(ix) === Map(10L -> 6L))
  }
}
